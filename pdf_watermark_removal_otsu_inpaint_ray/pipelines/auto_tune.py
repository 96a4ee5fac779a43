"""Auto-tuned pipeline: profile sources → per-source parameters → rewrite.

Engine analog of the CLI's classify-then-override flow (cli.py:805-841):
the classifier's parameter set is chosen **per source** (the reference
classifies page 1 per document); sources sharing a parameter set are
processed together in one flagship run (parameters like ``kernel_size``
change the morphology radius, which is uniform within a kernel invocation),
and the per-group outputs union back into one stream.  Watermark detection
runs once with the base config — parameters tune flagging/refine/inpaint,
not the histogram rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.classifier import (
    auto_tuned_configs,
    batch_source_stats,
    classify_stats,
    optimal_parameters,
)
from ..stages.detect import compute_wm_table
from .flagship import run_flagship


def golden_auto_tuned(table: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Single-process oracle for the auto-tuned pipeline."""
    from .. import golden

    stats = batch_source_stats(table, cfg)
    cfgs = {
        s: cfg.with_(**optimal_parameters(classify_stats(st).doc_type))
        for s, st in stats.items()
    }
    wm = golden.golden_wm_table(table, cfg)
    row_win = golden.golden_row_window(table, cfg)
    src = table["source"].to_pylist()
    ids = table["doc_id"].to_pylist()
    toks = table["tokens"].to_pylist()
    out_tokens = []
    for i in range(len(ids)):
        t = np.asarray(toks[i], dtype=np.int32)
        wm_tok, _ = wm.get((src[i], int(row_win[i])), (-1, 0.0))
        r = golden.process_row(t, wm_tok, cfgs[src[i]])
        out_tokens.append(r.tokens.tolist())
    return pa.table(
        {
            "doc_id": table["doc_id"],
            "tokens": pa.array(out_tokens, pa.list_(pa.int32())),
            "n_tok": table["n_tok"],
            "source": table["source"],
            "event_ts": table["event_ts"],
        }
    )


def run_auto_tuned(
    ds: "ray.data.Dataset", cfg: EngineConfig = DEFAULT_CONFIG, **flagship_kw
) -> "ray.data.Dataset":
    """Distributed auto-tuned rewrite; returns the union of per-parameter-set
    flagship outputs (metadata columns omitted so group schemas align)."""
    cfgs = auto_tuned_configs(ds, cfg)
    # mirror run_flagship's phase-1 gating: auto/fixed detection never
    # consults the wm table at all.  Session windows need the broadcastable
    # per-source mapping; compute it ONCE here (tuned params never touch
    # window geometry) and thread it through to every per-group flagship
    # call instead of letting each recompute its own pass.
    from ..registry import detector_is_row_local

    row_local = detector_is_row_local(cfg.detection_method) or cfg.fixed_wm_token >= 0
    session_map = None
    if cfg.window_kind == "session" and not row_local:
        # row-local/fixed-token groups never consult the wm table, so the
        # phase-0 pass cannot affect their output — skip it (review finding)
        from ..stages.detect import session_window_mapping

        session_map = session_window_mapping(ds, cfg)
    wm = {} if row_local else compute_wm_table(ds, cfg, session_map=session_map)

    groups: dict[EngineConfig, list[str]] = {}
    for s, c in cfgs.items():
        groups.setdefault(c, []).append(s)

    outs = []
    for gcfg, sources in groups.items():
        sset = set(sources)

        def keep(batch: pa.Table, _s=frozenset(sset)) -> pa.Table:
            m = np.array([x in _s for x in batch["source"].to_pylist()])
            return batch.filter(pa.array(m))

        sub = ds.map_batches(keep, batch_format="pyarrow")
        outs.append(
            run_flagship(sub, gcfg, wm=wm, emit_metadata=False,
                         session_map=session_map, **flagship_kw)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
