"""Debug sinks (S6; reference preview_detection, watermark_detector.py:791-828).

The reference writes a color-coded detection-preview PNG; the engine analog
emits the detection bitmap as data: per row, the flagged spans (start, len)
plus band classification counts — writable next to the tokens with
``ds.write_parquet`` for inspection.
"""

from __future__ import annotations

from ..config import scaled_pool

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig
from .detect import assign_windows_batch
from .inpaint import lookup_wm_rows
from .kernels import detect_mask_flat, detect_mask_auto_flat, filter_runs, flatten_list_column, per_position


class FlagPreviewStage:
    """map_batches body: emit (doc_id, wm_token, n_flagged, span_starts,
    span_lens, n_background, n_content) — the engine's detection preview."""

    def __init__(self, wm_ref, cfg: EngineConfig):
        self.wm = ray.get(wm_ref) if isinstance(wm_ref, ray.ObjectRef) else wm_ref
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        fb = flatten_list_column(batch["tokens"])
        src = np.asarray(batch["source"])
        ts = np.asarray(batch["event_ts"], dtype=np.int64)
        if cfg.detection_method == "auto":
            flag = detect_mask_auto_flat(fb.values, fb, cfg)
            wm_row = np.full(fb.n_rows, -1, dtype=np.int64)
        else:
            win = assign_windows_batch(ts, cfg)
            wm_row = lookup_wm_rows(self.wm, src, win, default=cfg.fixed_wm_token)
            flag = detect_mask_flat(fb.values, per_position(wm_row, fb), fb, cfg)

        gray = fb.values % np.int32(cfg.gray_mod)
        n_bg = np.bincount(fb.seg, weights=(gray > cfg.background_threshold), minlength=fb.n_rows)
        n_ct = np.bincount(fb.seg, weights=(gray <= cfg.text_threshold), minlength=fb.n_rows)
        n_fl = np.bincount(fb.seg, weights=flag, minlength=fb.n_rows)

        # span extraction per row (vectorized RLE over the whole batch)
        n = flag.size
        starts_list: list[list[int]] = [[] for _ in range(fb.n_rows)]
        lens_list: list[list[int]] = [[] for _ in range(fb.n_rows)]
        if n:
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (flag[1:] != flag[:-1]) | (fb.seg[1:] != fb.seg[:-1])
            run_id = np.cumsum(change) - 1
            run_start = np.nonzero(change)[0]
            run_len = np.diff(np.append(run_start, n))
            run_flagged = flag[run_start]
            for rs, rl in zip(run_start[run_flagged], run_len[run_flagged]):
                row = int(fb.seg[rs])
                starts_list[row].append(int(rs - fb.offsets[row]))
                lens_list[row].append(int(rl))

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "wm_token": pa.array(wm_row.astype(np.int32), pa.int32()),
                "n_flagged": pa.array(n_fl.astype(np.int64), pa.int64()),
                "span_starts": pa.array(starts_list, pa.list_(pa.int32())),
                "span_lens": pa.array(lens_list, pa.list_(pa.int32())),
                "n_background": pa.array(n_bg.astype(np.int64), pa.int64()),
                "n_content": pa.array(n_ct.astype(np.int64), pa.int64()),
            }
        )


def write_flag_preview(ds, wm: dict, cfg: EngineConfig, out_dir: str):
    """Debug sink: detection bitmaps alongside ids (S6)."""
    wm_ref = ray.put(wm)
    prev = ds.map_batches(
        FlagPreviewStage, fn_constructor_args=(wm_ref, cfg),
        batch_format="pyarrow", concurrency=scaled_pool(1, 4),
    )
    prev.write_parquet(out_dir)
    return out_dir
