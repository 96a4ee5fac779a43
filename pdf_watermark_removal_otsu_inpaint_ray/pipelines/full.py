"""Full product pipeline — the engine equivalent of the reference CLI path
(SURVEY.md §3.1): motif/CEP span detection + category semi-filter + stateful
span join + windowed watermark detection + inpaint + exactly-once sink.

Join strategy (J1): the category-filtered span-event table is tiny relative
to the stream (motifs are rare), so the default physical plan collapses it to
``doc_id → padded ranges`` and broadcasts once via ``ray.put`` — the events
side is re-derived per run from the same deterministic input, so no extra
read.  When the span side is too large to broadcast, the general
co-partitioned path is :func:`..stages.join.hash_join_events_documents`.
"""

from __future__ import annotations

from ..config import scaled_parts

from typing import Optional

import ray
import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.join import spans_to_ranges_table
from ..stages.motif import MotifStage, category_filter
from .flagship import run_flagship


def detect_motif_events(
    ds: "ray.data.Dataset",
    motifs: list[tuple[str, tuple[int, ...]]],
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> "ray.data.Dataset":
    return ds.map_batches(
        MotifStage(motifs, cfg), batch_format="pyarrow", batch_size=1024
    )


def run_full_pipeline(
    ds: "ray.data.Dataset",
    motifs: list[tuple[str, tuple[int, ...]]],
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    out_dir: Optional[str] = None,
    num_partitions: int | None = None,
    batch_size: int = 1024,
):
    """CEP spans → removal-set filter → J1 join → detect → inpaint → sink.

    Returns (output Dataset | commit report, span_events table).
    """
    num_partitions = scaled_parts(32, num_partitions)
    import pyarrow as pa

    events_ds = detect_motif_events(ds, motifs, cfg)
    batches = list(events_ds.iter_batches(batch_format="pyarrow"))
    events = pa.concat_tables(batches) if batches else None
    if events is not None and events.num_rows:
        removable = category_filter(events, cfg.removal_categories)
        spans = spans_to_ranges_table(removable, cfg.motif_pad)
        motif_docs = frozenset(removable["doc_id"].to_pylist())
    else:
        spans, motif_docs = None, None

    out = run_flagship(
        ds, cfg, motif_docs=motif_docs or None, spans=spans, batch_size=batch_size
    )
    if out_dir is not None:
        from ..sinks.exactly_once import write_exactly_once

        report = write_exactly_once(out, out_dir, num_partitions=num_partitions)
        return report, events
    return out, events
