"""Streaming changelog materialization pipeline: a live keyed upsert log
→ the latest-version-per-key table (the Flink upsert-sink / Kafka
compacted-topic shape; batch twin ``functions/packing.py::grouped_latest``).

Single-read arrival-order consumption, rows routed to an
:class:`UpsertStateActor` pool by KEY hash.  Latest-per-key is a
commutative monoid, so there is no watermark and no late path — any
arrival interleaving, micro-batch size, and actor count yields the same
materialized state (asserted by the layout-invariance tests).  Sink mode
(``out_dir``): each actor's final state stages straight into the
exactly-once layout; the driver moves manifests only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..state.dedup_state import _splitmix_route
from ..state.upsert_state import UpsertStateActor
from .streaming import StreamingResult, _arrival_batches, _finalize_sink, _sink_done_sets


def run_streaming_latest(
    source,
    *,
    group_col: str = "user_id",
    order_col: str = "ts_us",
    tiebreak_col: str = "event_id",
    n_actors: int = 4,
    micro_batch_rows: int = 512,
    compact_rows: int = 65536,
    out_dir: str | None = None,
    num_partitions: int = 8,
) -> StreamingResult:
    """Materialize the latest row per key over a Parquet path / Dataset
    changelog.  Ray must already be initialised by the caller.  Output is
    byte-equal to ``grouped_latest`` over the same rows (the
    ``row_number() = 1`` window twin)."""
    sink_done, late_done, sink_epoch = _sink_done_sets(out_dir)
    actors = [
        UpsertStateActor.remote(
            group_col=group_col,
            order_col=order_col,
            tiebreak_col=tiebreak_col,
            compact_rows=compact_rows,
            sink_dir=out_dir,
            sink_partitions=num_partitions,
            sink_done=sink_done,
            late_done=late_done,
            sink_epoch=sink_epoch,
        )
        for _ in range(n_actors)
    ]

    pending: list = []
    for batch in _arrival_batches(source, micro_batch_rows):
        route = _splitmix_route(np.asarray(batch[group_col], np.int64), n_actors)
        for a in range(n_actors):
            idx = np.nonzero(route == a)[0]
            if idx.size == 0:
                continue
            pending.append(actors[a].ingest.remote(batch.take(idx)))
        if len(pending) >= n_actors * 4:
            done, pending = pending[: n_actors * 2], pending[n_actors * 2 :]
            ray.get(done)

    ray.get(pending)
    out_tables: list[pa.Table] = []
    for flushed in ray.get([a.flush.remote() for a in actors]):
        out_tables.extend(flushed)
    stats = ray.get([a.state_stats.remote() for a in actors])

    if out_dir is not None:
        return _finalize_sink(actors, stats, None, out_dir, sink_epoch)

    out = (
        pa.concat_tables(out_tables).sort_by(group_col).drop_columns(["doc_id"])
        if out_tables
        else None
    )
    return StreamingResult(output=out, late=None, n_late=0, actor_stats=stats)
