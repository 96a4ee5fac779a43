"""Incremental streaming execution: micro-batches → keyed state actor pool.

The batch flagship (flagship.py) reads the stream twice (histograms, then
rewrite).  This engine reads it ONCE, in arrival order, holding only live
windows in actor state — the true structured-streaming form of the north
star: per-source histograms accumulate incrementally, windows finalize when
the global watermark (WatermarkTracker, min across input partitions −
allowed_lateness) passes their end, state is evicted on emit, late rows go
to a counted side output.

Data flow: each input partition is consumed as Arrow micro-batches; rows are
routed to ``hash(source) % n_actors`` (all rows of one source meet the same
actor — the partitioning assumption this engine relies on; hot sources can
be salted because histogram partials merge associatively).  The driver moves
only object refs and watermark updates, never token data — at cluster scale
the same loop runs one consumer task per input partition.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

import ray

from ..config import DEFAULT_CONFIG, EngineConfig
from ..sinks.exactly_once import hash_partition_ids
from ..state.keyed_state import KeyedStateActor
from ..state.watermark_tracker import WatermarkTracker


def _arrival_batches(source, micro_batch_rows: int):
    """Yield Arrow micro-batches in guaranteed arrival order.

    A stream source is a LOG, not a batch scan: for paths we read files in
    lexicographic order, row group by row group via pyarrow (memory-bounded,
    no Ray Data read — a parallel scan interleaves fragments and would
    teleport the watermark).  A Dataset input is iterated with
    ``preserve_order`` and is only order-safe for single-fragment inputs.
    """
    import os

    import pyarrow.parquet as pq_

    from ..sources.parquet import _ensure_event_ts

    if isinstance(source, str):
        source = (
            sorted(
                os.path.join(source, f)
                for f in os.listdir(source)
                if f.endswith(".parquet")
            )
            if os.path.isdir(source)
            else [source]
        )
    if isinstance(source, (list, tuple)):
        for path in source:
            pf = pq_.ParquetFile(path)
            for rb in pf.iter_batches(batch_size=micro_batch_rows):
                yield _ensure_event_ts(pa.Table.from_batches([rb]))
    else:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        prev = ctx.execution_options.preserve_order
        ctx.execution_options.preserve_order = True
        try:
            for b in source.iter_batches(batch_size=micro_batch_rows, batch_format="pyarrow"):
                yield _ensure_event_ts(pa.table(b) if not isinstance(b, pa.Table) else b)
        finally:
            ctx.execution_options.preserve_order = prev


@dataclass
class StreamingResult:
    output: pa.Table
    late: pa.Table | None
    n_late: int
    actor_stats: list[dict] = field(default_factory=list)


def run_streaming(
    source,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    n_actors: int = 4,
    micro_batch_rows: int = 512,
    out_dir: str | None = None,
    num_partitions: int = 8,
) -> StreamingResult:
    """Run the incremental engine over a Parquet path / Dataset.

    ``out_dir``: optional exactly-once sink for the emitted stream.
    Ray must already be initialised by the caller.
    """
    actors = [KeyedStateActor.remote(cfg) for _ in range(n_actors)]
    tracker = WatermarkTracker.remote(1, cfg.allowed_lateness)

    emitted_refs: list = []
    pending: list = []
    for batch in _arrival_batches(source, micro_batch_rows):
        ts = np.asarray(batch["event_ts"], dtype=np.int64)
        # the watermark a batch is judged against excludes the batch itself
        # (it advances only after the data that generated it is absorbed)
        wm = ray.get(tracker.watermark.remote())
        route = hash_partition_ids(batch["source"].combine_chunks(), n_actors)
        for a in range(n_actors):
            idx = np.nonzero(route == a)[0]
            if idx.size == 0:
                continue
            pending.append(actors[a].ingest.remote(batch.take(idx), wm))
        tracker.update.remote(0, int(ts.max()))
        # drain completed ingests so emitted tables don't pile up as refs
        if len(pending) >= n_actors * 4:
            done, pending = pending[: n_actors * 2], pending[n_actors * 2 :]
            for tables, _ in ray.get(done):
                emitted_refs.extend(tables)

    for tables, _ in ray.get(pending):
        emitted_refs.extend(tables)
    for flushed in ray.get([a.flush.remote() for a in actors]):
        emitted_refs.extend(flushed)

    late_tables = [t for t in ray.get([a.late_rows.remote() for a in actors]) if t is not None]
    stats = ray.get([a.state_stats.remote() for a in actors])
    out = (
        pa.concat_tables(emitted_refs).sort_by("doc_id")
        if emitted_refs
        else None
    )
    late = pa.concat_tables(late_tables) if late_tables else None

    if out_dir is not None and out is not None:
        from ..sinks.exactly_once import write_exactly_once

        write_exactly_once(ray.data.from_arrow(out), out_dir, num_partitions=num_partitions)

    return StreamingResult(
        output=out if out is not None else _empty_out(),
        late=late,
        n_late=sum(s["n_late"] for s in stats),
        actor_stats=stats,
    )


def _empty_out() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "tokens": pa.array([], pa.list_(pa.int32())),
            "n_tok": pa.array([], pa.int32()),
            "source": pa.array([], pa.string()),
            "event_ts": pa.array([], pa.int64()),
            "wm_token": pa.array([], pa.int32()),
            "coverage_pct": pa.array([], pa.float64()),
            "radius": pa.array([], pa.int32()),
            "n_passes": pa.array([], pa.int32()),
        }
    )
