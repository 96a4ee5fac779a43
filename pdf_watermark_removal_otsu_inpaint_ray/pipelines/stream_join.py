"""Two-log streaming stateful join pipeline (symmetric interval join).

Both logs are consumed in arrival order (same log contract as
:mod:`.streaming`), round-robin interleaved so neither side's frontier
races ahead; rows route to a :class:`JoinStateActor` pool by KEY hash
(both sides of a key meet the same actor — the co-location assumption
this operator relies on; salting a hot key would require splitting ONE
side only, since pairs form across sides).  The watermark is the min of
the two logs' frontiers minus lateness; each log closes its tracker
partition when it ends, so a shorter log stops holding eviction back.

Pair emission is at second-arrival (set-deterministic — see
state/join_state.py); sink mode stages pairs from the actors straight
into the exactly-once layout keyed by a deterministic pair id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..state.dedup_state import _splitmix_route
from ..state.join_state import JoinStateActor, TemporalJoinActor
from ..state.watermark_tracker import WatermarkTracker
from .streaming import StreamingResult, _arrival_batches, _finalize_sink, _sink_done_sets


def _normalize(batch: pa.Table, key: str, seq: str, ts: str) -> pa.Table:
    return pa.table(
        {
            "key": batch[key].cast(pa.int64()),
            "seq": batch[seq].cast(pa.int64()),
            "ts": batch[ts].cast(pa.int64()),
        }
    )


def run_streaming_join(
    left_source,
    right_source,
    *,
    band: int | None = None,
    band_lo: int | None = None,
    band_hi: int | None = None,
    left_cols: tuple[str, str, str] = ("key", "seq", "event_ts"),
    right_cols: tuple[str, str, str] = ("key", "seq", "event_ts"),
    allowed_lateness: int = 1,
    n_actors: int = 4,
    micro_batch_rows: int = 512,
    out_dir: str | None = None,
    num_partitions: int = 8,
    mode: str = "inner",
) -> StreamingResult:
    """Streaming interval equi-join of two logs: emit (key, l_seq, l_ts,
    r_seq, r_ts) for every pair with equal keys and ``band_lo <= r_ts -
    l_ts <= band_hi`` (``band`` = the symmetric ``|l_ts - r_ts| <= band``
    shorthand).  ``*_cols`` = (key, seq, ts) column names per side.  Ray
    must already be initialised by the caller.  ``mode="left_outer"`` also
    emits (key, l_seq, l_ts, -1, -1) for every left row whose band closes
    without a match — the null row fires exactly once, when the watermark
    proves no in-band partner can still arrive; ``mode="full_outer"``
    additionally emits (key, -1, -1, r_seq, r_ts) for unmatched rights."""
    sink_done, late_done, sink_epoch = _sink_done_sets(out_dir)
    actors = [
        JoinStateActor.remote(
            band=band,
            band_lo=band_lo,
            band_hi=band_hi,
            mode=mode,
            sink_dir=out_dir,
            sink_partitions=num_partitions,
            sink_done=sink_done,
            late_done=late_done,
            sink_epoch=sink_epoch,
        )
        for _ in range(n_actors)
    ]
    tracker = WatermarkTracker.remote(2, allowed_lateness)

    pair_refs: list = []
    pending: list = []
    wm = -(1 << 62)
    batch_idx = 0
    iters = [
        _arrival_batches(left_source, micro_batch_rows),
        _arrival_batches(right_source, micro_batch_rows),
    ]
    cols = [left_cols, right_cols]
    alive = [True, True]
    while any(alive):
        for side in (0, 1):
            if not alive[side]:
                continue
            try:
                raw = next(iters[side])
            except StopIteration:
                alive[side] = False
                tracker.close_partition.remote(side)
                continue
            batch = _normalize(raw, *cols[side])
            ts = np.asarray(batch["ts"], np.int64)
            if batch_idx % 4 == 0:
                wm = max(wm, ray.get(tracker.watermark.remote()))
            batch_idx += 1
            route = _splitmix_route(np.asarray(batch["key"], np.int64), n_actors)
            for a in range(n_actors):
                idx = np.nonzero(route == a)[0]
                if idx.size == 0:
                    continue
                pending.append(actors[a].ingest.remote(side, batch.take(idx), wm))
            tracker.update.remote(side, int(ts.max()))
            if len(pending) >= n_actors * 4:
                done, pending = pending[: n_actors * 2], pending[n_actors * 2 :]
                for tables, _ in ray.get(done):
                    pair_refs.extend(tables)

    for tables, _ in ray.get(pending):
        pair_refs.extend(tables)
    if mode != "inner":
        # both logs ended: flush the remaining unmatched rows
        for flushed in ray.get([a.flush_outer.remote() for a in actors]):
            pair_refs.extend(flushed)

    late_tables = [
        t for t in ray.get([a.late_rows.remote() for a in actors]) if t is not None
    ]
    stats = ray.get([a.state_stats.remote() for a in actors])
    late = pa.concat_tables(late_tables) if late_tables else None

    if out_dir is not None:
        return _finalize_sink(actors, stats, late, out_dir, sink_epoch)

    out = (
        pa.concat_tables(pair_refs).sort_by(
            [("l_seq", "ascending"), ("r_seq", "ascending")]
        )
        if pair_refs
        else None
    )
    return StreamingResult(
        output=out,
        late=late,
        n_late=sum(s["n_late"] for s in stats),
        actor_stats=stats,
    )


def run_streaming_temporal_join(
    dim_source,
    event_source,
    *,
    dim_cols: tuple[str, str, str] = ("key", "seq", "event_ts"),
    event_cols: tuple[str, str, str] = ("key", "seq", "event_ts"),
    allowed_lateness: int = 1,
    n_actors: int = 4,
    micro_batch_rows: int = 512,
    out_dir: str | None = None,
    num_partitions: int = 8,
) -> StreamingResult:
    """Streaming TEMPORAL TABLE join (Flink-style versioned-dimension
    enrichment): every event row emits exactly once with (key, e_seq,
    e_ts, d_seq, d_ts) where d is the dimension log's latest version for
    the key with ``d_ts <= e_ts`` (ties → highest d_seq), or (-1, -1)
    when no version exists yet — LEFT semantics.  Same log/consumption
    contract as :func:`run_streaming_join`: both logs round-robin
    interleaved, rows route by key hash, the watermark is the min of the
    two frontiers minus lateness, a closing log releases its tracker
    partition, late rows route to the side output.  Events buffer in the
    actors until the watermark passes their timestamp (dimension history
    then provably complete — see TemporalJoinActor); a final ``drain``
    flushes the tail once both logs end."""
    sink_done, late_done, sink_epoch = _sink_done_sets(out_dir)
    actors = [
        TemporalJoinActor.remote(
            sink_dir=out_dir,
            sink_partitions=num_partitions,
            sink_done=sink_done,
            late_done=late_done,
            sink_epoch=sink_epoch,
        )
        for _ in range(n_actors)
    ]
    tracker = WatermarkTracker.remote(2, allowed_lateness)

    out_refs: list = []
    pending: list = []
    wm = -(1 << 62)
    batch_idx = 0
    iters = [
        _arrival_batches(dim_source, micro_batch_rows),
        _arrival_batches(event_source, micro_batch_rows),
    ]
    cols = [dim_cols, event_cols]
    alive = [True, True]
    while any(alive):
        for side in (0, 1):
            if not alive[side]:
                continue
            try:
                raw = next(iters[side])
            except StopIteration:
                alive[side] = False
                tracker.close_partition.remote(side)
                continue
            batch = _normalize(raw, *cols[side])
            ts = np.asarray(batch["ts"], np.int64)
            if batch_idx % 4 == 0:
                wm = max(wm, ray.get(tracker.watermark.remote()))
            batch_idx += 1
            route = _splitmix_route(np.asarray(batch["key"], np.int64), n_actors)
            for a in range(n_actors):
                idx = np.nonzero(route == a)[0]
                if idx.size == 0:
                    continue
                pending.append(actors[a].ingest.remote(side, batch.take(idx), wm))
            tracker.update.remote(side, int(ts.max()))
            if len(pending) >= n_actors * 4:
                done, pending = pending[: n_actors * 2], pending[n_actors * 2 :]
                for tables, _ in ray.get(done):
                    out_refs.extend(tables)

    for tables, _ in ray.get(pending):
        out_refs.extend(tables)
    # both logs closed: drain the buffered event tails
    for tables in ray.get([a.drain.remote() for a in actors]):
        out_refs.extend(tables)

    late_tables = [
        t for t in ray.get([a.late_rows.remote() for a in actors]) if t is not None
    ]
    stats = ray.get([a.state_stats.remote() for a in actors])
    late = pa.concat_tables(late_tables) if late_tables else None

    if out_dir is not None:
        return _finalize_sink(actors, stats, late, out_dir, sink_epoch)

    out = (
        pa.concat_tables(out_refs).sort_by([("e_seq", "ascending")])
        if out_refs
        else None
    )
    return StreamingResult(
        output=out,
        late=late,
        n_late=sum(s["n_late"] for s in stats),
        actor_stats=stats,
    )


def run_streaming_timeouts(
    anchor_source,
    cancel_source,
    *,
    horizon: int,
    anchor_cols: tuple[str, str, str] = ("key", "seq", "event_ts"),
    cancel_cols: tuple[str, str, str] = ("key", "seq", "event_ts"),
    allowed_lateness: int = 1,
    n_actors: int = 4,
    micro_batch_rows: int = 512,
) -> StreamingResult:
    """Streaming ABSENCE (timeout) detection — the negative CEP pattern:
    emit (key, anchor_seq, anchor_ts) for every anchor event that is NOT
    followed by a same-key cancel event within ``(anchor_ts, anchor_ts +
    horizon]``; the alert fires exactly once, when the watermark passes
    ``anchor_ts + horizon`` and proves no non-late cancel can still
    arrive.  The "signup with no purchase in N days" / "order with no
    payment" monitor.

    Composition, not new state: this is the LEFT-OUTER streaming interval
    join with the DIRECTED band (band_lo=1 — strictly after, integer
    timestamps — band_hi=horizon), filtered to the null rows.  All the
    join-state guarantees carry over verbatim: bounded buffers (one
    horizon+lateness window per actor), late-row routing, and
    emission-order independence (the alert set is a pure function of the
    two logs).

    Reference analog: the sticky-detection inverse — T1 latches the FIRST
    match per key (detect.py sticky mode); this latches the proven
    ABSENCE of a match per anchor."""
    res = run_streaming_join(
        anchor_source,
        cancel_source,
        band_lo=1,
        band_hi=horizon,
        left_cols=anchor_cols,
        right_cols=cancel_cols,
        allowed_lateness=allowed_lateness,
        n_actors=n_actors,
        micro_batch_rows=micro_batch_rows,
        mode="left_outer",
    )
    if res.output is None:
        out = pa.table(
            {
                "key": pa.array([], pa.int64()),
                "anchor_seq": pa.array([], pa.int64()),
                "anchor_ts": pa.array([], pa.int64()),
            }
        )
    else:
        import pyarrow.compute as pc

        t = res.output
        nulls = t.filter(pc.equal(t["r_seq"], -1))
        out = pa.table(
            {
                "key": nulls["key"],
                "anchor_seq": nulls["l_seq"],
                "anchor_ts": nulls["l_ts"],
            }
        )
    return StreamingResult(
        output=out,
        late=res.late,
        n_late=res.n_late,
        actor_stats=res.actor_stats,
    )
