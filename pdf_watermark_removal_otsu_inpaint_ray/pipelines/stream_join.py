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

from ..config import scaled_parts

import numpy as np
import pyarrow as pa

import ray

from ..state.dedup_state import _splitmix_route
from ..state.join_state import JoinStateActor, TemporalJoinActor
from ..state.watermark_tracker import WatermarkTracker
from .streaming import (
    StreamingResult,
    _arrival_batches,
    _finalize_sink,
    _resolve_parquet_paths,
    _sink_done_sets,
)


def _normalize(batch: pa.Table, key: str, seq: str, ts: str) -> pa.Table:
    return pa.table(
        {
            "key": batch[key].cast(pa.int64()),
            "seq": batch[seq].cast(pa.int64()),
            "ts": batch[ts].cast(pa.int64()),
        }
    )


def _join_src_fp(src) -> str:
    """Stable source identity for checkpoint validation: file set + sizes
    for path sources, the opaque sentinel for in-memory Datasets."""
    if not isinstance(src, str):
        return "dataset"
    import os as _os

    return "|".join(
        f"{p}:{_os.path.getsize(p)}" for p in _resolve_parquet_paths(src)
    )


def _ckpt_resume_or_fresh(
    out_dir: str | None,
    *,
    cfg_fp: str,
    src_fp: str,
    n_actors: int,
    micro_batch_rows: int,
):
    """Adopt the latest checkpoint under ``out_dir`` (validating that the
    resume's routing/config/source match the snapshot's) or start fresh.
    Returns (skip_batches, actor_blobs | None, restored_wm, sink_done,
    late_done, sink_epoch) — the shared resume protocol of every two-log
    streaming consumer (interval join, temporal join)."""
    from ..sinks.exactly_once import adopt_epoch, committed_partitions, late_dir
    from .checkpoint import latest_checkpoint, truncate_staged

    resume_ckpt = latest_checkpoint(out_dir) if out_dir is not None else None
    if resume_ckpt is None:
        sink_done, late_done, sink_epoch = _sink_done_sets(out_dir)
        return 0, None, -(1 << 62), sink_done, late_done, sink_epoch
    skip_batches, ck_meta, ck_blobs = resume_ckpt
    if (
        int(ck_meta["n_actors"]) != n_actors
        or int(ck_meta["micro_batch_rows"]) != micro_batch_rows
    ):
        raise RuntimeError(
            "checkpoint was taken with different n_actors/micro_batch_rows; "
            "resuming would desynchronize routing and batch numbering"
        )
    if ck_meta.get("cfg_fp") != cfg_fp or ck_meta.get("src_fp") != src_fp:
        raise RuntimeError(
            "checkpoint was taken under a different join config or source "
            "set; delete the sink dir to start fresh"
        )
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    sink_epoch = int(ck_meta["epoch"])
    adopt_epoch(out_dir, sink_epoch)
    adopt_epoch(late_dir(out_dir), sink_epoch)
    truncate_staged(out_dir, ck_meta["staged_files"])
    sink_done = frozenset(committed_partitions(out_dir))
    late_done = frozenset(committed_partitions(late_dir(out_dir)))
    return (
        skip_batches,
        ck_blobs,
        int(ck_meta["wm"]),
        sink_done,
        late_done,
        sink_epoch,
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
    num_partitions: int | None = None,
    mode: str = "inner",
    checkpoint_every: int | None = None,
    hot_keys: tuple = (),
    n_salt: int = 1,
    _stop_after_batches: int | None = None,
) -> StreamingResult:
    """Streaming interval equi-join of two logs: emit (key, l_seq, l_ts,
    r_seq, r_ts) for every pair with equal keys and ``band_lo <= r_ts -
    l_ts <= band_hi`` (``band`` = the symmetric ``|l_ts - r_ts| <= band``
    shorthand).  ``*_cols`` = (key, seq, ts) column names per side.  Ray
    must already be initialised by the caller.  ``mode="left_outer"`` also
    emits (key, l_seq, l_ts, -1, -1) for every left row whose band closes
    without a match — the null row fires exactly once, when the watermark
    proves no in-band partner can still arrive; ``mode="full_outer"``
    additionally emits (key, -1, -1, r_seq, r_ts) for unmatched rights.

    ``checkpoint_every`` (sink mode only): every N consumed micro-batches
    (across both logs), drain in-flight ingests, snapshot the join buffers
    + matched bitmaps + staged-file manifest, and publish an atomic
    checkpoint under ``out_dir/_checkpoints`` (pipelines/checkpoint.py —
    the same contract as the keyed-window engine).  When a checkpoint
    exists under ``out_dir``, a rerun RESUMES: actor buffers restore, the
    staged log truncates to the snapshot manifest, and the first
    ``batch_index`` micro-batches of the SAME round-robin interleaving
    skip (the re-read of both logs is the lineage; only the tail
    replays).  The sink's doc_id dedup then commits byte-identical to an
    uninterrupted run.

    ``hot_keys`` + ``n_salt``: HOT-KEY SALTING for skewed logs — a hot
    key's LEFT rows split across ``n_salt`` consecutive actor slots by a
    deterministic hash of their seq, and its RIGHT rows REPLICATE to all
    ``n_salt`` slots (pairs form across sides, so exactly one side may
    split — the asymmetric-replication rule of every salted join; cf. the
    batch ``salted_skew_join``).  Each left row lives in exactly ONE
    actor, so every pair still emits exactly once and left-outer nulls
    still fire exactly once; ``full_outer`` is rejected with salting
    (replicated rights would emit their null S times).  Right-side late
    rows count once per REPLICA in the side output (documented).
    Requires ``n_salt <= n_actors`` (consecutive slots must be distinct
    actors, or two replicas of one right row would meet and double-pair).
    """
    num_partitions = scaled_parts(8, num_partitions)
    from .checkpoint import clear_checkpoints, staged_file_manifest, write_checkpoint

    if checkpoint_every is not None and out_dir is None:
        raise ValueError("checkpoint_every requires sink mode (out_dir)")

    if n_salt > 1:
        if mode == "full_outer":
            raise ValueError("hot-key salting cannot run full_outer "
                             "(replicated rights would null-emit per replica)")
        if n_salt > n_actors:
            raise ValueError("n_salt must be <= n_actors (salt slots must "
                             "be distinct actors)")
    hot = (
        np.array(sorted(int(k) for k in hot_keys), np.int64)
        if hot_keys and n_salt > 1
        else None
    )
    cfg_fp = (
        f"band({band},{band_lo},{band_hi}):mode={mode}:p={num_partitions}"
        f":salt={n_salt}:hot={','.join(str(int(k)) for k in sorted(hot_keys))}"
    )
    src_fp = _join_src_fp(left_source) + "//" + _join_src_fp(right_source)
    (
        skip_batches,
        ck_blobs,
        restored_wm,
        sink_done,
        late_done,
        sink_epoch,
    ) = _ckpt_resume_or_fresh(
        out_dir,
        cfg_fp=cfg_fp,
        src_fp=src_fp,
        n_actors=n_actors,
        micro_batch_rows=micro_batch_rows,
    )
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
    if ck_blobs is not None:
        ray.get([a.restore_state.remote(b) for a, b in zip(actors, ck_blobs)])
    tracker = WatermarkTracker.remote(2, allowed_lateness)

    pair_refs: list = []
    pending: list = []
    wm = restored_wm
    batch_idx = 0
    consumed = 0
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
            if consumed < skip_batches:
                # already absorbed into the restored state — the re-read of
                # both logs IS the lineage; only the tail replays (the
                # round-robin interleaving is deterministic, so batch
                # numbering lines up with the checkpointed run)
                consumed += 1
                continue
            batch = _normalize(raw, *cols[side])
            ts = np.asarray(batch["ts"], np.int64)
            if batch_idx % 4 == 0:
                wm = max(wm, ray.get(tracker.watermark.remote()))
            batch_idx += 1
            keys = np.asarray(batch["key"], np.int64)
            base = _splitmix_route(keys, n_actors)
            if hot is None:
                plan = [
                    (a, np.nonzero(base == a)[0]) for a in range(n_actors)
                ]
            else:
                is_hot = np.isin(keys, hot)
                plan = [
                    (a, np.nonzero((~is_hot) & (base == a))[0])
                    for a in range(n_actors)
                ]
                hidx = np.nonzero(is_hot)[0]
                if hidx.size:
                    if side == 0:
                        # left rows SPLIT: salt by seq hash → one slot each
                        salt = _splitmix_route(
                            np.asarray(batch["seq"], np.int64)[hidx], n_salt
                        )
                        act = (base[hidx] + salt) % n_actors
                        plan += [
                            (int(a), hidx[act == a]) for a in np.unique(act)
                        ]
                    else:
                        # right rows REPLICATE to every salt slot
                        for j in range(n_salt):
                            act = (base[hidx] + j) % n_actors
                            plan += [
                                (int(a), hidx[act == a])
                                for a in np.unique(act)
                            ]
            for a, idx in plan:
                if idx.size == 0:
                    continue
                pending.append(actors[a].ingest.remote(side, batch.take(idx), wm))
            tracker.update.remote(side, int(ts.max()))
            consumed += 1
            if len(pending) >= n_actors * 4:
                done, pending = pending[: n_actors * 2], pending[n_actors * 2 :]
                for tables, _ in ray.get(done):
                    pair_refs.extend(tables)
            if (
                checkpoint_every is not None
                and consumed > skip_batches
                and consumed % checkpoint_every == 0
            ):
                # barrier: every sent ingest absorbed before the snapshot
                for tables, _ in ray.get(pending):
                    pair_refs.extend(tables)
                pending = []
                blobs = ray.get([a.checkpoint_state.remote() for a in actors])
                write_checkpoint(
                    out_dir,
                    consumed,
                    blobs,
                    {
                        "epoch": sink_epoch,
                        "wm": wm,
                        "n_actors": n_actors,
                        "micro_batch_rows": micro_batch_rows,
                        "cfg_fp": cfg_fp,
                        "src_fp": src_fp,
                        "staged_files": staged_file_manifest(out_dir),
                    },
                )
            if _stop_after_batches is not None and consumed >= _stop_after_batches:
                raise RuntimeError(f"injected stop after {consumed} batches")

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
        res = _finalize_sink(actors, stats, late, out_dir, sink_epoch)
        # a successful finalize makes the checkpoints dead weight
        clear_checkpoints(out_dir)
        return res

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
    num_partitions: int | None = None,
    checkpoint_every: int | None = None,
    _stop_after_batches: int | None = None,
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
    flushes the tail once both logs end.

    ``checkpoint_every`` / resume: the same snapshot contract as
    :func:`run_streaming_join` (dimension + pending-event buffers pickle;
    staged manifest truncates; the deterministic round-robin interleaving
    makes the skipped prefix line up)."""
    num_partitions = scaled_parts(8, num_partitions)
    from .checkpoint import clear_checkpoints, staged_file_manifest, write_checkpoint

    if checkpoint_every is not None and out_dir is None:
        raise ValueError("checkpoint_every requires sink mode (out_dir)")
    cfg_fp = f"temporal:p={num_partitions}"
    src_fp = _join_src_fp(dim_source) + "//" + _join_src_fp(event_source)
    (
        skip_batches,
        ck_blobs,
        restored_wm,
        sink_done,
        late_done,
        sink_epoch,
    ) = _ckpt_resume_or_fresh(
        out_dir,
        cfg_fp=cfg_fp,
        src_fp=src_fp,
        n_actors=n_actors,
        micro_batch_rows=micro_batch_rows,
    )
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
    if ck_blobs is not None:
        ray.get([a.restore_state.remote(b) for a, b in zip(actors, ck_blobs)])
    tracker = WatermarkTracker.remote(2, allowed_lateness)

    out_refs: list = []
    pending: list = []
    wm = restored_wm
    batch_idx = 0
    consumed = 0
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
            if consumed < skip_batches:
                consumed += 1
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
            consumed += 1
            if len(pending) >= n_actors * 4:
                done, pending = pending[: n_actors * 2], pending[n_actors * 2 :]
                for tables, _ in ray.get(done):
                    out_refs.extend(tables)
            if (
                checkpoint_every is not None
                and consumed > skip_batches
                and consumed % checkpoint_every == 0
            ):
                for tables, _ in ray.get(pending):
                    out_refs.extend(tables)
                pending = []
                blobs = ray.get([a.checkpoint_state.remote() for a in actors])
                write_checkpoint(
                    out_dir,
                    consumed,
                    blobs,
                    {
                        "epoch": sink_epoch,
                        "wm": wm,
                        "n_actors": n_actors,
                        "micro_batch_rows": micro_batch_rows,
                        "cfg_fp": cfg_fp,
                        "src_fp": src_fp,
                        "staged_files": staged_file_manifest(out_dir),
                    },
                )
            if _stop_after_batches is not None and consumed >= _stop_after_batches:
                raise RuntimeError(f"injected stop after {consumed} batches")

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
        res = _finalize_sink(actors, stats, late, out_dir, sink_epoch)
        clear_checkpoints(out_dir)
        return res

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
    hot_keys: tuple = (),
    n_salt: int = 1,
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
        hot_keys=hot_keys,
        n_salt=n_salt,
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
