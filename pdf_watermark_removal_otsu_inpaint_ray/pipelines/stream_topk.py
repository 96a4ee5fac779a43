"""Streaming windowed top-k pipeline: continuous per-window leaderboards.

Single-read arrival-order consumption (the log contract of
:mod:`.streaming`); rows route to a :class:`TopkStateActor` pool by KEY
hash (a key's window count completes inside one actor — the partitioning
assumption the local-top-k/global-merge split relies on).  Each actor
emits its LOCAL top-k rows when the watermark closes a window; the driver
merges the k x actors candidate rows per window and trims to the global
top-k with ranks — output-scale driver traffic by construction (this
operator's OUTPUT is k rows per window, so no sink-direct mode is needed;
late rows are counted + returned, the keyed_state contract).

Determinism: window counts are complete at close (watermark ≤ min frontier
− lateness), ties rank (count DESC, key ASC) — the result is a pure
function of the log for any micro-batch size, actor count, or arrival
interleaving within the lateness bound.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..state.dedup_state import _splitmix_route
from ..state.watermark_tracker import WatermarkTracker
from .streaming import StreamingResult, _arrival_batches


def run_streaming_topk(
    source,
    *,
    window_size: int,
    k: int = 5,
    key_col: str = "user_id",
    ts_col: str = "event_ts",
    allowed_lateness: int = 32,
    n_actors: int = 4,
    micro_batch_rows: int = 512,
    slide: int | None = None,
) -> StreamingResult:
    """Run the streaming windowed top-k over a Parquet path / Dataset.
    Ray must already be initialised by the caller.  Returns a
    StreamingResult whose ``output`` is ``(window_id, key, cnt, rnk)``
    with ``rnk`` 1..k per window (count DESC, key ASC).  ``slide`` < 
    window_size runs SLIDING windows (each row joins its ws/slide
    overlapping windows inside the actor; window_id = start // slide)."""
    from ..state.topk_state import TopkStateActor

    actors = [
        TopkStateActor.remote(
            window_size=window_size, k=k, key_col=key_col, ts_col=ts_col,
            slide=slide,
        )
        for _ in range(n_actors)
    ]
    tracker = WatermarkTracker.remote(1, allowed_lateness)

    cand: list = []
    pending: list = []
    wm = -(1 << 62)
    batch_idx = 0
    for batch in _arrival_batches(source, micro_batch_rows):
        ts = np.asarray(batch[ts_col], dtype=np.int64)
        if batch_idx % 4 == 0:
            wm = max(wm, ray.get(tracker.watermark.remote()))
        batch_idx += 1
        route = _splitmix_route(np.asarray(batch[key_col], np.int64), n_actors)
        for a in range(n_actors):
            idx = np.nonzero(route == a)[0]
            if idx.size == 0:
                continue
            pending.append(actors[a].ingest.remote(batch.take(idx), wm))
        tracker.update.remote(0, int(ts.max()))
        if len(pending) >= n_actors * 4:
            done, pending = pending[: n_actors * 2], pending[n_actors * 2 :]
            for tables, _ in ray.get(done):
                cand.extend(tables)

    for tables, _ in ray.get(pending):
        cand.extend(tables)
    for flushed in ray.get([a.flush.remote() for a in actors]):
        cand.extend(flushed)

    late_tables = [
        t for t in ray.get([a.late_rows.remote() for a in actors]) if t is not None
    ]
    stats = ray.get([a.state_stats.remote() for a in actors])
    late = pa.concat_tables(late_tables) if late_tables else None

    if not cand:
        out = pa.table(
            {
                "window_id": pa.array([], pa.int64()),
                key_col: pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
    else:
        # global trim of the k x actors x windows candidate rows
        t = pa.concat_tables(cand)
        w = np.asarray(t["window_id"], np.int64)
        kk = np.asarray(t[key_col], np.int64)
        c = np.asarray(t["cnt"], np.int64)
        o = np.lexsort((kk, -c, w))
        w, kk, c = w[o], kk[o], c[o]
        first = np.concatenate(([True], w[1:] != w[:-1]))
        idx = np.arange(w.size, dtype=np.int64)
        start = np.maximum.accumulate(np.where(first, idx, 0))
        rnk = idx - start + 1
        keep = rnk <= k
        out = pa.table(
            {
                "window_id": pa.array(w[keep], pa.int64()),
                key_col: pa.array(kk[keep], pa.int64()),
                "cnt": pa.array(c[keep], pa.int64()),
                "rnk": pa.array(rnk[keep], pa.int64()),
            }
        )

    return StreamingResult(
        output=out,
        late=late,
        n_late=sum(s["n_late"] for s in stats),
        actor_stats=stats,
    )


def run_streaming_distinct(
    source,
    *,
    window_size: int,
    key_col: str = "user_id",
    ts_col: str = "event_ts",
    allowed_lateness: int = 32,
    n_actors: int = 4,
    micro_batch_rows: int = 512,
) -> StreamingResult:
    """Streaming EXACT count(DISTINCT key) per tumbling window — the same
    key-routed state pool (keys are disjoint across actors, so the global
    distinct count of a window is the SUM of per-actor cell counts at
    close).  Returns ``(window_id, n_distinct)``; per-window driver traffic
    is one int64 row per actor."""
    from ..state.topk_state import TopkStateActor

    actors = [
        TopkStateActor.remote(
            window_size=window_size, k=1, key_col=key_col, ts_col=ts_col,
            emit="distinct",
        )
        for _ in range(n_actors)
    ]
    tracker = WatermarkTracker.remote(1, allowed_lateness)

    cand: list = []
    pending: list = []
    wm = -(1 << 62)
    batch_idx = 0
    for batch in _arrival_batches(source, micro_batch_rows):
        ts = np.asarray(batch[ts_col], dtype=np.int64)
        if batch_idx % 4 == 0:
            wm = max(wm, ray.get(tracker.watermark.remote()))
        batch_idx += 1
        route = _splitmix_route(np.asarray(batch[key_col], np.int64), n_actors)
        for a in range(n_actors):
            idx = np.nonzero(route == a)[0]
            if idx.size == 0:
                continue
            pending.append(actors[a].ingest.remote(batch.take(idx), wm))
        tracker.update.remote(0, int(ts.max()))
        if len(pending) >= n_actors * 4:
            done, pending = pending[: n_actors * 2], pending[n_actors * 2 :]
            for tables, _ in ray.get(done):
                cand.extend(tables)

    for tables, _ in ray.get(pending):
        cand.extend(tables)
    for flushed in ray.get([a.flush.remote() for a in actors]):
        cand.extend(flushed)

    late_tables = [
        t for t in ray.get([a.late_rows.remote() for a in actors]) if t is not None
    ]
    stats = ray.get([a.state_stats.remote() for a in actors])
    late = pa.concat_tables(late_tables) if late_tables else None

    if not cand:
        out = pa.table(
            {
                "window_id": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
            }
        )
    else:
        t = pa.concat_tables(cand)
        w = np.asarray(t["window_id"], np.int64)
        c = np.asarray(t["n_distinct"], np.int64)
        wu, inv = np.unique(w, return_inverse=True)
        sums = np.bincount(inv, weights=c, minlength=wu.size).astype(np.int64)
        out = pa.table(
            {
                "window_id": pa.array(wu, pa.int64()),
                "n_distinct": pa.array(sums, pa.int64()),
            }
        )

    return StreamingResult(
        output=out,
        late=late,
        n_late=sum(s["n_late"] for s in stats),
        actor_stats=stats,
    )


def run_streaming_quantiles(
    source,
    *,
    window_size: int,
    probs: tuple[float, ...] = (0.5, 0.9),
    key_col: str = "bin",
    ts_col: str = "event_ts",
    allowed_lateness: int = 32,
    n_actors: int = 4,
    micro_batch_rows: int = 512,
    slide: int | None = None,
) -> StreamingResult:
    """Streaming EXACT per-window quantiles of a bounded-domain integer
    value (``key_col`` is the value BIN) — the additive-histogram trick:
    rows route by bin hash, each actor keeps sparse (window, bin) -> count
    state (the topk state array, emit="hist"), a closed window emits its
    local sparse histogram, and the driver folds actors x bins cells into
    ``quantile_disc`` answers (index ceil(q*n) - 1 over the bin-sorted
    cumulative counts — DuckDB's discrete-quantile rule) plus the window
    row count.  Per-window driver traffic is the number of DISTINCT bins
    (bounded by the value domain), never the row count — the same partial
    shape as the flagship's 256-bin A1 histograms, lifted to event time
    with watermark-driven close.  ``slide`` < window_size runs SLIDING
    windows (each row joins its ws/slide overlapping windows inside the
    actor — the same state-expansion the sliding top-k documents;
    window_id = start // slide)."""
    import math

    from ..state.topk_state import TopkStateActor

    actors = [
        TopkStateActor.remote(
            window_size=window_size, k=1, key_col=key_col, ts_col=ts_col,
            emit="hist", slide=slide,
        )
        for _ in range(n_actors)
    ]
    tracker = WatermarkTracker.remote(1, allowed_lateness)

    cand: list = []
    pending: list = []
    wm = -(1 << 62)
    batch_idx = 0
    for batch in _arrival_batches(source, micro_batch_rows):
        ts = np.asarray(batch[ts_col], dtype=np.int64)
        if batch_idx % 4 == 0:
            wm = max(wm, ray.get(tracker.watermark.remote()))
        batch_idx += 1
        route = _splitmix_route(np.asarray(batch[key_col], np.int64), n_actors)
        for a in range(n_actors):
            idx = np.nonzero(route == a)[0]
            if idx.size == 0:
                continue
            pending.append(actors[a].ingest.remote(batch.take(idx), wm))
        tracker.update.remote(0, int(ts.max()))
        if len(pending) >= n_actors * 4:
            done, pending = pending[: n_actors * 2], pending[n_actors * 2 :]
            for tables, _ in ray.get(done):
                cand.extend(tables)

    for tables, _ in ray.get(pending):
        cand.extend(tables)
    for flushed in ray.get([a.flush.remote() for a in actors]):
        cand.extend(flushed)

    late_tables = [
        t for t in ray.get([a.late_rows.remote() for a in actors]) if t is not None
    ]
    stats = ray.get([a.state_stats.remote() for a in actors])
    late = pa.concat_tables(late_tables) if late_tables else None

    pcols = [f"p{int(round(q * 100))}" for q in probs]
    if not cand:
        out = pa.table(
            {
                "window_id": pa.array([], pa.int64()),
                **{pc_: pa.array([], pa.int64()) for pc_ in pcols},
                "n": pa.array([], pa.int64()),
            }
        )
    else:
        # fold the actors x windows x bins sparse cells: one lexsort by
        # (window, bin) — cells are already unique across actors (bin-hash
        # routing), so the cumulative count per window reads directly off
        # the sorted runs
        t = pa.concat_tables(cand)
        w = np.asarray(t["window_id"], np.int64)
        b = np.asarray(t[key_col], np.int64)
        c = np.asarray(t["cnt"], np.int64)
        o = np.lexsort((b, w))
        w, b, c = w[o], b[o], c[o]
        first = np.concatenate(([True], w[1:] != w[:-1]))
        wu = w[first]
        starts = np.nonzero(first)[0]
        ends = np.concatenate((starts[1:], [w.size]))
        cs = np.cumsum(c)
        base = np.concatenate(([0], cs))[starts]
        totals = cs[ends - 1] - base
        cols: dict[str, list[int]] = {pc_: [] for pc_ in pcols}
        for s, e, nb, tot in zip(starts, ends, base, totals):
            run = cs[s:e] - nb
            for q, pc_ in zip(probs, pcols):
                target = math.ceil(q * tot)
                cols[pc_].append(int(b[s + np.searchsorted(run, target)]))
        out = pa.table(
            {
                "window_id": pa.array(wu, pa.int64()),
                **{pc_: pa.array(cols[pc_], pa.int64()) for pc_ in pcols},
                "n": pa.array(totals.astype(np.int64), pa.int64()),
            }
        )

    return StreamingResult(
        output=out,
        late=late,
        n_late=sum(s["n_late"] for s in stats),
        actor_stats=stats,
    )
