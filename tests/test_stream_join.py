"""Two-log streaming interval join (state/join_state.py +
pipelines/stream_join.py): brute-force pair-set equality, band
inclusivity, layout invariance, state eviction bound, sink mode."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_join import (
    run_streaming_join,
)


def _log(n, *, seed, keys=13, step=3, jitter=0):
    """A ts-sorted log: seq i at ts ~ i*step (+bounded jitter pre-sort),
    key drawn deterministically."""
    rng = np.random.default_rng(seed)
    ts = np.sort(np.arange(n) * step + rng.integers(0, jitter + 1, n))
    return pa.table(
        {
            "key": pa.array(rng.integers(0, keys, n), pa.int64()),
            "seq": pa.array(np.arange(n), pa.int64()),
            "event_ts": pa.array(ts, pa.int64()),
        }
    )


def _brute_pairs(lt: pa.Table, rt: pa.Table, band: int):
    lk = np.asarray(lt["key"], np.int64)
    rk = np.asarray(rt["key"], np.int64)
    lts = np.asarray(lt["event_ts"], np.int64)
    rts = np.asarray(rt["event_ts"], np.int64)
    ls = np.asarray(lt["seq"], np.int64)
    rs = np.asarray(rt["seq"], np.int64)
    m = (lk[:, None] == rk[None, :]) & (
        np.abs(lts[:, None] - rts[None, :]) <= band
    )
    li, ri = np.nonzero(m)
    return sorted(zip(ls[li].tolist(), rs[ri].tolist()))


def _got_pairs(res):
    if res.output is None:
        return []
    return sorted(
        zip(
            np.asarray(res.output["l_seq"], np.int64).tolist(),
            np.asarray(res.output["r_seq"], np.int64).tolist(),
        )
    )


def test_join_matches_brute_force(ray_session, tmp_path):
    lt, rt = _log(300, seed=1), _log(200, seed=2)
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(lt, lp)
    pq.write_table(rt, rp)
    res = run_streaming_join(lp, rp, band=6, n_actors=3, micro_batch_rows=64)
    assert res.n_late == 0
    assert _got_pairs(res) == _brute_pairs(lt, rt, 6)
    # band is INCLUSIVE: ts values are multiples of 3, so |delta| == 6
    # pairs exist and must appear at band 6
    got = res.output
    deltas = np.abs(
        np.asarray(got["l_ts"], np.int64) - np.asarray(got["r_ts"], np.int64)
    )
    assert deltas.max() == 6


def test_join_layout_invariance(ray_session, tmp_path):
    lt, rt = _log(150, seed=3), _log(150, seed=4)
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(lt, lp)
    pq.write_table(rt, rp)
    outs = []
    for n_actors, mb in ((1, 512), (4, 17)):
        res = run_streaming_join(
            lp, rp, band=5, n_actors=n_actors, micro_batch_rows=mb
        )
        outs.append(_got_pairs(res))
    assert outs[0] == outs[1] == _brute_pairs(lt, rt, 5)


def test_join_state_eviction_bounded(ray_session, tmp_path):
    # long logs, tiny band: buffered rows must track the band window,
    # not the log length
    lt, rt = _log(3000, seed=5, keys=7), _log(3000, seed=6, keys=7)
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(lt, lp)
    pq.write_table(rt, rp)
    res = run_streaming_join(lp, rp, band=9, n_actors=1, micro_batch_rows=128)
    assert _got_pairs(res) == _brute_pairs(lt, rt, 9)
    s = res.actor_stats[0]
    # band 9 / step 3 ≈ 3-4 live rows per side per frontier + micro-batch
    # slack; far below the 3000-row log
    assert s["buffered_left"] + s["buffered_right"] < 600


def test_join_unequal_log_lengths(ray_session, tmp_path):
    # the shorter log closes its tracker partition; the longer keeps
    # joining (and evicting) against the closed side's buffered tail
    lt, rt = _log(50, seed=7), _log(400, seed=8)
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(lt, lp)
    pq.write_table(rt, rp)
    res = run_streaming_join(lp, rp, band=11, n_actors=2, micro_batch_rows=32)
    assert _got_pairs(res) == _brute_pairs(lt, rt, 11)


def test_join_kill_and_replay_resumes_byte_identical(ray_session, tmp_path):
    """A join run that dies mid-commit replays both logs; the sink's
    committed partitions are skipped (sink_done adopted by the actors) and
    the final output is byte-identical to an uninterrupted run."""
    import pytest
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        committed_partitions,
        read_output,
        write_exactly_once,
    )

    def collect(d):
        return pa.concat_tables(
            [pa.table(b) for b in read_output(d).iter_batches(batch_format="pyarrow")]
        ).sort_by("doc_id")

    lt, rt = _log(250, seed=11), _log(250, seed=12)
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(lt, lp)
    pq.write_table(rt, rp)
    kw = dict(band=8, n_actors=2, micro_batch_rows=64, num_partitions=6)

    clean = str(tmp_path / "clean")
    run_streaming_join(lp, rp, **kw, out_dir=clean)

    # crashed attempt: pairs computed but the sink dies before partition 2
    crash = str(tmp_path / "crash")
    res = run_streaming_join(lp, rp, band=8, n_actors=2, micro_batch_rows=64)
    with pytest.raises(Exception):
        write_exactly_once(
            ray.data.from_arrow(res.output), crash, num_partitions=6,
            fail_partitions=frozenset({2}),
        )
    assert 2 not in committed_partitions(crash)

    # resume: replay both logs (state rebuilds), sink skips committed parts
    run_streaming_join(lp, rp, **kw, out_dir=crash)
    assert committed_partitions(crash) == set(range(6))
    assert collect(crash).equals(collect(clean))


def test_join_late_rows_routed_and_staged(ray_session, tmp_path):
    """A row arriving behind the watermark is LATE: counted, excluded from
    pair probing, and routed — to actor memory in driver mode, to the
    ``<sink>/_late`` staged layout (not actor memory) in sink mode."""
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_late,
    )

    # arrival order carries ts=5 after both frontiers reached 3000: with
    # micro_batch_rows=1 the driver refreshes its cached watermark on the
    # very batch that delivers it (batch_idx 8), so it is late everywhere
    def tbl(ts_arrival):
        return pa.table(
            {
                "key": pa.array([1] * len(ts_arrival), pa.int64()),
                "seq": pa.array(np.arange(len(ts_arrival)), pa.int64()),
                "event_ts": pa.array(ts_arrival, pa.int64()),
            }
        )

    lt = tbl([0, 1000, 2000, 3000, 5])
    rt = tbl([0, 1000, 2000, 3000, 4000])
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(lt, lp)
    pq.write_table(rt, rp)

    kw = dict(band=10, allowed_lateness=1, n_actors=1, micro_batch_rows=1)
    driver = run_streaming_join(lp, rp, **kw)
    assert driver.n_late == 1
    assert driver.late is not None and driver.late.num_rows == 1
    assert driver.late["ts"][0].as_py() == 5 and driver.late["side"][0].as_py() == 0
    # the late row never probes: only the ts-equal pairs remain
    assert _got_pairs(driver) == [(0, 0), (1, 1), (2, 2), (3, 3)]

    out_dir = str(tmp_path / "sink")
    sink = run_streaming_join(lp, rp, **kw, out_dir=out_dir)
    assert sink.n_late == 1
    assert sink.late is None or sink.late.num_rows == 0  # not actor memory
    staged = read_late(out_dir).to_pandas()
    assert len(staged) == 1
    assert staged["ts"].iloc[0] == 5 and staged["side"].iloc[0] == 0


def test_join_sink_mode_equals_driver_mode(ray_session, tmp_path):
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_output,
    )

    lt, rt = _log(200, seed=9), _log(200, seed=10)
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(lt, lp)
    pq.write_table(rt, rp)
    driver = run_streaming_join(lp, rp, band=6, n_actors=2)
    out_dir = str(tmp_path / "sink")
    sink = run_streaming_join(lp, rp, band=6, n_actors=2, out_dir=out_dir)
    assert sink.output is None
    got = (
        read_output(out_dir)
        .to_pandas()
        .sort_values(["l_seq", "r_seq"], ignore_index=True)
    )
    cols = [c for c in ("key", "l_seq", "l_ts", "r_seq", "r_ts") if c in got]
    want = driver.output.select(cols).to_pandas()
    assert got[cols].equals(want)


# --- streaming temporal (versioned-dimension) join --------------------------

from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_join import (  # noqa: E402
    run_streaming_temporal_join,
)


def _brute_temporal(dim: pa.Table, ev: pa.Table):
    """Per event: latest dim version with same key and d_ts <= e_ts,
    tie on ts -> highest seq; else (-1, -1)."""
    dk = np.asarray(dim["key"], np.int64)
    ds = np.asarray(dim["seq"], np.int64)
    dt = np.asarray(dim["event_ts"], np.int64)
    out = []
    for k, s, t in zip(
        np.asarray(ev["key"], np.int64),
        np.asarray(ev["seq"], np.int64),
        np.asarray(ev["event_ts"], np.int64),
    ):
        m = (dk == k) & (dt <= t)
        if m.any():
            i = np.flatnonzero(m)
            best = i[np.lexsort((ds[i], dt[i]))[-1]]
            out.append((int(s), int(t), int(ds[best]), int(dt[best])))
        else:
            out.append((int(s), int(t), -1, -1))
    return sorted(out)


def _got_temporal(res):
    if res.output is None:
        return []
    o = res.output
    return sorted(
        zip(
            np.asarray(o["e_seq"], np.int64).tolist(),
            np.asarray(o["e_ts"], np.int64).tolist(),
            np.asarray(o["d_seq"], np.int64).tolist(),
            np.asarray(o["d_ts"], np.int64).tolist(),
        )
    )


def test_temporal_join_matches_brute_and_left_nulls(ray_session, tmp_path):
    dim, ev = _log(120, seed=21, keys=9, step=5), _log(300, seed=22, keys=9)
    dp, ep = str(tmp_path / "d.parquet"), str(tmp_path / "e.parquet")
    pq.write_table(dim, dp)
    pq.write_table(ev, ep)
    res = run_streaming_temporal_join(dp, ep, n_actors=3, micro_batch_rows=64)
    assert res.n_late == 0
    got = _got_temporal(res)
    assert got == _brute_temporal(dim, ev)
    # every event emits exactly once (LEFT semantics), some with sentinels
    assert len(got) == ev.num_rows
    assert any(g[2] == -1 for g in got)  # early events precede any version


def test_temporal_join_ts_tie_takes_highest_seq(ray_session, tmp_path):
    # two dim versions at the SAME (key, ts): the higher seq must win
    dim = pa.table(
        {
            "key": pa.array([1, 1, 1, 1], pa.int64()),
            "seq": pa.array([0, 1, 2, 3], pa.int64()),
            "event_ts": pa.array([10, 10, 20, 20], pa.int64()),
        }
    )
    ev = pa.table(
        {
            "key": pa.array([1, 1, 1], pa.int64()),
            "seq": pa.array([0, 1, 2], pa.int64()),
            "event_ts": pa.array([10, 15, 25], pa.int64()),
        }
    )
    dp, ep = str(tmp_path / "d.parquet"), str(tmp_path / "e.parquet")
    pq.write_table(dim, dp)
    pq.write_table(ev, ep)
    res = run_streaming_temporal_join(dp, ep, n_actors=1, micro_batch_rows=2)
    assert _got_temporal(res) == [(0, 10, 1, 10), (1, 15, 1, 10), (2, 25, 3, 20)]


def test_temporal_join_layout_invariance_and_eviction(ray_session, tmp_path):
    dim, ev = _log(900, seed=23, keys=5), _log(900, seed=24, keys=5)
    dp, ep = str(tmp_path / "d.parquet"), str(tmp_path / "e.parquet")
    pq.write_table(dim, dp)
    pq.write_table(ev, ep)
    outs, stats = [], []
    # micro-batches small enough that the driver's cached watermark
    # refreshes many times (it polls every 4th batch) — eviction and
    # mid-stream finalization need an advancing watermark
    for n_actors, mb in ((1, 96), (4, 23)):
        res = run_streaming_temporal_join(
            dp, ep, n_actors=n_actors, micro_batch_rows=mb
        )
        outs.append(_got_temporal(res))
        stats.append(res.actor_stats)
    assert outs[0] == outs[1] == _brute_temporal(dim, ev)
    # superseded versions evict: the single-actor dim buffer holds ~one
    # version per key per horizon, never the 900-row dim log
    s = stats[0][0]
    assert s["buffered_dim"] < 200
    assert s["buffered_events"] < 200


def test_temporal_join_sink_mode_equals_driver_mode(ray_session, tmp_path):
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_output,
    )

    dim, ev = _log(200, seed=25, keys=7), _log(200, seed=26, keys=7)
    dp, ep = str(tmp_path / "d.parquet"), str(tmp_path / "e.parquet")
    pq.write_table(dim, dp)
    pq.write_table(ev, ep)
    driver = run_streaming_temporal_join(dp, ep, n_actors=2, micro_batch_rows=32)
    out_dir = str(tmp_path / "sink")
    sink = run_streaming_temporal_join(
        dp, ep, n_actors=2, micro_batch_rows=32, out_dir=out_dir,
    )
    assert sink.output is None
    staged = pa.concat_tables(
        [pa.table(b) for b in read_output(out_dir).iter_batches(batch_format="pyarrow")]
    )
    got = sorted(
        zip(
            np.asarray(staged["e_seq"], np.int64).tolist(),
            np.asarray(staged["e_ts"], np.int64).tolist(),
            np.asarray(staged["d_seq"], np.int64).tolist(),
            np.asarray(staged["d_ts"], np.int64).tolist(),
        )
    )
    assert got == _got_temporal(driver) == _brute_temporal(dim, ev)


def test_temporal_join_kill_and_replay_resumes_byte_identical(ray_session, tmp_path):
    """Temporal-join sink run that dies mid-commit: the replay adopts the
    committed partitions and the final layout is byte-identical to an
    uninterrupted run (same protocol as the interval join)."""
    import pytest
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        committed_partitions,
        read_output,
        write_exactly_once,
    )

    def collect(d):
        return pa.concat_tables(
            [pa.table(b) for b in read_output(d).iter_batches(batch_format="pyarrow")]
        ).sort_by("doc_id")

    dim, ev = _log(220, seed=31, keys=8), _log(220, seed=32, keys=8)
    dp, ep = str(tmp_path / "d.parquet"), str(tmp_path / "e.parquet")
    pq.write_table(dim, dp)
    pq.write_table(ev, ep)
    kw = dict(n_actors=2, micro_batch_rows=48, num_partitions=6)

    clean = str(tmp_path / "clean")
    run_streaming_temporal_join(dp, ep, **kw, out_dir=clean)

    crash = str(tmp_path / "crash")
    res = run_streaming_temporal_join(dp, ep, n_actors=2, micro_batch_rows=48)
    with pytest.raises(Exception):
        write_exactly_once(
            ray.data.from_arrow(res.output), crash, num_partitions=6,
            fail_partitions=frozenset({3}),
        )
    assert 3 not in committed_partitions(crash)

    run_streaming_temporal_join(dp, ep, **kw, out_dir=crash)
    assert committed_partitions(crash) == set(range(6))
    assert collect(crash).equals(collect(clean))


def test_temporal_join_disorder_within_lateness(ray_session, tmp_path):
    """Arrival disorder covered by allowed_lateness: the output still
    equals the brute per-event latest-version lookup (no late rows)."""
    rng = np.random.default_rng(41)
    base_d, base_e = _log(400, seed=42, keys=6), _log(400, seed=43, keys=6)

    def scramble(t: pa.Table, block: int = 8) -> pa.Table:
        # permute arrival order within blocks: max ts regression between
        # consecutive arrivals is one block span (block*step)
        n = t.num_rows
        idx = np.arange(n)
        for s in range(0, n, block):
            seg = idx[s: s + block]
            rng.shuffle(seg)
        return t.take(pa.array(idx, pa.int64()))

    dim, ev = scramble(base_d), scramble(base_e)
    dp, ep = str(tmp_path / "d.parquet"), str(tmp_path / "e.parquet")
    pq.write_table(dim, dp)
    pq.write_table(ev, ep)
    res = run_streaming_temporal_join(
        dp, ep, allowed_lateness=3 * 8 + 1, n_actors=2, micro_batch_rows=32,
    )
    assert res.n_late == 0
    assert _got_temporal(res) == _brute_temporal(base_d, base_e)


def _brute_outer(lt: pa.Table, rt: pa.Table, band: int):
    inner = _brute_pairs(lt, rt, band)
    matched = {l for l, _ in inner}
    nulls = [
        (int(s), -1)
        for s in np.asarray(lt["seq"], np.int64)
        if int(s) not in matched
    ]
    return sorted(inner + nulls)


def test_left_outer_join_matches_brute_and_nulls_fire_once(ray_session):
    lt = _log(600, seed=3, jitter=2)
    rt = _log(380, seed=4, jitter=2)
    band = 9
    exp = _brute_outer(lt, rt, band)
    assert any(r == -1 for _, r in exp) and any(r != -1 for _, r in exp)
    for n_actors, mb in ((1, 5000), (3, 117)):
        res = run_streaming_join(
            ray.data.from_arrow(lt),
            ray.data.from_arrow(rt),
            band=band,
            allowed_lateness=8,
            n_actors=n_actors,
            micro_batch_rows=mb,
            mode="left_outer",
        )
        got = _got_pairs(res)
        assert got == exp, f"actors={n_actors} mb={mb}"
        # exactly-once: every left seq appears either matched or as one null
        lseqs = [l for l, r in got if r == -1]
        assert len(lseqs) == len(set(lseqs))
        assert res.n_late == 0


def test_full_outer_join_matches_brute(ray_session):
    lt = _log(500, seed=6, jitter=2, keys=30)
    rt = _log(320, seed=7, jitter=2, keys=30)
    band = 7
    inner = _brute_pairs(lt, rt, band)
    lm = {l for l, _ in inner}
    rm = {r for _, r in inner}
    exp = sorted(
        inner
        + [(int(s), -1) for s in np.asarray(lt["seq"], np.int64) if int(s) not in lm]
        + [(-1, int(s)) for s in np.asarray(rt["seq"], np.int64) if int(s) not in rm]
    )
    for n_actors, mb in ((1, 5000), (3, 141)):
        res = run_streaming_join(
            ray.data.from_arrow(lt),
            ray.data.from_arrow(rt),
            band=band,
            allowed_lateness=8,
            n_actors=n_actors,
            micro_batch_rows=mb,
            mode="full_outer",
        )
        got = _got_pairs(res)
        assert got == exp, f"actors={n_actors} mb={mb}"
        # exactly-once nulls on both sides
        ln = [l for l, r in got if r == -1]
        rn = [r for l, r in got if l == -1]
        assert len(ln) == len(set(ln)) and len(rn) == len(set(rn))


def _brute_directed(lt, rt, lo, hi):
    lk = np.asarray(lt["key"], np.int64)
    rk = np.asarray(rt["key"], np.int64)
    lts = np.asarray(lt["event_ts"], np.int64)
    rts = np.asarray(rt["event_ts"], np.int64)
    ls = np.asarray(lt["seq"], np.int64)
    rs = np.asarray(rt["seq"], np.int64)
    d = rts[None, :] - lts[:, None]
    m = (lk[:, None] == rk[None, :]) & (d >= lo) & (d <= hi)
    li, ri = np.nonzero(m)
    return sorted(zip(ls[li].tolist(), rs[ri].tolist()))


def test_directed_band_join_matches_brute(ray_session):
    """band_lo/band_hi: the one-sided (r.ts after l.ts) interval join —
    pair set equal to brute force, bounds inclusive at both edges, layout
    invariant."""
    import ray.data

    lt, rt = _log(250, seed=7), _log(250, seed=8)
    exp = _brute_directed(lt, rt, 1, 9)
    for n_actors, mb in ((1, 4000), (3, 64)):
        res = run_streaming_join(
            ray.data.from_arrow(lt),
            ray.data.from_arrow(rt),
            band_lo=1,
            band_hi=9,
            n_actors=n_actors,
            micro_batch_rows=mb,
        )
        assert res.n_late == 0
        assert _got_pairs(res) == exp, f"actors={n_actors}"
    # directed: no pair may have r_ts <= l_ts
    d = np.asarray(res.output["r_ts"], np.int64) - np.asarray(
        res.output["l_ts"], np.int64
    )
    assert d.min() >= 1 and d.max() <= 9


def test_streaming_timeouts_matches_brute(ray_session):
    """Absence detection: alert exactly the anchors with no same-key
    cancel in (ts, ts+h]; exactly once; invariant to actors/micro-batch."""
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_join import (
        run_streaming_timeouts,
    )

    anchors, cancels = _log(300, seed=11), _log(220, seed=12)
    h = 12
    matched = {a for a, _ in _brute_directed(anchors, cancels, 1, h)}
    exp = sorted(set(np.asarray(anchors["seq"], np.int64).tolist()) - matched)
    for n_actors, mb in ((1, 4000), (3, 64)):
        res = run_streaming_timeouts(
            ray.data.from_arrow(anchors),
            ray.data.from_arrow(cancels),
            horizon=h,
            n_actors=n_actors,
            micro_batch_rows=mb,
        )
        got = sorted(np.asarray(res.output["anchor_seq"], np.int64).tolist())
        assert got == exp, f"actors={n_actors}"
        assert res.n_late == 0
    # alert payload carries the anchor's own key/ts
    a_ts = {
        int(s): int(t)
        for s, t in zip(
            np.asarray(anchors["seq"], np.int64),
            np.asarray(anchors["event_ts"], np.int64),
        )
    }
    for s, t in zip(
        np.asarray(res.output["anchor_seq"], np.int64),
        np.asarray(res.output["anchor_ts"], np.int64),
    ):
        assert a_ts[int(s)] == int(t)


def test_join_checkpoint_kill_and_replay_byte_identical(ray_session, tmp_path):
    """Checkpointed sink-mode join: kill mid-stream after a checkpoint,
    resume, and the final committed layout is byte-identical to an
    uninterrupted run — incl. the left-outer null rows (matched bitmaps
    ride the snapshot) and late-row side effects."""
    import pytest

    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.checkpoint import (
        latest_checkpoint,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_output,
    )

    lt, rt = _log(300, seed=21), _log(260, seed=22)
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(lt, lp)
    pq.write_table(rt, rp)
    kw = dict(band=6, n_actors=2, micro_batch_rows=64, mode="left_outer")

    clean_dir = str(tmp_path / "clean")
    run_streaming_join(lp, rp, out_dir=clean_dir, **kw)
    want = (
        read_output(clean_dir)
        .to_pandas()
        .sort_values(["l_seq", "r_seq"], ignore_index=True)
    )

    ck_dir = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="injected stop"):
        run_streaming_join(
            lp, rp, out_dir=ck_dir, checkpoint_every=3,
            _stop_after_batches=7, **kw,
        )
    ck = latest_checkpoint(ck_dir)
    assert ck is not None and ck[0] == 6  # snapshot at batch 6 survived
    # resume: restores buffers + bitmaps, skips 6 batches, replays the tail
    run_streaming_join(lp, rp, out_dir=ck_dir, checkpoint_every=3, **kw)
    got = (
        read_output(ck_dir)
        .to_pandas()
        .sort_values(["l_seq", "r_seq"], ignore_index=True)
    )
    assert got.equals(want)
    assert latest_checkpoint(ck_dir) is None  # cleared on success


def test_join_checkpoint_rejects_mismatched_resume(ray_session, tmp_path):
    import pytest

    lt, rt = _log(120, seed=31), _log(120, seed=32)
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    pq.write_table(lt, lp)
    pq.write_table(rt, rp)
    out = str(tmp_path / "sink")
    with pytest.raises(RuntimeError, match="injected stop"):
        run_streaming_join(
            lp, rp, band=6, n_actors=2, micro_batch_rows=32,
            out_dir=out, checkpoint_every=2, _stop_after_batches=4,
        )
    # different band → different join semantics → refuse
    with pytest.raises(RuntimeError, match="different join config"):
        run_streaming_join(
            lp, rp, band=9, n_actors=2, micro_batch_rows=32,
            out_dir=out, checkpoint_every=2,
        )
    # different actor count → routing desync → refuse
    with pytest.raises(RuntimeError, match="n_actors"):
        run_streaming_join(
            lp, rp, band=6, n_actors=3, micro_batch_rows=32,
            out_dir=out, checkpoint_every=2,
        )


def test_temporal_join_checkpoint_kill_and_replay(ray_session, tmp_path):
    """Checkpointed sink-mode temporal join: kill after a checkpoint,
    resume, byte-identical commit (dimension history + pending-event
    buffers ride the snapshot)."""
    import pytest

    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.checkpoint import (
        latest_checkpoint,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_output,
    )

    dim, ev = _log(160, seed=41, keys=9), _log(300, seed=42, keys=9)
    dp, ep = str(tmp_path / "d.parquet"), str(tmp_path / "e.parquet")
    pq.write_table(dim, dp)
    pq.write_table(ev, ep)
    kw = dict(n_actors=2, micro_batch_rows=64)

    clean_dir = str(tmp_path / "clean")
    run_streaming_temporal_join(dp, ep, out_dir=clean_dir, **kw)
    want = (
        read_output(clean_dir).to_pandas().sort_values("e_seq", ignore_index=True)
    )

    ck_dir = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="injected stop"):
        run_streaming_temporal_join(
            dp, ep, out_dir=ck_dir, checkpoint_every=3,
            _stop_after_batches=7, **kw,
        )
    assert latest_checkpoint(ck_dir) is not None
    run_streaming_temporal_join(dp, ep, out_dir=ck_dir, checkpoint_every=3, **kw)
    got = read_output(ck_dir).to_pandas().sort_values("e_seq", ignore_index=True)
    assert got.equals(want)
    assert latest_checkpoint(ck_dir) is None


def test_salted_join_matches_unsalted_on_hot_key(ray_session):
    """Hot-key salting: one key carries half the stream; the salted run's
    pair set and left-outer nulls equal the unsalted run's, and the hot
    key's left rows actually spread across multiple actors."""
    import ray.data

    rng = np.random.default_rng(61)
    n = 600
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 40, n)).astype(np.int64)
    ts = np.sort(rng.integers(0, 2000, n))

    def mk(seed_off):
        return pa.table(
            {
                "key": pa.array(np.roll(keys, seed_off), pa.int64()),
                "seq": pa.array(np.arange(n) + seed_off * 100000, pa.int64()),
                "event_ts": pa.array(ts, pa.int64()),
            }
        )

    lt, rt = mk(0), mk(1)
    plain = run_streaming_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        band=5, n_actors=4, micro_batch_rows=128, mode="left_outer",
    )
    salted = run_streaming_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        band=5, n_actors=4, micro_batch_rows=128, mode="left_outer",
        hot_keys=(7,), n_salt=3,
    )
    assert _got_pairs(salted) == _got_pairs(plain)
    assert salted.n_late == plain.n_late == 0
    # spread probe: an ALL-hot-key stream pins every pair to ONE actor
    # unsalted, but salting must distribute the pair work across slots
    allhot = pa.table(
        {
            "key": pa.array(np.full(200, 7), pa.int64()),
            "seq": pa.array(np.arange(200), pa.int64()),
            "event_ts": pa.array(np.arange(200) * 2, pa.int64()),
        }
    )
    sp = run_streaming_join(
        ray.data.from_arrow(allhot), ray.data.from_arrow(allhot),
        band=3, n_actors=3, micro_batch_rows=64,
        hot_keys=(7,), n_salt=3,
    )
    up = run_streaming_join(
        ray.data.from_arrow(allhot), ray.data.from_arrow(allhot),
        band=3, n_actors=3, micro_batch_rows=64,
    )
    assert _got_pairs(sp) == _got_pairs(up)
    busy = [s["n_pairs"] for s in sp.actor_stats]
    assert sum(1 for x in busy if x > 0) >= 2, busy
    assert sum(1 for x in (s["n_pairs"] for s in up.actor_stats) if x > 0) == 1


def test_salted_join_rejects_invalid_configs(ray_session):
    import pytest
    import ray.data

    t = pa.table(
        {
            "key": pa.array([1, 1], pa.int64()),
            "seq": pa.array([0, 1], pa.int64()),
            "event_ts": pa.array([0, 1], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="full_outer"):
        run_streaming_join(
            ray.data.from_arrow(t), ray.data.from_arrow(t),
            band=1, mode="full_outer", hot_keys=(1,), n_salt=2, n_actors=4,
        )
    with pytest.raises(ValueError, match="n_salt"):
        run_streaming_join(
            ray.data.from_arrow(t), ray.data.from_arrow(t),
            band=1, hot_keys=(1,), n_salt=8, n_actors=4,
        )


def test_salted_timeouts_match_unsalted(ray_session):
    """Absence detection under hot-key salting: identical alert set."""
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_join import (
        run_streaming_timeouts,
    )

    rng = np.random.default_rng(71)
    n = 400
    keys = np.where(rng.random(n) < 0.6, 3, rng.integers(0, 20, n)).astype(np.int64)
    ts = np.sort(rng.integers(0, 1500, n))

    def mk(off):
        return pa.table(
            {
                "key": pa.array(np.roll(keys, off), pa.int64()),
                "seq": pa.array(np.arange(n) + off * 100000, pa.int64()),
                "event_ts": pa.array(ts, pa.int64()),
            }
        )

    a, c = mk(0), mk(3)
    kw = dict(horizon=9, n_actors=4, micro_batch_rows=128)
    plain = run_streaming_timeouts(
        ray.data.from_arrow(a), ray.data.from_arrow(c), **kw
    )
    salted = run_streaming_timeouts(
        ray.data.from_arrow(a), ray.data.from_arrow(c),
        hot_keys=(3,), n_salt=3, **kw,
    )
    want = sorted(np.asarray(plain.output["anchor_seq"], np.int64).tolist())
    got = sorted(np.asarray(salted.output["anchor_seq"], np.int64).tolist())
    assert got == want and len(want) > 0
