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
