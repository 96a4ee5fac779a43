"""Streaming windowed top-k leaderboard (pipelines/stream_topk.py):
golden equality vs a brute batch computation under disorder <= lateness,
invariance to actor count / micro-batch size, tie ranking, and late-row
routing for rows behind the watermark."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_topk import (
    run_streaming_topk,
)

W = 1000


def _brute(tbl: pa.Table, k: int = 3) -> dict:
    df = tbl.to_pandas()
    df["window_id"] = df["event_ts"] // W
    c = (
        df.groupby(["window_id", "user_id"], as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
    )
    out = {}
    for wid, sub in c.groupby("window_id"):
        sub = sub.sort_values(["cnt", "user_id"], ascending=[False, True])
        for r, row in enumerate(sub.head(k).itertuples(), 1):
            out[(int(wid), int(row.user_id))] = (int(row.cnt), r)
    return out


def _stream(n=4000, disorder=0, seed=5):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 20 * W, n))
    if disorder:
        ts = ts + rng.integers(-disorder, disorder + 1, n)
    return pa.table(
        {
            "user_id": pa.array(rng.integers(0, 60, n), pa.int64()),
            "event_ts": pa.array(ts, pa.int64()),
        }
    )


def test_stream_topk_matches_brute_and_is_layout_invariant(ray_session):
    tbl = _stream(disorder=40)
    exp = _brute(tbl)
    for n_actors, mb in ((1, 4000), (3, 256), (5, 97)):
        res = run_streaming_topk(
            ray.data.from_arrow(tbl),
            window_size=W,
            k=3,
            allowed_lateness=80,  # >= 2*disorder: no legitimate row is late
            n_actors=n_actors,
            micro_batch_rows=mb,
        )
        got = {
            (int(r.window_id), int(r.user_id)): (int(r.cnt), int(r.rnk))
            for r in res.output.to_pandas().itertuples()
        }
        assert got == exp, f"actors={n_actors} mb={mb}"
        assert res.n_late == 0


def test_stream_topk_ties_rank_by_key(ray_session):
    rows = [(0, u) for u in (7, 3, 9, 3, 7, 9, 1)]  # 3,7,9 tie at 2; 1 once
    tbl = pa.table(
        {
            "user_id": pa.array([u for _, u in rows], pa.int64()),
            "event_ts": pa.array([t for t, _ in rows], pa.int64()),
        }
    )
    res = run_streaming_topk(
        ray.data.from_arrow(tbl), window_size=W, k=3,
        allowed_lateness=1, n_actors=2, micro_batch_rows=2,
    )
    df = res.output.to_pandas().sort_values("rnk")
    assert df["user_id"].tolist() == [3, 7, 9]
    assert df["cnt"].tolist() == [2, 2, 2]


def test_stream_topk_late_rows_routed_not_dropped(ray_session):
    # ordered stream, then one far-late straggler whose window has closed
    ts = np.concatenate([np.arange(5000, dtype=np.int64), np.array([12])])
    tbl = pa.table(
        {
            "user_id": pa.array(np.arange(ts.size) % 11, pa.int64()),
            "event_ts": pa.array(ts, pa.int64()),
        }
    )
    res = run_streaming_topk(
        ray.data.from_arrow(tbl), window_size=W, k=2,
        allowed_lateness=1, n_actors=2, micro_batch_rows=128,
    )
    assert res.n_late == 1
    assert res.late is not None and res.late.num_rows == 1
    assert int(res.late["event_ts"][0].as_py()) == 12


def _brute_distinct(tbl: pa.Table) -> dict:
    df = tbl.to_pandas()
    df["window_id"] = df["event_ts"] // W
    return {
        int(w): int(n)
        for w, n in df.groupby("window_id")["user_id"].nunique().items()
    }


def test_stream_distinct_matches_brute_and_is_layout_invariant(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_topk import (
        run_streaming_distinct,
    )

    tbl = _stream(disorder=40, seed=9)
    exp = _brute_distinct(tbl)
    for n_actors, mb in ((1, 4000), (3, 256), (5, 97)):
        res = run_streaming_distinct(
            ray.data.from_arrow(tbl),
            window_size=W,
            allowed_lateness=80,
            n_actors=n_actors,
            micro_batch_rows=mb,
        )
        got = {
            int(r.window_id): int(r.n_distinct)
            for r in res.output.to_pandas().itertuples()
        }
        assert got == exp, f"actors={n_actors} mb={mb}"
        assert res.n_late == 0


def _brute_sliding(tbl: pa.Table, ws: int, slide: int, k: int = 3) -> dict:
    df = tbl.to_pandas()
    rows = []
    for t, u in zip(df["event_ts"], df["user_id"]):
        w_hi = t // slide
        w_lo = (t - ws) // slide + 1
        for w in range(w_lo, w_hi + 1):
            rows.append((w, u))
    c = pd.DataFrame(rows, columns=["window_id", "user_id"])
    c = c.groupby(["window_id", "user_id"], as_index=False).size().rename(
        columns={"size": "cnt"}
    )
    out = {}
    for wid, sub in c.groupby("window_id"):
        sub = sub.sort_values(["cnt", "user_id"], ascending=[False, True])
        for r, row in enumerate(sub.head(k).itertuples(), 1):
            out[(int(wid), int(row.user_id))] = (int(row.cnt), r)
    return out


def test_stream_topk_sliding_matches_brute(ray_session):
    ws, slide = 3 * W, W
    tbl = _stream(disorder=40, seed=14)
    exp = _brute_sliding(tbl, ws, slide)
    for n_actors, mb in ((1, 4000), (4, 193)):
        res = run_streaming_topk(
            ray.data.from_arrow(tbl),
            window_size=ws,
            slide=slide,
            k=3,
            allowed_lateness=80,
            n_actors=n_actors,
            micro_batch_rows=mb,
        )
        got = {
            (int(r.window_id), int(r.user_id)): (int(r.cnt), int(r.rnk))
            for r in res.output.to_pandas().itertuples()
        }
        assert got == exp, f"actors={n_actors} mb={mb}"
        assert res.n_late == 0


def test_stream_quantiles_matches_brute(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_topk import (
        run_streaming_quantiles,
    )

    def _brute_q(tbl: pa.Table, probs=(0.5, 0.9)) -> dict:
        import math

        df = tbl.to_pandas()
        df["window_id"] = df["event_ts"] // W
        out = {}
        for wid, sub in df.groupby("window_id"):
            vals = np.sort(sub["bin"].to_numpy())
            row = []
            for q in probs:
                row.append(int(vals[math.ceil(q * vals.size) - 1]))
            out[int(wid)] = (*row, int(vals.size))
        return out

    rng = np.random.default_rng(44)
    n = 4000
    ts = np.sort(rng.integers(0, 20 * W, n)) + rng.integers(-40, 41, n)
    tbl = pa.table(
        {
            "bin": pa.array(rng.integers(0, 300, n), pa.int64()),
            "event_ts": pa.array(ts, pa.int64()),
        }
    )
    exp = _brute_q(tbl)
    for n_actors, mb in ((1, 4000), (3, 256), (5, 97)):
        res = run_streaming_quantiles(
            ray.data.from_arrow(tbl),
            window_size=W,
            probs=(0.5, 0.9),
            allowed_lateness=80,
            n_actors=n_actors,
            micro_batch_rows=mb,
        )
        got = {
            int(r.window_id): (int(r.p50), int(r.p90), int(r.n))
            for r in res.output.to_pandas().itertuples()
        }
        assert got == exp, f"actors={n_actors} mb={mb}"
        assert res.n_late == 0


def test_stream_quantiles_routes_late_rows(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_topk import (
        run_streaming_quantiles,
    )

    # in-order stream, then one row far behind the final watermark: it must
    # land in the late side output, not in any window histogram
    n = 2000
    rng = np.random.default_rng(7)
    ts = np.sort(rng.integers(0, 10 * W, n))
    bins = rng.integers(0, 50, n)
    tbl = pa.table(
        {
            "bin": pa.array(np.concatenate([bins[:-1], [999]]), pa.int64()),
            "event_ts": pa.array(np.concatenate([ts[:-1], [0]]), pa.int64()),
        }
    )
    res = run_streaming_quantiles(
        ray.data.from_arrow(tbl),
        window_size=W,
        probs=(0.5,),
        allowed_lateness=1,
        n_actors=2,
        micro_batch_rows=128,
    )
    assert res.n_late >= 1
    assert res.late is not None and 999 in np.asarray(res.late["bin"]).tolist()
    # no window's quantile can be the late sentinel bin
    assert not (np.asarray(res.output["p50"]) == 999).any()


def test_stream_sliding_quantiles_matches_brute(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_topk import (
        run_streaming_quantiles,
    )

    ws, slide = 3 * W, W
    rng = np.random.default_rng(83)
    n = 3000
    ts = np.sort(rng.integers(0, 15 * W, n)) + rng.integers(-30, 31, n)
    bins = rng.integers(0, 200, n)
    tbl = pa.table(
        {
            "bin": pa.array(bins, pa.int64()),
            "event_ts": pa.array(ts, pa.int64()),
        }
    )

    import math

    exp: dict = {}
    per_w: dict = {}
    k = ws // slide
    for b, t in zip(bins.tolist(), ts.tolist()):
        for o in range(k):
            per_w.setdefault(t // slide - o, []).append(b)
    for w, vals in per_w.items():
        v = np.sort(np.array(vals))
        exp[int(w)] = (
            int(v[math.ceil(0.5 * v.size) - 1]),
            int(v[math.ceil(0.9 * v.size) - 1]),
            int(v.size),
        )
    for n_actors, mb in ((1, 4000), (3, 193)):
        res = run_streaming_quantiles(
            ray.data.from_arrow(tbl),
            window_size=ws,
            slide=slide,
            probs=(0.5, 0.9),
            allowed_lateness=70,
            n_actors=n_actors,
            micro_batch_rows=mb,
        )
        got = {
            int(r.window_id): (int(r.p50), int(r.p90), int(r.n))
            for r in res.output.to_pandas().itertuples()
        }
        assert got == exp, f"actors={n_actors}"
        assert res.n_late == 0
