"""Distributed ordered prefix scan (functions/packing.py::pack_sequences)
vs a serial cumsum — pins cross-bucket offset stitching, multi-group
re-zeroing, sparse/non-dense order keys, and partition independence."""

import numpy as np
import pyarrow as pa
import ray


def _brute(ids, groups, vals, capacity):
    out = {}
    for g in set(groups):
        run = 0
        for i in sorted(np.nonzero(np.array(groups, dtype=object) == g)[0], key=lambda j: ids[j]):
            out[ids[j := i]] = (run, run // capacity)
            run += vals[i]
    return out


def test_pack_sequences_matches_serial_scan(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        pack_sequences,
    )

    rng = np.random.default_rng(5)
    n = 400
    # sparse ids spanning many >>4-bit buckets, duplicated groups
    ids = np.sort(rng.choice(np.arange(0, 500_000, 7), n, replace=False)).astype(np.int64)
    groups = rng.choice(["a", "b", "c"], n).tolist()
    vals = rng.integers(1, 900, n).astype(np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(groups, pa.string()),
            "n_chars": pa.array(vals, pa.int64()),
        }
    )
    expect = _brute(ids.tolist(), groups, vals.tolist(), 1000)
    for parts in (2, 9):
        out = (
            pack_sequences(
                ray.data.from_arrow(tbl).repartition(parts),
                capacity=1000,
                bucket_bits=8,  # many buckets → exercises offset stitching
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert len(out) == n
        for _, r in out.iterrows():
            tb, b = expect[r["doc_id"]]
            assert (r["tok_before"], r["bin"]) == (tb, b), r["doc_id"]


def test_grouped_lag_matches_brute(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import grouped_lag

    rng = np.random.default_rng(9)
    n = 300
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 20, n), pa.int64()),
            "ts_us": pa.array(rng.integers(0, 50, n) * 10, pa.int64()),  # many ties
            "event_id": pa.array(rng.permutation(n), pa.int64()),
        }
    )
    out = (
        grouped_lag(
            ray.data.from_arrow(tbl).repartition(4),
            group="user_id", order="ts_us", tiebreak="event_id", out="delta_us",
        )
        .to_pandas()
        .sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    )
    u = np.asarray(tbl["user_id"]); t = np.asarray(tbl["ts_us"]); e = np.asarray(tbl["event_id"])
    rows = sorted(zip(u.tolist(), t.tolist(), e.tolist()))
    expect = {}
    prev = {}
    for uu, tt, ee in rows:
        expect[(uu, tt, ee)] = (tt - prev[uu]) if uu in prev else None
        prev[uu] = tt
    import pandas as pd

    got = {
        (r["user_id"], r["ts_us"], r["event_id"]):
            (None if pd.isna(r["delta_us"]) else int(r["delta_us"]))
        for _, r in out.iterrows()
    }
    assert len(got) == n
    assert got == expect


def test_grouped_latest_matches_brute(ray_session):
    """CDC compaction: distributed latest-per-key equals the brute
    sort-and-take-last, payload columns intact, heavy (ts) ties broken by
    event_id."""
    import pandas as pd
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import grouped_latest

    rng = np.random.default_rng(11)
    n = 4000
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 37, n), pa.int64()),
            "ts_us": pa.array(rng.integers(0, 25, n) * 10, pa.int64()),
            "event_id": pa.array(rng.permutation(n), pa.int64()),
            "event_type": pa.array([f"t{i % 4}" for i in range(n)]),
            "value_c": pa.array(rng.integers(-500, 500, n), pa.int64()),
        }
    )
    out = (
        grouped_latest(
            ray.data.from_arrow(tbl).repartition(6),
            group="user_id", order="ts_us", tiebreak="event_id",
        )
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    brute = (
        tbl.to_pandas()
        .sort_values(["user_id", "ts_us", "event_id"])
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(out[brute.columns.tolist()], brute)


def test_grouped_rolling_outlier_matches_brute(ray_session):
    """Integer z-score flag equals a brute per-row float check (strict
    inequality keeps them equivalent: both sides are exact integers)."""
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_rolling_outlier,
    )

    rng = np.random.default_rng(17)
    n = 3000
    vals = rng.integers(-50, 50, n)
    spikes = rng.choice(n, 60, replace=False)
    vals[spikes] += rng.choice([-4000, 4000], 60)
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
            "ts_us": pa.array(rng.integers(0, 40, n) * 10, pa.int64()),
            "event_id": pa.array(rng.permutation(n), pa.int64()),
            "value_c": pa.array(vals, pa.int64()),
        }
    )
    out = (
        grouped_rolling_outlier(
            ray.data.from_arrow(tbl).repartition(5),
            group="user_id", order="ts_us", tiebreak="event_id",
            value="value_c", window=8, thresh=2,
        )
        .to_pandas()
        .sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    )
    assert out["is_outlier"].sum() > 0  # the planted spikes flag
    df = tbl.to_pandas().sort_values(
        ["user_id", "ts_us", "event_id"], ignore_index=True
    )
    for uid, g in df.groupby("user_id"):
        v = g["value_c"].to_numpy()
        sub = out[out["user_id"] == uid]
        for i in range(len(v)):
            w = v[max(0, i - 7): i + 1].astype(np.int64)
            k = len(w)
            lhs = int(k * v[i] - w.sum()) ** 2
            rhs = 4 * int(k * (w * w).sum() - w.sum() ** 2)
            row = sub.iloc[i]
            assert row["roll_n"] == k and row["roll_sum"] == w.sum()
            assert row["is_outlier"] == int(lhs > rhs), (uid, i)


def test_grouped_ntile_matches_window_semantics(ray_session):
    """NTILE(k): first n%k buckets get one extra row; groups smaller than
    k get one row per bucket; ties on ts broken by event_id."""
    import duckdb
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import grouped_ntile

    rng = np.random.default_rng(17)
    n = 400
    tbl = pa.table(
        {
            "user_id": pa.array(
                np.concatenate(
                    [rng.integers(0, 25, n - 3), np.array([100, 101, 101])]
                ),  # include 1-row and 2-row groups (n < k)
                pa.int64(),
            ),
            "ts_us": pa.array(rng.integers(0, 40, n) * 10, pa.int64()),
            "event_id": pa.array(rng.permutation(n), pa.int64()),
        }
    )
    out = (
        grouped_ntile(
            ray.data.from_arrow(tbl).repartition(5),
            group="user_id", order="ts_us", tiebreak="event_id", k=4,
        )
        .to_pandas()
        .sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    expect = con.execute(
        """SELECT user_id, ts_us, event_id,
                  ntile(4) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS tile
           FROM t ORDER BY user_id, ts_us, event_id"""
    ).fetchdf()
    assert len(out) == n
    assert out["tile"].to_numpy().tolist() == expect["tile"].to_numpy().tolist()
    # explicit small-group pin: a 1-row group is tile 1; a 2-row group is 1,2
    assert out[out.user_id == 100]["tile"].tolist() == [1]
    assert sorted(out[out.user_id == 101]["tile"].tolist()) == [1, 2]


def test_grouped_sessionize_matches_window_idiom(ray_session):
    """Session ids equal the lag+cumsum SQL idiom; boundary is STRICTLY
    greater-than gap (delta == gap stays in-session); ties on ts never
    split a session (delta 0)."""
    import duckdb
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_sessionize,
    )

    rng = np.random.default_rng(23)
    n = 500
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 15, n), pa.int64()),
            # coarse grid makes exact-gap and tie cases common
            "ts_us": pa.array(rng.integers(0, 30, n) * 100, pa.int64()),
            "event_id": pa.array(rng.permutation(n), pa.int64()),
        }
    )
    out = (
        grouped_sessionize(
            ray.data.from_arrow(tbl).repartition(5),
            group="user_id", order="ts_us", tiebreak="event_id", gap=100,
        )
        .to_pandas()
        .sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    expect = con.execute(
        """WITH lagged AS (
               SELECT user_id, ts_us, event_id,
                      CASE WHEN ts_us - lag(ts_us) OVER w > 100
                                OR lag(ts_us) OVER w IS NULL
                           THEN 1 ELSE 0 END AS new_sess
               FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
           SELECT user_id, ts_us, event_id,
                  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
           FROM lagged ORDER BY user_id, ts_us, event_id"""
    ).fetchdf()
    assert len(out) == n
    assert out["session_id"].to_numpy().tolist() == expect["session_id"].astype(int).tolist()
    # sanity: delta == gap stays in-session
    sub = out[out.user_id == out.user_id.iloc[0]]
    assert sub["session_id"].iloc[0] == 1


def test_grouped_ops_accept_string_group_keys(ray_session):
    """ntile/sessionize must work with string group keys (the source
    column is the natural group in document pipelines)."""
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_ntile,
        grouped_sessionize,
    )

    tbl = pa.table(
        {
            "src": pa.array(["a", "a", "a", "b", "b"], pa.string()),
            "o": pa.array([0, 10, 300, 5, 6], pa.int64()),
            "t": pa.array([0, 1, 2, 3, 4], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    nt = (
        grouped_ntile(ds, group="src", order="o", tiebreak="t", k=2)
        .to_pandas()
        .sort_values(["src", "o"], ignore_index=True)
    )
    assert nt["tile"].tolist() == [1, 1, 2, 1, 2]
    se = (
        grouped_sessionize(ds, group="src", order="o", tiebreak="t", gap=100)
        .to_pandas()
        .sort_values(["src", "o"], ignore_index=True)
    )
    assert se["session_id"].tolist() == [1, 1, 2, 1, 1]


def test_transition_counts_matches_window_idiom(ray_session):
    """Markov pair counts == DuckDB lag() + GROUP BY, with heavy ts ties
    (tiebreak decides adjacency) and single-event users (no pairs)."""
    import duckdb
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        transition_counts,
    )

    rng = np.random.default_rng(23)
    n = 600
    tbl = pa.table(
        {
            "user_id": pa.array(
                np.concatenate(
                    [rng.integers(0, 30, n - 1), np.array([999])]  # 1-event user
                ),
                pa.int64(),
            ),
            "ts_us": pa.array(rng.integers(0, 50, n) * 10, pa.int64()),
            "event_id": pa.array(rng.permutation(n), pa.int64()),
            "event_type": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        }
    )
    out = transition_counts(
        ray.data.from_arrow(tbl).repartition(7),
        group="user_id",
        order="ts_us",
        tiebreak="event_id",
        label="event_type",
    ).to_pandas().sort_values(["prev_event_type", "event_type"], ignore_index=True)
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    expect = con.execute(
        """WITH l AS (
               SELECT event_type,
                      lag(event_type) OVER (
                          PARTITION BY user_id ORDER BY ts_us, event_id
                      ) AS prev_event_type
               FROM t)
           SELECT prev_event_type, event_type, CAST(count(*) AS BIGINT) AS cnt
           FROM l WHERE prev_event_type IS NOT NULL
           GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchdf()
    assert out["cnt"].to_numpy().tolist() == expect["cnt"].to_numpy().tolist()
    assert out["prev_event_type"].tolist() == expect["prev_event_type"].tolist()
    assert out["event_type"].tolist() == expect["event_type"].tolist()
    # total pairs = rows - users-with-at-least-one-event
    n_users = len(np.unique(tbl["user_id"].to_numpy()))
    assert int(out["cnt"].sum()) == n - n_users


def test_grouped_time_weighted_matches_brute(ray_session):
    """TWAP: per-user sum(value*(t_next - t)) / total-duration partials ==
    brute per-user computation; single-event users emit nothing; ts ties
    resolved by event_id; big durations stay int64-exact."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_time_weighted,
    )

    rng = np.random.default_rng(97)
    n = 500
    tbl = pa.table(
        {
            "user_id": pa.array(
                np.concatenate([rng.integers(0, 40, n - 1), np.array([777])]),
                pa.int64(),
            ),
            "ts_us": pa.array(
                rng.integers(0, 3 * 10**13, n), pa.int64()  # ~1 year in us
            ),
            "event_id": pa.array(rng.permutation(n), pa.int64()),
            "cents": pa.array(rng.integers(1, 50_000, n), pa.int64()),
        }
    )
    out = (
        grouped_time_weighted(
            ray.data.from_arrow(tbl).repartition(6),
            group="user_id", order="ts_us", tiebreak="event_id", value="cents",
        )
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    # brute
    import pandas as pd

    df = tbl.to_pandas().sort_values(["user_id", "ts_us", "event_id"])
    exp = {}
    for uid, sub in df.groupby("user_id"):
        if len(sub) < 2:
            continue
        t = sub["ts_us"].to_numpy()
        c = sub["cents"].to_numpy()
        dur = t[1:] - t[:-1]
        exp[int(uid)] = (int((c[:-1] * dur).sum()), int(dur.sum()))
    got = {
        int(r.user_id): (int(r.twap_num), int(r.twap_den))
        for r in out.itertuples()
    }
    assert got == exp
    assert 777 not in got  # single-event user excluded, like the SQL twin


def test_grouped_rolling_median_matches_brute(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_rolling_median,
    )

    rng = np.random.default_rng(21)
    n = 400
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 15, n), pa.int64()),
            "ts_us": pa.array(rng.integers(0, 40, n) * 10, pa.int64()),
            "event_id": pa.array(rng.permutation(n), pa.int64()),
            "value_c": pa.array(rng.integers(-500, 500, n), pa.int64()),
        }
    )
    w = 4
    out = (
        grouped_rolling_median(
            ray.data.from_arrow(tbl).repartition(4),
            group="user_id", order="ts_us", tiebreak="event_id",
            value="value_c", window=w,
        )
        .to_pandas()
        .sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    )
    assert len(out) == n
    rows = sorted(
        zip(
            np.asarray(tbl["user_id"]).tolist(),
            np.asarray(tbl["ts_us"]).tolist(),
            np.asarray(tbl["event_id"]).tolist(),
            np.asarray(tbl["value_c"]).tolist(),
        )
    )
    hist: dict = {}
    expect = {}
    for uu, tt, ee, vv in rows:
        hist.setdefault(uu, []).append(vv)
        expect[(uu, tt, ee)] = float(np.median(hist[uu][-w:]))
    got = {
        (r["user_id"], r["ts_us"], r["event_id"]): r["roll_med"]
        for _, r in out.iterrows()
    }
    assert got == expect


def test_grouped_interval_agg_matches_brute(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_interval_agg,
    )

    rng = np.random.default_rng(33)
    n = 500
    horizon = 25
    tbl = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 12, n), pa.int64()),
            "ts_us": pa.array(rng.integers(0, 200, n), pa.int64()),  # heavy ties
            "event_id": pa.array(rng.permutation(n), pa.int64()),
            "value_c": pa.array(rng.integers(-100, 100, n), pa.int64()),
            "is_anchor": pa.array(
                (rng.random(n) < 0.3).astype(np.int8), pa.int8()
            ),
        }
    )
    out = (
        grouped_interval_agg(
            ray.data.from_arrow(tbl).repartition(5),
            group="user_id", order="ts_us", id_col="event_id",
            value="value_c", anchor="is_anchor", horizon=horizon,
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    u = np.asarray(tbl["user_id"])
    t = np.asarray(tbl["ts_us"])
    e = np.asarray(tbl["event_id"])
    v = np.asarray(tbl["value_c"])
    a = np.asarray(tbl["is_anchor"]).astype(bool)
    expect = {}
    for i in np.nonzero(a)[0]:
        m = (u == u[i]) & (t > t[i]) & (t <= t[i] + horizon)
        expect[int(e[i])] = (int(m.sum()), int(v[m].sum()))
    got = {
        int(r["event_id"]): (int(r["n_follow"]), int(r["sum_value"]))
        for _, r in out.iterrows()
    }
    assert len(got) == int(a.sum())
    assert got == expect


def test_interval_coverage_matches_brute(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_interval_coverage,
    )

    rng = np.random.default_rng(9)
    n, H = 400, 10
    users = rng.integers(0, 25, n).astype(np.int64)
    ts = rng.integers(0, 300, n).astype(np.int64)
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
        }
    )
    got = (
        grouped_interval_coverage(
            ray.data.from_arrow(tbl).repartition(4), hold=H, num_parts=8
        )
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    want = {}
    for u in np.unique(users):
        t = np.sort(ts[users == u])
        covered = islands = 0
        start = prev = int(t[0])
        for x in t[1:].tolist():
            if x - prev >= H:
                covered += prev + H - start
                islands += 1
                start = x
            prev = x
        covered += prev + H - start
        islands += 1
        want[int(u)] = (covered, islands)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert (r.covered_us, r.n_islands) == want[int(r.user_id)]
    # duplicate-ts tie: one island, hold-length coverage
    tied = pa.table(
        {
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "ts_us": pa.array([5, 5, 5], pa.int64()),
        }
    )
    one = grouped_interval_coverage(
        ray.data.from_arrow(tied), hold=H, num_parts=2
    ).to_pandas()
    assert (int(one.covered_us[0]), int(one.n_islands[0])) == (H, 1)


def test_grouped_range_frame_sum_matches_brute(ray_session):
    """RANGE-frame sum vs an O(n²) serial twin — heavy ties (peers must
    share one frame INCLUDING later-tiebreak peers), negative values,
    multiple groups, partition-count invariance."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_range_frame_sum,
    )

    rng = np.random.default_rng(31)
    n = 400
    g = rng.integers(0, 9, n).astype(np.int64)
    o = (rng.integers(0, 60, n) * 10).astype(np.int64)  # many exact ties
    t = rng.permutation(n).astype(np.int64)
    v = rng.integers(-40, 40, n).astype(np.int64)
    span = 170
    tbl = pa.table(
        {
            "g": pa.array(g), "o": pa.array(o),
            "t": pa.array(t), "v": pa.array(v),
        }
    )
    want = {}
    for i in range(n):
        s = int(
            v[(g == g[i]) & (o >= o[i] - span) & (o <= o[i])].sum()
        )
        want[(int(g[i]), int(o[i]), int(t[i]))] = s
    for parts in (3, 8):
        got = (
            grouped_range_frame_sum(
                ray.data.from_arrow(tbl).repartition(parts),
                group="g", order="o", tiebreak="t", value="v", span=span,
            )
            .to_pandas()
        )
        assert len(got) == n
        for _, r in got.iterrows():
            assert r["range_sum"] == want[(r["g"], r["o"], r["t"])]


def test_grouped_resample_ffill_matches_brute(ray_session):
    """Grid resample vs a serial twin — tie collapse to max tiebreak,
    groups narrower than one step (empty grid), grid points landing
    exactly on observations, partition-count invariance."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_resample_ffill,
    )

    rng = np.random.default_rng(32)
    n = 300
    g = rng.integers(0, 8, n).astype(np.int64)
    o = rng.integers(0, 1000, n).astype(np.int64)
    t = rng.permutation(n).astype(np.int64)
    v = rng.integers(-99, 99, n).astype(np.int64)
    step = 100
    tbl = pa.table(
        {
            "g": pa.array(g), "o": pa.array(o),
            "t": pa.array(t), "v": pa.array(v),
        }
    )
    # serial twin: latest-per-(g,o) by tiebreak, then carry-forward scan
    want = {}
    for gg in np.unique(g):
        rows = sorted(
            [(int(o[i]), int(t[i]), int(v[i])) for i in np.nonzero(g == gg)[0]]
        )
        latest = {}
        for oo, _, vv in rows:  # sorted by (o, t): later tiebreak wins
            latest[oo] = vv
        obs = sorted(latest)
        lo = -(-obs[0] // step)
        hi = obs[-1] // step
        for k in range(lo, hi + 1):
            grid = k * step
            carry = max(x for x in obs if x <= grid)
            want[(int(gg), grid)] = latest[carry]
    for parts in (3, 7):
        got = (
            grouped_resample_ffill(
                ray.data.from_arrow(tbl).repartition(parts),
                group="g", order="o", tiebreak="t", value="v", step=step,
            )
            .to_pandas()
        )
        assert len(got) == len(want)
        for _, r in got.iterrows():
            assert r["v"] == want[(r["g"], r["grid_ts"])], (r["g"], r["grid_ts"])
    # single-observation group: grid only if the obs lies on a step multiple
    one = grouped_resample_ffill(
        ray.data.from_arrow(
            pa.table(
                {
                    "g": pa.array([5, 6], pa.int64()),
                    "o": pa.array([200, 321], pa.int64()),
                    "t": pa.array([0, 1], pa.int64()),
                    "v": pa.array([7, 8], pa.int64()),
                }
            )
        ),
        group="g", order="o", tiebreak="t", value="v", step=100,
    ).to_pandas()
    assert len(one) == 1 and int(one["g"][0]) == 5 and int(one["v"][0]) == 7


def test_pack_examples_matches_serial(ray_session):
    """pack_examples vs a serial concat-and-chunk twin — empty docs,
    examples spanning bucket boundaries (tiny bucket_bits), a final
    partial example, layout invariance across partition counts."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        pack_examples,
    )

    rng = np.random.default_rng(17)
    n_docs = 120
    lens = rng.integers(0, 40, n_docs)
    lens[5] = 0  # explicit empty docs
    lens[50] = 0
    toks = [rng.integers(1, 250, ln).astype(np.int32) for ln in lens]
    order = np.arange(n_docs, dtype=np.int64) * 3 + 7  # sparse order keys
    tbl = pa.table(
        {
            "event_ts": pa.array(order, pa.int64()),
            "tokens": pa.array([t.tolist() for t in toks],
                               pa.list_(pa.int32())),
            "n_tok": pa.array(lens.astype(np.int32), pa.int32()),
        }
    )
    L = 64
    flat = np.concatenate([t for t in toks]) if toks else np.zeros(0, np.int32)
    docof = np.concatenate(
        [np.full(ln, i, np.int64) for i, ln in enumerate(lens)]
    )
    want = {}
    for e in range(-(-flat.size // L)):
        seg = flat[e * L : (e + 1) * L].astype(np.int64)
        dseg = docof[e * L : (e + 1) * L]
        want[e] = (
            seg.size, int(seg.sum()), int(seg[0]), int(seg[-1]),
            int(np.unique(dseg).size),
        )
    for parts, bb in ((2, 12), (5, 4), (3, 2)):
        out = (
            pack_examples(
                ray.data.from_arrow(tbl).repartition(parts),
                length=L, order="event_ts", bucket_bits=bb,
            )
            .to_pandas()
            .sort_values("example_id", ignore_index=True)
        )
        got = {
            int(r["example_id"]): (
                int(r["n_tok"]), int(r["tok_sum"]), int(r["first_tok"]),
                int(r["last_tok"]), int(r["n_docs"]),
            )
            for _, r in out.iterrows()
        }
        assert got == want, (parts, bb)


def test_grouped_attribution_matches_brute(ray_session):
    """Last-touch attribution vs an O(n²) serial twin — ties at equal ts
    (tiebreak decides inclusion), window cutoffs, groups with no touch,
    cross-group cummax leak rejection, partition invariance."""
    import pandas as pd

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_attribution,
    )

    rng = np.random.default_rng(23)
    n = 400
    g = rng.integers(0, 9, n).astype(np.int64)
    o = (rng.integers(0, 50, n) * 10).astype(np.int64)  # heavy ties
    t = rng.permutation(n).astype(np.int64)
    ty = rng.choice(["click", "purchase", "view"], n)
    W = 120
    tbl = pa.table(
        {
            "user_id": pa.array(g), "ts_us": pa.array(o),
            "event_id": pa.array(t), "event_type": pa.array(ty),
        }
    )
    want = {}
    for i in np.nonzero(ty == "purchase")[0]:
        best = None
        for j in np.nonzero((g == g[i]) & (ty == "click"))[0]:
            if (o[j], t[j]) <= (o[i], t[i]) and o[j] >= o[i] - W:
                if best is None or (o[j], t[j]) > (o[best], t[best]):
                    best = j
        want[int(t[i])] = int(t[best]) if best is not None else None
    for parts in (2, 7):
        out = grouped_attribution(
            ray.data.from_arrow(tbl).repartition(parts), window=W
        ).to_pandas()
        assert len(out) == len(want)
        for _, r in out.iterrows():
            exp = want[int(r["conv_id"])]
            gotv = None if pd.isna(r["touch_id"]) else int(r["touch_id"])
            assert gotv == exp, (r["conv_id"], gotv, exp)


def test_grouped_first_touch_matches_brute(ray_session):
    """First-touch vs an O(n²) serial twin — RANGE-frame peer semantics
    (touches at the conversion's exact ts are in-frame regardless of
    tiebreak), window cutoffs, touchless groups, partition invariance."""
    import pandas as pd

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_first_touch,
    )

    rng = np.random.default_rng(29)
    n = 400
    g = rng.integers(0, 9, n).astype(np.int64)
    o = (rng.integers(0, 50, n) * 10).astype(np.int64)
    t = rng.permutation(n).astype(np.int64)
    ty = rng.choice(["click", "purchase", "view"], n)
    W = 120
    tbl = pa.table(
        {
            "user_id": pa.array(g), "ts_us": pa.array(o),
            "event_id": pa.array(t), "event_type": pa.array(ty),
        }
    )
    want = {}
    for i in np.nonzero(ty == "purchase")[0]:
        best = None
        for j in np.nonzero((g == g[i]) & (ty == "click"))[0]:
            # RANGE frame: ts-only bounds, peers included
            if o[i] - W <= o[j] <= o[i]:
                if best is None or (o[j], t[j]) < (o[best], t[best]):
                    best = j
        want[int(t[i])] = int(t[best]) if best is not None else None
    for parts in (2, 6):
        out = grouped_first_touch(
            ray.data.from_arrow(tbl).repartition(parts), window=W
        ).to_pandas()
        assert len(out) == len(want)
        for _, r in out.iterrows():
            exp = want[int(r["conv_id"])]
            gotv = None if pd.isna(r["touch_id"]) else int(r["touch_id"])
            assert gotv == exp, (r["conv_id"], gotv, exp)


def _pk64(u: int, num_parts: int = 64) -> int:
    """The _add_group_pk int-key partition formula, inlined for collision
    search in the band-spill regression test."""
    return (((u * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)) >> 33) % num_parts


def test_grouped_first_touch_trailing_conversion_band_spill(ray_session):
    """Regression (ADVICE r4): a conversion trailing ALL of its
    partition's touches by more than window+1 pushed q_hi past the
    group's band into a higher gid's band, crediting ANOTHER key's touch.
    Repro: two users hashing to the same pk; user A clicks at t=0 and
    purchases at t=24 with window=10; user B (higher key, same partition)
    clicks at t=5.  The RANGE frame [14, 24] holds no touch of A — the
    credit must be NULL, not B's click."""
    import pandas as pd

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_first_touch,
    )

    # find two int keys uA < uB sharing a pk partition
    uA = 1
    uB = next(u for u in range(2, 10_000) if _pk64(u) == _pk64(uA))
    tbl = pa.table(
        {
            "user_id": pa.array([uA, uB, uA], pa.int64()),
            "ts_us": pa.array([0, 5, 24], pa.int64()),
            "event_id": pa.array([100, 300, 900], pa.int64()),
            "event_type": pa.array(["click", "click", "purchase"]),
        }
    )
    out = grouped_first_touch(
        ray.data.from_arrow(tbl), window=10
    ).to_pandas()
    assert len(out) == 1
    assert int(out["conv_id"][0]) == 900
    assert pd.isna(out["touch_id"][0]), (
        "trailing conversion credited another key's touch: "
        f"{out['touch_id'][0]}"
    )
    # same layout but the conversion IN window still resolves
    tbl2 = pa.table(
        {
            "user_id": pa.array([uA, uB, uA], pa.int64()),
            "ts_us": pa.array([0, 5, 8], pa.int64()),
            "event_id": pa.array([100, 300, 900], pa.int64()),
            "event_type": pa.array(["click", "click", "purchase"]),
        }
    )
    out2 = grouped_first_touch(
        ray.data.from_arrow(tbl2), window=10
    ).to_pandas()
    assert int(out2["touch_id"][0]) == 100


def test_grouped_first_touch_brute_with_trailing_convs(ray_session):
    """Brute-force sweep biased to produce conversions beyond every
    touch of their partition (sparse late purchases), catching any band
    arithmetic that is correct only inside the touch hull."""
    import pandas as pd

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_first_touch,
    )

    rng = np.random.default_rng(71)
    n = 300
    g = rng.integers(0, 12, n).astype(np.int64)
    o = (rng.integers(0, 40, n) * 10).astype(np.int64)
    ty = rng.choice(["click", "purchase", "view"], n, p=[0.5, 0.2, 0.3])
    # force a block of very-late purchases far beyond every touch
    late = rng.choice(n, 25, replace=False)
    o[late] = 2_000 + rng.integers(0, 30, 25) * 50
    ty[late] = "purchase"
    t = rng.permutation(n).astype(np.int64)
    W = 120
    tbl = pa.table(
        {
            "user_id": pa.array(g), "ts_us": pa.array(o),
            "event_id": pa.array(t), "event_type": pa.array(ty),
        }
    )
    want = {}
    for i in np.nonzero(ty == "purchase")[0]:
        best = None
        for j in np.nonzero((g == g[i]) & (ty == "click"))[0]:
            if o[i] - W <= o[j] <= o[i]:
                if best is None or (o[j], t[j]) < (o[best], t[best]):
                    best = j
        want[int(t[i])] = int(t[best]) if best is not None else None
    for parts in (1, 5):
        out = grouped_first_touch(
            ray.data.from_arrow(tbl).repartition(parts), window=W
        ).to_pandas()
        assert len(out) == len(want)
        for _, r in out.iterrows():
            exp = want[int(r["conv_id"])]
            gotv = None if pd.isna(r["touch_id"]) else int(r["touch_id"])
            assert gotv == exp, (r["conv_id"], gotv, exp)


def test_pack_examples_tied_order_doc_id_default(ray_session):
    """Tied `order` values (the synth.generate_stream shape: many rows per
    timestamp) pack deterministically via the automatic doc_id tiebreak
    (ADVICE r5) — layout equals the serial (order, doc_id) concat twin and
    is partition-invariant; without doc_id the fail-loud contract stays."""
    import pytest

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        pack_examples,
    )

    rng = np.random.default_rng(29)
    n_docs = 90
    lens = rng.integers(1, 30, n_docs)
    toks = [rng.integers(1, 250, ln).astype(np.int32) for ln in lens]
    order = np.repeat(np.arange(30, dtype=np.int64) * 5, 3)  # 3-way ties
    doc_id = rng.permutation(n_docs).astype(np.int64)  # unordered ids
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_id, pa.int64()),
            "event_ts": pa.array(order, pa.int64()),
            "tokens": pa.array([t.tolist() for t in toks],
                               pa.list_(pa.int32())),
            "n_tok": pa.array(lens.astype(np.int32), pa.int32()),
        }
    )
    L = 48
    srt = np.lexsort((doc_id, order))
    flat = np.concatenate([toks[i] for i in srt])
    docof = np.concatenate(
        [np.full(lens[i], int(doc_id[i]), np.int64) for i in srt]
    )
    want = {}
    for e in range(-(-flat.size // L)):
        seg = flat[e * L:(e + 1) * L].astype(np.int64)
        dseg = docof[e * L:(e + 1) * L]
        want[e] = (
            seg.size, int(seg.sum()), int(seg[0]), int(seg[-1]),
            int(np.unique(dseg).size),
        )
    for parts, bb in ((2, 12), (4, 3)):
        out = (
            pack_examples(
                ray.data.from_arrow(tbl).repartition(parts),
                length=L, order="event_ts", bucket_bits=bb,
            )
            .to_pandas()
            .sort_values("example_id", ignore_index=True)
        )
        got = {
            int(r["example_id"]): (
                int(r["n_tok"]), int(r["tok_sum"]), int(r["first_tok"]),
                int(r["last_tok"]), int(r["n_docs"]),
            )
            for _, r in out.iterrows()
        }
        assert got == want, (parts, bb)

    # no doc_id column + tied orders -> still fail-loud
    no_id = tbl.drop_columns(["doc_id"])
    with pytest.raises((ValueError, Exception), match="duplicate"):
        pack_examples(
            ray.data.from_arrow(no_id), length=L, order="event_ts",
        ).materialize()


def test_pack_examples_string_doc_id_not_auto_tiebreak(ray_session):
    """A non-integer doc_id must NOT be auto-cast into the tiebreak
    (review r5): unique-order inputs with a string doc_id keep working,
    and tied orders still fail loudly rather than casting garbage."""
    import pytest

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        pack_examples,
    )

    rng = np.random.default_rng(31)
    n = 40
    lens = rng.integers(1, 20, n)
    toks = [rng.integers(1, 250, ln).astype(np.int32) for ln in lens]
    base = {
        "doc_id": pa.array([f"doc-{i:04d}" for i in range(n)], pa.string()),
        "tokens": pa.array([t.tolist() for t in toks], pa.list_(pa.int32())),
        "n_tok": pa.array(lens.astype(np.int32), pa.int32()),
    }
    uniq = pa.table({**base, "event_ts": pa.array(
        np.arange(n, dtype=np.int64) * 2, pa.int64())})
    out = pack_examples(
        ray.data.from_arrow(uniq), length=32, order="event_ts"
    ).to_pandas()
    assert int(out["n_tok"].sum()) == int(lens.sum())

    tied = pa.table({**base, "event_ts": pa.array(
        np.repeat(np.arange(n // 2, dtype=np.int64), 2), pa.int64())})
    with pytest.raises(Exception, match="duplicate"):
        pack_examples(
            ray.data.from_arrow(tied), length=32, order="event_ts"
        ).materialize()
