"""Temporal join operators (stages/temporal_join.py) vs per-row brute force.

The distributed as-of join and the banded interval aggregate are checked
against O(n²) Python references on randomized inputs that exercise the
partition boundaries: unmatched keys, timestamp ties, empty windows,
band-crossing intervals, and keys present on only one side.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pdf_watermark_removal_otsu_inpaint_ray.stages.temporal_join import (
    asof_join,
    interval_point_aggregate,
)


def _brute_asof(l_key, l_ts, r_key, r_ts, r_val, direction="backward"):
    """Reference as-of with collapse-ties-to-max semantics.  "nearest"
    resolves distance ties backward (pandas.merge_asof's rule)."""
    out = []
    for k, t in zip(l_key, l_ts):
        best_d, best_ts, best = None, None, None
        for rk, rt, rv in zip(r_key, r_ts, r_val):
            if rk != k:
                continue
            if direction == "backward":
                ok, d = rt <= t, t - rt
            elif direction == "forward":
                ok, d = rt >= t, rt - t
            else:
                ok, d = True, abs(rt - t)
            if not ok:
                continue
            better = best_d is None or d < best_d or (
                direction == "nearest" and d == best_d and rt < best_ts
            )
            if better:
                best_d, best_ts, best = d, rt, rv
            elif d == best_d and rt == best_ts:
                best = max(best, rv)
        out.append(best)
    return out


@pytest.mark.parametrize(
    "seed,direction",
    [(0, "backward"), (7, "backward"), (0, "forward"), (0, "nearest")],
)
def test_asof_join_matches_brute_force(ray_session, seed, direction):
    rng = np.random.default_rng(seed)
    nl, nr = 300, 120
    l_key = rng.integers(0, 12, nl)  # keys 10/11 likely missing on the right
    l_ts = rng.integers(0, 1000, nl)
    r_key = rng.integers(0, 10, nr)
    r_ts = rng.integers(0, 1000, nr) // 50 * 50  # coarse → frequent ties
    r_val = rng.integers(0, 10_000, nr)

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(l_key, pa.int64()),
                "t": pa.array(l_ts, pa.int64()),
                "lid": pa.array(np.arange(nl), pa.int64()),
            }
        )
    ).repartition(4)
    right = ray.data.from_arrow(
        pa.table(
            {
                "rk": pa.array(r_key, pa.int64()),
                "rt": pa.array(r_ts, pa.int64()),
                "rv": pa.array(r_val, pa.int64()),
            }
        )
    ).repartition(3)

    got = (
        asof_join(
            left, right, left_on="k", right_on="rk", left_ts="t", right_ts="rt",
            num_parts=8, direction=direction,
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    assert len(got) == nl
    assert list(got.columns) == ["k", "t", "lid", "rv"]

    exp = _brute_asof(l_key, l_ts, r_key, r_ts, r_val, direction)
    got_v = [
        None if v is None else int(v)
        for v in got["rv"].to_numpy(dtype=object, na_value=None)
    ]
    exp_v = [None if v is None else int(v) for v in exp]
    assert got_v == exp_v
    # left rows with keys absent on the right came through as nulls
    assert any(v is None for v in got_v)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_broadcast_equals_shuffle(ray_session, direction):
    """The no-shuffle broadcast variant is row-for-row identical to the
    hash-partitioned one, including nulls, ties, and a string payload."""
    from pdf_watermark_removal_otsu_inpaint_ray.stages.temporal_join import (
        asof_join_broadcast,
    )

    rng = np.random.default_rng(11)
    nl, nr = 250, 90
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 12, nl), pa.int64()),
            "t": pa.array(rng.integers(0, 500, nl), pa.int64()),
            "lid": pa.array(np.arange(nl), pa.int64()),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(rng.integers(0, 10, nr), pa.int64()),
            "rt": pa.array(rng.integers(0, 500, nr) // 25 * 25, pa.int64()),
            "rv": pa.array(rng.integers(0, 10_000, nr), pa.int64()),
            "tag": pa.array([f"s{i % 7}" for i in range(nr)], pa.string()),
        }
    )
    kw = dict(left_on="k", right_on="rk", left_ts="t", right_ts="rt",
              direction=direction)
    a = (
        asof_join(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(3),
            num_parts=8, **kw,
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    b = (
        asof_join_broadcast(
            ray.data.from_arrow(left).repartition(4),
            right,
            **kw,
        )
        .to_pandas()
        .sort_values("lid", ignore_index=True)
    )
    for c in ["k", "t", "lid", "rv", "tag"]:
        av = a[c].to_numpy(dtype=object, na_value=None).tolist()
        bv = b[c].to_numpy(dtype=object, na_value=None).tolist()
        assert av == bv, c
    assert any(v is None for v in b["rv"].to_numpy(dtype=object, na_value=None))


def _brute_interval(p_ts, p_val, i_key, i_start, i_end):
    n = {k: 0 for k in i_key}
    s = {k: 0 for k in i_key}
    for k, a, b in zip(i_key, i_start, i_end):
        for t, v in zip(p_ts, p_val):
            if a <= t < b:
                n[k] += 1
                s[k] += int(v)
    return n, s


@pytest.mark.parametrize("band_width", [37, 100, 1000])
def test_interval_aggregate_matches_brute_force(ray_session, band_width):
    rng = np.random.default_rng(3)
    npts, niv = 400, 60
    p_ts = rng.integers(0, 1000, npts)
    p_val = rng.integers(-50, 50, npts)  # negatives: sum ≠ count proxy
    i_key = np.arange(niv) * 10
    i_start = rng.integers(0, 1000, niv)
    i_len = rng.integers(0, 300, niv)  # zero-length → empty window, n=0
    i_end = i_start + i_len

    points = ray.data.from_arrow(
        pa.table({"ts": pa.array(p_ts, pa.int64()), "v": pa.array(p_val, pa.int64())})
    ).repartition(5)
    intervals = ray.data.from_arrow(
        pa.table(
            {
                "ik": pa.array(i_key, pa.int64()),
                "a": pa.array(i_start, pa.int64()),
                "b": pa.array(i_end, pa.int64()),
            }
        )
    ).repartition(3)

    got = (
        interval_point_aggregate(
            points,
            intervals,
            point_ts="ts",
            point_value="v",
            interval_key="ik",
            interval_start="a",
            interval_end="b",
            band_width=band_width,
        )
        .to_pandas()
        .sort_values("ik", ignore_index=True)
    )
    # every interval present exactly once, including empty windows
    assert got["ik"].tolist() == i_key.tolist()
    exp_n, exp_s = _brute_interval(p_ts, p_val, i_key, i_start, i_end)
    assert got["n_points"].tolist() == [exp_n[k] for k in i_key]
    assert got["sum_value"].tolist() == [exp_s[k] for k in i_key]
    assert (got.loc[got["n_points"] == 0, "sum_value"] == 0).all()


def test_interval_aggregate_inverted_span_reports_zero(ray_session):
    """end < start must surface as n=0 / sum=0, never a negative count
    (review finding: hi < lo searchsorted slice)."""
    points = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([50, 60, 70, 99], pa.int64()),
                "v": pa.array([5, 6, 7, 9], pa.int64()),
            }
        )
    )
    intervals = ray.data.from_arrow(
        pa.table(
            {
                "ik": pa.array([1, 2], pa.int64()),
                "a": pa.array([100, 40], pa.int64()),  # ik=1 inverted
                "b": pa.array([50, 80], pa.int64()),
            }
        )
    )
    got = (
        interval_point_aggregate(
            points,
            intervals,
            point_ts="ts",
            point_value="v",
            interval_key="ik",
            interval_start="a",
            interval_end="b",
            band_width=64,
        )
        .to_pandas()
        .sort_values("ik", ignore_index=True)
    )
    assert got["n_points"].tolist() == [0, 3]
    assert got["sum_value"].tolist() == [0, 18]
