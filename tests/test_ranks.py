"""Giant-group order statistics (functions/ranks.py) vs DuckDB windows —
pins tie handling (shared min rank), single-row groups (percent_rank 0),
partition independence, hyper-duplicated values, and negative/zero values
through the monotone float encoding."""

import duckdb
import numpy as np
import pyarrow as pa
import ray


def _events(rng, n, ties=False):
    v = rng.normal(0.0, 100.0, n)
    if ties:
        # force heavy duplication incl. negatives, zeros, exact ties
        v = rng.choice(np.array([-7.5, -0.0, 0.0, 1.25, 3.0, 3.0, 900.0]), n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "event_type": pa.array(rng.choice(["a", "b", "c"], n)),
            "value": pa.array(v, pa.float64()),
        }
    )


def test_percent_rank_matches_duckdb(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.ranks import (
        grouped_percent_rank,
    )

    rng = np.random.default_rng(31)
    for ties in (False, True):
        tbl = _events(rng, 500, ties=ties)
        out = (
            grouped_percent_rank(
                ray.data.from_arrow(tbl).repartition(7),
                group="event_type",
                value="value",
                id_col="event_id",
                bucket_bits=6,  # tiny buckets → many rows share a cell
                num_parts=5,
            )
            .to_pandas()
            .sort_values("event_id", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("t", tbl.to_pandas())
        exp = con.execute(
            """SELECT event_id,
                      percent_rank() OVER (PARTITION BY event_type
                                           ORDER BY value) AS pr
               FROM t ORDER BY event_id"""
        ).fetchdf()
        assert len(out) == len(tbl)
        # bit-equal: same int64/int64 → float64 division on both sides
        assert out["pr"].to_numpy().tolist() == exp["pr"].to_numpy().tolist(), ties


def test_percent_rank_single_row_group(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.ranks import (
        grouped_percent_rank,
    )

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "event_type": pa.array(["solo", "pair", "pair"]),
            "value": pa.array([5.0, 1.0, 2.0], pa.float64()),
        }
    )
    out = (
        grouped_percent_rank(
            ray.data.from_arrow(tbl),
            group="event_type",
            value="value",
            id_col="event_id",
        )
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    assert out["pr"].tolist() == [0.0, 0.0, 1.0]


def test_grouped_quantiles_matches_duckdb(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.ranks import (
        grouped_quantiles,
    )

    rng = np.random.default_rng(37)
    for ties in (False, True):
        tbl = _events(rng, 700, ties=ties)
        out = (
            grouped_quantiles(
                ray.data.from_arrow(tbl).repartition(6),
                group="event_type",
                value="value",
                qs=(0.25, 0.5, 0.75),
                bucket_bits=5,  # hyper-duplicated values per bucket
            )
            .to_pandas()
            .sort_values(["event_type", "q"], ignore_index=True)
        )
        con = duckdb.connect()
        con.register("t", tbl.to_pandas())
        exp = con.execute(
            """SELECT event_type, 0.25 AS q, quantile_disc(value, 0.25) AS value
               FROM t GROUP BY event_type
               UNION ALL
               SELECT event_type, 0.5, quantile_disc(value, 0.5) FROM t GROUP BY event_type
               UNION ALL
               SELECT event_type, 0.75, quantile_disc(value, 0.75) FROM t GROUP BY event_type
               ORDER BY event_type, q"""
        ).fetchdf()
        assert out["value"].tolist() == exp["value"].tolist(), ties


def test_grouped_mad_matches_duckdb(ray_session):
    """MAD = quantile_disc(|x - quantile_disc(x, .5)|, .5) per group —
    two dependent order-stat passes; exercised with skewed integer values,
    outlier spikes, and a single-row group (mad 0)."""
    import duckdb

    from pdf_watermark_removal_otsu_inpaint_ray.functions.ranks import grouped_mad

    rng = np.random.default_rng(41)
    n = 700
    g = rng.choice(["x", "y", "z"], n - 1).tolist() + ["solo"]
    v = np.concatenate(
        [rng.integers(0, 1000, n - 20), rng.integers(10**6, 10**7, 20)]
    ).astype(np.float64)
    tbl = pa.table({"g": pa.array(g), "v": pa.array(v, pa.float64())})
    out = grouped_mad(
        ray.data.from_arrow(tbl).repartition(6), group="g", value="v", bucket_bits=8
    ).to_pandas().sort_values("g", ignore_index=True)
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    expect = con.execute(
        """WITH m AS (SELECT g, quantile_disc(v, 0.5) AS med FROM t GROUP BY g)
           SELECT t.g, m.med, quantile_disc(abs(t.v - m.med), 0.5) AS mad
           FROM t JOIN m ON t.g = m.g GROUP BY t.g, m.med ORDER BY t.g"""
    ).fetchdf()
    assert out["g"].tolist() == expect["g"].tolist()
    assert out["med"].to_numpy().tolist() == expect["med"].to_numpy().tolist()
    assert out["mad"].to_numpy().tolist() == expect["mad"].to_numpy().tolist()
    assert out[out.g == "solo"]["mad"].iloc[0] == 0.0
