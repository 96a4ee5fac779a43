"""Mini driver: run every queries() entry at sf0.001 and compare against its
oracle_sql() twin via DuckDB — row count, column names, and order-insensitive
value equality (the same shape of check the real driver performs at sf0.01)."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        names = res.schema().names
        res = res.to_pandas()
        if res.empty and list(res.columns) != names:
            res = pd.DataFrame({n: [] for n in names})
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_frames_match(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), f"{name}: columns differ"
    assert len(ray_df) == len(sql_df), f"{name}: row count {len(ray_df)} vs {len(sql_df)}"
    a, b = normalize(ray_df), normalize(sql_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            # null markers vary by dtype: None (object), NaN (float),
            # pd.NA (nullable Int64) — all count as the same null
            if (x is None or pd.isna(x)) or (y is None or pd.isna(y)):
                ok = (x is None or pd.isna(x)) and (y is None or pd.isna(y))
            elif isinstance(x, float) or isinstance(y, float):
                ok = x == y or abs(x - y) <= 1e-9 * max(1, abs(x))
            else:
                ok = x == y
            assert ok, f"{name}.{col}[{i}]: {x!r} != {y!r}"


def all_query_names():
    from pdf_watermark_removal_otsu_inpaint_ray.queries import ORACLE_SQL

    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(ray_session, con, name):
    from pdf_watermark_removal_otsu_inpaint_ray.queries import ORACLE_SQL, QUERIES

    ray_df = to_pandas(QUERIES[name](SF_DIR))
    sql_df = con.execute(ORACLE_SQL[name]).fetchdf()
    assert_frames_match(ray_df, sql_df, name)


def test_rows_only_queries_run(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.queries import ORACLE_SQL, QUERIES

    for name in sorted(set(QUERIES) - set(ORACLE_SQL)):
        df = to_pandas(QUERIES[name](SF_DIR))
        assert df is not None and len(df) >= 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    df = to_pandas(ds)
    assert len(df) == 500
    assert {"doc_id", "tokens", "n_tok", "source"} <= set(df.columns)


def test_read_sequences_nested_layout(ray_session, tmp_path):
    """Regression (review finding): a directory with only SUBDIRS of parquet
    (hive-style part=NNN/ layout) must not crash the event_ts schema sniff."""
    import os

    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray import synth
    from pdf_watermark_removal_otsu_inpaint_ray.sources import read_sequences

    root = tmp_path / "nested"
    sub = root / "part=00000"
    os.makedirs(sub)
    synth.write_stream(str(sub / "data.parquet"), 40, n_sources=2)
    ds = read_sequences(str(root))
    t = pq.read_table(str(sub / "data.parquet"))
    assert ds.count() == t.num_rows
    assert "event_ts" in ds.schema().names


def test_anti_join_empty_build_side(ray_session, tmp_path):
    """Review finding: when NO order passes the qualifying predicate the
    broadcast key set is empty — every customer must pass through (NOT
    EXISTS over an empty set), not crash on an empty-array index."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import (
        q_customers_without_orders,
    )

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "o_custkey": pa.array([1, 2], pa.int64()),
                "o_totalprice": pa.array([10.0, 20.0], pa.float64()),
            }
        ),
        f"{sf}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_name": pa.array(["a", "b", "c"]),
            }
        ),
        f"{sf}/customer.parquet",
    )
    got = q_customers_without_orders(sf).to_pandas().sort_values(
        "c_custkey", ignore_index=True
    )
    assert got["c_custkey"].tolist() == [1, 2, 3]


def test_orders_pivot_rejects_unknown_status(ray_session, tmp_path):
    """Review finding: a status outside the fixed pivot domain must raise a
    clear error, not an opaque iterator ValueError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import q_orders_pivot

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "o_orderdate": pa.array([18000, 18001], pa.date32()),
                "o_orderstatus": pa.array(["F", "X"]),
            }
        ),
        f"{sf}/orders.parquet",
    )
    with pytest.raises(Exception, match="pivot domain"):
        q_orders_pivot(sf).to_pandas()
