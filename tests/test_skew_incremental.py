"""salted_skew_join (stages/join.py) and incremental_dedup
(functions/dedup.py): result equality vs brute references under heavy key
skew / cross-snapshot overlap, plus the salting mechanics themselves."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _skew_tables(n=2000, hot_frac=0.85, seed=3):
    """events-like probe where one key owns ``hot_frac`` of rows."""
    rng = np.random.default_rng(seed)
    hot_n = int(n * hot_frac)
    keys = np.concatenate(
        [np.full(hot_n, 7, np.int64), rng.integers(0, 50, n - hot_n)]
    )
    rng.shuffle(keys)
    probe = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(keys, pa.int64()),
        }
    )
    build = pa.table(
        {
            "user_id": pa.array(np.arange(0, 40), pa.int64()),  # 40..49 unmatched
            "payload": pa.array([f"c{i}" for i in range(40)], pa.string()),
        }
    )
    return probe, build


def test_salted_skew_join_equals_plain_join(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.stages.join import salted_skew_join

    probe, build = _skew_tables()
    out = (
        salted_skew_join(
            ray.data.from_arrow(probe).repartition(6),
            ray.data.from_arrow(build).repartition(2),
            on="user_id",
            salt=4,
            hot_capacity=8,
        )
        .to_pandas()
        .sort_values(["event_id"], ignore_index=True)
    )
    expect = (
        probe.to_pandas()
        .merge(build.to_pandas(), on="user_id", how="inner")
        .sort_values(["event_id"], ignore_index=True)
    )
    assert list(out.columns) in (
        ["event_id", "user_id", "payload"],
        ["user_id", "event_id", "payload"],
    ) or set(out.columns) == {"event_id", "user_id", "payload"}
    out = out[["event_id", "user_id", "payload"]]
    expect = expect[["event_id", "user_id", "payload"]]
    pd.testing.assert_frame_equal(out, expect)


def test_salted_skew_join_no_hot_keys_and_dup_build(ray_session):
    """Uniform keys (MG finds nothing dominant — whatever it returns is
    routing-only) and a build side with DUPLICATE key rows (each probe row
    must fan out to every matching build row, including replicated hot
    copies exactly once each)."""
    from pdf_watermark_removal_otsu_inpaint_ray.stages.join import salted_skew_join

    rng = np.random.default_rng(11)
    n = 600
    probe = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
        }
    )
    build = pa.table(
        {
            # key 5 appears twice in the build side
            "user_id": pa.array(list(range(30)) + [5], pa.int64()),
            "payload": pa.array([f"c{i}" for i in range(30)] + ["c5b"], pa.string()),
        }
    )
    out = (
        salted_skew_join(
            ray.data.from_arrow(probe).repartition(4),
            ray.data.from_arrow(build),
            on="user_id",
            salt=3,
            hot_capacity=4,
        )
        .to_pandas()
        .sort_values(["event_id", "payload"], ignore_index=True)
    )
    expect = (
        probe.to_pandas()
        .merge(build.to_pandas(), on="user_id", how="inner")
        .sort_values(["event_id", "payload"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        out[["event_id", "user_id", "payload"]],
        expect[["event_id", "user_id", "payload"]],
    )


def test_incremental_dedup_cross_snapshot(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        incremental_dedup,
    )

    # base: texts A, B.  delta: A (dup of base — dropped), C×3 (internal
    # dups — collapsed to min id), D (unique — kept), B (base dup), E ""
    rows = [
        (0, "A", 1),
        (1, "B", 1),
        (10, "C", 0),
        (11, "C", 0),
        (12, "D", 0),
        (13, "A", 0),
        (14, "C", 0),
        (15, "B", 0),
        (16, "", 0),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "is_base": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = (
        incremental_dedup(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("keep_id", ignore_index=True)
    )
    assert out.to_dict("records") == [
        {"text": "C", "keep_id": 10, "n_delta_dup": 3},
        {"text": "D", "keep_id": 12, "n_delta_dup": 1},
        {"text": "", "keep_id": 16, "n_delta_dup": 1},
    ]


def test_incremental_dedup_all_dropped(ray_session):
    """Every delta text exists in base → empty result (the empty-partition
    frame must keep its schema through Arrow conversion)."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        incremental_dedup,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["x", "y", "x", "y"], pa.string()),
            "is_base": pa.array([1, 1, 0, 0], pa.int64()),
        }
    )
    ds = incremental_dedup(ray.data.from_arrow(tbl))
    # the driver pads empty results from schema().names — that is the
    # stability contract an all-dropped run must uphold
    assert set(ds.schema().names) == {"text", "keep_id", "n_delta_dup"}
    assert len(ds.to_pandas()) == 0


def test_user_cohort_retention_planted(ray_session, tmp_path):
    """Hand-built cohorts: users 1-2 start week 0, user 3 starts week 1;
    repeat events in the same (user, week) must not inflate counts."""
    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import (
        q_user_cohort_retention,
    )

    WEEK = 7 * 24 * 3600 * 1_000_000
    rows = [  # (user, week) with duplicates
        (1, 0), (1, 0), (1, 1), (1, 3),
        (2, 0), (2, 1),
        (3, 1), (3, 1), (3, 2),
    ]
    ts = pa.array(
        np.array(
            [w * WEEK + 1000 * i for i, (u, w) in enumerate(rows)], np.int64
        ),
        pa.int64(),
    ).cast(pa.timestamp("us"))
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, w in rows], pa.int64()),
            "ts": ts,
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = (
        q_user_cohort_retention(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"], ignore_index=True)
    )
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for _, r in out.iterrows()
    }
    assert got == {
        (0, 0): 2,  # users 1, 2
        (0, 1): 2,  # users 1, 2
        (0, 3): 1,  # user 1
        (1, 0): 1,  # user 3
        (1, 1): 1,  # user 3
    }


def test_cross_source_texts_planted(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        cross_source_texts,
    )

    rows = [  # (doc_id, text, source)
        (0, "shared nav", "a"),
        (1, "shared nav", "b"),
        (2, "shared nav", "b"),   # extra doc in same source: n_docs=3, n_sources=2
        (3, "only-a", "a"),
        (4, "only-a", "a"),       # duplicated WITHIN one source: excluded
        (5, "tri", "a"),
        (6, "tri", "b"),
        (7, "tri", "c"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = (
        cross_source_texts(ray.data.from_arrow(tbl).repartition(3))
        .to_pandas()
        .sort_values("text", ignore_index=True)
    )
    assert out.to_dict("records") == [
        {"text": "shared nav", "n_sources": 2, "n_docs": 3},
        {"text": "tri", "n_sources": 3, "n_docs": 3},
    ]


def test_normalize_text_unicode_cases(ray_session):
    """NFC composition, case folding, and whitespace collapse against
    DuckDB's identical expression on unicode inputs (the sf corpora are
    ASCII, so the driver twin alone never exercises these paths)."""
    import duckdb

    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        normalize_text_batch,
    )

    texts = [
        "école  PLUS\tmore",   # combining accent -> NFC é; tabs/runs
        "  \n MiXeD \r\n CASE  ",   # trim + CRLF collapse
        "ﬁle",                      # compatibility ligature: NFC keeps it
        "",                          # empty
        "Å",             # A + ring -> Å -> å
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        ray.data.from_arrow(tbl)
        .map_batches(normalize_text_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    expect = con.execute(
        """SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(text)),
                                '\\s+', ' ', 'g')) AS norm_text
           FROM t ORDER BY doc_id"""
    ).fetchdf()
    assert got["norm_text"].tolist() == expect["norm_text"].tolist()
    assert got["norm_text"].tolist()[0] == "école plus more"
    assert got["norm_text"].tolist()[4] == "å"


def test_dedup_keep_best_planted_variants(ray_session):
    """Keep-best canonical dedup: case/whitespace variants of one text
    normalize identically; the LONGEST raw variant wins, ties to lowest
    doc_id; unique docs pass through as 1-variant clusters."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import dedup_keep_best

    texts = [
        "Hello   World",          # id 0, len 13  <- longest variant, wins
        "hello world",            # id 1, len 11   same canonical form
        "HELLO  world",           # id 2, len 12   same canonical form
        "another doc",            # id 3, unique
        "tie text A",             # id 4, len 10  <- tie: lowest id wins
        "tie  text a",            # id 5, len 11  <- actually longer, wins
        "TIE TEXT A",             # id 6, len 10
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64), pa.int64()),
            "text": pa.array(texts),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    out = (
        dedup_keep_best(ray.data.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("keep_id", ignore_index=True)
    )
    got = {
        int(r.keep_id): (int(r.keep_len), int(r.n_variants))
        for r in out.itertuples()
    }
    assert got == {0: (13, 3), 3: (11, 1), 5: (11, 3)}

    # equal-length tie -> lowest doc_id: drop the len-11 variant
    tbl2 = tbl.filter(pa.array([t != "tie  text a" for t in texts]))
    out2 = dedup_keep_best(ray.data.from_arrow(tbl2).repartition(3)).to_pandas()
    got2 = {int(r.keep_id): int(r.n_variants) for r in out2.itertuples()}
    assert got2 == {0: 3, 3: 1, 4: 2}
