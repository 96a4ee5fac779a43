"""Round-3 corpus operators: cross-doc dup n-grams, distributed k-means,
HLL distinct sketch, mixture resampling, per-group sampling — edge cases
and batch-layout invariance (the mini-driver in test_entry.py covers the
oracle equality at sf0.001)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_watermark_removal_otsu_inpaint_ray.functions.dupspans import (
    cross_doc_dup_stats,
)
from pdf_watermark_removal_otsu_inpaint_ray.functions.selection import (
    mix_sources,
    sample_per_group,
)
from pdf_watermark_removal_otsu_inpaint_ray.functions.similarity import (
    kmeans_embeddings,
)
from pdf_watermark_removal_otsu_inpaint_ray.functions.sketch import (
    approx_distinct_words,
    hll_estimate,
    hll_registers,
)


def _docs(texts, ids=None, sources=None):
    n = len(texts)
    return pa.table(
        {
            "doc_id": pa.array(ids or list(range(n)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(sources or ["s"] * n, pa.string()),
        }
    )


def _brute_dup_stats(texts, ids, n=3):
    from collections import Counter

    grams_per_doc = {}
    tot = Counter()
    for i, t in zip(ids, texts):
        ws = t.lower().split()
        gs = [" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)]
        grams_per_doc[i] = gs
        tot.update(gs)
    out = {}
    for i, gs in grams_per_doc.items():
        if gs:
            out[i] = (len(gs), sum(1 for g in gs if tot[g] > 1))
    return out


def test_dup_ngrams_matches_brute_force(ray_session):
    texts = [
        "a b c d e",          # shares "a b c" with doc 1
        "a b c x y",
        "p q r p q r p q",    # internal repeat: "p q r" twice
        "one two",            # < 3 words: no row
        "u v w",              # unique single gram
    ]
    ids = [10, 11, 12, 13, 14]
    ds = ray.data.from_arrow(_docs(texts, ids)).repartition(3)
    got = cross_doc_dup_stats(ds, n=3).to_pandas().set_index("doc_id")
    want = _brute_dup_stats(texts, ids)
    assert set(got.index) == set(want)
    for i, (ng, nd) in want.items():
        assert got.loc[i, "n_grams"] == ng, i
        assert got.loc[i, "n_dup"] == nd, i
    assert 13 not in got.index  # short doc emits no row


def test_dup_ngrams_block_layout_invariant(ray_session):
    texts = [f"w{i} w{i+1} w{i+2} w{i+3} common gram here" for i in range(12)]
    tbl = _docs(texts, list(range(12)))
    a = (
        cross_doc_dup_stats(ray.data.from_arrow(tbl), n=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        cross_doc_dup_stats(ray.data.from_arrow(tbl).repartition(7), n=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a.equals(b)


def _emb_table(n=64, d=8, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32) * 0.3
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )


def test_kmeans_block_layout_invariant(ray_session):
    tbl = _emb_table()
    a = (
        kmeans_embeddings(ray.data.from_arrow(tbl), k=4, iters=3)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    b = (
        kmeans_embeddings(ray.data.from_arrow(tbl).repartition(9), k=4, iters=3)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert a.equals(b)
    assert set(a["cluster"]) <= set(range(4))


def test_kmeans_empty_cluster_and_small_n(ray_session):
    # identical vectors: ties break to cluster 0; cluster 1 stays empty and
    # must keep its centroid without NaN/crash
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([[0.1, 0.2]] * 3, pa.list_(pa.float32())),
        }
    )
    out = kmeans_embeddings(ray.data.from_arrow(tbl), k=2, iters=2).to_pandas()
    assert out["cluster"].tolist() == [0, 0, 0]
    with pytest.raises(ValueError, match=">= k"):
        kmeans_embeddings(ray.data.from_arrow(tbl), k=5, iters=1).to_pandas()


def test_hll_registers_merge_and_layout_invariance(ray_session):
    # register monoid: max-merge of two halves == registers of the union
    rng = np.random.default_rng(11)
    # full 64-bit range — the bucket index is the TOP p bits, so a 63-bit
    # generator would leave half the registers structurally empty
    h = rng.integers(0, 2**64, 1000, dtype=np.uint64)
    g = np.zeros(1000, np.int64)
    full = hll_registers(h, g, 1)
    ha, hb = h[:400], h[400:]
    merged = np.maximum(
        hll_registers(ha, np.zeros(400, np.int64), 1),
        hll_registers(hb, np.zeros(600, np.int64), 1),
    )
    assert np.array_equal(full, merged)
    # estimate is sane at this cardinality (~1000 distinct, p=12)
    est = hll_estimate(full[0])
    assert abs(est - 1000) / 1000 < 0.1

    texts = [f"word{i} word{i+1} shared token stream" for i in range(30)]
    tbl = _docs(texts, list(range(30)), ["a"] * 15 + ["b"] * 15)
    one = (
        approx_distinct_words(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("source", ignore_index=True)
    )
    many = (
        approx_distinct_words(ray.data.from_arrow(tbl).repartition(8))
        .to_pandas()
        .sort_values("source", ignore_index=True)
    )
    assert one.equals(many)


def test_mix_sources_rates_and_unknown_source(ray_session):
    tbl = _docs(
        [f"t{i}" for i in range(400)],
        list(range(400)),
        ["a"] * 200 + ["b"] * 200,
    )
    ds = ray.data.from_arrow(tbl)
    out = mix_sources(ds, {"a": 1000, "b": 0}).to_pandas()
    assert set(out["source"]) == {"a"} and len(out) == 200  # keep-all vs drop-all
    with pytest.raises(Exception, match="without a mix weight"):
        mix_sources(ds, {"a": 500}).to_pandas()


def test_sample_per_group_small_groups_kept_whole(ray_session):
    tbl = _docs(["x"] * 7, list(range(7)), ["a", "a", "a", "a", "a", "b", "b"])
    out = sample_per_group(
        ray.data.from_arrow(tbl), group="source", key="doc_id", k=3
    ).to_pandas()
    by = out.groupby("source")["doc_id"].count()
    assert by["a"] == 3 and by["b"] == 2  # group smaller than k kept whole


def test_bloom_filter_properties_and_semi_join(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.sketch import (
        BloomFilter,
        bloom_semi_join,
    )

    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(0, 10**9, 500))
    bf = BloomFilter(log2_m=14).add(keys)
    assert bf.contains(keys).all()  # no false negatives, ever

    build = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 4, 6, 8], pa.int64())})
    )
    probe_tbl = pa.table(
        {
            "user_id": pa.array(list(range(10)), pa.int64()),
            "payload": pa.array([f"p{i}" for i in range(10)]),
        }
    )
    probe = ray.data.from_arrow(probe_tbl).repartition(3)
    out = bloom_semi_join(
        probe, build, probe_on="user_id", build_on="k", log2_m=8
    ).to_pandas()
    assert sorted(out["user_id"]) == [2, 4, 6, 8]
    assert sorted(out["payload"]) == ["p2", "p4", "p6", "p8"]  # payload carried

    # a DELIBERATELY undersized filter (2^6 bits, 600 keys) saturates with
    # false positives; exact verify must still return the true set
    big_build = ray.data.from_arrow(
        pa.table({"k": pa.array(list(range(0, 1200, 2)), pa.int64())})
    )
    out2 = bloom_semi_join(
        probe, big_build, probe_on="user_id", build_on="k", log2_m=6, exact=True
    ).to_pandas()
    assert sorted(out2["user_id"]) == [0, 2, 4, 6, 8]
    # exact=False on the saturated filter is a superset (bounded FP rate is
    # the documented contract; here it degenerates to keep-everything)
    out3 = bloom_semi_join(
        probe, big_build, probe_on="user_id", build_on="k", log2_m=6, exact=False
    ).to_pandas()
    assert set(out2["user_id"]) <= set(out3["user_id"])

    # empty build side: nothing passes
    empty = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    out4 = bloom_semi_join(
        probe, empty, probe_on="user_id", build_on="k", log2_m=8
    ).to_pandas()
    assert len(out4) == 0


def test_redact_grams_masks_matching_spans(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        RedactGramsStage,
        eval_gram_array,
    )

    eval_ds = ray.data.from_arrow(_docs(["secret eval phrase here"]))
    gref = ray.put(eval_gram_array(eval_ds, n=3))
    corpus = _docs(
        [
            "intro Secret EVAL phrase outro",   # case-insensitive match
            "eval phrase here and more",         # second eval gram
            "no overlap at all",
            "two words",                         # < 3 words: untouched
            "  spaced\tout   text  here ",       # whitespace-normalized
        ],
        ids=[1, 2, 3, 4, 5],
    )
    out = (
        ray.data.from_arrow(corpus)
        .map_batches(
            RedactGramsStage,
            fn_constructor_kwargs={"gram_ref": gref, "n": 3},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "redacted"] == "intro <wm> <wm> <wm> outro"
    assert out.loc[1, "n_redacted"] == 3
    assert out.loc[2, "redacted"] == "<wm> <wm> <wm> and more"
    assert out.loc[3, "redacted"] == "no overlap at all"
    assert out.loc[3, "n_redacted"] == 0
    assert out.loc[4, "redacted"] == "two words"
    assert out.loc[5, "redacted"] == "spaced out text here"


def test_grouped_rolling_sum_matches_brute(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        grouped_rolling_sum,
    )

    rng = np.random.default_rng(9)
    n = 300
    tbl = pa.table(
        {
            "g": pa.array(rng.integers(0, 7, n), pa.int64()),
            "o": pa.array(rng.integers(0, 40, n), pa.int64()),  # heavy ties
            "t": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(rng.integers(-50, 50, n), pa.int64()),
        }
    )
    got = (
        grouped_rolling_sum(
            ray.data.from_arrow(tbl).repartition(5),
            group="g", order="o", tiebreak="t", value="v", window=3,
        )
        .to_pandas()
        .sort_values(["g", "o", "t"], ignore_index=True)
    )
    import pandas as pd

    df = tbl.to_pandas().sort_values(["g", "o", "t"], ignore_index=True)
    want = (
        df.groupby("g")["v"]
        .rolling(3, min_periods=1)
        .sum()
        .reset_index(level=0, drop=True)
        .astype(np.int64)
    )
    assert got["roll_sum"].tolist() == want.tolist()


def test_priority_revenue_partition_with_single_side(ray_session, tmp_path):
    """A pk partition holding only lineitems (no matching order) must emit
    nothing for them — inner-join semantics, no crash on the empty side."""
    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import q_priority_revenue

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 999], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0, 99.0], pa.float64()),
                "l_discount": pa.array([0.10, 0.0, 0.5], pa.float64()),
            }
        ),
        f"{sf}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"]),
            }
        ),
        f"{sf}/orders.parquet",
    )
    got = q_priority_revenue(sf).to_pandas()
    # order 1: 1000c*90 + 2000c*100 = 290000; orderkey 999 unmatched drops;
    # order 2 has no lineitems -> absent (inner join)
    assert got["o_orderpriority"].tolist() == ["1-URGENT"]
    assert got["revenue_c"].tolist() == [290000]


def test_misra_gries_summary_and_heavy_hitters(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.sketch import (
        _mg_summary,
        heavy_hitter_tokens,
    )

    # MG bound: every key with count > N/(k+1) survives compression
    keys = np.arange(100, dtype=np.int64)
    counts = np.ones(100, np.int64)
    counts[:3] = [50, 40, 30]  # N = 217, k=9 -> bound 21.7
    ks, cs = _mg_summary(keys, counts, 9)
    assert {0, 1, 2} <= set(ks.tolist())
    assert len(ks) <= 9
    # undercount is bounded by the subtracted threshold
    got = dict(zip(ks.tolist(), cs.tolist()))
    assert 50 >= got[0] > 50 - 22

    # end-to-end exactness under a deliberately tight sketch on skew
    texts = (["hot word alpha beta"] * 30) + [f"tail{i} filler{i}" for i in range(40)]
    ds = ray.data.from_arrow(_docs(texts, list(range(len(texts))))).repartition(6)
    got_tbl = heavy_hitter_tokens(ds, k=4, sketch_k=16).to_pandas()
    assert got_tbl["token"].tolist() == ["alpha", "beta", "hot", "word"]
    assert got_tbl["n"].tolist() == [30, 30, 30, 30]


# ---------------------------------------------------------------------------
# hypothesis property tests: gram operators vs pure-Python specs
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

# words of non-whitespace chars (ASCII + a few unicode letters), docs of
# words joined by runs of ASCII whitespace — the regime where the Arrow
# ASCII-space split, Python \S+ and str.split() all agree (the documented
# tokenization contract of the gram kernels)
_word = st.text(
    alphabet=st.sampled_from(list("abcxyzAB09_#é漢")), min_size=1, max_size=5
)
_ws = st.sampled_from([" ", "  ", "\t", " \t ", "\n"])
_doc = st.lists(st.tuples(_word, _ws), min_size=0, max_size=12).map(
    lambda ps: "".join(w + s for w, s in ps)
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_dup_ngrams_property_vs_python_spec(texts):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    ids = list(range(100, 100 + len(texts)))
    got_df = cross_doc_dup_stats(
        ray.data.from_arrow(_docs(texts, ids)).repartition(3), n=2
    ).to_pandas()
    want = _brute_dup_stats(texts, ids, n=2)
    if not want:
        assert len(got_df) == 0  # no full gram anywhere -> empty (columnless) result
        return
    got = got_df.set_index("doc_id")
    assert set(got.index) == set(want)
    for i, (ng, nd) in want.items():
        assert got.loc[i, "n_grams"] == ng
        assert got.loc[i, "n_dup"] == nd


def _py_redact(texts, eval_texts, n=2, mask="<wm>"):
    ev = set()
    for t in eval_texts:
        ws = t.lower().split()
        ev.update(tuple(ws[j : j + n]) for j in range(len(ws) - n + 1))
    out = []
    for t in texts:
        ws = t.lower().split()
        bad = [False] * len(ws)
        for j in range(len(ws) - n + 1):
            if tuple(ws[j : j + n]) in ev:
                for d in range(n):
                    bad[j + d] = True
        out.append(
            (
                " ".join(mask if b else w for w, b in zip(ws, bad)),
                sum(bad),
            )
        )
    return out


@settings(max_examples=25, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=6), st.lists(_doc, min_size=0, max_size=3))
def test_redact_grams_property_vs_python_spec(texts, eval_texts):
    import ray

    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        RedactGramsStage,
        eval_gram_array,
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    gref = ray.put(
        eval_gram_array(ray.data.from_arrow(_docs(eval_texts or [""])), n=2)
    )
    got = (
        ray.data.from_arrow(_docs(texts, list(range(len(texts)))))
        .map_batches(
            RedactGramsStage,
            fn_constructor_kwargs={"gram_ref": gref, "n": 2},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = _py_redact(texts, eval_texts, n=2)
    assert got["redacted"].tolist() == [w[0] for w in want]
    assert got["n_redacted"].tolist() == [w[1] for w in want]


def test_heavy_hitters_unicode_whitespace_and_wide_candidates(ray_session):
    """Review findings: (a) NBSP-bearing text must not misalign token
    strings (one shared tokenizer now); (b) candidate sets wider than the
    iter_batches block size must recount correctly (sketch_k > 256)."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.sketch import (
        heavy_hitter_tokens,
    )

    # (a) NBSP: Arrow's ASCII split keeps "x y" as ONE token; the
    # whole pipeline must agree with itself and count it as one
    texts = ["x y plain plain", "plain x y word"]
    out = heavy_hitter_tokens(
        ray.data.from_arrow(_docs(texts)), k=3, sketch_k=8
    ).to_pandas()
    assert out["token"].tolist()[0] == "plain" and out["n"].tolist()[0] == 3
    assert "x y" in out["token"].tolist()
    assert out.set_index("token").loc["x y", "n"] == 2

    # (b) ~400 distinct tokens, multiple blocks, sketch_k=512 (> the 256
    # iter_batches default): exact top-5 must still come out
    texts2 = ["hot tok " * 5] * 20 + [f"w{i} v{i}" for i in range(400)]
    ds = ray.data.from_arrow(_docs(texts2, list(range(len(texts2))))).repartition(7)
    out2 = heavy_hitter_tokens(ds, k=2, sketch_k=512).to_pandas()
    assert out2["token"].tolist() == ["hot", "tok"]
    assert out2["n"].tolist() == [100, 100]


def test_train_unigram_empty_corpus(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.lm import train_unigram

    wh, logp, total = train_unigram(ray.data.from_arrow(_docs(["", "  "])))
    assert wh.size == 0 and logp.size == 0 and total == 0


def test_collapse_repeats_edge_cases(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        collapse_repeat_words_batch,
    )

    tbl = _docs(
        [
            "a a a b b a",        # runs collapse, non-adjacent repeats stay
            "x",                  # single word untouched
            "",                   # empty doc -> empty string, 0 dropped
            "Y y  Y",             # case-folded + whitespace-normalized
        ],
        ids=[1, 2, 3, 4],
    )
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(collapse_repeat_words_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "collapsed"] == "a b a" and out.loc[1, "n_dropped"] == 3
    assert out.loc[2, "collapsed"] == "x" and out.loc[2, "n_dropped"] == 0
    assert out.loc[3, "collapsed"] == "" and out.loc[3, "n_dropped"] == 0
    assert out.loc[4, "collapsed"] == "y" and out.loc[4, "n_dropped"] == 2


def test_semdedup_planted_duplicates_and_layout_invariance(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.similarity import semdedup

    rng = np.random.default_rng(21)
    base = rng.standard_normal((30, 8)).astype(np.float32) * 0.3
    # plant near-dups: rows 30..34 are tiny perturbations of rows 0..4
    pert = base[:5] + rng.standard_normal((5, 8)).astype(np.float32) * 0.001
    m = np.vstack([base, pert])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(35, dtype=np.int64), pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
    out = (
        semdedup(ray.data.from_arrow(tbl), k=3, iters=3, threshold=0.99)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    # each planted copy has a smaller-id near-identical partner -> dup;
    # the originals (smaller ids) stay kept
    assert out.loc[out["vec_id"] >= 30, "is_dup"].tolist() == [1] * 5
    assert out.loc[out["vec_id"] < 5, "is_dup"].tolist() == [0] * 5

    out2 = (
        semdedup(ray.data.from_arrow(tbl).repartition(6), k=3, iters=3, threshold=0.99)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert out.equals(out2)


def test_orders_integrity_flags_violations(ray_session, tmp_path):
    """The uniqueness constraint resolves distributed: duplicate keys split
    ACROSS blocks must still count once (per-key totals meet in one
    partition), and null/nonpositive prices are tallied."""
    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import q_orders_integrity

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 2, 3, 3, 3, 4], pa.int64()),
                "o_totalprice": pa.array(
                    [10.0, None, -5.0, 1.0, 2.0, 3.0, 0.0], pa.float64()
                ),
            }
        ),
        f"{sf}/orders.parquet",
    )
    got = q_orders_integrity(sf)
    assert got["n_rows"].iloc[0] == 7
    assert got["n_null_price"].iloc[0] == 1
    assert got["n_price_nonpos"].iloc[0] == 2  # -5.0 and 0.0 (null coalesces ok)
    assert got["n_dup_keys"].iloc[0] == 2      # keys 2 and 3
    assert got["n_dup_rows"].iloc[0] == 5      # 2 + 3 rows


def test_review_fixes_dedup_similarity(ray_session):
    """Fifth-review-pass findings on dedup.py/similarity.py: pow-table
    vectorized parity, oversized-doc SimHash slabbing, bands divisor
    validation, zero-row batch guards, IVF fit normalization invariance,
    and n_probe validation."""
    import pyarrow as pa
    import pytest

    from pdf_watermark_removal_otsu_inpaint_ray.functions import dedup as dd
    from pdf_watermark_removal_otsu_inpaint_ray.functions.similarity import IvfIndex

    # pow table: geometric growth keeps parity with the definition
    dd._POW64.pop("t", None)
    p1 = dd._pow_table_64(dd._POLY_P, 10, "t").copy()
    p2 = dd._pow_table_64(dd._POLY_P, 3000, "t")
    assert np.array_equal(p1[:10], p2[:10])
    with np.errstate(over="ignore"):
        assert p2[2999] == p2[2998] * dd._POLY_P

    # oversized-doc SimHash slab: identical signature either side of the bound
    stage = dd.SimHashStage()
    big = " ".join(f"w{i % 997}" for i in range(stage.CHUNK_WORDS + 50))
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array([big])})
    sig_slabbed = stage(t)["simhash"].to_pylist()
    old_chunk = dd.SimHashStage.CHUNK_WORDS
    try:
        dd.SimHashStage.CHUNK_WORDS = 1 << 30  # force the one-shot path
        sig_oneshot = dd.SimHashStage()(t)["simhash"].to_pylist()
    finally:
        dd.SimHashStage.CHUNK_WORDS = old_chunk
    assert sig_slabbed == sig_oneshot

    # sig_table agrees with the payload-emitting __call__
    ms = dd.MinHashStage(num_hashes=16)
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c d e", "", "a b"]),
        }
    )
    full = ms(docs)
    lite = ms.sig_table(docs)
    assert full["sig"].to_pylist() == lite["sig"].to_pylist()
    n_sh = [len(s) for s in full["shingles"].to_pylist()]
    assert [(n > 0) for n in n_sh] == [(g > 0) for g in lite["n_grams"].to_pylist()]

    # bands must divide num_hashes — fail fast with the real cause
    import ray.data

    ds = ray.data.from_arrow(docs)
    with pytest.raises(ValueError, match="bands"):
        dd.minhash_lsh_dedup(ds, num_hashes=64, bands=6)

    # IVF: n_probe validation + fit normalizes (norm-scaled sample gives
    # identical centroids)
    with pytest.raises(ValueError, match="n_probe"):
        IvfIndex(n_list=2, n_probe=4)
    rng = np.random.default_rng(7)
    sample = rng.normal(size=(64, 8))
    sn = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    c_raw = IvfIndex(n_list=4, n_probe=2).fit(sample * 100.0).centroids
    c_norm = IvfIndex(n_list=4, n_probe=2).fit(sn).centroids
    assert np.allclose(c_raw, c_norm)


def test_nation_revenue_two_hop_inner_join(ray_session, tmp_path):
    """Star join: both hops must apply inner-join semantics (an order whose
    custkey is missing from customer drops at hop 2) and revenue must
    aggregate integer-exactly per nation."""
    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import q_nation_revenue

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 2, 3, 999], pa.int64()),
                "l_extendedprice": pa.array([10.0, 20.0, 5.0, 7.0, 99.0]),
                "l_discount": pa.array([0.10, 0.0, 0.05, 0.0, 0.5]),
            }
        ),
        f"{sf}/lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                # order 3's custkey 777 is absent from customer → drops
                "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                "o_custkey": pa.array([100, 200, 777], pa.int64()),
            }
        ),
        f"{sf}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([100, 200], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int64()),
            }
        ),
        f"{sf}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_name": pa.array(["ALPHA", "BETA"]),
            }
        ),
        f"{sf}/nation.parquet",
    )
    got = (
        q_nation_revenue(sf)
        .to_pandas()
        .sort_values("n_name", ignore_index=True)
    )
    # ALPHA (order 1): 1000c*90 + 2000c*100 = 290000
    # BETA  (order 2): 500c*95 = 47500
    # order 3 (custkey 777 unmatched) and orderkey 999 (no order) drop
    assert got["n_name"].tolist() == ["ALPHA", "BETA"]
    assert got["revenue_c"].tolist() == [290000, 47500]


def test_price_quantiles_forced_bisection(ray_session, tmp_path):
    """Tiny nbins/gather_limit force multiple histogram refine passes; the
    result must still equal the exact sorted-array statistic, including on
    a duplicate-heavy column (stall→gather fallback)."""
    import math

    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import q_price_quantiles

    rng = np.random.default_rng(42)
    # skewed + duplicate-heavy: lognormal floats, then 1500 copies of one value
    vals = np.concatenate(
        [rng.lognormal(mean=8.0, sigma=1.5, size=3500), np.full(1500, 1234.56)]
    )
    rng.shuffle(vals)
    sf = str(tmp_path)
    pq.write_table(
        pa.table({"o_totalprice": pa.array(vals, pa.float64())}),
        f"{sf}/orders.parquet",
    )
    got = (
        q_price_quantiles(sf, nbins=8, gather_limit=64)
        .to_pandas()
        .sort_values("q", ignore_index=True)
    )
    sv = np.sort(vals)
    n = sv.size
    for q, v in zip(got["q"], got["value"]):
        want = sv[max(0, math.ceil(q * n) - 1)]
        assert v == want, (q, v, want)


def test_price_quantiles_constant_column(ray_session, tmp_path):
    """All-equal column: the min==max degenerate range must short-circuit."""
    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import q_price_quantiles

    sf = str(tmp_path)
    pq.write_table(
        pa.table({"o_totalprice": pa.array([77.5] * 500, pa.float64())}),
        f"{sf}/orders.parquet",
    )
    got = q_price_quantiles(sf, nbins=8, gather_limit=64).to_pandas()
    assert got["value"].tolist() == [77.5] * 5


def test_customer_order_balance_full_outer(ray_session, tmp_path):
    """Full outer join must emit matched, left-only (null n_orders) AND
    right-only (null c_acctbal) rows, with order-count partials finishing
    their aggregation inside the pk group."""
    import pandas as pd
    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import (
        q_customer_order_balance,
    )

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 65], pa.int64()),  # 1 and 65 share pk%64
                "c_acctbal": pa.array([10.5, 20.0, 65.5], pa.float64()),
            }
        ),
        f"{sf}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            # custkey 1: 3 orders; custkey 9: orphan (no customer row);
            # custkey 2: none → left-only
            {"o_custkey": pa.array([1, 1, 1, 9, 9], pa.int64())}
        ),
        f"{sf}/orders.parquet",
    )
    got = (
        q_customer_order_balance(sf)
        .to_pandas()
        .sort_values("custkey", ignore_index=True)
    )
    assert got["custkey"].tolist() == [1, 2, 9, 65]
    assert got["c_acctbal"].tolist()[:2] == [10.5, 20.0]
    assert pd.isna(got["c_acctbal"][2]) and got["c_acctbal"][3] == 65.5
    assert got["n_orders"][0] == 3 and pd.isna(got["n_orders"][1])
    assert got["n_orders"][2] == 2 and pd.isna(got["n_orders"][3])


def test_source_corr_matches_numpy_and_layout_invariant(ray_session, tmp_path):
    """Grouped Pearson partials must reduce to np.corrcoef regardless of
    how rows are split across blocks; a zero-variance group yields NULL."""
    import pandas as pd
    import pyarrow.parquet as pq

    from pdf_watermark_removal_otsu_inpaint_ray.queries import q_source_corr

    rng = np.random.default_rng(7)
    n = 400
    words = rng.integers(1, 40, n)
    texts = [" ".join(["w"] * int(k)) for k in words]
    # n_chars loosely tracks word count with noise → non-trivial corr
    n_chars = (words * 3 + rng.integers(0, 25, n)).astype(np.int64)
    src = np.where(np.arange(n) % 3 == 0, "a", "b")
    # group "c": constant length → zero variance → NULL corr
    texts += ["x y", "x y", "x y"]
    n_chars = np.concatenate([n_chars, [5, 5, 5]])
    src = np.concatenate([src, ["c"] * 3])
    tbl = pa.table(
        {
            "text": pa.array(texts, pa.string()),
            "source": pa.array(src, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )

    def run(row_group_size):
        pq.write_table(
            tbl, f"{tmp_path}/documents.parquet", row_group_size=row_group_size
        )
        return (
            q_source_corr(str(tmp_path))
            .to_pandas()
            .sort_values("source", ignore_index=True)
        )

    got = run(13)  # many tiny row groups → many blocks
    wcounts = np.concatenate([words, [2, 2, 2]]).astype(np.float64)
    for g in ("a", "b"):
        m = src == g
        expect = np.corrcoef(n_chars[m].astype(float), wcounts[m])[0, 1]
        gotv = float(got.loc[got["source"] == g, "corr"].iloc[0])
        assert abs(gotv - expect) < 1e-12, (g, gotv, expect)
    assert pd.isna(got.loc[got["source"] == "c", "corr"].iloc[0])
    assert got["n"].tolist() == [
        int((src == "a").sum()), int((src == "b").sum()), 3
    ]
    got2 = run(4096)  # one block
    pd.testing.assert_frame_equal(got, got2)


def test_pca_project_layout_invariant_and_variance_ordered(ray_session):
    """The int64 projection must be identical for any block layout, and the
    retained components must capture variance in descending order (the PCA
    contract), with pc0 aligned to the planted dominant direction."""
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.similarity import (
        pca_project,
    )

    rng = np.random.default_rng(11)
    n, d = 300, 16
    # planted spectrum: one dominant axis, one secondary, isotropic noise
    u = rng.normal(size=d); u /= np.linalg.norm(u)
    v = rng.normal(size=d); v -= u * (u @ v); v /= np.linalg.norm(v)
    X = (
        np.outer(rng.normal(size=n) * 5.0, u)
        + np.outer(rng.normal(size=n) * 2.0, v)
        + rng.normal(size=(n, d)) * 0.05
    )
    X = np.clip(X / np.abs(X).max(), -1, 1)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in X],
                pa.list_(pa.float32()),
            ),
        }
    )

    def run(nblocks):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        return (
            pca_project(ds, r=3)
            .to_pandas()
            .sort_values("vec_id", ignore_index=True)
        )

    a, b = run(1), run(17)
    assert a.equals(b), "projection depends on block layout"
    P = a[["pc0", "pc1", "pc2"]].to_numpy(dtype=np.float64)
    var = P.var(axis=0)
    assert var[0] > var[1] > var[2] > 0
    # pc0 must recover the planted dominant axis: |corr| with X@u near 1
    t = X @ u
    c = np.corrcoef(P[:, 0], t)[0, 1]
    assert abs(c) > 0.99, c


def test_window_top_users_ties_and_layout(ray_session):
    """Heavy-hitter trim must keep (n DESC, user_id ASC) under count ties
    and be block-layout independent."""
    import pandas as pd

    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.windows import (
        HOUR_US,
        window_top_users,
    )

    # window 0: u1 x3, u2 x3, u3 x2, u4 x2, u5 x1 → top3 = u1,u2,u3
    # window 1 (type b): u9 x1, u8 x1 → both kept (ties → user asc)
    rows = (
        [("a", 0, 1)] * 3 + [("a", 1, 2)] * 3 + [("a", 2, 3)] * 2
        + [("a", 3, 4)] * 2 + [("a", 4, 5)]
        + [("b", HOUR_US + 5, 9), ("b", HOUR_US + 6, 8)]
    )
    tbl = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
        }
    )

    def run(nb):
        return (
            window_top_users(ray.data.from_arrow(tbl).repartition(nb), k=3)
            .to_pandas()
            .sort_values(["event_type", "window_id", "n", "user_id"],
                         ascending=[True, True, False, True],
                         ignore_index=True)
        )

    got = run(5)
    a_rows = got[got["event_type"] == "a"]
    assert a_rows["user_id"].tolist() == [1, 2, 3]  # u4 tied with u3 but larger id
    assert a_rows["n"].tolist() == [3, 3, 2]
    b_rows = got[got["event_type"] == "b"]
    assert b_rows["user_id"].tolist() == [8, 9]
    pd.testing.assert_frame_equal(got, run(1))


def test_term_cooccurrence_matches_brute_and_layout_invariant(ray_session):
    """Gram-matrix co-occurrence == brute per-doc pair sets; identical for
    any block layout; vocab tie-break is (df DESC, utf-8 byte order)."""
    from itertools import combinations

    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        term_cooccurrence,
    )

    rng = np.random.default_rng(59)
    vocab_pool = [f"w{i}" for i in range(12)]
    docs = [
        " ".join(rng.choice(vocab_pool, rng.integers(1, 9)))
        for _ in range(80)
    ] + ["", "  "]  # empty + whitespace-only docs
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64), pa.int64()),
            "text": pa.array(docs),
            "source": pa.array(["s"] * len(docs)),
        }
    )
    V = 6
    # brute: top-V by (df desc, term bytes), then doc-pair counting
    from collections import Counter

    df = Counter()
    doc_terms = []
    for d in docs:
        ts = set(d.lower().split())
        doc_terms.append(ts)
        df.update(ts)
    vocab = set(
        t for t, _ in sorted(df.items(), key=lambda p: (-p[1], p[0].encode()))[:V]
    )
    expect = Counter()
    for ts in doc_terms:
        for a, b in combinations(sorted(ts & vocab, key=str.encode), 2):
            expect[(a, b)] += 1

    outs = []
    for parts in (1, 7):
        out = term_cooccurrence(
            ray.data.from_arrow(tbl).repartition(parts), vocab_size=V
        ).to_pandas()
        got = {
            (r.t1, r.t2): int(r.cnt) for r in out.itertuples()
        }
        assert got == dict(expect), f"parts={parts}"
        outs.append(got)
    assert outs[0] == outs[1]


def test_zonemap_scan_prunes_and_matches_filter(ray_session, tmp_path):
    """Zone-map layout: range scan reads ONLY overlapping buckets (pruned
    count > 0), returns exactly the brute-filter row set; edge buckets
    honor the closed-interval overlap rule."""
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.zonemap import (
        build_zonemap_layout,
        pruned_paths,
        zonemap_range_scan,
    )

    rng = np.random.default_rng(77)
    n = 3000
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "value": pa.array(rng.uniform(0.0, 1000.0, n), pa.float64()),
        }
    )
    layout = str(tmp_path / "zm")
    build_zonemap_layout(
        ray.data.from_arrow(tbl).repartition(5), layout, value_col="value",
        num_buckets=10,
    )
    lo, hi = 230.0, 310.0
    files, n_pruned = pruned_paths(layout, lo, hi)
    assert n_pruned >= 7  # [230,310] overlaps at most 2-3 of 10 buckets
    ds, n_pruned2 = zonemap_range_scan(layout, lo, hi, columns=["event_id", "value"])
    assert n_pruned2 == n_pruned
    got = ds.to_pandas().sort_values("event_id", ignore_index=True)
    v = tbl["value"].to_numpy()
    expect_ids = tbl["event_id"].to_numpy()[(v >= lo) & (v <= hi)]
    assert got["event_id"].to_numpy().tolist() == sorted(expect_ids.tolist())
    # no-match range entirely outside the data prunes everything
    ds0, _ = zonemap_range_scan(layout, 5000.0, 6000.0)
    assert ds0 is None


def test_copurchase_pagerank_planted_graph(ray_session):
    """Integer PageRank: hand-built 4-node graph — two orders {1,2,3} and
    {2,3}, so 2,3 are hubs — checked against a serial integer reference
    and for block-layout invariance."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.graph import (
        copurchase_pagerank,
    )

    rows = [  # (orderkey, partkey)
        (10, 1), (10, 2), (10, 3),
        (11, 2), (11, 3),
        (12, 4),          # isolated node: keeps the base rank
        (13, 5), (13, 5)  # same part twice in one order: no self-edge
    ]
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )

    def serial(iters=2):
        import collections

        edges = collections.Counter()
        for okey in {r[0] for r in rows}:
            parts = [p for o, p in rows if o == okey]
            for i, u in enumerate(parts):
                for j, v in enumerate(parts):
                    if i != j and u != v:
                        edges[(u, v)] += 1
        strength = collections.Counter()
        for (u, v), w in edges.items():
            strength[u] += w
        nodes = sorted({r[1] for r in rows})
        r = {n: 1_000_000 for n in nodes}
        for _ in range(iters):
            acc = {n: 0 for n in nodes}
            for (u, v), w in edges.items():
                acc[v] += (r[u] * w) // strength[u]
            r = {n: 150_000 + (850_000 * acc[n]) // 1_000_000 for n in nodes}
        return r

    exp = serial()
    for parts in (1, 4):
        out = copurchase_pagerank(
            ray.data.from_arrow(tbl).repartition(parts), iterations=2
        ).to_pandas()
        got = {int(r.partkey): int(r.rank_q) for r in out.itertuples()}
        assert got == exp, f"parts={parts}"
    assert got[4] == 150_000  # isolated node: base rank, no contributions
    assert got[2] > got[1]  # hub outranks the single-order part


# -- duplicated character spans (Lee et al. remove step) ------------------


def _brute_spans(docs, L, min_docs=2):
    from collections import defaultdict

    where = defaultdict(set)
    for d, t in enumerate(docs):
        for p in range(len(t) - L + 1):
            where[t[p : p + L]].add(d)
    dup = {g for g, s in where.items() if len(s) >= min_docs}
    spans = []
    for d, t in enumerate(docs):
        marked = [p for p in range(len(t) - L + 1) if t[p : p + L] in dup]
        if not marked:
            continue
        start = prev = marked[0]
        for p in marked[1:]:
            if p - prev > L:
                spans.append((d, start, prev + L, prev + L - start))
                start = p
            prev = p
        spans.append((d, start, prev + L, prev + L - start))
    return sorted(spans)


def test_dup_spans_matches_brute(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dupspans import (
        duplicated_char_spans,
    )

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    shared = "the quick brown fox jumps over the lazy dog once more"
    docs = []
    for i in range(90):
        body = " ".join(rng.choice(words, 25))
        if i % 3 == 0:  # planted cross-doc duplicate at a random offset
            k = int(rng.integers(0, len(body) - 1))
            body = body[:k] + " " + shared + " " + body[k:]
        docs.append(body)
    docs.append("tiny")  # shorter than L: contributes no window
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )
    got = duplicated_char_spans(
        ray.data.from_arrow(tbl).repartition(5), L=24, num_parts=8
    ).to_pandas()
    got_t = sorted(
        (int(a), int(b), int(c), int(d))
        for a, b, c, d in zip(
            got.doc_id, got.span_start, got.span_end, got.span_len
        )
    )
    assert got_t == _brute_spans(docs, 24)
    # every planted doc carries at least one span covering the shared text
    planted = {d for d in range(90) if d % 3 == 0}
    assert planted <= set(got.doc_id)


def test_dup_spans_no_duplicates_empty(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dupspans import (
        duplicated_char_spans,
    )

    # truly window-distinct texts: independent random letter soup per doc
    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", np.uint8)
    docs = [
        bytes(alpha[rng.integers(0, 26, 60)]).decode() for _ in range(40)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(40), pa.int64()),
            "text": pa.array(docs),
        }
    )
    out = duplicated_char_spans(
        ray.data.from_arrow(tbl), L=24, num_parts=4
    ).to_pandas()
    assert len(out) == 0


def test_dup_spans_within_doc_repeat_not_marked(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dupspans import (
        duplicated_char_spans,
    )

    # the repeated block lives in ONE doc only -> min_docs=2 never fires
    block = "abcdefghijklmnopqrstuvwxyz012345"
    docs = ["PAD " + block + " MID " + block + " END", "totally different body here"]
    tbl = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array(docs)}
    )
    out = duplicated_char_spans(
        ray.data.from_arrow(tbl), L=24, num_parts=4
    ).to_pandas()
    assert len(out) == 0


def test_strip_dup_spans_matches_brute(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dupspans import (
        strip_duplicated_spans,
    )

    rng = np.random.default_rng(13)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    shared = "the quick brown fox jumps over the lazy dog one more time"
    docs = []
    for i in range(80):
        body = " ".join(rng.choice(words, 26))
        if i % 3 == 0:
            k = int(rng.integers(0, len(body) - 1))
            body = body[:k] + " " + shared + " " + body[k:]
        docs.append(body)
    docs.append("xy")  # shorter than L: passes through untouched
    L = 24
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
            "text": pa.array(docs),
        }
    )
    got = (
        strip_duplicated_spans(
            ray.data.from_arrow(tbl).repartition(4), L=L, num_parts=8
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    from collections import defaultdict

    where = defaultdict(set)
    for d, t in enumerate(docs):
        for p in range(len(t) - L + 1):
            where[t[p : p + L]].add(d)
    dup = {g for g, s in where.items() if len(s) >= 2}

    def clean(t):
        cov = np.zeros(len(t) + 1, np.int64)
        for p in range(max(len(t) - L + 1, 0)):
            if t[p : p + L] in dup:
                cov[p] += 1
                cov[p + L] -= 1
        keep = np.cumsum(cov[:-1]) == 0
        return "".join(c for c, k in zip(t, keep) if k)

    want = [clean(t) for t in docs]
    assert list(got.clean_text) == want
    assert list(got.n_removed) == [len(t) - len(w) for t, w in zip(docs, want)]
    assert got.n_removed.sum() > 0  # the cut actually removed content
    assert got.clean_text.iloc[-1] == "xy"


def test_bfs_hops_planted_path_and_components(ray_session):
    """Planted topology: a path from a seed (hops = position, cut off at
    max_depth), a cycle reached from both sides (min-hop wins), and a
    disconnected component with no seed (absent from output)."""
    import ray

    from pdf_watermark_removal_otsu_inpaint_ray.functions.graph import bfs_hops

    # seed node 0 (0 % 97 == 0); path 0-1-2-3-4-5-6, cycle 0-10-11-12-0,
    # island 20-21 (no seed, unreachable)
    E = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (0, 10), (10, 11), (11, 12), (0, 12), (20, 21)]
    tbl = pa.table(
        {
            "a": pa.array([min(a, b) for a, b in E], pa.int64()),
            "b": pa.array([max(a, b) for a, b in E], pa.int64()),
        }
    )
    for parts in (1, 3):
        out = bfs_hops(
            ray.data.from_arrow(tbl).repartition(parts),
            seed_mod=97, max_depth=4,
        ).to_pandas()
        got = dict(zip(out["partkey"], out["hops"]))
        assert got == {
            0: 0, 1: 1, 2: 2, 3: 3, 4: 4,   # path cut at depth 4 (5, 6 out)
            10: 1, 12: 1, 11: 2,              # cycle: min hops from both arms
        }


def test_kcore_planted_peel_and_weighted_edges(ray_session):
    """k_core peels a pendant chain hanging off a clique layer by layer
    (multi-round convergence) and keeps the clique; the weighted edge
    builder thresholds on DISTINCT orders (a part repeated inside one
    order contributes once)."""
    import ray

    from pdf_watermark_removal_otsu_inpaint_ray.functions.graph import (
        copurchase_edges_min_weight, k_core,
    )

    # K5 on nodes 0-4, chain 4-10-11-12 (chain peels at k=3, clique stays)
    E = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(4, 10), (10, 11), (11, 12)]
    )
    tbl = pa.table(
        {
            "a": pa.array([a for a, b in E], pa.int64()),
            "b": pa.array([b for a, b in E], pa.int64()),
        }
    )
    out = k_core(ray.data.from_arrow(tbl).repartition(3), k=3).to_pandas()
    got = dict(zip(out["partkey"], out["deg"]))
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    # empty core: k above the clique degree
    empty = k_core(ray.data.from_arrow(tbl), k=6).to_pandas()
    assert len(empty) == 0

    # weighted edges: order 1 holds parts (7,8,8) -> pair (7,8) once;
    # order 2 holds (7,8) -> second distinct order; order 3 holds (7,9)
    # twice within the SAME order -> still weight 1, pruned at >=2
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 3, 3, 3], pa.int64()),
            "l_partkey": pa.array([7, 8, 8, 7, 8, 7, 9, 7, 9], pa.int64()),
        }
    )
    for parts in (1, 3):
        e = (
            copurchase_edges_min_weight(
                ray.data.from_arrow(li).repartition(parts), min_weight=2
            )
            .to_pandas()
        )
        assert list(map(tuple, e.to_numpy())) == [(7, 8)], parts


def test_doc_novelty_matches_brute(ray_session):
    """Novelty vs a serial first-occurrence twin: later re-serve of old
    content scores 0; first doc scores all its distinct grams."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dupspans import (
        doc_novelty,
    )

    texts = [
        "a b c d e",        # doc 0: grams abc bcd cde — all novel
        "a b c x y z",      # doc 1: abc old; bcx cxy xyz novel
        "a b c d e",        # doc 2: exact re-serve — 0 novel
        "p q",              # doc 3: too short — no row
        "x y z p q r",      # doc 4: xyz old; yzp zpq pqr novel
    ]
    tbl = _docs(texts, [10, 11, 12, 13, 14])
    want = {10: (3, 3), 11: (4, 3), 12: (3, 0), 14: (4, 3)}
    for parts in (1, 4):
        out = (
            doc_novelty(ray.data.from_arrow(tbl).repartition(parts), n=3)
            .to_pandas()
        )
        got = {
            int(r["doc_id"]): (int(r["n_distinct_grams"]), int(r["n_novel"]))
            for _, r in out.iterrows()
        }
        assert got == want, parts


def test_bigram_logprob_matches_brute(ray_session):
    """Bigram scorer vs a serial dict twin (math.log quantization — any
    np.log/libm divergence at a quantization boundary fails here)."""
    import math
    from collections import Counter

    from pdf_watermark_removal_otsu_inpaint_ray.functions.lm import (
        bigram_logprob,
    )

    texts = ["a b a b c", "b c a", "a", "", "c c c a b"]
    tbl = _docs(texts, [0, 1, 2, 3, 4])
    words = [t.split() for t in texts]
    V = len({w for ws in words for w in ws})
    bc = Counter()
    for ws in words:
        bc.update(zip(ws, ws[1:]))
    n1 = Counter()
    for (w1, _), c in bc.items():
        n1[w1] += c
    q = {
        p: math.floor(math.log((c + 1) / float(n1[p[0]] + V)) * 1000 + 0.5)
        for p, c in bc.items()
    }
    want = {}
    for d, ws in enumerate(words):
        pairs = list(zip(ws, ws[1:]))
        want[d] = (len(pairs), sum(q[p] for p in pairs))
    for parts in (1, 3):
        out = (
            bigram_logprob(ray.data.from_arrow(tbl).repartition(parts))
            .to_pandas()
        )
        got = {
            int(r["doc_id"]): (int(r["n_bigrams"]), int(r["logp_milli"]))
            for _, r in out.iterrows()
        }
        assert got == want, parts


def test_basket_lift_planted_orders(ray_session):
    """Exact lift on a planted basket set: parts always bought together
    hit max lift; independent parts sit near 1e6; weight-1 pairs pruned."""
    import ray

    from pdf_watermark_removal_otsu_inpaint_ray.functions.graph import (
        basket_lift,
    )

    # 4 orders: (1,2) together twice -> w=2; part 3 in every order;
    # (1,3)/(2,3) pairs w=2; (4,5) once -> pruned at min_weight=2
    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2), (2, 3),
        (3, 3), (3, 4), (3, 5),
        (4, 3),
    ]
    li = pa.table(
        {
            "l_orderkey": pa.array([o for o, _ in rows], pa.int64()),
            "l_partkey": pa.array([p for _, p in rows], pa.int64()),
        }
    )
    N = 4
    c = {1: 2, 2: 2, 3: 4, 4: 1, 5: 1}
    want = {}
    for (a, b), w in {(1, 2): 2, (1, 3): 2, (2, 3): 2}.items():
        want[(a, b)] = (w, (1_000_000 * N * w) // (c[a] * c[b]))
    for parts in (1, 3):
        out = basket_lift(
            ray.data.from_arrow(li).repartition(parts), min_weight=2
        ).to_pandas()
        got = {
            (int(r["a"]), int(r["b"])): (int(r["w"]), int(r["lift_q"]))
            for _, r in out.iterrows()
        }
        assert got == want, parts
    # perfect-association pair (1,2): lift = N/(2*2) * ... = 2e6
    assert want[(1, 2)][1] == 2_000_000
