"""Corpus term statistics (functions/text.py::term_df_partials /
DocTopTerm) vs per-row Python — pins ASCII-space tokenization, lowercase
folding, df partial additivity across batch splits, and the integer-exact
(tf DESC, df ASC, term ASC) top-term ranking."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
    DocTopTerm,
    term_df_partials,
)

TEXTS = [
    "the cat sat on the mat",
    "  The CAT\t ran\n",  # case folding + leading/mixed whitespace
    "",  # no tokens → no output row
    "zebra zebra zebra cat",
    "mat mat the the",  # tf tie between 'mat' and 'the' → rarer df wins
    "unique singleton",
]


def _words(t):
    import re

    return re.findall(r"[^\t\n\f\r ]+", t.lower())


def _brute_df(texts):
    df = {}
    for t in texts:
        for w in set(_words(t)):
            df[w] = df.get(w, 0) + 1
    return df


def _brute_top(texts, df):
    out = {}
    for i, t in enumerate(texts):
        ws = _words(t)
        if not ws:
            continue
        tf = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        best = min(tf, key=lambda w: (-tf[w], df[w], w))
        out[i] = (best, tf[best], df[best])
    return out


def _batch(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def test_df_partials_sum_to_corpus_df_across_splits():
    whole = term_df_partials(_batch(TEXTS))
    split = [
        term_df_partials(_batch(TEXTS[:3])),
        term_df_partials(_batch(TEXTS[3:], ids=[3, 4, 5])),
    ]
    merged = {}
    for tbl in split:
        for t, d in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
            merged[t] = merged.get(t, 0) + d
    got = dict(zip(whole["term"].to_pylist(), whole["df"].to_pylist()))
    assert got == merged == _brute_df(TEXTS)


def test_doc_top_term_matches_brute_ranking(ray_session):
    df = _brute_df(TEXTS)
    terms = np.array(sorted(df), dtype=object)
    ref = ray.put(
        {"terms": terms, "df": np.array([df[t] for t in terms], np.int64)}
    )
    stage = DocTopTerm(ref)
    got = stage(_batch(TEXTS))
    expect = _brute_top(TEXTS, df)
    assert got.num_rows == len(expect)
    for i, term, tf, d in zip(
        got["doc_id"].to_pylist(),
        got["term"].to_pylist(),
        got["tf"].to_pylist(),
        got["df"].to_pylist(),
    ):
        assert (term, tf, d) == expect[i], i
    # the tf-tie row must have picked the RARER term
    row4 = expect[4]
    assert row4[0] == "mat" and df["mat"] < df["the"]


def test_vocab_growth_matches_brute(ray_session):
    from collections import defaultdict

    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import vocab_growth

    rng = np.random.default_rng(8)
    words = [f"tok{i}" for i in range(120)]
    n, B = 300, 10
    srcs = [f"s{i % 3}" for i in range(n)]
    texts = [" ".join(rng.choice(words, 12)) for _ in range(n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(srcs),
        }
    )
    got = vocab_growth(
        ray.data.from_arrow(tbl).repartition(5), bucket_docs=B, num_parts=8
    ).to_pandas()
    first = {}
    for d, (s, t) in enumerate(zip(srcs, texts)):
        for w in t.lower().split():
            k = (s, w)
            if k not in first:
                first[k] = d
    want = defaultdict(int)
    for (s, _w), d in first.items():
        want[(s, d // B)] += 1
    got_d = {
        (r.source, int(r.bucket)): int(r.vocab_new) for _, r in got.iterrows()
    }
    assert got_d == dict(want)
    # cumulative is the per-source running sum, ordered by bucket
    for s in set(srcs):
        sub = got[got.source == s].sort_values("bucket")
        assert (sub.vocab_new.cumsum() == sub.vocab_cum).all()
