"""Vocab-safe keyed fold (functions/vocabfold.py): exactness vs a serial
Counter twin, min_total pruning inside the fold, top-v merge across
key-disjoint partitions, and the DSIR hashed-bucket bound's
collision-free bit-equality."""

import collections

import numpy as np
import pyarrow as pa
import ray


def _word_table(n_docs=300, seed=9):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(140)]
    rows = []
    for d in range(n_docs):
        k = rng.integers(1, 12)
        rows.append(" ".join(rng.choice(vocab, k)))
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(rows, pa.string()),
            "source": pa.array(
                ["web" if d % 3 else "books" for d in range(n_docs)],
                pa.string(),
            ),
        }
    )


def _df_counter(tbl):
    c = collections.Counter()
    for t in tbl["text"].to_pylist():
        c.update(set(w for w in t.split() if w))
    return c


def test_keyed_fold_matches_counter(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        term_df_partials,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.functions.vocabfold import (
        keyed_fold,
    )

    tbl = _word_table()
    want = _df_counter(tbl)
    for parts, np_ in ((2, 8), (5, 3)):
        out = keyed_fold(
            ray.data.from_arrow(tbl)
            .repartition(parts)
            .map_batches(term_df_partials, batch_format="pyarrow"),
            key="term",
            sums=("df",),
            num_parts=np_,
        ).to_pandas()
        got = dict(zip(out["term"], out["df"].astype(int)))
        assert got == dict(want), (parts, np_)


def test_keyed_fold_min_total_prunes_in_fold(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        term_df_partials,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.functions.vocabfold import (
        keyed_fold,
    )

    tbl = _word_table(seed=13)
    want = {t: c for t, c in _df_counter(tbl).items() if c >= 5}
    out = keyed_fold(
        ray.data.from_arrow(tbl)
        .repartition(4)
        .map_batches(term_df_partials, batch_format="pyarrow"),
        key="term",
        sums=("df",),
        min_total=5,
    ).to_pandas()
    got = dict(zip(out["term"], out["df"].astype(int)))
    assert got == want


def test_keyed_fold_topv_matches_global_ranking(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        term_df_partials,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.functions.vocabfold import (
        keyed_fold_topv,
    )

    tbl = _word_table(seed=21)
    cnt = _df_counter(tbl)
    want = sorted(cnt.items(), key=lambda p: (-p[1], p[0].encode()))[:25]
    got = keyed_fold_topv(
        ray.data.from_arrow(tbl)
        .repartition(3)
        .map_batches(term_df_partials, batch_format="pyarrow"),
        key="term",
        sum_col="df",
        v=25,
        num_parts=7,
    )
    assert [(t, int(c)) for t, c in got] == [(t, int(c)) for t, c in want]


def test_dsir_hash_buckets_collision_free_bit_identical(ray_session):
    """The fixed-size bucket space is the 100-TB vocab bound; on a corpus
    whose words land in distinct buckets the weights must be EXACTLY the
    unbucketed weights (V, n, and every per-word count coincide)."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.selection import (
        dsir_weights,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        hash_partition_ids,
    )

    tbl = _word_table(seed=33)
    vocab = sorted(_df_counter(tbl))
    buckets = hash_partition_ids(pa.array(vocab, pa.string()), 1 << 20)
    assert len(set(buckets.tolist())) == len(vocab), "regen seed: collision"
    ds = ray.data.from_arrow(tbl)
    a = (
        dsir_weights(ds, target_sources=("books",))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    b = (
        dsir_weights(ds, target_sources=("books",), hash_buckets=1 << 20)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert a.equals(b)


def test_doc_top_terms_capped_equals_uncapped(ray_session):
    """The capped-broadcast + residue-join plan must emit EXACTLY the
    full-broadcast ranking — including docs whose max-tf tie set touches
    sub-cap (rare) terms, ties broken by (df ASC, term ASC), and the
    all-local / all-residue extremes (min_df=1 and huge min_df)."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        DocTopTerm,
        doc_top_terms_capped,
    )

    rng = np.random.default_rng(55)
    common = [f"c{i}" for i in range(12)]
    rare = [f"r{i:03d}" for i in range(80)]
    texts = []
    for d in range(150):
        ws = list(rng.choice(common, rng.integers(2, 8)))
        if d % 3 == 0:  # rare term tying the max tf -> residue doc
            w = str(rng.choice(rare))
            ws += [w] * int(np.bincount(
                [common.index(x) for x in ws if x in common]
            ).max())
        rng.shuffle(ws)
        texts.append(" ".join(ws))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(150), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )

    # uncapped twin via the full-broadcast actor stage
    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
        term_df_partials,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.functions.vocabfold import (
        keyed_fold,
    )

    dft = keyed_fold(
        ray.data.from_arrow(tbl).map_batches(
            term_df_partials, batch_format="pyarrow"
        ),
        key="term",
        sums=("df",),
    ).to_pandas()
    terms = dft["term"].to_numpy(dtype=object)
    order = np.argsort(terms)
    ref = ray.put(
        {"terms": terms[order],
         "df": dft["df"].to_numpy().astype(np.int64)[order]}
    )
    want = (
        ray.data.from_arrow(tbl)
        .map_batches(DocTopTerm, fn_constructor_args=(ref,),
                     batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    for min_df, parts in ((1, 3), (3, 5), (10_000, 2)):
        got = (
            doc_top_terms_capped(
                ray.data.from_arrow(tbl).repartition(parts), min_df=min_df
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert got.equals(want), (min_df, parts)
