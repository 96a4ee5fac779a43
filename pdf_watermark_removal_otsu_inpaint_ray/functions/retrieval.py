"""BM25 top-k retrieval over the document corpus.

The quality-retrieval primitive of a training-data pipeline (query-doc
relevance for targeted sampling / decontamination triage).  Two streaming
passes, no corpus-scale shuffle:

1. **Corpus stats**: per-batch PARTIALS — df per query term (docs in the
   batch containing the term), batch doc count, batch token-length sum —
   one tiny int64 row per (batch, term), folded driver-side (the partial
   set is output-scale; a Dataset groupby would pay a full Aggregate
   round for a handful of keys).  No token ever leaves its batch (same
   combiner-before-shuffle shape as text.term_df_partials).
2. **Score scan**: idf per term is computed DRIVER-side with
   ``math.log`` (CPython calls libm ``log`` — bit-identical to DuckDB's
   ``ln``; ``np.log``'s SIMD path can differ in the last ulp) and
   broadcast with avgdl as plain closure scalars (O(len(terms)) bytes).
   Each batch resolves tf for the query terms with one dictionary-encode
   + ``bincount`` and scores rows vectorized; per-term contributions are
   quantized to 1e-4 BIGINTs BEFORE the row sum, so the total is an
   order-free integer and hash-matches the SQL twin exactly.  Per-batch
   top-k (full lexsort tie-break, argpartition would drop tied ids) +
   an output-scale driver merge of k rows per block.

Scoring is BM25+1 (always-positive idf): ``idf = ln((N - df + 0.5) /
(df + 0.5) + 1)``; ``contrib = idf * tf*(k1+1) / (tf + k1*(1 - b +
b*dl/avgdl))``.  Reference analog: the dominant-color argsort ranking
(`watermark_detector.py:168-189`) is the same score-and-take-top-k shape
over a corpus statistic.
"""

from __future__ import annotations

from ..config import scaled_parts

import math

import numpy as np
import pyarrow as pa

from .text import _words_with_rows

K1 = 1.2
B = 0.75
_Q = 10000.0  # contribution quantization (1e-4)


def _stats_partials(terms: tuple[str, ...]):
    def partials(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        rows, codes, vocab = _words_with_rows(batch["text"])
        out_t = [""]
        out_df = [0]
        out_dl = [int(rows.size)]
        out_nd = [int(n_rows)]
        if rows.size:
            import pyarrow.compute as pc

            qidx = pc.index_in(pa.array(list(terms)), value_set=vocab)
            for t, c in zip(terms, qidx.to_pylist()):
                df = (
                    int(np.unique(rows[codes == c]).size)
                    if c is not None
                    else 0
                )
                out_t.append(t)
                out_df.append(df)
                out_dl.append(0)
                out_nd.append(0)
        else:
            for t in terms:
                out_t.append(t)
                out_df.append(0)
                out_dl.append(0)
                out_nd.append(0)
        return pa.table(
            {
                "term": pa.array(out_t, pa.string()),
                "df": pa.array(out_df, pa.int64()),
                "dl_sum": pa.array(out_dl, pa.int64()),
                "n_docs": pa.array(out_nd, pa.int64()),
            }
        )

    return partials


def bm25_topk(
    docs_ds,
    terms: tuple[str, ...],
    *,
    k: int = 20,
    id_col: str = "doc_id",
) -> pa.Table:
    """BM25 top-k over ``docs_ds`` (columns ``id_col``, ``text``) for the
    query ``terms``.  Returns (doc_id, score_q, rank) ordered by
    (score_q DESC, doc_id ASC) — score_q is the 1e-4-quantized integer
    score, rank 1-based.  Ray must already be initialised."""
    # partials are (len(terms)+1) rows per BATCH — output-scale, so the
    # final sum is a driver fold (a Dataset.groupby would pay a full
    # sort-based Aggregate round ~1 s for a handful of keys)
    stats = docs_ds.map_batches(
        _stats_partials(terms), batch_format="pyarrow"
    ).take_all()
    n_docs = 0
    dl_sum = 0
    df_by_term: dict[str, int] = {t: 0 for t in terms}
    for r in stats:
        if r["term"] == "":
            n_docs += int(r["n_docs"])
            dl_sum += int(r["dl_sum"])
        else:
            df_by_term[r["term"]] += int(r["df"])
    if n_docs == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "score_q": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    avgdl = float(dl_sum) / n_docs
    # math.log == libm log == DuckDB ln (np.log's SIMD path may differ)
    idf = {
        t: math.log((n_docs - df_by_term.get(t, 0) + 0.5) / (df_by_term.get(t, 0) + 0.5) + 1.0)
        for t in terms
    }
    k1p1 = K1 + 1.0

    def score_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rows, codes, vocab = _words_with_rows(batch["text"])
        ids = np.asarray(batch[id_col], np.int64)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "score_q": pa.array([], pa.int64()),
            }
        )
        if rows.size == 0:
            return empty
        import pyarrow.compute as pc

        dl = np.bincount(rows, minlength=n).astype(np.float64)
        qidx = pc.index_in(pa.array(list(terms)), value_set=vocab)
        score_q = np.zeros(n, np.int64)
        hit = np.zeros(n, bool)
        for t, c in zip(terms, qidx.to_pylist()):
            if c is None:
                continue
            tf = np.bincount(rows[codes == c], minlength=n).astype(np.float64)
            m = tf > 0
            if not m.any():
                continue
            # EXACT op order of the SQL twin: idf * (tf * (k1+1)) /
            # (tf + k1 * (1 - b + b * dl / avgdl)), quantized per term
            contrib = idf[t] * (tf[m] * k1p1) / (
                tf[m] + K1 * (1.0 - B + B * dl[m] / avgdl)
            )
            score_q[m] += np.floor(contrib * _Q + 0.5).astype(np.int64)
            hit |= m
        if not hit.any():
            return empty
        ids_h, sc_h = ids[hit], score_q[hit]
        take = min(k, sc_h.size)
        part = np.lexsort((ids_h, -sc_h))[:take]
        return pa.table(
            {
                "doc_id": pa.array(ids_h[part], pa.int64()),
                "score_q": pa.array(sc_h[part], pa.int64()),
            }
        )

    cands = (
        docs_ds.select_columns([id_col, "text"])
        .map_batches(score_batch, batch_format="pyarrow")
        .take_all()
    )
    ids = np.array([r["doc_id"] for r in cands], np.int64)
    sc = np.array([r["score_q"] for r in cands], np.int64)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "score_q": pa.array(sc[order], pa.int64()),
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
        }
    )


def sparse_pair_cosine(ds, *, vocab_size: int = 24, min_cos_pct: int = 60):
    """Sparse all-pairs cosine similarity over head-vocabulary tf vectors —
    the inverted-index APSS / DIMSUM shape (document-similarity candidate
    generation without embeddings): docs are tf vectors over the top-V df
    terms; emit pairs with cosine >= ``min_cos_pct``/100.

    Distribution shape (NO high-cardinality Dataset Aggregate anywhere —
    a ``groupby(pair).sum()`` at candidate-pair cardinality runs ~30k
    groups/s in Ray's sort-based Aggregate, measured; every combine below
    is a coarse fixed-partition groupby + ONE vectorized pandas pass):

    1. vocabulary pass: ``text.term_df_partials`` -> vocab-safe keyed
       fold with per-partition top-V trim (functions/vocabfold.py); the
       driver merges <= V x parts rows ranked by (df DESC, utf-8 byte
       order — DuckDB's binary collation).
    2. norms pass: per-doc squared norm over vocab terms is ROW-LOCAL
       (docs are row-atomic), so one stateless map_batches emits exactly
       one (doc, n2) row per doc — zero shuffle; the doc-scale table is
       ``ray.put`` once (past ~10^9 docs it joins by pair key instead).
    3. posting-list pass: batches emit (doc, vidx, tf) triples for vocab
       terms, coarse-partitioned BY TERM; each partition outer-multiplies
       its terms' posting lists into pair dot PARTIALS, pre-combined
       vectorized, re-keyed by hash(a,b).
    4. pair-finalize pass: one coarse pair-key partition sums each pair's
       partials (lexsort + reduceat, no per-pair callback), applies the
       INTEGER cross-multiplied threshold (100^2*dot^2 >= pct^2*na2*nb2,
       dot>0 — no float in the filter) and assembles the reported cosine
       as ``dot / (sqrt(na2)*sqrt(nb2))`` — IEEE sqrt is correctly
       rounded, so the float64 matches the SQL twin bitwise.  Only
       SURVIVORS reach the driver.

    Skew note: a term in f docs yields f(f-1)/2 partials — the head-vocab
    df cap IS the bound; prefix filtering is the next step at web scale.
    Returns (a, b, dot, cos) with a < b.
    """
    import pandas as pd

    import ray

    from .text import _words_with_rows, term_df_partials
    from .vocabfold import keyed_fold_topv

    # vocab pass: per-partition fold + trim — the driver sees at most
    # v x num_parts rows regardless of vocabulary cardinality, and the
    # Aggregate is bounded to the coarse partition count
    ranked = keyed_fold_topv(
        ds.map_batches(term_df_partials, batch_format="pyarrow"),
        key="term",
        sum_col="df",
        v=vocab_size,
    )
    vocab = [t for t, _ in ranked]
    v_index = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)
    num_parts = scaled_parts(16)
    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def _vocab_hits(b: pa.Table):
        """(rows, gidx) of the batch's vocab-term token positions."""
        rows, codes, bvocab = _words_with_rows(b["text"])
        lookup = np.array([v_index.get(t, -1) for t in bvocab.to_pylist()], np.int64)
        gidx = lookup[codes]
        keep = gidx >= 0
        return rows[keep], gidx[keep]

    def doc_norms(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc": pa.array([], pa.int64()), "n2": pa.array([], pa.int64())}
        )
        if V == 0 or len(b) == 0:
            return empty
        rows, gidx = _vocab_hits(b)
        if rows.size == 0:
            return empty
        ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
        up, tf = np.unique(rows * V + gidx, return_counts=True)
        n2 = np.bincount(up // V, weights=tf * tf, minlength=len(b)).astype(np.int64)
        nz = np.nonzero(n2)[0]
        return pa.table(
            {
                "doc": pa.array(ids[nz], pa.int64()),
                "n2": pa.array(n2[nz], pa.int64()),
            }
        )

    norms = ds.map_batches(doc_norms, batch_format="pyarrow").to_pandas()
    nk = norms["doc"].to_numpy().astype(np.int64)
    order = np.argsort(nk)
    norms_ref = ray.put((nk[order], norms["n2"].to_numpy().astype(np.int64)[order]))

    def tf_triples(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc": pa.array([], pa.int64()),
                "vidx": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "pk": pa.array([], pa.int64()),
            }
        )
        if V == 0 or len(b) == 0:
            return empty
        rows, gidx = _vocab_hits(b)
        if rows.size == 0:
            return empty
        ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
        up, tf = np.unique(rows * V + gidx, return_counts=True)
        vidx = (up % V).astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(ids[up // V], pa.int64()),
                "vidx": pa.array(vidx, pa.int64()),
                "tf": pa.array(tf.astype(np.int64), pa.int64()),
                "pk": pa.array(vidx % num_parts, pa.int64()),
            }
        )

    _PAIR_EMPTY = {
        "a": pd.Series(dtype=np.int64),
        "b": pd.Series(dtype=np.int64),
        "dot": pd.Series(dtype=np.int64),
        "pk2": pd.Series(dtype=np.int64),
    }

    def dot_partials(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(_PAIR_EMPTY)
        v = g["vidx"].to_numpy()
        d = g["doc"].to_numpy().astype(np.int64)
        tf = g["tf"].to_numpy().astype(np.int64)
        order = np.lexsort((d, v))
        v, d, tf = v[order], d[order], tf[order]
        starts = np.nonzero(np.concatenate(([True], v[1:] != v[:-1])))[0]
        bounds = np.append(starts, v.size)
        out_a, out_b, out_d = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            dd, tt = d[s:e], tf[s:e]
            if dd.size < 2:
                continue
            ii, jj = np.triu_indices(dd.size, k=1)
            out_a.append(dd[ii])
            out_b.append(dd[jj])
            out_d.append(tt[ii] * tt[jj])
        if not out_a:
            return pd.DataFrame(_PAIR_EMPTY)
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        dot = np.concatenate(out_d)
        # pre-combine within the partition (pairs repeat across its terms):
        # lexsort + reduceat, never a per-pair callback
        o2 = np.lexsort((b, a))
        a, b, dot = a[o2], b[o2], dot[o2]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        st = np.nonzero(new)[0]
        a, b = a[st], b[st]
        dot = np.add.reduceat(dot, st)
        pk2 = (
            ((a.astype(np.uint64) * _MIX + b.astype(np.uint64)) * _MIX)
            >> np.uint64(33)
        ) % np.uint64(num_parts)
        return pd.DataFrame(
            {"a": a, "b": b, "dot": dot, "pk2": pk2.astype(np.int64)}
        )

    thr2 = min_cos_pct * min_cos_pct

    def pair_finalize(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "dot": pd.Series(dtype=np.int64),
                "cos": pd.Series(dtype=np.float64),
            }
        )
        if len(g) == 0:
            return empty
        a = g["a"].to_numpy().astype(np.int64)
        b = g["b"].to_numpy().astype(np.int64)
        dot = g["dot"].to_numpy().astype(np.int64)
        o = np.lexsort((b, a))
        a, b, dot = a[o], b[o], dot[o]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        st = np.nonzero(new)[0]
        a, b = a[st], b[st]
        dot = np.add.reduceat(dot, st)
        nk_s, n2_s = ray.get(norms_ref)  # plasma read, cached per worker
        na2 = n2_s[np.searchsorted(nk_s, a)]
        nb2 = n2_s[np.searchsorted(nk_s, b)]
        keep = (dot > 0) & (10_000 * dot * dot >= thr2 * na2 * nb2)
        if not keep.any():
            return empty
        a, b, dot, na2, nb2 = a[keep], b[keep], dot[keep], na2[keep], nb2[keep]
        cos = dot.astype(np.float64) / (
            np.sqrt(na2.astype(np.float64)) * np.sqrt(nb2.astype(np.float64))
        )
        return pd.DataFrame({"a": a, "b": b, "dot": dot, "cos": cos})

    out = (
        ds.map_batches(tf_triples, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(dot_partials, batch_format="pandas")
        .groupby("pk2")
        .map_groups(pair_finalize, batch_format="pandas")
        .to_pandas()  # survivors only — output scale
    )
    order = np.lexsort((out["b"].to_numpy(), out["a"].to_numpy()))
    return pa.table(
        {
            "a": pa.array(out["a"].to_numpy().astype(np.int64)[order], pa.int64()),
            "b": pa.array(out["b"].to_numpy().astype(np.int64)[order], pa.int64()),
            "dot": pa.array(out["dot"].to_numpy().astype(np.int64)[order], pa.int64()),
            "cos": pa.array(out["cos"].to_numpy()[order], pa.float64()),
        }
    )
