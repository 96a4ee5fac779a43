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
