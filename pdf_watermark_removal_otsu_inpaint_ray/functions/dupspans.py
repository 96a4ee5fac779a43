"""Cross-document duplicated n-gram statistics — the exact-substring-dedup
signal of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL 2022), expressed corpus-scale.

For every document, count how many of its word n-gram OCCURRENCES also
appear elsewhere in the corpus (total corpus occurrences of that gram > 1,
including repeats inside the same document).  The per-doc dup fraction
``n_dup / n_grams`` is the standard "how much of this doc is boilerplate"
curation feature.

Distribution shape (the 100-TB path — nothing corpus-scale touches the
driver):

1. per-batch combiner (``map_batches``): tokenize + gram-hash the batch in
   one vectorized pass (the dedup word→gram polynomial chain, 63-bit), then
   collapse to distinct ``(gram, doc)`` rows with occurrence counts — one
   lexsort + boundary sweep, no per-row Python;
2. coarse ``groupby(gram % num_parts)``: every occurrence of a gram lands
   in exactly one partition, so the per-partition total IS the corpus
   total; rows of grams with total > 1 contribute their count to the doc's
   dup tally (vectorized argsort + ``reduceat``);
3. coarse ``groupby(doc % num_parts)``: per-doc partials from different
   gram partitions sum to the final ``(doc_id, n_grams, n_dup)`` row (one
   C-speed pandas groupby-sum per partition).

Both shuffles carry only int64 triples — never text, never gram strings.

Gram identity is the 63-bit hash of the word-hash tuple (``dedup.
_gram_hashes_flat``, property-tested against a pure-Python spec mirror);
the SQL twin joins on the gram STRING.  A hash collision would merge two
distinct grams — at 63 bits the odds are ~1e-9 even for 10^5 distinct
grams per partition, the standard trade for hash-keyed dedup (same caveat
as ``dedup.exact_dedup``).

Reference analog: the repeated-motif accumulation of the watermark
detector (cross-page persistence, ``watermark_remover.py``), generalized
from "token repeated across pages" to "n-gram repeated across documents".
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _gram_doc_counts(b: pa.Table, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch-local distinct ``(gram_hash, doc_id) -> count`` triple arrays.

    Only FULL n-grams count (a doc with fewer than n words yields none) —
    the exact semantics of the SQL twin's position join, so the short-doc
    single-gram fallback of ``_gram_hashes_flat`` is masked out here.
    """
    from .dedup import _gram_hashes_flat, _word_hashes_flat

    texts = b["text"].to_pylist()
    wh, doc_off = _word_hashes_flat(texts)
    grams, goff = _gram_hashes_flat(wh, doc_off, n)
    counts = np.diff(doc_off)
    rows = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(goff))
    keep = (counts >= n)[rows]
    grams, rows = grams[keep], rows[keep]
    if grams.size == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))[rows]
    order = np.lexsort((ids, grams))
    g_s, d_s = grams[order], ids[order]
    new = np.concatenate(([True], (g_s[1:] != g_s[:-1]) | (d_s[1:] != d_s[:-1])))
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.append(starts, g_s.size)).astype(np.int64)
    return g_s[starts], d_s[starts], cnt


def cross_doc_dup_stats(ds, *, n: int = 3, num_parts: int = 64):
    """Per-document duplicated-n-gram statistics over a corpus Dataset.

    Returns a Dataset of ``(doc_id, n_grams, n_dup)`` int64 rows — total
    n-gram occurrences and how many of them belong to grams occurring more
    than once corpus-wide.  Documents with fewer than ``n`` words emit no
    row (they have no full gram — same as the SQL twin's GROUP BY).
    """
    import pandas as pd

    def partials(b: pa.Table) -> pa.Table:
        gh, doc, cnt = _gram_doc_counts(b, n)
        return pa.table(
            {
                "gh": pa.array(gh, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "pk": pa.array(gh % num_parts, pa.int64()),
            }
        )

    def per_gram_partition(g: pd.DataFrame) -> pd.DataFrame:
        gh = g["gh"].to_numpy()
        doc = g["doc_id"].to_numpy()
        cnt = g["cnt"].to_numpy()
        order = np.argsort(gh, kind="stable")
        gh_s, doc_s, cnt_s = gh[order], doc[order], cnt[order]
        starts = np.concatenate(([True], gh_s[1:] != gh_s[:-1]))
        run_start = np.nonzero(starts)[0]
        tot = np.add.reduceat(cnt_s, run_start)  # corpus total per gram
        tot_row = np.repeat(tot, np.diff(np.append(run_start, gh_s.size)))
        dup = np.where(tot_row > 1, cnt_s, 0)
        # per-doc partial within this gram partition (C-speed groupby-sum)
        out = (
            pd.DataFrame({"doc_id": doc_s, "n_grams": cnt_s, "n_dup": dup})
            .groupby("doc_id", sort=False)
            .sum()
            .reset_index()
        )
        out["pk2"] = out["doc_id"].to_numpy() % num_parts
        return out

    def per_doc_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g[["doc_id", "n_grams", "n_dup"]]
            .groupby("doc_id", sort=False)
            .sum()
            .reset_index()
        )
        return out.astype({"doc_id": np.int64, "n_grams": np.int64, "n_dup": np.int64})

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(per_gram_partition, batch_format="pandas")
        .groupby("pk2")
        .map_groups(per_doc_partition, batch_format="pandas")
    )
