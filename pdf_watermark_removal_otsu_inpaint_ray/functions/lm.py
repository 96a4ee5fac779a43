"""Unigram language-model quality scoring — the CCNet/Wikipedia-LM filter
shape (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data", LREC 2020): train a simple LM on the corpus, score
every document by its mean token log-probability, and filter/bucket on the
score.  Here the LM is the corpus' own unigram distribution (the standard
first-stage proxy for a perplexity filter).

Two streaming passes, both 100-TB shaped:

1. **Train** — per-batch token-count partials (one ``np.unique`` over the
   batch's word hashes) → one coarse ``groupby(hash % parts)`` →
   per-partition vectorized sum → the driver folds VOCABULARY-scale
   (hash, count) rows.  At web scale, cap the broadcast table at top-V by
   count and route the tail to an OOV floor probability — the head
   distribution decides the score for almost every token (same cap note
   as DocTopTerm).
2. **Score** — the quantized log-prob table broadcasts once via
   ``ray.put`` (sorted hash array + int64 milli-log-probs); each batch
   scores all its tokens with one ``searchsorted`` gather + one
   ``bincount`` row reduction.

Determinism contract: probabilities quantize to int64 milli-nats with
``floor(ln(cnt/total)*1000 + 0.5)`` BEFORE the per-doc sum, so the
distributed result is bit-identical to the single-process golden twin for
any batch layout (the learned-detector trick).  Token identity is the
63-bit word hash (collision odds negligible; same caveat as exact_dedup).

Reference analog: the auto-threshold classifier (A5/A6,
``functions/classifier.py``) — score-then-gate, with the scoring table
learned from the data itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LOGP_SCALE = 1000  # milli-nats


def _count_partials(b: pa.Table) -> pa.Table:
    from .dedup import _word_hashes_flat

    wh, _ = _word_hashes_flat(b["text"].to_pylist())
    u, c = np.unique((wh >> np.uint64(1)).astype(np.int64), return_counts=True)
    return pa.table(
        {
            "wh": pa.array(u, pa.int64()),
            "cnt": pa.array(c.astype(np.int64), pa.int64()),
            "pk": pa.array(u % 64, pa.int64()),
        }
    )


def _sum_partition(g):
    import pandas as pd

    wh = g["wh"].to_numpy()
    cnt = g["cnt"].to_numpy()
    order = np.argsort(wh, kind="stable")
    wh_s, cnt_s = wh[order], cnt[order]
    starts = np.nonzero(np.concatenate(([True], wh_s[1:] != wh_s[:-1])))[0]
    return pd.DataFrame(
        {
            "wh": wh_s[starts],
            "cnt": np.add.reduceat(cnt_s, starts).astype(np.int64),
        }
    )


def train_unigram(ds) -> tuple[np.ndarray, np.ndarray, int]:
    """Distributed unigram counts → (sorted token hashes, quantized
    milli-nat log-probs, total occurrences).  Driver traffic is
    vocabulary-scale (already combined per partition)."""
    parts = (
        ds.map_batches(_count_partials, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_sum_partition, batch_format="pandas")
        .to_pandas()
    )
    if "wh" not in parts.columns:
        # all-empty corpus: every partial block was 0-row, so to_pandas
        # yields a columnless frame — an empty LM table, not an error
        # (same degenerate case as text.eval_gram_array)
        return np.zeros(0, np.int64), np.zeros(0, np.int64), 0
    wh = parts["wh"].to_numpy().astype(np.int64)
    cnt = parts["cnt"].to_numpy().astype(np.int64)
    order = np.argsort(wh, kind="stable")
    wh, cnt = wh[order], cnt[order]
    total = int(cnt.sum())
    logp = np.floor(
        np.log(cnt.astype(np.float64) / total) * LOGP_SCALE + 0.5
    ).astype(np.int64)
    return wh, logp, total


def score_docs(ds, vocab_ref):
    """Per-doc unigram log-prob sum: one searchsorted gather + one bincount
    per batch against the broadcast (hashes, logp) table.  Returns
    ``(doc_id, n_tok, logp_milli)`` — mean log-prob is
    ``logp_milli / (1000 * n_tok)``, left integer so the SQL-side compare
    is exact.  Docs with zero tokens emit logp_milli = 0."""
    import ray

    def score(b: pa.Table) -> pa.Table:
        from .dedup import _word_hashes_flat

        wh_tbl, logp = ray.get(vocab_ref)
        texts = b["text"].to_pylist()
        wh, doc_off = _word_hashes_flat(texts)
        h = (wh >> np.uint64(1)).astype(np.int64)
        n = len(texts)
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(doc_off))
        pos = np.searchsorted(wh_tbl, h)
        ok = (pos < wh_tbl.size) & (
            wh_tbl[np.minimum(pos, max(wh_tbl.size - 1, 0))] == h
        )
        if not ok.all():
            # the table was trained on this corpus, so every token must
            # resolve; a miss means the train/score passes disagree
            raise ValueError("token hash missing from unigram table")
        lp = logp[pos]
        sums = np.bincount(rows, weights=lp, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n_tok": pa.array(
                    np.bincount(rows, minlength=n).astype(np.int64), pa.int64()
                ),
                "logp_milli": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def unigram_logprob(ds):
    """Train-then-score composition over one corpus Dataset (two streaming
    passes; the LM table broadcasts once)."""
    import ray

    wh, logp, _ = train_unigram(ds)
    ref = ray.put((wh, logp))
    return score_docs(ds, ref)


def _pair_partials(b: pa.Table) -> pa.Table:
    """Per-batch distinct (h1, h2) bigram counts — consecutive word-hash
    pairs within each doc, one lexsort + boundary sweep (the combiner:
    token pairs never leave their batch)."""
    from .dedup import _word_hashes_flat

    wh, doc_off = _word_hashes_flat(b["text"].to_pylist())
    h = (wh >> np.uint64(1)).astype(np.int64)
    rows = np.repeat(
        np.arange(doc_off.size - 1, dtype=np.int64), np.diff(doc_off)
    )
    if h.size < 2:
        z = np.zeros(0, np.int64)
        return pa.table(
            {"h1": pa.array(z), "h2": pa.array(z), "cnt": pa.array(z),
             "pk": pa.array(z)}
        )
    m = rows[1:] == rows[:-1]
    h1, h2 = h[:-1][m], h[1:][m]
    o = np.lexsort((h2, h1))
    h1, h2 = h1[o], h2[o]
    new = np.concatenate(([True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])))
    st = np.nonzero(new)[0]
    cnt = np.diff(np.append(st, h1.size)).astype(np.int64)
    h1, h2 = h1[st], h2[st]
    return pa.table(
        {
            "h1": pa.array(h1, pa.int64()),
            "h2": pa.array(h2, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "pk": pa.array(h1 % 64, pa.int64()),
        }
    )


def _pair_sum_partition(g):
    import pandas as pd

    h1 = g["h1"].to_numpy()
    h2 = g["h2"].to_numpy()
    cnt = g["cnt"].to_numpy()
    o = np.lexsort((h2, h1))
    h1, h2, cnt = h1[o], h2[o], cnt[o]
    new = np.concatenate(([True], (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])))
    st = np.nonzero(new)[0]
    return pd.DataFrame(
        {
            "h1": h1[st],
            "h2": h2[st],
            "cnt": np.add.reduceat(cnt, st).astype(np.int64),
        }
    )


def bigram_logprob(ds):
    """Per-doc add-one-smoothed BIGRAM log-probability — the second-order
    CCNet-style perplexity proxy: ``logp(d) = Σ ln((c(w1,w2)+1) /
    (n(w1)+V))`` over the doc's consecutive word pairs, quantized to
    milli-nats per PAIR before the sum (order-free exact, the unigram
    contract).  ``n(w1)`` is the conditional normalizer (bigram counts
    summed per head word) and ``V`` the corpus distinct-word count.

    Three streaming passes, all combiner-first: unigram vocab fold (the
    train_unigram partials — vocab-scale driver table), bigram-count fold
    (distinct-pair partials through a coarse h1-hash groupby —
    bigram-vocab-scale), then a scoring scan.  Pair identity avoids any
    extra collision beyond the 63-bit word hash: heads/tails map through
    the SORTED unigram table to DENSE indices and the pair key is
    ``i1 * V + i2`` (< 2^62 for V < 2^31).  At web scale, cap both
    tables at top-V with an OOV floor — the unigram cap note applies
    squared."""
    import ray

    # pass 1: unigram vocab (dense ids + V); counts unused beyond order
    wh_tbl, _logp, _tot = train_unigram(ds)
    V = int(wh_tbl.size)

    # pass 2: bigram counts
    parts = (
        ds.map_batches(_pair_partials, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(_pair_sum_partition, batch_format="pandas")
        .to_pandas()
    )
    if "h1" not in parts.columns or len(parts) == 0:
        empty = np.zeros(0, np.int64)
        key_tbl, q_tbl = empty, empty
    else:
        h1 = parts["h1"].to_numpy().astype(np.int64)
        h2 = parts["h2"].to_numpy().astype(np.int64)
        cnt = parts["cnt"].to_numpy().astype(np.int64)
        i1 = np.searchsorted(wh_tbl, h1)
        i2 = np.searchsorted(wh_tbl, h2)
        key = i1 * V + i2
        o = np.argsort(key, kind="stable")
        key, cnt, i1 = key[o], cnt[o], i1[o]
        # conditional normalizer: bigram counts summed per head word
        n1 = np.zeros(V, np.int64)
        np.add.at(n1, i1, cnt)
        q = np.floor(
            np.log((cnt + 1).astype(np.float64) / (n1[i1] + V)) * LOGP_SCALE
            + 0.5
        ).astype(np.int64)
        key_tbl, q_tbl = key, q

    ref = ray.put((wh_tbl, key_tbl, q_tbl))

    def score(b: pa.Table) -> pa.Table:
        from .dedup import _word_hashes_flat

        wh_t, keys, qs = ray.get(ref)
        Vl = wh_t.size
        wh, doc_off = _word_hashes_flat(b["text"].to_pylist())
        h = (wh >> np.uint64(1)).astype(np.int64)
        n = doc_off.size - 1
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(doc_off))
        sums = np.zeros(n, np.int64)
        npair = np.zeros(n, np.int64)
        if h.size >= 2:
            m = rows[1:] == rows[:-1]
            if m.any():
                prow = rows[:-1][m]
                i1 = np.searchsorted(wh_t, h[:-1][m])
                i2 = np.searchsorted(wh_t, h[1:][m])
                key = i1 * Vl + i2
                pos = np.searchsorted(keys, key)
                ok = (pos < keys.size) & (
                    keys[np.minimum(pos, max(keys.size - 1, 0))] == key
                )
                if not ok.all():
                    raise ValueError(
                        "bigram missing from table trained on this corpus"
                    )
                lp = qs[pos]
                sums = np.bincount(prow, weights=lp, minlength=n).astype(np.int64)
                npair = np.bincount(prow, minlength=n).astype(np.int64)
        ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
        # every doc emits a row (zeros for < 2-word docs) — the unigram
        # scorer's LEFT-JOIN contract, so both LMs share one output shape
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(npair, pa.int64()),
                "logp_milli": pa.array(sums, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
