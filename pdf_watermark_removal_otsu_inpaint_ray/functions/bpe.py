"""Distributed BPE subword tokenizer: train + corpus encode.

BPE training (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") needs only the corpus WORD-FREQUENCY table —
vocabulary-scale, not corpus-scale — so the distributed part of training
is ONE combiner-first word-count pass (per-batch ``np.unique`` partials,
the shuffle carries (term, tf) int64-count rows, never token streams);
the merge loop itself is inherently sequential (merge k+1 depends on the
vocab state after merge k) and runs driver-side over the collected vocab
table, exactly where a production tokenizer trainer runs it.  At 100 TB
the vocab collect is bounded by ``min_count`` (rare-word mass never
reaches the driver).

Encoding is fully distributed: the merge ranks broadcast once via
``ray.put``; an actor-pool stage applies them per DISTINCT word per batch
(one ``dictionary_encode`` per batch) with a cross-batch memo dict — an
actor encodes any given word at most once for its whole lifetime (the
canonical stateful-stage shape, reference analog: the YOLO weights held
per actor, `yolo_detector.py:57-146`).

Determinism contract (the independent golden twin in oracle_data.py must
reproduce it from this docstring alone):

* a word is a ``\\S+`` token of ``lower(text)``; its symbol sequence is
  its unicode codepoints (no end-of-word marker);
* each training round merges the pair with the HIGHEST total frequency
  (summed word-frequency over non-overlapping left-to-right occurrences),
  ties broken by the lexicographically SMALLEST (a, b) pair;
* occurrences merge greedily left-to-right (``aaa`` + merge (a,a) →
  ``(aa, a)``);
* encoding applies, repeatedly, the applicable merge with the LOWEST
  rank until none applies.
"""

from __future__ import annotations

from ..config import scaled_pool

import numpy as np
import pyarrow as pa

import ray

from .text import _words_with_rows


def word_freq(docs_ds, *, min_count: int = 1) -> list[tuple[str, int]]:
    """Corpus word-frequency table, (term, tf) sorted by term.  One
    streaming pass; the driver receives vocabulary-scale rows only."""

    def partials(batch: pa.Table) -> pa.Table:
        rows, codes, vocab = _words_with_rows(batch["text"])
        if rows.size == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "tf": pa.array([], pa.int64())}
            )
        tf = np.bincount(codes, minlength=len(vocab))
        present = np.nonzero(tf)[0]
        return pa.table(
            {
                "term": vocab.take(pa.array(present, pa.int64())).cast(pa.string()),
                "tf": pa.array(tf[present], pa.int64()),
            }
        )

    from .dedup import _collect_arrow
    from .vocabfold import keyed_fold

    # Arrow-batch collection, not take_all: the vocab table is
    # 10^5-10^6 rows before min_count pruning, and per-row python-dict
    # materialization is the documented ~100x-slower path (dedup.py
    # _collect_arrow note).  keyed_fold bounds the Aggregate to the coarse
    # partition count AND applies min_count inside the fold, so rare-word
    # mass is pruned before it ever leaves a partition.
    tbl = _collect_arrow(
        keyed_fold(
            docs_ds.map_batches(partials, batch_format="pyarrow"),
            key="term",
            sums=("tf",),
            min_total=min_count,
        ),
        pa.schema([("term", pa.string()), ("tf", pa.int64())]),
    )
    terms = tbl["term"].to_pylist()
    tf = np.asarray(tbl["tf"], np.int64)
    out = [(t, int(c)) for t, c in zip(terms, tf)]
    out.sort()
    return out


def _merge_word(sym: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """Greedy left-to-right merge of every (a, b) occurrence."""
    out = []
    i = 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def bpe_train(
    vocab: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Driver-side merge loop over the (vocabulary-scale) word-frequency
    table.  Returns the ordered merge list (rank = position)."""
    words = [(tuple(w), f) for w, f in vocab]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in words:
            i = 0
            while i + 1 < len(sym):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
                # same-symbol runs: only every OTHER adjacent (x, x) is a
                # greedy-mergeable occurrence (`aaa` merges (a,a) once),
                # so step past both symbols when the run continues
                if sym[i] == sym[i + 1] and i + 2 < len(sym) and sym[i + 2] == sym[i]:
                    i += 2
                else:
                    i += 1
        if not counts:
            break
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        words = [(_merge_word(sym, a, b), f) for sym, f in words]
    return merges


def encode_len(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for ``word``: repeatedly apply the
    lowest-rank applicable merge (greedy left-to-right)."""
    sym = tuple(word)
    while len(sym) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        sym = _merge_word(sym, *best_pair)
    return len(sym)


class BpeEncodeStage:
    """Actor-pool encode stage: merge ranks fetched once per actor
    (zero-copy ``ray.get``), per-batch distinct words resolved through a
    cross-batch memo — each actor encodes a given word at most once,
    ever.  Emits (doc_id, n_words, n_bpe)."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref)
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.asarray(batch["doc_id"], np.int64)
        rows, codes, vocab = _words_with_rows(batch["text"])
        if rows.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_words": pa.array(np.zeros(n, np.int64), pa.int64()),
                    "n_bpe": pa.array(np.zeros(n, np.int64), pa.int64()),
                }
            )
        lens = np.empty(len(vocab), np.int64)
        for ci, w in enumerate(vocab.to_pylist()):
            v = self.memo.get(w)
            if v is None:
                v = encode_len(w, self.ranks)
                self.memo[w] = v
            lens[ci] = v
        n_words = np.bincount(rows, minlength=n)
        n_bpe = np.bincount(rows, weights=lens[codes], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words.astype(np.int64), pa.int64()),
                "n_bpe": pa.array(n_bpe, pa.int64()),
            }
        )


def bpe_token_counts(docs_ds, encode_ds, *, n_merges: int = 60, min_count: int = 1):
    """Train on ``docs_ds``, encode ``encode_ds``: (doc_id, n_words,
    n_bpe) per document.  Ray must already be initialised."""
    merges = bpe_train(word_freq(docs_ds, min_count=min_count), n_merges)
    ref = ray.put(merges)
    return encode_ds.map_batches(
        BpeEncodeStage,
        batch_format="pyarrow",
        concurrency=scaled_pool(1, 4),
        fn_constructor_args=(ref,),
    )
