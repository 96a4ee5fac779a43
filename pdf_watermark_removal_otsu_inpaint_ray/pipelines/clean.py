"""C4-style corpus cleaning: quality gate → language gate → exact dedup.

The composed training-data preparation pass (reference analog: the
detect-then-act page gating of cli.py:660-725, applied corpus-wide): one
vectorized counter+filter stage with NO shuffle, then a keep-first dedup
whose single shuffle carries 64-bit hashes plus the four surviving scalar
columns — never the text.  Everything streams; nothing is materialized.
"""

from __future__ import annotations

from ..config import scaled_parts

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.dedup import content_hash_batch
from ..functions.text import STOPWORDS_EN, _words_with_rows


def quality_gate_batch(
    batch: pa.Table, *, min_words: int = 5, min_chars: int = 20
) -> pa.Table:
    """Vectorized per-doc gate: ``n_words >= min_words AND n_chars >=
    min_chars AND (has an EN stopword)`` — the word/stopword definitions
    shared with TextStats/LangId (``\\S+`` runs over lowered text), so the
    DuckDB twin is exact.  One tokenize pass serves both counters: word
    counts and stopword hits are two ``np.bincount`` calls over the same
    (row, code) arrays."""
    rows, codes, vocab = _words_with_rows(batch["text"])
    n = batch.num_rows
    n_words = np.bincount(rows, minlength=n).astype(np.int64)
    if rows.size:
        stop = np.asarray(pc.is_in(vocab, value_set=pa.array(STOPWORDS_EN)))
        en_hits = np.bincount(rows[stop[codes]], minlength=n).astype(np.int64)
    else:
        en_hits = np.zeros(n, np.int64)
    n_chars = np.asarray(pc.utf8_length(batch["text"]), np.int64)
    keep = (n_words >= min_words) & (n_chars >= min_chars) & (en_hits > 0)
    idx = pa.array(np.nonzero(keep)[0], pa.int64())
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()).take(idx),
            "source": batch["source"].take(idx),
            "text": batch["text"].take(idx),
            "n_words": pa.array(n_words[keep], pa.int64()),
            "n_chars": pa.array(n_chars[keep], pa.int64()),
        }
    )


def clean_corpus(
    ds,
    *,
    min_words: int = 5,
    min_chars: int = 20,
    num_parts: int | None = None,
):
    """Gate → hash → keep-lowest-doc_id per identical text.

    Returns the SURVIVING documents as (doc_id, source, n_words, n_chars).
    Dedup is the exact_dedup shape: coarse ``num_parts`` hash partitions
    (a key's rows land in exactly one partition), each collapsed with one
    C-speed pandas ``transform("min")`` — no per-key callback.  The text
    column is dropped BEFORE the shuffle; only int64 hash + scalars move.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    gated = ds.map_batches(
        partial(quality_gate_batch, min_words=min_words, min_chars=min_chars),
        batch_format="pyarrow",
    ).map_batches(content_hash_batch, batch_format="pyarrow")

    def add_pk(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["content_hash"], np.int64) % num_parts
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "n_words": b["n_words"],
                "n_chars": b["n_chars"],
                "content_hash": b["content_hash"],
                "pk": pa.array(pk, pa.int64()),
            }
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("content_hash", sort=False)["doc_id"].transform("min")
        k = g[g["doc_id"] == first]
        return k[["doc_id", "source", "n_words", "n_chars"]]

    return (
        gated.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(keep_first, batch_format="pandas")
    )
