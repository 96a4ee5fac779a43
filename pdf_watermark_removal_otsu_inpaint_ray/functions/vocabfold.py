"""Vocabulary-safe keyed aggregation: coarse fixed-fanout key-hash
partition + per-partition C-speed fold.

``Dataset.groupby(key).sum(...)`` runs Ray Data's sort-based Aggregate
whose cost scales with DISTINCT KEYS (~30k groups/s measured, the
anti-pattern documented in sparse_pair_cosine) — fine for 20 window ids,
wrong for a web-crawl vocabulary of 10^7-10^8 garbage-heavy terms.  The
house idiom (cross_doc_dup_stats, functions/dupspans.py) bounds the
Aggregate instead: hash the key into a FIXED number of coarse partitions
(the only shuffle, fanout independent of vocabulary), then fold each
partition's rows with ONE vectorized pandas groupby — partitions hold
complete key groups, so the fold is exact and the native Aggregate never
sees more than ``num_parts`` groups.

Shared by the term-df table (queries.py), BPE word-frequency training
(functions/bpe.py), the APSS / co-occurrence vocabulary passes
(functions/retrieval.py, functions/text.py) and DSIR unigram counts
(functions/selection.py).  Reference analog: the dominant-color
histogram fold of watermark_detector.py:168-189 — a bounded-key
statistic computed without ever sorting the full pixel stream.
"""

from __future__ import annotations

from ..config import scaled_parts

import numpy as np
import pyarrow as pa


def _add_key_pk(b: pa.Table, key: str, num_parts: int) -> pa.Table:
    from ..sinks.exactly_once import hash_partition_ids

    pk = hash_partition_ids(b[key].combine_chunks(), num_parts)
    return b.append_column("pk", pa.array(pk, pa.int64()))


def keyed_fold(
    ds,
    *,
    key: str = "term",
    sums: tuple[str, ...] = ("df",),
    num_parts: int | None = None,
    min_total: int | None = None,
    min_total_col: str | None = None,
    agg: str = "sum",
):
    """Exact ``SELECT key, sum(c1), ... GROUP BY key`` over combiner-first
    partials, with the Aggregate bounded to ``num_parts`` groups.
    ``agg`` may be ``"sum"`` (default), ``"max"`` or ``"min"`` — any
    per-key fold whose partials pre-combine per batch.

    ``min_total`` (over ``min_total_col``, default the first sum column)
    prunes INSIDE the fold — each partition holds every row of its keys,
    so the filter is exact and rare-key mass never leaves the partition
    (the BPE ``min_count`` hatch: at 100 TB the driver collect is bounded
    by it).  Output column names are unchanged (no ``sum(...)`` rename
    needed downstream).
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    sums = tuple(sums)
    chk = min_total_col or sums[0]

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_key_pk(b, key, num_parts)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            # Key dtype must match non-empty blocks (int64 for custkey-style
            # folds) or Arrow schema-unifies object→string/null and concat
            # breaks downstream.
            out = {key: pd.Series(dtype=g[key].dtype if key in g else object)}
            out.update({c: pd.Series(dtype=np.int64) for c in sums})
            return pd.DataFrame(out)
        out = (
            g.groupby(key, sort=False)[list(sums)]
            .agg(agg)
            .reset_index()
        )
        if min_total is not None:
            out = out[out[chk].to_numpy() >= min_total]
        return out.astype({c: np.int64 for c in sums})

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(fold, batch_format="pandas")
    )


def keyed_fold_topv(
    ds,
    *,
    key: str = "term",
    sum_col: str = "df",
    v: int,
    num_parts: int | None = None,
) -> list[tuple[str, int]]:
    """Driver-side top-``v`` keys by ``(total DESC, key ASC in UTF-8 byte
    order — DuckDB's binary collation)``.  Partitions are key-disjoint, so
    the global top-v is the merge of per-partition top-v's: the fold trims
    to ``v`` rows per partition BEFORE anything reaches the driver —
    driver traffic is ``v x num_parts`` rows, independent of vocabulary
    size (the hashed-bucket vocab bound of selection.py::dsir_weights
    applied to the collect itself)."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_key_pk(b, key, num_parts)

    def fold_trim(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {key: pd.Series(dtype=g[key].dtype if key in g else object),
                 sum_col: pd.Series(dtype=np.int64)}
            )
        out = g.groupby(key, sort=False)[[sum_col]].sum().reset_index()
        ranked = sorted(
            zip(out[key].to_numpy(), out[sum_col].to_numpy()),
            key=lambda p: (-int(p[1]), str(p[0]).encode()),
        )[:v]
        return pd.DataFrame(
            {key: [t for t, _ in ranked],
             sum_col: np.array([c for _, c in ranked], np.int64)}
        )

    parts = (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(fold_trim, batch_format="pandas")
        .take_all()
    )
    ranked = sorted(
        ((r[key], int(r[sum_col])) for r in parts),
        key=lambda p: (-p[1], str(p[0]).encode()),
    )
    return ranked[:v]
