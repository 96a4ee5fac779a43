"""Global-order statistics over giant groups — percent_rank and per-group
exact quantiles — WITHOUT co-locating a group.

The ``functions.packing`` window family (lag/ntile/rolling) hash-partitions
on the group key, which is right when groups are user-sized but wrong when
the partition key is a low-cardinality column (``event_type``: 6 groups of
10^11 rows each at north-star scale — one group cannot land on one worker).
These two operators instead decompose the ORDER axis:

* a **monotone bucket** of the float64 value (the IEEE-754 bit pattern,
  sign-folded so integer order == float order, truncated to the top
  ``bucket_bits``) gives a fixed ≤ 2^bits × |groups| key space;
* pass 1 streams per-batch ``(group, bucket, cnt)`` partials through one
  small ``groupby().sum()`` — the driver sees bucket COUNTS, never rows —
  and prefix-sums them into per-bucket rank bases;
* pass 2 co-locates only ``(group, bucket)`` cells (≈ n/2^bits rows each,
  balanced even when one group is the whole table) via a coarse hash
  partition, and resolves within-bucket order with one vectorized lexsort.

Skew note: a single hyper-duplicated VALUE puts its ties in one cell; ties
need no intra-cell ordering (rank of a tie = count of strictly smaller),
so the cell kernel stays O(n log n) vectorized — only worker heap bounds
the tie count, same caveat as every hash-partitioned operator here.

No NaN support: IEEE NaN has no total-order slot (SQL puts NULLs/NaNs
last); filter them upstream.

Reference analog: the Otsu threshold scan (`watermark_detector.py` gray
histogram argmax) is the same decomposition — order statistics from a
bucketed histogram, never a sort of the pixels.
"""

from __future__ import annotations

from ..config import scaled_parts

import math

import numpy as np
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _monotone_u64(v: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 encoding of float64 (sign-fold trick):
    enc(a) < enc(b)  ⇔  a < b for all finite doubles.  -0.0 is folded to
    +0.0 first (``+ 0.0``): the two compare EQUAL as doubles, so they must
    share a bucket or the bucket-base rank would count one as smaller."""
    bits = (np.ascontiguousarray(v, np.float64) + 0.0).view(np.uint64)
    neg = (bits >> np.uint64(63)).astype(bool)
    return np.where(neg, ~bits, bits | np.uint64(1) << np.uint64(63))


def _bucket_of(v: np.ndarray, bucket_bits: int) -> np.ndarray:
    return (_monotone_u64(v) >> np.uint64(64 - bucket_bits)).astype(np.int64)


def _cell_pk(group_arr, buckets: np.ndarray, num_parts: int) -> np.ndarray:
    """Coarse partition id of a (group, bucket) cell: string groups hash via
    the sink's polynomial hash, int groups via splitmix — mixed with the
    bucket so one group's cells spread across all partitions."""
    from ..sinks.exactly_once import hash_partition_ids

    if pa.types.is_integer(group_arr.type):
        g = np.asarray(group_arr, np.int64).astype(np.uint64)
        gh = (g * _MIX) >> np.uint64(29)
    else:
        gh = hash_partition_ids(group_arr, 1 << 31).astype(np.uint64)
    h = (gh + buckets.astype(np.uint64)) * _MIX
    return ((h >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int64)


def _bucket_histogram(ds, *, group: str, value: str, bucket_bits: int):
    """Pass 1: exact (group, bucket, cnt) histogram as a Dataset → pandas
    (driver traffic ≤ |groups| × 2^bucket_bits rows, data-independent)."""

    def partials(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value].combine_chunks(), np.float64)
        bk = _bucket_of(v, bucket_bits)
        import pandas as pd

        df = pd.DataFrame({group: np.asarray(b[group].combine_chunks()), "bucket": bk})
        gb = df.groupby([group, "bucket"], sort=False, as_index=False).size()
        return pa.table(
            {
                group: pa.array(gb[group]),
                "bucket": pa.array(gb["bucket"].to_numpy(), pa.int64()),
                "cnt": pa.array(gb["size"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([group, "bucket"])
        .sum("cnt")
        .to_pandas()
    )


def grouped_percent_rank(
    ds,
    *,
    group: str,
    value: str,
    id_col: str,
    out: str = "pr",
    bucket_bits: int = 16,
    num_parts: int | None = None,
):
    """``percent_rank() OVER (PARTITION BY group ORDER BY value)`` —
    (rank−1)/(n−1) with rank = 1 + count of strictly-smaller values in the
    group (ties share the min rank), 0.0 for single-row groups, bit-equal
    to the SQL twin (int64 → float64 division on both sides).

    Returns ``(id_col, group, value, out)``.  Two passes over the value
    column; the only shuffles are the fixed-key-space histogram groupby and
    ONE coarse ``num_parts`` cell partition — no group is ever co-located.
    """
    num_parts = scaled_parts(64, num_parts)
    import ray

    hist = _bucket_histogram(ds, group=group, value=value, bucket_bits=bucket_bits)
    hist = hist.sort_values([group, "bucket"], kind="stable")
    cnts = hist["sum(cnt)"].to_numpy().astype(np.int64)
    gvals = hist[group].to_numpy()
    new_g = np.empty(len(hist), bool)
    if len(hist):
        new_g[0] = True
        new_g[1:] = gvals[1:] != gvals[:-1]
    csum = np.cumsum(cnts)
    gstart_csum = np.where(new_g, np.concatenate(([0], csum[:-1])), 0)
    # base[i] = values before this bucket within its group
    base = np.concatenate(([0], csum[:-1])) - np.maximum.accumulate(gstart_csum)
    totals = {}
    for g in np.unique(gvals):
        totals[g] = int(cnts[gvals == g].sum())
    base_map = {
        (g, int(bk)): int(bs)
        for g, bk, bs in zip(gvals, hist["bucket"].to_numpy(), base)
    }
    maps_ref = ray.put((base_map, totals))

    def add_pk(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value].combine_chunks(), np.float64)
        bk = _bucket_of(v, bucket_bits)
        return pa.table(
            {
                "pk": pa.array(_cell_pk(b[group].combine_chunks(), bk, num_parts)),
                "bucket": pa.array(bk, pa.int64()),
                id_col: b[id_col],
                group: b[group],
                value: pa.array(v, pa.float64()),
            }
        )

    def rank_cells(g) -> "object":
        import pandas as pd

        base_map_l, totals_l = ray.get(maps_ref)
        if len(g) == 0:
            return pd.DataFrame({id_col: [], group: [], value: [], out: []})
        gc, guniq = pd.factorize(g[group], sort=False)
        bk = g["bucket"].to_numpy()
        v = g[value].to_numpy().astype(np.float64)
        order = np.lexsort((v, bk, gc))
        gc_s, bk_s, v_s = gc[order], bk[order], v[order]
        # run starts of (group, bucket, value) ties and of (group, bucket)
        new_cell = np.empty(len(g), bool)
        new_cell[0] = True
        new_cell[1:] = (gc_s[1:] != gc_s[:-1]) | (bk_s[1:] != bk_s[:-1])
        new_val = new_cell.copy()
        new_val[1:] |= v_s[1:] != v_s[:-1]
        idx = np.arange(len(g), dtype=np.int64)
        cell_start = np.maximum.accumulate(np.where(new_cell, idx, 0))
        val_start = np.maximum.accumulate(np.where(new_val, idx, 0))
        within = val_start - cell_start  # strictly-smaller count in cell
        bases = np.array(
            [base_map_l[(guniq[c], int(b))] for c, b in zip(gc_s, bk_s)],
            np.int64,
        )
        ns = np.array([totals_l[guniq[c]] for c in gc_s], np.int64)
        pr = np.where(ns > 1, (bases + within) / np.maximum(ns - 1, 1), 0.0)
        res = pd.DataFrame(
            {
                id_col: g[id_col].to_numpy()[order],
                group: np.asarray(guniq)[gc_s],
                value: v_s,
                out: pr,
            }
        )
        return res

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(rank_cells, batch_format="pandas")
    )


def grouped_quantiles(
    ds,
    *,
    group: str,
    value: str,
    qs: tuple = (0.25, 0.5, 0.75),
    bucket_bits: int = 16,
):
    """Per-group exact quantiles (DuckDB ``quantile_disc`` semantics:
    ``sorted[max(0, ceil(q·n) − 1)]``) in exactly TWO passes, any group
    size: pass-1 bucket histogram locates each (group, q) target bucket;
    pass-2 gathers DISTINCT-value partial counts from only those buckets
    (≈ n/2^bucket_bits rows each before the distinct collapse) and the
    driver resolves the rank statistic.  Returns ``(group, q, value)``.

    Contrast with ``queries.q_price_quantiles``: that bisection recurses to
    any depth with a uniform-width binning (robust to adversarial value
    ranges); this one exploits the monotone-bit bucketing to always finish
    in two passes — the histogram is equi-width in CODE space, so a bucket
    holds ≤ n/2^bits rows unless values are duplicated, in which case the
    gather volume is DISTINCT values (small by definition).
    """
    import pandas as pd

    hist = _bucket_histogram(ds, group=group, value=value, bucket_bits=bucket_bits)
    hist = hist.sort_values([group, "bucket"], kind="stable")
    targets = {}  # (group, bucket) -> list of (q, rank_within_bucket 0-based)
    for g, sub in hist.groupby(group, sort=False):
        cnts = sub["sum(cnt)"].to_numpy().astype(np.int64)
        bks = sub["bucket"].to_numpy()
        csum = np.cumsum(cnts)
        n = int(csum[-1])
        for q in qs:
            k = max(1, math.ceil(q * n))  # 1-based global rank
            j = int(np.searchsorted(csum, k))
            below = int(csum[j - 1]) if j > 0 else 0
            targets.setdefault((g, int(bks[j])), []).append((q, k - below - 1))
    want: dict = {}  # group -> sorted np.array of its target buckets
    for g, bk in targets:
        want.setdefault(g, []).append(bk)
    want = {g: np.unique(np.asarray(v, np.int64)) for g, v in want.items()}

    def gather(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value].combine_chunks(), np.float64)
        bk = _bucket_of(v, bucket_bits)
        garr = np.asarray(b[group].combine_chunks())
        # vectorized per DISTINCT group in the batch (groups are few by
        # definition of this operator), never per row
        mask = np.zeros(v.size, bool)
        for g, bks in want.items():
            mask |= (garr == g) & np.isin(bk, bks)
        df = pd.DataFrame({group: garr[mask], "bucket": bk[mask], value: v[mask]})
        gb = df.groupby([group, "bucket", value], sort=False, as_index=False).size()
        return pa.table(
            {
                group: pa.array(gb[group]),
                "bucket": pa.array(gb["bucket"].to_numpy(), pa.int64()),
                value: pa.array(gb[value].to_numpy(), pa.float64()),
                "cnt": pa.array(gb["size"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ds.map_batches(gather, batch_format="pyarrow")
        .groupby([group, "bucket", value])
        .sum("cnt")
        .to_pandas()
    )
    out_g, out_q, out_v = [], [], []
    for (g, bk), pairs in targets.items():
        sub = parts[(parts[group] == g) & (parts["bucket"] == bk)].sort_values(value)
        vals = sub[value].to_numpy()
        csum = np.cumsum(sub["sum(cnt)"].to_numpy().astype(np.int64))
        for q, r in pairs:
            j = int(np.searchsorted(csum, r + 1))
            out_g.append(g)
            out_q.append(q)
            out_v.append(float(vals[j]))
    return pa.table(
        {
            group: pa.array(out_g),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )


def grouped_mad(ds, *, group: str, value: str, bucket_bits: int = 16) -> pa.Table:
    """Per-group median absolute deviation — TWO dependent order-statistic
    passes (the robust-dispersion stat of outlier-tolerant quality gates):

    1. per-group median via :func:`grouped_quantiles` (``quantile_disc``
       semantics, two streaming passes, no group co-location);
    2. the medians (|groups| rows) broadcast into a stateless deviation map
       ``dev = |value - med(group)|``, then a second
       :func:`grouped_quantiles` over ``dev``.

    Returns ``(group, med, mad)`` float64 — both are actual data(-derived)
    values, exact (int-valued inputs stay integral through the float64
    abs-difference).  Four passes over the value column total; every
    shuffle carries fixed-key-space count rows, never input rows.  SQL twin:
    ``quantile_disc(abs(x - m), 0.5)`` joined against the per-group
    ``quantile_disc(x, 0.5)`` CTE.
    """
    med_tbl = grouped_quantiles(
        ds, group=group, value=value, qs=(0.5,), bucket_bits=bucket_bits
    )
    med_map = dict(
        zip(med_tbl[group].to_pylist(), med_tbl["value"].to_pylist())
    )

    def deviation(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value].combine_chunks(), np.float64)
        garr = np.asarray(b[group].combine_chunks())
        g_u, g_inv = np.unique(garr, return_inverse=True)
        meds = np.array([med_map[g] for g in g_u], np.float64)
        return pa.table(
            {
                group: b[group],
                "dev": pa.array(np.abs(v - meds[g_inv]), pa.float64()),
            }
        )

    mad_tbl = grouped_quantiles(
        ds.map_batches(deviation, batch_format="pyarrow"),
        group=group,
        value="dev",
        qs=(0.5,),
        bucket_bits=bucket_bits,
    )
    mad_map = dict(zip(mad_tbl[group].to_pylist(), mad_tbl["value"].to_pylist()))
    groups = sorted(med_map)
    return pa.table(
        {
            group: pa.array(groups),
            "med": pa.array([med_map[g] for g in groups], pa.float64()),
            "mad": pa.array([mad_map[g] for g in groups], pa.float64()),
        }
    )
