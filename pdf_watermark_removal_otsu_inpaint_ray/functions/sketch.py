"""HyperLogLog distinct-count sketch — the mergeable-aggregate primitive a
100-TB engine needs where exact COUNT(DISTINCT) would shuffle every key
(Flajolet et al. 2007, with the standard small-range linear-counting
correction from Heule et al. "HyperLogLog in Practice", 2013).

Everything is DETERMINISTIC: the word hash is the repo's 63→64-bit
polynomial kernel (``dedup._word_hashes_flat`` — property-tested against a
pure-Python spec mirror), the register math is integer, and the estimate
formula is fixed float64 arithmetic — so the distributed result is
bit-identical to the single-process golden twin for any batch layout, the
same contract as the MinHash/SimHash sketches.

Distribution shape: one streaming ``map_batches`` pass emits a fixed
``m = 2^p``-byte register blob per (source × batch) — corpus text never
moves; a ``groupby(source)`` merges blobs with elementwise max (registers
are a commutative monoid — the whole point of the sketch) and emits the
final estimate.  Group count is dimension-scale (domains), so the
per-group callback is bounded; at adversarial source cardinality the same
blobs tree-merge through any number of rounds unchanged.

Reference analog: the run-summary accumulator (A7, ``stats.py``)
generalized from exact small-domain counters to a sublinear sketch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 12  # 4096 registers, ~1.6% standard error
HLL_M = 1 << HLL_P


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized ``int.bit_length`` for uint64 — 6-step binary search in
    integer ops only (float log2 would be wrong near power-of-two
    boundaries).  The golden twin uses Python ``int.bit_length`` instead,
    cross-checking this bit-twiddling independently."""
    w = w.copy()
    bl = np.zeros(w.shape, np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = w >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        w[m] >>= np.uint64(shift)
    bl[w > 0] += 1
    return bl


def hll_registers(hashes: np.ndarray, group_codes: np.ndarray, n_groups: int) -> np.ndarray:
    """(n_groups, m) uint8 register matrix from uint64 hashes: bucket = top
    p bits, rho = leading-zeros(remaining 64-p bits) + 1.  One lexsort +
    ``maximum.reduceat`` — no per-item Python."""
    regs = np.zeros((n_groups, HLL_M), np.uint8)
    if hashes.size == 0:
        return regs
    h = hashes.astype(np.uint64)
    bucket = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    rho = (64 - HLL_P) - _bit_length_u64(w) + 1  # w == 0 -> 64-p+1
    key = group_codes * HLL_M + bucket
    order = np.argsort(key, kind="stable")
    k_s, r_s = key[order], rho[order]
    starts = np.nonzero(np.concatenate(([True], k_s[1:] != k_s[:-1])))[0]
    mx = np.maximum.reduceat(r_s, starts)
    regs.reshape(-1)[k_s[starts]] = mx.astype(np.uint8)
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimate with linear-counting small-range correction.
    Fixed float64 expression — deterministic, mirrored verbatim by the
    golden twin."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(2.0 ** (-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return int(np.floor(e + 0.5))


def approx_distinct_words(ds, *, group: str = "source"):
    """Approximate distinct-word count per group over a corpus Dataset.

    Returns ``(group, approx_distinct)`` — the HLL estimate of distinct
    lowercased ``\\S+`` words per group.  Word hashing is the dedup
    polynomial kernel; registers merge associatively through the groupby.
    """
    import pandas as pd

    from .dedup import _word_hashes_flat

    def partials(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        wh, doc_off = _word_hashes_flat(texts)
        rows = np.repeat(
            np.arange(len(texts), dtype=np.int64), np.diff(doc_off)
        )
        col = b[group].combine_chunks()
        import pyarrow.compute as pc

        uniq = pc.unique(col)
        codes_row = np.asarray(pc.index_in(col, value_set=uniq), np.int64)
        regs = hll_registers(wh, codes_row[rows], len(uniq))
        return pa.table(
            {
                group: uniq,
                "regs": pa.array([r.tobytes() for r in regs], pa.binary()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # rows per group = number of contributing blocks (bounded); groups
        # are dimension-scale domains, so a per-group callback is fine here
        acc = np.zeros(HLL_M, np.uint8)
        for blob in g["regs"]:
            np.maximum(acc, np.frombuffer(blob, np.uint8), out=acc)
        return pd.DataFrame(
            {group: [g[group].iloc[0]], "approx_distinct": [hll_estimate(acc)]}
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(group)
        .map_groups(merge, batch_format="pandas")
    )
