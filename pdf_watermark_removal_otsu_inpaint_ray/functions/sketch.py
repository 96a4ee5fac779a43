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
    The harmonic sum uses ``math.fsum`` (exactly-rounded, order-
    independent), so the INDEPENDENT golden twin reproduces it bit-for-bit
    without sharing this function — a plain np.sum/py-sum pair could
    disagree in the last ulp and flip the final floor at a boundary."""
    import math

    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / math.fsum(2.0 ** (-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    return math.floor(e + 0.5)


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


# ---------------------------------------------------------------------------
# Bloom-filter semi-join
# ---------------------------------------------------------------------------

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix/Knuth constant
_BLOOM_MIX2 = np.uint64(0xBF58476D1CE4E5B9)


def _bloom_hashes(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit mixes per key for double hashing (Kirsch–
    Mitzenmacher: idx_i = h1 + i*h2 gives k index functions from two)."""
    k = keys.astype(np.uint64)
    h1 = k * _BLOOM_MIX
    h1 ^= h1 >> np.uint64(31)
    h2 = (k ^ (k >> np.uint64(17))) * _BLOOM_MIX2
    h2 |= np.uint64(1)  # odd stride — full cycle over a power-of-2 table
    return h1, h2


class BloomFilter:
    """Fixed-size Bloom filter over int64 keys — an OR-monoid: per-batch
    partial filters merge with bitwise OR in any order/grouping, the same
    mergeability contract as the HLL registers.  ``log2_m`` bits, ``k``
    probes via double hashing; all operations vectorized."""

    def __init__(self, log2_m: int = 20, k: int = 7, bits: np.ndarray | None = None):
        self.log2_m, self.k = log2_m, k
        self.mask = np.uint64((1 << log2_m) - 1)
        self.bits = (
            bits if bits is not None else np.zeros(1 << (log2_m - 3), np.uint8)
        )

    def add(self, keys: np.ndarray) -> "BloomFilter":
        if keys.size == 0:
            return self
        h1, h2 = _bloom_hashes(keys)
        # all k x n bit positions at once, then ONE sort + bitwise_or.reduceat
        # per byte (the hll_registers shape) — ufunc.at would scatter
        # element-by-element, ~100x slower at build-side batch sizes
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        idx = ((h1[None, :] + i * h2[None, :]) & self.mask).reshape(-1)
        byte_idx = (idx >> np.uint64(3)).astype(np.int64)
        bit = (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)).astype(np.uint8)
        order = np.argsort(byte_idx, kind="stable")
        b_s, v_s = byte_idx[order], bit[order]
        starts = np.nonzero(np.concatenate(([True], b_s[1:] != b_s[:-1])))[0]
        merged = np.bitwise_or.reduceat(v_s, starts)
        self.bits[b_s[starts]] |= merged
        return self

    def contains(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = _bloom_hashes(keys)
        out = np.ones(keys.size, bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) & self.mask
            bit = (
                self.bits[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.uint8)
            ) & np.uint8(1)
            out &= bit.astype(bool)
        return out


def bloom_semi_join(probe_ds, build_ds, *, probe_on: str, build_on: str,
                    log2_m: int = 20, k: int = 7, exact: bool = True):
    """Semi-join: keep probe rows whose key exists in the build side, with
    a Bloom filter doing the heavy pruning.

    Build: per-batch partial Bloom blobs (fixed ``2^log2_m`` bits each) OR-
    merge on the driver — blocks × blob-size traffic, never key-scale rows
    on the probe path.  Probe: the merged filter broadcasts once via
    ``ray.put``; each batch tests membership with k vectorized probes.

    ``exact=True`` additionally broadcasts the SORTED distinct build keys
    and re-verifies Bloom positives with one ``searchsorted`` — exact
    semantics (the SQL ``EXISTS`` twin) at the cost of a key-array
    broadcast.  At build sides too large to broadcast exactly, run
    ``exact=False`` (bounded false-positive rate ~0.8% at n=m/16, k=7) or
    repartition-join the survivors; the Bloom stage has already cut the
    probe volume either way.
    """
    import ray

    def build_part(b: pa.Table) -> pa.Table:
        keys = np.unique(np.asarray(b[build_on].combine_chunks().cast(pa.int64())))
        bf = BloomFilter(log2_m, k).add(keys)
        cols = {"blob": pa.array([bf.bits.tobytes()], pa.binary())}
        if exact:
            # key payload only travels when the exact verify needs it — in
            # exact=False mode (build sides too large to broadcast) the
            # partials are blob-sized, honoring the fixed-traffic contract
            cols["keys"] = pa.array([keys.tolist()], pa.list_(pa.int64()))
        return pa.table(cols)

    merged = BloomFilter(log2_m, k)
    exact_keys: list[np.ndarray] = []
    for pb in build_ds.map_batches(build_part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for blob in pb["blob"].to_pylist():
            np.bitwise_or(
                merged.bits, np.frombuffer(blob, np.uint8), out=merged.bits
            )
        if exact:
            kc = pb["keys"].combine_chunks()
            exact_keys.append(np.asarray(kc.flatten(), np.int64))
    bits_ref = ray.put(merged.bits)
    keys_ref = (
        ray.put(np.unique(np.concatenate(exact_keys)))
        if exact and exact_keys
        else ray.put(np.empty(0, np.int64))
    )

    def probe(b: pa.Table) -> pa.Table:
        bf = BloomFilter(log2_m, k, bits=ray.get(bits_ref))
        keys = np.asarray(b[probe_on].combine_chunks().cast(pa.int64()))
        hit = bf.contains(keys)
        if exact and hit.any():
            sorted_keys = ray.get(keys_ref)
            cand = keys[hit]
            pos = np.searchsorted(sorted_keys, cand)
            ok = (pos < sorted_keys.size) & (
                sorted_keys[np.minimum(pos, max(sorted_keys.size - 1, 0))] == cand
            )
            hit[np.nonzero(hit)[0][~ok]] = False
        return b.take(pa.array(np.nonzero(hit)[0], pa.int64()))

    return probe_ds.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters
# ---------------------------------------------------------------------------


def _mg_summary(keys: np.ndarray, counts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra–Gries compression of an exact (key, count) frequency table to
    at most ``k`` counters: keep the k largest, subtract the (k+1)-largest
    count from each (the classic decrement, batched).  Guarantees every key
    with true count > N/(k+1) survives with count underestimated by at
    most N/(k+1); summaries MERGE by concat + re-compress (Agarwal et al.,
    "Mergeable Summaries", PODS 2012)."""
    if keys.size <= k:
        return keys, counts
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[k]]
    keep = order[:k]
    kept = counts[keep] - thresh
    nz = kept > 0
    return keys[keep][nz], kept[nz]


def heavy_hitter_tokens(ds, *, k: int = 20, sketch_k: int = 256):
    """Exact corpus top-k tokens by occurrence count — found WITHOUT a
    full-vocabulary shuffle: a Misra–Gries candidate pass then an exact
    count pass over the (tiny) candidate set.

    Pass 1: each batch dictionary-encodes its tokens ONCE through the
    shared ``_words_with_rows`` kernel (one tokenizer — counting by a
    second kernel would silently misalign on exotic whitespace), counts
    by code with one bincount, and compresses to a ``sketch_k``-counter MG
    summary; the driver merges blocks-× sketch_k (token, cnt) rows by
    concat + re-compress — fixed-size traffic, never vocabulary-scale.
    The merged summary's keys are a SUPERSET of every token with count >
    N/(sketch_k+1); the result is the exact top-k whenever the k-th true
    count exceeds that bound (size ``sketch_k`` to the distribution; the
    driver's oracle equality check is itself the enforcement — a dropped
    top-k token hash-mismatches the SQL twin).
    Pass 2: candidates broadcast via ``ray.put``; one ``pc.index_in`` over
    each batch's (distinct-word) dictionary + a code bincount gives EXACT
    counts; top-k by (count DESC, token ASC) is then deterministic and
    SQL-twin-checkable.

    Returns (token, n).
    """
    import pyarrow.compute as pc

    import ray

    from .text import _words_with_rows

    def mg_partials(b: pa.Table) -> pa.Table:
        _, codes, vocab = _words_with_rows(b["text"])
        c = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        nz = np.nonzero(c)[0]  # the dictionary may hold the dropped "" slot
        ks, cs = _mg_summary(nz, c[nz], sketch_k)
        return pa.table(
            {
                "token": vocab.take(pa.array(ks, pa.int64())),
                "cnt": pa.array(cs, pa.int64()),
            }
        )

    # driver merge: blocks × sketch_k rows — fixed-size, then re-compress
    toks: list = []
    cnts: list = []
    for pb in ds.map_batches(mg_partials, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        toks.extend(pb["token"].to_pylist())
        cnts.extend(pb["cnt"].to_pylist())
    import pandas as pd

    if not toks:
        return pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    agg = pd.DataFrame({"t": toks, "c": cnts}).groupby("t", sort=False)["c"].sum()
    ks, _ = _mg_summary(
        agg.index.to_numpy(dtype=object), agg.to_numpy().astype(np.int64), sketch_k
    )
    cand_list = sorted(ks.tolist())
    cand_arr = pa.array(cand_list, pa.string())
    cand_ref = ray.put(cand_arr)

    def exact_counts(b: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        _, codes, vocab = _words_with_rows(b["text"])
        c = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        m = np.asarray(pc.index_in(vocab, value_set=cand).fill_null(-1), np.int64)
        n = np.zeros(len(cand), np.int64)
        ok = m >= 0
        if ok.any():
            np.add.at(n, m[ok], c[ok])  # distinct-word scale per batch
        return pa.table({"token": cand, "n": pa.array(n, pa.int64())})

    # candidate order is FIXED (the broadcast array), so the driver fold
    # sums aligned vectors; np.add.at because iter_batches may concatenate
    # several partial tables into one batch (duplicate token rows)
    counts = np.zeros(len(cand_list), np.int64)
    cand_np = np.array(cand_list, object)
    for pb in ds.map_batches(exact_counts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = np.array(pb["token"].to_pylist(), object)
        nv = np.asarray(pb["n"], np.int64)
        pos = np.searchsorted(cand_np, t)
        np.add.at(counts, pos, nv)
    order = np.lexsort((cand_np, -counts))[:k]
    return pa.table(
        {
            "token": pa.array([cand_list[i] for i in order], pa.string()),
            "n": pa.array(counts[order], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimation + heavy words
# ---------------------------------------------------------------------------

CMS_D, CMS_W = 4, 2048  # 4 rows x 2048 counters: eps ~ e/W, delta ~ e^-4
_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _cms_indices(h: np.ndarray) -> np.ndarray:
    """(d, n) int64 counter indices for uint64 word hashes: row r uses
    ``mix64(h ^ seed_r) % W`` (the repo's splitmix finisher — pairwise-
    independent enough for the CM guarantee, deterministic for the twin)."""
    from .dedup import _mix64

    out = np.empty((CMS_D, h.size), np.int64)
    for r in range(CMS_D):
        out[r] = (_mix64(h ^ _CMS_SEEDS[r]) % np.uint64(CMS_W)).astype(np.int64)
    return out


def cms_partial_batch(batch: pa.Table) -> pa.Table:
    """One (d·w)-int64 sketch row + word count per batch — corpus text never
    leaves the task; partials are elementwise-ADDITIVE (a commutative
    monoid), so any merge tree gives the identical sketch."""
    from .dedup import _word_hashes_flat

    h, _ = _word_hashes_flat(batch["text"].to_pylist())
    sk = np.zeros((CMS_D, CMS_W), np.int64)
    if h.size:
        idx = _cms_indices(h)
        for r in range(CMS_D):
            np.add.at(sk[r], idx[r], 1)
    return pa.table(
        {
            "sketch": pa.array([sk.reshape(-1).tolist()], pa.list_(pa.int64())),
            "n_words": pa.array([int(h.size)], pa.int64()),
        }
    )


def cms_build(ds) -> tuple[np.ndarray, int]:
    """Merged (d, w) sketch + total word count.  The driver folds one tiny
    fixed-size row per block (at extreme block counts the same additive
    rows tree-merge through map_batches rounds unchanged)."""
    sk = np.zeros(CMS_D * CMS_W, np.int64)
    n = 0
    part = ds.select_columns(["text"]).map_batches(cms_partial_batch, batch_format="pyarrow")
    for b in part.iter_batches(batch_format="pyarrow"):
        col = b["sketch"].combine_chunks()
        sk += np.asarray(col.flatten(), np.int64).reshape(len(b), -1).sum(axis=0)
        n += int(np.asarray(b["n_words"], np.int64).sum())
    return sk.reshape(CMS_D, CMS_W), n


def cms_heavy_words(ds, *, phi: float = 0.005):
    """All words whose CM-estimated count ≥ ceil(phi·N), with the estimate
    (Cormode & Muthukrishnan 2005).  One-sided error: est ≥ true count, so
    the result is a SUPERSET of the true phi-heavy words — the classic
    sublinear heavy-hitters contract, vs the exact-after-candidates shape
    of :func:`heavy_hitter_tokens`.

    Pass 1 builds the merged sketch (fixed-size traffic); pass 2 broadcasts
    it, estimates each block's DISTINCT words locally, and emits only
    qualifying (word, est) rows; a word surfacing in many blocks emits the
    same estimate everywhere, so the final tiny ``groupby(word)`` max is
    pure dedup.  Returns (word, est) sorted driver-side only by the
    consumer.
    """
    import ray as _ray

    from .dedup import _word_hashes_flat

    sk, n_total = cms_build(ds)
    thresh = int(np.ceil(phi * n_total)) if n_total else 1
    ref = _ray.put(sk)

    def emit(b: pa.Table) -> pa.Table:
        sketch = _ray.get(ref)
        words: set[str] = set()
        from .dedup import WORD_RE

        for t in b["text"].to_pylist():
            words.update(WORD_RE.findall(t.lower()))
        wl = sorted(words)
        if not wl:
            return pa.table(
                {"word": pa.array([], pa.string()), "est": pa.array([], pa.int64())}
            )
        # words are \S+ tokens, so a space-joined round-trip through the
        # shared kernel re-splits to exactly these words (one vectorized
        # hash pass instead of a per-word call)
        h, _ = _word_hashes_flat([" ".join(wl)])
        idx = _cms_indices(h)
        est = sketch[np.arange(CMS_D)[:, None], idx].min(axis=0)
        keep = est >= thresh
        return pa.table(
            {
                "word": pa.array([w for w, k in zip(wl, keep) if k], pa.string()),
                "est": pa.array(est[keep], pa.int64()),
            }
        )

    from .vocabfold import keyed_fold

    # dedup-by-max via the vocab-safe keyed fold: at small phi the
    # candidate set approaches vocabulary scale, so the Aggregate must be
    # bounded by the coarse partition count, not distinct-word count
    cand = ds.select_columns(["text"]).map_batches(emit, batch_format="pyarrow")
    return keyed_fold(cand, key="word", sums=("est",), agg="max")
