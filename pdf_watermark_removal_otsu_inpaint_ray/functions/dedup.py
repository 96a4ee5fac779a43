"""Deduplication operators for training-data pipelines.

Scale shapes (ray_guide.md "Aggregation at scale"):

* exact:     content-hash column in ``map_batches`` → ``groupby(hash)`` →
             keep first.  The shuffle key is the 64-bit hash, never the text.
* MinHash:   shingle→signature per batch (actor pool, compiled tokenizer) →
             explode to (band, band_hash, doc_id) rows → groupby bands →
             candidate pairs → exact-Jaccard verify on the (small) candidate
             set only.
* SimHash:   64-bit signature → 16-bit band index → candidates → Hamming
             verify.
* embedding: per-batch float64 matmul against a broadcast matrix (small side
             via ``ray.put``); at 100 TB the broadcast side becomes an IVF
             index (see functions/similarity.py).

All hashing is keyed BLAKE2b / multiply-shift — deterministic across
processes (never Python's seeded ``hash``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

WORD_RE = re.compile(r"\S+")
MERSENNE61 = (1 << 61) - 1


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little") >> 1


def content_hash_batch(batch: pa.Table) -> pa.Table:
    """Add a 63-bit deterministic content hash (the at-scale dedup key)."""
    h = pa.array([_hash64(t) for t in batch["text"].to_pylist()], pa.int64())
    return batch.append_column("content_hash", h)


def exact_dedup(ds, group_on: str = "text"):
    """Exact dedup: keep the lowest doc_id per identical text.

    Returns (text, keep_id, n_dup).  At scale, pass ``group_on=
    "content_hash"`` after :func:`content_hash_batch` so the shuffle moves
    8-byte keys; the default groups on raw text to stay oracle-SQL-comparable.
    """
    import pandas as pd

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                group_on: [g[group_on].iloc[0]],
                "keep_id": [np.int64(g["doc_id"].min())],
                "n_dup": [np.int64(len(g))],
            }
        )

    return ds.groupby(group_on).map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Sorted unique 63-bit hashes of word n-grams."""
    words = WORD_RE.findall(text.lower())
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(np.array([_hash64(g) for g in grams], dtype=np.int64))


class MinHashStage:
    """doc → (doc_id, sig[k], shingles[]) — signature via multiply-shift
    universal hashing (deterministic, overflow-free in uint64)."""

    def __init__(self, num_hashes: int = 64, ngram: int = 3, seed: int = 12345):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 1 << 62, size=num_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.integers(0, 1 << 62, size=num_hashes, dtype=np.uint64)
        self.k = num_hashes
        self.ngram = ngram

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if sh.size == 0:
            return np.zeros(self.k, dtype=np.int64)
        x = sh.astype(np.uint64)[:, None]
        h = (x * self.a[None, :] + self.b[None, :]) >> np.uint64(3)
        return h.min(axis=0).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        shingles = [shingle_hashes(t, self.ngram) for t in texts]
        sigs = [self.signature(s) for s in shingles]
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.int64())),
                "shingles": pa.array([s.tolist() for s in shingles], pa.list_(pa.int64())),
            }
        )


def _band_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    sigs = batch["sig"].to_pylist()
    out_band, out_hash, out_id = [], [], []
    for i, sig in enumerate(sigs):
        for b in range(bands):
            chunk = bytes(np.asarray(sig[b * rows : (b + 1) * rows], dtype=np.int64).data)
            out_band.append(b)
            out_hash.append(int.from_bytes(hashlib.blake2b(chunk, digest_size=8).digest(), "little") >> 1)
            out_id.append(int(ids[i]))
    return pa.table(
        {
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
        }
    )


def _candidate_pairs(band_ds) -> set[tuple[int, int]]:
    """(band, band_hash, doc_id) rows → candidate pairs, vectorized.

    The band table is tiny (docs × bands rows of 20 bytes), so bucketing
    happens on the driver with one lexsort — a per-bucket ``map_groups``
    pays per-group overhead on ~#docs×#bands groups and dominates runtime.
    For corpora where even the band table is huge, fall back to
    ``groupby(["band","band_hash"])`` over the same rows (associative)."""
    bands, hashes, ids = [], [], []
    for b in band_ds.iter_batches(batch_format="pyarrow"):
        bands.append(np.asarray(b["band"], dtype=np.int64))
        hashes.append(np.asarray(b["band_hash"], dtype=np.int64))
        ids.append(np.asarray(b["doc_id"], dtype=np.int64))
    if not bands:
        return set()
    band = np.concatenate(bands)
    h = np.concatenate(hashes)
    d = np.concatenate(ids)
    order = np.lexsort((d, h, band))
    band, h, d = band[order], h[order], d[order]
    new = np.empty(band.size, dtype=bool)
    new[0] = True
    new[1:] = (band[1:] != band[:-1]) | (h[1:] != h[:-1])
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], band.size)
    cand: set[tuple[int, int]] = set()
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        bucket = np.unique(d[s:e])
        for i in range(bucket.size):
            for j in range(i + 1, bucket.size):
                cand.add((int(bucket[i]), int(bucket[j])))
    return cand


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def minhash_lsh_dedup(ds, *, num_hashes: int = 64, bands: int = 16, threshold: float = 0.5):
    """Near-dup pairs via MinHash-LSH, exact-Jaccard verified.

    Returns pa.Table (a, b, jacc) with a < b, jacc >= threshold.
    """
    rows = num_hashes // bands
    # instance => stateless tasks on warm workers (the class form would
    # spawn an actor pool per execution); materialized because both the
    # banding and the verify stage read it
    sigds = ds.map_batches(
        MinHashStage(num_hashes), batch_format="pyarrow"
    ).materialize()
    band_ds = sigds.select_columns(["doc_id", "sig"]).map_batches(
        lambda b: _band_rows(b, bands, rows), batch_format="pyarrow"
    )
    cand = _candidate_pairs(band_ds)
    if not cand:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "jacc": pa.array([], pa.float64())})
    need = {d for p in cand for d in p}
    need_ref = ray.put(need)

    def filter_needed(b: pa.Table) -> pa.Table:
        needed = ray.get(need_ref)
        keep = np.array([int(x) in needed for x in b["doc_id"].to_numpy(zero_copy_only=False)])
        return b.filter(pa.array(keep))

    kept = sigds.select_columns(["doc_id", "shingles"]).map_batches(
        filter_needed, batch_format="pyarrow"
    ).take_all()
    sh = {int(r["doc_id"]): np.asarray(r["shingles"], dtype=np.int64) for r in kept}
    out_a, out_b, out_j = [], [], []
    for a, b in sorted(cand):
        j = jaccard(sh[a], sh[b])
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(j)
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()), "jacc": pa.array(out_j, pa.float64())}
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashStage:
    """64-bit SimHash over word unigrams (bit-vote, vectorized per doc)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = []
        for t in texts:
            words = WORD_RE.findall(t.lower())
            if not words:
                sigs.append(0)
                continue
            hs = np.array([_hash64(w) for w in words], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for k in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(k)
            sigs.append(int(sig.astype(np.int64).view(np.int64)))
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "simhash": pa.array(sigs, pa.int64()),
            }
        )


def simhash_dedup(ds, *, max_hamming: int = 3):
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found by 16-bit
    band blocking (a pair within distance 3 shares at least one of 4 bands)."""
    sig_ds = ds.map_batches(SimHashStage(), batch_format="pyarrow").materialize()

    def explode(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        sigs = b["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        band = np.repeat(np.arange(4, dtype=np.int32), ids.size)
        key = np.concatenate([(sigs >> np.uint64(16 * j)) & np.uint64(0xFFFF) for j in range(4)]).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band, pa.int32()),
                "band_hash": pa.array(key, pa.int64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
            }
        )

    cand = _candidate_pairs(sig_ds.map_batches(explode, batch_format="pyarrow"))
    sig = {int(r["doc_id"]): np.uint64(r["simhash"]) for r in sig_ds.take_all()}
    out_a, out_b, out_h = [], [], []
    for a, b in sorted(cand):
        h = int(bin(int(sig[a] ^ sig[b])).count("1"))
        if h <= max_hamming:
            out_a.append(a)
            out_b.append(b)
            out_h.append(h)
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()), "hamming": pa.array(out_h, pa.int64())}
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard within source partitions (oracle-SQL-comparable)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(ds, *, ngram: int = 3, threshold: float = 0.5):
    """Exact pairwise word-n-gram Jaccard within each source partition.

    Partition-pruned exact variant (the all-pairs SQL twin lives in
    __ray_entry__); cross-source near-dups are the LSH path's job.
    Returns (source, a, b) pairs with a < b and jaccard >= threshold.
    """
    import pandas as pd

    def per_source(g: pd.DataFrame) -> pd.DataFrame:
        docs = sorted(zip(g["doc_id"].astype(np.int64), g["text"]))
        sets = {d: set(map(int, shingle_hashes(t, ngram))) for d, t in docs}
        rows = []
        ids = [d for d, _ in docs]
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and inter / union >= threshold:
                    rows.append((g["source"].iloc[0], a, b))
        return pd.DataFrame(rows, columns=["source", "a", "b"]).astype(
            {"a": np.int64, "b": np.int64}
        )

    return ds.groupby("source").map_groups(per_source, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_dup(ds, *, threshold: float = 0.95):
    """Pairs (a < b) with cosine >= threshold, via per-batch float64 matmul
    against the broadcast full matrix (small side).  At scale: LSH/IVF
    bucketing first (similarity.py), same verify."""
    import pandas as pd

    all_rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    M = np.array([r["embedding"] for r in all_rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    order = np.argsort(ids)
    ids, M = ids[order], M[order]
    ref = ray.put((ids, M))

    def batch_sims(b: pa.Table) -> pa.Table:
        gids, gM = ray.get(ref)
        bid = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        from .similarity import matrix_of

        B = matrix_of(b["embedding"])
        B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-30)
        S = B @ gM.T
        ai, bj = np.nonzero(S >= threshold)
        a, c = bid[ai], gids[bj]
        keep = a < c
        return pa.table({"a": pa.array(a[keep], pa.int64()), "b": pa.array(c[keep], pa.int64())})

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        batch_sims, batch_format="pyarrow"
    )
