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


def exact_dedup(ds, group_on: str = "content_hash"):
    """Exact dedup: keep the lowest doc_id per identical text.

    Returns (text, keep_id, n_dup).  The DEFAULT groups on the 8-byte
    content hash — the shuffle moves 64-bit keys, never the text (the
    at-scale shape); the output still carries the group's text, so the SQL
    oracle (GROUP BY text) is unchanged.  ``group_on="text"`` keeps the
    raw-text-shuffle variant as the oracle twin by construction.  (A 63-bit
    BLAKE2b collision would merge two distinct texts; at 10^12 docs the
    collision odds are ~1e-14 — standard for hash-keyed dedup.)
    """
    import pandas as pd

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "text": [g["text"].iloc[0]],
                "keep_id": [np.int64(g["doc_id"].min())],
                "n_dup": [np.int64(len(g))],
            }
        )

    if group_on == "content_hash":
        ds = ds.map_batches(content_hash_batch, batch_format="pyarrow")
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


def _distinct_pairs(band_ds, num_parts: int = 64):
    """(band, band_hash, doc_id) rows → distinct candidate-pair Dataset.

    Fully distributed with COARSE partitions: grouping directly on the LSH
    bucket key would create one tiny pandas group per bucket (tens of
    thousands — per-group overhead dominates), so buckets are salted into
    ``num_parts`` partitions by band_hash; within a partition the bucketing
    runs as one vectorized lexsort + run-boundary sweep.  A second coarse
    groupby on hash(a,b) dedups pairs surfaced by several bands.  No
    driver-side bucketing, no full-table pull."""
    import pandas as pd

    _empty_df = pd.DataFrame(
        {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
    )

    def add_pk(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["band_hash"], np.int64) % num_parts
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        band = g["band"].to_numpy().astype(np.int64)
        h = g["band_hash"].to_numpy().astype(np.int64)
        d = g["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((d, h, band))
        band, h, d = band[order], h[order], d[order]
        new = np.empty(band.size, dtype=bool)
        new[0] = True
        new[1:] = (band[1:] != band[:-1]) | (h[1:] != h[:-1])
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], band.size)
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            u = np.unique(d[s:e])
            ai, bi = np.triu_indices(u.size, k=1)
            out_a.append(u[ai])
            out_b.append(u[bi])
        if not out_a:
            return _empty_df
        pairs = np.unique(
            np.stack([np.concatenate(out_a), np.concatenate(out_b)], axis=1), axis=0
        )
        return pd.DataFrame({"a": pairs[:, 0], "b": pairs[:, 1]})

    pairs_ds = (
        band_ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(emit, batch_format="pandas")
    )

    def add_pk2(b: pa.Table) -> pa.Table:
        pk = (np.asarray(b["a"], np.int64) * 1_000_003 + np.asarray(b["b"], np.int64)) % num_parts
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(
            np.stack(
                [g["a"].to_numpy().astype(np.int64), g["b"].to_numpy().astype(np.int64)],
                axis=1,
            ),
            axis=0,
        )
        return pd.DataFrame({"a": pairs[:, 0], "b": pairs[:, 1]})

    return (
        pairs_ds.map_batches(add_pk2, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(dedup, batch_format="pandas")
    )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def _empty_pairs(extra: str, typ) -> pa.Table:
    return pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), extra: pa.array([], typ)}
    )


def _collect_arrow(dsx, schema: pa.Schema) -> pa.Table:
    """Collect a (small, result-scale) Dataset to one Arrow table.

    ``take_all`` materializes python dicts per row — minutes for a few
    hundred thousand rows; streaming the Arrow batches is ~100× faster."""
    tabs = [
        pa.table(b).select(schema.names).cast(schema)
        for b in dsx.iter_batches(batch_format="pyarrow")
        if len(b) and pa.table(b).num_rows
    ]
    return pa.concat_tables(tabs) if tabs else schema.empty_table()


def _verify_pairs_distributed(cand_tbl: pa.Table, payload_ds, pair_value, out_field: str, out_dtype):
    """Distributed pair verification via a two-step repartition join.

    The native ``Dataset.join`` cannot carry list-typed payload columns
    (acero rejects list non-key fields), so the join is expressed as two
    sort-based groupbys instead — fully distributed, no driver-side payload
    pull:

    1. union(pair-half rows, payload rows) → ``groupby(doc_id)`` attaches
       each doc's payload to its pair halves;
    2. ``groupby(pair_id)`` brings the two halves together and computes
       ``pair_value(payload_a, payload_b)`` (return None to drop the pair).
    """
    import pandas as pd

    import ray.data

    n = cand_tbl.num_rows
    a = np.asarray(cand_tbl["a"], np.int64)
    b = np.asarray(cand_tbl["b"], np.int64)
    pair_id = np.arange(n, dtype=np.int64)
    halves = pa.table(
        {
            "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
            "pair_id": pa.array(np.concatenate([pair_id, pair_id]), pa.int64()),
            "a": pa.array(np.concatenate([a, a]), pa.int64()),
            "b": pa.array(np.concatenate([b, b]), pa.int64()),
            "payload": pa.array([None] * (2 * n), pa.list_(pa.int64())),
        }
    )

    def tag_payload(t: pa.Table) -> pa.Table:
        m = np.full(t.num_rows, -1, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pair_id": pa.array(m, pa.int64()),
                "a": pa.array(m, pa.int64()),
                "b": pa.array(m, pa.int64()),
                "payload": t["payload"],
            }
        )

    u = ray.data.from_arrow(halves).union(
        payload_ds.map_batches(tag_payload, batch_format="pyarrow")
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # one COARSE partition of doc_ids: sort by doc_id, sweep runs; each
        # run holds a doc's payload row (pair_id < 0 sorts first) plus its
        # pair-half rows — vectorized boundary scan, no per-doc groups
        doc = g["doc_id"].to_numpy().astype(np.int64)
        pid = g["pair_id"].to_numpy().astype(np.int64)
        order = np.lexsort((pid, doc))
        doc, pid = doc[order], pid[order]
        aa = g["a"].to_numpy().astype(np.int64)[order]
        bb = g["b"].to_numpy().astype(np.int64)[order]
        payload = g["payload"].to_numpy()[order]
        starts = np.nonzero(np.concatenate([[True], doc[1:] != doc[:-1]]))[0]
        ends = np.append(starts[1:], doc.size)
        out_pid, out_a, out_b, out_pay = [], [], [], []
        for s, e2 in zip(starts, ends):
            if pid[s] >= 0:  # no payload row for this doc
                continue
            p = payload[s]
            for k in range(s + 1, e2):
                if pid[k] >= 0:
                    out_pid.append(pid[k])
                    out_a.append(aa[k])
                    out_b.append(bb[k])
                    out_pay.append(p)
        return pd.DataFrame(
            {"pair_id": np.asarray(out_pid, np.int64), "a": np.asarray(out_a, np.int64),
             "b": np.asarray(out_b, np.int64), "payload": out_pay}
        )

    def add_pk(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["pair_id"], np.int64) % 64
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def finish_part(g: pd.DataFrame) -> pd.DataFrame:
        # one COARSE partition of pairs: sort by pair_id, sweep boundary
        # runs — no per-pair pandas group (the per-pair DataFrame overhead
        # dominated the simhash-scale case)
        pid = g["pair_id"].to_numpy().astype(np.int64)
        order = np.argsort(pid, kind="stable")
        pid = pid[order]
        aa = g["a"].to_numpy().astype(np.int64)[order]
        bb = g["b"].to_numpy().astype(np.int64)[order]
        payload = g["payload"].to_numpy()[order]
        starts = np.nonzero(np.concatenate([[True], pid[1:] != pid[:-1]]))[0]
        ends = np.append(starts[1:], pid.size)
        out_a, out_b, out_v = [], [], []
        for s, e2 in zip(starts, ends):
            if e2 - s != 2:  # a half missing its payload side
                continue
            v = pair_value(np.asarray(payload[s]), np.asarray(payload[s + 1]))
            if v is None:
                continue
            out_a.append(aa[s])
            out_b.append(bb[s])
            out_v.append(v)
        return pd.DataFrame(
            {"a": np.asarray(out_a, np.int64), "b": np.asarray(out_b, np.int64),
             out_field: np.asarray(out_v, out_dtype)}
        )

    def add_doc_pk(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["doc_id"], np.int64) % 64
        return b.append_column("doc_pk", pa.array(pk, pa.int64()))

    out = (
        u.map_batches(add_doc_pk, batch_format="pyarrow")
        .groupby("doc_pk")
        .map_groups(attach, batch_format="pandas")
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(finish_part, batch_format="pandas")
    )
    arrow_t = pa.float64() if out_dtype is np.float64 else pa.int64()
    return _collect_arrow(
        out, pa.schema([("a", pa.int64()), ("b", pa.int64()), (out_field, arrow_t)])
    )


def minhash_lsh_dedup(ds, *, num_hashes: int = 64, bands: int = 16, threshold: float = 0.5):
    """Near-dup pairs via MinHash-LSH, exact-Jaccard verified — every stage
    distributed (no driver-side bucketing, no corpus-sized pulls or pins):

    1. docs → (band, band_hash, doc_id) rows (stateless map, two reads of
       the source instead of pinning corpus-sized shingles in the store);
    2. ``groupby(band, band_hash)`` emits candidate pairs per bucket, a
       pair-scale groupby dedups across bands;
    3. verify: the candidate doc-id set (output-scale) broadcasts once;
       only those docs' shingles are recomputed and repartition-JOINED onto
       the pairs by doc_id, and the exact Jaccard computes where the two
       shingle sets meet (groupby-based join — acero's hash join cannot
       carry list payloads).

    Returns pa.Table (a, b, jacc) with a < b, jacc >= threshold.
    """
    rows = num_hashes // bands
    stage = MinHashStage(num_hashes)

    def sig_bands(b: pa.Table) -> pa.Table:
        return _band_rows(stage(b).select(["doc_id", "sig"]), bands, rows)

    band_ds = ds.map_batches(sig_bands, batch_format="pyarrow")
    cand_tbl = _collect_arrow(
        _distinct_pairs(band_ds),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )
    if cand_tbl.num_rows == 0:
        return _empty_pairs("jacc", pa.float64())
    need = frozenset(
        np.concatenate(
            [np.asarray(cand_tbl["a"], np.int64), np.asarray(cand_tbl["b"], np.int64)]
        ).tolist()
    )
    need_ref = ray.put(need)

    def shingles_needed(b: pa.Table) -> pa.Table:
        needed = ray.get(need_ref)
        ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
        keep = np.array([int(x) in needed for x in ids], dtype=bool)
        if not keep.any():
            # same schema as the non-empty branch (payload, not shingles) —
            # downstream tag_payload expects 'payload' even if Ray ever stops
            # dropping zero-row blocks
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "payload": pa.array([], pa.list_(pa.int64()))}
            )
        sub = b.filter(pa.array(keep))
        sh = [shingle_hashes(t, stage.ngram) for t in sub["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": sub["doc_id"].cast(pa.int64()),
                "payload": pa.array([s.tolist() for s in sh], pa.list_(pa.int64())),
            }
        )

    sh_ds = ds.map_batches(shingles_needed, batch_format="pyarrow")

    def pair_jaccard(x: np.ndarray, y: np.ndarray):
        j = jaccard(np.asarray(x, np.int64), np.asarray(y, np.int64))
        return j if j >= threshold else None

    return _verify_pairs_distributed(cand_tbl, sh_ds, pair_jaccard, "jacc", np.float64)


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


def _join_partitions(requested: int) -> int:
    """Cap hash-join partition count at the cluster CPU count: each hash
    aggregator is an actor holding a CPU, so num_partitions > CPUs deadlocks
    the join under the streaming executor (measured, not theoretical)."""
    total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, min(requested, total))


def simhash_dedup(ds, *, max_hamming: int = 3, num_partitions: int = 16):
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found by 16-bit
    band blocking (a pair within distance 3 shares at least one of 4 bands).

    Distributed shape mirrors :func:`minhash_lsh_dedup` for candidate
    generation; the verify differs: signatures are 8-byte scalars, so the
    candidate pairs double-join against the signature table with the NATIVE
    hash-partitioned ``Dataset.join`` and the Hamming distance computes
    vectorized per joined batch (byte-view popcount)."""
    import ray.data

    stage = SimHashStage()

    def explode(b: pa.Table) -> pa.Table:
        t = stage(b)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sigs = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        band = np.repeat(np.arange(4, dtype=np.int32), ids.size)
        key = np.concatenate([(sigs >> np.uint64(16 * j)) & np.uint64(0xFFFF) for j in range(4)]).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band, pa.int32()),
                "band_hash": pa.array(key, pa.int64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
            }
        )

    cand_tbl = _collect_arrow(
        _distinct_pairs(ds.map_batches(explode, batch_format="pyarrow")),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )
    if cand_tbl.num_rows == 0:
        return _empty_pairs("hamming", pa.int64())

    # candidate-doc filter (output-scale broadcast) cuts the join's shuffle
    # volume to candidate signatures only
    need = frozenset(
        np.concatenate(
            [np.asarray(cand_tbl["a"], np.int64), np.asarray(cand_tbl["b"], np.int64)]
        ).tolist()
    )
    need_ref = ray.put(need)

    def sigs_needed(b: pa.Table) -> pa.Table:
        needed = ray.get(need_ref)
        t = stage(b)
        ids = np.asarray(t["doc_id"], np.int64)
        keep = np.array([int(x) in needed for x in ids], dtype=bool)
        return t.filter(pa.array(keep))

    sig_ds = ds.map_batches(sigs_needed, batch_format="pyarrow")
    np_parts = _join_partitions(num_partitions)
    joined = (
        ray.data.from_arrow(cand_tbl)
        .join(sig_ds, join_type="inner", num_partitions=np_parts,
              on=("a",), right_on=("doc_id",))
        .join(sig_ds, join_type="inner", num_partitions=np_parts,
              on=("b",), right_on=("doc_id",), right_suffix="_b")
    )

    def verify(b: pa.Table) -> pa.Table:
        a_ids = np.asarray(b["a"], np.int64)
        b_ids = np.asarray(b["b"], np.int64)
        x = np.ascontiguousarray(np.asarray(b["simhash"], np.int64)).astype(np.uint64)
        y = np.ascontiguousarray(np.asarray(b["simhash_b"], np.int64)).astype(np.uint64)
        xor = (x ^ y).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(xor, axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(a_ids[keep], pa.int64()),
                "b": pa.array(b_ids[keep], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    return _collect_arrow(
        joined.map_batches(verify, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())]),
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


@ray.remote
def _block_pair_sims(blk_a: pa.Table, blk_b: pa.Table, threshold: float) -> pa.Table:
    """Cosine pairs between two normalized blocks (zero-copy from the object
    store); the ``lo < hi`` filter keeps each unordered pair exactly once."""
    from .similarity import matrix_of

    ids_a = np.asarray(blk_a["vec_id"], np.int64)
    ids_b = np.asarray(blk_b["vec_id"], np.int64)
    S = matrix_of(blk_a["embedding"]) @ matrix_of(blk_b["embedding"]).T
    ai, bj = np.nonzero(S >= threshold)
    a, c = ids_a[ai], ids_b[bj]
    lo, hi = np.minimum(a, c), np.maximum(a, c)
    keep = lo < hi
    return pa.table({"a": pa.array(lo[keep], pa.int64()), "b": pa.array(hi[keep], pa.int64())})


def embedding_near_dup(ds, *, threshold: float = 0.95):
    """EXACT pairs (a < b) with cosine >= threshold, distributed as
    block-pair tasks: the normalized embedding blocks stay in the object
    store (refs only on the driver) and one Ray task per block pair (i <= j)
    computes its matmul — O((N/B)²) tasks, no driver-side matrix, no
    broadcast of the full corpus.  The pair list (output-scale) is the only
    thing collected.  At 100 TB prefer :func:`similarity.ivf_near_dup`
    (bucketed, approximate) — exact all-pairs is inherently quadratic.
    """

    def normalize(b: pa.Table) -> pa.Table:
        from .similarity import matrix_of

        M = matrix_of(b["embedding"])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        flat = pa.array(M.reshape(-1), pa.float64())
        offs = pa.array(np.arange(0, (len(b) + 1) * M.shape[1], M.shape[1], dtype=np.int32), pa.int32())
        return pa.table(
            {
                "vec_id": b["vec_id"].cast(pa.int64()),
                "embedding": pa.ListArray.from_arrays(offs, flat),
            }
        )

    norm = ds.select_columns(["vec_id", "embedding"]).map_batches(
        normalize, batch_format="pyarrow"
    ).materialize()
    refs = norm.to_arrow_refs()
    tasks = [
        _block_pair_sims.remote(refs[i], refs[j], threshold)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    parts = [t for t in ray.get(tasks) if t.num_rows]
    if not parts:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    # a pair can only appear once (block pairs are disjoint except self-pairs
    # already triangle-filtered), so a concat suffices
    return pa.concat_tables(parts)
