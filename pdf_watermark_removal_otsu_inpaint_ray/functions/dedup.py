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

All hashing is vectorized multiply-shift polynomial hashing (splitmix64
finalizer) — deterministic across processes (never Python's seeded
``hash``), mirrored by the pure-Python spec in oracle_data._py_word_hash.
"""

from __future__ import annotations

from ..config import scaled_parts

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

WORD_RE = re.compile(r"\S+")
MERSENNE61 = (1 << 61) - 1

# --- vectorized multiply-shift hashing (the signature-stage hot path) ------
#
# Per-WORD 64-bit hashes are a byte-polynomial mod 2^64 (FNV-prime
# multiplier, positional power table, one np.add.reduceat over the batch's
# flattened utf-8 buffer) finished with the splitmix64 mixer; per-GRAM
# hashes combine n consecutive word hashes with positional odd coefficients
# and re-mix.  Everything is deterministic pure arithmetic — identical
# across processes and platforms (uint64 wraparound is the modulus), and
# ~30× cheaper than the per-gram BLAKE2b it replaced.  The pure-Python
# mirror of this definition lives in oracle_data._py_simhash (independent
# oracle twin).

_POLY_P = np.uint64(1099511628211)  # FNV-1a prime, odd
_LEN_SALT = np.uint64(0x2545F4914F6CDD1D)
_GRAM_C = np.uint64(0x100000001B3)
_MIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_C2 = np.uint64(0x94D049BB133111EB)
_POW64: dict[str, np.ndarray] = {}


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (wraparound = mod 2^64)."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(30))
        x = x * _MIX_C1
        x = x ^ (x >> np.uint64(27))
        x = x * _MIX_C2
        return x ^ (x >> np.uint64(31))


def _pow_table_64(base: np.uint64, n: int, key: str) -> np.ndarray:
    """base^k mod 2^64 for k < n (cached, grown GEOMETRICALLY on demand).

    Vectorized build (np.multiply.accumulate wraps mod 2^64) and doubling
    growth — a per-element Python loop with exact-fit sizing made every
    +1-byte creep of a batch's max text length a full O(n) Python rebuild
    (review finding: seconds per 5 MB doc in the content-hash hot path)."""
    cached = _POW64.get(key)
    if cached is None or cached.size < n:
        size = max(n, 1024, 2 * (cached.size if cached is not None else 0))
        terms = np.full(size, base, dtype=np.uint64)
        terms[0] = np.uint64(1)
        with np.errstate(over="ignore"):
            p = np.multiply.accumulate(terms)
        _POW64[key] = p
        cached = p
    return cached


def _word_hashes_flat(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All words of all texts → (flat uint64 word hashes, per-doc offsets).

    The regex tokenization runs per doc (C speed); the hashing is one
    vectorized polynomial over the batch's entire flattened utf-8 buffer.
    """
    words_all: list[bytes] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        ws = WORD_RE.findall(t.lower())
        counts[i] = len(ws)
        words_all.extend(w.encode() for w in ws)
    doc_off = np.concatenate([[0], np.cumsum(counts)])
    if not words_all:
        return np.zeros(0, dtype=np.uint64), doc_off
    lens = np.fromiter((len(w) for w in words_all), np.int64, len(words_all))
    flat = np.frombuffer(b"".join(words_all), dtype=np.uint8).astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lens)
    term = flat * _pow_table_64(_POLY_P, int(lens.max()) + 1, "poly")[pos]
    sums = np.add.reduceat(term, starts)  # uint64 wraparound == mod 2^64
    h = _mix64(sums ^ (lens.astype(np.uint64) * _LEN_SALT))
    return h, doc_off


def _gram_hashes_flat(
    wh: np.ndarray, doc_off: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Word hashes → per-doc n-gram hashes (63-bit int64), flat + offsets.

    A doc with m >= n words yields its m-n+1 full grams (positional
    combine of n consecutive word hashes); a doc with 0 < m < n yields ONE
    gram over all m words (the " ".join(words) analog); an empty doc yields
    none.  Fully vectorized except the (rare) short-doc fallback.
    """
    counts = np.diff(doc_off)
    n_full = np.maximum(counts - n + 1, 0)
    n_gram = np.where(counts == 0, 0, np.maximum(n_full, 1))
    goff = np.concatenate([[0], np.cumsum(n_gram)])
    out = np.zeros(int(goff[-1]), dtype=np.uint64)
    W = wh.size
    if W >= n:
        cpow = _pow_table_64(_GRAM_C, n + 1, "gram")
        acc = np.zeros(W - n + 1, dtype=np.uint64)
        for j in range(n):
            acc += wh[j : W - n + 1 + j] * cpow[n - 1 - j]
        # validity: the gram may not cross its doc boundary
        seg = np.repeat(np.arange(counts.size), counts)[: W - n + 1]
        valid = np.arange(W - n + 1, dtype=np.int64) + n <= doc_off[1:][seg]
        vi = np.nonzero(valid)[0]
        out[goff[seg[vi]] + (vi - doc_off[:-1][seg[vi]])] = _mix64(acc[vi])
    # short docs (0 < m < n): one gram combining all m word hashes
    for d in np.nonzero((counts > 0) & (counts < n))[0]:
        m = int(counts[d])
        ws = wh[doc_off[d] : doc_off[d] + m]
        cpow = _pow_table_64(_GRAM_C, m + 1, "gram")
        out[goff[d]] = _mix64((ws * cpow[:m][::-1]).sum(dtype=np.uint64))
    return (out >> np.uint64(1)).astype(np.int64), goff


def _text_hashes(texts: list[str]) -> np.ndarray:
    """63-bit content hash per text — one vectorized polynomial over the
    batch's flattened utf-8 buffer (same spec as the word hash, applied to
    the whole text), no per-row hashing."""
    if not texts:
        return np.zeros(0, dtype=np.int64)
    enc = [t.encode() for t in texts]
    lens = np.fromiter((len(e) for e in enc), np.int64, len(enc))
    if lens.sum() == 0:
        return np.full(len(texts), int(_mix64(np.uint64(0))) >> 1, dtype=np.int64)
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lens)
    term = flat * _pow_table_64(_POLY_P, int(lens.max()) + 1, "poly")[pos]
    # reduceat only over NON-EMPTY texts' starts: empty texts occupy zero
    # bytes, so non-empty segments stay contiguous and each runs exactly to
    # the next non-empty start (clamping starts instead would truncate the
    # last non-empty text whenever the batch ENDS with empty texts — the
    # same boundary bug class fixed in learned.py)
    nz = lens > 0
    sums = np.zeros(len(texts), dtype=np.uint64)
    sums[nz] = np.add.reduceat(term, starts[nz])
    h = _mix64(sums ^ (lens.astype(np.uint64) * _LEN_SALT))
    return (h >> np.uint64(1)).astype(np.int64)


def content_hash_batch(batch: pa.Table) -> pa.Table:
    """Add a 63-bit deterministic content hash (the at-scale dedup key)."""
    h = pa.array(_text_hashes(batch["text"].to_pylist()), pa.int64())
    return batch.append_column("content_hash", h)


def exact_dedup(ds, group_on: str = "content_hash", num_parts: int | None = None):
    """Exact dedup: keep the lowest doc_id per identical text.

    Returns (text, keep_id, n_dup).  The DEFAULT groups on the 8-byte
    content hash — the partition KEY is 8 bytes (no string hashing or
    comparison in the shuffle); the rows themselves still carry the text
    column through the exchange, since the output reports the group's text
    and the SQL oracle (GROUP BY text) is unchanged.  ``group_on="text"``
    keeps the raw-text-KEYED variant as the oracle twin by construction.
    (The content hash is the 63-bit splitmix64-finished multiply-shift
    polynomial above — NOT cryptographic: random-input collision odds at
    10^12 docs are ~1e-14, but adversarially constructed colliding texts
    are feasible; a hostile-input corpus should dedup with
    ``group_on="text"``.)

    Distribution shape: the groupby runs on COARSE ``num_parts`` partitions
    (hash of the dedup key), and each partition collapses its keys with one
    vectorized pandas groupby-agg (C-speed reducers) — with mostly-unique
    corpora a per-KEY callback would build one DataFrame per document (the
    `_distinct_pairs` lesson).  Correct because a key's rows land in exactly
    one partition.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    from ..sinks.exactly_once import hash_partition_ids

    if group_on == "content_hash":
        ds = ds.map_batches(content_hash_batch, batch_format="pyarrow")

    def add_pk(b: pa.Table) -> pa.Table:
        if group_on == "content_hash":
            pk = np.asarray(b["content_hash"], np.int64) % num_parts
        else:
            pk = hash_partition_ids(b["text"].combine_chunks(), num_parts)
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(group_on, sort=False)
        return pd.DataFrame(
            {
                "text": gb["text"].first().to_numpy(),
                "keep_id": gb["doc_id"].min().to_numpy().astype(np.int64),
                "n_dup": gb["doc_id"].size().to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(collapse, batch_format="pandas")
    )


def incremental_dedup(ds, *, base_col: str = "is_base", num_parts: int | None = None):
    """Cross-snapshot (incremental) exact dedup: keep each DELTA text that
    never occurs in the BASE snapshot, collapsing delta-internal duplicates
    to the lowest doc_id — the "dedup tonight's crawl against the corpus"
    step of a continuously-ingesting training pipeline.

    ``ds`` must carry ``doc_id``, ``text`` and an int/bool ``base_col``
    (1 = row belongs to the already-ingested base snapshot).  Returns
    (text, keep_id, n_delta_dup) for surviving delta texts.

    Scale shape: a per-batch PARTIAL prune first — one row per (batch,
    content_hash, membership): min doc_id + count, text carried only on
    delta rows (base rows ship an empty string; only the 8-byte hash key
    matters for them) — so the shuffle carries at most two prunes per
    distinct text per batch, never the corpus.  Then one coarse
    ``num_parts`` hash-partition groupby resolves globally with vectorized
    pandas aggregation (no per-key callback; the `_distinct_pairs` lesson).
    Same collision caveat as :func:`exact_dedup` (63-bit content hash;
    hostile corpora should key on text)."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def partials(b: pa.Table) -> pa.Table:
        hb = content_hash_batch(b)
        df = pd.DataFrame(
            {
                "content_hash": np.asarray(hb["content_hash"], np.int64),
                "is_base": np.asarray(hb[base_col]).astype(np.int64),
                "doc_id": np.asarray(hb["doc_id"], np.int64),
                "text": np.asarray(hb["text"]),
            }
        )
        gb = df.groupby(["content_hash", "is_base"], sort=False, as_index=False).agg(
            doc_id=("doc_id", "min"), n=("doc_id", "size"), text=("text", "first")
        )
        # base partials never contribute text to the output — drop the
        # payload so the shuffle carries only their 8-byte key
        gb.loc[gb["is_base"] == 1, "text"] = ""
        return pa.table(
            {
                "content_hash": pa.array(gb["content_hash"].to_numpy(), pa.int64()),
                "is_base": pa.array(gb["is_base"].to_numpy(), pa.int64()),
                "doc_id": pa.array(gb["doc_id"].to_numpy(), pa.int64()),
                "n": pa.array(gb["n"].to_numpy().astype(np.int64), pa.int64()),
                "text": pa.array(gb["text"], pa.string()),
                "pk": pa.array(
                    gb["content_hash"].to_numpy() % num_parts, pa.int64()
                ),
            }
        )

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        base_hashes = g.loc[g["is_base"] == 1, "content_hash"].unique()
        delta = g[(g["is_base"] == 0) & ~g["content_hash"].isin(base_hashes)]
        if len(delta) == 0:
            return pd.DataFrame(
                {
                    "text": pd.Series(dtype=object),
                    "keep_id": pd.Series(dtype=np.int64),
                    "n_delta_dup": pd.Series(dtype=np.int64),
                }
            )
        # first-by-min-doc_id: partials preserve the min row's text, so
        # sorting by doc_id makes "first" the global minimum's carry
        delta = delta.sort_values("doc_id", kind="stable")
        gb = delta.groupby("content_hash", sort=False)
        return pd.DataFrame(
            {
                "text": gb["text"].first().to_numpy(),
                "keep_id": gb["doc_id"].min().to_numpy().astype(np.int64),
                "n_delta_dup": gb["n"].sum().to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(collapse, batch_format="pandas")
    )


def cross_source_texts(ds, *, min_sources: int = 2, num_parts: int | None = None):
    """Set-intersection across corpus partitions: texts that occur in at
    least ``min_sources`` DISTINCT sources (the boilerplate / mirrored-
    content detector — text shared across crawls is navigation chrome,
    licenses, templates).  Returns (text, n_sources, n_docs).

    Same scale shape as :func:`incremental_dedup`: per-batch partials of
    distinct (content_hash, source) with one carried text + doc count —
    the shuffle carries at most one row per (batch, text, source) — then a
    coarse content-hash partition groupby counts distinct sources per text
    with one vectorized pandas pass."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def partials(b: pa.Table) -> pa.Table:
        hb = content_hash_batch(b)
        df = pd.DataFrame(
            {
                "content_hash": np.asarray(hb["content_hash"], np.int64),
                "source": np.asarray(hb["source"]),
                "text": np.asarray(hb["text"]),
            }
        )
        gb = df.groupby(["content_hash", "source"], sort=False, as_index=False).agg(
            text=("text", "first"), n_docs=("text", "size")
        )
        return pa.table(
            {
                "content_hash": pa.array(gb["content_hash"].to_numpy(), pa.int64()),
                "source": pa.array(gb["source"], pa.string()),
                "text": pa.array(gb["text"], pa.string()),
                "n_docs": pa.array(gb["n_docs"].to_numpy().astype(np.int64), pa.int64()),
                "pk": pa.array(gb["content_hash"].to_numpy() % num_parts, pa.int64()),
            }
        )

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby("content_hash", sort=False)
        n_sources = gb["source"].nunique()
        keep = n_sources[n_sources >= min_sources]
        if len(keep) == 0:
            return pd.DataFrame(
                {
                    "text": pd.Series(dtype=object),
                    "n_sources": pd.Series(dtype=np.int64),
                    "n_docs": pd.Series(dtype=np.int64),
                }
            )
        sub = g[g["content_hash"].isin(keep.index)]
        gb2 = sub.groupby("content_hash", sort=False)
        return pd.DataFrame(
            {
                "text": gb2["text"].first().to_numpy(),
                "n_sources": gb2["source"].nunique().to_numpy().astype(np.int64),
                "n_docs": gb2["n_docs"].sum().to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(collapse, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Sorted unique 63-bit hashes of word n-grams (vectorized)."""
    wh, doc_off = _word_hashes_flat([text])
    grams, _ = _gram_hashes_flat(wh, doc_off, n)
    return np.unique(grams)


class MinHashStage:
    """doc batch → (doc_id, sig[k], shingles[]) — vectorized end to end:
    one flat word-hash pass over the batch, flat gram hashes with doc-
    boundary masking, then the k minhash values for EVERY doc at once via
    ``np.minimum.reduceat`` over the (grams × k) multiply-shift matrix
    (duplicate grams cannot change a min, so no per-doc unique is needed
    for the signature — only for the emitted shingle payload)."""

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

    def signatures_flat(self, grams: np.ndarray, goff: np.ndarray) -> np.ndarray:
        """(docs, k) int64 signature matrix for per-doc gram slices."""
        n_docs = goff.size - 1
        sig = np.zeros((n_docs, self.k), dtype=np.int64)
        counts = np.diff(goff)
        nz = np.nonzero(counts > 0)[0]
        if nz.size == 0:
            return sig
        H = (grams.astype(np.uint64)[:, None] * self.a[None, :] + self.b[None, :]) >> np.uint64(3)
        sig[nz] = np.minimum.reduceat(H, goff[nz]).astype(np.int64)
        return sig

    def sig_table(self, batch: pa.Table) -> pa.Table:
        """(doc_id, sig, n_grams) WITHOUT the shingle payload — the banding
        pass only needs signatures plus an empty-doc indicator, and the
        per-doc ``np.unique`` + list building of the payload is pure waste
        there (review finding).  ``n_grams > 0`` iff the emitted shingle
        list would be non-empty (unique of a non-empty slice is non-empty)."""
        texts = batch["text"].to_pylist()
        wh, doc_off = _word_hashes_flat(texts)
        grams, goff = _gram_hashes_flat(wh, doc_off, self.ngram)
        sig = self.signatures_flat(grams, goff)
        k_off = pa.array(
            np.arange(0, (len(texts) + 1) * self.k, self.k, dtype=np.int32), pa.int32()
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "sig": pa.ListArray.from_arrays(k_off, pa.array(sig.reshape(-1), pa.int64())),
                "n_grams": pa.array(np.diff(goff), pa.int64()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        wh, doc_off = _word_hashes_flat(texts)
        grams, goff = _gram_hashes_flat(wh, doc_off, self.ngram)
        sig = self.signatures_flat(grams, goff)
        shingles = [np.unique(grams[goff[i] : goff[i + 1]]) for i in range(len(texts))]
        sh_lens = np.fromiter((s.size for s in shingles), np.int64, len(shingles))
        sh_off = pa.array(np.concatenate([[0], np.cumsum(sh_lens)]).astype(np.int32), pa.int32())
        sh_flat = pa.array(
            np.concatenate(shingles) if shingles else np.zeros(0, np.int64), pa.int64()
        )
        k_off = pa.array(
            np.arange(0, (len(texts) + 1) * self.k, self.k, dtype=np.int32), pa.int32()
        )
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "sig": pa.ListArray.from_arrays(k_off, pa.array(sig.reshape(-1), pa.int64())),
                "shingles": pa.ListArray.from_arrays(sh_off, sh_flat),
            }
        )


def _band_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """(doc_id, sig) rows → (band, band_hash, doc_id) rows, vectorized:
    reshape the signature matrix to (docs, bands, rows) and combine each
    band's rows with positional coefficients + mix — no per-doc hashing."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    from ..stages.kernels import flatten_list_column

    fb = flatten_list_column(batch["sig"])
    n_docs = ids.size
    S = fb.values.astype(np.uint64).reshape(n_docs, bands, rows)
    cpow = _pow_table_64(_GRAM_C, rows + 1, "gram")[:rows][::-1]
    bh = (_mix64((S * cpow[None, None, :]).sum(axis=2, dtype=np.uint64)) >> np.uint64(1)).astype(np.int64)
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n_docs), pa.int32()),
            "band_hash": pa.array(bh.reshape(-1), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
        }
    )


def _distinct_pairs(band_ds, num_parts: int | None = None, final_dedup: str = "driver"):
    """(band, band_hash, doc_id) rows → candidate-pair Dataset (distinct
    within each bucket partition; cross-band dedup per ``final_dedup`` —
    "driver" leaves it to :func:`_candidate_pairs_tbl`'s vectorized sweep,
    "distributed" appends the second coarse groupby stage).

    Fully distributed with COARSE partitions: grouping directly on the LSH
    bucket key would create one tiny pandas group per bucket (tens of
    thousands — per-group overhead dominates), so buckets are salted into
    ``num_parts`` partitions by band_hash; within a partition the bucketing
    runs as one vectorized lexsort + run-boundary sweep.  A second coarse
    groupby on hash(a,b) dedups pairs surfaced by several bands.  No
    driver-side bucketing, no full-table pull."""
    num_parts = scaled_parts(64, num_parts)
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

    if final_dedup == "driver":
        return pairs_ds

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


def _candidate_pairs_tbl(band_ds) -> pa.Table:
    """Collect the distinct candidate-pair table to the driver.

    The per-bucket groupby already dedups within its partition; the
    CROSS-band dedup happens here as one vectorized lexsort over the
    collected rows instead of a second distributed groupby — the pair set
    is output-scale by construction (it is what every caller collects
    anyway), so trading a full shuffle stage (~2 s fixed at sf0.1) for a
    driver sort of the same rows is a pure win.  The distributed dedup
    path remains available via _distinct_pairs(final_dedup="distributed")
    for a pair set too large to sort on the driver — at that point the
    collect itself is the bottleneck and the caller must keep pairs as a
    Dataset end to end."""
    raw = _collect_arrow(
        _distinct_pairs(band_ds), pa.schema([("a", pa.int64()), ("b", pa.int64())])
    )
    if raw.num_rows == 0:
        return raw
    a = np.asarray(raw["a"], np.int64)
    b = np.asarray(raw["b"], np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    return pa.table({"a": pa.array(a[keep], pa.int64()), "b": pa.array(b[keep], pa.int64())})


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over unique-hash sets.  Two EMPTY sets score 0.0, not
    1.0 — empty/too-short docs are not meaningful near-dups, and the n-gram
    path (ngram_jaccard_pairs) drops union==0 pairs under the same rule."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


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
        # pair-half rows — fully vectorized: np.repeat propagates each run's
        # payload to its half rows, no inner Python loop
        doc = g["doc_id"].to_numpy().astype(np.int64)
        pid = g["pair_id"].to_numpy().astype(np.int64)
        order = np.lexsort((pid, doc))
        doc, pid = doc[order], pid[order]
        aa = g["a"].to_numpy().astype(np.int64)[order]
        bb = g["b"].to_numpy().astype(np.int64)[order]
        payload = g["payload"].to_numpy()[order]
        starts = np.nonzero(np.concatenate([[True], doc[1:] != doc[:-1]]))[0]
        ends = np.append(starts[1:], doc.size)
        run_of = np.repeat(np.arange(starts.size), ends - starts)
        has_payload = pid[starts] < 0  # payload row sorts first in its run
        # half rows = rows with pid >= 0 inside runs that carry a payload
        half = (pid >= 0) & has_payload[run_of]
        n_half_per_run = np.bincount(run_of[half], minlength=starts.size)
        src_pay = np.repeat(payload[starts], n_half_per_run)
        # mark which side of the pair this half carries (its doc is either
        # a or b; a < b so they can't coincide) — finish_part orders the two
        # halves by it so pair_value(payload_a, payload_b) holds even for
        # ASYMMETRIC pair metrics (e.g. containment), not just jaccard/hamming
        is_b = (doc[half] == bb[half]).astype(np.int64)
        # emit ARROW with an explicit large_list payload: returning a pandas
        # object column lets Ray re-infer the type per block (uniform-length
        # blocks become fixed-shape tensor extensions, ragged ones variable-
        # shaped), and the downstream groupby cannot concatenate the mix —
        # a layout-dependent schema flake, reproduced at 16 cpus
        lens = np.fromiter((len(x) for x in src_pay), np.int64, src_pay.size)
        flat = (
            np.concatenate(src_pay).astype(np.int64)
            if src_pay.size
            else np.zeros(0, np.int64)
        )
        offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
        pay_arr = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(flat, pa.int64())
        )
        return pa.table(
            {
                "pair_id": pa.array(pid[half], pa.int64()),
                "a": pa.array(aa[half], pa.int64()),
                "b": pa.array(bb[half], pa.int64()),
                "is_b": pa.array(is_b, pa.int64()),
                "payload": pay_arr,
            }
        )

    def add_pk(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["pair_id"], np.int64) % 64
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def finish_part(g: pd.DataFrame) -> pd.DataFrame:
        # one COARSE partition of pairs: sort by pair_id, sweep boundary
        # runs — no per-pair pandas group (the per-pair DataFrame overhead
        # dominated the simhash-scale case)
        pid = g["pair_id"].to_numpy().astype(np.int64)
        isb = g["is_b"].to_numpy().astype(np.int64)
        order = np.lexsort((isb, pid))  # a-half first within each pair
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
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}) — "
            f"the signature reshapes to (docs, bands, rows)"
        )
    rows = num_hashes // bands
    stage = MinHashStage(num_hashes)

    def sig_bands(b: pa.Table) -> pa.Table:
        # signature-only kernel: the shingle payload is never read here
        t = stage.sig_table(b)
        # docs with ZERO grams (empty/too-short text) all share the
        # all-zero signature: banding them makes every such doc collide
        # with every other in every band — E empty docs would explode into
        # E(E-1)/2 candidate pairs.  They cannot be meaningful near-dups
        # (jaccard of empty sets is 0 here), so drop them before banding.
        t = t.filter(pc.greater(t["n_grams"], 0))
        return _band_rows(t.select(["doc_id", "sig"]), bands, rows)

    band_ds = ds.map_batches(sig_bands, batch_format="pyarrow")
    cand_tbl = _candidate_pairs_tbl(band_ds)
    if cand_tbl.num_rows == 0:
        return _empty_pairs("jacc", pa.float64())
    # broadcast the candidate-id set as a SORTED int64 array: np.isin probes
    # it vectorized per batch (a frozenset would mean one Python hash probe
    # + int() boxing per corpus row — the hot-path cost at 10^8 docs)
    need_arr = np.unique(
        np.concatenate(
            [np.asarray(cand_tbl["a"], np.int64), np.asarray(cand_tbl["b"], np.int64)]
        )
    )
    need_ref = ray.put(need_arr)

    def shingles_needed(b: pa.Table) -> pa.Table:
        needed = ray.get(need_ref)
        ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
        keep = np.isin(ids, needed, assume_unique=False)
        if not keep.any():
            # same schema as the non-empty branch (payload, not shingles) —
            # downstream tag_payload expects 'payload' even if Ray ever stops
            # dropping zero-row blocks
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "payload": pa.array([], pa.list_(pa.int64()))}
            )
        sub = b.filter(pa.array(keep))
        # batched recompute (one flat pass over the kept docs), not one
        # shingle_hashes() kernel re-entry per doc
        wh, doc_off = _word_hashes_flat(sub["text"].to_pylist())
        grams, goff = _gram_hashes_flat(wh, doc_off, stage.ngram)
        sh = [np.unique(grams[goff[i] : goff[i + 1]]) for i in range(len(sub))]
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
    """64-bit SimHash over word unigrams — vectorized across the WHOLE
    batch: one flat word-hash pass, a (words × 64) bit matrix, per-doc bit
    votes via ``np.add.reduceat`` on doc boundaries, and one packed sign
    comparison.  Bit k of the signature is the majority of bit k across the
    doc's word hashes (ties → 0).  The pure-Python independent oracle twin
    is oracle_data._py_simhash."""

    # bound the (words × 64) bit-matrix intermediate: ≤ 2^17 words per slab
    # keeps peak extra memory ≈ 100 MB per task regardless of batch size
    CHUNK_WORDS = 1 << 17

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        wh, doc_off = _word_hashes_flat(texts)
        counts = np.diff(doc_off)
        sigs = np.zeros(len(texts), dtype=np.uint64)
        nz = np.nonzero(counts > 0)[0]
        kbits = np.arange(64, dtype=np.uint64)
        i = 0
        while i < nz.size:
            # greedy doc run with <= CHUNK_WORDS words
            j = i + 1
            words = int(counts[nz[i]])
            while j < nz.size and words + counts[nz[j]] <= self.CHUNK_WORDS:
                words += int(counts[nz[j]])
                j += 1
            sel = nz[i:j]
            if sel.size == 1 and counts[sel[0]] > self.CHUNK_WORDS:
                # an OVERSIZED single doc slabs over its own words — bit
                # votes are additive across word slabs, so accumulating the
                # per-slab ones keeps peak memory bounded with identical
                # output (review finding: a 10M-word doc would otherwise
                # allocate a 2.5 GB bit matrix in one task)
                d = int(sel[0])
                w0, w1 = int(doc_off[d]), int(doc_off[d + 1])
                ones1 = np.zeros(64, dtype=np.int64)
                for s in range(w0, w1, self.CHUNK_WORDS):
                    chunk = wh[s : min(s + self.CHUNK_WORDS, w1)]
                    ones1 += (
                        (chunk[:, None] >> kbits[None, :]) & np.uint64(1)
                    ).sum(axis=0).astype(np.int64)
                votes1 = 2 * ones1 - int(counts[d])
                sigs[d] = ((votes1 > 0).astype(np.uint64) << kbits).sum()
                i = j
                continue
            w0, w1 = int(doc_off[sel[0]]), int(doc_off[sel[-1] + 1])
            bits = ((wh[w0:w1, None] >> kbits[None, :]) & np.uint64(1)).astype(np.int32)
            ones = np.add.reduceat(bits, (doc_off[sel] - w0).astype(np.int64), axis=0)
            votes = 2 * ones - counts[sel][:, None]
            sigs[sel] = ((votes > 0).astype(np.uint64) << kbits[None, :]).sum(axis=1)
            i = j
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "simhash": pa.array(sigs.view(np.int64), pa.int64()),
                # word count lets callers drop zero-word docs (their sig is
                # 0, so banding them would pair every empty doc with every
                # other) without a second word-hash pass
                "n_words": pa.array(counts, pa.int64()),
            }
        )


def _join_partitions(requested: int) -> int:
    """Cap hash-join partition count at the cluster CPU count: each hash
    aggregator is an actor holding a CPU, so num_partitions > CPUs deadlocks
    the join under the streaming executor (measured, not theoretical)."""
    total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, min(requested, total))


def simhash_dedup(
    ds, *, max_hamming: int = 3, num_partitions: int | None = None, verify_mode: str = "broadcast"
):
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found by 16-bit
    band blocking (a pair within distance 3 shares at least one of 4 bands).
    RECALL CONTRACT: complete only for max_hamming <= 3 (bands - 1); a
    larger threshold returns best-effort pairs — a pair whose differing
    bits touch all four bands never becomes a candidate.

    Distributed shape mirrors :func:`minhash_lsh_dedup` for candidate
    generation; the verify differs because signatures are 8-byte SCALARS:

    * ``verify_mode="broadcast"`` (default): the candidate docs' signatures
      are collected once (8 bytes per candidate id — the same output scale
      as the candidate-id set the pipeline already broadcasts) and the
      Hamming popcount runs as one vectorized pass over the already-driver-
      held pair table.  No join actors: at sf0.1 this removes ~8 s of
      fixed two-stage hash-join cost for identical output.
    * ``verify_mode="join"``: the original double NATIVE hash-partitioned
      ``Dataset.join`` against the signature table — the shape for the
      (adversarial) regime where even the candidate-id set outgrows driver
      memory.  Join partition count capped at CPUs (deadlock guard below).
    """
    num_partitions = scaled_parts(16, num_partitions)
    import ray.data

    stage = SimHashStage()

    def explode(b: pa.Table) -> pa.Table:
        t = stage(b)
        # drop zero-word docs before banding: they all carry signature 0
        # and would otherwise collide pairwise in every band (E empty docs
        # → E(E-1)/2 candidates), the same rule as the MinHash path
        t = t.filter(pc.greater(t["n_words"], 0))
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

    cand_tbl = _candidate_pairs_tbl(ds.map_batches(explode, batch_format="pyarrow"))
    if cand_tbl.num_rows == 0:
        return _empty_pairs("hamming", pa.int64())

    # candidate-doc filter (output-scale broadcast) cuts the join's shuffle
    # volume to candidate signatures only; sorted int64 array + np.isin —
    # not a per-row Python set probe
    need_arr = np.unique(
        np.concatenate(
            [np.asarray(cand_tbl["a"], np.int64), np.asarray(cand_tbl["b"], np.int64)]
        )
    )
    need_ref = ray.put(need_arr)

    def sigs_needed(b: pa.Table) -> pa.Table:
        # filter to candidate ids BEFORE recomputing signatures (review
        # finding: running the stage on every row paid a second corpus-scale
        # word-hash + bit-vote pass only to discard ~all of it; the minhash
        # path's shingles_needed already filtered first)
        needed = ray.get(need_ref)
        ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
        keep = np.isin(ids, needed)
        if not keep.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "simhash": pa.array([], pa.int64())}
            )
        t = stage(b.filter(pa.array(keep)))
        return t.select(["doc_id", "simhash"])

    sig_ds = ds.map_batches(sigs_needed, batch_format="pyarrow")

    if verify_mode == "broadcast":
        sig_tbl = _collect_arrow(
            sig_ds, pa.schema([("doc_id", pa.int64()), ("simhash", pa.int64())])
        )
        sids = np.asarray(sig_tbl["doc_id"], np.int64)
        svals = np.asarray(sig_tbl["simhash"], np.int64)
        order = np.argsort(sids)
        sids, svals = sids[order], svals[order].astype(np.uint64)
        a_ids = np.asarray(cand_tbl["a"], np.int64)
        b_ids = np.asarray(cand_tbl["b"], np.int64)
        xa = svals[np.searchsorted(sids, a_ids)]
        xb = svals[np.searchsorted(sids, b_ids)]
        xor = np.ascontiguousarray(xa ^ xb).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(xor, axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(a_ids[keep], pa.int64()),
                "b": pa.array(b_ids[keep], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

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


def connected_components(pairs: pa.Table) -> pa.Table:
    """Near-dup CLUSTER extraction: (a, b) pair table → one row per doc that
    appears in any pair, with ``cluster_id`` = the smallest doc_id in its
    connected component and ``keep`` = 1 for that canonical doc (the
    keep-one-per-cluster rule of training-data near-dup removal).

    Union-find with path compression over the OUTPUT-SCALE pair set — the
    same driver-residency assumption every pair-returning query here
    already makes (the pair set was collected to build ``pairs``).  At a
    scale where pairs outgrow the driver, run iterative label propagation
    as repeated repartition joins instead.
    """
    a = np.asarray(pairs["a"], np.int64)
    b = np.asarray(pairs["b"], np.int64)
    ids = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    parent = np.arange(ids.size, dtype=np.int64)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:  # path compression
            parent[i], i = root, int(parent[i])
        return root

    for i, j in zip(ai, bi):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            # union by smaller representative id keeps roots deterministic
            lo, hi = (ri, rj) if ids[ri] <= ids[rj] else (rj, ri)
            parent[hi] = lo
    roots = np.array([find(int(i)) for i in range(ids.size)], dtype=np.int64)
    cluster = ids[roots]  # root chosen by min id -> cluster_id = min id
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(cluster, pa.int64()),
            "keep": pa.array((ids == cluster).astype(np.int64), pa.int64()),
        }
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
def _block_meta_path(path: str):
    """(centroid direction, max angular radius) of one normalized staged
    block — the pruning summary for the angular triangle inequality (a
    degenerate centroid reports radius π: prunes nothing, stays exact)."""
    import pyarrow.parquet as pq_

    from .similarity import matrix_of

    M = matrix_of(pq_.read_table(path, columns=["embedding"])["embedding"])
    c = M.mean(axis=0)
    nc = float(np.linalg.norm(c))
    if not np.isfinite(nc) or nc < 1e-12:
        return path, None, float(np.pi)
    c = c / nc
    r = float(np.arccos(np.clip(M @ c, -1.0, 1.0)).max())
    return path, c, r


# Angular-prune slack (radians).  arccos has unbounded derivative at x→±1,
# so the ~1e-16 float64 rounding of a dot product amplifies to ~1e-8–1e-7
# of ANGLE for tight clusters; 1e-6 covers that error budget with margin
# while still pruning everything useful (a block pair within 1e-6 rad of
# the bound would be read anyway on any realistic layout).
_ANGULAR_SLACK = 1e-6


@ray.remote
def _block_stripe_pairs(
    t: int, files: list, meta, threshold: float, theta: float
):
    """All qualifying pairs of stripe ``t`` — the balanced per-task unit
    of the distributed fan-out: task ``t`` owns pairs ``{(i, j): j >= i,
    (i + j) % B == t}`` (each unordered pair belongs to exactly one
    stripe, every stripe holds ~B/2 pairs mixing short and long "rows" —
    a per-ROW split would give task 0 a B-matmul chain while task B-1
    does one).  ``meta`` is the broadcast (centroids, radii, valid)
    summary (``ray.put`` once, zero-copy in every task): the angular
    triangle-inequality prune for the whole stripe is ONE vectorized
    arccos; pairs are walked sorted by ``i`` so each distinct left block
    is read once.  Returns ``(pairs_table, n_pruned_in_stripe)``."""
    import pyarrow.parquet as pq_

    from .similarity import matrix_of

    cents, radii, valid = meta
    B = len(files)
    ii = np.arange(B, dtype=np.int64)
    jj = (t - ii) % B
    sel = jj >= ii
    ii, jj = ii[sel], jj[sel]  # sorted by i already
    prune = np.zeros(ii.size, dtype=bool)
    both = valid[ii] & valid[jj] & (ii != jj)
    if both.any():
        dots = np.einsum("ij,ij->i", cents[ii[both]], cents[jj[both]])
        ang = np.arccos(np.clip(dots, -1.0, 1.0))
        prune[both] = (
            ang - radii[ii[both]] - radii[jj[both]] > theta + _ANGULAR_SLACK
        )
    parts = []
    cur_i, ids_a, A = -1, None, None
    for i, j, pr in zip(ii, jj, prune):
        if pr:
            continue
        if i != cur_i:
            blk_a = pq_.read_table(files[i])
            ids_a = np.asarray(blk_a["vec_id"], np.int64)
            A = matrix_of(blk_a["embedding"])
            cur_i = i
        if j == i:
            ids_b, Bm = ids_a, A
        else:
            blk_b = pq_.read_table(files[j])
            ids_b = np.asarray(blk_b["vec_id"], np.int64)
            Bm = matrix_of(blk_b["embedding"])
        S = A @ Bm.T
        ai, bj = np.nonzero(S >= threshold)
        a, c = ids_a[ai], ids_b[bj]
        lo, hi = np.minimum(a, c), np.maximum(a, c)
        keep = lo < hi
        if keep.any():
            parts.append(
                pa.table(
                    {"a": pa.array(lo[keep], pa.int64()),
                     "b": pa.array(hi[keep], pa.int64())}
                )
            )
    empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    return (pa.concat_tables(parts) if parts else empty), int(prune.sum())


def embedding_near_dup(
    ds,
    *,
    threshold: float = 0.95,
    work_dir: str | None = None,
    stats_out: dict | None = None,
):
    """EXACT pairs (a < b) with cosine >= threshold, distributed as
    block-pair tasks over a STREAMED staging layout: normalized blocks are
    written once to shared storage (``write_parquet`` — one file per block,
    streaming with backpressure, NO ``materialize()`` pin of the corpus in
    the object store) and one Ray task per balanced STRIPE of block pairs
    (``(i+j) % B == t``, ~B/2 pairs each) prunes + joins inside the
    cluster — worst-case O((N/B)²) matmuls total but O(B) driver work,
    even per-task load, no driver-side matrix, no corpus-sized
    object-store residency.  The pair list (output-scale) is the only
    thing collected.  ``work_dir`` (or the
    ``PDFWM_RAY_SHARED_TMP`` env root) must be on storage every node can
    read — the same contract as the exactly-once sink dir; the default
    local-/tmp fallback is single-node only.

    The block-pair fan-out is PRUNED exactly by the spherical triangle
    inequality over per-block (centroid, max angular radius) summaries:
    a pair of blocks whose angular lower bound exceeds acos(threshold)
    cannot contain a qualifying vector pair and is never read (pinned by
    pytest: clustered corpora prune, pair set identical to brute force).
    Worst case (isotropic data) remains quadratic — at 100 TB prefer
    :func:`similarity.ivf_near_dup` (bucketed, approximate).  Pass
    ``stats_out={}`` to read back total/pruned block-pair counts.
    """
    import os
    import shutil
    import tempfile

    def normalize(b: pa.Table) -> pa.Table:
        from .similarity import matrix_of

        if b.num_rows == 0:
            # zero-row batch: matrix_of gives (0, 0) and the offset arange
            # below would use step 0 — emit the typed empty schema instead
            # of relying on Ray dropping zero-row blocks
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], pa.list_(pa.float64())),
                }
            )
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
    )
    # the staging dir must be visible to every node (same contract as the
    # exactly-once sink dir): pass work_dir on shared storage, or set
    # PDFWM_RAY_SHARED_TMP; the local-tmp fallback is single-node only
    shared_root = os.environ.get("PDFWM_RAY_SHARED_TMP")
    # ALWAYS stage into a fresh unique directory (under work_dir when
    # given): reusing a dir across runs would glob the previous run's
    # uuid-named block files into the block-pair tasks — every vector
    # would pair with its own stale copy at cosine 1.0
    work = tempfile.mkdtemp(prefix="graft_near_dup_", dir=work_dir or shared_root)
    try:
        norm.write_parquet(work)
        files = sorted(
            os.path.join(work, f) for f in os.listdir(work) if f.endswith(".parquet")
        )
        # Angular block pruning (exactness-preserving): for a in block i,
        # b in block j the spherical triangle inequality gives
        # ang(a,b) >= ang(c_i,c_j) - r_i - r_j, so a block pair whose
        # lower bound exceeds acos(threshold) cannot contain a qualifying
        # pair and is skipped WITHOUT being read.  Clustered corpora (the
        # realistic embedding layout once upstream sorting/bucketing
        # groups similar docs) prune most of the O(B^2) fan-out; uniform
        # random data prunes nothing and the documented quadratic bound
        # (and the ivf_near_dup scale path) stands.
        #
        # Driver work is O(B): the (centroid, radius) table is broadcast
        # ONCE (ray.put) and ONE task per STRIPE ((i+j) % B == t, a
        # balanced ~B/2-pair slice) prunes + joins inside the cluster
        # (_block_stripe_pairs) — the O(B^2) pair enumeration never runs
        # on the driver, and no task owns a triangular B-matmul chain.
        metas = ray.get([_block_meta_path.remote(f) for f in files])
        B = len(files)
        dim = next((m[1].size for m in metas if m[1] is not None), 1)
        cents = np.zeros((B, dim))
        radii = np.array([m[2] for m in metas])
        valid = np.array([m[1] is not None for m in metas])
        for k, m in enumerate(metas):
            if m[1] is not None:
                cents[k] = m[1]
        theta = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
        meta_ref = ray.put((cents, radii, valid))
        rows = ray.get(
            [
                _block_stripe_pairs.remote(t, files, meta_ref, threshold, theta)
                for t in range(B)
            ]
        )
        if stats_out is not None:
            stats_out["block_pairs_total"] = B * (B + 1) // 2
            stats_out["block_pairs_pruned"] = sum(r[1] for r in rows)
        parts = [t for t, _ in rows if t.num_rows]
    finally:
        # the unique staging subdir is transient either way; work_dir itself
        # (the shared-storage root) is left alone
        shutil.rmtree(work, ignore_errors=True)
    if not parts:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    # a pair can only appear once (block pairs are disjoint except self-pairs
    # already triangle-filtered), so a concat suffices
    return pa.concat_tables(parts)


def dedup_keep_best(ds, num_parts: int | None = None):
    """Ranked (keep-best) dedup on the CANONICAL text: rows whose
    normalized text (NFC -> lower -> whitespace-collapse -> trim, the
    ``normalize_text_batch`` canonicalization) is identical form one
    cluster; keep the variant with the LONGEST raw text (most formatting /
    casing information preserved), ties to the lowest doc_id — the
    "keep the best copy" policy of a crawl-dedup stage, vs
    :func:`exact_dedup`'s keep-lowest-id.  Returns
    ``(keep_id, keep_len, n_variants)``.

    Distribution shape: per-batch normalize + 63-bit content hash of the
    NORMALIZED text, then a per-batch PARTIAL prune (one best row + count
    per (batch, hash) — lexsort + run-boundary sweep, no per-key callback),
    so the shuffle carries int64 triples only, never text; ONE coarse
    hash-keyed partition resolves the global best per cluster the same
    vectorized way.  Hash-collision caveat identical to
    :func:`exact_dedup`; the driver oracle (GROUP BY the normalized STRING)
    doubles as the collision check.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    from .text import normalize_text_batch

    def partials(b: pa.Table) -> pa.Table:
        norm = normalize_text_batch(b)
        h = _text_hashes(norm["norm_text"].to_pylist())
        ids = np.asarray(b["doc_id"], np.int64)
        lens = np.asarray(b["n_chars"], np.int64)
        # batch-local best per hash: sort by (hash, -len, id); run starts win
        order = np.lexsort((ids, -lens, h))
        h_s, id_s, len_s = h[order], ids[order], lens[order]
        first = np.empty(h_s.size, bool)
        if h_s.size:
            first[0] = True
            first[1:] = h_s[1:] != h_s[:-1]
        starts = np.nonzero(first)[0]
        cnt = np.diff(np.append(starts, h_s.size))
        hh = h_s[starts]
        return pa.table(
            {
                "h": pa.array(hh, pa.int64()),
                "keep_id": pa.array(id_s[starts], pa.int64()),
                "keep_len": pa.array(len_s[starts], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "pk": pa.array(hh % num_parts, pa.int64()),
            }
        )

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "keep_id": pd.Series(dtype=np.int64),
                    "keep_len": pd.Series(dtype=np.int64),
                    "n_variants": pd.Series(dtype=np.int64),
                }
            )
        h = g["h"].to_numpy()
        ids = g["keep_id"].to_numpy()
        lens = g["keep_len"].to_numpy()
        cnt = g["cnt"].to_numpy()
        order = np.lexsort((ids, -lens, h))
        h_s = h[order]
        first = np.empty(h_s.size, bool)
        first[0] = True
        first[1:] = h_s[1:] != h_s[:-1]
        starts = np.nonzero(first)[0]
        gid = np.cumsum(first) - 1
        n_var = np.bincount(gid, weights=cnt[order]).astype(np.int64)
        return pd.DataFrame(
            {
                "keep_id": ids[order][starts],
                "keep_len": lens[order][starts],
                "n_variants": n_var,
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(collapse, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Exact set-similarity join (PPJoin-style prefix filter)
# ---------------------------------------------------------------------------


def _distinct_gram_sets(b: pa.Table, ngram: int) -> list[np.ndarray]:
    """Per-doc SORTED distinct word-n-gram hash arrays (ngram=1 → word
    sets); one flat kernel pass, same hash spec as the MinHash shingles."""
    wh, doc_off = _word_hashes_flat(b["text"].to_pylist())
    grams, goff = _gram_hashes_flat(wh, doc_off, ngram)
    return [np.unique(grams[goff[i] : goff[i + 1]]) for i in range(b.num_rows)]


def gram_df_table(ds, ngram: int = 3, num_parts: int | None = None) -> pa.Table:
    """Document frequency of every distinct word n-gram —
    (word_hash, df) int64 rows.

    Per-batch partials count each gram ONCE per doc, a coarse hash-
    partitioned groupby sums them vectorized.  The result is vocabulary-
    scale: at the bench corpora it collects to the driver for a broadcast
    lookup; at open-web scale the same table stays a Dataset and joins back
    to the prefix pass hash-partitioned instead (the tradeoff is noted at
    the call site).
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        sets = _distinct_gram_sets(b, ngram)
        flat = (
            np.concatenate(sets) if sets else np.zeros(0, np.int64)
        )
        u, c = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "word_hash": pa.array(u, pa.int64()),
                "df": pa.array(c.astype(np.int64), pa.int64()),
                "pk": pa.array(u % num_parts, pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("word_hash", sort=True)["df"].sum()
        return pd.DataFrame(
            {"word_hash": s.index.to_numpy(np.int64), "df": s.to_numpy(np.int64)}
        )

    return _collect_arrow(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(fold, batch_format="pandas"),
        pa.schema([("word_hash", pa.int64()), ("df", pa.int64())]),
    )


def _prefix_candidate_pairs(rows_ds, threshold: float, num_parts: int | None = None) -> pa.Table:
    """(band_hash=token, doc_id, pos, size) prefix-index rows → the distinct
    candidate-pair table, with PPJoin's LENGTH and POSITIONAL filters
    applied per bucket (both LOSSLESS):

    * length: J(x,y) ≥ t ⇒ |y| ≥ t·|x| — kills mismatched-size pairs;
    * positional: a token at prefix positions (px, py) bounds the overlap
      by ``1 + min(|x|−px−1, |y|−py−1)``; the pair needs overlap
      ``α = ⌈t/(1+t)·(|x|+|y|)⌉``, and for a TRUE pair its FIRST shared
      prefix token satisfies the bound, so keeping a pair if ANY shared
      bucket passes loses nothing.

    Same coarse-partition + lexsort-sweep shape as :func:`_distinct_pairs`
    (buckets salted into ``num_parts`` partitions; per-bucket work is
    vectorized triu pair expansion + three filter masks); the surviving
    pair set collects at output scale and dedups with one driver lexsort.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def add_pk(b: pa.Table) -> pa.Table:
        pk = np.asarray(b["band_hash"], np.int64) % num_parts
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        h = g["band_hash"].to_numpy().astype(np.int64)
        d = g["doc_id"].to_numpy().astype(np.int64)
        p = g["pos"].to_numpy().astype(np.int64)
        m = g["size"].to_numpy().astype(np.int64)
        order = np.lexsort((d, h))
        h, d, p, m = h[order], d[order], p[order], m[order]
        starts = np.nonzero(np.concatenate(([True], h[1:] != h[:-1])))[0]
        ends = np.append(starts[1:], h.size)
        out_a, out_b = [], []
        for s0, e0 in zip(starts, ends):
            k = e0 - s0
            if k < 2:
                continue
            ai, bi = np.triu_indices(k, k=1)
            ai += s0
            bi += s0
            keep = d[ai] != d[bi]
            ai, bi = ai[keep], bi[keep]
            if ai.size == 0:
                continue
            mx, my = m[ai], m[bi]
            # length filter: min ≥ t·max
            keep = np.minimum(mx, my) >= threshold * np.maximum(mx, my)
            ai, bi = ai[keep], bi[keep]
            if ai.size == 0:
                continue
            mx, my = m[ai], m[bi]
            alpha = np.ceil(threshold / (1.0 + threshold) * (mx + my))
            ub = 1 + np.minimum(mx - p[ai] - 1, my - p[bi] - 1)
            keep = ub >= alpha
            ai, bi = ai[keep], bi[keep]
            if ai.size == 0:
                continue
            a_, b_ = d[ai], d[bi]
            lo = np.minimum(a_, b_)
            hi = np.maximum(a_, b_)
            out_a.append(lo)
            out_b.append(hi)
        if not out_a:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
            )
        pairs = np.unique(
            np.stack([np.concatenate(out_a), np.concatenate(out_b)], axis=1), axis=0
        )
        return pd.DataFrame({"a": pairs[:, 0], "b": pairs[:, 1]})

    raw = _collect_arrow(
        rows_ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(emit, batch_format="pandas"),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )
    if raw.num_rows == 0:
        return raw
    ab = np.stack(
        [np.asarray(raw["a"], np.int64), np.asarray(raw["b"], np.int64)], axis=1
    )
    ab = np.unique(ab, axis=0)
    return pa.table({"a": pa.array(ab[:, 0], pa.int64()), "b": pa.array(ab[:, 1], pa.int64())})


def jaccard_prefix_join(ds, *, ngram: int = 3, threshold: float = 0.5, num_parts: int | None = None) -> pa.Table:
    """EXACT word-set Jaccard self-join via the PPJoin prefix filter
    (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    Detection", WWW 2008) — the no-false-negative sibling of MinHash-LSH:

    Operates on distinct word-n-gram (shingle) sets — the EXACT twin of
    :func:`minhash_lsh_dedup`'s banded approximation at the same ngram and
    threshold, guaranteed to miss nothing.

    1. one pass computes global gram document frequencies (broadcast as
       two sorted arrays; at web-scale vocabularies the df table joins
       back hash-partitioned instead of broadcasting);
    2. each doc's distinct words sort by (df asc, hash asc) — the rarest
       words first — and only the PREFIX (first ``m − ⌈t·m⌉ + 1`` words)
       is emitted as (token, doc_id) index rows.  Two sets with
       J(x,y) ≥ t MUST share a prefix token (pigeonhole on the overlap
       bound ⌈t/(1+t)·(m_x+m_y)⌉), so bucketing by prefix token is a
       LOSSLESS candidate generator, and rare-first ordering keeps the
       buckets small;
    3. the bucket → distinct-pair machinery and the repartition-join
       exact-Jaccard verify are shared with the LSH path
       (:func:`_distinct_pairs`, :func:`_verify_pairs_distributed`).

    Returns (a, b, jacc) with a < b and jacc ≥ threshold — equal to the
    naive all-pairs twin (modulo 63-bit word-hash collisions, the corpus
    dedup caveat documented on :func:`exact_dedup`).
    """
    num_parts = scaled_parts(64, num_parts)
    df_tbl = gram_df_table(ds, ngram, num_parts)
    vh = np.asarray(df_tbl["word_hash"], np.int64)  # sorted per fold
    vdf = np.asarray(df_tbl["df"], np.int64)
    order = np.argsort(vh, kind="stable")  # partitions interleave: re-sort
    vh, vdf = vh[order], vdf[order]
    vref = ray.put((vh, vdf))

    def prefix_rows(b: pa.Table) -> pa.Table:
        vh_, vdf_ = ray.get(vref)
        sets = _distinct_gram_sets(b, ngram)
        ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
        out_tok, out_doc, out_pos, out_size = [], [], [], []
        for i, s in enumerate(sets):
            m = s.size
            if m == 0:
                continue
            L = m - int(np.ceil(threshold * m)) + 1
            dfs = vdf_[np.searchsorted(vh_, s)]
            sel = np.lexsort((s, dfs))[:L]
            out_tok.append(s[sel])
            out_doc.append(np.full(L, ids[i], np.int64))
            out_pos.append(np.arange(L, dtype=np.int64))
            out_size.append(np.full(L, m, np.int64))
        tok = np.concatenate(out_tok) if out_tok else np.zeros(0, np.int64)
        doc = np.concatenate(out_doc) if out_doc else np.zeros(0, np.int64)
        pos = np.concatenate(out_pos) if out_pos else np.zeros(0, np.int64)
        size = np.concatenate(out_size) if out_size else np.zeros(0, np.int64)
        return pa.table(
            {
                "band_hash": pa.array(tok, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "size": pa.array(size, pa.int64()),
            }
        )

    cand_tbl = _prefix_candidate_pairs(
        ds.map_batches(prefix_rows, batch_format="pyarrow"), threshold, num_parts
    )
    if cand_tbl.num_rows == 0:
        return _empty_pairs("jacc", pa.float64())

    need_arr = np.unique(
        np.concatenate(
            [np.asarray(cand_tbl["a"], np.int64), np.asarray(cand_tbl["b"], np.int64)]
        )
    )
    need_ref = ray.put(need_arr)

    def words_needed(b: pa.Table) -> pa.Table:
        needed = ray.get(need_ref)
        ids = np.asarray(b["doc_id"].combine_chunks().cast(pa.int64()))
        keep = np.isin(ids, needed, assume_unique=False)
        if not keep.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "payload": pa.array([], pa.list_(pa.int64()))}
            )
        sub = b.filter(pa.array(keep))
        sets = _distinct_gram_sets(sub, ngram)
        return pa.table(
            {
                "doc_id": sub["doc_id"].cast(pa.int64()),
                "payload": pa.array([s.tolist() for s in sets], pa.list_(pa.int64())),
            }
        )

    w_ds = ds.map_batches(words_needed, batch_format="pyarrow")

    def pair_jaccard(x: np.ndarray, y: np.ndarray):
        j = jaccard(np.asarray(x, np.int64), np.asarray(y, np.int64))
        return j if j >= threshold else None

    return _verify_pairs_distributed(cand_tbl, w_ds, pair_jaccard, "jacc", np.float64)
