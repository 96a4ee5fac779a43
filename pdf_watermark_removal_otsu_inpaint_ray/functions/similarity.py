"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — per-batch float64 matmul against a
broadcast query matrix (``ray.put`` once, fetched per task), per-batch
top-k candidates merged on the driver (k × num_blocks rows — tiny).  No
global sort/shuffle.

Scale path: :class:`IvfIndex` — deterministic coarse centroids, per-batch
partition assignment, query probes the ``n_probe`` nearest partitions only.
"""

from __future__ import annotations

from ..config import scaled_parts

import numpy as np
import pyarrow as pa

import ray


def matrix_of(col: pa.ChunkedArray | pa.ListArray) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column, via the flat buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.asarray(col.offsets, dtype=np.int64)
    vals = np.asarray(col.values, dtype=np.float64)
    lens = np.diff(off)
    dim = int(lens[0]) if lens.size else 0
    if (lens != dim).any():  # real check, not assert: -O must not skip it
        raise ValueError("ragged embedding column (row lengths differ / null rows)")
    # explicit row count: reshape(-1, 0) raises an opaque ValueError for a
    # zero-row / all-empty-list column where an empty (n, 0) matrix is the
    # correct (and matmul-safe) answer
    return vals[off[0] : off[-1]].reshape(lens.size, dim)


def cosine_topk(ds, query: np.ndarray, k: int = 10) -> pa.Table:
    """Brute-force cosine top-k: returns (vec_id, rank) sorted by similarity
    desc, ties broken by vec_id asc (deterministic)."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-30)
    qref = ray.put(q)

    def batch_topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # matrix_of gives (0, 0) here and (0,0) @ q raises — don't rely
            # on Ray dropping zero-row blocks (IvfIndex.search's prune
            # filter routinely produces them)
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        qv = ray.get(qref)
        M = matrix_of(b["embedding"])
        sims = (M @ qv) / np.maximum(np.linalg.norm(M, axis=1), 1e-30)
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        take = min(k, sims.size)
        # deterministic per-batch selection: exact sim TIES at the k-th
        # value must keep the lowest vec_ids (argpartition keeps an
        # arbitrary tied subset, which can drop the id the global
        # (sim desc, vec_id asc) order would rank — block-layout-dependent)
        part = np.lexsort((ids, -sims))[:take]
        return pa.table(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "sim": pa.array(sims[part], pa.float64()),
            }
        )

    cands = ds.select_columns(["vec_id", "embedding"]).map_batches(
        batch_topk, batch_format="pyarrow"
    ).take_all()
    ids = np.array([r["vec_id"] for r in cands], dtype=np.int64)
    sims = np.array([r["sim"] for r in cands], dtype=np.float64)
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
        }
    )


class IvfIndex:
    """Deterministic IVF: centroids = first ``n_list`` vectors (by vec_id),
    refined by a few Lloyd iterations over a driver-held sample.

    ``build`` assigns every row to its nearest centroid (a partition id
    column usable as a Parquet partition key); ``search`` probes the
    ``n_probe`` nearest partitions only — the 100 TB path where brute force
    would read every block.
    """

    def __init__(self, n_list: int = 16, n_probe: int = 4, iters: int = 3):
        if n_probe > n_list:
            raise ValueError(f"n_probe ({n_probe}) must be <= n_list ({n_list})")
        self.n_list, self.n_probe, self.iters = n_list, n_probe, iters
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IvfIndex":
        """Train coarse centroids on a sample.  The sample is ROW-NORMALIZED
        here (review finding: every consumer assigns by cosine on normalized
        vectors, so Lloyd must rank by the same metric — a raw dot product
        would let high-norm vectors skew cluster assignment and centroid
        means).  Idempotent for callers that already normalize."""
        S = np.asarray(sample, dtype=np.float64)
        S = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-30)
        C = S[: self.n_list].copy()
        for _ in range(self.iters):
            assign = np.argmax(S @ C.T, axis=1)
            for j in range(C.shape[0]):
                m = assign == j
                if m.any():
                    v = S[m].mean(axis=0)
                    C[j] = v / max(np.linalg.norm(v), 1e-30)
        self.centroids = C
        return self

    def add_partition_column(self, ds):
        cref = ray.put(self.centroids)

        def assign(b: pa.Table) -> pa.Table:
            C = ray.get(cref)
            M = matrix_of(b["embedding"])
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
            part = np.argmax(M @ C.T, axis=1).astype(np.int32)
            return b.append_column("ivf_part", pa.array(part, pa.int32()))

        return ds.map_batches(assign, batch_format="pyarrow")

    def search(self, ds_with_parts, query: np.ndarray, k: int = 10) -> pa.Table:
        q = np.asarray(query, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-30)
        probes = np.argsort(-(self.centroids @ q))[: self.n_probe]
        probe_set = set(int(p) for p in probes)
        pref = ray.put(probe_set)

        def prune(b: pa.Table) -> pa.Table:
            ps = ray.get(pref)
            keep = np.isin(np.asarray(b["ivf_part"]), list(ps))
            return b.filter(pa.array(keep))

        pruned = ds_with_parts.map_batches(prune, batch_format="pyarrow")
        return cosine_topk(pruned, q, k)

    # -- partition-pruned storage path (the 100 TB shape) -----------------

    def write_partitioned(self, ds, path: str) -> str:
        """Materialize the index layout: ``ivf_part`` becomes a Parquet
        partition KEY (``path/ivf_part=K/``), so a probe reads only its
        partitions' files from storage — the scan itself is pruned, not
        just filtered after a full read."""
        self.add_partition_column(ds).write_parquet(path, partition_cols=["ivf_part"])
        return path

    def probe_paths(self, path: str, query: np.ndarray) -> list[str]:
        """Parquet FILES of the probed partitions (ray.data.read_parquet
        handles a multi-path list as files, not directories)."""
        import os

        q = np.asarray(query, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-30)
        probes = np.argsort(-(self.centroids @ q))[: self.n_probe]
        files: list[str] = []
        for p in probes:
            d = os.path.join(path, f"ivf_part={int(p)}")
            if os.path.isdir(d):
                files.extend(
                    sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))
                )
        return files

    def search_partitioned(self, path: str, query: np.ndarray, k: int = 10) -> pa.Table:
        """ANN search reading ONLY the probed partition directories."""
        import ray.data

        dirs = self.probe_paths(path, query)
        if not dirs:
            return pa.table({"vec_id": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())})
        ds = ray.data.read_parquet(dirs, columns=["vec_id", "embedding"])
        return cosine_topk(ds, np.asarray(query, dtype=np.float64), k)


def ivf_near_dup(
    ds,
    sample: np.ndarray,
    *,
    threshold: float = 0.5,
    n_list: int = 8,
    n_probe: int = 2,
    num_parts: int | None = None,
) -> pa.Table:
    """IVF-bucketed embedding near-dup — the scale path for
    ``embedding_near_dup``: each vector joins its ``n_probe`` nearest
    coarse partitions (multi-probe), pairs are found by within-partition
    matmuls in a distributed ``groupby(part)``, and cross-partition
    duplicates dedup in a coarse second groupby.  Recall is approximate by
    construction (pairs split across non-shared partitions are missed);
    the exact all-pairs twin is ``dedup.embedding_near_dup``.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    import ray.data  # noqa: F401  (groupby path)

    idx = IvfIndex(n_list=n_list, n_probe=n_probe).fit(sample)
    cref = ray.put(idx.centroids)

    def assign_multi(b: pa.Table) -> pa.Table:
        C = ray.get(cref)
        M = matrix_of(b["embedding"])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        top = np.argsort(-(Mn @ C.T), axis=1)[:, :n_probe]
        n = len(b)
        ids = np.asarray(b["vec_id"], np.int64)
        emb = b["embedding"]
        out_id = np.repeat(ids, n_probe)
        out_part = top.reshape(-1).astype(np.int64)
        idx_rep = np.repeat(np.arange(n), n_probe)
        return pa.table(
            {
                "part": pa.array(out_part, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "embedding": emb.take(pa.array(idx_rep)),
            }
        )

    def within(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        M = np.array([np.asarray(e, np.float64) for e in g["embedding"]], dtype=np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        S = M @ M.T
        ai, bj = np.nonzero(S >= threshold)
        a, c = ids[ai], ids[bj]
        keep = a < c
        if not keep.any():
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        pairs = np.unique(np.stack([a[keep], c[keep]], axis=1), axis=0)
        return pd.DataFrame({"a": pairs[:, 0], "b": pairs[:, 1]})

    from .dedup import _collect_arrow

    pairs_ds = (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(assign_multi, batch_format="pyarrow")
        .groupby("part")
        .map_groups(within, batch_format="pandas")
    )

    def add_pk(b: pa.Table) -> pa.Table:
        pk = (np.asarray(b["a"], np.int64) * 1_000_003 + np.asarray(b["b"], np.int64)) % num_parts
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(
            np.stack([g["a"].to_numpy().astype(np.int64), g["b"].to_numpy().astype(np.int64)], axis=1),
            axis=0,
        )
        return pd.DataFrame({"a": pairs[:, 0], "b": pairs[:, 1]})

    out = (
        pairs_ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(dedup, batch_format="pandas")
    )
    return _collect_arrow(out, pa.schema([("a", pa.int64()), ("b", pa.int64())]))


def centroid_partials(batch: pa.Table, *, group: str = "label", scale: int = 10_000) -> pa.Table:
    """Per-batch PARTIALS for an integer-exact per-group vector centroid:
    (group, dim, sum_c, n_vecs) where sum_c sums ``floor(x*scale + 0.5)``
    int64 components — float-order-independent, so the distributed sum is
    bit-equal to any serial oracle.  Combiner-first: the shuffle carries
    ``groups-in-batch × dim`` int64 rows, never embedding-scale data.
    The mean is ``sum_c / (n_vecs * scale)`` — left to the caller so the
    engine output stays integer-exact for value-hash comparison."""
    m = matrix_of(batch["embedding"])
    q = np.floor(m * scale + 0.5).astype(np.int64)
    keys = np.asarray(batch[group], np.int64)
    if keys.size == 0:
        return pa.table(
            {
                group: pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "sum_c": pa.array([], pa.int64()),
                "n_vecs": pa.array([], pa.int64()),
            }
        )
    uniq, codes = np.unique(keys, return_inverse=True)
    order = np.argsort(codes, kind="stable")
    starts = np.searchsorted(codes[order], np.arange(uniq.size))
    sums = np.add.reduceat(q[order], starts, axis=0)  # (n_groups, dim)
    counts = np.bincount(codes, minlength=uniq.size).astype(np.int64)
    dim = q.shape[1]
    return pa.table(
        {
            group: pa.array(np.repeat(uniq, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), uniq.size), pa.int64()),
            "sum_c": pa.array(sums.reshape(-1), pa.int64()),
            "n_vecs": pa.array(np.repeat(counts, dim), pa.int64()),
        }
    )


def group_centroids(ds, *, group: str = "label", scale: int = 10_000):
    """Distributed per-group centroid sums: partials → multi-key groupby
    sum.  Returns (group, dim, sum_c, n_vecs), all int64."""
    from functools import partial as _partial

    agg = (
        ds.map_batches(
            _partial(centroid_partials, group=group, scale=scale),
            batch_format="pyarrow",
        )
        .groupby([group, "dim"])
        .sum(["sum_c", "n_vecs"])
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                group: b[group].cast(pa.int64()),
                "dim": b["dim"].cast(pa.int64()),
                "sum_c": b["sum(sum_c)"].cast(pa.int64()),
                "n_vecs": b["sum(n_vecs)"].cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def _kmeans_quantize(m: np.ndarray, x_scale: int) -> np.ndarray:
    """floor(x*scale + 0.5) int64 — the repo-wide quantization convention
    (same as centroid_partials), making every k-means sum order-free exact."""
    return np.floor(m.astype(np.float64) * x_scale + 0.5).astype(np.int64)


def _kmeans_assign(Xq: np.ndarray, Cq: np.ndarray) -> np.ndarray:
    """Exact integer Euclidean assignment: argmin_j ||100*x - c_j||² via
    ||c||² - 2(100x)·c (the ||x||² term is constant per row).  All int64 —
    bit-identical on any machine, any batch boundary.  Ties break to the
    LOWEST cluster id (np.argmin first-match)."""
    S = (100 * Xq) @ Cq.T
    d2 = np.einsum("ij,ij->i", Cq, Cq)  # int64 exact
    return np.argmin(d2[None, :] - 2 * S, axis=1)


def kmeans_centroids(ds, *, k: int = 8, iters: int = 4, x_scale: int = 10_000) -> np.ndarray:
    """Lloyd iterations only — returns the final (k, d) int64 centroid
    table at scale 1e6 (see :func:`kmeans_embeddings` for the full
    contract).  Exposed so compositions (SemDeDup) can reuse the trained
    centroids without a second training run."""
    import ray

    # --- deterministic init: k smallest vec_ids (per-batch partial trim,
    # driver merges k×blocks candidate rows — k-scale, never corpus-scale)
    def init_part(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["vec_id"].combine_chunks().cast(pa.int64()))
        sel = np.argsort(ids, kind="stable")[:k]
        # select the k candidate rows BEFORE quantizing: the init pass only
        # needs k rows' float work per batch, not the whole batch's
        Xq = _kmeans_quantize(matrix_of(b["embedding"])[sel], x_scale)
        return pa.table(
            {
                "vec_id": pa.array(ids[sel], pa.int64()),
                "xq": pa.array([r.tolist() for r in Xq], pa.list_(pa.int64())),
            }
        )

    cand = ds.map_batches(init_part, batch_format="pyarrow").to_pandas()
    if len(cand) < k:
        raise ValueError(f"k-means needs >= k={k} vectors, got {len(cand)}")
    cand = cand.sort_values("vec_id", kind="stable").head(k)
    Cq = np.array([np.asarray(x, np.int64) for x in cand["xq"]], np.int64) * 100
    d = Cq.shape[1]

    def partials_fn(cref):
        def partials(b: pa.Table) -> pa.Table:
            C = ray.get(cref)
            Xq = _kmeans_quantize(matrix_of(b["embedding"]), x_scale)
            a = _kmeans_assign(Xq, C)
            order = np.argsort(a, kind="stable")
            a_s = a[order]
            acc = np.zeros((k, d), np.int64)
            if order.size:
                starts = np.nonzero(
                    np.concatenate(([True], a_s[1:] != a_s[:-1]))
                )[0]
                acc[a_s[starts]] = np.add.reduceat(Xq[order], starts, axis=0)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
                    "cnt": pa.array(cnt, pa.int64()),
                    "sums": pa.array([r.tolist() for r in acc], pa.list_(pa.int64())),
                }
            )

        return partials

    for _ in range(iters):
        cref = ray.put(Cq)
        sums = np.zeros((k, d), np.int64)
        cnt = np.zeros(k, np.int64)
        part_ds = ds.map_batches(partials_fn(cref), batch_format="pyarrow")
        for pb in part_ds.iter_batches(batch_format="pyarrow"):
            # one iter batch may CONCATENATE several partial tables, so a
            # cluster id repeats — np.add.at accumulates duplicates where
            # `cnt[cl] +=` would keep only the last occurrence
            cl = np.asarray(pb["cluster"], np.int64)
            np.add.at(cnt, cl, np.asarray(pb["cnt"], np.int64))
            col = pb["sums"].combine_chunks()
            mat = np.asarray(col.flatten(), np.int64).reshape(-1, d)
            np.add.at(sums, cl, mat)
        nz = cnt > 0
        # centroid at scale 1e6: floor(sum*100/cnt + 0.5); empty keeps old
        Cq = Cq.copy()
        Cq[nz] = np.floor(
            sums[nz].astype(np.float64) * 100.0 / cnt[nz, None] + 0.5
        ).astype(np.int64)

    return Cq


def kmeans_embeddings(ds, *, k: int = 8, iters: int = 4, x_scale: int = 10_000):
    """Distributed Lloyd k-means over an embedding column — the clustering
    primitive behind SemDeDup-style curation and IVF index builds, run over
    the FULL corpus (not a driver sample, unlike IvfIndex.fit).

    Integer-exact and deterministic: embeddings quantize once per pass to
    int64 (``floor(x*1e4 + 0.5)``), centroids live at scale 1e6 as int64,
    assignment is exact integer Euclidean argmin, and per-cluster sums are
    order-free int64 — so the distributed result is bit-identical to the
    single-process golden twin regardless of batch boundaries or cluster
    size (the same trick as ``centroid_partials`` / the learned detector).

    Shape per Lloyd round (the 100-TB path):
    * centroids broadcast ONCE via ``ray.put`` (k×d int64 — tiny);
    * one streaming ``map_batches`` pass emits k partial rows per batch
      (cluster, count, component sums) — combiner-first, the shuffle-free
      analog of a groupby;
    * the driver folds k × n_blocks partial rows (bounded by k, never by
      corpus size) into the next centroid table.

    Init: the k vectors with the SMALLEST vec_ids (deterministic, no RNG);
    an empty cluster keeps its previous centroid.  Returns a Dataset of
    ``(vec_id, cluster)`` int64 rows from a final assignment pass.
    """
    import ray

    Cq = kmeans_centroids(ds, k=k, iters=iters, x_scale=x_scale)
    cref = ray.put(Cq)

    def assign_final(b: pa.Table) -> pa.Table:
        C = ray.get(cref)
        Xq = _kmeans_quantize(matrix_of(b["embedding"]), x_scale)
        a = _kmeans_assign(Xq, C)
        return pa.table(
            {
                "vec_id": b["vec_id"].cast(pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(assign_final, batch_format="pyarrow")


def semdedup(ds, *, k: int = 8, iters: int = 4, threshold: float = 0.95,
             x_scale: int = 10_000):
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): cluster the corpus
    embeddings with full-corpus k-means, then mark within-cluster semantic
    near-duplicates by cosine similarity — only intra-cluster pairs are
    ever compared, so the quadratic work is bounded per cluster and fully
    distributed through one ``groupby(cluster)``.

    Deviation from the paper (documented): the kept representative is the
    LOWEST vec_id of each near-dup neighborhood (deterministic,
    hash-checkable) rather than the farthest-from-centroid member; a row
    is a duplicate iff some SMALLER-id vector in its cluster has cosine
    >= threshold.  Returns ``(vec_id, cluster, is_dup)``.

    Hot-cluster caveat: one cluster holds its members' full matmul in one
    task — raise ``k`` (or recurse on oversized clusters) when the
    embedding distribution collapses into few clusters at scale.
    """
    import pandas as pd

    import ray

    cref = ray.put(kmeans_centroids(ds, k=k, iters=iters, x_scale=x_scale))

    def assign_with_payload(b: pa.Table) -> pa.Table:
        C = ray.get(cref)
        Xq = _kmeans_quantize(matrix_of(b["embedding"]), x_scale)
        a = _kmeans_assign(Xq, C)
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "vec_id": b["vec_id"].cast(pa.int64()),
                "embedding": b["embedding"],
            }
        )

    def within(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")  # ascending id — dup rule
        ids = ids[order]
        M = np.array(
            [np.asarray(e, np.float64) for e in g["embedding"].to_numpy()[order]]
        )
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        S = M @ M.T
        dup = np.tril(S >= threshold, -1).any(axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": np.full(ids.size, int(g["cluster"].iloc[0]), np.int64),
                "is_dup": dup.astype(np.int64),
            }
        )

    return (
        ds.map_batches(assign_with_payload, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(within, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Distributed PCA projection (dimensionality reduction over embeddings)
# ---------------------------------------------------------------------------


def pca_moments(ds, *, x_scale: int = 10_000):
    """EXACT integer second-moment sweep: one streaming pass emits per-block
    partials (n, Σxq, XqᵀXq flattened), one combine stage merges blocks of
    partial rows (so the driver receives ≤ ⌈blocks/COMBINE⌉ rows, the
    tree-merge shape of stages/detect.py), and the driver adds int64s.

    Quantization floor(x·x_scale+0.5) makes every sum order- and
    layout-independent (integer addition is associative); magnitudes stay
    int64-safe through ~1e9 rows at |x|≤1 — past that the partials would
    carry split hi/lo int64 pairs.  Returns (n, s[d], G[d,d]) int64."""
    COMBINE = 64

    def partials(b: pa.Table) -> pa.Table:
        M = matrix_of(b["embedding"])
        Xq = np.floor(M * x_scale + 0.5).astype(np.int64)
        d = Xq.shape[1]
        s = Xq.sum(axis=0)
        G = Xq.T @ Xq
        return pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "s": pa.array([s.tolist()], pa.list_(pa.int64())),
                "g": pa.array([G.reshape(d * d).tolist()], pa.list_(pa.int64())),
            }
        )

    def merge(b: pa.Table) -> pa.Table:
        n = int(np.asarray(b["n"], np.int64).sum())
        sc = b["s"].combine_chunks()
        gc = b["g"].combine_chunks()
        d = len(sc[0]) if len(sc) else 0
        s = np.asarray(sc.values, np.int64).reshape(len(sc), d).sum(axis=0)
        G = np.asarray(gc.values, np.int64).reshape(len(gc), d * d).sum(axis=0)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s.tolist()], pa.list_(pa.int64())),
                "g": pa.array([G.tolist()], pa.list_(pa.int64())),
            }
        )

    rows = (
        ds.select_columns(["embedding"])
        .map_batches(partials, batch_format="pyarrow")
        .map_batches(merge, batch_format="pyarrow", batch_size=COMBINE)
        .take_all()
    )
    n = sum(int(r["n"]) for r in rows)
    s = np.sum([np.asarray(r["s"], np.int64) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"], np.int64) for r in rows], axis=0)
    d = s.size
    return n, s, g.reshape(d, d)


def pca_components(n: int, s: np.ndarray, G: np.ndarray, *, r: int,
                   w_scale: int = 1_000_000) -> np.ndarray:
    """Top-r principal directions from the exact integer moments, quantized
    to int64 at ``w_scale``.  The n-scaled scatter  A = n·G − s·sᵀ  (int64,
    exact) feeds one driver-side ``np.linalg.eigh`` — d×d work, never
    row-scale.  Deterministic sign: each eigenvector is flipped so its
    largest-|entry| component (first index on ties) is positive, making the
    output a pure function of A."""
    A = (n * G - np.outer(s, s)).astype(np.float64)
    _, vecs = np.linalg.eigh(A)
    W = vecs[:, ::-1][:, :r]  # eigh is ascending → top-r
    flip = W[np.argmax(np.abs(W), axis=0), np.arange(W.shape[1])] < 0
    W = W * np.where(flip, -1.0, 1.0)
    return np.floor(W * w_scale + 0.5).astype(np.int64)


def pca_project(ds, *, r: int = 4, x_scale: int = 10_000,
                w_scale: int = 1_000_000):
    """Distributed PCA projection: center and project every embedding onto
    the top-r principal components — ENTIRELY in int64 so the result is
    bit-exact for any block layout.

    Two passes: (1) :func:`pca_moments` exact integer moment sweep;
    (2) stateless ``map_batches`` computing  yq = (n·xq − s) @ Wq  per row
    (centering scaled by n avoids a float mean).  The (d·r + d + 1)-int
    projection state is broadcast once via ``ray.put``.  Output:
    (vec_id, pc0..pc{r-1}) int64 at combined scale n·x_scale·w_scale.

    The training-data analog of the reference's downsample-for-classify
    step (document_classifier.py:84-89): a cheap low-d representation for
    downstream clustering/dedup.  100-TB shape: pass 1 ships ≤ one tiny
    row per block (tree-combined), pass 2 is embarrassingly parallel."""
    n, s, G = pca_moments(ds, x_scale=x_scale)
    Wq = pca_components(n, s, G, r=r, w_scale=w_scale)
    state = ray.put((n, s, Wq))

    def project(b: pa.Table) -> pa.Table:
        n_, s_, W_ = ray.get(state)
        M = matrix_of(b["embedding"])
        Xq = np.floor(M * x_scale + 0.5).astype(np.int64)
        Y = (n_ * Xq - s_[None, :]) @ W_
        cols = {"vec_id": b["vec_id"].cast(pa.int64())}
        for j in range(W_.shape[1]):
            cols[f"pc{j}"] = pa.array(Y[:, j], pa.int64())
        return pa.table(cols)

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        project, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed ANN codes + ADC search
# ---------------------------------------------------------------------------


class PqIndex:
    """Product-quantization ANN (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): split the d-dim embedding into
    ``m`` subspaces, k-means each subspace to ``k_codes`` centroids on a
    driver-held sample, then ENCODE every vector as m small codes (uint8)
    — a 4-byte-per-dim float column becomes ~m bytes per row.  Search is
    asymmetric distance computation (ADC): one (m × k_codes) lookup table
    per query, then a vectorized gather-sum over the code columns.

    Engine analog of the reference's downsample-before-classify idea
    (document_classifier.py:84-89) applied to retrieval: pay full precision
    once at encode time, stream the compressed codes afterwards.

    Determinism (the repo-wide integer convention, cf. ``_kmeans_assign``):
    vectors quantize to int64 at ``x_scale``; codebook entries live at
    scale ``100·x_scale`` as int64; assignment and ADC distances are exact
    integer arithmetic — the distributed result is bit-identical to the
    single-process golden twin for any batch layout.  Ties break to the
    lowest code / lowest vec_id.

    100-TB shape: fit is a driver-side Lloyd loop over a bounded sample
    (codebooks are m·k_codes·(d/m) ints — tiny, broadcast once via
    ``ray.put``); encode is one embarrassingly-parallel ``map_batches``
    pass whose OUTPUT is ~16× smaller than its input (this is the point:
    the search corpus that must be rescanned per query batch is the
    compressed one); search is one ``map_batches`` over codes emitting k
    candidate rows per block, driver merges k×blocks rows (k-scale).
    """

    def __init__(self, m: int = 8, k_codes: int = 16, iters: int = 4,
                 x_scale: int = 10_000):
        self.m, self.k_codes, self.iters, self.x_scale = m, k_codes, iters, x_scale
        self.codebooks: np.ndarray | None = None  # (m, k_codes, d//m) int64 @ 100*x_scale
        self.dim: int | None = None

    # -- training ----------------------------------------------------------

    def fit(self, sample: np.ndarray) -> "PqIndex":
        """Per-subspace integer Lloyd on a driver-held sample.  Init: the
        first ``k_codes`` sample rows (file order — no RNG); an empty code
        keeps its previous centroid; means round ``floor(x+0.5)``."""
        S = np.asarray(sample, dtype=np.float64)
        n, d = S.shape
        if d % self.m:
            raise ValueError(f"dim {d} not divisible by m={self.m}")
        if n < self.k_codes:
            raise ValueError(f"PQ fit needs >= k_codes={self.k_codes} rows, got {n}")
        sub = d // self.m
        Sq = _kmeans_quantize(S, self.x_scale).reshape(n, self.m, sub)
        books = np.empty((self.m, self.k_codes, sub), np.int64)
        for mi in range(self.m):
            X = Sq[:, mi, :]                       # (n, sub) int64 @ x_scale
            C = X[: self.k_codes] * 100            # @ 100*x_scale
            for _ in range(self.iters):
                a = _kmeans_assign(X, C)
                cnt = np.bincount(a, minlength=self.k_codes).astype(np.int64)
                sums = np.zeros((self.k_codes, sub), np.int64)
                np.add.at(sums, a, X)
                nz = cnt > 0
                C = C.copy()
                C[nz] = np.floor(
                    sums[nz].astype(np.float64) * 100.0 / cnt[nz, None] + 0.5
                ).astype(np.int64)
            books[mi] = C
        self.codebooks, self.dim = books, d
        return self

    # -- encode (distributed, output ~16x smaller than input) ---------------

    def encode(self, ds):
        """``(vec_id, embedding)`` → ``(vec_id, codes: list<uint8>[m])``.
        One stateless vectorized pass; codebooks broadcast once."""
        bref = ray.put(self.codebooks)
        m, sub, x_scale = self.m, self.dim // self.m, self.x_scale

        def enc(b: pa.Table) -> pa.Table:
            books = ray.get(bref)
            M = matrix_of(b["embedding"])
            Xq = _kmeans_quantize(M, x_scale).reshape(len(M), m, sub)
            codes = np.empty((len(M), m), np.uint8)
            for mi in range(m):
                codes[:, mi] = _kmeans_assign(Xq[:, mi, :], books[mi]).astype(np.uint8)
            flat = pa.array(codes.reshape(-1), pa.uint8())
            off = pa.array(np.arange(len(M) + 1, dtype=np.int32) * m)
            return pa.table(
                {
                    "vec_id": b["vec_id"].cast(pa.int64()),
                    "codes": pa.ListArray.from_arrays(off, flat),
                }
            )

        return ds.select_columns(["vec_id", "embedding"]).map_batches(
            enc, batch_format="pyarrow"
        )

    # -- ADC search ---------------------------------------------------------

    def _adc_lut(self, query: np.ndarray) -> np.ndarray:
        """(m, k_codes) int64 table of exact ||100·q_sub − c||² distances."""
        q = np.asarray(query, dtype=np.float64)
        sub = self.dim // self.m
        Qq = _kmeans_quantize(q[None, :], self.x_scale).reshape(self.m, sub)
        lut = np.empty((self.m, self.k_codes), np.int64)
        for mi in range(self.m):
            diff = 100 * Qq[mi][None, :] - self.codebooks[mi]
            lut[mi] = np.einsum("ij,ij->i", diff, diff)
        return lut

    def search(self, codes_ds, query: np.ndarray, k: int = 10) -> pa.Table:
        """ADC top-k over an encoded Dataset: per block, gather-sum the
        broadcast LUT over the code matrix and keep the k smallest
        (ties → lowest vec_id); the driver merges k rows per block with
        the same rule.  Returns ``(vec_id, rank, adc_dist)`` int64."""
        lref = ray.put(self._adc_lut(query))
        m = self.m

        def topk_part(b: pa.Table) -> pa.Table:
            lut = ray.get(lref)
            ids = np.asarray(b["vec_id"].combine_chunks().cast(pa.int64()))
            col = b["codes"].combine_chunks()
            codes = np.asarray(col.values, np.int64).reshape(-1, m)
            dist = lut[np.arange(m)[None, :], codes].sum(axis=1)
            sel = np.lexsort((ids, dist))[:k]
            return pa.table(
                {
                    "vec_id": pa.array(ids[sel], pa.int64()),
                    "adc_dist": pa.array(dist[sel], pa.int64()),
                }
            )

        cand = codes_ds.map_batches(topk_part, batch_format="pyarrow").to_pandas()
        ids = cand["vec_id"].to_numpy(np.int64)
        dist = cand["adc_dist"].to_numpy(np.int64)
        sel = np.lexsort((ids, dist))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[sel], pa.int64()),
                "rank": pa.array(np.arange(1, sel.size + 1), pa.int64()),
                "adc_dist": pa.array(dist[sel], pa.int64()),
            }
        )


class IvfPqIndex:
    """IVF-PQ composite (the FAISS ``IVFx,PQy`` layout, Jégou et al. 2011):
    coarse IVF centroids prune WHICH rows are scanned, PQ codes compress
    WHAT is scanned — together the per-query cost is
    ``n_probe/n_list × m bytes`` per row instead of ``4·d`` bytes over the
    whole corpus.  This is the composition actually deployed for web-scale
    ANN; both halves reuse this module's primitives.

    Encoding quantizes the RESIDUAL ``x − centroid(part)`` — residuals
    concentrate near 0, so the same codebook budget spends on a tighter
    distribution.  Determinism: the coarse fit is :class:`IvfIndex`'s
    float Lloyd over a fixed driver sample (bit-reproducible for a fixed
    sample); residuals quantize through :class:`PqIndex`'s integer pipeline,
    so encode and ADC search are exact-integer and layout-independent.

    100-TB shape: coarse+PQ codebooks broadcast once (tiny); one
    distributed encode pass emits (vec_id, ivf_part, codes[m] uint8) —
    write it with ``ivf_part`` as a Parquet partition key (cf.
    ``IvfIndex.write_partitioned``) and a probe reads only its partitions'
    compressed files.
    """

    def __init__(self, n_list: int = 8, n_probe: int = 3, m: int = 8,
                 k_codes: int = 16, iters: int = 4, x_scale: int = 10_000):
        self.coarse = IvfIndex(n_list=n_list, n_probe=n_probe)
        self.pq = PqIndex(m=m, k_codes=k_codes, iters=iters, x_scale=x_scale)

    def fit(self, sample: np.ndarray) -> "IvfPqIndex":
        """Coarse centroids on the (normalized) sample, then PQ codebooks
        on the sample's RESIDUALS against its assigned centroids."""
        S = np.asarray(sample, dtype=np.float64)
        Sn = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-30)
        self.coarse.fit(Sn)
        part = np.argmax(Sn @ self.coarse.centroids.T, axis=1)
        self.pq.fit(Sn - self.coarse.centroids[part])
        return self

    def encode(self, ds):
        """(vec_id, embedding) → (vec_id, ivf_part, codes).  Rows normalize,
        assign to their coarse partition, and PQ-encode the residual — one
        stateless vectorized pass, codebooks broadcast once."""
        cref = ray.put(self.coarse.centroids)
        bref = ray.put(self.pq.codebooks)
        m, sub, x_scale = self.pq.m, self.pq.dim // self.pq.m, self.pq.x_scale

        def enc(b: pa.Table) -> pa.Table:
            C = ray.get(cref)
            books = ray.get(bref)
            M = matrix_of(b["embedding"])
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
            part = np.argmax(Mn @ C.T, axis=1)
            R = Mn - C[part]
            Rq = _kmeans_quantize(R, x_scale).reshape(len(M), m, sub)
            codes = np.empty((len(M), m), np.uint8)
            for mi in range(m):
                codes[:, mi] = _kmeans_assign(Rq[:, mi, :], books[mi]).astype(np.uint8)
            flat = pa.array(codes.reshape(-1), pa.uint8())
            off = pa.array(np.arange(len(M) + 1, dtype=np.int32) * m)
            return pa.table(
                {
                    "vec_id": b["vec_id"].cast(pa.int64()),
                    "ivf_part": pa.array(part.astype(np.int32), pa.int32()),
                    "codes": pa.ListArray.from_arrays(off, flat),
                }
            )

        return ds.select_columns(["vec_id", "embedding"]).map_batches(
            enc, batch_format="pyarrow"
        )

    def write_partitioned(self, ds, path: str) -> str:
        """Materialize the IVF-PQ layout with ``ivf_part`` as a Parquet
        partition KEY: probes then read ONLY their partitions' compressed
        code files from storage — the full 100-TB shape (coarse prune at
        the scan + PQ-compressed payload), composing
        ``IvfIndex.write_partitioned``'s pruning with ``PqIndex``'s
        16×-smaller rows."""
        self.encode(ds).write_parquet(path, partition_cols=["ivf_part"])
        return path

    def search_partitioned(self, path: str, query: np.ndarray, k: int = 10) -> pa.Table:
        """ADC top-k reading only the probed partition directories."""
        import ray.data

        q = np.asarray(query, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-30)
        files = self.coarse.probe_paths(path, qn)
        if not files:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "adc_dist": pa.array([], pa.int64()),
                }
            )
        ds = ray.data.read_parquet(files, columns=["vec_id", "ivf_part", "codes"])

        def fix_part(b: pa.Table) -> pa.Table:
            # hive partition values read back dictionary/string-typed;
            # normalize to int32 so search()'s probe filter applies
            part = b["ivf_part"]
            if pa.types.is_dictionary(part.type):
                part = part.cast(pa.string())
            if not pa.types.is_integer(part.type):
                part = part.cast(pa.string()).cast(pa.float64()).cast(pa.int32())
            else:
                part = part.cast(pa.int32())
            return b.set_column(
                b.schema.get_field_index("ivf_part"), "ivf_part", part
            )

        return self.search(ds.map_batches(fix_part, batch_format="pyarrow"), q, k=k)

    def search(self, codes_ds, query: np.ndarray, k: int = 10) -> pa.Table:
        """ADC top-k over probed partitions only: the query builds one LUT
        PER PROBED PARTITION (its residual differs per centroid); each
        block filters to probed rows, gathers its partition's LUT, and
        emits k candidates; ties → lowest vec_id.  Returns
        (vec_id, rank, adc_dist)."""
        q = np.asarray(query, dtype=np.float64)
        qn = q / max(np.linalg.norm(q), 1e-30)
        probes = np.argsort(-(self.coarse.centroids @ qn))[: self.coarse.n_probe]
        luts = {int(p): self.pq._adc_lut(qn - self.coarse.centroids[p]) for p in probes}
        lref = ray.put(luts)
        m = self.pq.m

        def topk_part(b: pa.Table) -> pa.Table:
            lut_by_part = ray.get(lref)
            part = np.asarray(b["ivf_part"], np.int64)
            keep = np.isin(part, list(lut_by_part))
            empty = pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "adc_dist": pa.array([], pa.int64()),
                }
            )
            if not keep.any():
                return empty
            sub = b.filter(pa.array(keep))
            ids = np.asarray(sub["vec_id"].combine_chunks().cast(pa.int64()))
            codes = np.asarray(sub["codes"].combine_chunks().values, np.int64).reshape(-1, m)
            spart = np.asarray(sub["ivf_part"], np.int64)
            dist = np.empty(len(ids), np.int64)
            for p, lut in lut_by_part.items():
                rows = spart == p
                if rows.any():
                    dist[rows] = lut[
                        np.arange(m)[None, :], codes[rows]
                    ].sum(axis=1)
            sel = np.lexsort((ids, dist))[:k]
            return pa.table(
                {
                    "vec_id": pa.array(ids[sel], pa.int64()),
                    "adc_dist": pa.array(dist[sel], pa.int64()),
                }
            )

        cand = codes_ds.map_batches(topk_part, batch_format="pyarrow").to_pandas()
        ids = cand["vec_id"].to_numpy(np.int64)
        dist = cand["adc_dist"].to_numpy(np.int64)
        sel = np.lexsort((ids, dist))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[sel], pa.int64()),
                "rank": pa.array(np.arange(1, sel.size + 1), pa.int64()),
                "adc_dist": pa.array(dist[sel], pa.int64()),
            }
        )
