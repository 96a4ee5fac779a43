"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — per-batch float64 matmul against a
broadcast query matrix (``ray.put`` once, fetched per task), per-batch
top-k candidates merged on the driver (k × num_blocks rows — tiny).  No
global sort/shuffle.

Scale path: :class:`IvfIndex` — deterministic coarse centroids, per-batch
partition assignment, query probes the ``n_probe`` nearest partitions only.
"""

from __future__ import annotations

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
    assert (lens == dim).all(), "ragged embedding column"
    return vals[off[0] : off[-1]].reshape(-1, dim)


def cosine_topk(ds, query: np.ndarray, k: int = 10) -> pa.Table:
    """Brute-force cosine top-k: returns (vec_id, rank) sorted by similarity
    desc, ties broken by vec_id asc (deterministic)."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-30)
    qref = ray.put(q)

    def batch_topk(b: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        M = matrix_of(b["embedding"])
        sims = (M @ qv) / np.maximum(np.linalg.norm(M, axis=1), 1e-30)
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        take = min(k, sims.size)
        part = np.argpartition(-sims, take - 1)[:take] if take else np.zeros(0, int)
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
        self.n_list, self.n_probe, self.iters = n_list, n_probe, iters
        self.centroids: np.ndarray | None = None

    def fit(self, sample: np.ndarray) -> "IvfIndex":
        C = sample[: self.n_list].copy()
        for _ in range(self.iters):
            assign = np.argmax(sample @ C.T, axis=1)
            for j in range(C.shape[0]):
                m = assign == j
                if m.any():
                    v = sample[m].mean(axis=0)
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
