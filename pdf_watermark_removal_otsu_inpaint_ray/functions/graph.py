"""Graph analytics over relational streams: integer-exact PageRank on the
co-purchase graph.

The canonical "build a graph from a fact table, run link analysis" shape:
parts appearing on the same order form a weighted directed graph (both
directions, weight = line-pair count), and PageRank runs a fixed number of
damped power iterations over it.  Everything is INTEGER arithmetic — ranks
are micro-units (r0 = 1_000_000) and every per-edge contribution is the
floored division ``r(u) * w // strength(u)`` — so the distributed result is
bit-equal to the SQL twin (no float summation order anywhere) and
independent of block layout.

Distribution shape (no high-cardinality Dataset Aggregate — the measured
~30k-groups/s Aggregate pathology routes every combine through coarse
fixed-partition vectorized passes):

1. **Edge build**: one coarse ORDER-key partition co-locates each order's
   lines; pair generation is vectorized PER ORDER-SIZE CLASS (orders of k
   lines reshape to an (m, k) matrix; one fancy-index per k, never a
   per-order Python loop); pairs pre-combine within the partition
   (lexsort + reduceat) and re-key by hash(u, v).
2. **Edge combine**: one coarse pair-key partition finalizes (u, v, w);
   the edge Dataset is materialized once and re-scanned per iteration
   (at 100 TB it would stage to Parquet instead of the object store).
3. **Strengths / iterations**: per-batch (node, partial) int64 rows fold
   driver-side — node-dimension scale, not edge scale; the rank vector is
   ``ray.put`` once per iteration and read zero-copy per worker (past
   ~10^8 nodes the rank join becomes a coarse repartition join).

Reference analog: the cross-page accumulation state (T2) reduced to a
fixed-point sweep; the damped update mirrors the classifier's weighted
decision (document_classifier.py:154-177) applied iteratively.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)
R0 = 1_000_000  # micro-unit initial rank
DAMP_NUM = 850_000  # 0.85 in micro-units
BASE = 150_000  # 0.15 in micro-units


def copurchase_pagerank(ds, *, iterations: int = 2, num_parts: int = 32) -> pa.Table:
    """PageRank over the part co-purchase graph of a (orderkey, partkey)
    line-item Dataset.  Returns ``(partkey, rank_q)`` with rank in
    micro-units after ``iterations`` damped updates:
    ``r_{i+1}(v) = 150000 + (850000 * sum_u (r_i(u)*w(u,v) // str(u)))
    // 1000000``, ``r_0 = 1000000``.  Nodes = every distinct partkey
    (isolated parts keep the base rank)."""
    import pandas as pd

    def prep(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["l_orderkey"], np.int64)
        return pa.table(
            {
                "orderkey": pa.array(ok, pa.int64()),
                "partkey": b["l_partkey"].cast(pa.int64()),
                "pk": pa.array(ok % num_parts, pa.int64()),
            }
        )

    _EDGE_EMPTY = {
        "u": pd.Series(dtype=np.int64),
        "v": pd.Series(dtype=np.int64),
        "w": pd.Series(dtype=np.int64),
        "pk2": pd.Series(dtype=np.int64),
    }

    def order_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(_EDGE_EMPTY)
        ok = g["orderkey"].to_numpy()
        pk = g["partkey"].to_numpy().astype(np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        first = np.concatenate(([True], ok[1:] != ok[:-1]))
        starts = np.nonzero(first)[0]
        sizes = np.diff(np.append(starts, ok.size))
        out_u, out_v = [], []
        # vectorized per ORDER-SIZE CLASS: orders with k lines form an
        # (m, k) matrix; one fancy-index per k emits all m*k*(k-1) pairs
        for k in np.unique(sizes):
            if k < 2:
                continue
            sel = starts[sizes == k]
            mat = pk[(sel[:, None] + np.arange(k)[None, :])]
            ii, jj = np.nonzero(~np.eye(int(k), dtype=bool))
            out_u.append(mat[:, ii].ravel())
            out_v.append(mat[:, jj].ravel())
        if not out_u:
            return pd.DataFrame(_EDGE_EMPTY)
        u = np.concatenate(out_u)
        v = np.concatenate(out_v)
        keep = u != v  # same part on two lines of one order is not an edge
        u, v = u[keep], v[keep]
        if u.size == 0:
            return pd.DataFrame(_EDGE_EMPTY)
        o2 = np.lexsort((v, u))
        u, v = u[o2], v[o2]
        new = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
        st = np.nonzero(new)[0]
        w = np.diff(np.append(st, u.size)).astype(np.int64)
        u, v = u[st], v[st]
        pk2 = (
            ((u.astype(np.uint64) * _MIX + v.astype(np.uint64)) * _MIX)
            >> np.uint64(33)
        ) % np.uint64(num_parts)
        return pd.DataFrame({"u": u, "v": v, "w": w, "pk2": pk2.astype(np.int64)})

    def edge_combine(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "u": pd.Series(dtype=np.int64),
                    "v": pd.Series(dtype=np.int64),
                    "w": pd.Series(dtype=np.int64),
                }
            )
        u = g["u"].to_numpy().astype(np.int64)
        v = g["v"].to_numpy().astype(np.int64)
        w = g["w"].to_numpy().astype(np.int64)
        o = np.lexsort((v, u))
        u, v, w = u[o], v[o], w[o]
        new = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
        st = np.nonzero(new)[0]
        return pd.DataFrame(
            {"u": u[st], "v": v[st], "w": np.add.reduceat(w, st)}
        )

    edges = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(order_pairs, batch_format="pandas")
        .groupby("pk2")
        .map_groups(edge_combine, batch_format="pandas")
        .materialize()  # re-scanned once per iteration; at 100 TB: stage to
        # Parquet (exactly_once layout) instead of pinning the object store
    )

    def node_partials(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.array(np.unique(np.asarray(b["l_partkey"], np.int64)), pa.int64())}
        )

    nodes = np.unique(
        np.asarray(
            ds.map_batches(node_partials, batch_format="pyarrow").to_pandas()["node"],
            np.int64,
        )
    )  # node-dimension scale

    def strength_partials(b: pa.Table) -> pa.Table:
        u = np.asarray(b["u"], np.int64)
        w = np.asarray(b["w"], np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        s = np.bincount(inv, weights=w, minlength=uu.size).astype(np.int64)
        return pa.table({"u": pa.array(uu, pa.int64()), "s": pa.array(s, pa.int64())})

    sp = edges.map_batches(strength_partials, batch_format="pyarrow").to_pandas()
    str_map: dict = {}
    for u, s in zip(sp["u"].to_numpy(), sp["s"].to_numpy()):
        str_map[int(u)] = str_map.get(int(u), 0) + int(s)
    str_keys = np.array(sorted(str_map), np.int64)
    str_vals = np.array([str_map[int(k)] for k in str_keys], np.int64)

    import ray

    str_ref = ray.put((str_keys, str_vals))
    r = np.full(nodes.size, R0, np.int64)

    for _ in range(iterations):
        r_ref = ray.put((nodes, r))

        def contrib_partials(b: pa.Table) -> pa.Table:
            nk, rv = ray.get(r_ref)
            sk, sv = ray.get(str_ref)
            u = np.asarray(b["u"], np.int64)
            v = np.asarray(b["v"], np.int64)
            w = np.asarray(b["w"], np.int64)
            ru = rv[np.searchsorted(nk, u)]
            su = sv[np.searchsorted(sk, u)]
            c = (ru * w) // su
            vv, inv = np.unique(v, return_inverse=True)
            cs = np.bincount(inv, weights=c, minlength=vv.size).astype(np.int64)
            return pa.table(
                {"v": pa.array(vv, pa.int64()), "c": pa.array(cs, pa.int64())}
            )

        cp = edges.map_batches(contrib_partials, batch_format="pyarrow").to_pandas()
        acc: dict = {}
        for v, c in zip(cp["v"].to_numpy(), cp["c"].to_numpy()):
            acc[int(v)] = acc.get(int(v), 0) + int(c)
        contrib = np.array([acc.get(int(n), 0) for n in nodes], np.int64)
        r = BASE + (DAMP_NUM * contrib) // R0

    return pa.table(
        {
            "partkey": pa.array(nodes, pa.int64()),
            "rank_q": pa.array(r, pa.int64()),
        }
    )
