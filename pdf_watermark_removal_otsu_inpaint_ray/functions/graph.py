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

from ..config import scaled_parts

import numpy as np
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)
R0 = 1_000_000  # micro-unit initial rank
DAMP_NUM = 850_000  # 0.85 in micro-units
BASE = 150_000  # 0.15 in micro-units


def copurchase_pagerank(ds, *, iterations: int = 2, num_parts: int | None = None) -> pa.Table:
    """PageRank over the part co-purchase graph of a (orderkey, partkey)
    line-item Dataset.  Returns ``(partkey, rank_q)`` with rank in
    micro-units after ``iterations`` damped updates:
    ``r_{i+1}(v) = 150000 + (850000 * sum_u (r_i(u)*w(u,v) // str(u)))
    // 1000000``, ``r_0 = 1000000``.  Nodes = every distinct partkey
    (isolated parts keep the base rank)."""
    num_parts = scaled_parts(32, num_parts)
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


def connected_components_distributed(
    pairs, *, num_parts: int | None = None, max_iters: int = 30
) -> pa.Table:
    """Distributed connected components by iterative MIN-LABEL PROPAGATION
    with POINTER-HALVING — the scale path
    :func:`..dedup.connected_components`'s docstring promises for pair
    sets that outgrow the driver.  Input: an (a, b) pair Dataset (or
    Table); output: one (doc_id, cluster_id, keep) row per node,
    cluster_id = the component's minimum id, keep = 1 on the canonical
    node — identical to the driver union-find.

    Execution is a RAW-RAY HASH EXCHANGE, not a Dataset groupby: labels
    and (bidirectional) edges live as one Arrow table per hash(id)
    partition in the object store; each round is ``num_parts`` spread
    tasks (vectorized: edge candidates (v, lab(u)), label pass-through,
    and a grandparent request per non-root) each returning one message
    table PER DESTINATION partition, then ``num_parts`` merge tasks
    folding messages with one lexsort + run-boundary min and answering
    each request with the target's NEW label (the pointer-halving
    response that lands next round — Hash-to-Min-family, so rounds ≈
    log2(diameter), measured 4 where plain propagation took 10+).  The
    driver moves only OBJECT REFS plus one (sum, count) scalar pair per
    partition per round: labels monotonically decrease, and ONE full
    unchanged round forces a flat, edge-constant labeling (any pending
    grandparent response would have fired a change), so ``sum unchanged
    ⟺ converged`` — the termination probe is free, riding the merge
    tasks' return.  This is the operator the Dataset API cannot express
    without paying a sort-based groupby per round (measured ~3.5 s of
    fixed exchange latency per round at sf0.1 vs ~0.3 s for the direct
    exchange); partitioning is explicit and documented: hash(id) %
    num_parts, identical for labels, edge sources, and message targets.

    Memory: edges pin one bidirectional pair set in the object store
    (same assumption as the PageRank edge materialization; at 10^11
    edges stage shards to Parquet), labels are node-scale.

    Reference analog: cross-page accumulation (T2) run to fixed point;
    the min-id canonical-member rule mirrors the dedup keep-first
    contract (cli.py dedup spans)."""
    num_parts = scaled_parts(32, num_parts)
    import ray
    import ray.data

    if isinstance(pairs, pa.Table):
        pairs = ray.data.from_arrow(pairs)

    P = int(num_parts)

    def _pk_of(ids: np.ndarray) -> np.ndarray:
        return (
            (ids.astype(np.uint64) * _MIX) >> np.uint64(40)
        ).astype(np.int64) % P

    @ray.remote
    def split_edges(tbl: pa.Table):
        """pairs block → one (u, v) edge table per destination partition
        (both directions), plus the block's sorted unique node ids."""
        if not isinstance(tbl, pa.Table):
            # to_arrow_refs passes pandas blocks through unconverted
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        if "a" not in tbl.column_names or tbl.num_rows == 0:
            # a zero-row block can arrive schema-less; emit typed empties
            a = np.zeros(0, np.int64)
            b = np.zeros(0, np.int64)
        else:
            a = np.asarray(tbl["a"], np.int64)
            b = np.asarray(tbl["b"], np.int64)
        u = np.concatenate([a, b])
        v = np.concatenate([b, a])
        pk = _pk_of(u)
        out = []
        for q in range(P):
            m = pk == q
            out.append(
                pa.table(
                    {"u": pa.array(u[m], pa.int64()), "v": pa.array(v[m], pa.int64())}
                )
            )
        out.append(np.unique(u))
        return tuple(out)

    @ray.remote
    def concat_edges(*tbls):
        t = pa.concat_tables(tbls)
        return t.combine_chunks()

    @ray.remote
    def seed_labels(q: int, *node_arrays):
        ids = np.unique(np.concatenate(node_arrays)) if node_arrays else np.zeros(0, np.int64)
        ids = ids[_pk_of(ids) == q]
        return (
            pa.table(
                {"id": pa.array(ids, pa.int64()), "lab": pa.array(ids, pa.int64())}
            ),
            int(ids.sum()),
            int(ids.size),
        )

    @ray.remote
    def spread(labels: pa.Table, edges: pa.Table, extra: pa.Table | None):
        """One partition's round: emit per-destination (target, cand)
        message tables.  ``extra`` = last round's grandparent responses
        addressed to this partition (plain candidates)."""
        lk = np.asarray(labels["id"], np.int64)
        lv = np.asarray(labels["lab"], np.int64)
        o = np.argsort(lk)
        lk, lv = lk[o], lv[o]
        eu = np.asarray(edges["u"], np.int64)
        ev = np.asarray(edges["v"], np.int64)
        pos = np.searchsorted(lk, eu)
        assert pos.size == 0 or (
            (pos < lk.size).all() and (lk[np.minimum(pos, lk.size - 1)] == eu).all()
        )
        cand = lv[pos] if pos.size else lv[:0]
        qmask = lv != lk  # non-roots request lab(lab(id))
        parts = [
            np.concatenate([lk, ev, lv[qmask]]),
            np.concatenate([lv, cand, -lk[qmask] - 1]),
        ]
        if extra is not None and extra.num_rows:
            parts[0] = np.concatenate([parts[0], np.asarray(extra["target"], np.int64)])
            parts[1] = np.concatenate([parts[1], np.asarray(extra["cand"], np.int64)])
        tgt, cnd = parts
        pk = _pk_of(tgt)
        out = []
        for q in range(P):
            m = pk == q
            out.append(
                pa.table(
                    {
                        "target": pa.array(tgt[m], pa.int64()),
                        "cand": pa.array(cnd[m], pa.int64()),
                    }
                )
            )
        return tuple(out)

    @ray.remote
    def merge(*msgs):
        """Fold one partition's incoming messages: min per target over
        non-negative candidates; answer requests (negative candidates)
        with the target's NEW label, routed per destination partition.
        Returns (labels, per-dest response tables..., label_sum, n)."""
        t = pa.concat_tables(msgs)
        tg = np.asarray(t["target"], np.int64)
        c = np.asarray(t["cand"], np.int64)
        o = np.lexsort((c, tg))
        tg, c = tg[o], c[o]
        req = c < 0
        tr, requester = tg[req], -c[req] - 1
        t2, c2 = tg[~req], c[~req]
        if t2.size:
            first = np.concatenate(([True], t2[1:] != t2[:-1]))
            tk, nv = t2[first], c2[first]
        else:  # a partition with no resident nodes this round
            tk, nv = t2, c2
        rpos = np.searchsorted(tk, tr)
        assert rpos.size == 0 or (
            (rpos < tk.size).all() and (tk[np.minimum(rpos, tk.size - 1)] == tr).all()
        )
        resp = nv[rpos] if rpos.size else nv[:0]
        rpk = _pk_of(requester)
        out = [
            pa.table(
                {"id": pa.array(tk, pa.int64()), "lab": pa.array(nv, pa.int64())}
            )
        ]
        for q in range(P):
            m = rpk == q
            out.append(
                pa.table(
                    {
                        "target": pa.array(requester[m], pa.int64()),
                        "cand": pa.array(resp[m], pa.int64()),
                    }
                )
            )
        out.append(int(nv.sum()))
        out.append(int(nv.size))
        return tuple(out)

    # phase 0: hash-partition the bidirectional edge set + seed labels
    block_refs = pairs.map_batches(
        lambda b: b, batch_format="pyarrow"
    ).to_arrow_refs()
    if not block_refs:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "keep": pa.array([], pa.int64()),
            }
        )
    splits = [
        split_edges.options(num_returns=P + 1).remote(ref) for ref in block_refs
    ]
    edges_p = [concat_edges.remote(*[sp[q] for sp in splits]) for q in range(P)]
    seeds = [
        seed_labels.options(num_returns=3).remote(q, *[sp[P] for sp in splits])
        for q in range(P)
    ]
    labels_p = [s3[0] for s3 in seeds]
    sums = ray.get([s3[1] for s3 in seeds])
    counts = ray.get([s3[2] for s3 in seeds])
    prev_sum, n_nodes = sum(sums), sum(counts)
    if n_nodes == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "keep": pa.array([], pa.int64()),
            }
        )

    extra_p: list = [None] * P
    for _round in range(max_iters):
        sp = [
            spread.options(num_returns=P).remote(labels_p[q], edges_p[q], extra_p[q])
            for q in range(P)
        ]
        if P == 1:
            sp = [[r] for r in sp]  # num_returns=1 yields a bare ref
        mg = [
            merge.options(num_returns=P + 3).remote(*[sp[src][q] for src in range(P)])
            for q in range(P)
        ]
        labels_p = [m[0] for m in mg]
        extra_p = [
            concat_edges.remote(*[mg[src][1 + q] for src in range(P)])
            for q in range(P)
        ]
        cur = ray.get([m[P + 1] for m in mg])
        cnt = ray.get([m[P + 2] for m in mg])
        cur_sum, cur_n = sum(cur), sum(cnt)
        assert cur_n == n_nodes, (cur_n, n_nodes)
        if _round > 0 and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds "
            "(adversarially deep graph — use star contraction)"
        )

    out = pa.concat_tables(ray.get(labels_p))
    ids = np.asarray(out["id"], np.int64)
    lab = np.asarray(out["lab"], np.int64)
    o = np.argsort(ids)
    ids, lab = ids[o], lab[o]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(lab, pa.int64()),
            "keep": pa.array((ids == lab).astype(np.int64), pa.int64()),
        }
    )


# -- triangle counting ------------------------------------------------------


def copurchase_edges(ds, *, num_parts: int | None = None):
    """Distinct undirected co-purchase edges ``(a, b)`` with ``a < b`` from
    a (l_orderkey, l_partkey) line-item Dataset: two parts are adjacent
    when some order contains both.  Same order-partitioned size-class
    build as ``copurchase_pagerank`` (one fancy-index per order-size k),
    then a coarse pair-key combine dedupes globally — the shuffle carries
    distinct int64 pairs only."""
    num_parts = scaled_parts(32, num_parts)
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

    _E = {
        "a": pd.Series(dtype=np.int64),
        "b": pd.Series(dtype=np.int64),
        "pk2": pd.Series(dtype=np.int64),
    }

    def order_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(_E)
        ok = g["orderkey"].to_numpy()
        pk = g["partkey"].to_numpy().astype(np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        starts = np.nonzero(np.concatenate(([True], ok[1:] != ok[:-1])))[0]
        sizes = np.diff(np.append(starts, ok.size))
        out_a, out_b = [], []
        for k in np.unique(sizes):
            if k < 2:
                continue
            sel = starts[sizes == k]
            mat = pk[(sel[:, None] + np.arange(k)[None, :])]
            ii, jj = np.triu_indices(int(k), 1)  # rows sorted: mat[:,i]<=mat[:,j]
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        if not out_a:
            return pd.DataFrame(_E)
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        keep = a != b
        a, b = a[keep], b[keep]
        if a.size == 0:
            return pd.DataFrame(_E)
        o2 = np.lexsort((b, a))
        a, b = a[o2], b[o2]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        a, b = a[new], b[new]
        pk2 = (
            ((a.astype(np.uint64) * _MIX + b.astype(np.uint64)) * _MIX)
            >> np.uint64(33)
        ) % np.uint64(num_parts)
        return pd.DataFrame({"a": a, "b": b, "pk2": pk2.astype(np.int64)})

    def edge_dedup(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy().astype(np.int64)
        b = g["b"].to_numpy().astype(np.int64)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        return pd.DataFrame({"a": a[new], "b": b[new]})

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(order_pairs, batch_format="pandas")
        .groupby("pk2")
        .map_groups(edge_dedup, batch_format="pandas")
    )


def degree_table(edges, *, num_parts: int | None = None) -> pa.Table:
    """Node-degree table of a distinct undirected edge Dataset (``a < b``
    rows), collected to one Arrow table (NODE-scale — the graph's
    dimension side).  One coarse ``node % P`` partition + per-partition
    sort/diff count; shared by the triangle and truss passes (and
    cacheable: the co-purchase suite materializes it once per lineitem
    content, queries.py::_copurchase_graph_cached)."""
    num_parts = scaled_parts(32, num_parts)
    import pandas as pd

    from .dedup import _collect_arrow

    def endpoints(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a"], np.int64)
        bb = np.asarray(b["b"], np.int64)
        n = np.concatenate([a, bb])
        return pa.table(
            {"node": pa.array(n, pa.int64()),
             "pk": pa.array(n % num_parts, pa.int64())}
        )

    def count_deg(g: pd.DataFrame) -> pd.DataFrame:
        n = g["node"].to_numpy().astype(np.int64)
        n.sort()
        st = np.nonzero(np.concatenate(([True], n[1:] != n[:-1])))[0]
        d = np.diff(np.append(st, n.size)).astype(np.int64)
        return pd.DataFrame({"node": n[st], "deg": d})

    deg = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(count_deg, batch_format="pandas")
    )
    tbl = _collect_arrow(
        deg, pa.schema([("node", pa.int64()), ("deg", pa.int64())])
    )
    order = np.argsort(np.asarray(tbl["node"], np.int64))
    return tbl.take(pa.array(order, pa.int64()))


def oriented_edges(edges, deg_tbl: pa.Table, *, num_parts: int | None = None):
    """Degree-rank-oriented edge Dataset ``(src, dst, pk)``: each edge
    points LOW-rank → HIGH-rank by the packed ``(deg << 34) | id`` total
    order, so every node's out-degree is O(sqrt(m)) — the wedge-bounding
    orientation both triangle passes start from.  ``deg_tbl`` must be
    node-sorted (:func:`degree_table`); it broadcasts once via
    ``ray.put``."""
    num_parts = scaled_parts(32, num_parts)
    import ray

    d_nodes = np.asarray(deg_tbl["node"], np.int64)
    d_deg = np.asarray(deg_tbl["deg"], np.int64)
    deg_ref = ray.put((d_nodes, d_deg))

    def orient(b: pa.Table) -> pa.Table:
        nodes, degs = ray.get(deg_ref)
        a = np.asarray(b["a"], np.int64)
        bb = np.asarray(b["b"], np.int64)
        da = degs[np.searchsorted(nodes, a)]
        db = degs[np.searchsorted(nodes, bb)]
        ra = (da.astype(np.uint64) << np.uint64(34)) | a.astype(np.uint64)
        rb = (db.astype(np.uint64) << np.uint64(34)) | bb.astype(np.uint64)
        low_first = ra < rb
        src = np.where(low_first, a, bb)
        dst = np.where(low_first, bb, a)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "pk": pa.array(src % num_parts, pa.int64()),
            }
        )

    return edges.map_batches(orient, batch_format="pyarrow")


def triangle_stats(
    edges, *, num_parts: int | None = None, deg_tbl: pa.Table | None = None,
    oriented=None,
) -> pa.Table:
    """Exact triangle count + global-clustering ingredients over a
    distinct undirected edge Dataset (``a < b`` int64 rows).  Returns ONE
    row ``(n_edges, n_wedges, n_triangles)``: edge count, path-of-length-2
    count ``sum_v C(deg(v), 2)``, and the exact triangle count.

    The degree-ordered wedge algorithm (Cohen's MapReduce formulation /
    the compact-forward scheme):

    1. degrees by a coarse ``groupby(node % P)`` count (edge list emits
       both endpoints as int64 rows); ``n_edges`` and ``n_wedges`` are
       closed forms over the degree partition — no extra pass;
    2. the degree vector (NODE-scale — the graph's dimension side) is
       collected once and broadcast via ``ray.put``; each edge orients
       LOW-rank → HIGH-rank by the packed ``(deg << 34) | id`` total
       order — every node's out-degree is O(sqrt(m)), which bounds wedge
       generation even on hub-heavy graphs (the reason plain
       id-orientation is wrong at scale).  At billion-node scale swap the
       broadcast for a union+repartition degree attach (the closure
       sweep's idiom) — the other phases are unchanged;
    3. wedges per source from its out-neighbor pairs (size-class
       fancy-index, id-canonicalized), combined per partition;
    4. closure = wedges and edges tagged into ONE coarse pair-hash
       ``groupby`` (the engine's repartition-join sweep — the native
       Dataset.join builds schema-less empty partitions for lazily-typed
       inputs, measured); with this orientation each triangle closes at
       exactly ONE source (its rank-lowest vertex), so the matched-wedge
       total IS the triangle count (no /3).

    Driver traffic: the three scalars.  Reference analog: the motif
    co-occurrence accumulation (cross-page repeated structure,
    watermark_remover.py), lifted from pairs to closed triples.
    """
    num_parts = scaled_parts(32, num_parts)
    import pandas as pd

    # degree vector: NODE-scale (the graph's dimension side), collected
    # once and broadcast via ray.put inside oriented_edges — the engine's
    # small-side rule.  At billion-node scale swap the broadcast for a
    # union+repartition attach (the closure sweep's idiom); the
    # wedge/closure phases are unchanged by that swap.  Callers may pass
    # precomputed deg_tbl / oriented (same num_parts!) from the cached
    # graph layout (queries.py::_copurchase_graph_cached).
    if deg_tbl is None:
        deg_tbl = degree_table(edges, num_parts=num_parts)
    d_deg = np.asarray(deg_tbl["deg"], np.int64)
    # n_edges / n_wedges are degree closed forms
    n_edges = int(d_deg.sum()) // 2
    n_wedges = int((d_deg * (d_deg - 1) // 2).sum())
    if oriented is None:
        oriented = oriented_edges(edges, deg_tbl, num_parts=num_parts)

    _W_SENTINEL = {
        "wa": np.array([-1], np.int64),
        "wb": np.array([-1], np.int64),
        "w": np.array([0], np.int64),
    }

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        s = g["src"].to_numpy().astype(np.int64)
        d = g["dst"].to_numpy().astype(np.int64)
        o = np.lexsort((d, s))
        s, d = s[o], d[o]
        st = np.nonzero(np.concatenate(([True], s[1:] != s[:-1])))[0]
        sizes = np.diff(np.append(st, s.size))
        out_a, out_b = [], []
        for k in np.unique(sizes):
            if k < 2:
                continue
            sel = st[sizes == k]
            mat = d[(sel[:, None] + np.arange(k)[None, :])]
            ii, jj = np.triu_indices(int(k), 1)
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        if not out_a:
            return pd.DataFrame(_W_SENTINEL)
        x = np.concatenate(out_a)
        y = np.concatenate(out_b)
        a = np.minimum(x, y)  # id-canonical closure key (edge list is a<b)
        b_ = np.maximum(x, y)
        o2 = np.lexsort((b_, a))
        a, b_ = a[o2], b_[o2]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b_[1:] != b_[:-1])))
        stw = np.nonzero(new)[0]
        w = np.diff(np.append(stw, a.size)).astype(np.int64)
        return pd.DataFrame(
            {
                "wa": np.append(a[stw], -1),
                "wb": np.append(b_[stw], -1),
                "w": np.append(w, 0),
            }
        )

    def tag_wedge(b: pa.Table) -> pa.Table:
        wa = np.asarray(b["wa"], np.int64)
        wb = np.asarray(b["wb"], np.int64)
        jk = (
            ((wa.astype(np.uint64) * _MIX + wb.astype(np.uint64)) * _MIX)
            >> np.uint64(33)
        ) % np.uint64(num_parts)
        return pa.table(
            {
                "ja": pa.array(wa, pa.int64()),
                "jb": pa.array(wb, pa.int64()),
                "w": b["w"],
                "is_edge": pa.array(np.zeros(wa.size, np.int64), pa.int64()),
                "jk": pa.array(jk.astype(np.int64), pa.int64()),
            }
        )

    def tag_edge(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a"], np.int64)
        bb = np.asarray(b["b"], np.int64)
        jk = (
            ((a.astype(np.uint64) * _MIX + bb.astype(np.uint64)) * _MIX)
            >> np.uint64(33)
        ) % np.uint64(num_parts)
        return pa.table(
            {
                "ja": pa.array(a, pa.int64()),
                "jb": pa.array(bb, pa.int64()),
                "w": pa.array(np.zeros(a.size, np.int64), pa.int64()),
                "is_edge": pa.array(np.ones(a.size, np.int64), pa.int64()),
                "jk": pa.array(jk.astype(np.int64), pa.int64()),
            }
        )

    def closure_sum(g: pd.DataFrame) -> pd.DataFrame:
        # repartition-join sweep (the engine's house join shape): both
        # sides of one pair-hash partition in one frame; a wedge's count
        # contributes iff its (ja, jb) also appears as an edge row
        ja = g["ja"].to_numpy().astype(np.int64)
        jb = g["jb"].to_numpy().astype(np.int64)
        w = g["w"].to_numpy().astype(np.int64)
        is_e = g["is_edge"].to_numpy().astype(bool)
        ek = np.unique(ja[is_e] * np.int64(1 << 32) + jb[is_e])
        wk = ja[~is_e] * np.int64(1 << 32) + jb[~is_e]
        loc = np.searchsorted(ek, wk)
        hit = (loc < ek.size) & (ek[np.minimum(loc, max(ek.size - 1, 0))] == wk) if ek.size else np.zeros(wk.size, bool)
        return pd.DataFrame({"t": np.array([int(w[~is_e][hit].sum())], np.int64)})

    wedge_ds = (
        oriented.groupby("pk")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(tag_wedge, batch_format="pyarrow")
    )
    edge_tagged = edges.map_batches(tag_edge, batch_format="pyarrow")
    closed = (
        wedge_ds.union(edge_tagged)
        .groupby("jk")
        .map_groups(closure_sum, batch_format="pandas")
        .to_pandas()
    )
    n_tri = int(closed["t"].sum())
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_wedges": pa.array([n_wedges], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
        }
    )


def triangle_support_hist(
    edges, *, num_parts: int | None = None, deg_tbl: pa.Table | None = None,
    oriented=None,
) -> pa.Table:
    """Per-edge triangle-SUPPORT distribution over a distinct undirected
    edge Dataset (``a < b`` int64 rows): support(e) = number of triangles
    containing e — the k-truss signal (an edge survives the k-truss iff
    support >= k-2).  Returns ``(support, n_edges)`` rows including the
    support-0 bucket, smallest output that still fixes the whole
    distribution (and the SQL twin's shape).

    Single wedge pass over the ``triangle_stats`` orientation machinery:

    1. the SORTED EDGE-KEY set collects once and broadcasts via
       ``ray.put`` (8 B per edge — the graph's O(m) side, the same
       memory class as the matched-pair set an earlier two-pass variant
       broadcast, since matched pairs ⊆ edges);
    2. one wedge generation keeps wedges whose far pair is in the edge
       set — those ARE the triangles — emitting 3 id-canonical edge
       credits each, pre-combined per partition (output-scale shuffle:
       ≤ 3 × triangles rows move);
    3. one coarse pair-hash count per edge, one tiny support histogram,
       support-0 backfilled from the degree-pass edge count.

    Nothing wedge-scale is ever shuffled or broadcast.  For graphs whose
    edge set exceeds worker memory, the no-broadcast closure-shuffle
    formulation (``triangle_stats``'s union + pair-hash groupby) is the
    fallback shape — the 100-TB trade documented there.
    """
    num_parts = scaled_parts(32, num_parts)
    import pandas as pd

    import ray

    from .dedup import _collect_arrow

    # shared artifacts (cacheable, queries.py::_copurchase_graph_cached):
    # node-sorted degree table + rank-oriented edge layout
    if deg_tbl is None:
        deg_tbl = degree_table(edges, num_parts=num_parts)
    n_edges_total = int(np.asarray(deg_tbl["deg"], np.int64).sum()) // 2
    if oriented is None:
        oriented = oriented_edges(edges, deg_tbl, num_parts=num_parts)

    def _src_wedges(g: pd.DataFrame):
        """(src, far-lo, far-hi) wedge triples of one src partition."""
        s = g["src"].to_numpy().astype(np.int64)
        d = g["dst"].to_numpy().astype(np.int64)
        o2 = np.lexsort((d, s))
        s, d = s[o2], d[o2]
        st = np.nonzero(np.concatenate(([True], s[1:] != s[:-1])))[0]
        sizes = np.diff(np.append(st, s.size))
        out_s, out_a, out_b = [], [], []
        for k in np.unique(sizes):
            if k < 2:
                continue
            sel = st[sizes == k]
            mat = d[(sel[:, None] + np.arange(k)[None, :])]
            ii, jj = np.triu_indices(int(k), 1)
            out_s.append(np.repeat(s[sel], ii.size))
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        if not out_s:
            z = np.zeros(0, np.int64)
            return z, z, z
        x = np.concatenate(out_a)
        y = np.concatenate(out_b)
        return (
            np.concatenate(out_s),
            np.minimum(x, y),
            np.maximum(x, y),
        )

    # Far-edge membership: broadcast the SORTED EDGE-KEY SET once.  The
    # old two-pass shape (wedge dedup + union + pair-hash closure shuffle
    # to find the MATCHED subset, then broadcast it) already collected and
    # broadcast an edge-scale array — the matched pairs are a subset of
    # the edges — so broadcasting the full edge set is the same O(m)
    # memory class while deleting the entire deduped-wedge-scale shuffle
    # AND the second wedge generation (measured 9.9 s → ~3 s at sf0.1's
    # 1.2M-edge / 41M-wedge graph).  At edge counts past worker memory the
    # no-broadcast closure-shuffle formulation (triangle_stats) is the
    # fallback shape.
    e_tbl = _collect_arrow(
        edges, pa.schema([("a", pa.int64()), ("b", pa.int64())])
    )
    mkey = np.sort(
        np.asarray(e_tbl["a"], np.int64) * np.int64(1 << 32)
        + np.asarray(e_tbl["b"], np.int64)
    )
    mref = ray.put(mkey)

    # single wedge pass: keep wedges whose far pair IS an edge (those are
    # the triangles), credit all three edges
    def credits(g: pd.DataFrame) -> pd.DataFrame:
        mk = ray.get(mref)
        s, a, b_ = _src_wedges(g)
        if a.size == 0 or mk.size == 0:
            return pd.DataFrame(
                {"ca": pd.Series(dtype=np.int64), "cb": pd.Series(dtype=np.int64),
                 "w": pd.Series(dtype=np.int64), "ck": pd.Series(dtype=np.int64)}
            )
        key = a * np.int64(1 << 32) + b_
        loc = np.searchsorted(mk, key)
        tri = (loc < mk.size) & (mk[np.minimum(loc, mk.size - 1)] == key)
        if not tri.any():
            return pd.DataFrame(
                {"ca": pd.Series(dtype=np.int64), "cb": pd.Series(dtype=np.int64),
                 "w": pd.Series(dtype=np.int64), "ck": pd.Series(dtype=np.int64)}
            )
        s, a, b_ = s[tri], a[tri], b_[tri]
        ca = np.concatenate([a, np.minimum(s, a), np.minimum(s, b_)])
        cb = np.concatenate([b_, np.maximum(s, a), np.maximum(s, b_)])
        # combine per partition before the shuffle (3x triangles -> edges)
        o3 = np.lexsort((cb, ca))
        ca, cb = ca[o3], cb[o3]
        new = np.concatenate(([True], (ca[1:] != ca[:-1]) | (cb[1:] != cb[:-1])))
        stc = np.nonzero(new)[0]
        w = np.diff(np.append(stc, ca.size)).astype(np.int64)
        ca, cb = ca[stc], cb[stc]
        ck = (
            ((ca.astype(np.uint64) * _MIX + cb.astype(np.uint64)) * _MIX)
            >> np.uint64(33)
        ) % np.uint64(num_parts)
        return pd.DataFrame({"ca": ca, "cb": cb, "w": w, "ck": ck.astype(np.int64)})

    def support_partial(g: pd.DataFrame) -> pd.DataFrame:
        ca = g["ca"].to_numpy().astype(np.int64)
        cb = g["cb"].to_numpy().astype(np.int64)
        w = g["w"].to_numpy().astype(np.int64)
        o4 = np.lexsort((cb, ca))
        ca, cb, w = ca[o4], cb[o4], w[o4]
        new = np.concatenate(([True], (ca[1:] != ca[:-1]) | (cb[1:] != cb[:-1])))
        stc = np.nonzero(new)[0]
        sup = np.add.reduceat(w, stc)
        vals, cnts = np.unique(sup, return_counts=True)
        return pd.DataFrame(
            {"support": vals, "n_edges": cnts.astype(np.int64)}
        )

    hist = (
        oriented.groupby("pk").map_groups(credits, batch_format="pandas")
        .groupby("ck")
        .map_groups(support_partial, batch_format="pandas")
        .to_pandas()
    )
    if len(hist) == 0 or "support" not in hist.columns:
        # triangle-free graph: every map_groups block is empty (and
        # empty blocks drop their schema) — the whole mass is support 0
        return pa.table(
            {
                "support": pa.array([0], pa.int64()),
                "n_edges": pa.array([n_edges_total], pa.int64()),
            }
        )
    agg = hist.groupby("support", sort=True)["n_edges"].sum().reset_index()
    credited = int(agg["n_edges"].sum())
    rows = list(zip(agg["support"].tolist(), agg["n_edges"].tolist()))
    if n_edges_total - credited > 0:
        rows = [(0, n_edges_total - credited)] + rows
    return pa.table(
        {
            "support": pa.array([r[0] for r in rows], pa.int64()),
            "n_edges": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def bfs_hops(edges, *, seed_mod: int = 97, max_depth: int = 4) -> pa.Table:
    """Multi-source BFS hop distances over a distinct undirected edge
    Dataset (``a < b`` int64 rows): seeds are the nodes with ``node %
    seed_mod == 0``; returns one ``(partkey, hops)`` row per node reached
    within ``max_depth`` hops, ``hops`` = the minimum hop count (seeds at
    0) — the reachability / neighborhood-expansion primitive (recursive
    CTE twin in SQL).

    Level-synchronous frontier expansion with NODE-scale driver state
    (the same small-side rule as triangle_stats' degree vector: the
    frontier and distance map live on the graph's dimension side, ~the
    part key space, NOT the edge side).  Per round the sorted frontier
    broadcasts once via ``ray.put`` and ONE ``map_batches`` pass over the
    MATERIALIZED edge blocks emits each block's unique frontier
    neighbors (two sorted-membership tests, both edge directions, one
    per-block ``np.unique`` combiner) — no shuffle at all, ``max_depth``
    streaming passes total.  At billion-node scale swap the driver fold
    for the union+repartition min-label attach (the
    connected_components_distributed exchange with a round cap) — the
    per-round edge pass is unchanged.

    Reference analog: the cross-page propagation of sticky detections
    (watermark_detector.py persistence) run a bounded number of steps
    from a seeded page set.
    """
    import ray

    from .dedup import _collect_arrow

    edges = edges.materialize()  # one edge pass per BFS round reuses it

    def uniq_nodes(b: pa.Table) -> pa.Table:
        n = np.unique(
            np.concatenate(
                [np.asarray(b["a"], np.int64), np.asarray(b["b"], np.int64)]
            )
        )
        return pa.table({"node": pa.array(n, pa.int64())})

    node_tbl = _collect_arrow(
        edges.map_batches(uniq_nodes, batch_format="pyarrow"),
        pa.schema([("node", pa.int64())]),
    )
    nodes = np.unique(np.asarray(node_tbl["node"], np.int64))
    dist = np.full(nodes.size, -1, np.int64)
    seed_mask = nodes % seed_mod == 0
    dist[seed_mask] = 0
    frontier = nodes[seed_mask]

    for r in range(max_depth):
        if frontier.size == 0:
            break
        f_ref = ray.put(np.sort(frontier))

        def nbrs(b: pa.Table, _ref=f_ref) -> pa.Table:
            f = ray.get(_ref)
            a = np.asarray(b["a"], np.int64)
            bb = np.asarray(b["b"], np.int64)
            pos_a = np.searchsorted(f, a)
            in_a = (pos_a < f.size) & (f[np.minimum(pos_a, f.size - 1)] == a)
            pos_b = np.searchsorted(f, bb)
            in_b = (pos_b < f.size) & (f[np.minimum(pos_b, f.size - 1)] == bb)
            out = np.unique(np.concatenate([bb[in_a], a[in_b]]))
            return pa.table({"node": pa.array(out, pa.int64())})

        reached_tbl = _collect_arrow(
            edges.map_batches(nbrs, batch_format="pyarrow"),
            pa.schema([("node", pa.int64())]),
        )
        reached = np.unique(np.asarray(reached_tbl["node"], np.int64))
        idx = np.searchsorted(nodes, reached)
        new = dist[idx] < 0
        dist[idx[new]] = r + 1
        frontier = reached[new]

    hit = dist >= 0
    return pa.table(
        {
            "partkey": pa.array(nodes[hit], pa.int64()),
            "hops": pa.array(dist[hit], pa.int64()),
        }
    )


def copurchase_edges_min_weight(
    ds, *, min_weight: int = 2, num_parts: int | None = None, keep_weight: bool = False
):
    """Weight-thresholded distinct undirected co-purchase edges: keep
    ``(a, b)`` (``a < b``) only when at least ``min_weight`` DISTINCT
    orders contain both parts — the noise-pruned backbone graph (a single
    co-purchase is coincidence; repeated co-purchase is signal).

    Same order-partitioned size-class build as :func:`copurchase_edges`,
    but multiplicity-preserving: pairs dedupe per ORDER (packed-key
    ``np.unique``), then one lexsort + run sweep counts per-partition
    multiplicities, and a coarse pair-key groupby sums counts globally
    before the threshold filter — the shuffle carries (pair, count) int64
    rows, never the per-order pair stream."""
    num_parts = scaled_parts(32, num_parts)
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

    _E = {
        "a": pd.Series(dtype=np.int64),
        "b": pd.Series(dtype=np.int64),
        "w": pd.Series(dtype=np.int64),
        "pk2": pd.Series(dtype=np.int64),
    }

    def order_pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(_E)
        ok = g["orderkey"].to_numpy()
        pk = g["partkey"].to_numpy().astype(np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        starts = np.nonzero(np.concatenate(([True], ok[1:] != ok[:-1])))[0]
        sizes = np.diff(np.append(starts, ok.size))
        oid_all, a_all, b_all = [], [], []
        for k in np.unique(sizes):
            if k < 2:
                continue
            sel = starts[sizes == k]
            mat = pk[(sel[:, None] + np.arange(k)[None, :])]
            ii, jj = np.triu_indices(int(k), 1)
            a_all.append(mat[:, ii].ravel())
            b_all.append(mat[:, jj].ravel())
            oid_all.append(
                np.repeat(np.arange(sel.size, dtype=np.int64), ii.size)
                # distinct base per size-class so order ids never collide
                + (int(k) << 40)
            )
        if not a_all:
            return pd.DataFrame(_E)
        a = np.concatenate(a_all)
        b = np.concatenate(b_all)
        oid = np.concatenate(oid_all)
        keep = a != b
        a, b, oid = a[keep], b[keep], oid[keep]
        if a.size == 0:
            return pd.DataFrame(_E)
        # per-ORDER dedup, then per-partition multiplicity count: one
        # lexsort (a, b, oid) + two run sweeps
        o2 = np.lexsort((oid, b, a))
        a, b, oid = a[o2], b[o2], oid[o2]
        new_pair = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
        )
        new_occ = new_pair | np.concatenate(([True], oid[1:] != oid[:-1]))
        a, b = a[new_occ], b[new_occ]
        np_ = new_pair[new_occ]
        st = np.nonzero(np_)[0]
        w = np.diff(np.append(st, a.size)).astype(np.int64)
        a, b = a[st], b[st]
        pk2 = (
            ((a.astype(np.uint64) * _MIX + b.astype(np.uint64)) * _MIX)
            >> np.uint64(33)
        ) % np.uint64(num_parts)
        return pd.DataFrame({"a": a, "b": b, "w": w, "pk2": pk2.astype(np.int64)})

    def weight_fold(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy().astype(np.int64)
        b = g["b"].to_numpy().astype(np.int64)
        w = g["w"].to_numpy().astype(np.int64)
        o = np.lexsort((b, a))
        a, b, w = a[o], b[o], w[o]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        st = np.nonzero(new)[0]
        gid = np.cumsum(new) - 1
        tot = np.bincount(gid, weights=w, minlength=st.size).astype(np.int64)
        keep = tot >= min_weight
        out = {"a": a[st][keep], "b": b[st][keep]}
        if keep_weight:
            out["w"] = tot[keep]
        return pd.DataFrame(out)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(order_pair_counts, batch_format="pandas")
        .groupby("pk2")
        .map_groups(weight_fold, batch_format="pandas")
    )


def k_core(edges, *, k: int = 3, max_iters: int = 100) -> pa.Table:
    """k-core of a distinct undirected edge Dataset (``a < b`` int64
    rows): iteratively peel nodes of degree < ``k`` until the fixpoint;
    returns ``(partkey, deg)`` for the surviving nodes with their degree
    INSIDE the core — the graph-densification filter (community cores,
    spam fringes drop out).

    Level-synchronous peel with NODE-scale driver state (the bfs_hops
    shape): per round the sorted alive set broadcasts once via
    ``ray.put`` and ONE ``map_batches`` pass over the MATERIALIZED edge
    blocks emits per-block (node, deg) partials over both-endpoint-alive
    edges; the driver folds node-scale partials and drops low-degree
    nodes.  No shuffle; rounds = peel depth (bounded by the degeneracy
    ordering, `max_iters` guards adversarial chains).  At billion-node
    scale swap the driver fold for the exchange idiom
    (connected_components_distributed) — the edge pass is unchanged.

    Reference analog: the iterative low-support pruning of the sticky
    detection table (watermark_detector.py min-hits threshold) run to a
    fixpoint over the co-occurrence graph."""
    import ray

    from .dedup import _collect_arrow

    edges = edges.materialize()

    def uniq_nodes(b: pa.Table) -> pa.Table:
        n = np.unique(
            np.concatenate(
                [np.asarray(b["a"], np.int64), np.asarray(b["b"], np.int64)]
            )
        )
        return pa.table({"node": pa.array(n, pa.int64())})

    node_tbl = _collect_arrow(
        edges.map_batches(uniq_nodes, batch_format="pyarrow"),
        pa.schema([("node", pa.int64())]),
    )
    alive = np.unique(np.asarray(node_tbl["node"], np.int64))
    deg = np.zeros(0, np.int64)

    for _ in range(max_iters):
        if alive.size == 0:
            break
        a_ref = ray.put(alive)

        def degs(b: pa.Table, _ref=a_ref) -> pa.Table:
            al = ray.get(_ref)
            a = np.asarray(b["a"], np.int64)
            bb = np.asarray(b["b"], np.int64)
            pa_ = np.searchsorted(al, a)
            in_a = (pa_ < al.size) & (al[np.minimum(pa_, al.size - 1)] == a)
            pb = np.searchsorted(al, bb)
            in_b = (pb < al.size) & (al[np.minimum(pb, al.size - 1)] == bb)
            m = in_a & in_b
            ends = np.concatenate([a[m], bb[m]])
            if ends.size == 0:
                return pa.table(
                    {"node": pa.array([], pa.int64()),
                     "d": pa.array([], pa.int64())}
                )
            u, c = np.unique(ends, return_counts=True)
            return pa.table(
                {"node": pa.array(u, pa.int64()),
                 "d": pa.array(c.astype(np.int64), pa.int64())}
            )

        part = _collect_arrow(
            edges.map_batches(degs, batch_format="pyarrow"),
            pa.schema([("node", pa.int64()), ("d", pa.int64())]),
        )
        nd = np.asarray(part["node"], np.int64)
        dv = np.asarray(part["d"], np.int64)
        deg = np.zeros(alive.size, np.int64)
        if nd.size:
            np.add.at(deg, np.searchsorted(alive, nd), dv)
        keep = deg >= k
        if keep.all():
            break
        alive = alive[keep]
    else:
        raise RuntimeError(f"k-core peel did not converge in {max_iters} rounds")

    if alive.size == 0:
        return pa.table(
            {"partkey": pa.array([], pa.int64()),
             "deg": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "partkey": pa.array(alive, pa.int64()),
            "deg": pa.array(deg[deg >= k], pa.int64()),
        }
    )


def basket_lift(ds, *, min_weight: int = 2, num_parts: int | None = None) -> "object":
    """Market-basket LIFT over the co-purchase pairs: for every part pair
    co-purchased in ≥ ``min_weight`` distinct orders, the association
    strength ``lift(a,b) = N·c(a,b) / (c(a)·c(b))`` (N = distinct orders,
    c(x) = orders containing x), quantized to an exact integer
    ``lift_q = (10^6·N·w) // (c(a)·c(b))`` — the support/confidence/lift
    triple of affinity analysis, integer-exact end to end.

    Distribution: the weighted edge build (:func:`copurchase_edges_min_weight`
    with ``keep_weight``) carries (pair, w) int64 rows through its coarse
    shuffles; the per-item order counts are DIMENSION-scale (the part key
    space) — folded once driver-side and broadcast via ``ray.put`` (the
    triangle degree-vector rule; swap for the union+repartition attach at
    billion-part scale); one final scan computes lift per pair.  Int64
    bound: ``10^6·N·w`` must stay < 2^63 — holds to ~10^9 order-pairs at
    this quantization (the SQL twin rides HUGEINT above that)."""
    num_parts = scaled_parts(32, num_parts)
    import ray
    import ray.data

    from .dedup import _collect_arrow

    # NOTE: per-batch distinct (order, part) pairs under-count only if an
    # order's rows split across batches — they can; so fold DISTINCT pairs
    # through a coarse groupby instead of trusting batch-local distincts.
    def op_rows(b: pa.Table) -> pa.Table:
        ok = np.asarray(b["l_orderkey"], np.int64)
        pk_ = np.asarray(b["l_partkey"], np.int64)
        o = np.lexsort((pk_, ok))
        ok, pk_ = ok[o], pk_[o]
        new = np.concatenate(([True], (ok[1:] != ok[:-1]) | (pk_[1:] != pk_[:-1])))
        return pa.table(
            {
                "o": pa.array(ok[new], pa.int64()),
                "p": pa.array(pk_[new], pa.int64()),
                "pk": pa.array(ok[new] % num_parts, pa.int64()),
            }
        )

    def op_fold(g) -> "pa.Table":
        import pandas as pd

        ok = g["o"].to_numpy().astype(np.int64)
        pk_ = g["p"].to_numpy().astype(np.int64)
        o = np.lexsort((pk_, ok))
        ok, pk_ = ok[o], pk_[o]
        new = np.concatenate(([True], (ok[1:] != ok[:-1]) | (pk_[1:] != pk_[:-1])))
        u, c = np.unique(pk_[new], return_counts=True)
        n_orders = int(np.unique(ok).size)
        return pd.DataFrame(
            {
                "part": np.concatenate([u, [-1]]),
                "cnt": np.concatenate([c.astype(np.int64), [n_orders]]),
            }
        )

    counts_tbl = _collect_arrow(
        ds.map_batches(op_rows, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(op_fold, batch_format="pandas"),
        pa.schema([("part", pa.int64()), ("cnt", pa.int64())]),
    )
    parts_arr = np.asarray(counts_tbl["part"], np.int64)
    cnts_arr = np.asarray(counts_tbl["cnt"], np.int64)
    n_total = int(cnts_arr[parts_arr == -1].sum())
    keep = parts_arr >= 0
    parts_arr, cnts_arr = parts_arr[keep], cnts_arr[keep]
    # duplicate parts across order-partitions: sum their counts
    u, inv = np.unique(parts_arr, return_inverse=True)
    csum = np.bincount(inv, weights=cnts_arr, minlength=u.size).astype(np.int64)
    cnt_ref = ray.put((u, csum))

    edges = copurchase_edges_min_weight(
        ds, min_weight=min_weight, num_parts=num_parts, keep_weight=True
    )

    def add_lift(b: pa.Table) -> pa.Table:
        nodes, cn = ray.get(cnt_ref)
        a = np.asarray(b["a"], np.int64)
        bb = np.asarray(b["b"], np.int64)
        w = np.asarray(b["w"], np.int64)
        ca = cn[np.searchsorted(nodes, a)]
        cb = cn[np.searchsorted(nodes, bb)]
        lift_q = (1_000_000 * n_total * w) // (ca * cb)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(bb, pa.int64()),
                "w": pa.array(w, pa.int64()),
                "lift_q": pa.array(lift_q, pa.int64()),
            }
        )

    return edges.map_batches(add_lift, batch_format="pyarrow")
