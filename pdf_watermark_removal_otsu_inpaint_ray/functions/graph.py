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


def connected_components_distributed(
    pairs, *, num_parts: int = 32, max_iters: int = 30
) -> pa.Table:
    """Distributed connected components by iterative MIN-LABEL PROPAGATION
    — the scale path :func:`..dedup.connected_components`'s docstring
    promises for pair sets that outgrow the driver ("run iterative label
    propagation as repeated repartition joins").  Input: an (a, b) pair
    Dataset (or Table); output: one (doc_id, cluster_id, keep) row per
    node, cluster_id = the component's minimum id, keep = 1 on the
    canonical node — identical to the driver union-find.

    Per iteration (all edge-scale, never driver-resident):
      1. labels (id, lab) UNION the static bidirectional edge set (u, v),
         both keyed by hash(id|u) into ``num_parts`` coarse partitions, so
         every edge is co-located with its source's CURRENT label;
      2. one vectorized ``map_groups`` per partition emits each edge's
         candidate (v, lab(u)), the label pass-through (id, lab), and —
         for every non-root — a GRANDPARENT REQUEST addressed to lab(id)
         (encoded as a negative candidate, no extra column);
      3. a second coarse partition on the TARGET id folds candidates with
         one lexsort + run-boundary min per partition → new labels, and
         answers each request with the target's NEW label — a (requester,
         lab(lab(requester))) response row that joins the requester's fold
         NEXT round.
    The responses are pointer-halving (the MapReduce-CC trick of Rastogi
    et al.'s Hash-to-Min family): label depth roughly halves per round, so
    convergence needs ~log2(diameter) + 2 rounds, not diameter rounds —
    measured 4 rounds where plain neighbor propagation took 10+ on the
    sf0.1 near-dup chains.  Labels only decrease, so ``sum(lab)`` (an
    int64 scalar partial per batch, driver-folded at partition scale) is
    monotone, and ONE full unchanged round implies the labeling is flat
    (every pending response was already ≥ its target's label) and
    edge-constant — i.e. exactly the component minima — so ``sum
    unchanged ⟺ converged`` remains a sound termination probe.

    The per-iteration label Dataset is ``materialize()``d — node-scale,
    NOT corpus-scale (ids only); at 10^11 nodes stage each generation to
    Parquet instead (the same escape noted for the PageRank edge pin).

    Reference analog: cross-page accumulation (T2) run to fixed point;
    the min-id canonical-member rule mirrors the dedup keep-first
    contract (cli.py dedup spans)."""
    import pandas as pd

    import ray.data

    if isinstance(pairs, pa.Table):
        pairs = ray.data.from_arrow(pairs)

    def to_edges(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a"], np.int64)
        bb = np.asarray(b["b"], np.int64)
        u = np.concatenate([a, bb])
        v = np.concatenate([bb, a])
        pk = (
            (u.astype(np.uint64) * _MIX) >> np.uint64(40)
        ).astype(np.int64) % num_parts
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "val": pa.array(v, pa.int64()),
                "kind": pa.array(np.ones(u.size, np.int8), pa.int8()),
                "pk": pa.array(pk, pa.int64()),
            }
        )

    # coalesce to num_parts blocks ONCE: the edge set is re-unioned every
    # round, and a sliver-blocked upstream (e.g. a materialized join
    # output) would otherwise re-pay per-block task overhead per round
    edges = (
        pairs.map_batches(to_edges, batch_format="pyarrow")
        .repartition(num_parts)
        .materialize()
    )

    def seed_partial(b: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(b["key"], np.int64))
        pk = (
            (ids.astype(np.uint64) * _MIX) >> np.uint64(40)
        ).astype(np.int64) % num_parts
        return pa.table(
            {
                "key": pa.array(ids, pa.int64()),
                "val": pa.array(ids, pa.int64()),
                "kind": pa.array(np.zeros(ids.size, np.int8), pa.int8()),
                "pk": pa.array(pk, pa.int64()),
            }
        )

    def dedup_ids(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["key"].to_numpy().astype(np.int64))
        pk = (
            (ids.astype(np.uint64) * _MIX) >> np.uint64(40)
        ).astype(np.int64) % num_parts
        # emit an ARROW table: the per-iteration ``union`` with the arrow
        # edge blocks requires homogeneous block types
        return pa.table(
            {
                "key": pa.array(ids, pa.int64()),
                "val": pa.array(ids, pa.int64()),
                "kind": pa.array(np.zeros(ids.size, np.int8), pa.int8()),
                "pk": pa.array(pk, pa.int64()),
            }
        )

    labels = (
        edges.map_batches(seed_partial, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(dedup_ids, batch_format="pandas")
        .materialize()
    )

    def spread(g: pd.DataFrame) -> pd.DataFrame:
        k = g["key"].to_numpy().astype(np.int64)
        v = g["val"].to_numpy().astype(np.int64)
        kind = g["kind"].to_numpy().astype(np.int64)
        lmask = kind == 0
        lk, lv = k[lmask], v[lmask]
        o = np.argsort(lk)
        lk, lv = lk[o], lv[o]
        emask = kind == 1
        eu, ev = k[emask], v[emask]
        pos = np.searchsorted(lk, eu)
        # every edge source has a label in ITS OWN partition by
        # construction (same hash); a miss is a partitioning bug
        assert pos.size == 0 or (
            (pos < lk.size).all() and (lk[np.minimum(pos, lk.size - 1)] == eu).all()
        )
        cand = lv[pos] if pos.size else lv[:0]
        # kind-2 response rows: last round's lab(lab(id)) answers, applied
        # as plain candidates at their requester's fold
        rmask = kind == 2
        rk, rv = k[rmask], v[rmask]
        # grandparent requests: every non-root asks its label's partition
        # for lab(lab(id)); encoded as a NEGATIVE candidate (-id - 1)
        # addressed to target = lab(id) — ids are non-negative, so the
        # sign bit is a free discriminator
        qmask = lv != lk
        tgt = np.concatenate([lk, ev, rk, lv[qmask]])
        cnd = np.concatenate([lv, cand, rv, -lk[qmask] - 1])
        pk = (
            (tgt.astype(np.uint64) * _MIX) >> np.uint64(40)
        ).astype(np.int64) % num_parts
        return pd.DataFrame({"target": tgt, "cand": cnd, "pk2": pk})

    def minfold(g: pd.DataFrame) -> pd.DataFrame:
        t = g["target"].to_numpy().astype(np.int64)
        c = g["cand"].to_numpy().astype(np.int64)
        o = np.lexsort((c, t))
        t, c = t[o], c[o]
        # requests sort FIRST within a target (negative); the new label of
        # a target is its smallest NON-NEGATIVE candidate — every node
        # always has one (its own pass-through)
        req = c < 0
        tr, requester = t[req], -c[req] - 1
        t2, c2 = t[~req], c[~req]
        first = np.concatenate(([True], t2[1:] != t2[:-1]))
        tk, nv = t2[first], c2[first]
        pk = (
            (tk.astype(np.uint64) * _MIX) >> np.uint64(40)
        ).astype(np.int64) % num_parts
        # answer each request with the target's NEW label; delivered to
        # the requester's partition as a kind-2 candidate for next round
        rpos = np.searchsorted(tk, tr)
        assert rpos.size == 0 or (
            (rpos < tk.size).all() and (tk[np.minimum(rpos, tk.size - 1)] == tr).all()
        )
        resp = nv[rpos] if rpos.size else nv[:0]
        rpk = (
            (requester.astype(np.uint64) * _MIX) >> np.uint64(40)
        ).astype(np.int64) % num_parts
        return pa.table(
            {
                "key": pa.array(np.concatenate([tk, requester]), pa.int64()),
                "val": pa.array(np.concatenate([nv, resp]), pa.int64()),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(tk.size, np.int8), np.full(requester.size, 2, np.int8)]
                    ),
                    pa.int8(),
                ),
                "pk": pa.array(np.concatenate([pk, rpk]), pa.int64()),
            }
        )

    def sum_partial(b: pa.Table) -> pa.Table:
        kind = np.asarray(b["kind"], np.int64)
        v = np.asarray(b["val"], np.int64)[kind == 0]
        return pa.table(
            {
                "s": pa.array([int(v.sum())], pa.int64()),
                "n": pa.array([v.size], pa.int64()),
            }
        )

    def label_sum(lab_ds) -> tuple[int, int]:
        p = lab_ds.map_batches(sum_partial, batch_format="pyarrow").to_pandas()
        if "s" not in p.columns:  # zero blocks: empty pair set
            return 0, 0
        return int(p["s"].sum()), int(p["n"].sum())

    prev_sum, n_nodes = label_sum(labels)
    if n_nodes == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "keep": pa.array([], pa.int64()),
            }
        )
    for _round in range(max_iters):
        labels = (
            labels.union(edges)
            .groupby("pk")
            .map_groups(spread, batch_format="pandas")
            .groupby("pk2")
            .map_groups(minfold, batch_format="pandas")
            .materialize()
        )
        if _round == 0:
            # round 0 always lowers some label when any pair exists (a != b
            # by construction), so the probe pass is pure overhead here
            continue
        cur_sum, cur_n = label_sum(labels)
        assert cur_n == n_nodes, (cur_n, n_nodes)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds "
            "(adversarially deep graph — use star contraction)"
        )

    import pyarrow.compute as pc

    def only_labels(b: pa.Table) -> pa.Table:
        m = pc.equal(b["kind"], 0)
        return b.filter(m).select(["key", "val"])

    out = labels.map_batches(only_labels, batch_format="pyarrow").to_pandas()
    ids = out["key"].to_numpy().astype(np.int64)
    lab = out["val"].to_numpy().astype(np.int64)
    o = np.argsort(ids)
    ids, lab = ids[o], lab[o]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(lab, pa.int64()),
            "keep": pa.array((ids == lab).astype(np.int64), pa.int64()),
        }
    )
