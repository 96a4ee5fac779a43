"""embedding_near_dup angular block pruning (r4): the spherical triangle
inequality prune must change the BLOCK-PAIR fan-out, never the pair set —
clustered corpora prune, uniform data degrades gracefully to all pairs."""

import numpy as np
import pyarrow as pa
import ray


def _brute_pairs(ids, M, threshold):
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    S = Mn @ Mn.T
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if S[i, j] >= threshold:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def _tbl(ids, M):
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in M], pa.list_(pa.float64())
            ),
        }
    )


def test_pruned_equals_brute_on_clustered(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        embedding_near_dup,
    )

    rng = np.random.default_rng(3)
    d = 16
    # two tight clusters around near-orthogonal directions
    c1 = np.eye(d)[0]
    c2 = np.eye(d)[1]
    A = c1 + rng.normal(0, 0.02, (60, d))
    B = c2 + rng.normal(0, 0.02, (60, d))
    M = np.vstack([A, B])
    ids = np.arange(len(M), dtype=np.int64)
    want = _brute_pairs(ids, M, 0.9)
    assert want, "clusters must produce qualifying pairs"
    stats = {}
    out = embedding_near_dup(
        ray.data.from_arrow(_tbl(ids, M)).repartition(6),
        threshold=0.9,
        stats_out=stats,
    )
    got = {(r["a"], r["b"]) for r in out.to_pylist()}
    assert got == want
    # cross-cluster block pairs are angularly impossible at 0.9 — some
    # fan-out must have been pruned
    assert stats["block_pairs_pruned"] > 0, stats
    assert stats["block_pairs_total"] > stats["block_pairs_pruned"]


def test_uniform_data_prunes_nothing_and_stays_exact(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        embedding_near_dup,
    )

    rng = np.random.default_rng(9)
    M = rng.normal(0, 1, (50, 8))
    ids = np.arange(50, dtype=np.int64)
    want = _brute_pairs(ids, M, 0.5)
    stats = {}
    out = embedding_near_dup(
        ray.data.from_arrow(_tbl(ids, M)).repartition(4),
        threshold=0.5,
        stats_out=stats,
    )
    got = {(r["a"], r["b"]) for r in out.to_pylist()}
    assert got == want
    # isotropic data: block summaries cover the sphere, nothing prunable
    assert stats["block_pairs_pruned"] == 0, stats


def test_stripe_ownership_partitions_all_pairs():
    """The stripe rule ((i+j) % B == t, j >= i) must partition the full
    upper-triangle pair set exactly — every pair owned once, stripe loads
    balanced to ceil(B/2) or less... actually floor(B/2)+1 max."""
    import numpy as np

    for B in range(1, 12):
        seen = {}
        sizes = []
        for t in range(B):
            ii = np.arange(B, dtype=np.int64)
            jj = (t - ii) % B
            sel = jj >= ii
            pairs = list(zip(ii[sel].tolist(), jj[sel].tolist()))
            sizes.append(len(pairs))
            for p in pairs:
                assert p not in seen, (B, t, p)
                seen[p] = t
        want = {(i, j) for i in range(B) for j in range(i, B)}
        assert set(seen) == want, B
        assert max(sizes) - min(sizes) <= 1, (B, sizes)  # balanced
