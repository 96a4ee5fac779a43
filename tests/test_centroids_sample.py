"""Per-group centroid partials (functions/similarity.py) and deterministic
hash sampling (functions/selection.py) — pins partial additivity across
batch splits, float32→int64 quantization, and repartition-stable sampling."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_watermark_removal_otsu_inpaint_ray.functions.selection import (
    LEHMER_MOD,
    LEHMER_MULT,
    hash_sample,
)
from pdf_watermark_removal_otsu_inpaint_ray.functions.similarity import (
    centroid_partials,
    group_centroids,
)


def _emb_table(n, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim)).astype(np.float32)
    flat = pa.array(m.reshape(-1), pa.float32())
    off = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    return (
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.ListArray.from_arrays(off, flat),
                "label": pa.array(rng.integers(0, 4, n), pa.int64()),
            }
        ),
        m,
    )


def test_centroid_partials_additive_and_exact():
    tbl, m = _emb_table(60)
    labels = np.asarray(tbl["label"], np.int64)
    q = np.floor(m.astype(np.float64) * 10_000 + 0.5).astype(np.int64)
    whole = centroid_partials(tbl)
    halves = [centroid_partials(tbl.slice(0, 25)), centroid_partials(tbl.slice(25))]
    merged = {}
    for t in halves:
        for lab, d, s, n in zip(
            t["label"].to_pylist(), t["dim"].to_pylist(),
            t["sum_c"].to_pylist(), t["n_vecs"].to_pylist(),
        ):
            cur = merged.get((lab, d), (0, 0))
            merged[(lab, d)] = (cur[0] + s, cur[1] + n)
    for lab, d, s, n in zip(
        whole["label"].to_pylist(), whole["dim"].to_pylist(),
        whole["sum_c"].to_pylist(), whole["n_vecs"].to_pylist(),
    ):
        sel = labels == lab
        assert s == int(q[sel, d].sum())
        assert n == int(sel.sum())
        assert merged[(lab, d)] == (s, n)


def test_group_centroids_distributed(ray_session):
    tbl, m = _emb_table(200, seed=3)
    labels = np.asarray(tbl["label"], np.int64)
    q = np.floor(m.astype(np.float64) * 10_000 + 0.5).astype(np.int64)
    out = (
        group_centroids(ray.data.from_arrow(tbl).repartition(5))
        .to_pandas()
        .sort_values(["label", "dim"], ignore_index=True)
    )
    for _, row in out.iterrows():
        sel = labels == row["label"]
        assert row["sum_c"] == q[sel, int(row["dim"])].sum()
        assert row["n_vecs"] == sel.sum()


def test_hash_sample_deterministic_and_partition_stable(ray_session):
    ids = np.arange(1000, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
    expect = ids[((ids * LEHMER_MULT) % LEHMER_MOD) % 100 < 20].tolist()
    for parts in (1, 7):
        got = sorted(
            hash_sample(ray.data.from_arrow(tbl).repartition(parts), rate_pct=20)
            .to_pandas()["doc_id"]
            .tolist()
        )
        assert got == expect
    assert 100 < len(expect) < 300  # roughly 20%


def _split_spec(ids, groups, c1=80, c2=90):
    """Per-row Python spec of stratified_split."""
    import collections

    by_g = collections.defaultdict(list)
    for i, g in zip(ids, groups):
        by_g[g].append(i)
    out = {}
    for g, ks in by_g.items():
        ks = sorted(ks, key=lambda k: ((k * LEHMER_MULT) % LEHMER_MOD, k))
        n = len(ks)
        for r, k in enumerate(ks):
            out[k] = (
                "train" if r * 100 < c1 * n else "valid" if r * 100 < c2 * n else "test"
            )
    return out


def test_stratified_split_exact_proportions_and_stability(ray_session):
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.selection import (
        stratified_split,
    )

    rng = np.random.default_rng(7)
    n = 1000
    ids = rng.permutation(n).astype(np.int64)
    groups = np.array([f"g{i % 7}" for i in rng.integers(0, 7, n)], dtype=object)
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "source": pa.array(groups.tolist())}
    )
    spec = _split_spec(ids.tolist(), groups.tolist())

    def run(nblocks):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        df = stratified_split(ds, group="source", key="doc_id").to_pandas()
        return dict(zip(df["doc_id"], df["split"]))

    a, b = run(1), run(13)
    assert a == spec  # matches the per-row spec exactly
    assert a == b  # partition-layout independent
    # exact per-group proportions: ceil cuts of the integer rule
    import collections

    per = collections.defaultdict(lambda: collections.Counter())
    for k, s in a.items():
        per[dict(zip(ids.tolist(), groups.tolist()))[k]][s] += 1
    for g, cnt in per.items():
        ng = sum(cnt.values())
        n_train = sum(1 for r in range(ng) if r * 100 < 80 * ng)
        n_valid = sum(1 for r in range(ng) if 80 * ng <= r * 100 < 90 * ng)
        assert cnt["train"] == n_train, (g, cnt, ng)
        assert cnt["valid"] == n_valid, (g, cnt, ng)


def test_tumbling_distinct_users_matches_brute(ray_session):
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.windows import (
        tumbling_distinct_users,
    )

    rng = np.random.default_rng(3)
    n = 5000
    us = rng.integers(0, 10 * 3_600_000_000, n)
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    users = rng.integers(0, 40, n).astype(np.int64)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types.tolist()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(9)
    got = tumbling_distinct_users(ds).to_pandas()
    brute = {}
    for t, u, uid in zip(types, us, users):
        brute.setdefault((t, u // 3_600_000_000), set()).add(uid)
    want = {(t, w): len(s) for (t, w), s in brute.items()}
    got_map = {
        (r.event_type, r.window_id): r.n_users for r in got.itertuples()
    }
    assert got_map == want


def test_lehmer_ops_reject_negative_keys(ray_session):
    """Review finding: numpy % and SQL % disagree on negative dividends, so
    the Lehmer twins must fail loudly on negative keys instead of silently
    diverging from their oracles."""
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.selection import (
        hash_sample,
        stratified_split,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([3, -1, 7], pa.int64()),
            "source": pa.array(["a", "a", "b"]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(Exception, match="non-negative"):
        hash_sample(ds, key="doc_id").to_pandas()
    with pytest.raises(Exception, match="non-negative"):
        stratified_split(ds, group="source", key="doc_id").to_pandas()
