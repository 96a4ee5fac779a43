"""Per-group centroid partials (functions/similarity.py) and deterministic
hash sampling (functions/selection.py) — pins partial additivity across
batch splits, float32→int64 quantization, and repartition-stable sampling."""

import numpy as np
import pyarrow as pa
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
