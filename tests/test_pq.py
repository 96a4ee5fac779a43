"""Product quantization (functions/similarity.py::PqIndex): distributed
encode+ADC-search vs the independently reimplemented single-process twin
(oracle_data._golden_pq_topk spec), batch-layout invariance, exact-duplicate
retrieval, and the compression contract (codes are m uint8 per row)."""

import numpy as np
import pyarrow as pa
import ray.data

from pdf_watermark_removal_otsu_inpaint_ray.functions.similarity import PqIndex


def _corpus(n=600, d=32, seed=11):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, d)).astype(np.float32)
    # plant an exact duplicate of row 0 far from the start
    M[n - 3] = M[0]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.array([r.tolist() for r in M], pa.list_(pa.float32())),
        }
    )


def _brute_adc(tbl: pa.Table, idx: PqIndex, q: np.ndarray, k: int) -> list:
    """Brute twin sharing only the documented integer spec (recomputes the
    codes and distances with plain numpy, no engine batch path)."""
    ids = np.asarray(tbl["vec_id"], np.int64)
    M = np.asarray(tbl["embedding"].combine_chunks().flatten(), np.float64).reshape(
        len(ids), -1
    )
    m, sub = idx.m, M.shape[1] // idx.m
    Xq = np.floor(M * idx.x_scale + 0.5).astype(np.int64).reshape(len(ids), m, sub)
    codes = np.empty((len(ids), m), np.int64)
    for mi in range(m):
        C = idx.codebooks[mi]
        d2 = np.einsum("ij,ij->i", C, C)
        codes[:, mi] = np.argmin(d2[None, :] - 2 * ((100 * Xq[:, mi, :]) @ C.T), axis=1)
    qq = np.floor(np.asarray(q, np.float64) * idx.x_scale + 0.5).astype(np.int64)
    qq = qq.reshape(m, sub)
    lut = np.stack(
        [
            np.einsum(
                "ij,ij->i",
                100 * qq[mi][None, :] - idx.codebooks[mi],
                100 * qq[mi][None, :] - idx.codebooks[mi],
            )
            for mi in range(m)
        ]
    )
    dist = lut[np.arange(m)[None, :], codes].sum(axis=1)
    sel = np.lexsort((ids, dist))[:k]
    return list(zip(ids[sel].tolist(), dist[sel].tolist()))


def test_pq_matches_brute_and_is_layout_invariant(ray_session):
    tbl = _corpus()
    M = np.asarray(tbl["embedding"].combine_chunks().flatten(), np.float64).reshape(
        tbl.num_rows, -1
    )
    idx = PqIndex(m=4, k_codes=16, iters=3).fit(M[:128])
    q = M[0]
    exp = _brute_adc(tbl, idx, q, k=7)
    outs = []
    for nblocks in (1, 5, 13):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        res = idx.search(idx.encode(ds), q, k=7).to_pandas()
        outs.append(list(zip(res["vec_id"].tolist(), res["adc_dist"].tolist())))
        assert res["rank"].tolist() == list(range(1, 8))
    assert outs[0] == outs[1] == outs[2] == exp


def test_pq_exact_duplicate_retrieved_with_query(ray_session):
    tbl = _corpus()
    M = np.asarray(tbl["embedding"].combine_chunks().flatten(), np.float64).reshape(
        tbl.num_rows, -1
    )
    idx = PqIndex(m=4, k_codes=16, iters=3).fit(M[:128])
    res = idx.search(idx.encode(ray.data.from_arrow(tbl)), M[0], k=5).to_pandas()
    got = res["vec_id"].tolist()
    # row 0 and its planted duplicate share codes, hence identical ADC
    # distance (the minimum) — tie-break puts 0 first, dup second
    assert got[0] == 0 and got[1] == tbl.num_rows - 3
    assert res["adc_dist"][0] == res["adc_dist"][1]


def test_pq_codes_are_m_uint8_per_row(ray_session):
    tbl = _corpus(n=100)
    M = np.asarray(tbl["embedding"].combine_chunks().flatten(), np.float64).reshape(
        100, -1
    )
    idx = PqIndex(m=8, k_codes=16, iters=2).fit(M[:64])
    enc = idx.encode(ray.data.from_arrow(tbl))
    t = pa.Table.from_pandas(enc.to_pandas())
    lens = {len(c) for c in t["codes"].to_pylist()}
    assert lens == {8}
    vals = np.concatenate([np.asarray(c) for c in t["codes"].to_pylist()])
    assert vals.min() >= 0 and vals.max() < 16
