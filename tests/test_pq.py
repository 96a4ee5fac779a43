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


def _brute_ivfpq(tbl: pa.Table, idx, q: np.ndarray, k: int):
    """Brute twin of IvfPqIndex.search: plain-numpy assignment, residual
    encode, per-probe LUT, top-k (shares only the fitted codebooks)."""
    ids = np.asarray(tbl["vec_id"], np.int64)
    M = np.asarray(tbl["embedding"].combine_chunks().flatten(), np.float64).reshape(
        len(ids), -1
    )
    C, books = idx.coarse.centroids, idx.pq.codebooks
    m, sub = idx.pq.m, M.shape[1] // idx.pq.m
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    part = np.argmax(Mn @ C.T, axis=1)
    R = np.floor((Mn - C[part]) * idx.pq.x_scale + 0.5).astype(np.int64)
    R = R.reshape(len(ids), m, sub)
    codes = np.empty((len(ids), m), np.int64)
    for mi in range(m):
        B = books[mi]
        d2 = np.einsum("ij,ij->i", B, B)
        codes[:, mi] = np.argmin(d2[None, :] - 2 * ((100 * R[:, mi, :]) @ B.T), axis=1)
    qn = q / max(np.linalg.norm(q), 1e-30)
    probes = np.argsort(-(C @ qn))[: idx.coarse.n_probe]
    out_i, out_d = [], []
    for p in probes:
        qr = np.floor((qn - C[p]) * idx.pq.x_scale + 0.5).astype(np.int64).reshape(m, sub)
        lut = np.stack(
            [
                np.einsum("ij,ij->i", 100 * qr[mi][None, :] - books[mi],
                          100 * qr[mi][None, :] - books[mi])
                for mi in range(m)
            ]
        )
        rows = np.nonzero(part == p)[0]
        if rows.size:
            out_i.append(ids[rows])
            out_d.append(lut[np.arange(m)[None, :], codes[rows]].sum(axis=1))
    ai = np.concatenate(out_i)
    ad = np.concatenate(out_d)
    sel = np.lexsort((ai, ad))[:k]
    return list(zip(ai[sel].tolist(), ad[sel].tolist()))


def test_ivfpq_matches_brute_and_is_layout_invariant(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.similarity import IvfPqIndex

    tbl = _corpus(n=800, d=32, seed=17)
    M = np.asarray(tbl["embedding"].combine_chunks().flatten(), np.float64).reshape(
        tbl.num_rows, -1
    )
    idx = IvfPqIndex(n_list=6, n_probe=2, m=4, k_codes=16, iters=3).fit(M[:200])
    q = M[5]
    exp = _brute_ivfpq(tbl, idx, q, k=8)
    for nblocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        res = idx.search(idx.encode(ds), q, k=8).to_pandas()
        got = list(zip(res["vec_id"].astype(int), res["adc_dist"].astype(int)))
        assert got == exp, f"nblocks={nblocks}"
        assert res["rank"].tolist() == list(range(1, len(got) + 1))
    # the query vector itself lands in a probed partition with the minimal
    # quantization distance of its own code
    assert exp[0][0] == 5 or 5 in [i for i, _ in exp]


def test_ivfpq_partitioned_search_matches_inmemory(ray_session, tmp_path):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.similarity import IvfPqIndex

    tbl = _corpus(n=500, d=32, seed=23)
    M = np.asarray(tbl["embedding"].combine_chunks().flatten(), np.float64).reshape(
        tbl.num_rows, -1
    )
    idx = IvfPqIndex(n_list=5, n_probe=2, m=4, k_codes=16, iters=2).fit(M[:128])
    q = M[9]
    mem = idx.search(idx.encode(ray.data.from_arrow(tbl)), q, k=6).to_pandas()
    layout = str(tmp_path / "ivfpq")
    idx.write_partitioned(ray.data.from_arrow(tbl), layout)
    disk = idx.search_partitioned(layout, q, k=6).to_pandas()
    assert disk.equals(mem)
    # pruning is real: only the probed partition dirs are read
    import os

    parts = [d for d in os.listdir(layout) if d.startswith("ivf_part=")]
    assert len(parts) >= 3  # more partitions exist than are probed
    assert len(idx.coarse.probe_paths(layout, q / np.linalg.norm(q))) < len(parts) or \
        idx.coarse.n_probe >= len(parts)
