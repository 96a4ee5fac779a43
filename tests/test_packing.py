"""Distributed ordered prefix scan (functions/packing.py::pack_sequences)
vs a serial cumsum — pins cross-bucket offset stitching, multi-group
re-zeroing, sparse/non-dense order keys, and partition independence."""

import numpy as np
import pyarrow as pa
import ray


def _brute(ids, groups, vals, capacity):
    out = {}
    for g in set(groups):
        run = 0
        for i in sorted(np.nonzero(np.array(groups, dtype=object) == g)[0], key=lambda j: ids[j]):
            out[ids[j := i]] = (run, run // capacity)
            run += vals[i]
    return out


def test_pack_sequences_matches_serial_scan(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import (
        pack_sequences,
    )

    rng = np.random.default_rng(5)
    n = 400
    # sparse ids spanning many >>4-bit buckets, duplicated groups
    ids = np.sort(rng.choice(np.arange(0, 500_000, 7), n, replace=False)).astype(np.int64)
    groups = rng.choice(["a", "b", "c"], n).tolist()
    vals = rng.integers(1, 900, n).astype(np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(groups, pa.string()),
            "n_chars": pa.array(vals, pa.int64()),
        }
    )
    expect = _brute(ids.tolist(), groups, vals.tolist(), 1000)
    for parts in (2, 9):
        out = (
            pack_sequences(
                ray.data.from_arrow(tbl).repartition(parts),
                capacity=1000,
                bucket_bits=8,  # many buckets → exercises offset stitching
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert len(out) == n
        for _, r in out.iterrows():
            tb, b = expect[r["doc_id"]]
            assert (r["tok_before"], r["bin"]) == (tb, b), r["doc_id"]
