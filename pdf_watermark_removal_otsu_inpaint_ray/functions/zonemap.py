"""Zone-map (min/max) data skipping over a value-clustered Parquet layout.

The warehouse storage primitive the IVF index applies to embeddings,
applied to a SCALAR column: cluster rows into fixed value-range buckets
(the Parquet partition key), record each bucket's exact min/max in a
manifest, and answer range predicates by reading ONLY the overlapping
buckets' files from storage — the scan is pruned at the source, not
filtered after a full read.  This is the Iceberg/Delta zone-map /
clustering-key pattern; at 100 TB the pruned read is the difference
between touching 1/K of the files and touching all of them.

Build is one streaming pass (global min/max aggregate -> equal-width
bucket assignment -> partitioned write) plus an exact per-bucket min/max
manifest computed from bucket arithmetic; layouts publish atomically
(tmp dir + rename + _SUCCESS) and cache by source-content fingerprint —
the same protocol as the IVF layout (queries.q_knn_ivf).

Reference analog: the page-subset predicate pushdown (`cli.py:151-171` →
only selected pages are rendered) — skip work at the READ, not after.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def build_zonemap_layout(ds, path: str, *, value_col: str, num_buckets: int = 16) -> str:
    """Cluster ``ds`` into ``num_buckets`` equal-width value ranges and
    write ``path/zm_part=K/`` plus a ``zonemap.json`` manifest holding each
    bucket's [lo, hi) range.  One extra streaming pass for the global
    min/max; rows never sort globally (bucketing is a stateless map)."""
    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(Min(value_col), Max(value_col))
    vmin = float(stats[f"min({value_col})"])
    vmax = float(stats[f"max({value_col})"])
    width = (vmax - vmin) / num_buckets or 1.0

    def assign(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col], np.float64)
        part = np.clip(((v - vmin) / width).astype(np.int64), 0, num_buckets - 1)
        return b.append_column("zm_part", pa.array(part, pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        path, partition_cols=["zm_part"]
    )
    manifest = {
        "value_col": value_col,
        "num_buckets": num_buckets,
        "vmin": vmin,
        "vmax": vmax,
        "width": width,
        # exact bucket bounds: bucket k covers [vmin + k*w, vmin + (k+1)*w),
        # except the last, which is closed above (np.clip)
        "bounds": [
            [vmin + k * width, vmin + (k + 1) * width] for k in range(num_buckets)
        ],
    }
    with open(os.path.join(path, "zonemap.json"), "w") as f:
        json.dump(manifest, f)
    return path


def pruned_paths(path: str, lo: float, hi: float) -> tuple[list[str], int]:
    """Parquet files of the buckets overlapping [lo, hi] and the TOTAL
    bucket-dir count (so callers can assert real pruning happened)."""
    with open(os.path.join(path, "zonemap.json")) as f:
        m = json.load(f)
    files: list[str] = []
    n_dirs = 0
    hit_dirs = 0
    for k, (blo, bhi) in enumerate(m["bounds"]):
        d = os.path.join(path, f"zm_part={k}")
        if not os.path.isdir(d):
            continue
        n_dirs += 1
        # overlap test: bucket k may hold values in [blo, bhi] (last bucket
        # closed above by the clip; using the closed interval everywhere is
        # conservative — never prunes a file that could match)
        if bhi < lo or blo > hi:
            continue
        hit_dirs += 1
        files.extend(
            sorted(
                os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
            )
        )
    return files, n_dirs - hit_dirs


def zonemap_range_scan(path: str, lo: float, hi: float, columns: list | None = None):
    """Range scan over a zonemap layout: read ONLY overlapping buckets'
    files, then apply the exact residual filter.  Returns (Dataset,
    n_pruned_dirs)."""
    import ray.data

    with open(os.path.join(path, "zonemap.json")) as f:
        m = json.load(f)
    value_col = m["value_col"]
    files, n_pruned = pruned_paths(path, lo, hi)
    if not files:
        return None, n_pruned

    cols = columns if columns is None else list(dict.fromkeys([*columns, value_col]))
    ds = ray.data.read_parquet(files, columns=cols)

    def residual(b: pa.Table) -> pa.Table:
        v = np.asarray(b[value_col], np.float64)
        keep = (v >= lo) & (v <= hi)
        out = b.filter(pa.array(keep))
        if "zm_part" in out.column_names:
            out = out.drop_columns(["zm_part"])
        return out

    return ds.map_batches(residual, batch_format="pyarrow"), n_pruned
