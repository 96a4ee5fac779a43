"""Run metrics and summaries (A7/T5; reference stats.py:16-245).

The reference accumulates global counters in a ``ProcessingStats`` object
(pages, coverage, QR category counts, elapsed).  The engine equivalents:

* per-row metadata columns emitted by the rewrite stage (wm_token,
  coverage_pct, radius, n_passes) — aggregated here with grouped partials;
* per-partition row counts + fingerprints in the sink's lineage manifests
  (the north star's per-partition throughput record);
* Ray Data's own ``ds.stats()`` for stage wall/cpu breakdowns.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


def summarize_output(ds) -> dict:
    """Global + per-source run summary from the rewritten stream's metadata
    columns (streamed aggregation; nothing materializes)."""
    from ray.data.aggregate import Count, Max, Mean, Sum

    per_source = (
        ds.groupby("source")
        .aggregate(
            Count(alias_name="rows"),
            Mean("coverage_pct", alias_name="mean_coverage_pct"),
            Sum("n_passes", alias_name="total_passes"),
            Max("radius", alias_name="max_radius"),
        )
        .to_pandas()
    )
    totals = {
        "rows": int(per_source["rows"].sum()),
        "sources": int(len(per_source)),
        "mean_coverage_pct": float(
            (per_source["mean_coverage_pct"] * per_source["rows"]).sum()
            / max(1, per_source["rows"].sum())
        ),
    }
    return {"totals": totals, "per_source": per_source.to_dict("records")}


def manifest_metrics(out_dir: str) -> dict:
    """Per-partition lineage/throughput record from the sink manifests."""
    mdir = os.path.join(out_dir, "_manifests")
    parts = []
    if os.path.isdir(mdir):
        for f in sorted(os.listdir(mdir)):
            # per-partition manifests only (the dir also holds _layout.json)
            if f.startswith("part-") and f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    parts.append(json.load(fh))
    rows = [p.get("row_count", 0) for p in parts]
    return {
        "partitions": len(parts),
        "committed": sum(1 for p in parts if p.get("committed")),
        "total_rows": int(sum(rows)),
        "rows_per_partition_min": int(min(rows)) if rows else 0,
        "rows_per_partition_max": int(max(rows)) if rows else 0,
        "skew_ratio": (max(rows) / max(1, min(rows))) if rows else 0.0,
        "manifests": parts,
    }


def category_counts(events: pa.Table) -> dict[str, int]:
    """QR-analog category counts (stats.py:90-102)."""
    cats = events["category"].to_pylist() if events.num_rows else []
    vals, counts = np.unique(np.asarray(cats, dtype=object), return_counts=True)
    return {str(v): int(c) for v, c in zip(vals, counts)}
