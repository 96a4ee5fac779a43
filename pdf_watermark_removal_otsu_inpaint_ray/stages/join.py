"""Stateful hash join of span events against the document stream (J1).

Two physical strategies, chosen by the caller (ray_guide.md join patterns):

* **broadcast** (default when the span side fits in memory): the span table
  is collapsed to ``doc_id → [(start, stop), ...]`` padded ranges, shipped
  once via ``ray.put`` and applied inside the inpaint actors — no shuffle.
* **co-partitioned hash join** (general case): Ray Data's native
  hash-partitioned ``Dataset.join`` with an explicit partition count — the
  count is the partitioning knob and is capped at the cluster CPU count
  (each hash aggregator holds a CPU; more partitions than CPUs deadlocks
  under the streaming executor).  Salt hot doc_ids upstream if one key
  dominates.

Reference semantics being reproduced (watermark_detector.py:680-694,
744-751): the QR/motif mask is dilated (±pad) and OR-ed into the watermark
mask, exempt from background protection — here: forced flag ranges that
bypass the protect/refine chain.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def spans_to_ranges_table(events: pa.Table, pad: int) -> dict[str, np.ndarray]:
    """Span events → {doc_id: int64[k, 2] padded [start, stop) ranges}
    (clamping to [0, n_tok) happens at apply time)."""
    ids = events["doc_id"].to_pylist()
    starts = np.asarray(events["span_start"], dtype=np.int64) - pad
    stops = (
        np.asarray(events["span_start"], dtype=np.int64)
        + np.asarray(events["span_len"], dtype=np.int64)
        + pad
    )
    out: dict[str, list] = {}
    for i, d in enumerate(ids):
        out.setdefault(d, []).append((starts[i], stops[i]))
    return {d: np.asarray(v, dtype=np.int64) for d, v in out.items()}


def apply_forced_ranges(
    flag: np.ndarray,
    fb,
    doc_ids: list[str],
    ranges: dict[str, np.ndarray],
) -> np.ndarray:
    """OR padded ranges into the flag bitmap (clamped to each row)."""
    for i, d in enumerate(doc_ids):
        r = ranges.get(d)
        if r is None:
            continue
        s, e = int(fb.offsets[i]), int(fb.offsets[i + 1])
        n = e - s
        for a, b in r:
            flag[s + max(0, int(a)) : s + min(n, int(b))] = True
    return flag


def hash_join_events_documents(
    docs_ds,
    events_ds,
    *,
    num_buckets: int = 32,
    how: str = "inner",
):
    """Co-partitioned hash join: documents ⋈ span events ON doc_id.

    Uses Ray Data's native hash-partitioned ``Dataset.join`` (Ray ≥ 2.47)
    with an explicit partition count — the general-case path when the span
    side is too large to broadcast.  Returns one row per (document, matching
    span event); the span side's duplicate columns get an ``_ev`` suffix.

    The partition count is capped at the cluster CPU count: each hash
    aggregator is an actor holding a CPU, so more partitions than CPUs
    deadlocks the join under the streaming executor.
    """
    from ..functions.dedup import _join_partitions

    return docs_ds.join(
        events_ds,
        join_type=how,
        num_partitions=_join_partitions(num_buckets),
        on=("doc_id",),
        right_suffix="_ev",
    )
