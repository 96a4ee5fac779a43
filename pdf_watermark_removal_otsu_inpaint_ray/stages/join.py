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

from ..config import scaled_parts

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


def salted_skew_join(
    probe_ds,
    build_ds,
    *,
    on: str,
    probe_keys_ds=None,
    salt: int = 8,
    hot_capacity: int = 64,
    num_partitions: int | None = None,
):
    """Skew-aware inner equi-join — the Spark-AQE skew-join analog,
    expressed Ray-Data-first for Zipf-keyed fact tables where one hot key
    would otherwise pin an entire hash partition on one worker.

    1. **Hot-key detection** (routing-only — the JOIN RESULT is identical
       for ANY candidate set, so the approximation is free): Misra–Gries
       partials over the probe key (``functions.sketch._mg_summary``,
       mergeable per Agarwal et al. PODS'12), folded driver-side from
       fixed-size per-batch summaries.  Pass ``probe_keys_ds`` as a
       column-pruned read of JUST the key so the detection scan never
       touches payload bytes.
    2. **Salting**: build rows whose key is hot replicate ``salt`` ways
       (one copy per salt value); probe rows with hot keys scatter across
       the ``salt`` values; all cold rows ride salt 0 untouched.  The hot
       key's probe rows now spread over ``salt`` hash partitions instead
       of one.
    3. ONE native co-partitioned ``Dataset.join`` on ``(key, _salt)`` —
       single scan of each side, no driver-side row collection, partition
       count capped at cluster CPUs (deadlock guard, functions/dedup.py::
       _join_partitions).

    Reference analog: the per-page QR-span join (`qr_detector.py:226-400`
    joined back to pages in `cli.py:905-945`) has the same one-document-
    dominates skew when a single PDF holds most spans.

    Assumes an int64 join key (hash string keys upstream) and that
    neither side carries a ``_salt`` column.
    """
    num_partitions = scaled_parts(32, num_partitions)
    import pyarrow.compute as pc

    from ..functions.dedup import _join_partitions
    from ..functions.sketch import _mg_summary

    def mg_partials(b: pa.Table) -> pa.Table:
        k = np.asarray(b[on], np.int64)
        uk, cnt = np.unique(k, return_counts=True)
        keys, counts = _mg_summary(uk, cnt.astype(np.int64), hot_capacity)
        return pa.table(
            {"key": pa.array(keys, pa.int64()), "cnt": pa.array(counts, pa.int64())}
        )

    keys_src = probe_keys_ds if probe_keys_ds is not None else probe_ds
    parts = keys_src.map_batches(mg_partials, batch_format="pyarrow").take_all()
    if parts:
        ak = np.array([r["key"] for r in parts], np.int64)
        ac = np.array([r["cnt"] for r in parts], np.int64)
        uk, inv = np.unique(ak, return_inverse=True)
        merged = np.bincount(inv, weights=ac).astype(np.int64)
        hot_keys, _ = _mg_summary(uk, merged, hot_capacity)
    else:
        hot_keys = np.zeros(0, np.int64)
    hot_arr = pa.array(np.sort(hot_keys), pa.int64())

    def salt_build(b: pa.Table) -> pa.Table:
        hot = np.asarray(
            pc.is_in(b[on].combine_chunks(), value_set=hot_arr), bool
        )
        n = b.num_rows
        # cold rows once (salt 0); hot rows replicated salt ways
        take = np.concatenate(
            [np.nonzero(~hot)[0]] + [np.nonzero(hot)[0]] * salt
        )
        salts = np.concatenate(
            [np.zeros(int((~hot).sum()), np.int64)]
            + [np.full(int(hot.sum()), s, np.int64) for s in range(salt)]
        )
        out = b.take(pa.array(take, pa.int64()))
        return out.append_column("_salt", pa.array(salts, pa.int64()))

    def salt_probe(b: pa.Table) -> pa.Table:
        hot = np.asarray(
            pc.is_in(b[on].combine_chunks(), value_set=hot_arr), bool
        )
        salts = np.zeros(b.num_rows, np.int64)
        # scatter hot probe rows uniformly across the salt range; the
        # choice is routing-only (every salted build copy is identical)
        salts[hot] = np.arange(int(hot.sum()), dtype=np.int64) % salt
        return b.append_column("_salt", pa.array(salts, pa.int64()))

    joined = probe_ds.map_batches(salt_probe, batch_format="pyarrow").join(
        build_ds.map_batches(salt_build, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_partitions(num_partitions),
        on=(on, "_salt"),
    )
    return joined.drop_columns(["_salt"])


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
