"""Event-time windowed aggregates over a timestamped event stream.

Ray Data has no native event-time windows (ray_guide.md "Streaming-shaped
workloads"); window assignment is a stateless vectorized ``map_batches``
(window ids from integer µs arithmetic) followed by a grouped aggregate whose
shuffle moves only (key, window) partial rows.  Session windows use
``groupby(key).map_groups`` over ts-sorted groups — the documented ordering
assumption is per-key, not global.

These mirror the reference's per-document page loop + accumulated state
(cli.py:892-978; clear_qr_codes() session boundary, watermark_detector.py:143-145)
generalized to real event time, and every one has an exact DuckDB twin in
``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

HOUR_US = 3_600_000_000


def _epoch_us(batch: pa.Table, col: str = "ts") -> np.ndarray:
    return batch[col].cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling_counts(ds: "ray.data.Dataset", size_us: int = HOUR_US):
    """count + exact min/max(value) per (event_type, tumbling window)."""

    def assign(batch: pa.Table) -> pa.Table:
        w = _epoch_us(batch) // size_us
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_id": pa.array(w, pa.int64()),
                "value": batch["value"],
            }
        )

    from ray.data.aggregate import Count, Max, Min

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(
            Count(alias_name="n"),
            Min("value", alias_name="vmin"),
            Max("value", alias_name="vmax"),
        )
    )


def sliding_counts(ds: "ray.data.Dataset", size_us: int = 2 * HOUR_US, slide_us: int = HOUR_US):
    """count per (event_type, sliding window): each event lands in every
    window covering its ts — emitted as ceil(size/slide) shifted copies
    (flat_map shape, but vectorized in one map_batches)."""
    n_shifts = -(-size_us // slide_us)

    def assign(batch: pa.Table) -> pa.Table:
        us = _epoch_us(batch)
        types, wins = [], []
        et = batch["event_type"]
        for j in range(n_shifts):
            w = us // slide_us - j
            valid = (w >= 0) & (us - w * slide_us < size_us)
            types.append(et.filter(pa.array(valid)))
            wins.append(w[valid])
        return pa.table(
            {
                "event_type": pa.concat_arrays([t.combine_chunks() for t in types]),
                "window_id": pa.array(np.concatenate(wins), pa.int64()),
            }
        )

    from ray.data.aggregate import Count

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Count(alias_name="n"))
    )


def session_windows(ds: "ray.data.Dataset", gap_us: int = 30 * 60 * 1_000_000):
    """Per-user sessionization (gap-based).  Returns one row per session:
    (user_id, session_start_us, n_events)."""

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        # explicit µs unit before the int view — a bare astype('int64') on a
        # datetime column yields whatever unit the pandas conversion chose
        # (ns under some pandas/pyarrow combinations), which would over-split
        # sessions 1000x and emit ns starts against the epoch_us() oracle
        ts = g["ts"]
        if ts.dtype.kind == "M":  # datetime64[*] → µs
            ts = ts.dt.as_unit("us") if hasattr(ts.dt, "as_unit") else ts.astype("datetime64[us]")
        us = ts.astype("int64").to_numpy()
        order = np.argsort(us, kind="stable")
        us = us[order]
        new = np.concatenate([[True], np.diff(us) > gap_us])
        sid = np.cumsum(new) - 1
        starts = us[new]
        n = np.bincount(sid)
        return pd.DataFrame(
            {
                "user_id": np.int64(g["user_id"].iloc[0]),
                "session_start_us": starts.astype(np.int64),
                "n_events": n.astype(np.int64),
            }
        )

    return ds.groupby("user_id").map_groups(sessionize, batch_format="pandas")


def events_customer_join(events_ds: "ray.data.Dataset", customer_path: str):
    """Broadcast hash join: events ⋈ customer on user_id = c_custkey.

    Small side loaded once on the driver, shipped via one ``ray.put``, looked
    up vectorized per batch — no shuffle (ray_guide.md join patterns)."""
    import pyarrow.parquet as pq

    cust = pq.read_table(customer_path, columns=["c_custkey", "c_name"])
    keys = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(keys)
    keys = keys[order]
    names = np.asarray(cust["c_name"].to_pylist(), dtype=object)[order]
    ref = ray.put((keys, names))

    def join(batch: pa.Table) -> pa.Table:
        k, v = ray.get(ref)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if k.size == 0:  # empty build side: correct empty inner join
            hit = np.zeros(uid.size, dtype=bool)
            pos_c = np.zeros(uid.size, dtype=np.int64)
            name = np.full(uid.size, None, dtype=object)
            t = pa.table(
                {
                    "event_id": batch["event_id"],
                    "user_id": batch["user_id"],
                    "c_name": pa.array(name.tolist(), pa.string()),
                }
            )
            return t.filter(pc.is_valid(t["c_name"]))
        pos = np.searchsorted(k, uid)
        pos_c = np.minimum(pos, k.size - 1)
        hit = k[pos_c] == uid
        name = np.where(hit, v[pos_c], None)
        t = pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "c_name": pa.array(name.tolist(), pa.string()),
            }
        )
        return t.filter(pc.is_valid(t["c_name"]))  # inner-join semantics

    return events_ds.map_batches(join, batch_format="pyarrow")
