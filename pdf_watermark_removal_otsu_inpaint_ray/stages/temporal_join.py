"""Temporal joins — the two relational shapes Ray Data's Dataset API has no
native operator for (ray_guide.md "custom operators": as-of join, range
join), expressed as compositions of ``map_batches`` + coarse-partition
``groupby().map_groups`` so they stream and scale like every other stage.

* :func:`asof_join` — each left row matched to the most recent right row
  with ``right_ts <= left_ts`` for the same key (backward as-of, exact
  matches allowed).  Partitioning assumption: both sides hash-partition on
  the join KEY, so one partition holds every row of a key — correct for any
  key distribution; salt upstream if one key dominates a partition.

* :func:`interval_point_aggregate` — a pure range join (NO equi-key):
  every point with ``start <= ts < end`` is aggregated into that interval
  (count + sum), without ever materializing the point×interval pair set.
  Partitioning assumption: the time axis is split into fixed-width bands;
  an interval replicates into each band it overlaps (``span/band_width + 1``
  copies — pick ``band_width`` near the typical interval length), a point
  lands in exactly ONE band, so every (point, interval) containment is
  tested exactly once and partials sum per interval key with no dedup step.

Both local kernels are vectorized (``pandas.merge_asof`` — a C mergesort —
and ``np.searchsorted`` over prefix sums); the driver never sees row data.
"""

from __future__ import annotations

from ..config import scaled_parts

import numpy as np
import pyarrow as pa

# Knuth multiplicative hash: spreads sequential int keys across partitions
_KEY_MIX = np.uint64(0x9E3779B97F4A7C15)


def _key_partition(keys: np.ndarray, num_parts: int) -> np.ndarray:
    h = keys.astype(np.uint64) * _KEY_MIX
    return ((h >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int64)


def asof_join(
    left_ds,
    right_ds,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    num_parts: int | None = None,
    collapse_right_ties: bool = True,
    direction: str = "backward",
):
    """Distributed as-of join (left join semantics).

    ``direction``: "backward" (most recent right row with ts <= left ts —
    the SQL ASOF shape), "forward" (earliest right row with ts >= left ts),
    or "nearest" (closest in absolute distance; ties resolve backward, as
    in ``pandas.merge_asof``).

    Every other column of each side is carried as payload; payload names
    must be disjoint across the two sides.  Key and timestamp columns must
    be int64-castable (timestamps become epoch-µs int64 in the output,
    named ``left_on`` / ``left_ts``).  Unmatched left rows keep nulls in
    the right payload columns.

    ``collapse_right_ties=True`` collapses right rows sharing (key, ts) to
    their column-wise max BEFORE matching (partition-locally — no extra
    shuffle), making the match deterministic under timestamp ties; with it
    off, ties resolve to an unspecified tied row (the SQL ASOF ambiguity).

    Shape: tag side → union → hash-partition on key → per-partition
    ``pandas.merge_asof``.  One shuffle total; the merge is O(n log n) per
    partition and never builds a pair set.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    import ray.data

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lschema, rschema = left_ds.schema(), right_ds.schema()
    ltype_map = dict(zip(lschema.names, lschema.types))  # ray.data.Schema
    rtype_map = dict(zip(rschema.names, rschema.types))
    lpay = [c for c in lschema.names if c not in (left_on, left_ts)]
    rpay = [c for c in rschema.names if c not in (right_on, right_ts)]
    clash = set(lpay) & set(rpay)
    if clash:
        raise ValueError(f"payload column name collision: {sorted(clash)}")
    rtypes = {c: rtype_map[c] for c in rpay}
    ltypes = {c: ltype_map[c] for c in lpay}
    # the union null-pads each side's payload on the OTHER side's rows, so
    # the arrow→pandas conversion promotes int64 payloads (both sides) to
    # float64 + NaN inside the group kernel; restore nullable Int64 on the
    # way out so every group block carries one consistent integer schema
    int_pay = [
        c
        for c, t in list(ltypes.items()) + list(rtypes.items())
        if pa.types.is_integer(t)
    ]

    def _empty_pd_dtype(t):
        import pandas as pd

        if pa.types.is_integer(t):
            return pd.Int64Dtype()
        if pa.types.is_floating(t):
            return np.float64
        return object

    def tag(side: int, on: str, ts: str, pay: list, other: dict):
        def fn(b: pa.Table) -> pa.Table:
            key = np.asarray(b[on].cast(pa.int64()))
            cols = {
                "side": pa.array(np.full(b.num_rows, side, np.int8), pa.int8()),
                "pk": pa.array(_key_partition(key, num_parts), pa.int64()),
                left_on: pa.array(key, pa.int64()),
                left_ts: b[ts].cast(pa.int64()),
            }
            for c in pay:
                cols[c] = b[c]
            for c, t in other.items():
                cols[c] = pa.nulls(b.num_rows, t)
            return pa.table(cols)

        return fn

    u = left_ds.map_batches(
        tag(0, left_on, left_ts, lpay, rtypes), batch_format="pyarrow"
    ).union(
        right_ds.map_batches(
            tag(1, right_on, right_ts, rpay, ltypes), batch_format="pyarrow"
        )
    )

    out_cols = [left_on, left_ts, *lpay, *rpay]

    all_types = {left_on: pa.int64(), left_ts: pa.int64(), **ltypes, **rtypes}

    def local(df: pd.DataFrame) -> pd.DataFrame:
        side = df["side"].to_numpy()
        ln = df[side == 0]
        r = df[side == 1]
        if len(ln) == 0:
            # dtypes mirror the non-empty branch exactly: plain int64 for
            # key/ts (never null), nullable Int64 for integer payloads
            return pd.DataFrame(
                {
                    c: pd.Series(
                        dtype=np.int64
                        if c in (left_on, left_ts)
                        else _empty_pd_dtype(all_types[c])
                    )
                    for c in out_cols
                }
            )
        ln = ln.sort_values(left_ts, kind="stable")
        if len(r) == 0:
            out = ln[[left_on, left_ts, *lpay]].copy()
            for c in rpay:
                out[c] = pd.NA if c in int_pay else np.nan
        else:
            r = r.sort_values(left_ts, kind="stable")
            if collapse_right_ties:
                r = (
                    r.groupby([left_on, left_ts], as_index=False, sort=True)[rpay]
                    .max()
                    .sort_values(left_ts, kind="stable")
                )
            out = pd.merge_asof(
                ln[[left_on, left_ts, *lpay]],
                r[[left_on, left_ts, *rpay]],
                on=left_ts,
                by=left_on,
                direction=direction,
                allow_exact_matches=True,
            )
        for c in int_pay:  # nullable Int64 → arrow int64-with-nulls
            out[c] = out[c].astype("Int64")
        return out[out_cols]

    return u.groupby("pk").map_groups(local, batch_format="pandas")


def asof_join_broadcast(
    left_ds,
    right,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    collapse_right_ties: bool = True,
):
    """Broadcast as-of join: NO shuffle — the scale shape when the right
    side is dimension-table-sized (a slowly-changing-dimension lookup).

    The right side (a ``pyarrow.Table`` or a small ``Dataset``) is sorted
    once by (key, ts), tie-collapsed exactly like :func:`asof_join`
    (column-wise max per (key, ts)), put in the object store once via
    ``ray.put``, and read zero-copy by every map task; each batch then
    resolves ALL its rows with one C-speed ``pandas.merge_asof`` against a
    slim (ts, key, right-row-index) frame — no per-key Python loop — and
    gathers payload columns with a type-generic null-masked Arrow ``take``.
    Result is row-for-row identical to :func:`asof_join` (same
    tie/direction semantics — both paths resolve through ``merge_asof``);
    the left side streams — only the small side is materialized.
    """
    import pandas as pd

    import ray

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if not isinstance(right, pa.Table):
        schema = pa.schema(zip(right.schema().names, right.schema().types))
        batches = list(right.iter_batches(batch_format="pyarrow"))
        right = pa.concat_tables(batches) if batches else schema.empty_table()
    rpay = [c for c in right.schema.names if c not in (right_on, right_ts)]
    rdf = pd.DataFrame(
        {
            "key": np.asarray(right[right_on].cast(pa.int64())),
            "ts": np.asarray(right[right_ts].cast(pa.int64())),
            **{c: right[c].to_pandas() for c in rpay},
        }
    )
    if collapse_right_ties:
        rdf = rdf.groupby(["key", "ts"], as_index=False, sort=True)[rpay].max()
    else:
        rdf = rdf.sort_values(["key", "ts"], kind="stable", ignore_index=True)
    # slim lookup frame sorted by ts (merge_asof's required order); ridx
    # points back into the (key, ts)-sorted payload arrays
    slim = pd.DataFrame(
        {
            "ts": rdf["ts"].to_numpy().astype(np.int64),
            "key": rdf["key"].to_numpy().astype(np.int64),
            "ridx": np.arange(len(rdf), dtype=np.int64),
        }
    ).sort_values("ts", kind="stable", ignore_index=True)
    ref = ray.put(
        {
            "slim": slim,
            # payloads kept as Arrow arrays: the per-batch gather is a
            # type-generic zero-copy `take` with a null-masked index
            "pay": {
                c: pa.Array.from_pandas(rdf[c], type=right.schema.field(c).type)
                for c in rpay
            },
        }
    )

    def _lookup(b: pa.Table) -> pa.Table:
        # stateless task (not an actor pool): ray.get of an object the
        # local store already holds is zero-copy and ~free per batch,
        # and warm stateless workers skip the pool spin-up that
        # dominated this stage's wall time at bench scale
        r = ray.get(ref)
        bk = np.asarray(b[left_on].cast(pa.int64()))
        bt = np.asarray(b[left_ts].cast(pa.int64()))
        hit = np.full(bk.size, -1, dtype=np.int64)  # index into right rows
        if len(r["slim"]) and bk.size:
            order = np.argsort(bt, kind="stable")
            merged = pd.merge_asof(
                pd.DataFrame({"ts": bt[order], "key": bk[order]}),
                r["slim"],
                on="ts",
                by="key",
                direction=direction,
            )
            ridx = merged["ridx"].to_numpy()
            found = ~np.isnan(ridx)
            hit[order[found]] = ridx[found].astype(np.int64)
        ok = hit >= 0
        cols = {left_on: pa.array(bk, pa.int64()), left_ts: pa.array(bt, pa.int64())}
        for c in b.schema.names:
            if c not in (left_on, left_ts):
                cols[c] = b[c]
        idx = pa.array(np.maximum(hit, 0), pa.int64(), mask=~ok)
        for c, arr in r["pay"].items():
            cols[c] = arr.take(idx)  # null index → null output
        return pa.table(cols)

    return left_ds.map_batches(_lookup, batch_format="pyarrow")


def interval_point_aggregate(
    points_ds,
    intervals_ds,
    *,
    point_ts: str,
    point_value: str,
    interval_key: str,
    interval_start: str,
    interval_end: str,
    band_width: int,
    num_parts: int | None = None,
):
    """Pure range join + aggregate: per interval, the count and int64 sum of
    ``point_value`` over points with ``start <= ts < end`` (no equi-key).

    ``point_value`` must already be int64 (pre-scale floats upstream so the
    sum is order-independent — float addition is not associative across
    partitionings).  Intervals with no points still appear with n=0 (left
    semantics).  Returns columns (interval_key, n_points, sum_value).

    Shape: points → one band each; intervals → every overlapped band
    (vectorized repeat); union → ``groupby(band)`` → per-band searchsorted
    against the band's sorted point array + prefix sums (each interval's
    in-band slice only — points outside the band live in their own bands'
    groups) → per-interval partials → final small ``groupby(interval_key)``
    sum.  The point×interval pair set never exists; driver sees nothing.
    At extreme band skew (one band holding a corpus), salt the band key and
    add one more partial-merge round — same recipe as the histogram tree.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    import ray.data

    bw = int(band_width)
    if bw <= 0:
        raise ValueError("band_width must be positive")

    def tag_points(b: pa.Table) -> pa.Table:
        ts = np.asarray(b[point_ts].cast(pa.int64()))
        val = np.asarray(b[point_value], np.int64)
        return pa.table(
            {
                "side": pa.array(np.zeros(b.num_rows, np.int8), pa.int8()),
                "band": pa.array(ts // bw, pa.int64()),
                "ts": pa.array(ts, pa.int64()),
                "val": pa.array(val, pa.int64()),
                "ikey": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "start": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "end": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            }
        )

    def tag_intervals(b: pa.Table) -> pa.Table:
        start = np.asarray(b[interval_start].cast(pa.int64()))
        end = np.asarray(b[interval_end].cast(pa.int64()))
        key = np.asarray(b[interval_key].cast(pa.int64()))
        b0 = start // bw
        # last band: (end-1)//bw for non-empty windows; empty/negative spans
        # still emit ONE row (their band0) so n=0 intervals reach the output
        b1 = np.maximum((end - 1) // bw, b0)
        reps = (b1 - b0 + 1).astype(np.int64)
        total = int(reps.sum())
        # band offsets within each interval's replicated run
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        z = np.zeros(total, dtype=np.int64)
        return pa.table(
            {
                "side": pa.array(np.ones(total, np.int8), pa.int8()),
                "band": pa.array(np.repeat(b0, reps) + offs, pa.int64()),
                "ts": pa.array(z, pa.int64()),
                "val": pa.array(z, pa.int64()),
                "ikey": pa.array(np.repeat(key, reps), pa.int64()),
                "start": pa.array(np.repeat(start, reps), pa.int64()),
                "end": pa.array(np.repeat(end, reps), pa.int64()),
            }
        )

    u = points_ds.map_batches(tag_points, batch_format="pyarrow").union(
        intervals_ds.map_batches(tag_intervals, batch_format="pyarrow")
    )

    def local(df: pd.DataFrame) -> pd.DataFrame:
        side = df["side"].to_numpy()
        iv = df[side == 1]
        if len(iv) == 0:
            return pd.DataFrame(
                {
                    interval_key: pd.Series(dtype=np.int64),
                    "n_part": pd.Series(dtype=np.int64),
                    "sum_part": pd.Series(dtype=np.int64),
                }
            )
        pts = df[side == 0]
        ts = pts["ts"].to_numpy().astype(np.int64)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        pref = np.concatenate(
            ([0], np.cumsum(pts["val"].to_numpy().astype(np.int64)[order]))
        )
        lo = np.searchsorted(ts, iv["start"].to_numpy().astype(np.int64), "left")
        hi = np.searchsorted(ts, iv["end"].to_numpy().astype(np.int64), "left")
        # end < start (inverted span) gives hi < lo — clamp so the interval
        # reports n=0 instead of a negative count / negated prefix slice
        hi = np.maximum(hi, lo)
        return pd.DataFrame(
            {
                interval_key: iv["ikey"].to_numpy().astype(np.int64),
                "n_part": (hi - lo).astype(np.int64),
                "sum_part": (pref[hi] - pref[lo]).astype(np.int64),
            }
        )

    partials = u.groupby("band").map_groups(local, batch_format="pandas")

    # final per-interval sum on COARSE key-hash partitions with one
    # vectorized pandas groupby-agg each — the native per-key Aggregate on a
    # high-cardinality interval key measured 44 s vs <1 s for this shape at
    # sf0.1 (150k keys; same lesson as functions/dedup.exact_dedup)
    def add_pk(b: pa.Table) -> pa.Table:
        keys = np.asarray(b[interval_key], np.int64)
        return b.append_column(
            "fpk", pa.array(_key_partition(keys, num_parts), pa.int64())
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(interval_key, sort=False)[["n_part", "sum_part"]].sum()
        return pd.DataFrame(
            {
                interval_key: gb.index.to_numpy().astype(np.int64),
                "n_points": gb["n_part"].to_numpy().astype(np.int64),
                "sum_value": gb["sum_part"].to_numpy().astype(np.int64),
            }
        )

    return (
        partials.map_batches(add_pk, batch_format="pyarrow")
        .groupby("fpk")
        .map_groups(merge, batch_format="pandas")
    )
