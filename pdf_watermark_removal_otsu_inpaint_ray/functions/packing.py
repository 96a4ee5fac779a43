"""Distributed ordered prefix scan → sequence packing.

The context-window packing step of a training pipeline: documents are laid
end-to-end in (group, order) sequence and cut into fixed-capacity bins;
each doc's bin is ``floor(tokens_before / capacity)``.  A running total is
inherently sequential, so the Dataset API can't express it directly — this
is the classic two-pass distributed scan:

1. **Partials**: per-batch (group, bucket) sums (bucket = ``order >>
   bucket_bits``) → multi-key groupby sum.  The shuffle carries one int64
   row per (block, group, bucket-in-block).
2. **Exclusive scan** over the tiny (groups × buckets) table driver-side,
   broadcast once via ``ray.put``.
3. **Local scan**: rows co-located per (group, bucket) sort by order and
   cumsum, offset by the broadcast base — every row gets its exact global
   prefix without any global sort.

Partitioning assumption (documented per the custom-operator contract): a
(group, bucket) pair's rows land in one task via the groupby; bucket width
(default 4096 orders) bounds group size.  SQL twin: ``sum(v) OVER
(PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING) - v``.
"""

from __future__ import annotations

from ..config import scaled_parts

import numpy as np
import pyarrow as pa


def pack_sequences(
    ds,
    *,
    group: str = "source",
    order: str = "doc_id",
    value: str = "n_chars",
    capacity: int = 4096,
    bucket_bits: int = 12,
):
    """→ (order, group, value, tok_before, bin): each row's exclusive
    per-group running total in (group, order) sequence and its capacity-
    ``capacity`` bin.  All int64 — bit-equal to the serial window twin."""
    import pandas as pd

    import ray

    def partials(b: pa.Table) -> pa.Table:
        o = np.asarray(b[order], np.int64)
        v = np.asarray(b[value], np.int64)
        g = b[group]
        bucket = o >> bucket_bits
        df = pd.DataFrame({"g": np.asarray(g), "bucket": bucket, "s": v})
        agg = df.groupby(["g", "bucket"], sort=False, as_index=False)["s"].sum()
        return pa.table(
            {
                group: pa.array(agg["g"]),
                "bucket": pa.array(agg["bucket"].to_numpy(), pa.int64()),
                "s": pa.array(agg["s"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    sums = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([group, "bucket"])
        .sum("s")
        .to_pandas()  # groups × buckets rows — scan-input scale, tiny
        .sort_values([group, "bucket"], ignore_index=True)
    )
    total = sums["sum(s)"].to_numpy().astype(np.int64)
    csum = np.cumsum(total) - total  # exclusive scan over the whole table…
    gkeys = sums[group].to_numpy()
    starts = np.unique(gkeys, return_index=True)[1]  # sorted: sums is sorted
    # …re-zeroed per group: subtract each group's first csum value
    group_first = np.repeat(csum[starts], np.diff(np.append(starts, len(sums))))
    offsets = {
        (g, int(bkt)): int(off)
        for g, bkt, off in zip(gkeys, sums["bucket"].to_numpy(), csum - group_first)
    }
    ref = ray.put(offsets)

    def add_pk(b: pa.Table) -> pa.Table:
        o = np.asarray(b[order], np.int64)
        return pa.table(
            {
                order: pa.array(o, pa.int64()),
                group: b[group],
                value: b[value].cast(pa.int64()),
                "bucket": pa.array(o >> bucket_bits, pa.int64()),
            }
        )

    def local_scan(g: "pd.DataFrame") -> "pd.DataFrame":
        # ray.get of a plasma object is a cached local read after the first
        # fetch per worker — the offsets table ships once per node, not per
        # group
        offs = ray.get(ref)
        g = g.sort_values(order, kind="stable", ignore_index=True)
        v = g[value].to_numpy().astype(np.int64)
        base = offs[(g[group].iloc[0], int(g["bucket"].iloc[0]))]
        before = base + np.cumsum(v) - v
        return pd.DataFrame(
            {
                order: g[order].to_numpy().astype(np.int64),
                group: g[group].to_numpy(),
                value: v,
                "tok_before": before,
                "bin": before // capacity,
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby([group, "bucket"])
        .map_groups(local_scan, batch_format="pandas")
    )


def _add_group_pk(b: pa.Table, group: str, num_parts: int | None = None) -> pa.Table:
    """ONE definition of the group-key partition id (splitmix64 for int
    keys, hash_partition_ids for strings) shared by every grouped operator
    in this module — two copies would let grouped_lag and
    grouped_rolling_sum silently partition the same keys differently."""
    num_parts = scaled_parts(64, num_parts)
    from ..sinks.exactly_once import hash_partition_ids

    if pa.types.is_integer(b.schema.field(group).type):
        k = np.asarray(b[group], np.int64).astype(np.uint64)
        pk = (
            ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
            % np.uint64(num_parts)
        ).astype(np.int64)
    else:
        pk = hash_partition_ids(b[group].combine_chunks(), num_parts)
    return b.append_column("pk", pa.array(pk, pa.int64()))


def grouped_lag(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    tiebreak: str = "event_id",
    out: str = "delta",
):
    """Per-group lag delta: each row's ``order`` minus the PREVIOUS row's
    ``order`` in (order, tiebreak) sequence within its group (null for the
    group's first row) — ``x - lag(x) OVER (PARTITION BY g ORDER BY x, t)``.

    A group's rows are co-located by ONE coarse hash partition on the group
    key alone (never on time), so the whole lag resolves with one vectorized
    lexsort + shift per partition — no per-group callback, no boundary
    exchange.  Skew note: a single hot group lands in one task; salt + a
    boundary hand-off (the pack_sequences scan) would be the next step if
    one group exceeds a worker's heap."""
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def lag_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {group: [], order: [], tiebreak: [], out: pd.array([], "Int64")}
            )
        gk = g[group].to_numpy()
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o, t = gk[idx], o[idx], t[idx]
        delta = np.empty(len(g), dtype=np.float64)
        delta[1:] = o[1:] - o[:-1]
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        delta[first] = np.nan
        res = pd.DataFrame({group: gk, order: o, tiebreak: t, out: delta})
        res[out] = res[out].astype("Int64")  # nullable int: NaN → null
        return res.drop(columns=["pk"], errors="ignore")

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lag_part, batch_format="pandas")
    )


def grouped_ntile(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    tiebreak: str = "event_id",
    k: int = 4,
):
    """Per-group equal-count bucket assignment — ``NTILE(k) OVER (PARTITION
    BY g ORDER BY o, t)``, the quantile-bucket labeler of curriculum /
    difficulty-split sampling (rows ranked within their group, first
    ``n % k`` buckets one row larger, exactly the SQL window semantics).

    Same distribution shape as :func:`grouped_lag`: one coarse hash
    partition on the group key co-locates each group, then ONE vectorized
    lexsort + integer bucket formula per partition — no per-group callback,
    no global sort.  All int64, bit-equal to the SQL twin."""
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    order: pd.Series(dtype=np.int64),
                    tiebreak: pd.Series(dtype=np.int64),
                    "tile": pd.Series(dtype=np.int64),
                }
            )
        gk = g[group].to_numpy()  # any hashable key type (as grouped_lag)
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o, t = gk[idx], o[idx], t[idx]
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        run_start = np.nonzero(first)[0]
        gid = np.cumsum(first) - 1
        sizes = np.diff(np.append(run_start, n))
        cnt = sizes[gid]  # each row's group size
        pos = np.arange(n, dtype=np.int64) - run_start[gid]  # 0-based rank
        q, r = cnt // k, cnt % k
        big = r * (q + 1)  # rows covered by the (q+1)-sized leading buckets
        # q == 0 (group smaller than k): big == cnt, every row takes the
        # first branch, so the q-branch divisor is never 0-by-use — the
        # maximum() only silences the vectorized division
        tile = np.where(
            pos < big,
            pos // np.maximum(q + 1, 1),
            r + (pos - big) // np.maximum(q, 1),
        ) + 1
        return pd.DataFrame(
            {group: gk, order: o, tiebreak: t, "tile": tile.astype(np.int64)}
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(part, batch_format="pandas")
    )


def grouped_sessionize(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    tiebreak: str = "event_id",
    gap: int = 1000,
):
    """Gap-based sessionization: label each row with its group's 1-based
    session id, where a NEW session starts at the group's first row or
    whenever the time since the previous row exceeds ``gap`` — the batch
    (table-side) twin of the streaming session windows, and exactly the
    classic SQL idiom ``sum(is_new) OVER (PARTITION BY g ORDER BY o, t)``
    over ``is_new = (o - lag(o) > gap OR lag IS NULL)``.

    Same distribution shape as :func:`grouped_lag`: one coarse hash
    partition on the group key, one vectorized lexsort + cumsum per
    partition.  All int64 — bit-equal to the SQL window twin."""
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    order: pd.Series(dtype=np.int64),
                    tiebreak: pd.Series(dtype=np.int64),
                    "session_id": pd.Series(dtype=np.int64),
                }
            )
        gk = g[group].to_numpy()  # any hashable key type (as grouped_lag)
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o, t = gk[idx], o[idx], t[idx]
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        new_sess = first.copy()
        new_sess[1:] |= (o[1:] - o[:-1]) > gap
        new_sess[first] = True
        ns = new_sess.astype(np.int64)
        cs = np.cumsum(ns)
        run_start = np.nonzero(first)[0]
        gid = np.cumsum(first) - 1
        base = (cs - ns)[run_start]  # cumsum BEFORE each group's first row
        sid = cs - base[gid]  # 1-based: first row of a group is always new
        return pd.DataFrame(
            {group: gk, order: o, tiebreak: t, "session_id": sid.astype(np.int64)}
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(part, batch_format="pandas")
    )


def grouped_rolling_sum(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    tiebreak: str = "event_id",
    value: str = "value_c",
    window: int = 3,
    out: str = "roll_sum",
):
    """Per-group rolling-window sum: for each row, the sum of ``value`` over
    the last ``window`` rows (current included) of its group in (order,
    tiebreak) sequence — ``sum(v) OVER (PARTITION BY g ORDER BY o, t ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)``, the sliding-feature
    primitive of feature engineering.

    ``value`` must be int64 (pre-quantize floats upstream) so the sums are
    order-free exact.  Same distribution shape as :func:`grouped_lag`: one
    coarse hash partition on the group key, then ONE vectorized lexsort +
    prefix-sum-difference per partition (a group's window never crosses a
    partition because the whole group is co-located); rows within
    ``window`` of a group start subtract the group-start prefix instead —
    all boundary handling is a single ``np.maximum`` on indices.
    """
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def roll_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            # explicit int64 dtypes: an all-object empty block would arrow-
            # convert to null-typed columns and fight schema unification
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    order: pd.Series(dtype=np.int64),
                    tiebreak: pd.Series(dtype=np.int64),
                    value: pd.Series(dtype=np.int64),
                    out: pd.Series(dtype=np.int64),
                }
            )
        gk = g[group].to_numpy()
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        v = g[value].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o, t, v = gk[idx], o[idx], t[idx], v[idx]
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        run_start = np.nonzero(first)[0]
        gid = np.cumsum(first) - 1
        # exclusive prefix: cs[i] = sum of v[0..i-1]; window sum of rows
        # (lo..i] is cs[i+1] - cs[lo] with lo clamped to the group start
        cs = np.concatenate(([0], np.cumsum(v)))
        pos = np.arange(n, dtype=np.int64)
        lo = np.maximum(pos - window + 1, run_start[gid])
        roll = cs[pos + 1] - cs[lo]
        return pd.DataFrame(
            {group: gk, order: o, tiebreak: t, value: v, out: roll.astype(np.int64)}
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(roll_part, batch_format="pandas")
    )


def _latest_rows(tbl: pa.Table, group: str, order: str, tiebreak: str) -> pa.Table:
    """Keep each group's LAST row by (order, tiebreak) — one vectorized
    lexsort + run-boundary sweep, no per-group callback.  Payload columns
    ride along untouched via ``take``."""
    if tbl.num_rows == 0:
        return tbl
    gk = np.asarray(tbl[group], np.int64)
    o = np.asarray(tbl[order], np.int64)
    t = np.asarray(tbl[tiebreak], np.int64)
    idx = np.lexsort((t, o, gk))
    gs = gk[idx]
    last = np.empty(len(gs), bool)
    last[-1] = True
    last[:-1] = gs[1:] != gs[:-1]
    return tbl.take(pa.array(idx[last], pa.int64()))


def grouped_latest(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    tiebreak: str = "event_id",
):
    """CDC log compaction / upsert-resolve: each group's latest row by
    (order, tiebreak) — ``row_number() OVER (PARTITION BY g ORDER BY o
    DESC, t DESC) = 1``, the merge-on-read primitive of a changelog table.

    Two-level: a per-batch vectorized partial prune first (the shuffle then
    carries at most one row per (batch, key), never the raw log), then ONE
    coarse hash partition on the group key resolves the global latest with
    the same lexsort sweep per partition.  ``group``/``order``/``tiebreak``
    must be int64; payload columns pass through unmodified.  Reference
    analog: the sticky first-page watermark color (`watermark_detector.py:
    562-568`) is first-match-per-key; this is its last-match dual over a
    keyed changelog."""

    def partial(b: pa.Table) -> pa.Table:
        return _latest_rows(b, group, order, tiebreak)

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def final_part(g: pa.Table) -> pa.Table:
        return _latest_rows(g, group, order, tiebreak).drop_columns(["pk"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(final_part, batch_format="pyarrow")
    )


def grouped_rolling_outlier(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    tiebreak: str = "event_id",
    value: str = "value_c",
    window: int = 8,
    thresh: int = 2,
):
    """Per-group rolling z-score outlier flag, INTEGER-EXACT (the anomaly
    / data-drift gate of a feature pipeline): over each row's trailing
    ``window`` rows (current included, group-bounded), flag the row iff

        (n·x − sum)² > thresh² · (n·sumsq − sum²)

    which is ``(x − mean)² > thresh² · var`` with both sides multiplied by
    n² — no float ever materializes, so the distributed result
    hash-matches the SQL window twin bit-for-bit (a float stddev would
    differ in the last ulp between engines).  ``value`` must be int64
    cents-scale: with window ≤ 16 and |value| ≤ 1e7 the intermediates stay
    far inside int64.

    Same distribution shape as :func:`grouped_rolling_sum`: one coarse
    hash partition on the group key, one lexsort + two prefix-sum
    differences per partition."""
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    order: pd.Series(dtype=np.int64),
                    tiebreak: pd.Series(dtype=np.int64),
                    value: pd.Series(dtype=np.int64),
                    "roll_n": pd.Series(dtype=np.int64),
                    "roll_sum": pd.Series(dtype=np.int64),
                    "is_outlier": pd.Series(dtype=np.int64),
                }
            )
        gk = g[group].to_numpy()
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        v = g[value].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o, t, v = gk[idx], o[idx], t[idx], v[idx]
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        run_start = np.nonzero(first)[0]
        gid = np.cumsum(first) - 1
        cs = np.concatenate(([0], np.cumsum(v)))
        cs2 = np.concatenate(([0], np.cumsum(v * v)))
        pos = np.arange(n, dtype=np.int64)
        lo = np.maximum(pos - window + 1, run_start[gid])
        cnt = pos + 1 - lo
        s = cs[pos + 1] - cs[lo]
        s2 = cs2[pos + 1] - cs2[lo]
        lhs = (cnt * v - s) ** 2
        rhs = (thresh * thresh) * (cnt * s2 - s * s)
        return pd.DataFrame(
            {
                group: gk,
                order: o,
                tiebreak: t,
                value: v,
                "roll_n": cnt.astype(np.int64),
                "roll_sum": s.astype(np.int64),
                "is_outlier": (lhs > rhs).astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(part, batch_format="pandas")
    )


def transition_counts(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts",
    tiebreak: str = "event_id",
    label: str = "event_type",
    num_parts: int | None = None,
) -> pa.Table:
    """Markov transition matrix over per-group event sequences: count
    (previous label -> label) adjacencies in each group's (order, tiebreak)
    sequence, summed across all groups — the behavioral-model / session-flow
    aggregate (``lag(label) OVER (PARTITION BY g ORDER BY o, t)`` followed by
    a pair GROUP BY).  Reference analog: the sticky cross-page state chain
    (watermark_detector.py:63-64) reads each page in document order and
    conditions on the previous page's detection — the same prev->cur
    adjacency, here reduced to counts.

    Distribution shape: ONE coarse hash partition on the group key
    (``_add_group_pk`` — a group's rows land in exactly one task, so every
    adjacency is partition-local), one vectorized lexsort + shift per
    partition, then per-partition PARTIAL pair counts (<= |labels|^2 rows
    per partition, label space is small by definition) folded driver-side —
    the shuffle carries rows once and the driver sees only the fixed
    |labels|^2 key space, never events.  Returns a pa.Table
    ``(prev_<label>, <label>, cnt)``.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, num_parts)

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = {f"prev_{label}": [], label: [], "cnt": []}
        if len(g) < 2:
            return pd.DataFrame(out_cols)
        gk = g[group].to_numpy()
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        lab_codes, lab_uniq = pd.factorize(g[label], sort=False)
        idx = np.lexsort((t, o, gk))
        gk_s, lab_s = gk[idx], lab_codes[idx]
        same_group = gk_s[1:] == gk_s[:-1]
        prev, cur = lab_s[:-1][same_group], lab_s[1:][same_group]
        if prev.size == 0:
            return pd.DataFrame(out_cols)
        nl = len(lab_uniq)
        cnt = np.bincount(prev * nl + cur, minlength=nl * nl)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame(
            {
                f"prev_{label}": np.asarray(lab_uniq)[nz // nl],
                label: np.asarray(lab_uniq)[nz % nl],
                "cnt": cnt[nz].astype(np.int64),
            }
        )

    parts = (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(pair_partials, batch_format="pandas")
        .to_pandas()  # <= num_parts * |labels|^2 rows — driver-fold the tiny final
    )
    if len(parts) == 0:
        return pa.table(
            {
                f"prev_{label}": pa.array([], pa.string()),
                label: pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    gb = parts.groupby([f"prev_{label}", label], sort=False, as_index=False)["cnt"].sum()
    return pa.table(
        {
            f"prev_{label}": pa.array(gb[f"prev_{label}"]),
            label: pa.array(gb[label]),
            "cnt": pa.array(gb["cnt"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


def grouped_time_weighted(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    value: str = "cents",
    num_parts: int | None = None,
):
    """Per-group TIME-WEIGHTED value aggregate (the TWAP / IoT
    state-duration primitive): each row's value is held until the group's
    next event, so the group's weighted sum is ``sum(value_i * (t_{i+1} -
    t_i))`` over all non-final rows — ``lead()`` + weighted GROUP BY in
    SQL.  Returns one ``(group, twap_num, twap_den)`` row per group with
    >= 2 events; both int64 (numerator in value-unit*microseconds), so the
    division stays caller-side and the distributed result is bit-exact.

    One coarse hash partition on the group key, one lexsort + shift per
    partition (the grouped_lag shape), one bincount per output — no
    per-group callback."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, num_parts)

    def twap_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                group: pd.Series(dtype=np.int64),
                "twap_num": pd.Series(dtype=np.int64),
                "twap_den": pd.Series(dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        gk = g[group].to_numpy()
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        v = g[value].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o, v = gk[idx], o[idx], v[idx]
        same = gk[1:] == gk[:-1]  # row i paired with its group successor
        dur = (o[1:] - o[:-1])[same]
        val = v[:-1][same]
        src = gk[:-1][same]
        if src.size == 0:
            return empty
        uu, inv = np.unique(src, return_inverse=True)
        # int64 scatter-add, NOT a float-weighted bincount: cents*us
        # products can exceed 2^53, where float64 accumulation stops being
        # exact; np.add.at is unbuffered but the volume is partition-local
        num = np.zeros(uu.size, np.int64)
        den = np.zeros(uu.size, np.int64)
        np.add.at(num, inv, val * dur)
        np.add.at(den, inv, dur)
        return pd.DataFrame({group: uu, "twap_num": num, "twap_den": den})

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(twap_part, batch_format="pandas")
    )


def grouped_rolling_median(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    value: str = "value_c",
    window: int = 4,
    out: str = "roll_med",
    num_parts: int | None = None,
):
    """Per-group rolling-window MEDIAN: for each row, the median of
    ``value`` over the last ``window`` rows (current included) of its group
    in (order, tiebreak) sequence — ``median(v) OVER (PARTITION BY g ORDER
    BY o, t ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``, the robust
    sibling of :func:`grouped_rolling_sum` (outlier-insensitive rolling
    features).  Reference analog: the dynamic inpaint radius is a windowed
    order statistic over region sizes (watermark_remover.py:278-297).

    ``value`` must be int64 (pre-quantize floats upstream); the median is
    emitted as float64 — int64→float64 is exact below 2^53, and the
    even-count interpolation ``(a+b)/2`` is the identical IEEE operation
    in numpy's median and the SQL twin, so results hash-match bitwise.

    Distribution shape: one coarse hash partition on the group key, then
    per partition ONE lexsort + ONE (rows × window) gather + masked
    nanmedian — no per-row or per-group Python.  Window gather memory is
    ``rows_in_partition × window × 8`` bytes, bounded by the partition
    size (window is a small constant; a 1000-row window would want the
    two-heap streaming form instead)."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, num_parts)

    def med_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    order: pd.Series(dtype=np.int64),
                    tiebreak: pd.Series(dtype=np.int64),
                    value: pd.Series(dtype=np.int64),
                    out: pd.Series(dtype=np.float64),
                }
            )
        gk = g[group].to_numpy()
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        v = g[value].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o, t, v = gk[idx], o[idx], t[idx], v[idx]
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        run_start = np.nonzero(first)[0]
        gid = np.cumsum(first) - 1
        pos = np.arange(n, dtype=np.int64)
        # (n, window) gather of each row's window positions, clamped; a
        # position before the group start is masked to NaN so nanmedian
        # sees exactly the short head window SQL sees
        win_pos = pos[:, None] - np.arange(window - 1, -1, -1)[None, :]
        valid = win_pos >= run_start[gid][:, None]
        vals = v[np.clip(win_pos, 0, n - 1)].astype(np.float64)
        vals[~valid] = np.nan
        med = np.nanmedian(vals, axis=1)
        return pd.DataFrame(
            {group: gk, order: o, tiebreak: t, value: v, out: med}
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(med_part, batch_format="pandas")
    )


def grouped_interval_agg(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    id_col: str = "event_id",
    value: str = "value_c",
    anchor: str = "is_anchor",
    horizon: int = 6 * 3_600_000_000,
    num_parts: int | None = None,
):
    """Batch INTERVAL self-join aggregate: for every anchor row, the count
    and exact int64 value sum of its group's rows with ``order`` in
    ``(anchor_order, anchor_order + horizon]`` — the bounded-range join
    ``a JOIN b ON b.g = a.g AND b.o > a.o AND b.o <= a.o + horizon``
    collapsed to its aggregate, without materializing the pair blowup.
    The batch twin of the streaming interval join
    (pipelines/stream_join.py); reference analog: cross-page motif
    windows accumulating spans within a page horizon (qr_detector.py
    session chaining).

    Distribution shape: one coarse hash partition on the group key
    co-locates each group's anchors AND candidates, then per partition the
    half-open range bounds for ALL anchors resolve with ONE combined
    lexsort of (rows + 2·anchors) keys — the classic merge-rank sweep: a
    probe at (g, o) with probe-sorts-BEFORE-rows-at-equal-keys yields
    ``#rows < (g, o)`` from its sorted position, so ``hi − lo`` counts and
    a prefix-sum difference sums the window exactly (int64, order-free).
    No per-anchor loop, no pair materialization; memory is one sort of the
    partition."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, num_parts)

    def sweep_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype=np.int64),
                "n_follow": pd.Series(dtype=np.int64),
                "sum_value": pd.Series(dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        gk = g[group].to_numpy().astype(np.int64)
        o = g[order].to_numpy().astype(np.int64)
        v = g[value].to_numpy().astype(np.int64)
        aid = g[id_col].to_numpy().astype(np.int64)
        is_a = g[anchor].to_numpy().astype(bool)
        # rows sorted by (g, o): the sweep base + its exclusive prefix sums
        ro = np.lexsort((o, gk))
        rg, rt, rv = gk[ro], o[ro], v[ro]
        cs = np.concatenate(([0], np.cumsum(rv)))
        n = rg.size
        a_g, a_t, a_id = gk[is_a], o[is_a], aid[is_a]
        if a_g.size == 0:
            return empty
        # probes: (g, t) for lo (rows <= t excluded downstream via > bound:
        # lo counts rows with key < (g, t]) and (g, t + horizon) for hi —
        # both with probe-AFTER-rows-at-equal-key so ties resolve to the
        # SQL's strict > lower / inclusive <= upper bounds
        m = a_g.size
        pg = np.concatenate([rg, a_g, a_g])
        pt = np.concatenate([rt, a_t, a_t + horizon])
        flag = np.concatenate(
            [np.zeros(n, np.int8), np.ones(2 * m, np.int8)]
        )
        so = np.lexsort((flag, pt, pg))
        ranks = np.empty(so.size, np.int64)
        ranks[so] = np.arange(so.size, dtype=np.int64)
        probe_sorted = flag[so] == 1
        probes_upto = np.cumsum(probe_sorted)  # inclusive
        pr = ranks[n:]  # sorted positions of the 2m probes
        rows_before = pr - (probes_upto[pr] - 1)
        lo, hi = rows_before[:m], rows_before[m:]
        return pd.DataFrame(
            {
                id_col: a_id,
                "n_follow": (hi - lo).astype(np.int64),
                "sum_value": (cs[hi] - cs[lo]).astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(sweep_part, batch_format="pandas")
    )


def grouped_interval_coverage(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    hold: int = 3_600_000_000,
    num_parts: int | None = None,
):
    """Per-group interval-UNION coverage: each row opens ``[ts, ts+hold)``;
    emit ``(group, covered_us, n_islands)`` — the union length of all the
    group's intervals and the number of disjoint runs (uptime/presence
    accounting; the dual of gap sessionization).  Integer-exact: with
    sorted timestamps an island breaks exactly when ``ts - prev_ts >=
    hold``, and each island covers ``last - first + hold``.

    One coarse group-key partition, one lexsort + boolean-diff sweep per
    partition — no per-group callback, no pair materialization (the SQL
    twin's gaps-and-islands window chain as one vectorized pass).
    Reference analog: the sticky-window persistence span of the detection
    chain (watermark_detector.py cross-page runs) measured per key.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, num_parts)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    "covered_us": pd.Series(dtype=np.int64),
                    "n_islands": pd.Series(dtype=np.int64),
                }
            )
        k = g[group].to_numpy().astype(np.int64)
        t = g[order].to_numpy().astype(np.int64)
        o = np.lexsort((t, k))
        k, t = k[o], t[o]
        new_grp = np.concatenate(([True], k[1:] != k[:-1]))
        brk = np.concatenate(([True], (t[1:] - t[:-1]) >= hold)) | new_grp
        st = np.nonzero(brk)[0]
        en = np.append(st[1:], k.size) - 1
        island_len = t[en] - t[st] + hold  # [first, last + hold)
        gs = np.nonzero(new_grp)[0]
        # islands belong to the group of their start row
        isl_grp = np.searchsorted(gs, st, side="right") - 1
        n_groups = gs.size
        covered = np.zeros(n_groups, np.int64)
        np.add.at(covered, isl_grp, island_len)
        counts = np.bincount(isl_grp, minlength=n_groups).astype(np.int64)
        return pd.DataFrame(
            {group: k[gs], "covered_us": covered, "n_islands": counts}
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(resolve, batch_format="pandas")
    )


def grouped_range_frame_sum(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    value: str = "value_c",
    span: int = 600_000_000,
    out: str = "range_sum",
):
    """Per-group time-RANGE windowed sum: for each row, the sum of ``value``
    over the group's rows whose ``order`` lies in ``[o_i - span, o_i]`` —
    ``sum(v) OVER (PARTITION BY g ORDER BY o RANGE BETWEEN span PRECEDING
    AND CURRENT ROW)``.  Unlike the ROWS frame (:func:`grouped_rolling_sum`)
    the frame is value-based: ORDER-BY peers (equal ``order`` in a group)
    all share one frame that includes every peer — exactly the SQL RANGE
    semantics, which is why ``tiebreak`` shapes output identity but never
    the frame.

    ``value`` must be int64 (pre-quantize floats upstream).  Same
    distribution shape as :func:`grouped_lag`: one coarse hash partition on
    the group key, then per partition ONE lexsort + composite-key double
    ``searchsorted`` + prefix-sum difference — frames never cross partitions
    because whole groups are co-located.  The composite key packs (group
    ordinal, order-offset) into one int64 so BOTH frame edges of every row
    across ALL groups resolve in two vectorized binary searches; when the
    packed range would overflow int64 (adversarial order spread × group
    count) the kernel falls back to per-group slice searches — same result,
    bounded loop over groups, never over rows.

    Reference analog: the sliding event-time accumulation window of the
    detection chain (watermark_detector.py sticky windows) generalized to an
    arbitrary per-row trailing time frame.
    """
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def frame_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    order: pd.Series(dtype=np.int64),
                    tiebreak: pd.Series(dtype=np.int64),
                    value: pd.Series(dtype=np.int64),
                    out: pd.Series(dtype=np.int64),
                }
            )
        gk = g[group].to_numpy().astype(np.int64)
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        v = g[value].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o, t, v = gk[idx], o[idx], t[idx], v[idx]
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        gid = np.cumsum(first) - 1
        cs = np.concatenate(([0], np.cumsum(v)))
        o_rel = o - int(o.min())
        stride = int(o_rel.max()) + span + 2
        n_groups = int(gid[-1]) + 1
        if n_groups * stride < (1 << 62):
            comp = gid * stride + o_rel
            lo = np.searchsorted(comp, comp - span, side="left")
            hi = np.searchsorted(comp, comp, side="right")
        else:  # pragma: no cover - adversarial spread; per-group slices
            run_start = np.nonzero(first)[0]
            run_end = np.append(run_start[1:], n)
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            for s, e in zip(run_start, run_end):
                seg = o[s:e]
                lo[s:e] = s + np.searchsorted(seg, seg - span, side="left")
                hi[s:e] = s + np.searchsorted(seg, seg, side="right")
        frame = cs[hi] - cs[lo]
        return pd.DataFrame(
            {group: gk, order: o, tiebreak: t, value: v, out: frame.astype(np.int64)}
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(frame_part, batch_format="pandas")
    )


def grouped_resample_ffill(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    value: str = "value_c",
    step: int = 3_600_000_000,
):
    """Per-group regular-grid resample with forward fill: emit one row per
    grid point ``grid_ts = step * k`` for ``k`` in ``[ceil(min_o/step),
    floor(max_o/step)]`` within each group, carrying the group's last
    observed ``value`` at-or-before the grid point — the time-series
    gap-fill / downsample primitive (``generate_series`` + ASOF join in the
    SQL twin).  Observations are first collapsed to latest-per-(group,
    order) by ``tiebreak`` so the carried value is deterministic when two
    events share a timestamp; every grid point is >= the group's first
    observation, so the fill never needs a null branch.

    One coarse hash partition on the group key, then per partition one
    lexsort + run sweep + ONE vectorized ``searchsorted`` of all grid
    points against the composite (group ordinal, order) key — no per-group
    callback, no per-row loop.  Output cardinality is data-dependent
    (span/step per group); at 100 TB pick ``step`` so the grid stays
    O(input) — the kernel's memory is O(rows + grid points) per partition.

    Reference analog: the fixed-cadence page-sampling stride of the
    reference's preview/debug chain (``--preview-every N``), applied
    per-key with carry-forward semantics.
    """
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def resample_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    "grid_ts": pd.Series(dtype=np.int64),
                    value: pd.Series(dtype=np.int64),
                }
            )
        gk = g[group].to_numpy().astype(np.int64)
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        v = g[value].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o, v = gk[idx], o[idx], v[idx]
        # collapse ties: keep the LAST row (max tiebreak) per (group, order)
        keep = np.empty(len(gk), bool)
        keep[-1] = True
        keep[:-1] = (gk[1:] != gk[:-1]) | (o[1:] != o[:-1])
        gk, o, v = gk[keep], o[keep], v[keep]
        n = gk.size
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        run_start = np.nonzero(first)[0]
        run_end = np.append(run_start[1:], n)
        lo_k = -(-o[run_start] // step)  # ceil div
        hi_k = o[run_end - 1] // step
        counts = np.maximum(hi_k - lo_k + 1, 0)
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    "grid_ts": pd.Series(dtype=np.int64),
                    value: pd.Series(dtype=np.int64),
                }
            )
        # flat grid: for group j, counts[j] points lo_k[j]..hi_k[j] (×step)
        grp_of = np.repeat(np.arange(run_start.size, dtype=np.int64), counts)
        off = np.concatenate(([0], np.cumsum(counts)))[:-1]
        k_flat = (
            np.arange(total, dtype=np.int64) - off[grp_of] + lo_k[grp_of]
        )
        grid_ts = k_flat * step
        # composite key: group ordinal × stride + order offset; one global
        # searchsorted finds each grid point's carry row (last obs <= grid).
        # Every grid point lies inside its group's [min_o, max_o], so one
        # stride bound covers both key kinds.
        base = int(o.min())
        stride = int(o.max()) - base + 2
        gid = np.cumsum(first) - 1
        if run_start.size * stride < (1 << 62):
            comp_obs = gid * stride + (o - base)
            comp_grid = grp_of * stride + (grid_ts - base)
            pos = np.searchsorted(comp_obs, comp_grid, side="right") - 1
        else:  # pragma: no cover - adversarial spread; per-group slices
            pos = np.empty(total, np.int64)
            g_off = np.concatenate(([0], np.cumsum(counts)))
            for j, (s, e) in enumerate(zip(run_start, run_end)):
                sl = slice(g_off[j], g_off[j + 1])
                pos[sl] = s + np.searchsorted(o[s:e], grid_ts[sl], side="right") - 1
        return pd.DataFrame(
            {
                group: gk[run_start][grp_of],
                "grid_ts": grid_ts,
                value: v[pos],
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(resample_part, batch_format="pandas")
    )


def pack_examples(
    seq_ds,
    *,
    length: int = 512,
    order: str = "event_ts",
    tiebreak: str | None = None,
    bucket_bits: int = 12,
    num_parts: int | None = None,
):
    """Fixed-length training-example packing stats: lay every document's
    tokens end-to-end in ``order`` sequence, cut the stream into
    ``length``-token examples, and emit one row per example —
    ``(example_id, n_tok, tok_sum, first_tok, last_tok, n_docs)`` — the
    concat-and-chunk step every LLM pre-training pipeline runs before the
    data loader (boundary-exact: first/last token and contributing-doc
    count pin the packed layout, not just the totals).

    Three passes on the :func:`pack_sequences` scan skeleton:

    1. **Offset partials**: per-batch (bucket, Σ n_tok) rows (bucket =
       ``order >> bucket_bits``) → tiny groupby → driver exclusive scan →
       bucket bases broadcast via ``ray.put`` (bucket-scale, never
       doc-scale).
    2. **Pack partials**: ONE ``groupby(bucket)`` co-locates each
       bucket's docs (the single token-scale shuffle); per bucket one
       argsort + flat-gather lays tokens contiguously, global positions
       come from base + within-bucket prefix, and one run sweep over
       ``pos // length`` emits per-(bucket, example) partials — count,
       int64 token sum (reduceat), boundary tokens with their positions,
       and the distinct-doc count (doc-change flags reduceat).  Examples
       spanning bucket boundaries simply emit partials from both sides.
    3. **Fold**: coarse example-hash partition merges partials per
       example — sums add, boundary tokens resolve by min/max position.
       Example-scale rows only.

    **Tied `order` values** (duplicate timestamps are normal in real
    streams — synth.generate_stream emits rows_per_ts rows per tick):
    the packed layout is only deterministic if ties are broken.  When
    ``tiebreak`` is not given, ``doc_id`` is used automatically when the
    input has that column (the stable content key; unique-`order` inputs
    get the identical layout either way).  Only an input with NO doc_id
    column and no explicit tiebreak keeps the fail-loud contract: tied
    orders then raise rather than silently producing a
    nondeterministic layout.

    Reference analog: the fixed-page batching of the sequential renderer
    (cli.py page loop) recast as a deterministic distributed scan.
    """
    num_parts = scaled_parts(32, num_parts)
    import pandas as pd

    import ray

    from ..stages.kernels import flatten_list_column

    if tiebreak is None:
        # default tiebreak: the stable content key when present AND
        # integer-typed (the _tb column casts to int64 — a string doc_id
        # must not break previously-working unique-order inputs), so tied
        # `order` values (normal in real streams) pack deterministically
        # instead of raising; unique-`order` inputs get the identical
        # layout either way (lexsort's secondary key never fires)
        sch = seq_ds.schema()
        if "doc_id" in sch.names:
            t = sch.types[sch.names.index("doc_id")]
            if isinstance(t, pa.DataType) and pa.types.is_integer(t):
                tiebreak = "doc_id"

    # ---- pass 1: bucket bases -------------------------------------------
    def count_partials(b: pa.Table) -> pa.Table:
        o = np.asarray(b[order], np.int64)
        n = np.asarray(b["n_tok"], np.int64)
        bucket = o >> bucket_bits
        ub, inv = np.unique(bucket, return_inverse=True)
        s = np.bincount(inv, weights=n, minlength=ub.size).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(ub, pa.int64()), "s": pa.array(s, pa.int64())}
        )

    sums = (
        seq_ds.select_columns([order, "n_tok"])
        .map_batches(count_partials, batch_format="pyarrow")
        .groupby("bucket")
        .sum("s")
        .to_pandas()
        .sort_values("bucket", ignore_index=True)
    )
    total = sums["sum(s)"].to_numpy().astype(np.int64)
    bases = dict(
        zip(
            sums["bucket"].to_numpy().tolist(),
            (np.cumsum(total) - total).tolist(),
        )
    )
    base_ref = ray.put(bases)

    # ---- pass 2: per-bucket pack partials -------------------------------
    def add_bucket(b: pa.Table) -> pa.Table:
        o = np.asarray(b[order], np.int64)
        cols = {
            order: pa.array(o, pa.int64()),
            "tokens": b["tokens"],
            "n_tok": b["n_tok"].cast(pa.int64()),
            "bucket": pa.array(o >> bucket_bits, pa.int64()),
        }
        if tiebreak is not None:
            cols["_tb"] = b[tiebreak].cast(pa.int64())
        return pa.table(cols)

    _P_EMPTY = {
        "example_id": pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()),
        "tok_sum": pa.array([], pa.int64()),
        "min_pos": pa.array([], pa.int64()),
        "first_tok": pa.array([], pa.int64()),
        "max_pos": pa.array([], pa.int64()),
        "last_tok": pa.array([], pa.int64()),
        "n_docs": pa.array([], pa.int64()),
    }

    def pack_partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(_P_EMPTY)
        o = np.asarray(t[order], np.int64)
        fb = flatten_list_column(t["tokens"])
        flat = np.asarray(fb.values, np.int64)
        offs = np.asarray(fb.offsets, np.int64)
        lens = np.diff(offs)
        # Deterministic layout contract: ties on `order` land in the same
        # bucket (equal keys share a bucket), so either a tiebreak column
        # breaks them (explicit, or the automatic doc_id default) or
        # `order` must be unique — otherwise the packed layout would
        # depend on nondeterministic map_groups row order.
        if "_tb" in t.column_names:
            srt = np.lexsort((np.asarray(t["_tb"], np.int64), o))
        else:
            if np.unique(o).size != o.size:
                raise ValueError(
                    f"pack_examples: duplicate `{order}` values in a "
                    "bucket with no tiebreak column and no doc_id — pass "
                    "tiebreak= to make the packed layout deterministic"
                )
            srt = np.argsort(o, kind="stable")
        lens_s = lens[srt]
        tot = int(lens_s.sum())
        if tot == 0:
            return pa.table(_P_EMPTY)
        # flat gather laying the bucket's tokens contiguously in doc order
        run0 = np.cumsum(lens_s) - lens_s
        gidx = (
            np.repeat(offs[srt], lens_s)
            + np.arange(tot, dtype=np.int64)
            - np.repeat(run0, lens_s)
        )
        toks = flat[gidx]
        base = ray.get(base_ref)[int(o[srt[0]] >> bucket_bits)]
        intra = base + np.cumsum(lens_s) - lens_s
        pos = (
            np.repeat(intra, lens_s)
            + np.arange(tot, dtype=np.int64)
            - np.repeat(run0, lens_s)
        )
        eid = pos // length
        doc_change = np.empty(tot, np.int64)
        doc_change[0] = 1
        di = np.repeat(np.arange(lens_s.size, dtype=np.int64), lens_s)
        doc_change[1:] = (di[1:] != di[:-1]).astype(np.int64)
        first = np.empty(tot, bool)
        first[0] = True
        first[1:] = eid[1:] != eid[:-1]
        rs = np.nonzero(first)[0]
        re_ = np.append(rs[1:], tot) - 1
        doc_change[rs] = 1
        return pa.table(
            {
                "example_id": pa.array(eid[rs], pa.int64()),
                "cnt": pa.array((re_ - rs + 1).astype(np.int64), pa.int64()),
                "tok_sum": pa.array(np.add.reduceat(toks, rs), pa.int64()),
                "min_pos": pa.array(pos[rs], pa.int64()),
                "first_tok": pa.array(toks[rs], pa.int64()),
                "max_pos": pa.array(pos[re_], pa.int64()),
                "last_tok": pa.array(toks[re_], pa.int64()),
                "n_docs": pa.array(np.add.reduceat(doc_change, rs), pa.int64()),
            }
        )

    sel = [order, "tokens", "n_tok"]
    if tiebreak is not None and tiebreak not in sel:
        sel.insert(1, tiebreak)
    partials = (
        seq_ds.select_columns(sel)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_partials, batch_format="pyarrow")
    )

    # ---- pass 3: fold per example (coarse example-hash partition) -------
    def add_pk(b: pa.Table) -> pa.Table:
        e = np.asarray(b["example_id"], np.int64)
        pk = (
            (e.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(40)
        ).astype(np.int64) % num_parts
        return b.append_column("pk", pa.array(pk, pa.int64()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    c: pd.Series(dtype=np.int64)
                    for c in (
                        "example_id", "n_tok", "tok_sum", "first_tok",
                        "last_tok", "n_docs",
                    )
                }
            )
        e = g["example_id"].to_numpy().astype(np.int64)
        mp = g["min_pos"].to_numpy().astype(np.int64)
        o = np.lexsort((mp, e))
        e = e[o]
        first = np.empty(e.size, bool)
        first[0] = True
        first[1:] = e[1:] != e[:-1]
        rs = np.nonzero(first)[0]
        re_ = np.append(rs[1:], e.size) - 1
        gid = np.cumsum(first) - 1
        n_grp = rs.size
        cnt = np.bincount(gid, weights=g["cnt"].to_numpy()[o], minlength=n_grp)
        ts = np.bincount(gid, weights=g["tok_sum"].to_numpy()[o], minlength=n_grp)
        nd = np.bincount(gid, weights=g["n_docs"].to_numpy()[o], minlength=n_grp)
        ft = g["first_tok"].to_numpy()[o][rs]  # min min_pos first per run
        # last_tok: resolve by max max_pos within each run
        xp = g["max_pos"].to_numpy().astype(np.int64)
        o2 = np.lexsort((xp, g["example_id"].to_numpy().astype(np.int64)))
        lt = g["last_tok"].to_numpy()[o2][re_]
        return pd.DataFrame(
            {
                "example_id": e[rs],
                "n_tok": cnt.astype(np.int64),
                "tok_sum": ts.astype(np.int64),
                "first_tok": ft.astype(np.int64),
                "last_tok": lt.astype(np.int64),
                "n_docs": nd.astype(np.int64),
            }
        )

    return (
        partials.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(fold, batch_format="pandas")
    )


def grouped_attribution(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
    touch: str = "click",
    convert: str = "purchase",
    window: int = 604_800_000_000,
):
    """Last-touch attribution: for every CONVERSION row, the most recent
    TOUCH row of the same group at-or-before it (by ``(order, tiebreak)``
    sequence) and within ``window`` — the marketing / retrieval-credit
    primitive (``last_value(touch_id IGNORE NULLS) OVER (...)`` gated by
    the window in the SQL twin).  Emits ``(group, conversion id, order,
    touch id | null)``.

    Same distribution shape as :func:`grouped_lag`: one coarse hash
    partition on the group key, then per partition one lexsort + ONE
    running ``np.maximum.accumulate`` over touch positions (a cummax
    never decreases, so a position carried over from the previous group
    run sorts BELOW the current run's start and is rejected by one
    compare — no per-group reset pass) + a vectorized window gate."""
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def attrib_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    "conv_id": pd.Series(dtype=np.int64),
                    order: pd.Series(dtype=np.int64),
                    "touch_id": pd.Series(dtype="Int64"),
                }
            )
        gk = g[group].to_numpy().astype(np.int64)
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        ty = g[type_col].to_numpy()
        idx = np.lexsort((t, o, gk))
        gk, o, t, ty = gk[idx], o[idx], t[idx], ty[idx]
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        run_start = np.nonzero(first)[0]
        gid = np.cumsum(first) - 1
        pos = np.arange(n, dtype=np.int64)
        is_touch = ty == touch
        cm = np.maximum.accumulate(np.where(is_touch, pos, -1))
        conv = np.nonzero(ty == convert)[0]
        p = cm[conv]
        valid = (p >= run_start[gid[conv]]) & (p >= 0)
        valid &= np.where(valid, o[np.maximum(p, 0)] >= o[conv] - window, False)
        touch_id = pd.array(
            np.where(valid, t[np.maximum(p, 0)], 0), dtype="Int64"
        )
        touch_id[~valid] = pd.NA
        return pd.DataFrame(
            {
                group: gk[conv],
                "conv_id": t[conv],
                order: o[conv],
                "touch_id": touch_id,
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(attrib_part, batch_format="pandas")
    )


def grouped_first_touch(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
    touch: str = "click",
    convert: str = "purchase",
    window: int = 604_800_000_000,
):
    """FIRST-touch attribution: each conversion credits the EARLIEST touch
    row of its group inside the trailing ``[o - window, o]`` RANGE frame —
    the introduction-credit dual of :func:`grouped_attribution` (frame
    semantics are value-based like SQL RANGE: peer touches at the
    conversion's exact ``order`` are in the frame regardless of
    tiebreak).  Emits ``(group, conv_id, order, touch_id | null)``.

    Kernel: the touch subset sorted by (group, order, tiebreak) is
    MONOTONE in the packed (order, tiebreak) key, so "earliest touch in
    the window" is simply the LEFTMOST touch of a contiguous range — per
    partition one lexsort + ONE composite-key double ``searchsorted`` of
    all conversions against the touch subset resolves every credit; no
    prefix-min table, no per-row loop.  The SQL twin packs
    ``(ts − t0)·2^20 + id`` into a RANGE-frame ``min`` — same total
    order, same answer (id < 2^20 bound documented there)."""
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def ft_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    "conv_id": pd.Series(dtype=np.int64),
                    order: pd.Series(dtype=np.int64),
                    "touch_id": pd.Series(dtype="Int64"),
                }
            )
        gk = g[group].to_numpy().astype(np.int64)
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        ty = g[type_col].to_numpy()
        idx = np.lexsort((t, o, gk))
        gk, o, t, ty = gk[idx], o[idx], t[idx], ty[idx]
        first = np.empty(len(g), bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        gid = np.cumsum(first) - 1
        tm = ty == touch
        cv = np.nonzero(ty == convert)[0]
        out_empty = pd.DataFrame(
            {
                group: gk[cv],
                "conv_id": t[cv],
                order: o[cv],
                "touch_id": pd.array([pd.NA] * cv.size, dtype="Int64"),
            }
        )
        if not tm.any() or cv.size == 0:
            return out_empty
        c_gid, c_o, c_t = gid[tm], o[tm], t[tm]
        base = int(c_o.min())
        stride = int(c_o.max()) - base + window + 2
        if (int(gid[-1]) + 1) * stride >= (1 << 62):  # pragma: no cover
            # adversarial spread: per-conversion slices (the range_frame rule)
            lo = np.zeros(cv.size, np.int64)
            hi = np.zeros(cv.size, np.int64)
            for i, ci in enumerate(cv):
                off = np.nonzero(c_gid == gid[ci])[0]
                seg = c_o[off]
                l = np.searchsorted(seg, o[ci] - window, side="left")
                h = np.searchsorted(seg, o[ci], side="right")
                if l < h:
                    lo[i], hi[i] = off[l], off[l] + 1
        else:
            comp_c = c_gid * stride + (c_o - base)
            q_lo = gid[cv] * stride + np.maximum(o[cv] - window - base, -1)
            q_hi = gid[cv] * stride + (o[cv] - base)
            lo = np.searchsorted(comp_c, q_lo, side="left")
            hi = np.searchsorted(comp_c, q_hi, side="right")
        li = np.minimum(lo, max(c_t.size - 1, 0))
        # Post-validate the hit: a conversion trailing every touch of the
        # partition by more than window+1 pushes q_hi past the group's band
        # into a HIGHER gid's band, where lo<hi would credit another key's
        # touch.  A spilled query can only occur when no in-window touch
        # exists (o[cv] > max(c_o) + window), so requiring the matched
        # touch to be in the conversion's group AND inside its RANGE frame
        # rejects every false hit without losing a true one.
        valid = (
            (lo < hi)
            & (c_gid[li] == gid[cv])
            & (c_o[li] >= o[cv] - window)
            & (c_o[li] <= o[cv])
        )
        touch_id = pd.array(np.where(valid, c_t[li], 0), dtype="Int64")
        touch_id[~valid] = pd.NA
        return pd.DataFrame(
            {
                group: gk[cv],
                "conv_id": t[cv],
                order: o[cv],
                "touch_id": touch_id,
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(ft_part, batch_format="pandas")
    )


def grouped_session_stats(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    gap: int = 86_400_000_000,
):
    """Per-SESSION aggregate row: gap-based sessions (the
    :func:`grouped_sessionize` rule) collapsed to ``(group, session_id,
    n_events, start_us, end_us, duration_us)`` — the session-level
    engagement table (dwell time, depth) every analytics pipeline derives
    right after sessionization.  One coarse group partition, one lexsort
    + boundary sweep per partition: session runs fall out of the same
    new-session mask that labels rows, so the aggregate needs NO second
    pass and NO per-session callback."""
    import pandas as pd

    # fanout resolved ONCE, driver-side: resolving inside the per-batch
    # closure would query cluster size at batch time, and a mid-run
    # change would hash the same key into different partition counts
    np_ = scaled_parts(64)

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, np_)

    def part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    group: pd.Series(dtype=np.int64),
                    "session_id": pd.Series(dtype=np.int64),
                    "n_events": pd.Series(dtype=np.int64),
                    "start_us": pd.Series(dtype=np.int64),
                    "end_us": pd.Series(dtype=np.int64),
                    "duration_us": pd.Series(dtype=np.int64),
                }
            )
        gk = g[group].to_numpy().astype(np.int64)
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        idx = np.lexsort((t, o, gk))
        gk, o = gk[idx], o[idx]
        n = len(g)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = gk[1:] != gk[:-1]
        new_sess = first.copy()
        new_sess[1:] |= (o[1:] - o[:-1]) > gap
        st = np.nonzero(new_sess)[0]
        en = np.append(st[1:], n) - 1
        # 1-based session id within each group: session ordinal minus the
        # ordinal of the group's first session
        grp_first = first[st]
        sess_ord = np.arange(st.size, dtype=np.int64)
        base = np.maximum.accumulate(np.where(grp_first, sess_ord, 0))
        sid = sess_ord - base + 1
        return pd.DataFrame(
            {
                group: gk[st],
                "session_id": sid,
                "n_events": (en - st + 1).astype(np.int64),
                "start_us": o[st],
                "end_us": o[en],
                "duration_us": (o[en] - o[st]).astype(np.int64),
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(part, batch_format="pandas")
    )
