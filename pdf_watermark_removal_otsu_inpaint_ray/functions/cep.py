"""CEP primitives over keyed event streams: staged funnels, immediate
follow-by pattern matches, and per-key-per-window rate caps.

These are the complex-event-processing shapes of the engine's streaming
tier (reference analog: the sticky first-window detection chain,
``watermark_detector.py`` — "first hit wins, later hits conditional on the
earlier one"), re-expressed as batch operators over a keyed event table so
they get closed-form SQL twins:

* :func:`funnel` — per group, the timestamp of the first ``steps[0]``
  event, then the first ``steps[1]`` STRICTLY AFTER it, and so on — the
  ordered-conversion query (``MATCH_RECOGNIZE`` A → B → C with greedy
  first-occurrence semantics).
* :func:`match_next` — rows of type A whose IMMEDIATELY NEXT event in the
  group is type B within a gap (``lead()`` adjacency, the strictest
  follow-by form).
* :func:`rate_limit` — keep only the first ``k`` rows per (group, tumbling
  window) in arrival order: the throttling / per-key-cap primitive (the
  per-domain document-cap shape of web-scale corpus curation).

Distribution contract (shared with ``functions/packing.py``): ONE coarse
hash partition on the group key alone — never on time — co-locates every
group's rows, so each operator resolves with one vectorized pass per
partition (factorize / lexsort + segment sweeps), no per-group Python
callback, no boundary exchange between partitions.  A single hot group
lands in one task; the documented escape is salting + a boundary hand-off
as in ``pack_sequences``.  The shuffle carries only the projected event
columns (group, order, tiebreak, type), never payloads.
"""

from __future__ import annotations

from ..config import scaled_parts

import numpy as np
import pyarrow as pa

from .packing import _add_group_pk

_I64_MAX = np.iinfo(np.int64).max


def funnel(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
    steps: tuple[str, ...] = ("signup", "view", "purchase"),
    within: int | None = None,
    num_parts: int | None = None,
):
    """Per-group ordered funnel → one row per distinct group key:
    ``(group, ts_<step>... , stage)`` where ``ts_<steps[k]>`` is the first
    ``steps[k]`` timestamp strictly after the group's ``ts_<steps[k-1]>``
    (-1 when the stage is never reached) and ``stage`` counts completed
    steps.  Groups with no step events still emit a row (stage 0), so the
    SQL twin is DISTINCT keys LEFT-JOINed through the staged mins.

    ``within`` adds the MATCH_RECOGNIZE time constraint: stage k (k >= 1)
    only matches rows with ``ts <= ts_<steps[k-1]> + within`` — the
    staged-min band semantics (the stage min over the bounded window; a
    timed-out key simply never reaches stage k, it does not restart).

    No sort at all: each stage is one boolean mask + ``np.minimum.at``
    segment-min per partition, chained through the previous stage's
    per-group threshold.
    """
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    ts_cols = [f"ts_{s}" for s in steps]

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, num_parts)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            out = {group: np.zeros(0, np.int64)}
            out.update({c: np.zeros(0, np.int64) for c in ts_cols})
            out["stage"] = np.zeros(0, np.int64)
            return pd.DataFrame(out)
        gk = g[group].to_numpy()
        o = g[order].to_numpy().astype(np.int64)
        typ = g[type_col].to_numpy()
        codes, uniques = pd.factorize(gk)
        n_g = len(uniques)
        prev = np.full(n_g, np.int64(-(1 << 62)))  # stage 0: no threshold
        stage = np.zeros(n_g, np.int64)
        firsts = []
        for s_idx, s in enumerate(steps):
            res = np.full(n_g, _I64_MAX)
            cand = (typ == s) & (o > prev[codes])
            if within is not None and s_idx > 0:
                # band upper bound; unreached groups carry I64_MAX — clamp
                # so the addition cannot overflow (they fail o > prev anyway)
                ub = prev[codes]
                upper = np.where(ub >= _I64_MAX - within, _I64_MAX, ub + within)
                cand &= o <= upper
            if cand.any():
                np.minimum.at(res, codes[cand], o[cand])
            reached = res != _I64_MAX
            stage += reached.astype(np.int64)
            firsts.append(np.where(reached, res, np.int64(-1)))
            # unreached groups carry threshold I64_MAX: later stages can
            # never fire for them (o > I64_MAX is empty), keeping the
            # strictly-ordered semantics
            prev = np.where(reached, res, _I64_MAX)
        out = {group: uniques.astype(np.int64)}
        out.update(dict(zip(ts_cols, firsts)))
        out["stage"] = stage
        return pd.DataFrame(out)

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(resolve, batch_format="pandas")
    )


def match_next(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
    first: str = "view",
    second: str = "purchase",
    max_gap: int = 3_600_000_000,
    num_parts: int | None = None,
):
    """Immediate follow-by match: emit each row of type ``first`` whose
    NEXT event in its group (by ``order, tiebreak``) has type ``second``
    and arrives within ``max_gap`` — ``lead()`` adjacency, i.e. nothing at
    all may occur between the pair.  → ``(group, tiebreak, ts_first,
    ts_second, delta)``; one lexsort + shifted-compare per partition."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, num_parts)

    def match(g: pd.DataFrame) -> pd.DataFrame:
        cols = {
            group: np.zeros(0, np.int64),
            tiebreak: np.zeros(0, np.int64),
            "ts_first": np.zeros(0, np.int64),
            "ts_second": np.zeros(0, np.int64),
            "delta_us": np.zeros(0, np.int64),
        }
        if len(g) < 2:
            return pd.DataFrame(cols)
        gk = g[group].to_numpy().astype(np.int64)
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        typ = g[type_col].to_numpy()
        idx = np.lexsort((t, o, gk))
        gk, o, t, typ = gk[idx], o[idx], t[idx], typ[idx]
        same = gk[1:] == gk[:-1]
        hit = same & (typ[:-1] == first) & (typ[1:] == second)
        delta = o[1:] - o[:-1]
        hit &= delta <= max_gap
        return pd.DataFrame(
            {
                group: gk[:-1][hit],
                tiebreak: t[:-1][hit],
                "ts_first": o[:-1][hit],
                "ts_second": o[1:][hit],
                "delta_us": delta[hit],
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(match, batch_format="pandas")
    )


def rate_limit(
    ds,
    *,
    group: str = "user_id",
    order: str = "ts_us",
    tiebreak: str = "event_id",
    window_us: int = 3_600_000_000,
    k: int = 3,
    num_parts: int | None = None,
):
    """Per-(group, tumbling window) arrival-order cap: keep only the first
    ``k`` rows of each group in each ``window_us`` window, ordered by
    ``(order, tiebreak)`` — the throttling primitive (and, keyed by domain
    instead of user, the per-domain document cap of corpus curation).
    → kept rows ``(group, window_id, order, tiebreak, rn)`` with ``rn`` the
    1-based arrival rank.  One lexsort + segment-cumcount per partition —
    ``row_number() OVER (PARTITION BY g, win ORDER BY o, t) <= k``."""
    num_parts = scaled_parts(64, num_parts)
    import pandas as pd

    def add_pk(b: pa.Table) -> pa.Table:
        return _add_group_pk(b, group, num_parts)

    def cap(g: pd.DataFrame) -> pd.DataFrame:
        cols = {
            group: np.zeros(0, np.int64),
            "window_id": np.zeros(0, np.int64),
            order: np.zeros(0, np.int64),
            tiebreak: np.zeros(0, np.int64),
            "rn": np.zeros(0, np.int64),
        }
        if len(g) == 0:
            return pd.DataFrame(cols)
        gk = g[group].to_numpy().astype(np.int64)
        o = g[order].to_numpy().astype(np.int64)
        t = g[tiebreak].to_numpy().astype(np.int64)
        win = o // window_us
        idx = np.lexsort((t, o, win, gk))
        gk, o, t, win = gk[idx], o[idx], t[idx], win[idx]
        new_seg = np.empty(len(gk), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (gk[1:] != gk[:-1]) | (win[1:] != win[:-1])
        seg_start = np.flatnonzero(new_seg)
        rn = np.arange(len(gk)) - np.repeat(
            seg_start, np.diff(np.append(seg_start, len(gk)))
        )
        keep = rn < k
        return pd.DataFrame(
            {
                group: gk[keep],
                "window_id": win[keep],
                order: o[keep],
                tiebreak: t[keep],
                "rn": rn[keep] + 1,
            }
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(cap, batch_format="pandas")
    )
