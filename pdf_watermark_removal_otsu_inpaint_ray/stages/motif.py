"""CEP motif detection: match structured token subsequences, emit span events.

Token-space analog of QR-code detection + content classification
(qr_detector.py:226-400, 92-121): a *motif* is a category-tagged token
pattern; matches become span events ``(doc_id, source, span_start, span_len,
category)`` that are later joined back against the document stream (J1) and
category-filtered (J3, default removal set watermark_detector.py:264-270).

Matching is flat-vectorized: for a pattern of length L, a position i matches
iff ``values[i+j] == pat[j]`` for all j and ``i+L <= row_end[i]`` — L shifted
equality ANDs over the whole flattened batch, no per-row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from .kernels import FlatBatch, flatten_list_column


def find_pattern_flat(fb: FlatBatch, pattern: np.ndarray) -> np.ndarray:
    """Start indices (flat) of all matches of ``pattern`` within rows."""
    L = pattern.size
    n = fb.values.size
    if L == 0 or n < L:
        return np.zeros(0, dtype=np.int64)
    match = np.ones(n - L + 1, dtype=bool)
    for j in range(L):
        match &= fb.values[j : n - L + 1 + j] == pattern[j]
    starts = np.nonzero(match)[0]
    # in-row constraint: the match must not cross the row boundary
    return starts[starts + L <= fb.row_end[starts]]


def find_pattern_rolling(fb: FlatBatch, pattern: np.ndarray) -> np.ndarray:
    """Alternate matcher backend: Rabin-Karp rolling hash over the flat
    values (one cumsum of weighted terms + one vectorized compare per
    batch, independent of pattern length), candidates verified exactly —
    identical result set to :func:`find_pattern_flat`.  The dual-backend
    dispatch mirrors the reference's opencv|pyzbar QR backend selection
    (qr_detector.py:150-169); prefer this backend for LONG patterns, where
    the shifted-AND matcher pays one pass per pattern position."""
    L = pattern.size
    n = fb.values.size
    if L == 0 or n < L:
        return np.zeros(0, dtype=np.int64)
    P = np.uint64(1099511628211)  # odd -> multiplication is invertible mod 2^64
    pw = np.empty(n + 1, dtype=np.uint64)
    pw[0] = np.uint64(1)
    np.multiply.accumulate(np.full(n, P, dtype=np.uint64), dtype=np.uint64, out=pw[1:])
    # window hash at i satisfies  S[i+L]-S[i] == T * P^i  (no inverse needed)
    w = fb.values.astype(np.uint64) * pw[:n]
    S = np.concatenate([[np.uint64(0)], np.cumsum(w, dtype=np.uint64)])
    T = (pattern.astype(np.uint64) * pw[:L]).sum(dtype=np.uint64)
    cand = np.nonzero((S[L:] - S[: n - L + 1]) == T * pw[: n - L + 1])[0]
    if cand.size == 0:
        return cand.astype(np.int64)
    # exact verification of hash candidates (collisions are ~2^-64, but the
    # contract is exactness)
    ok = np.ones(cand.size, dtype=bool)
    for j in range(L):
        ok &= fb.values[cand + j] == pattern[j]
    starts = cand[ok].astype(np.int64)
    return starts[starts + L <= fb.row_end[starts]]


class MotifStage:
    """Stateless map_batches body: sequence batch → span-event rows.

    ``motifs``: list of (category, pattern tuple).  Emits the *first* match
    per (row, category) — mirroring the reference emitting one QRCodeInfo per
    detected code with its category (qr_detector.py:226-268).

    ``payload_rules``: optional list of :class:`PayloadRule` — when set, a
    ``payload_class`` column classifies each span's trailing payload window
    (the reference's QR content-type heuristics, qr_detector.py:38-121).
    """

    def __init__(
        self,
        motifs: list[tuple[str, tuple[int, ...]]],
        cfg: EngineConfig,
        payload_rules: "list[PayloadRule] | None" = None,
        payload_window: int = 24,
        matcher: str = "exact",
    ):
        from ..registry import get_motif_matcher

        self.motifs = [(c, np.asarray(p, dtype=np.int32)) for c, p in motifs]
        self.cfg = cfg
        self.payload_rules = payload_rules
        self.payload_window = payload_window
        self.matcher = get_motif_matcher(matcher)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fb = flatten_list_column(batch["tokens"])
        ids = np.asarray(batch["doc_id"])
        srcs = np.asarray(batch["source"])
        out_id, out_src, out_cat = [], [], []
        flat_starts: list[np.ndarray] = []
        out_len: list[int] = []
        for cat, pat in self.motifs:
            starts = self.matcher(fb, pat)
            if starts.size == 0:
                continue
            rows = fb.seg[starts]
            # first match per row: starts are ascending, keep first per row
            first = np.concatenate([[True], rows[1:] != rows[:-1]])
            starts, rows = starts[first], rows[first]
            out_id.extend(ids[rows])
            out_src.extend(srcs[rows])
            flat_starts.append(starts)
            out_len.extend([int(pat.size)] * rows.size)
            out_cat.extend([cat] * rows.size)
        fs = np.concatenate(flat_starts) if flat_starts else np.zeros(0, np.int64)
        lens = np.asarray(out_len, dtype=np.int64)
        cols = {
            "doc_id": pa.array([str(x) for x in out_id], pa.string()),
            "source": pa.array([str(x) for x in out_src], pa.string()),
            "span_start": pa.array((fs - fb.offsets[fb.seg[fs]] if fs.size else fs).astype(np.int32), pa.int32()),
            "span_len": pa.array(lens.astype(np.int32), pa.int32()),
            "category": pa.array(out_cat, pa.string()),
        }
        if self.payload_rules is not None:
            cls = (
                classify_payloads(fb, fs, lens, self.payload_rules, self.payload_window)
                if fs.size
                else np.zeros(0, dtype=object)
            )
            cols["payload_class"] = pa.array(cls.tolist(), pa.string())
        return pa.table(cols)


# ---------------------------------------------------------------------------
# payload classification (reference analog: QR content-type heuristics,
# qr_detector.py:38-121 — prefix dispatch URL:/WIFI:/mailto:, the tel:
# digit-COUNT rule, and the lat,lon coordinate-PATTERN regex).  The token-
# space analogs classify the payload window (the P tokens following a
# matched span) with three vectorized rule kinds:
#
# * prefix      — payload starts with a pattern (URL:/WIFI: dispatch);
# * count_min   — >= k occurrences of a pattern in the window (phone
#                 digit-count rule);
# * ordered_pair— pattern A followed by pattern B inside the window
#                 (coordinate "lat,lon" regex shape).
#
# Rules evaluate in priority order (first hit wins, like the reference's
# if/elif chain); unmatched payloads fall back to "plain".  Rule tables are
# registry-pluggable (registry.register_payload_rules), mirroring the
# reference's pluggable detector dispatch.
# ---------------------------------------------------------------------------


class PayloadRule:
    """One classification rule; ``kind`` in {prefix, count_min, ordered_pair}."""

    def __init__(self, category: str, kind: str, patterns: tuple[str, ...], min_count: int = 1):
        if kind not in ("prefix", "count_min", "ordered_pair"):
            raise ValueError(f"unknown payload rule kind {kind}")
        need = 2 if kind == "ordered_pair" else 1
        if len(patterns) != need:  # fail at construction, not classify time
            raise ValueError(f"{kind} rule takes exactly {need} pattern(s), got {len(patterns)}")
        if any(not p for p in patterns):
            raise ValueError("empty payload-rule pattern")
        self.category = category
        self.kind = kind
        self.patterns = tuple(np.array([ord(c) for c in p], dtype=np.int32) for p in patterns)
        self.min_count = min_count


DEFAULT_PAYLOAD_RULES = [
    PayloadRule("scan_link", "prefix", (" scan",)),
    PayloadRule("windowed", "prefix", (" window",)),
    PayloadRule("tabular", "count_min", ("row",), min_count=2),
    PayloadRule("keyed_pair", "ordered_pair", ("key", "value")),
]


def classify_payloads(
    fb: FlatBatch,
    flat_starts: np.ndarray,
    span_lens: np.ndarray,
    rules: list[PayloadRule] | None = None,
    window: int = 24,
) -> np.ndarray:
    """Category per span event from its payload window, fully vectorized.

    ``flat_starts``: flat value-index of each span start; the payload
    window is the ``window`` tokens after the span, clamped at row end
    (qr_detector.py:373-400 clamps the same way)."""
    rules = DEFAULT_PAYLOAD_RULES if rules is None else rules
    w0 = flat_starts + span_lens
    w_end = np.minimum(w0 + window, fb.row_end[flat_starts])
    out = np.full(w0.size, None, dtype=object)
    unset = np.ones(w0.size, dtype=bool)
    for rule in rules:
        if not unset.any():
            break
        if rule.kind == "prefix":
            q = rule.patterns[0]
            ok = w0 + q.size <= w_end
            if ok.any():
                idx = np.nonzero(ok)[0]
                gather = fb.values[w0[idx][:, None] + np.arange(q.size)[None, :]]
                ok2 = (gather == q[None, :]).all(axis=1)
                hit = np.zeros(w0.size, dtype=bool)
                hit[idx] = ok2
            else:
                hit = ok
        elif rule.kind == "count_min":
            q = rule.patterns[0]
            m = find_pattern_flat(fb, q)
            lo = np.searchsorted(m, w0)
            hi = np.searchsorted(m, w_end - q.size + 1)
            hit = (hi - lo) >= rule.min_count
        else:  # ordered_pair
            qa, qb = rule.patterns
            ma = find_pattern_flat(fb, qa)
            mb = find_pattern_flat(fb, qb)
            if ma.size == 0 or mb.size == 0:
                hit = np.zeros(w0.size, dtype=bool)
            else:
                ia = np.searchsorted(ma, w0)
                iac = np.minimum(ia, ma.size - 1)
                has_a = (ia < ma.size) & (ma[iac] + qa.size <= w_end)
                pos_a = np.where(has_a, ma[iac], 0)
                lo_b = np.searchsorted(mb, pos_a + qa.size)
                hi_b = np.searchsorted(mb, w_end - qb.size + 1)
                hit = has_a & (hi_b > lo_b)
        take = hit & unset
        out[take] = rule.category
        unset &= ~hit
    out[unset] = "plain"
    return out


def category_filter(events: pa.Table, categories: tuple[str, ...]) -> pa.Table:
    """J3 semi-filter: keep span events whose category is in the removal set."""
    import pyarrow.compute as pc

    return events.filter(pc.is_in(events["category"], value_set=pa.array(categories)))


def spans_to_flag_ranges(
    events: pa.Table, pad: int
) -> dict[str, list[tuple[int, int]]]:
    """doc_id → padded [start, stop) ranges (qr_detector.py:373-400: ±pad,
    clamped at apply time)."""
    out: dict[str, list[tuple[int, int]]] = {}
    for i in range(events.num_rows):
        d = events["doc_id"][i].as_py()
        s = events["span_start"][i].as_py() - pad
        e = events["span_start"][i].as_py() + events["span_len"][i].as_py() + pad
        out.setdefault(d, []).append((s, e))
    return out
