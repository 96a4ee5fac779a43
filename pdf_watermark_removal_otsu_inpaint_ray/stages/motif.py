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

    ``payload_rules``: optional list of :class:`PayloadRule` (flat chain,
    'plain' fallback) or a :class:`TwoStageClassifier` (the QR-breadth
    type→keyword dispatch) — when set, a ``payload_class`` column
    classifies each span's trailing payload window (the reference's QR
    content-type heuristics, qr_detector.py:38-121, 309-351).
    """

    def __init__(
        self,
        motifs: list[tuple[str, tuple[int, ...]]],
        cfg: EngineConfig,
        payload_rules: "list[PayloadRule] | TwoStageClassifier | None" = None,
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
            rules = self.payload_rules
            # protocol dispatch, not isinstance: ANY registered object with a
            # .classify(fb, starts, lens, window) method is a classifier
            # (TwoStageClassifier is the built-in); plain lists are rule chains
            _classify = (
                rules.classify
                if hasattr(rules, "classify")
                else lambda fb, fs, lens, w: classify_payloads(fb, fs, lens, rules, w)
            )
            cls = (
                _classify(fb, fs, lens, self.payload_window)
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
# * prefix          — payload starts with a pattern (URL:/WIFI: dispatch);
# * count_min       — occurrence count of a pattern in the window within
#                     [min_count, max_count] (contains-anywhere when
#                     min_count=1; the >=2 'row' tabular rule);
# * ordered_pair    — pattern A followed by pattern B inside the window
#                     (coordinate "lat,lon" regex shape);
# * charclass_range — count of tokens inside a contiguous codepoint class
#                     within [min_count, max_count] (the tel: 7..15-digit
#                     rule, qr_detector.py:38-45: digits are the contiguous
#                     class 48..57).
#
# Rules evaluate in priority order (first hit wins, like the reference's
# if/elif chain); several rules may share a category, which gives the
# reference's OR'd predicates (``tel:`` prefix OR digit count,
# qr_detector.py:106-107) for free.  Unmatched payloads fall back to
# "plain".  Rule tables are registry-pluggable
# (registry.register_payload_rules), mirroring the reference's pluggable
# detector dispatch.
# ---------------------------------------------------------------------------


class PayloadRule:
    """One classification rule; ``kind`` in {prefix, count_min,
    ordered_pair, charclass_range}."""

    def __init__(
        self,
        category: str,
        kind: str,
        patterns: tuple[str, ...],
        min_count: int = 1,
        max_count: int | None = None,
        cls: tuple[str, str] | None = None,
    ):
        if kind not in ("prefix", "count_min", "ordered_pair", "charclass_range"):
            raise ValueError(f"unknown payload rule kind {kind}")
        need = {"ordered_pair": 2, "charclass_range": 0}.get(kind, 1)
        if len(patterns) != need:  # fail at construction, not classify time
            raise ValueError(f"{kind} rule takes exactly {need} pattern(s), got {len(patterns)}")
        if any(not p for p in patterns):
            raise ValueError("empty payload-rule pattern")
        if kind == "charclass_range":
            if cls is None or len(cls) != 2 or cls[0] > cls[1]:
                raise ValueError("charclass_range needs cls=(lo_char, hi_char) with lo <= hi")
            self.cls_lo, self.cls_hi = ord(cls[0]), ord(cls[1])
        elif cls is not None:
            raise ValueError(f"{kind} rule does not consult cls")
        if kind in ("prefix", "ordered_pair") and (min_count != 1 or max_count is not None):
            # these kinds never read the counts — reject rather than let an
            # author-written bound silently change the rule's semantics
            raise ValueError(f"{kind} rule does not consult min_count/max_count")
        self.category = category
        self.kind = kind
        self.patterns = tuple(np.array([ord(c) for c in p], dtype=np.int32) for p in patterns)
        self.min_count = min_count
        self.max_count = max_count


DEFAULT_PAYLOAD_RULES = [
    PayloadRule("scan_link", "prefix", (" scan",)),
    PayloadRule("windowed", "prefix", (" window",)),
    PayloadRule("tabular", "count_min", ("row",), min_count=2),
    PayloadRule("keyed_pair", "ordered_pair", ("key", "value")),
]


def _apply_rules(
    fb: FlatBatch,
    w0: np.ndarray,
    w_end: np.ndarray,
    rules: list[PayloadRule],
) -> tuple[np.ndarray, np.ndarray]:
    """One first-hit-wins pass of ``rules`` over payload windows
    ``[w0, w_end)``; returns (category object array, still-unset mask) with
    NO fallback applied — callers choose the fallback (plain chain vs the
    two-stage QR dispatch)."""
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
            cnt = hi - lo
            hit = cnt >= rule.min_count
            if rule.max_count is not None:
                hit &= cnt <= rule.max_count
        elif rule.kind == "charclass_range":
            # count of window tokens inside the contiguous codepoint class,
            # via one prefix sum (the 7..15-digit tel: rule shape)
            mask = (fb.values >= rule.cls_lo) & (fb.values <= rule.cls_hi)
            psum = np.concatenate([[0], np.cumsum(mask)])
            cnt = psum[w_end] - psum[w0]
            hit = cnt >= rule.min_count
            if rule.max_count is not None:
                hit &= cnt <= rule.max_count
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
    return out, unset


def _payload_windows(
    fb: FlatBatch, flat_starts: np.ndarray, span_lens: np.ndarray, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """Payload window ``[w0, w_end)`` per span: the ``window`` tokens after
    the span, clamped at row end (qr_detector.py:373-400 clamps the same
    way)."""
    w0 = flat_starts + span_lens
    w_end = np.minimum(w0 + window, fb.row_end[flat_starts])
    return w0, w_end


def classify_payloads(
    fb: FlatBatch,
    flat_starts: np.ndarray,
    span_lens: np.ndarray,
    rules: list[PayloadRule] | None = None,
    window: int = 24,
) -> np.ndarray:
    """Category per span event from its payload window, fully vectorized;
    flat first-hit-wins chain with 'plain' fallback."""
    rules = DEFAULT_PAYLOAD_RULES if rules is None else rules
    w0, w_end = _payload_windows(fb, flat_starts, span_lens, window)
    out, unset = _apply_rules(fb, w0, w_end, rules)
    out[unset] = "plain"
    return out


# ---------------------------------------------------------------------------
# QR-breadth two-stage classifier (qr_detector.py:309-351): the reference
# classifies content in TWO stages — a 9-branch prioritized TYPE dispatch
# (url→wifi→contact→email→phone→sms→location→calendar→text), then a
# type→category map in which the ``wifi`` and ``text`` types fall through to
# a keyword classifier (_classify_text_content, qr_detector.py:123-129:
# advertisement / documentation / general).  Each type predicate is an OR of
# sub-predicates (_is_email = ``mailto:`` prefix OR ``@`` anywhere;
# _is_phone = ``tel:`` prefix OR 7..15-digit count, qr_detector.py:92-121),
# expressed here as consecutive rules sharing a category.  Patterns are
# token-space analogs drawn from the synthetic corpus vocabulary; the
# STRUCTURE (dispatch order, OR'd predicates, the count-range rule, the
# wifi fall-through quirk) mirrors the reference exactly.
# ---------------------------------------------------------------------------

_TEXT_TYPE = "__text__"  # sentinel: type resolved, category via keywords

QR_TYPE_RULES = [
    PayloadRule("website", "prefix", (" query",)),  # _is_url: http:// | https://
    PayloadRule("website", "prefix", (" table",)),  # _is_url: www.
    PayloadRule(_TEXT_TYPE, "prefix", (" stream",)),  # _is_wifi: WIFI: (category
    # falls through to the keyword classifier — qr_detector.py:339-351 maps
    # the WIFI type through the final else branch, a faithful quirk)
    PayloadRule("contact", "count_min", ("customer",)),  # _is_contact: VCARD anywhere
    PayloadRule("email", "prefix", (" merge",)),  # _is_email: mailto:
    PayloadRule("email", "count_min", ("join",)),  # _is_email: '@' anywhere
    PayloadRule("phone", "prefix", (" line",)),  # _is_phone: tel:
    PayloadRule("phone", "charclass_range", (), min_count=7, max_count=15,
                cls=("a", "e")),  # _is_phone_number: 7..15 chars of a
    # contiguous class (digits 48..57 in the reference; a..e here)
    PayloadRule("sms", "prefix", (" slow",)),  # _is_sms: sms:
    PayloadRule("sms", "prefix", (" small",)),  # _is_sms: SMSTO:
    PayloadRule("location", "prefix", (" group",)),  # _is_location: geo:
    PayloadRule("location", "ordered_pair", ("key", "value")),  # _is_coordinates:
    # lat , lon ordered pattern
    PayloadRule("calendar", "count_min", ("vector",)),  # _is_calendar: VEVENT anywhere
]

QR_KEYWORD_RULES = [
    # _is_likely_advertisement keyword list (qr_detector.py:57-72), checked
    # before documentation like the reference's if/elif
    PayloadRule("advertisement", "count_min", ("spark",)),
    PayloadRule("advertisement", "count_min", ("fast",)),
    PayloadRule("advertisement", "count_min", ("big",)),
    # _is_likely_documentation keyword list (qr_detector.py:74-89)
    PayloadRule("documentation", "count_min", ("filter",)),
    PayloadRule("documentation", "count_min", ("agg",)),
    PayloadRule("documentation", "count_min", ("column",)),
]


class TwoStageClassifier:
    """Two-pass payload classifier mirroring _classify_qr_content
    (qr_detector.py:309-351): ``type_rules`` first-hit-wins; spans whose
    type is the text sentinel (or unmatched) are classified by
    ``keyword_rules``, falling back to ``fallback``."""

    def __init__(
        self,
        type_rules: list[PayloadRule] | None = None,
        keyword_rules: list[PayloadRule] | None = None,
        fallback: str = "general",
    ):
        self.type_rules = QR_TYPE_RULES if type_rules is None else type_rules
        self.keyword_rules = QR_KEYWORD_RULES if keyword_rules is None else keyword_rules
        self.fallback = fallback

    def classify(
        self,
        fb: FlatBatch,
        flat_starts: np.ndarray,
        span_lens: np.ndarray,
        window: int = 24,
    ) -> np.ndarray:
        w0, w_end = _payload_windows(fb, flat_starts, span_lens, window)
        out, unset = _apply_rules(fb, w0, w_end, self.type_rules)
        to_text = unset | (out == _TEXT_TYPE)
        if to_text.any():
            kw, kw_unset = _apply_rules(fb, w0, w_end, self.keyword_rules)
            kw[kw_unset] = self.fallback
            out[to_text] = kw[to_text]
        return out


def category_filter(events: pa.Table, categories: tuple[str, ...]) -> pa.Table:
    """J3 semi-filter: keep span events whose category is in the removal set."""
    import pyarrow.compute as pc

    return events.filter(pc.is_in(events["category"], value_set=pa.array(categories)))
