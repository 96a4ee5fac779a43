"""Single-process NumPy oracle — the golden semantics of the engine.

This module is the 1-D token-space port of the reference algorithm
(``/root/reference/src/pdf_watermark_removal/``), written as simple,
obviously-correct per-row code.  It is the byte-equality target for the
distributed Ray Data pipelines (``tests/test_pipeline_golden.py``):
identical row set by ``doc_id`` and identical ``tokens`` arrays.

Chain per row (SURVEY.md §3.3; reference ``watermark_detector.py:362-419``,
``watermark_remover.py:174-302``)::

    raw flag  ->  protect (background, text; AND-NOT)  ->  refine (OPEN x1,
    CLOSE x2)  ->  span filter  ->  dynamic radius  ->  neighborhood inpaint
    ->  strength blend          [x passes, with mask dilation on pass > 0]

The load-bearing ordering rule is **Protect First, Refine Second**
(``watermark_detector.py:447-479``).

Documented deviations from the reference (pixels -> int tokens):

* TELEA inpaint -> nearest-unflagged-neighbor fill (tie broken toward the
  left); the dynamic radius (``watermark_remover.py:143-150``) is computed
  and reported but does not change the fill value.
* Strength blending -> integer-safe select: a flagged position takes the
  inpainted value iff ``strength >= 0.5`` (``watermark_remover.py:78-99``).
* connectedComponents area filter -> span-length filter; the aspect-ratio
  test has no 1-D analog.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .config import DEFAULT_CONFIG, EngineConfig

# ---------------------------------------------------------------------------
# 1-D morphology (clamped-window semantics)
# ---------------------------------------------------------------------------


def dilate(flag: np.ndarray, r: int) -> np.ndarray:
    """1-D binary dilation: y[i] = any(flag[i-r : i+r+1]) with clamped window."""
    if r <= 0 or flag.size == 0:
        return flag.copy()
    n = flag.size
    cs = np.concatenate([[0], np.cumsum(flag.astype(np.int64))])
    i = np.arange(n)
    lo = np.maximum(i - r, 0)
    hi = np.minimum(i + r + 1, n)
    return (cs[hi] - cs[lo]) > 0


def erode(flag: np.ndarray, r: int) -> np.ndarray:
    """1-D binary erosion: y[i] = all(flag[i-r : i+r+1]) with clamped window."""
    if r <= 0 or flag.size == 0:
        return flag.copy()
    n = flag.size
    cs = np.concatenate([[0], np.cumsum(flag.astype(np.int64))])
    i = np.arange(n)
    lo = np.maximum(i - r, 0)
    hi = np.minimum(i + r + 1, n)
    return (cs[hi] - cs[lo]) == (hi - lo)


def morph_open(flag: np.ndarray, r: int) -> np.ndarray:
    return dilate(erode(flag, r), r)


def morph_close(flag: np.ndarray, r: int) -> np.ndarray:
    return erode(dilate(flag, r), r)


def runs(flag: np.ndarray) -> list[tuple[int, int]]:
    """Maximal runs of True as (start, stop) half-open intervals."""
    if flag.size == 0:
        return []
    x = flag.astype(np.int8)
    d = np.diff(x)
    starts = list(np.nonzero(d == 1)[0] + 1)
    stops = list(np.nonzero(d == -1)[0] + 1)
    if x[0]:
        starts = [0] + starts
    if x[-1]:
        stops = stops + [flag.size]
    return list(zip(starts, stops))


def drop_short_runs(flag: np.ndarray, min_run: int) -> np.ndarray:
    out = flag.copy()
    for s, e in runs(flag):
        if e - s < min_run:
            out[s:e] = False
    return out


# ---------------------------------------------------------------------------
# Detection (reference watermark_detector.py:147-191)
# ---------------------------------------------------------------------------


def gray_of(tokens: np.ndarray, cfg: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """Gray projection of token ids (reference: cv2 RGB2GRAY, detector:159)."""
    return (tokens % cfg.gray_mod).astype(np.int64)


def hist_of(gray: np.ndarray, cfg: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """256-bin histogram (reference: cv2.calcHist, detector:162-165)."""
    return np.bincount(gray, minlength=cfg.gray_mod).astype(np.int64)


def detect_wm_token(hist: np.ndarray, cfg: EngineConfig = DEFAULT_CONFIG) -> tuple[int, float]:
    """Pick the watermark token from a histogram.

    Mirrors ``detect_watermark_color`` (watermark_detector.py:168-189):
    scan the top-10 bins by count descending (ties broken toward the larger
    gray value, matching ``np.argsort(hist)[::-1]`` with a stable sort) and
    return the first bin with ``100 <= gray <= 250`` and coverage in
    ``[1%, 20%]`` inclusive.  Returns ``(-1, 0.0)`` when nothing qualifies.
    """
    total = int(hist.sum())
    if total == 0:
        return -1, 0.0
    order = np.argsort(hist, kind="stable")[::-1]
    for idx in order[: cfg.wm_topk]:
        gray_val = int(idx)
        coverage = hist[idx] / total * 100.0
        if cfg.wm_gray_lo <= gray_val <= cfg.wm_gray_hi and cfg.wm_cov_lo <= coverage <= cfg.wm_cov_hi:
            return gray_val, float(coverage)
    return -1, 0.0


# ---------------------------------------------------------------------------
# Per-row mask chain
# ---------------------------------------------------------------------------


def text_protect_mask(gray: np.ndarray, cfg: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """Protect content tokens (reference get_text_protect_mask, detector:193-229).

    core = gray <= 140 (THRESH_BINARY_INV semantics) -> dilate ±3 ->
    drop protect runs shorter than 2 (the 2x2 OPEN).
    """
    core = gray <= cfg.text_threshold
    expanded = dilate(core, cfg.text_expand)
    return drop_short_runs(expanded, cfg.text_min_run)


def detect_mask(
    tokens: np.ndarray,
    wm_token: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    max_span: int | None = None,
) -> np.ndarray:
    """Full detect -> protect -> refine -> span-filter chain for one row.

    Mirrors ``detect_watermark_mask`` + ``refine_mask``
    (watermark_detector.py:362-419, 430-480, 775-789).
    """
    gray = gray_of(tokens, cfg)
    # 1. raw color mask (detector:439-441); strict <
    flag = np.abs(gray - wm_token) < cfg.tolerance
    # 2. PROTECT FIRST (detector:447-467)
    flag &= ~(gray > cfg.background_threshold)
    if cfg.protect_text and not (cfg.skip_text_protect_lo <= wm_token <= cfg.skip_text_protect_hi):
        flag &= ~text_protect_mask(gray, cfg)
    # 3. REFINE SECOND (detector:470-479): OPEN x1 then CLOSE x2
    r = cfg.refine_radius
    flag = morph_open(flag, r)
    flag = morph_close(flag, r)
    flag = morph_close(flag, r)
    # 4. span filter (detector:775-789)
    hi = max_span if max_span is not None else cfg.max_span
    out = np.zeros_like(flag)
    for s, e in runs(flag):
        if cfg.min_span <= e - s <= hi:
            out[s:e] = True
    return out


def auto_raw_mask(tokens: np.ndarray, cfg: EngineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """Automatic-mode raw detector (M3 ∪ M4, watermark_detector.py:497-508).

    M3 — local-mean threshold (1-D analog of adaptiveThreshold GAUSSIAN_C
    block=11 C=2; uniform mean instead of gaussian — documented deviation),
    integer-exact: flag iff ``(gray + C) * width > window_sum``.
    M4 — "saturation" channel ``(tok // 256) % 256`` below
    ``max(30, floor(0.6 * mean))`` (integer formula ``(6*sum)//(10*n)``).
    """
    n = tokens.size
    gray = gray_of(tokens, cfg)
    r = cfg.auto_block // 2
    cs = np.concatenate([[0], np.cumsum(gray)])
    i = np.arange(n)
    lo = np.maximum(i - r, 0)
    hi = np.minimum(i + r + 1, n)
    m3 = (gray + cfg.auto_c) * (hi - lo) > (cs[hi] - cs[lo])
    sat = (tokens.astype(np.int64) // cfg.gray_mod) % cfg.gray_mod
    thr = max(cfg.sat_floor, int((6 * int(sat.sum())) // (10 * n))) if n else cfg.sat_floor
    m4 = sat < thr
    return m3 | m4


def detect_mask_auto(
    tokens: np.ndarray,
    cfg: EngineConfig = DEFAULT_CONFIG,
    max_span: int | None = None,
) -> np.ndarray:
    """Automatic detection chain (watermark_detector.py:483-545): raw M3∪M4
    → background protect → text protect (always, when enabled) → OPEN x1,
    CLOSE x2 → span filter."""
    gray = gray_of(tokens, cfg)
    flag = auto_raw_mask(tokens, cfg)
    flag &= ~(gray > cfg.background_threshold)
    if cfg.protect_text:
        flag &= ~text_protect_mask(gray, cfg)
    r = cfg.refine_radius
    flag = morph_open(flag, r)
    flag = morph_close(flag, r)
    flag = morph_close(flag, r)
    hi = max_span if max_span is not None else cfg.max_span
    out = np.zeros_like(flag)
    for s, e in runs(flag):
        if cfg.min_span <= e - s <= hi:
            out[s:e] = True
    return out


def inpaint_row(tokens: np.ndarray, flag: np.ndarray) -> np.ndarray:
    """Neighborhood inpaint: each flagged position takes the token value of
    its nearest unflagged position in the row (tie -> left).  A fully
    flagged row is returned unchanged.  1-D analog of TELEA
    (watermark_remover.py:160-164)."""
    n = tokens.size
    if n == 0 or not flag.any():
        return tokens.copy()
    if flag.all():
        return tokens.copy()
    out = tokens.copy()
    unflagged = np.nonzero(~flag)[0]
    for i in np.nonzero(flag)[0]:
        pos = np.searchsorted(unflagged, i)
        left = unflagged[pos - 1] if pos > 0 else None
        right = unflagged[pos] if pos < unflagged.size else None
        if left is None:
            src = right
        elif right is None:
            src = left
        else:
            src = left if (i - left) <= (right - i) else right
        out[i] = tokens[src]
    return out


def dynamic_radius(coverage: float, cfg: EngineConfig = DEFAULT_CONFIG) -> int:
    """watermark_remover.py:143-150."""
    return max(2, int(cfg.inpaint_radius + coverage * 10 * cfg.strength))


@dataclass
class RowResult:
    tokens: np.ndarray
    wm_token: int
    coverage_pct: float
    radius: int
    n_passes: int


def process_row(
    tokens: np.ndarray,
    wm_token: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    max_span: int | None = None,
    forced_ranges: np.ndarray | None = None,
) -> RowResult:
    """Multi-pass removal for one row (watermark_remover.py:234-302).

    ``wm_token < 0`` (no detection for this row's window) is a passthrough,
    matching the reference returning the page unchanged when no color was
    detected — unless ``forced_ranges`` (motif/QR spans, already padded) are
    present: those are OR-ed into the mask AFTER the detect/protect/refine
    chain, exempt from protection, exactly like the QR mask combine
    (watermark_detector.py:680-694, 744-751).
    """
    result = tokens.astype(np.int32, copy=True)
    auto = cfg.detection_method == "auto"
    has_forced = forced_ranges is not None and len(forced_ranges) > 0
    if wm_token < 0 and not has_forced and not auto:
        return RowResult(result, -1, 0.0, 0, 0)
    last_cov, last_rad, used = 0.0, 0, 0
    for p in range(cfg.passes):
        if auto:
            mask = detect_mask_auto(result, cfg, max_span=max_span)
        elif wm_token >= 0:
            mask = detect_mask(result, wm_token, cfg, max_span=max_span)
        else:
            mask = np.zeros(result.size, dtype=bool)
        if has_forced:
            for a, b in forced_ranges:
                mask[max(0, int(a)) : min(result.size, int(b))] = True
        if not mask.any():
            break
        if p > 0:
            mask = dilate(mask, 1)  # remover:249-251 (3x3 ellipse dilate)
        cov = float(np.count_nonzero(mask)) / max(1, mask.size)
        rad = dynamic_radius(cov, cfg)
        inpainted = inpaint_row(result, mask)
        if cfg.strength >= 0.5:  # integer-safe blend select (remover:78-99)
            result = np.where(mask, inpainted, result).astype(np.int32)
        last_cov, last_rad, used = cov * 100.0, rad, p + 1
    return RowResult(result, wm_token, last_cov, last_rad, used)


# ---------------------------------------------------------------------------
# Windowing + full-stream oracle
# ---------------------------------------------------------------------------


def governing_window(ts: np.ndarray, cfg: EngineConfig) -> np.ndarray:
    """The window whose detection rewrites a row.

    tumbling: ``ts // size``; sliding: ``ts // slide`` (the most recent
    window containing ts, given size >= slide); global: 0.  Session windows
    are assigned per source in :func:`assign_session_windows`.
    """
    if cfg.window_kind == "tumbling":
        return ts // cfg.window_size
    if cfg.window_kind == "sliding":
        return ts // cfg.window_slide
    if cfg.window_kind == "global":
        return np.zeros_like(ts)
    raise ValueError(f"bad window kind {cfg.window_kind}")


def contributing_windows(ts: int, cfg: EngineConfig) -> list[int]:
    """All windows whose histogram a row at ``ts`` contributes to."""
    if cfg.window_kind == "tumbling":
        return [ts // cfg.window_size]
    if cfg.window_kind == "sliding":
        k_max = ts // cfg.window_slide
        k_min = max(0, (ts - cfg.window_size) // cfg.window_slide + 1)
        return list(range(k_min, k_max + 1))
    if cfg.window_kind == "global":
        return [0]
    raise ValueError(f"bad window kind {cfg.window_kind}")


def assign_session_windows(ts_sorted: np.ndarray, gap: int) -> np.ndarray:
    """Session window id per element of an ascending ts array: the session's
    first event_ts is the window id (new session when gap > ``gap``)."""
    if ts_sorted.size == 0:
        return ts_sorted.copy()
    new_session = np.concatenate([[True], np.diff(ts_sorted) > gap])
    # filler must be -inf, not 0: with negative timestamps a 0 filler would
    # beat a negative session start in maximum.accumulate
    starts = np.where(new_session, ts_sorted, np.iinfo(np.int64).min)
    return np.maximum.accumulate(starts)


def golden_wm_table(
    table: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG
) -> dict[tuple[str, int], tuple[int, float]]:
    """Phase 1 oracle: per (source, window) -> (wm_token, coverage_pct).

    Histograms accumulate over every token position of every row assigned to
    the window (A1); detection per :func:`detect_wm_token`.  In ``sticky``
    mode the first window (ascending window_id) with a detection fixes the
    source's wm_token for every later window (watermark_detector.py:562-568,188).
    """
    src = table["source"].to_pylist()
    ts = np.asarray(table["event_ts"].to_pylist(), dtype=np.int64)
    toks = table["tokens"].to_pylist()

    hists: dict[tuple[str, int], np.ndarray] = {}
    if cfg.window_kind == "session":
        order = {}
        for s in set(src):
            idx = [i for i, x in enumerate(src) if x == s]
            idx.sort(key=lambda i: (ts[i], table["doc_id"][i].as_py()))
            wins = assign_session_windows(ts[idx], cfg.session_gap)
            for i, w in zip(idx, wins):
                order[i] = int(w)
        row_windows = [[order[i]] for i in range(len(src))]
    else:
        row_windows = [contributing_windows(int(t), cfg) for t in ts]

    for i, wins in enumerate(row_windows):
        g = gray_of(np.asarray(toks[i], dtype=np.int64), cfg)
        h = hist_of(g, cfg)
        for w in wins:
            key = (src[i], int(w))
            if key in hists:
                hists[key] += h
            else:
                hists[key] = h.copy()

    wm: dict[tuple[str, int], tuple[int, float]] = {}
    for key, h in hists.items():
        wm[key] = detect_wm_token(h, cfg)

    if cfg.detection_mode == "sticky":
        by_src: dict[str, list[int]] = {}
        for (s, w) in wm:
            by_src.setdefault(s, []).append(w)
        for s, ws in by_src.items():
            fixed = None
            for w in sorted(ws):
                if fixed is None and wm[(s, w)][0] >= 0:
                    fixed = wm[(s, w)]
                if fixed is not None:
                    wm[(s, w)] = fixed
    return wm


def golden_row_window(table: pa.Table, cfg: EngineConfig) -> np.ndarray:
    """Governing window id per row (session-aware)."""
    ts = np.asarray(table["event_ts"].to_pylist(), dtype=np.int64)
    if cfg.window_kind != "session":
        return governing_window(ts, cfg)
    src = table["source"].to_pylist()
    out = np.zeros(len(src), dtype=np.int64)
    for s in set(src):
        idx = [i for i, x in enumerate(src) if x == s]
        idx.sort(key=lambda i: (ts[i], table["doc_id"][i].as_py()))
        wins = assign_session_windows(ts[idx], cfg.session_gap)
        for i, w in zip(idx, wins):
            out[i] = w
    return out


def golden_pipeline(
    table: pa.Table,
    cfg: EngineConfig = DEFAULT_CONFIG,
    motif_rows: set[str] | None = None,
    motif_ranges: dict[str, np.ndarray] | None = None,
) -> pa.Table:
    """Full-stream oracle: detection + per-row rewrite.

    ``motif_rows``: doc_ids whose max_span is lifted to n_tok (the QR
    override, watermark_remover.py:117-141).  ``motif_ranges``: doc_id →
    padded [start, stop) ranges force-flagged per J1 (the QR mask union).

    Returns the output table: doc_id, tokens (rewritten), n_tok, source,
    event_ts, wm_token, coverage_pct, radius, n_passes.
    """
    fixed = cfg.fixed_wm_token >= 0
    wm = {} if fixed else golden_wm_table(table, cfg)
    # per-row window lookup is unused when the fixed token skips detection
    # (session assignment is the oracle's priciest step)
    row_win = (
        np.zeros(table.num_rows, dtype=np.int64) if fixed else golden_row_window(table, cfg)
    )
    src = table["source"].to_pylist()
    ids = table["doc_id"].to_pylist()
    toks = table["tokens"].to_pylist()
    motif_rows = motif_rows or set()
    motif_ranges = motif_ranges or {}

    out_tokens, out_wm, out_cov, out_rad, out_np = [], [], [], [], []
    for i in range(len(ids)):
        t = np.asarray(toks[i], dtype=np.int32)
        if cfg.fixed_wm_token >= 0:  # user override skips detection (M15)
            wm_tok = cfg.fixed_wm_token
        else:
            wm_tok, _cov = wm.get((src[i], int(row_win[i])), (-1, 0.0))
        max_span = t.size if ids[i] in motif_rows else None
        r = process_row(
            t, wm_tok, cfg, max_span=max_span, forced_ranges=motif_ranges.get(ids[i])
        )
        out_tokens.append(r.tokens)
        out_wm.append(r.wm_token)
        out_cov.append(r.coverage_pct)
        out_rad.append(r.radius)
        out_np.append(r.n_passes)

    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "tokens": pa.array([t.tolist() for t in out_tokens], pa.list_(pa.int32())),
            "n_tok": table["n_tok"],
            "source": table["source"],
            "event_ts": table["event_ts"],
            "wm_token": pa.array(out_wm, pa.int32()),
            "coverage_pct": pa.array(out_cov, pa.float64()),
            "radius": pa.array(out_rad, pa.int32()),
            "n_passes": pa.array(out_np, pa.int32()),
        }
    )
