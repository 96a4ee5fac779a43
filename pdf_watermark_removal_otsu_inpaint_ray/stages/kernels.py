"""Flat vectorized token kernels — the hot path of every stage.

All kernels operate on the *flattened* values of an Arrow ``list<int32>``
column for an entire batch at once, with per-position segment bookkeeping
(``row_start``/``row_end``/``seg``) so that no window, run, or fill ever
crosses a row boundary.  This is the zero-copy, no-Python-loop equivalent
of the per-row oracle in :mod:`..golden`; ``tests/test_kernels.py`` asserts
byte-equality between the two on randomized inputs.

Morphology uses clamped-window semantics identical to
``golden.dilate``/``golden.erode`` (1-D analog of the reference's elliptical
kernels, watermark_detector.py:470-479).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..config import EngineConfig

_BIG = np.iinfo(np.int64).max // 4


# allocator tuning (mmap-threshold pinning) runs in the package __init__ so
# every worker that touches any module of this library gets it


class FlatBatch:
    """Flattened view of a list<int32> column for one batch.

    Per-position bookkeeping (``seg`` / ``row_start`` / ``row_end``) is
    LAZY — stages that never index by row (e.g. histogram partials) pay only
    for values + offsets, which matters: these arrays are Ntot-sized and
    their allocation traffic dominated the histogram stage before."""

    __slots__ = ("values", "offsets", "_lens", "_seg", "_row_start", "_row_end", "_bidx_cache")

    def __init__(self, values: np.ndarray, offsets: np.ndarray):
        self.values = values      # int32[Ntot] flattened tokens
        self.offsets = offsets    # int64[nrows+1], offsets[0] == 0
        self._lens = None
        self._seg = None
        self._row_start = None
        self._row_end = None
        self._bidx_cache: dict[int, np.ndarray] = {}

    @property
    def n_rows(self) -> int:
        return self.offsets.size - 1

    @property
    def lens(self) -> np.ndarray:
        if self._lens is None:
            self._lens = np.diff(self.offsets)
        return self._lens

    @property
    def seg(self) -> np.ndarray:
        if self._seg is None:
            self._seg = np.repeat(np.arange(self.n_rows, dtype=np.int64), self.lens)
        return self._seg

    @property
    def row_start(self) -> np.ndarray:
        if self._row_start is None:
            self._row_start = np.repeat(self.offsets[:-1], self.lens)
        return self._row_start

    @property
    def row_end(self) -> np.ndarray:
        if self._row_end is None:
            self._row_end = np.repeat(self.offsets[1:], self.lens)
        return self._row_end


def flatten_list_column(col: pa.ChunkedArray | pa.ListArray) -> FlatBatch:
    """Zero-copy flatten of an Arrow list<int32> column (no nulls)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.asarray(col.offsets, dtype=np.int64)
    vals = np.asarray(col.values)
    if off[0] != 0 or off[-1] != vals.size:
        vals = vals[off[0] : off[-1]]
        off = off - off[0]
    return FlatBatch(vals, off)


def per_position(row_values: np.ndarray, fb: FlatBatch) -> np.ndarray:
    """Broadcast a per-row array to per-position."""
    return np.repeat(row_values, fb.lens)


# ---------------------------------------------------------------------------
# segment-aware morphology
# ---------------------------------------------------------------------------


def _boundary_idx(fb: FlatBatch, r: int) -> np.ndarray:
    """Flat positions within r of a row edge (the only places where a global
    shifted OR/AND can leak across rows).  Cached per (batch, r)."""
    cached = fb._bidx_cache.get(r)
    if cached is not None:
        return cached
    off = fb.offsets
    parts = []
    for d in range(r):
        lo = off[:-1] + d
        parts.append(lo[lo < off[1:]])
        hi = off[1:] - 1 - d
        parts.append(hi[hi >= off[:-1] + d + 1])  # skip ones already in lo set
    bidx = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
    fb._bidx_cache[r] = bidx
    return bidx


def _fixup_window_sum(flag: np.ndarray, r: int, fb: FlatBatch, bidx: np.ndarray):
    """Exact clamped-window sums at boundary positions: (sum, width).

    add.reduceat over the (few) boundary windows — no O(N) cumsum."""
    lo = np.maximum(bidx - r, fb.row_start[bidx])
    hi = np.minimum(bidx + r + 1, fb.row_end[bidx])
    padded = np.concatenate([flag.view(np.int8), np.zeros(1, np.int8)])
    inter = np.empty(2 * bidx.size, dtype=np.int64)
    inter[0::2] = lo
    inter[1::2] = hi
    sums = np.add.reduceat(padded, inter)[0::2]
    return sums, hi - lo


def flat_dilate(flag: np.ndarray, r: int, fb: FlatBatch) -> np.ndarray:
    """Shifted-OR dilation with exact row-boundary fixup (clamped windows)."""
    if r <= 0 or flag.size == 0:
        return flag.copy()
    out = flag.copy()
    for d in range(1, r + 1):
        out[d:] |= flag[:-d]
        out[:-d] |= flag[d:]
    bidx = _boundary_idx(fb, r)
    if bidx.size:
        s, _w = _fixup_window_sum(flag, r, fb, bidx)
        out[bidx] = s > 0
    return out


def flat_erode(flag: np.ndarray, r: int, fb: FlatBatch) -> np.ndarray:
    """Shifted-AND erosion with exact row-boundary fixup (clamped windows)."""
    if r <= 0 or flag.size == 0:
        return flag.copy()
    out = flag.copy()
    for d in range(1, r + 1):
        out[d:] &= flag[:-d]
        out[:-d] &= flag[d:]
    bidx = _boundary_idx(fb, r)
    if bidx.size:
        s, w = _fixup_window_sum(flag, r, fb, bidx)
        out[bidx] = s == w
    return out


def filter_runs(
    flag: np.ndarray, fb: FlatBatch, min_len: int, max_len_pos: np.ndarray | int
) -> np.ndarray:
    """Keep only True-runs with ``min_len <= len <= max_len`` (vectorized RLE).

    ``max_len_pos`` may be per-position (the motif max-span override,
    watermark_remover.py:117-141) or a scalar.
    """
    n = flag.size
    if n == 0:
        return flag
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (flag[1:] != flag[:-1]) | (fb.seg[1:] != fb.seg[:-1])
    run_id = np.cumsum(change) - 1
    run_len = np.bincount(run_id)
    lens = run_len[run_id]
    return flag & (lens >= min_len) & (lens <= max_len_pos)


# ---------------------------------------------------------------------------
# detection chain (flat mirror of golden.detect_mask)
# ---------------------------------------------------------------------------


def _protect_and_refine(
    flag: np.ndarray,
    gray: np.ndarray,
    fb: FlatBatch,
    cfg: EngineConfig,
    apply_text: np.ndarray | bool,
    max_span_pos: np.ndarray | int | None,
) -> np.ndarray:
    """Shared tail of both detectors: Protect First, Refine Second, span
    filter (watermark_detector.py:447-479, 775-789)."""
    flag &= ~(gray > cfg.background_threshold)
    do_text = apply_text.any() if isinstance(apply_text, np.ndarray) else apply_text
    if cfg.protect_text and do_text:
        core = gray <= cfg.text_threshold
        prot = flat_dilate(core, cfg.text_expand, fb)
        prot = filter_runs(prot, fb, cfg.text_min_run, _BIG)
        if isinstance(apply_text, np.ndarray):
            prot &= apply_text
        flag &= ~prot
    r = cfg.refine_radius
    flag = flat_dilate(flat_erode(flag, r, fb), r, fb)   # OPEN x1
    flag = flat_erode(flat_dilate(flag, r, fb), r, fb)   # CLOSE x2
    flag = flat_erode(flat_dilate(flag, r, fb), r, fb)
    hi = cfg.max_span if max_span_pos is None else max_span_pos
    return filter_runs(flag, fb, cfg.min_span, hi)


def detect_mask_flat(
    values: np.ndarray,
    wm_pos: np.ndarray,
    fb: FlatBatch,
    cfg: EngineConfig,
    max_span_pos: np.ndarray | int | None = None,
) -> np.ndarray:
    """Color detect -> protect -> refine -> span filter, whole batch at once.

    ``wm_pos``: per-position watermark token (int64; < 0 = no watermark for
    that row -> row emits no flags).
    """
    gray = values % np.int32(cfg.gray_mod)
    flag = np.abs(gray - wm_pos.astype(np.int32)) < cfg.tolerance
    flag &= wm_pos >= 0
    apply_text = (wm_pos >= 0) & ~(
        (wm_pos >= cfg.skip_text_protect_lo) & (wm_pos <= cfg.skip_text_protect_hi)
    )
    return _protect_and_refine(flag, gray, fb, cfg, apply_text, max_span_pos)


def detect_mask_auto_flat(
    values: np.ndarray,
    fb: FlatBatch,
    cfg: EngineConfig,
    max_span_pos: np.ndarray | int | None = None,
) -> np.ndarray:
    """Automatic-mode detection (M3 ∪ M4, watermark_detector.py:483-545),
    flat mirror of golden.detect_mask_auto."""
    gray = values % np.int32(cfg.gray_mod)
    r = cfg.auto_block // 2
    cs = np.concatenate([[0], np.cumsum(gray, dtype=np.int64)])
    i = np.arange(values.size, dtype=np.int64)
    lo = np.maximum(i - r, fb.row_start)
    hi = np.minimum(i + r + 1, fb.row_end)
    m3 = (gray.astype(np.int64) + cfg.auto_c) * (hi - lo) > (cs[hi] - cs[lo])
    sat = (values.astype(np.int64) // cfg.gray_mod) % cfg.gray_mod
    sat_sum = np.bincount(fb.seg, weights=sat, minlength=fb.n_rows).astype(np.int64)
    lens = np.maximum(fb.lens, 1)
    thr_row = np.maximum(cfg.sat_floor, (6 * sat_sum) // (10 * lens))
    m4 = sat < per_position(thr_row, fb)
    flag = m3 | m4
    return _protect_and_refine(flag, gray, fb, cfg, cfg.protect_text, max_span_pos)


def inpaint_flat(values: np.ndarray, flag: np.ndarray, fb: FlatBatch) -> np.ndarray:
    """Nearest-unflagged-neighbor fill, tie toward the left (golden.inpaint_row).

    Run-based: only flagged runs are touched — for each maximal True-run
    [s, e) the left source is s-1 (if within the row) and the right source is
    e; a position i in the run takes left iff (i - (s-1)) <= (e - i)."""
    n = values.size
    if n == 0:
        return values
    fidx = np.nonzero(flag)[0]
    if fidx.size == 0:
        return values
    # run starts among flagged positions
    new_run = np.empty(fidx.size, dtype=bool)
    new_run[0] = True
    np.not_equal(fidx[1:], fidx[:-1] + 1, out=new_run[1:])
    # a flag run also breaks at a row boundary
    new_run |= fidx == fb.row_start[fidx]
    run_id = np.cumsum(new_run) - 1
    run_starts = fidx[new_run]                       # s per run
    run_ends_idx = np.nonzero(new_run)[0]
    run_lens = np.diff(np.append(run_ends_idx, fidx.size))
    run_ends = run_starts + run_lens                 # e per run (half-open)

    left_ok = run_starts > fb.row_start[run_starts]
    right_ok = run_ends < fb.row_end[run_starts]
    left_val = values[np.maximum(run_starts - 1, 0)]
    right_val = values[np.minimum(run_ends, n - 1)]

    s_pos = run_starts[run_id]
    e_pos = run_ends[run_id]
    dl = np.where(left_ok[run_id], fidx - (s_pos - 1), _BIG)
    dr = np.where(right_ok[run_id], e_pos - fidx, _BIG)
    use_left = left_ok[run_id] & (dl <= dr)
    fill = np.where(use_left, left_val[run_id], right_val[run_id])
    # neither side in-row (fully flagged row): keep original
    keep = ~(left_ok | right_ok)[run_id]
    out = values.copy()
    out[fidx] = np.where(keep, values[fidx], fill)
    return out


@dataclass
class BatchResult:
    values: np.ndarray        # rewritten flat tokens
    wm_row: np.ndarray        # int32 per row (-1 = none)
    coverage_pct: np.ndarray  # float64 per row, from last effective pass
    radius: np.ndarray        # int32 per row
    n_passes: np.ndarray      # int32 per row


def process_batch_flat(
    fb: FlatBatch,
    wm_row: np.ndarray,
    cfg: EngineConfig,
    max_span_row: np.ndarray | None = None,
    forced_pos: np.ndarray | None = None,
) -> BatchResult:
    """Multi-pass removal for a whole batch (flat mirror of golden.process_row).

    ``wm_row``: int per row; ``max_span_row``: optional per-row max span
    (motif override); ``forced_pos``: optional per-position bool OR-ed into
    the mask after the detect chain (J1 span-event combine, exempt from
    protection — watermark_detector.py:680-694).
    """
    nrows = fb.n_rows
    values = fb.values
    wm_pos = per_position(wm_row.astype(np.int64), fb)
    max_span_pos = None
    if max_span_row is not None:
        max_span_pos = per_position(max_span_row.astype(np.int64), fb)
    cov = np.zeros(nrows, dtype=np.float64)
    rad = np.zeros(nrows, dtype=np.int32)
    used = np.zeros(nrows, dtype=np.int32)
    lens = np.maximum(fb.lens, 1)
    auto = cfg.detection_method == "auto"
    custom = None
    if not auto and cfg.detection_method != "color":
        # registry dispatch (§2.10): any registered detector name is usable
        # end-to-end — e.g. "learned" (the T3 LUT detector, the yolo-path
        # analog of the reference's detection_method string dispatch,
        # watermark_detector.py:72-126).  Builtins keep their inline fast
        # paths; import is function-local to avoid a registry<->kernels cycle
        from ..registry import get_detector

        custom = get_detector(cfg.detection_method)
    for p in range(cfg.passes):
        if auto:
            flag = detect_mask_auto_flat(values, fb, cfg, max_span_pos)
        elif custom is not None:
            flag = custom(values, wm_pos, fb, cfg, max_span_pos)
        else:
            flag = detect_mask_flat(values, wm_pos, fb, cfg, max_span_pos)
        if forced_pos is not None:
            flag |= forced_pos
        if p > 0:
            flag = flat_dilate(flag, 1, fb)  # remover:249-251
        if not flag.any():
            break
        row_counts = np.bincount(fb.seg[flag], minlength=nrows)
        row_any = row_counts > 0
        c = row_counts / lens
        cov = np.where(row_any, c * 100.0, cov)
        rad = np.where(
            row_any,
            np.maximum(2, (cfg.inpaint_radius + c * 10 * cfg.strength).astype(np.int64)).astype(np.int32),
            rad,
        )
        used = np.where(row_any, p + 1, used)
        if cfg.strength >= 0.5:
            # inpaint_flat returns a copy with exactly the flagged positions
            # filled (unflagged preserved) — re-selecting via np.where would
            # just burn an extra full-size allocation per pass; the int32
            # view is kept for emitters (copy=False: free when already i32).
            # Below the strength floor golden skips the rewrite entirely, so
            # the fill is not even computed
            values = inpaint_flat(values, flag, fb).astype(np.int32, copy=False)
    return BatchResult(values, wm_row.astype(np.int32), cov, rad, used)


# ---------------------------------------------------------------------------
# histogram partials (A1: per-batch pre-aggregation before any shuffle)
# ---------------------------------------------------------------------------


def batch_histograms(
    fb: FlatBatch,
    key_row: np.ndarray,
    n_keys: int,
    cfg: EngineConfig,
    mask_pos: np.ndarray | None = None,
) -> np.ndarray:
    """Sum 256-bin gray histograms per key over the batch.

    ``key_row``: int key index per row (< 0 rows are skipped).
    Returns int64[n_keys, gray_mod].  One ``np.add.at`` over the flattened
    batch — this is the partial/combiner side of A1 (cv2.calcHist analog).
    """
    gm = cfg.gray_mod
    gray = (fb.values % np.int32(gm)).astype(np.int64)
    key_pos = per_position(key_row.astype(np.int64), fb)
    valid = key_pos >= 0
    if mask_pos is not None:
        valid &= mask_pos
    if not valid.all():
        key_pos, gray = key_pos[valid], gray[valid]
    # one bincount over the combined (key, gray) index — much faster than add.at
    combined = key_pos * gm + gray
    return np.bincount(combined, minlength=n_keys * gm).reshape(n_keys, gm)
