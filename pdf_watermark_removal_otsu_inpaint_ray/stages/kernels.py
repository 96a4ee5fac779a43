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


@dataclass
class FlatBatch:
    """Flattened view of a list<int32> column for one batch."""

    values: np.ndarray     # int32[Ntot] flattened tokens (rebased copy-free when possible)
    offsets: np.ndarray    # int64[nrows+1], offsets[0] == 0
    seg: np.ndarray        # int64[Ntot] row index per position
    row_start: np.ndarray  # int64[Ntot]
    row_end: np.ndarray    # int64[Ntot]

    @property
    def n_rows(self) -> int:
        return self.offsets.size - 1

    @property
    def lens(self) -> np.ndarray:
        return np.diff(self.offsets)


def flatten_list_column(col: pa.ChunkedArray | pa.ListArray) -> FlatBatch:
    """Zero-copy flatten of an Arrow list<int32> column (no nulls)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.asarray(col.offsets, dtype=np.int64)
    vals = np.asarray(col.values)
    if off[0] != 0 or off[-1] != vals.size:
        vals = vals[off[0] : off[-1]]
        off = off - off[0]
    lens = np.diff(off)
    seg = np.repeat(np.arange(off.size - 1, dtype=np.int64), lens)
    row_start = np.repeat(off[:-1], lens)
    row_end = np.repeat(off[1:], lens)
    return FlatBatch(vals, off, seg, row_start, row_end)


def per_position(row_values: np.ndarray, fb: FlatBatch) -> np.ndarray:
    """Broadcast a per-row array to per-position."""
    return np.repeat(row_values, fb.lens)


# ---------------------------------------------------------------------------
# segment-aware morphology
# ---------------------------------------------------------------------------


def flat_dilate(flag: np.ndarray, r: int, fb: FlatBatch) -> np.ndarray:
    if r <= 0 or flag.size == 0:
        return flag.copy()
    cs = np.concatenate([[0], np.cumsum(flag, dtype=np.int64)])
    i = np.arange(flag.size, dtype=np.int64)
    lo = np.maximum(i - r, fb.row_start)
    hi = np.minimum(i + r + 1, fb.row_end)
    return (cs[hi] - cs[lo]) > 0


def flat_erode(flag: np.ndarray, r: int, fb: FlatBatch) -> np.ndarray:
    if r <= 0 or flag.size == 0:
        return flag.copy()
    cs = np.concatenate([[0], np.cumsum(flag, dtype=np.int64)])
    i = np.arange(flag.size, dtype=np.int64)
    lo = np.maximum(i - r, fb.row_start)
    hi = np.minimum(i + r + 1, fb.row_end)
    return (cs[hi] - cs[lo]) == (hi - lo)


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


def detect_mask_flat(
    values: np.ndarray,
    wm_pos: np.ndarray,
    fb: FlatBatch,
    cfg: EngineConfig,
    max_span_pos: np.ndarray | int | None = None,
) -> np.ndarray:
    """detect -> protect -> refine -> span filter, whole batch at once.

    ``wm_pos``: per-position watermark token (int64; < 0 = no watermark for
    that row -> row emits no flags).
    """
    gray = values.astype(np.int64) % cfg.gray_mod
    flag = np.abs(gray - wm_pos) < cfg.tolerance
    flag &= wm_pos >= 0
    flag &= ~(gray > cfg.background_threshold)
    if cfg.protect_text:
        apply_text = (wm_pos >= 0) & ~(
            (wm_pos >= cfg.skip_text_protect_lo) & (wm_pos <= cfg.skip_text_protect_hi)
        )
        if apply_text.any():
            core = gray <= cfg.text_threshold
            prot = flat_dilate(core, cfg.text_expand, fb)
            prot = filter_runs(prot, fb, cfg.text_min_run, _BIG)
            flag &= ~(prot & apply_text)
    r = cfg.refine_radius
    flag = flat_dilate(flat_erode(flag, r, fb), r, fb)   # OPEN x1
    flag = flat_erode(flat_dilate(flag, r, fb), r, fb)   # CLOSE x2
    flag = flat_erode(flat_dilate(flag, r, fb), r, fb)
    hi = cfg.max_span if max_span_pos is None else max_span_pos
    return filter_runs(flag, fb, cfg.min_span, hi)


def inpaint_flat(values: np.ndarray, flag: np.ndarray, fb: FlatBatch) -> np.ndarray:
    """Nearest-unflagged-neighbor fill, tie toward the left (golden.inpaint_row)."""
    n = values.size
    if n == 0 or not flag.any():
        return values
    idx = np.arange(n, dtype=np.int64)
    left = np.maximum.accumulate(np.where(~flag, idx, -1))
    left_valid = left >= fb.row_start
    right = np.minimum.accumulate(np.where(~flag, idx, 2 * n)[::-1])[::-1]
    right_valid = right < fb.row_end
    dl = np.where(left_valid, idx - left, _BIG)
    dr = np.where(right_valid, right - idx, _BIG)
    use_left = left_valid & (dl <= dr)
    src = np.where(use_left, left, np.where(right_valid, right, idx))
    return np.where(flag, values[src], values).astype(values.dtype)


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
) -> BatchResult:
    """Multi-pass removal for a whole batch (flat mirror of golden.process_row).

    ``wm_row``: int per row; ``max_span_row``: optional per-row max span
    (motif override).
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
    for p in range(cfg.passes):
        flag = detect_mask_flat(values, wm_pos, fb, cfg, max_span_pos)
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
        inpainted = inpaint_flat(values, flag, fb)
        if cfg.strength >= 0.5:
            values = np.where(flag, inpainted, values).astype(np.int32)
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
    gray = fb.values.astype(np.int64) % cfg.gray_mod
    key_pos = per_position(key_row.astype(np.int64), fb)
    valid = key_pos >= 0
    if mask_pos is not None:
        valid &= mask_pos
    out = np.zeros((n_keys, cfg.gray_mod), dtype=np.int64)
    np.add.at(out, (key_pos[valid], gray[valid]), 1)
    return out
