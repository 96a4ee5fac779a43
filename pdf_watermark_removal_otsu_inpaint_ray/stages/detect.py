"""Phase-1 detection: windowed histogram aggregation → watermark table.

Scale shape (SURVEY.md §4.2, A1): histograms are **pre-aggregated inside each
map_batches task** (one 256-bin int64 vector per (source, window) per batch —
one ``np.add.at`` over the flattened batch), so the shuffle that follows moves
only tiny partial rows, never token data.  The merged per-key histograms and
the derived watermark table are O(#sources × #live-windows) — small by
construction — and are broadcast back to phase 2 via a single ``ray.put``.

Reference semantics: ``detect_watermark_color`` (watermark_detector.py:147-191)
computed per event-time window per source; sticky mode mirrors the reference's
first-detection-wins instance state (watermark_detector.py:562-568,188).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from ..golden import detect_wm_token
from .kernels import batch_histograms, flatten_list_column

WmKey = tuple[str, int]


def assign_windows_batch(source: np.ndarray, ts: np.ndarray, cfg: EngineConfig) -> np.ndarray:
    """Governing window id per row (tumbling/sliding/global — batch-local).

    Session windows need per-source global ordering and are handled by the
    streaming engine (state.keyed_state) / golden oracle instead.
    """
    if cfg.window_kind == "tumbling":
        return ts // cfg.window_size
    if cfg.window_kind == "sliding":
        return ts // cfg.window_slide
    if cfg.window_kind == "global":
        return np.zeros_like(ts)
    raise ValueError(f"window kind {cfg.window_kind} is not batch-assignable")


class HistogramPartials:
    """Stateless map_batches body: batch → per-(source, window) partial hists.

    Output rows: (source, window_id, hist:list<int64>[256], n_pos:int64).
    For sliding windows each row contributes to every window covering its
    event_ts (golden.contributing_windows), implemented as a small loop over
    the ≤ size/slide window shifts — still one np.add.at per shift.
    """

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        fb = flatten_list_column(batch["tokens"])
        src = np.asarray(batch["source"])
        ts = np.asarray(batch["event_ts"], dtype=np.int64)

        out_src: list[str] = []
        out_win: list[int] = []
        hists: list[np.ndarray] = []

        if cfg.window_kind == "sliding":
            n_shifts = -(-cfg.window_size // cfg.window_slide)  # ceil
            shift_windows = [ts // cfg.window_slide - j for j in range(n_shifts)]
            valid_masks = [
                (w >= 0) & (ts - w * cfg.window_slide < cfg.window_size)
                for j, w in enumerate(shift_windows)
            ]
        else:
            shift_windows = [assign_windows_batch(src, ts, cfg)]
            valid_masks = [np.ones(ts.size, dtype=bool)]

        for win, valid in zip(shift_windows, valid_masks):
            # vectorized factorization of (source, window) pairs for this shift
            v = np.nonzero(valid)[0]
            if v.size == 0:
                continue
            s_u, s_inv = np.unique(src[v], return_inverse=True)
            w_v = win[v]
            w_min, w_span = int(w_v.min()), int(w_v.max() - w_v.min()) + 1
            combo = s_inv.astype(np.int64) * w_span + (w_v - w_min)
            c_u, c_inv = np.unique(combo, return_inverse=True)
            key_row = np.full(ts.size, -1, dtype=np.int64)
            key_row[v] = c_inv
            H = batch_histograms(fb, key_row, c_u.size, cfg)
            for ki, c in enumerate(c_u):
                out_src.append(str(s_u[c // w_span]))
                out_win.append(int(c % w_span + w_min))
                hists.append(H[ki])

        flat = np.concatenate(hists) if hists else np.zeros(0, dtype=np.int64)
        offs = np.arange(0, (len(hists) + 1) * self.cfg.gray_mod, self.cfg.gray_mod, dtype=np.int32)
        return pa.table(
            {
                "source": pa.array(out_src, pa.string()),
                "window_id": pa.array(out_win, pa.int64()),
                "hist": pa.ListArray.from_arrays(pa.array(offs, pa.int32()), pa.array(flat, pa.int64())),
            }
        )


def _merge_group(group: pa.Table) -> pa.Table:
    fb = flatten_list_column(group["hist"])
    n = fb.n_rows
    gm = fb.lens[0] if n else 0
    merged = fb.values.reshape(n, gm).sum(axis=0)
    return pa.table(
        {
            "source": group["source"].slice(0, 1),
            "window_id": group["window_id"].slice(0, 1),
            "hist": pa.array([merged.tolist()], pa.list_(pa.int64())),
        }
    )


def compute_wm_table(ds, cfg: EngineConfig) -> dict[WmKey, tuple[int, float]]:
    """Run phase 1 on a sequence Dataset → {(source, window): (wm, cov%)}.

    ``ds`` must carry (tokens, source, event_ts).  The groupby here shuffles
    only the per-batch partials (tiny); the final reduce lands on the driver
    because the key space is bounded (sources × live windows).
    """
    partials = ds.map_batches(
        HistogramPartials(cfg), batch_format="pyarrow", batch_size=1024
    )
    merged = partials.groupby(["source", "window_id"]).map_groups(
        _merge_group, batch_format="pyarrow"
    )
    wm: dict[WmKey, tuple[int, float]] = {}
    for batch in merged.iter_batches(batch_format="pyarrow"):
        for i in range(batch.num_rows):
            key = (batch["source"][i].as_py(), batch["window_id"][i].as_py())
            hist = np.asarray(batch["hist"][i].as_py(), dtype=np.int64)
            wm[key] = detect_wm_token(hist, cfg)
    if cfg.detection_mode == "sticky":
        apply_sticky(wm)
    return wm


def apply_sticky(wm: dict[WmKey, tuple[int, float]]) -> None:
    """First detection (ascending window) wins per source, in place."""
    by_src: dict[str, list[int]] = {}
    for s, w in wm:
        by_src.setdefault(s, []).append(w)
    for s, ws in by_src.items():
        fixed = None
        for w in sorted(ws):
            if fixed is None and wm[(s, w)][0] >= 0:
                fixed = wm[(s, w)]
            if fixed is not None:
                wm[(s, w)] = fixed


def wm_table_to_arrow(wm: dict[WmKey, tuple[int, float]]) -> pa.Table:
    items = sorted(wm.items())
    return pa.table(
        {
            "source": pa.array([k[0] for k, _ in items], pa.string()),
            "window_id": pa.array([k[1] for k, _ in items], pa.int64()),
            "wm_token": pa.array([v[0] for _, v in items], pa.int32()),
            "coverage_pct": pa.array([v[1] for _, v in items], pa.float64()),
        }
    )
