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


class MotifStage:
    """Stateless map_batches body: sequence batch → span-event rows.

    ``motifs``: list of (category, pattern tuple).  Emits the *first* match
    per (row, category) — mirroring the reference emitting one QRCodeInfo per
    detected code with its category (qr_detector.py:226-268).
    """

    def __init__(self, motifs: list[tuple[str, tuple[int, ...]]], cfg: EngineConfig):
        self.motifs = [(c, np.asarray(p, dtype=np.int32)) for c, p in motifs]
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        fb = flatten_list_column(batch["tokens"])
        ids = np.asarray(batch["doc_id"])
        srcs = np.asarray(batch["source"])
        out_id, out_src, out_start, out_len, out_cat = [], [], [], [], []
        for cat, pat in self.motifs:
            starts = find_pattern_flat(fb, pat)
            if starts.size == 0:
                continue
            rows = fb.seg[starts]
            # first match per row: starts are ascending, keep first per row
            first = np.concatenate([[True], rows[1:] != rows[:-1]])
            starts, rows = starts[first], rows[first]
            out_id.extend(ids[rows])
            out_src.extend(srcs[rows])
            out_start.extend((starts - fb.offsets[rows]).tolist())
            out_len.extend([int(pat.size)] * rows.size)
            out_cat.extend([cat] * rows.size)
        return pa.table(
            {
                "doc_id": pa.array([str(x) for x in out_id], pa.string()),
                "source": pa.array([str(x) for x in out_src], pa.string()),
                "span_start": pa.array(out_start, pa.int32()),
                "span_len": pa.array(out_len, pa.int32()),
                "category": pa.array(out_cat, pa.string()),
            }
        )


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
