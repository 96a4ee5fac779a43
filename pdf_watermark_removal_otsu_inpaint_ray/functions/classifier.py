"""Per-source stream profiling → document-type classification → parameter
auto-tuning (A5/A6; reference document_classifier.py:33-229).

Token-space analogs of the reference's four page metrics, each expressed as
an **associative partial aggregate** (merged per batch inside map_batches,
combined on the driver — the same partial+final shape as A1, so no shuffle
of token data):

* color discreteness  — unique quantized tokens (tok // 8) per source
  (reference samples ~1000 px then counts unique quantized colors; we count
  exactly over all positions — deterministic, and the presence bitset merges
  associatively).  Score rescaled to the token vocab: ``max(0, 100 - u * 2)``.
* text concentration  — std-dev of the peak 5-gray-wide bin of content
  grays (< 100), via per-bin (count, sum, sumsq) partials
  (document_classifier.py:100-125).
* edge sharpness      — variance of the 1-D Laplacian ``x[i-1]-2x[i]+x[i+1]``
  over row interiors, ``min(100, var / 10)`` (:127-139).
* noise level         — mean |x - median3(x)| residual, ``max(0, 100 -
  ratio*1000)`` (:141-152; fastNlMeansDenoising → 1-D median-3).

Decision weights 0.3/0.3/0.2/0.2 and thresholds mirror ``_decide_type``
(:154-177); per-type parameters mirror ``get_optimal_parameters``
(:180-229).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from ..stages.kernels import FlatBatch, flatten_list_column, per_position

QUANT = 8
QUANT_BINS = 4096          # tok // 8 clipped here; presence bitset per source
CONTENT_LIM = 100          # gray < 100 is "dark text" for profiling
HIST_BINS = 20             # 20 bins over [0, 100)


@dataclass
class SourceStats:
    """Associative per-source partial (merge with +)."""

    quant_presence: np.ndarray   # bool[QUANT_BINS]
    bin_count: np.ndarray        # int64[HIST_BINS]
    bin_sum: np.ndarray          # float64[HIST_BINS]
    bin_sumsq: np.ndarray        # float64[HIST_BINS]
    lap_n: int = 0
    lap_sum: float = 0.0
    lap_sumsq: float = 0.0
    res_n: int = 0
    res_sum: float = 0.0

    @classmethod
    def zero(cls) -> "SourceStats":
        return cls(
            np.zeros(QUANT_BINS, dtype=bool),
            np.zeros(HIST_BINS, dtype=np.int64),
            np.zeros(HIST_BINS, dtype=np.float64),
            np.zeros(HIST_BINS, dtype=np.float64),
        )

    def merge(self, o: "SourceStats") -> "SourceStats":
        self.quant_presence |= o.quant_presence
        self.bin_count += o.bin_count
        self.bin_sum += o.bin_sum
        self.bin_sumsq += o.bin_sumsq
        self.lap_n += o.lap_n
        self.lap_sum += o.lap_sum
        self.lap_sumsq += o.lap_sumsq
        self.res_n += o.res_n
        self.res_sum += o.res_sum
        return self


def _median3_flat(values: np.ndarray, fb: FlatBatch) -> np.ndarray:
    """Row-clamped 1-D median-of-3 (edges: median of the clamped window =
    middle value of the two -> lower of the two, deterministic)."""
    n = values.size
    if n == 0:  # all rows empty in this batch — nothing to smooth
        return values.copy()
    left = np.empty(n, dtype=values.dtype)
    right = np.empty(n, dtype=values.dtype)
    left[1:] = values[:-1]
    left[0] = values[0]
    right[:-1] = values[1:]
    right[-1] = values[-1]
    at_start = np.arange(n) == fb.row_start
    at_end = np.arange(n) == fb.row_end - 1
    left[at_start] = values[at_start]
    right[at_end] = values[at_end]
    return np.maximum(np.minimum(left, values), np.minimum(np.maximum(left, values), right))


def batch_source_stats(batch: pa.Table, cfg: EngineConfig) -> dict[str, SourceStats]:
    """One batch → per-source partials (vectorized; one pass per metric)."""
    fb = flatten_list_column(batch["tokens"])
    src = np.asarray(batch["source"])
    s_u, s_inv = np.unique(src, return_inverse=True)
    pos_src = per_position(s_inv.astype(np.int64), fb)
    gray = fb.values % np.int32(cfg.gray_mod)
    n_src = s_u.size

    out = {str(s): SourceStats.zero() for s in s_u}
    stats = [out[str(s)] for s in s_u]

    # 1. quantized-token presence
    q = np.minimum(fb.values // QUANT, QUANT_BINS - 1).astype(np.int64)
    combined = pos_src * QUANT_BINS + q
    present = np.unique(combined)
    for c in present:
        stats[int(c // QUANT_BINS)].quant_presence[int(c % QUANT_BINS)] = True

    # 2. content-gray histogram moments (gray < 100, 20 bins of 5)
    dark = gray < CONTENT_LIM
    if dark.any():
        b = (gray[dark] // (CONTENT_LIM // HIST_BINS)).astype(np.int64)
        key = pos_src[dark] * HIST_BINS + b
        g = gray[dark].astype(np.float64)
        cnt = np.bincount(key, minlength=n_src * HIST_BINS)
        sm = np.bincount(key, weights=g, minlength=n_src * HIST_BINS)
        sq = np.bincount(key, weights=g * g, minlength=n_src * HIST_BINS)
        for i in range(n_src):
            sl = slice(i * HIST_BINS, (i + 1) * HIST_BINS)
            stats[i].bin_count += cnt[sl]
            stats[i].bin_sum += sm[sl]
            stats[i].bin_sumsq += sq[sl]

    # 3. Laplacian over row interiors
    interior = np.ones(fb.values.size, dtype=bool)
    idx = np.arange(fb.values.size)
    interior &= (idx > fb.row_start) & (idx < fb.row_end - 1)
    if interior.any():
        g64 = gray.astype(np.float64)
        lap = np.zeros_like(g64)
        lap[1:-1] = g64[:-2] - 2 * g64[1:-1] + g64[2:]
        lv = lap[interior]
        key = pos_src[interior]
        ln = np.bincount(key, minlength=n_src)
        ls = np.bincount(key, weights=lv, minlength=n_src)
        lq = np.bincount(key, weights=lv * lv, minlength=n_src)
        for i in range(n_src):
            stats[i].lap_n += int(ln[i])
            stats[i].lap_sum += float(ls[i])
            stats[i].lap_sumsq += float(lq[i])

    # 4. median-3 residual
    med = _median3_flat(gray, fb)
    resid = np.abs(gray.astype(np.int64) - med.astype(np.int64)).astype(np.float64)
    rs = np.bincount(pos_src, weights=resid, minlength=n_src)
    rn = np.bincount(pos_src, minlength=n_src)
    for i in range(n_src):
        stats[i].res_n += int(rn[i])
        stats[i].res_sum += float(rs[i])
    return out


@dataclass
class Classification:
    doc_type: str          # "electronic" | "scanned" | "mixed"
    confidence: float
    metrics: dict[str, float]


def classify_stats(st: SourceStats) -> Classification:
    """Mirror of _decide_type (document_classifier.py:154-177)."""
    u = int(st.quant_presence.sum())
    color_discreteness = float(min(100, max(0, 100 - u * 2)))

    total_dark = int(st.bin_count.sum())
    if total_dark < 100:
        text_concentration = 50.0
    else:
        peak = int(np.argmax(st.bin_count))
        n = st.bin_count[peak]
        if n <= 10:
            std = 255.0
        else:
            mean = st.bin_sum[peak] / n
            var = max(0.0, st.bin_sumsq[peak] / n - mean * mean)
            std = float(np.sqrt(var))
        text_concentration = float(max(0, 100 - std * 2.5))

    if st.lap_n:
        mean = st.lap_sum / st.lap_n
        var = max(0.0, st.lap_sumsq / st.lap_n - mean * mean)
    else:
        var = 0.0
    edge_sharpness = float(min(100, var / 10))

    ratio = (st.res_sum / st.res_n / 255.0) if st.res_n else 0.0
    noise_level = float(max(0, 100 - ratio * 1000))

    electronic = (
        color_discreteness * 0.3
        + text_concentration * 0.3
        + edge_sharpness * 0.2
        + noise_level * 0.2
    )
    scanned = 100 - electronic
    metrics = {
        "color_discreteness": color_discreteness,
        "text_concentration": text_concentration,
        "edge_sharpness": edge_sharpness,
        "noise_level": noise_level,
    }
    if electronic > 70 and scanned < 30:
        return Classification("electronic", electronic, metrics)
    if scanned > 70 and electronic < 30:
        return Classification("scanned", scanned, metrics)
    return Classification("mixed", max(electronic, scanned) / 2, metrics)


def optimal_parameters(doc_type: str) -> dict:
    """Mirror of get_optimal_parameters (document_classifier.py:180-229),
    mapped onto EngineConfig fields (dpi has no token analog)."""
    if doc_type == "electronic":
        return {"tolerance": 18, "strength": 1.0, "kernel_size": 3, "passes": 1, "protect_text": True}
    if doc_type == "scanned":
        return {"tolerance": 32, "strength": 1.3, "kernel_size": 5, "passes": 2, "protect_text": True}
    return {"tolerance": 25, "strength": 1.1, "kernel_size": 3, "passes": 2, "protect_text": True}


def profile_sources(ds, cfg: EngineConfig) -> dict[str, Classification]:
    """Distributed per-source profiling: per-batch partials → driver merge.

    The shuffle-free shape: each map task ships one SourceStats per source
    present in its batch (a few KB), the driver merges and classifies."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        import pickle

        d = batch_source_stats(batch, cfg)
        return pa.table(
            {
                "source": pa.array(list(d), pa.string()),
                "blob": pa.array([pickle.dumps(v) for v in d.values()], pa.binary()),
            }
        )

    import pickle

    merged: dict[str, SourceStats] = {}
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=1024)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for s, blob in zip(b["source"].to_pylist(), b["blob"].to_pylist()):
            st = pickle.loads(blob)
            if s in merged:
                merged[s].merge(st)
            else:
                merged[s] = st
    return {s: classify_stats(st) for s, st in merged.items()}


def auto_tuned_configs(
    ds, cfg: EngineConfig
) -> dict[str, EngineConfig]:
    """source → parameter-tuned EngineConfig (the engine analog of the CLI's
    only-if-default override, cli.py:817-838)."""
    prof = profile_sources(ds, cfg)
    return {s: cfg.with_(**optimal_parameters(c.doc_type)) for s, c in prof.items()}
