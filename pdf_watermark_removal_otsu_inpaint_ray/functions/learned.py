"""Learned watermark detector — the T3 actor-pool pattern with REAL heavy
per-actor state.

Engine analog of the reference's YOLO path (``yolo_detector.py:57-146``:
weights loaded once in ``__init__`` and ``.fuse()``-ed for speed, then reused
per page; dispatched by ``detection_method``, ``watermark_detector.py:72-126``).
No model files exist in this container, so the "weights" are a large
DETERMINISTIC embedding table generated from a seed — 64 MB of float32, the
same load-once / score-many shape as a real checkpoint:

* ``__init__`` builds the (V, d) weight table and "fuses" it into a V-entry
  score LUT (one matmul — the expensive prepare step, paid once per actor);
* ``__call__`` scores each token position with a vectorized LUT gather and
  reduces per row — no Python loop over rows or positions.

Scores are emitted QUANTIZED (``score_milli`` int64) so the distributed
result is bit-identical to :func:`golden_learned_scores` regardless of batch
boundaries (per-row reduction order is row-contained).

Pool sizing: pass ``concurrency=(n, m)`` and ``num_cpus`` to
``map_batches`` — each actor pays the weight build once, so min actors
should cover the expected parallelism (cf. SURVEY.md §4.2 actor pools).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..stages.kernels import flatten_list_column

VOCAB = 65536
DIM = 256
SEED = 20260817
FLAG_MILLI = 1000  # position flagged when quantized score > 1.000


def _build_weights(seed: int = SEED) -> np.ndarray:
    """The deterministic 'checkpoint': (V, d) float32, ~64 MB."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((VOCAB, DIM), dtype=np.float32)


def _fuse_lut(weights: np.ndarray, seed: int = SEED) -> np.ndarray:
    """'Fuse' weights into a per-token score LUT (int64 milli-units)."""
    rng = np.random.default_rng(seed + 1)
    probe = rng.standard_normal(DIM).astype(np.float32)
    probe /= np.linalg.norm(probe)
    scores = (weights @ probe).astype(np.float64)
    return np.round(scores * 1000).astype(np.int64)


class LearnedDetectorStage:
    """Actor-pool scorer: heavy state in ``__init__``, vectorized gather in
    ``__call__``.  ``emit_diag=True`` adds (pid, n_loads) columns so tests
    can assert the weights were built once per actor, not once per batch."""

    _process_loads = 0  # per worker process

    def __init__(self, emit_diag: bool = False, weights_cache: str | None = None):
        """``weights_cache``: when set, acquire the checkpoint through the
        ModelManager (S5 analog) and MEMORY-MAP it from the node-local
        cache — one 64 MB build per node instead of one per actor; scores
        are bit-identical either way (same bytes feed the same fuse)."""
        LearnedDetectorStage._process_loads += 1
        if weights_cache is not None:
            from .model_manager import ModelManager

            self.weights = ModelManager(weights_cache).load_weights("wm-detector-64m")
        else:
            self.weights = _build_weights()
        self.lut = _fuse_lut(self.weights)
        self.emit_diag = emit_diag

    def __call__(self, batch: pa.Table) -> pa.Table:
        fb = flatten_list_column(batch["tokens"])
        s = self.lut[fb.values.astype(np.int64) % VOCAB]
        # per-row sum via bincount on the row-segment ids: empty rows simply
        # receive no contributions (reduceat would need boundary clamping,
        # which truncates the last non-empty row when a batch ENDS with an
        # empty row — each token must land in exactly its own row).  float64
        # weights are exact here: |score| <= ~6000 milli, row sums << 2^53.
        score_sum = np.bincount(fb.seg, weights=s, minlength=fb.n_rows).astype(np.int64)
        flagged = np.bincount(
            fb.seg, weights=(s > FLAG_MILLI), minlength=fb.n_rows
        ).astype(np.int64)
        cols = {
            "doc_id": batch["doc_id"],
            "score_milli": pa.array(score_sum, pa.int64()),
            "n_flagged": pa.array(flagged, pa.int64()),
        }
        if self.emit_diag:
            n = batch.num_rows
            cols["pid"] = pa.array([os.getpid()] * n, pa.int64())
            cols["n_loads"] = pa.array([LearnedDetectorStage._process_loads] * n, pa.int64())
        return pa.table(cols)


def learned_scores(ds, *, concurrency=None, batch_size: int = 512, emit_diag: bool = False,
                   weights_cache: str | None = None):
    """Run the learned detector over a sequence Dataset as an actor pool.

    ``weights_cache``: shared path for the model-manager mmap path — ONE
    64 MB weight build per node, shared read-only by every actor, instead
    of each actor paying the full in-memory build in ``__init__``."""
    from ..config import scaled_pool

    if concurrency is None:
        concurrency = scaled_pool(2, 4)  # max cap widens with the cluster
    kw = {"emit_diag": emit_diag}
    if weights_cache is not None:
        kw["weights_cache"] = weights_cache
    return ds.map_batches(
        LearnedDetectorStage,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


_PROC_LUT: np.ndarray | None = None


def learned_flag_detector(values, wm_pos, fb, cfg, max_span_pos=None):
    """Registry-pluggable detector (detection_method="learned"): flags the
    positions the fused LUT scores above FLAG_MILLI.  The LUT builds once
    per worker process (module cache), mirroring the YOLO dispatch path
    (watermark_detector.py:72-126)."""
    global _PROC_LUT
    if _PROC_LUT is None:
        _PROC_LUT = _fuse_lut(_build_weights())
    return _PROC_LUT[values.astype(np.int64) % VOCAB] > FLAG_MILLI


def golden_learned_scores(table: pa.Table) -> pa.Table:
    """Single-process oracle: same weights, same fused LUT, same per-row
    quantized reduction — bit-identical to the distributed stage."""
    lut = _fuse_lut(_build_weights())
    ids = table["doc_id"].to_pylist()
    toks = table["tokens"].to_pylist()
    sums, flags = [], []
    for t in toks:
        s = lut[np.asarray(t, dtype=np.int64) % VOCAB] if len(t) else np.zeros(0, np.int64)
        sums.append(int(s.sum()))
        flags.append(int((s > FLAG_MILLI).sum()))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.string()),
            "score_milli": pa.array(sums, pa.int64()),
            "n_flagged": pa.array(flags, pa.int64()),
        }
    )
