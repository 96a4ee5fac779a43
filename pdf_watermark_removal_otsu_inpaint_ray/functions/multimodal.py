"""Multimodal columns: opaque binary payloads with typed metadata.

Images / audio / video travel as ``binary`` columns; decode / resize /
feature-extract are actor-pool ``map_batches`` stages.  The decode libraries
(PIL, ffmpeg, torchaudio…) are NOT in this container, so the decode kernel is
STUBBED: with ``fake=True`` (default) it produces a deterministic fake decode
(metadata derived from the payload bytes) so the Ray-side plumbing — schema,
batch sizing for large binary rows, actor signature, output layout — is real
and tested; with ``fake=False`` it raises ``NotImplementedError`` unless a
real codec is importable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),      # opaque encoded media
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("meta", pa.string()),         # JSON sidecar
    ]
)


def documents_to_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic fake media table from the documents table (test corpus):
    payload = utf-8 bytes of text; media_type round-robins by doc_id."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch["text"].to_pylist()
    kinds = ["image", "audio", "video"]
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "payload": pa.array([t.encode() for t in texts], pa.binary()),
            "media_type": pa.array([kinds[i % 3] for i in ids], pa.string()),
            "meta": pa.array(["{}"] * len(ids), pa.string()),
        }
    )


class DecodeStage:
    """Actor-pool decode stage.  Small ``batch_size`` is mandatory for real
    media (payload × batch × concurrency must fit the worker heap —
    SURVEY.md §4.2 memory note)."""

    def __init__(self, fake: bool = True):
        self.fake = fake
        self.pil = None
        if not fake:
            try:  # pragma: no cover - PIL absent in this container
                from PIL import Image  # noqa: F401

                self.pil = Image
            except ImportError as e:
                raise NotImplementedError(
                    "real media decode needs PIL/ffmpeg, absent in this "
                    "container; use fake=True for plumbing tests"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.fake:
            # deterministic fake: dims from a keyed hash of the payload
            dims = [
                int.from_bytes(hashlib.blake2b(p, digest_size=4).digest(), "little")
                for p in payloads
            ]
            width = pa.array([64 + d % 512 for d in dims], pa.int64())
            height = pa.array([64 + (d >> 9) % 512 for d in dims], pa.int64())
        else:  # pragma: no cover
            raise NotImplementedError("real decode path requires media codecs")
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "width": width,
                "height": height,
            }
        )


class ResizeStage:
    """Image-resize stage (stub codec, real plumbing).

    Real implementation would decode → resample → re-encode per item inside
    the actor (codec loaded once in ``__init__``); the stub transforms the
    fake-decoded dimensions deterministically so downstream schema/layout
    are exercised.  ``batch_size`` must stay small for real media rows."""

    def __init__(self, max_side: int = 256, fake: bool = True):
        if not fake:  # pragma: no cover
            raise NotImplementedError("real resize needs PIL, absent here")
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False)
        h = batch["height"].to_numpy(zero_copy_only=False)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h).astype(np.float64))
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "width": pa.array(np.maximum(1, (w * scale)).astype(np.int64), pa.int64()),
                "height": pa.array(np.maximum(1, (h * scale)).astype(np.int64), pa.int64()),
            }
        )


class FrameSampleStage:
    """Video frame-sampling stage (stub): emits one row per sampled frame
    (flat_map shape — a real decoder would seek per timestamp).  Frame count
    derives deterministically from the payload; stride sampling mirrors the
    reference's deterministic downsample choice (document_classifier.py:84-89)."""

    def __init__(self, every_n: int = 10, fake: bool = True):
        if not fake:  # pragma: no cover
            raise NotImplementedError("real frame sampling needs ffmpeg")
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["item_id"].to_numpy(zero_copy_only=False)
        kinds = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_frame = [], []
        for i, p in enumerate(payloads):
            if kinds[i] != "video":
                continue
            n_frames = 1 + len(p) % 97  # deterministic fake duration
            for f in range(0, n_frames, self.every_n):
                out_id.append(int(ids[i]))
                out_frame.append(f)
        return pa.table(
            {
                "item_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int64()),
            }
        )


class FeatureStage:
    """Fake feature extractor: 8-dim deterministic embedding per item from
    payload bytes (stands in for a model forward pass; model load would go
    here in ``__init__`` — the T3 actor-pool slot)."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            h = hashlib.blake2b(p, digest_size=self.dim * 8).digest()
            v = np.frombuffer(h, dtype="<u8").astype(np.float64)
            v = v / np.maximum(np.linalg.norm(v), 1e-30)
            feats.append(v.tolist())
        return pa.table(
            {
                "item_id": batch["item_id"],
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )
