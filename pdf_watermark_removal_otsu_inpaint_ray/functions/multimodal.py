"""Multimodal columns: opaque binary payloads with typed metadata.

Images / audio / video travel as ``binary`` columns; decode / resize /
feature-extract are actor-pool ``map_batches`` stages.  The decode kernels
are REAL pure-NumPy codecs (:mod:`.codecs`): images are binary PPM (P6) —
the same wire format the reference's own render path produces before PIL
wraps it (pdf_processor.py:28-48) — audio is RIFF/WAVE PCM16, video is a
concatenated-PPM frame stream.  No external media library is needed; the
payloads are valid files any external tool can read.

Memory note (SURVEY.md §4.2): real media rows are large — keep
``batch_size`` small so payload × batch × concurrency fits the worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .codecs import (
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    encode_ppm,
    encode_ppm_stream,
    encode_wav_pcm16,
    ppm_stream_offsets,
    resize_nearest,
)

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),      # encoded media (PPM / WAV / PPM stream)
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("meta", pa.string()),         # JSON sidecar
    ]
)

# Deterministic dimension formulas (shared with the media_decode SQL oracle:
# the decoded values must reproduce these from the payload BYTES alone)
AUDIO_RATE = 8000
VIDEO_W, VIDEO_H = 16, 8


def _image_dims(item_id: int) -> tuple[int, int]:
    return 8 + item_id % 24, 8 + (item_id // 7) % 16  # (W, H)


def _audio_samples(item_id: int) -> int:
    return 100 + item_id % 400


def _video_frames(item_id: int) -> int:
    return 2 + item_id % 6


def _bytes_of(text: str, n: int) -> np.ndarray:
    """First n bytes of the utf-8 text, tiled to length n."""
    raw = np.frombuffer(text.encode() or b"\x00", dtype=np.uint8)
    return np.resize(raw, n)


def documents_to_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic REAL media table from the documents table: each doc
    becomes a valid PPM image, WAV clip, or PPM-stream video (round-robin by
    doc_id) whose pixel/sample bytes derive from the text."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch["text"].to_pylist()
    kinds = ["image", "audio", "video"]
    payloads: list[bytes] = []
    for i, t in zip(ids, texts):
        k = kinds[i % 3]
        if k == "image":
            w, h = _image_dims(int(i))
            payloads.append(encode_ppm(_bytes_of(t, w * h * 3).reshape(h, w, 3)))
        elif k == "audio":
            n = _audio_samples(int(i))
            samples = (_bytes_of(t, n).astype(np.int16) - 128) * 256
            payloads.append(encode_wav_pcm16(samples, AUDIO_RATE))
        else:
            frames = [
                _bytes_of(t[f:] + t[:f], VIDEO_W * VIDEO_H * 3).reshape(VIDEO_H, VIDEO_W, 3)
                for f in range(_video_frames(int(i)))
            ]
            payloads.append(encode_ppm_stream(frames))
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array([kinds[i % 3] for i in ids], pa.string()),
            "meta": pa.array(["{}"] * len(ids), pa.string()),
        }
    )


class DecodeStage:
    """Actor-pool decode stage — REAL parse of the payload bytes.

    image → PPM header+pixels, audio → WAV chunks, video → frame scan.
    width/height carry (W, H) for visual types and (n_samples, channels)
    for audio; n_frames is 1 for stills/clips.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["media_type"].to_pylist()
        width, height, frames = [], [], []
        for p, k in zip(payloads, kinds):
            if k == "image":
                arr = decode_ppm(p)
                width.append(arr.shape[1])
                height.append(arr.shape[0])
                frames.append(1)
            elif k == "audio":
                samples, _rate, channels = decode_wav(p)
                width.append(samples.size)
                height.append(channels)
                frames.append(1)
            else:
                offs = ppm_stream_offsets(p)
                width.append(offs[0][1])
                height.append(offs[0][2])
                frames.append(len(offs))
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
                "n_frames": pa.array(frames, pa.int64()),
            }
        )


class ResizeStage:
    """Image-resize stage — REAL decode → nearest-neighbor resample →
    re-encode per item.  Non-image rows pass through unchanged."""

    def __init__(self, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["media_type"].to_pylist()
        out_payload, width, height = [], [], []
        for p, k in zip(payloads, kinds):
            if k == "image":
                arr = resize_nearest(decode_ppm(p), self.max_side)
                out_payload.append(encode_ppm(arr))
                width.append(arr.shape[1])
                height.append(arr.shape[0])
            else:
                out_payload.append(p)
                width.append(-1)
                height.append(-1)
        return pa.table(
            {
                "item_id": batch["item_id"],
                "media_type": batch["media_type"],
                "payload": pa.array(out_payload, pa.binary()),
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
            }
        )


class FrameSampleStage:
    """Video frame sampling — REAL header scan of the PPM stream builds the
    seek table (no pixel decode); one output row per sampled frame
    (flat_map shape).  Stride sampling mirrors the reference's
    deterministic downsample choice (document_classifier.py:84-89)."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["item_id"].to_numpy(zero_copy_only=False)
        kinds = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_frame, out_off = [], [], []
        for i, p in enumerate(payloads):
            if kinds[i] != "video":
                continue
            offs = ppm_stream_offsets(p)
            for f in range(0, len(offs), self.every_n):
                out_id.append(int(ids[i]))
                out_frame.append(f)
                out_off.append(offs[f][0])
        return pa.table(
            {
                "item_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int64()),
                "byte_offset": pa.array(out_off, pa.int64()),
            }
        )


class FeatureStage:
    """Deterministic feature extractor: 8-dim embedding per item from
    payload bytes (stands in for a model forward pass; a real learned
    detector with heavy per-actor state lives in functions/learned.py)."""

    def __init__(self, dim: int = 8):
        if not 1 <= dim <= 8:
            # blake2b digests cap at 64 bytes = 8 u64 lanes; fail at
            # construction, not in every worker's first batch
            raise ValueError(f"FeatureStage dim must be in 1..8, got {dim}")
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


class AudioFrameEnergyStage:
    """Audio analysis stage: REAL WAV parse → per-frame signal energy.

    Non-overlapping ``frame``-sample windows over the decoded int16 PCM
    stream; energy = sum of squared samples as int64 (exact: 64 · 32768²
    ≪ 2⁶³, no float ever materializes) — the VAD / silence-trim primitive
    of an audio-corpus pipeline, and the 1-D analog of the per-window
    histogram energy rule (`watermark_detector.py:162-189`).  One
    ``np.add.reduceat`` per item; non-audio rows produce no output.
    → (item_id, frame_id, frame_len, energy), one row per frame.
    """

    def __init__(self, frame: int = 64):
        if frame < 1:
            raise ValueError(f"frame must be >= 1, got {frame}")
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        fids: list[int] = []
        flens: list[int] = []
        energies: list[int] = []
        kinds = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        items = batch["item_id"].to_pylist()
        for i, p, k in zip(items, payloads, kinds):
            if k != "audio":
                continue
            samples, _rate, _channels = decode_wav(p)
            s = samples.astype(np.int64)
            starts = np.arange(0, s.size, self.frame)
            e = np.add.reduceat(s * s, starts)
            n_f = starts.size
            ids_out.extend([int(i)] * n_f)
            fids.extend(range(n_f))
            lens = np.minimum(starts + self.frame, s.size) - starts
            flens.extend(int(x) for x in lens)
            energies.extend(int(x) for x in e)
        return pa.table(
            {
                "item_id": pa.array(ids_out, pa.int64()),
                "frame_id": pa.array(fids, pa.int64()),
                "frame_len": pa.array(flens, pa.int64()),
                "energy": pa.array(energies, pa.int64()),
            }
        )


def phash64(arr: "np.ndarray") -> int:
    """64-bit perceptual hash of an H×W×3 uint8 image, INTEGER-EXACT (the
    aHash variant of image near-dup — Krawetz's average hash with the mean
    comparison cross-multiplied so no float materializes):

    * cell (r, c) of an 8×8 grid samples source pixel
      ``((r·H)//8, (c·W)//8)`` (nearest-neighbor floor scaling);
    * a cell's value is its channel sum r+g+b (0..765);
    * bit ``r·8+c`` is set iff ``cell·64 > sum(all 64 cells)``
      (strictly-above-average brightness).

    Returned as the int64 two's-complement view of the uint64 bit pattern
    (Arrow carries int64)."""
    a = arr.astype(np.int64)
    h, w = a.shape[0], a.shape[1]
    g = a.sum(axis=2)
    ri = (np.arange(8, dtype=np.int64) * h) // 8
    ci = (np.arange(8, dtype=np.int64) * w) // 8
    cells = g[np.ix_(ri, ci)].ravel()
    bits = (cells * 64) > cells.sum()
    val = np.uint64(0)
    for k in np.nonzero(bits)[0]:
        val |= np.uint64(1) << np.uint64(k)
    return int(val.astype(np.int64))


def phash_batch(batch: pa.Table) -> pa.Table:
    """(item_id, phash) for the IMAGE rows of a media batch (other media
    types pass: frame-level hashing would go through the seek table)."""
    ids = batch["item_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    kinds = batch["media_type"].to_pylist()
    payloads = batch["payload"].to_pylist()
    out_ids, out_h = [], []
    for i, k, p in zip(ids, kinds, payloads):
        if k != "image":
            continue
        out_ids.append(int(i))
        out_h.append(phash64(decode_ppm(p)))
    return pa.table(
        {
            "item_id": pa.array(out_ids, pa.int64()),
            "phash": pa.array(out_h, pa.int64()),
        }
    )


def phash_near_dup(media_ds, *, max_hamming: int = 3) -> pa.Table:
    """Image near-duplicate pairs with Hamming(phash) <= max_hamming —
    the multimodal twin of ``dedup.simhash_dedup`` and the image-dedup
    shape of a multimodal training pipeline: 16-bit band blocking over the
    64-bit hash (complete recall for max_hamming <= 3 by pigeonhole),
    salted coarse bucket groupbys for candidates, vectorized popcount
    verify over the output-scale broadcast candidate hashes.  Returns
    (a, b, hamming) with a < b.  Ray must already be initialised."""
    from .dedup import _candidate_pairs_tbl, _collect_arrow, _empty_pairs

    hashed = media_ds.map_batches(phash_batch, batch_format="pyarrow")

    def explode(b: pa.Table) -> pa.Table:
        ids = b["item_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = b["phash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        band = np.repeat(np.arange(4, dtype=np.int32), ids.size)
        key = np.concatenate(
            [(sigs >> np.uint64(16 * j)) & np.uint64(0xFFFF) for j in range(4)]
        ).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band, pa.int32()),
                "band_hash": pa.array(key, pa.int64()),
                "doc_id": pa.array(np.tile(ids, 4), pa.int64()),
            }
        )

    cand_tbl = _candidate_pairs_tbl(hashed.map_batches(explode, batch_format="pyarrow"))
    if cand_tbl.num_rows == 0:
        return _empty_pairs("hamming", pa.int64())

    import ray

    # verify pass: filter to candidate ids BEFORE the second decode+hash
    # pass — the decode dominates at media scale, so re-hashing the whole
    # corpus to keep output-scale rows would double the pipeline's cost
    # (the same rule as simhash_dedup's sigs_needed filter)
    need_ref = ray.put(
        np.unique(
            np.concatenate(
                [np.asarray(cand_tbl["a"], np.int64), np.asarray(cand_tbl["b"], np.int64)]
            )
        )
    )

    def media_needed(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["item_id"].combine_chunks().cast(pa.int64()))
        keep = np.isin(ids, ray.get(need_ref))
        return b.filter(pa.array(keep)) if not keep.all() else b

    sig_tbl = _collect_arrow(
        media_ds.map_batches(media_needed, batch_format="pyarrow").map_batches(
            phash_batch, batch_format="pyarrow"
        ),
        pa.schema([("item_id", pa.int64()), ("phash", pa.int64())]),
    )
    sids = np.asarray(sig_tbl["item_id"], np.int64)
    svals = np.asarray(sig_tbl["phash"], np.int64)
    order = np.argsort(sids)
    sids, svals = sids[order], svals[order].astype(np.uint64)
    a_ids = np.asarray(cand_tbl["a"], np.int64)
    b_ids = np.asarray(cand_tbl["b"], np.int64)
    xa = svals[np.searchsorted(sids, a_ids)]
    xb = svals[np.searchsorted(sids, b_ids)]
    xor = np.ascontiguousarray(xa ^ xb).view(np.uint8).reshape(-1, 8)
    ham = np.unpackbits(xor, axis=1).sum(axis=1).astype(np.int64)
    keep = ham <= max_hamming
    return pa.table(
        {
            "a": pa.array(a_ids[keep], pa.int64()),
            "b": pa.array(b_ids[keep], pa.int64()),
            "hamming": pa.array(ham[keep], pa.int64()),
        }
    )


class SceneCutStage:
    """Video scene-cut detection over the PPM stream — the shot-boundary
    primitive of video curation: adjacent frames whose mean absolute
    pixel difference exceeds ``tau`` mark a cut.  Integer-exact: a cut
    fires iff ``Σ|a−b| > w·h·3·tau`` (no float mean), so the distributed
    result is bit-equal to the serial golden for any batch layout.

    Actor-pool ``map_batches`` stage (decode state is trivial here, but
    the stage shape matches the heavy-decoder contract: small
    ``batch_size`` because payloads are large, concurrency bounds in the
    query).  Per video the frame stack diffs vectorize in one NumPy
    subtraction; the per-item loop is item-scale, never pixel-scale.
    Reference analog: the page-change detection of the sticky-window
    chain (watermark_detector.py persistence reset)."""

    def __init__(self, tau: int = 60):
        self.tau = int(tau)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["item_id"].to_numpy(zero_copy_only=False)
        kinds = batch["media_type"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_nf, out_cuts, out_diff = [], [], [], []
        for i, p in enumerate(payloads):
            if kinds[i] != "video":
                continue
            frames = decode_ppm_stream(p)
            n = len(frames)
            cuts = 0
            total = 0
            if n >= 2:
                # The cut rule is defined on shape-equal adjacent pairs;
                # a video whose frame dims vary mid-stream has no defined
                # diff, so reject it upfront (if the shape SET has more
                # than one element, some adjacent pair must differ — a
                # per-pair "fallback" could never complete anyway).
                shapes = {f.shape for f in frames}
                if len(shapes) != 1:
                    raise ValueError(
                        "SceneCutStage: frame dims vary within video "
                        f"item {int(ids[i])} ({sorted(shapes)}) — the cut "
                        "rule is defined on shape-equal adjacent pairs"
                    )
                stack = np.stack(frames).astype(np.int64)
                d = np.abs(stack[1:] - stack[:-1]).sum(axis=(1, 2, 3))
                thresh = (
                    frames[0].shape[0] * frames[0].shape[1] * 3 * self.tau
                )
                cuts = int((d > thresh).sum())
                total = int(d.sum())
            out_id.append(int(ids[i]))
            out_nf.append(n)
            out_cuts.append(cuts)
            out_diff.append(total)
        return pa.table(
            {
                "item_id": pa.array(out_id, pa.int64()),
                "n_frames": pa.array(out_nf, pa.int64()),
                "n_cuts": pa.array(out_cuts, pa.int64()),
                "diff_total": pa.array(out_diff, pa.int64()),
            }
        )
