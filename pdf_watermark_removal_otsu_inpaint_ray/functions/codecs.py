"""Pure-NumPy media codecs — REAL encode/decode with no external libraries.

The container has no PIL/ffmpeg, but these formats need none:

* **PPM (P6)** — the classic binary RGB image format (the reference's own
  render path goes through PPM bytes: pdf_processor.py:28-48 renders a
  pixmap to PPM before PIL wraps it).  Header ``P6\\n<W> <H>\\n255\\n``
  followed by H*W*3 raw bytes.
* **WAV (PCM16 mono)** — RIFF/WAVE fmt+data chunks, little-endian int16.
* **PPM stream** — concatenated P6 frames (ffmpeg's ``-f image2pipe``
  representation of raw video); frame boundaries recovered by header scan.

These make the multimodal decode/resize/frame-sample stages real kernels
instead of stubs: the bytes on the wire are valid PPM/WAV that any external
tool can read.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) → binary PPM (P6, maxval 255)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 (H, W, 3), got {arr.dtype} {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _ppm_header(data: bytes, pos: int = 0) -> tuple[int, int, int]:
    """Parse one P6 header at ``pos`` → (width, height, pixel_data_offset).
    Handles arbitrary whitespace and ``#`` comments per the PPM spec."""
    if data[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    i = pos + 2
    fields: list[int] = []
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    return w, h, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(data: bytes, pos: int = 0) -> np.ndarray:
    """Binary PPM → uint8 (H, W, 3)."""
    w, h, off = _ppm_header(data, pos)
    n = w * h * 3
    if len(data) - off < n:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(data, dtype=np.uint8, count=n, offset=off).reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downscale so max(H, W) <= max_side (no upscale)."""
    h, w = arr.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return arr[yi][:, xi]


# ---------------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 1-D samples → mono RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("expected 1-D int16 samples")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE PCM16 → (samples int16, sample_rate, channels)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, samples = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt ":
            _fmt, channels, rate = struct.unpack("<HHI", data[pos + 8 : pos + 16])
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=pos + 8)
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate, channels


# ---------------------------------------------------------------------------
# PPM stream (video)
# ---------------------------------------------------------------------------


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    return b"".join(encode_ppm(f) for f in frames)


def ppm_stream_offsets(data: bytes) -> list[tuple[int, int, int]]:
    """Scan a concatenated-P6 stream → [(offset, width, height)] per frame
    WITHOUT decoding pixels (a real seek table)."""
    out = []
    pos = 0
    while pos < len(data):
        w, h, off = _ppm_header(data, pos)
        out.append((pos, w, h))
        pos = off + w * h * 3
    return out


def decode_ppm_stream(data: bytes) -> list[np.ndarray]:
    return [decode_ppm(data, pos) for pos, _, _ in ppm_stream_offsets(data)]
