"""Multimodal plumbing stages (decode/resize/frame-sample/feature) and
IVF similarity recall vs brute force."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _media_ds(sf_dir="/root/testdata/sf0.001"):
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.multimodal import (
        documents_to_media_batch,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    return ds.map_batches(documents_to_media_batch, batch_format="pyarrow")


def test_decode_resize_frame_feature_pipeline(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.multimodal import (
        DecodeStage,
        FeatureStage,
        FrameSampleStage,
        ResizeStage,
    )

    media = _media_ds()
    decoded = media.map_batches(DecodeStage, batch_format="pyarrow", batch_size=64,
                                concurrency=(1, 2)).to_pandas()
    assert len(decoded) == 500
    imgs = decoded[decoded["media_type"] == "image"]
    assert (imgs["width"] >= 8).all() and (imgs["width"] <= 31).all()
    vids = decoded[decoded["media_type"] == "video"]
    assert (vids["n_frames"] >= 2).all() and (vids["n_frames"] <= 7).all()

    resized = media.map_batches(ResizeStage(max_side=16), batch_format="pyarrow").to_pandas()
    rimgs = resized[resized["media_type"] == "image"]
    assert (rimgs[["width", "height"]].max(axis=1) <= 16).all()
    assert len(resized) == 500

    frames = media.map_batches(FrameSampleStage(every_n=3), batch_format="pyarrow").to_pandas()
    assert len(frames) > 0
    assert (frames["frame_idx"] % 3 == 0).all()
    # only video items emit frames (media_type round-robins by doc_id % 3 == 2)
    assert set(frames["item_id"] % 3) == {2}

    feats = media.map_batches(
        FeatureStage, fn_constructor_kwargs={"dim": 8},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 2),
    ).to_pandas()
    assert len(feats) == 500
    v = np.array(feats["feature"].iloc[0])
    assert v.shape == (8,) and abs(np.linalg.norm(v) - 1.0) < 1e-9

    # determinism: rerun produces identical features
    feats2 = media.map_batches(FeatureStage(dim=8), batch_format="pyarrow").to_pandas()
    a = feats.sort_values("item_id", ignore_index=True)
    b = feats2.sort_values("item_id", ignore_index=True)
    assert all(list(x) == list(y) for x, y in zip(a["feature"], b["feature"]))


def test_codecs_round_trip():
    """The payloads are REAL formats: encode → decode is byte/pixel exact,
    and resize produces the expected nearest-neighbor grid."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.codecs import (
        decode_ppm,
        decode_ppm_stream,
        decode_wav,
        encode_ppm,
        encode_ppm_stream,
        encode_wav_pcm16,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    small = resize_nearest(img, 8)
    assert max(small.shape[:2]) == 8 and small.shape[2] == 3

    samples = rng.integers(-32768, 32767, size=301, dtype=np.int16)
    got, rate, ch = decode_wav(encode_wav_pcm16(samples, 8000))
    assert rate == 8000 and ch == 1 and np.array_equal(got, samples)

    frames = [rng.integers(0, 256, size=(8, 16, 3), dtype=np.uint8) for _ in range(4)]
    back = decode_ppm_stream(encode_ppm_stream(frames))
    assert len(back) == 4 and all(np.array_equal(a, b) for a, b in zip(back, frames))

    # malformed payloads raise clearly
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_wav(b"nonsense bytes")


def test_ivf_recall_vs_brute_force(ray_session):
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.similarity import (
        IvfIndex,
        cosine_topk,
        matrix_of,
    )

    sf = "/root/testdata/sf0.01"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    q = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    brute = set(cosine_topk(ds, q, k=10)["vec_id"].to_pylist())

    sample = matrix_of(t["embedding"].slice(0, 256))
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-30)
    idx = IvfIndex(n_list=8, n_probe=4).fit(sample)
    parts = idx.add_partition_column(ds)
    approx = set(idx.search(parts, q, k=10)["vec_id"].to_pylist())
    recall = len(brute & approx) / 10
    assert recall >= 0.5  # 4 of 8 partitions probed
    # full probe == brute force
    idx_full = IvfIndex(n_list=8, n_probe=8).fit(sample)
    full = set(idx_full.search(idx_full.add_partition_column(ds), q, k=10)["vec_id"].to_pylist())
    assert full == brute


def test_phash64_spec_and_near_dup_banding(ray_session):
    """phash64 follows the documented integer spec; banding finds exactly
    the brute-force Hamming<=3 pairs over planted near-identical images."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.codecs import encode_ppm
    from pdf_watermark_removal_otsu_inpaint_ray.functions.multimodal import (
        phash64,
        phash_near_dup,
    )

    # spec check on a hand-computable image: 8x8, left half dark (0),
    # right half bright (200) -> bits set exactly on grid columns 4..7
    arr = np.zeros((8, 8, 3), np.uint8)
    arr[:, 4:, :] = 200
    v = np.uint64(phash64(arr))
    expect = np.uint64(0)
    for r in range(8):
        for c in range(4, 8):
            expect |= np.uint64(1) << np.uint64(r * 8 + c)
    assert v == expect

    # planted near-dups: base random images + copies with k pixels flipped
    rng = np.random.default_rng(5)
    items, payloads = [], []
    imgs = {}
    for i in range(30):
        a = rng.integers(0, 256, (16, 16, 3), np.uint8)
        imgs[i] = a
        items.append(i)
        payloads.append(encode_ppm(a))
        b = a.copy()
        b[0, : (i % 6), :] = 255  # 0..5 saturated pixels
        imgs[100 + i] = b
        items.append(100 + i)
        payloads.append(encode_ppm(b))
    media = pa.table(
        {
            "item_id": pa.array(items, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image"] * len(items), pa.string()),
            "meta": pa.array(["{}"] * len(items), pa.string()),
        }
    )
    got = phash_near_dup(
        ray.data.from_arrow(media).repartition(4), max_hamming=3
    )
    got_pairs = sorted(
        zip(got["a"].to_pylist(), got["b"].to_pylist(), got["hamming"].to_pylist())
    )
    # brute force over all pairs
    hs = {k: np.uint64(phash64(v)) for k, v in imgs.items()}
    brute = []
    keys = sorted(hs)
    for x in range(len(keys)):
        for y in range(x + 1, len(keys)):
            a, b = keys[x], keys[y]
            d = bin(int(hs[a] ^ hs[b])).count("1")
            if d <= 3:
                brute.append((a, b, d))
    assert got_pairs == sorted(brute)
    assert len(got_pairs) > 0


def test_audio_frame_energy_matches_stdlib_wave(ray_session):
    """Frame energies computed by the stage equal a brute recompute from
    stdlib wave's parse of the same payload (independent WAV reader), and
    the tail frame is short, not padded."""
    import io
    import wave as stdwave

    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.multimodal import (
        AudioFrameEnergyStage,
        documents_to_media_batch,
    )

    docs = pa.table(
        {
            "doc_id": pa.array([1, 4, 7], pa.int64()),  # %3==1 → audio
            "text": pa.array(["hello world", "", "abcdefgh" * 40], pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
        }
    )
    media = documents_to_media_batch(docs)
    out = (
        ray.data.from_arrow(media)
        .map_batches(
            AudioFrameEnergyStage, batch_format="pyarrow", batch_size=2,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["item_id", "frame_id"], ignore_index=True)
    )
    for item_id, payload in zip(
        media["item_id"].to_pylist(), media["payload"].to_pylist()
    ):
        with stdwave.open(io.BytesIO(payload)) as w:
            assert w.getsampwidth() == 2 and w.getnchannels() == 1
            pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2").astype(np.int64)
        sub = out[out.item_id == item_id]
        n = pcm.size
        assert sub["frame_len"].sum() == n
        for _, r in sub.iterrows():
            lo = int(r["frame_id"]) * 64
            chunk = pcm[lo : lo + 64]
            assert r["frame_len"] == chunk.size
            assert r["energy"] == int((chunk * chunk).sum()), (item_id, lo)
    # 100 + 1%400 = 101 samples → frames of 64 + 37
    assert out[out.item_id == 1]["frame_len"].tolist() == [64, 37]
