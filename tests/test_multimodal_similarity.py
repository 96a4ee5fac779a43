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
                                concurrency=(1, 2))
    resized = decoded.map_batches(ResizeStage(max_side=128), batch_format="pyarrow").to_pandas()
    assert (resized[["width", "height"]].max(axis=1) <= 128).all()
    assert len(resized) == 500

    frames = media.map_batches(FrameSampleStage(every_n=7), batch_format="pyarrow").to_pandas()
    assert len(frames) > 0
    assert (frames["frame_idx"] % 7 == 0).all()
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


def test_decode_real_path_raises_clearly():
    from pdf_watermark_removal_otsu_inpaint_ray.functions.multimodal import DecodeStage

    with pytest.raises(NotImplementedError):
        DecodeStage(fake=False)


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
