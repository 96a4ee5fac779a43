"""T3 learned-detector actor pool: heavy state loads once per ACTOR (not per
batch), distributed scores are bit-identical to the single-process golden,
and the registry exposes the detector by name."""

import numpy as np
import pyarrow.parquet as pq


def test_learned_scores_match_golden_and_load_once(ray_session):
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.learned import (
        golden_learned_scores,
        learned_scores,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.sources import read_documents_as_sequences

    sf = "/root/testdata/sf0.001"
    ds = read_documents_as_sequences(sf)
    # small batches force many __call__ invocations per actor
    out = learned_scores(ds, concurrency=(2, 2), batch_size=32, emit_diag=True).to_pandas()
    assert len(out) == 500

    # the pool ran >= 2 actors; every actor built the weights exactly once
    per_pid = out.groupby("pid")["n_loads"].nunique()
    assert (per_pid == 1).all(), "an actor rebuilt its weights mid-stream"
    assert out.groupby("pid").size().min() >= 1
    n_batches = -(-500 // 32)
    assert out["n_loads"].max() <= 2 < n_batches  # loads bounded by pool size, not batches

    from pdf_watermark_removal_otsu_inpaint_ray.synth import tokenize_documents_batch

    table = tokenize_documents_batch(
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text", "source"])
    )
    exp = golden_learned_scores(table).to_pandas().sort_values("doc_id", ignore_index=True)
    got = out[["doc_id", "score_milli", "n_flagged"]].sort_values("doc_id", ignore_index=True)
    assert got["score_milli"].tolist() == exp["score_milli"].tolist()
    assert got["n_flagged"].tolist() == exp["n_flagged"].tolist()


def test_learned_stage_batch_ending_with_empty_row():
    """Regression: a batch whose LAST row has zero tokens must not truncate
    the preceding row's final token (the old clamped reduceat dropped it)."""
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.functions.learned import (
        LearnedDetectorStage,
        golden_learned_scores,
    )

    batch = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"], pa.string()),
            "tokens": pa.array([[5, 7, 9], [11, 13], []], pa.list_(pa.int32())),
        }
    )
    got = LearnedDetectorStage()(batch)
    exp = golden_learned_scores(batch)
    assert got["score_milli"].to_pylist() == exp["score_milli"].to_pylist()
    assert got["n_flagged"].to_pylist() == exp["n_flagged"].to_pylist()
    # middle-empty and all-empty shapes too
    for rows in ([[1, 2], [], [3]], [[], [], []], [[], [4, 4, 4], []]):
        b = pa.table(
            {
                "doc_id": pa.array([f"d{i}" for i in range(len(rows))], pa.string()),
                "tokens": pa.array(rows, pa.list_(pa.int32())),
            }
        )
        g, e = LearnedDetectorStage()(b), golden_learned_scores(b)
        assert g["score_milli"].to_pylist() == e["score_milli"].to_pylist()
        assert g["n_flagged"].to_pylist() == e["n_flagged"].to_pylist()


def test_learned_detector_registered():
    import numpy as np

    from pdf_watermark_removal_otsu_inpaint_ray.registry import get_detector

    det = get_detector("learned")
    vals = np.arange(100, dtype=np.int64)
    mask = det(vals, None, None, None)
    assert mask.dtype == bool and mask.shape == (100,)
    # deterministic across calls (cached LUT)
    assert np.array_equal(mask, det(vals, None, None, None))


def test_flagship_learned_method_dispatches_end_to_end(ray_session):
    """detection_method="learned" routes through the registry into the fused
    stage: the distributed flagship rewrite equals a single-process
    fused-kernel run over the whole table (batch-boundary independence), it
    skips the histogram phase (row-local), and it actually flags positions
    (differs from an untouched stream)."""
    import pyarrow as pa
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray import synth
    from pdf_watermark_removal_otsu_inpaint_ray.config import DEFAULT_CONFIG
    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.flagship import run_flagship
    from pdf_watermark_removal_otsu_inpaint_ray.registry import detector_is_row_local
    from pdf_watermark_removal_otsu_inpaint_ray.stages.kernels import (
        flatten_list_column,
        process_batch_flat,
    )

    assert detector_is_row_local("learned") and not detector_is_row_local("color")

    t = synth.generate_stream(600, n_sources=3, n_tok_lo=48, n_tok_hi=160)
    cfg = DEFAULT_CONFIG.with_(detection_method="learned", window_kind="global")
    got = (
        run_flagship(ray.data.from_arrow(t).repartition(5), cfg, batch_size=96)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    fb = flatten_list_column(t["tokens"])
    res = process_batch_flat(fb, np.full(t.num_rows, -1, dtype=np.int64), cfg)
    exp_tokens = [
        res.values[fb.offsets[i] : fb.offsets[i + 1]].tolist() for i in range(t.num_rows)
    ]
    order = np.argsort(np.asarray(t["doc_id"]))
    exp_sorted = [exp_tokens[i] for i in order]
    assert got["tokens"].map(list).tolist() == exp_sorted
    # the detector fired: at least one position rewritten vs the input
    orig_sorted = [t["tokens"][int(i)].as_py() for i in order]
    assert exp_sorted != orig_sorted
    # row-local: wm_token metadata is the -1 no-table sentinel, like auto
    assert (got["wm_token"] == -1).all()
