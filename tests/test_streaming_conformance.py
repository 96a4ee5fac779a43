"""Randomized cross-variant conformance: for random (window kind, sizes,
disorder <= lateness, source counts) configurations, every streaming
variant — coordinated, hot-key-salted, partitioned-log — must reproduce
the batch golden byte-for-byte.  Complements the fixed-config golden tests
with sampled coverage of the config space."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_watermark_removal_otsu_inpaint_ray import golden, synth
from pdf_watermark_removal_otsu_inpaint_ray.config import DEFAULT_CONFIG

CASES = [
    # (seed, kind, n_sources, disorder, kwargs)
    (1, "tumbling", 1, 3, dict(window_size=16)),
    (2, "tumbling", 5, 12, dict(window_size=48)),
    (3, "sliding", 3, 6, dict(window_size=32, window_slide=8)),
    (4, "sliding", 2, 10, dict(window_size=24, window_slide=12)),
    (5, "session", 4, 5, dict(session_gap=3)),
    (6, "session", 1, 9, dict(session_gap=11)),
]


@pytest.mark.parametrize("seed,kind,n_sources,disorder,kw", CASES)
def test_streaming_variants_conform_to_golden(ray_session, tmp_path, seed, kind, n_sources, disorder, kw):
    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.streaming import (
        run_streaming,
        run_streaming_partitioned,
        run_streaming_salted,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(300, 500))
    p = str(tmp_path / "s.parquet")
    synth.write_stream(p, n, n_sources=n_sources, n_tok_lo=32, n_tok_hi=96,
                       disorder=disorder, rows_per_ts=1)
    cfg = DEFAULT_CONFIG.with_(window_kind=kind, allowed_lateness=disorder + 2, **kw)
    expected = golden.golden_pipeline(pq.read_table(p), cfg).sort_by("doc_id")

    def check(res, label):
        assert res.n_late == 0, (label, res.n_late)
        got = res.output.sort_by("doc_id")
        assert got["doc_id"].to_pylist() == expected["doc_id"].to_pylist(), label
        assert got["tokens"].to_pylist() == expected["tokens"].to_pylist(), label
        assert got["wm_token"].to_pylist() == expected["wm_token"].to_pylist(), label

    check(run_streaming(p, cfg, n_actors=3, micro_batch_rows=int(rng.integers(40, 150))),
          "coordinated")
    check(run_streaming_salted(p, cfg, n_actors=3, salt_buckets=2,
                               micro_batch_rows=int(rng.integers(40, 150))),
          "salted")
    # partitioned-log consumers handle every window kind: all rows of a
    # source meet the same state actor regardless of which consumer read
    # them, and the min-across-partitions watermark gates finalization
    res, _m = run_streaming_partitioned(
        p, cfg, n_actors=3, n_partitions=1, micro_batch_rows=int(rng.integers(40, 150))
    )
    check(res, "partitioned")


def test_partitioned_session_windows_multi_consumer(ray_session, tmp_path):
    """Session windows under PARALLEL partitioned-log consumers: per-source
    state converges on one actor, the min-watermark gates gap-merge closure
    across consumer skew — golden-equal."""
    import os

    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.streaming import (
        run_streaming_partitioned,
    )

    d = tmp_path / "parts"
    d.mkdir()
    for s in range(0, 600, 100):
        pq.write_table(
            synth.generate_stream(100, start_row=s, n_sources=3, disorder=6, rows_per_ts=1),
            str(d / f"c{s:06d}.parquet"),
        )
    cfg = DEFAULT_CONFIG.with_(window_kind="session", session_gap=4, allowed_lateness=10)
    full = pa.concat_tables([pq.read_table(str(d / f)) for f in sorted(os.listdir(d))])
    expected = golden.golden_pipeline(full, cfg).sort_by("doc_id")
    res, metrics = run_streaming_partitioned(
        str(d), cfg, n_actors=3, n_partitions=3, micro_batch_rows=48
    )
    assert res.n_late == 0
    got = res.output.sort_by("doc_id")
    assert got["doc_id"].to_pylist() == expected["doc_id"].to_pylist()
    assert got["tokens"].to_pylist() == expected["tokens"].to_pylist()
    assert got["wm_token"].to_pylist() == expected["wm_token"].to_pylist()
    assert len(metrics) == 3
