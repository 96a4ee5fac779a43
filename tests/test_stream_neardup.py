"""Streaming near-duplicate suppression (state/neardup_state.py +
pipelines/stream_neardup.py): serial-twin equality, layout invariance,
zero-shingle admission, late routing, sink mode."""

import numpy as np
import pyarrow as pa
import ray.data

from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_neardup import (
    run_streaming_neardup,
)
from pdf_watermark_removal_otsu_inpaint_ray.state.neardup_state import (
    doc_signature_bands,
    serial_neardup_mask,
)


def _dup_stream(n=300, n_base=60, disorder=3, seed=3):
    """Document stream where every third doc is a 2-word mutation of an
    earlier base doc (a near-dup the admission filter must suppress)."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(50)]
    base = [" ".join(rng.choice(words, 40)) for _ in range(n_base)]
    docs, ts = [], []
    for i in range(n):
        if i % 3 == 0:
            src = base[i % n_base].split()
            for _ in range(2):
                src[int(rng.integers(0, len(src)))] = str(rng.choice(words))
            docs.append(" ".join(src))
        else:
            docs.append(" ".join(rng.choice(words, 40)))
        ts.append(i // 5)
    docs += ["", "   "]  # zero-shingle docs: always kept
    ts += [10, 11]
    m = len(docs)
    arr = np.argsort(np.asarray(ts) + rng.integers(0, disorder + 1, m), kind="stable")
    return pa.table(
        {
            "doc_id": pa.array(np.arange(m, dtype=np.int64)[arr], pa.int64()),
            "text": pa.array([docs[i] for i in arr]),
            "event_ts": pa.array(np.asarray(ts, np.int64)[arr], pa.int64()),
        }
    )


def _serial_kept(tbl, min_agree=32):
    sig, keys, has = doc_signature_bands(tbl)
    mask = serial_neardup_mask(
        np.asarray(tbl["doc_id"], np.int64),
        np.asarray(tbl["event_ts"], np.int64),
        sig, keys, has, min_agree,
    )
    return sorted(np.asarray(tbl["doc_id"], np.int64)[mask].tolist())


def test_neardup_matches_serial_twin(ray_session):
    tbl = _dup_stream()
    want = _serial_kept(tbl)
    assert len(want) < tbl.num_rows  # the filter must actually suppress
    res = run_streaming_neardup(
        ray.data.from_arrow(tbl), allowed_lateness=8,
        n_actors=3, micro_batch_rows=64,
    )
    assert res.n_late == 0
    got = sorted(np.asarray(res.output["doc_id"], np.int64).tolist())
    assert got == want
    stats = res.actor_stats
    assert sum(s["n_kept"] for s in stats) == len(got)
    assert sum(s["n_kept"] + s["n_dup"] for s in stats) == tbl.num_rows
    # zero-shingle docs were admitted
    assert {tbl.num_rows - 1, tbl.num_rows - 2} <= set(got)


def test_neardup_layout_invariance(ray_session):
    tbl = _dup_stream(150, 30)
    want = _serial_kept(tbl)
    for n_actors, mb in ((1, 1024), (4, 17)):
        res = run_streaming_neardup(
            ray.data.from_arrow(tbl), allowed_lateness=8,
            n_actors=n_actors, micro_batch_rows=mb,
        )
        got = sorted(np.asarray(res.output["doc_id"], np.int64).tolist())
        assert got == want, (n_actors, mb)


def test_neardup_late_routing(ray_session):
    tbl = _dup_stream(200, 40, disorder=20)
    res = run_streaming_neardup(
        ray.data.from_arrow(tbl), allowed_lateness=0,
        n_actors=2, micro_batch_rows=16,
    )
    assert res.n_late > 0
    assert res.late is not None and res.late.num_rows == res.n_late
    emitted = set(np.asarray(res.output["doc_id"], np.int64).tolist())
    late_ids = set(np.asarray(res.late["doc_id"], np.int64).tolist())
    assert not (emitted & late_ids)
    stats_total = sum(
        s["n_kept"] + s["n_dup"] + s["n_late"] for s in res.actor_stats
    )
    assert stats_total == tbl.num_rows
    for s in res.actor_stats:
        assert s["pending_rows"] == 0


def test_neardup_state_is_kept_scale(ray_session):
    # a dup-heavy stream: band entries track KEPT docs, not the stream
    tbl = _dup_stream(240, 12)  # only 12 base docs -> heavy suppression
    res = run_streaming_neardup(
        ray.data.from_arrow(tbl), allowed_lateness=8, n_actors=2,
    )
    kept = sum(s["n_kept"] for s in res.actor_stats)
    entries = sum(s["band_entries"] for s in res.actor_stats)
    assert kept < tbl.num_rows
    assert entries <= kept * 16  # 16 bands per banded kept doc, nothing else


def test_neardup_sink_mode_equals_driver_mode(ray_session, tmp_path):
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_output,
    )

    tbl = _dup_stream(150, 30)
    driver = run_streaming_neardup(
        ray.data.from_arrow(tbl), allowed_lateness=8, n_actors=2
    )
    out_dir = str(tmp_path / "sink")
    sink = run_streaming_neardup(
        ray.data.from_arrow(tbl), allowed_lateness=8, n_actors=2,
        out_dir=out_dir,
    )
    assert sink.output is None
    got = (
        read_output(out_dir)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    cols = sorted(c for c in got.columns if c != "part")
    want = driver.output.to_pandas().sort_values("doc_id", ignore_index=True)
    assert got[cols].equals(want[cols])


def test_neardup_checkpoint_kill_and_replay(ray_session, tmp_path):
    """Kill after a checkpoint, resume, byte-identical commit (payload
    custody + band index ride the actor snapshots; the driver's undecided
    metadata buffer rides one extra blob)."""
    import pyarrow.parquet as pq
    import pytest

    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.checkpoint import (
        latest_checkpoint,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_output,
    )

    tbl = _dup_stream(300, 60)
    path = str(tmp_path / "log.parquet")
    pq.write_table(tbl, path)
    kw = dict(allowed_lateness=8, n_actors=2, micro_batch_rows=32)

    clean_dir = str(tmp_path / "clean")
    run_streaming_neardup(path, out_dir=clean_dir, **kw)
    want = (
        read_output(clean_dir)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    ck_dir = str(tmp_path / "ck")
    with pytest.raises(RuntimeError, match="injected stop"):
        run_streaming_neardup(
            path, out_dir=ck_dir, checkpoint_every=3, _stop_after_batches=7, **kw
        )
    assert latest_checkpoint(ck_dir) is not None
    run_streaming_neardup(path, out_dir=ck_dir, checkpoint_every=3, **kw)
    got = read_output(ck_dir).to_pandas().sort_values("doc_id", ignore_index=True)
    assert got.equals(want)
    assert latest_checkpoint(ck_dir) is None
