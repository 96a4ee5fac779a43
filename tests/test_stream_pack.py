"""Streaming per-source example packing (state/pack_state.py +
pipelines/stream_pack.py): byte-equality with the serial chunker for any
actor count / micro-batch size, carry state bound, checkpoint
kill-and-replay with the emitted-output blob."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from pdf_watermark_removal_otsu_inpaint_ray.pipelines.stream_pack import (
    run_streaming_pack,
)

L = 32


def _seq_table(n_docs=150, n_sources=5, seed=7):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, 20, n_docs)
    lens[3] = 0  # empty docs ride the stream too
    toks = [rng.integers(1, 200, ln).astype(np.int32) for ln in lens]
    srcs = [f"s{int(x)}" for x in rng.integers(0, n_sources, n_docs)]
    return pa.table(
        {
            "doc_id": pa.array([f"{i:012d}" for i in range(n_docs)]),
            "tokens": pa.array([t.tolist() for t in toks], pa.list_(pa.int32())),
            "n_tok": pa.array(lens.astype(np.int32), pa.int32()),
            "source": pa.array(srcs, pa.string()),
            "event_ts": pa.array(np.arange(n_docs, dtype=np.int64), pa.int64()),
        }
    )


def _serial(tbl: pa.Table):
    """Per-source concat-and-chunk twin (arrival = row order)."""
    out = {}
    streams: dict[str, list] = {}
    docs: dict[str, list] = {}
    for i in range(tbl.num_rows):
        s = tbl["source"][i].as_py()
        t = np.asarray(tbl["tokens"][i].as_py(), np.int64)
        if t.size == 0:
            continue
        streams.setdefault(s, []).append(t)
        docs.setdefault(s, []).append(np.full(t.size, i, np.int64))
    for s in streams:
        flat = np.concatenate(streams[s])
        dof = np.concatenate(docs[s])
        for e in range(-(-flat.size // L)):
            seg = flat[e * L : (e + 1) * L]
            dseg = dof[e * L : (e + 1) * L]
            out[(s, e)] = (
                seg.size, int(seg.sum()), int(seg[0]), int(seg[-1]),
                int(np.unique(dseg).size),
            )
    return out


def _as_dict(output: pa.Table):
    return {
        (r["source"], r["example_id"]): (
            r["n_tok"], r["tok_sum"], r["first_tok"], r["last_tok"],
            r["n_docs"],
        )
        for r in output.to_pylist()
    }


def test_streaming_pack_matches_serial_any_layout(ray_session):
    tbl = _seq_table()
    want = _serial(tbl)
    for n_actors, mb in ((1, 16), (3, 64), (4, 7)):
        res = run_streaming_pack(
            ray.data.from_arrow(tbl), length=L,
            n_actors=n_actors, micro_batch_rows=mb,
        )
        assert _as_dict(res.output) == want, (n_actors, mb)


def test_streaming_pack_carry_bounded(ray_session):
    """The actor never holds more than length-1 carry tokens per source."""
    tbl = _seq_table(n_docs=400, n_sources=3, seed=9)
    res = run_streaming_pack(
        ray.data.from_arrow(tbl), length=L, n_actors=2, micro_batch_rows=32
    )
    # flush drains the carry; the invariant is visible in example shape:
    # every non-final example is exactly L tokens
    df = res.output.to_pandas().sort_values(["source", "example_id"])
    for s, g in df.groupby("source"):
        assert (g["n_tok"].to_numpy()[:-1] == L).all()
        assert 0 < int(g["n_tok"].iloc[-1]) <= L


def test_streaming_pack_checkpoint_kill_and_replay(ray_session, tmp_path):
    tbl = _seq_table(seed=13)
    want = _serial(tbl)
    ck = str(tmp_path / "pack_ck")
    kw = dict(length=L, n_actors=3, micro_batch_rows=16)
    with pytest.raises(RuntimeError, match="injected stop"):
        run_streaming_pack(
            ray.data.from_arrow(tbl),
            ckpt_dir=ck, checkpoint_every=2, _stop_after_batches=6, **kw
        )
    res = run_streaming_pack(
        ray.data.from_arrow(tbl), ckpt_dir=ck, checkpoint_every=2, **kw
    )
    assert _as_dict(res.output) == want
    # the resumed run skipped the replayed prefix (restored n_rows rides
    # the snapshot, so the total is exact, not doubled)
    assert sum(s["n_rows"] for s in res.actor_stats) == tbl.num_rows


def test_streaming_pack_config_mismatch_rejected(ray_session, tmp_path):
    tbl = _seq_table(seed=21)
    ck = str(tmp_path / "pack_ck2")
    with pytest.raises(RuntimeError, match="injected stop"):
        run_streaming_pack(
            ray.data.from_arrow(tbl), length=L, n_actors=2,
            micro_batch_rows=16, ckpt_dir=ck, checkpoint_every=1,
            _stop_after_batches=3,
        )
    with pytest.raises(RuntimeError, match="different pack config"):
        run_streaming_pack(
            ray.data.from_arrow(tbl), length=L + 1, n_actors=2,
            micro_batch_rows=16, ckpt_dir=ck,
        )


def test_streaming_pack_sink_mode_equals_driver_mode(ray_session, tmp_path):
    """Sink-direct staging: committed layout reads back equal to the
    driver-collected output (minus the stamped partition key), manifests
    conserve rows."""
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_output,
    )

    tbl = _seq_table(seed=31)
    kw = dict(length=L, n_actors=3, micro_batch_rows=32)
    drv = run_streaming_pack(ray.data.from_arrow(tbl), **kw)
    out_dir = str(tmp_path / "pack_sink")
    res = run_streaming_pack(ray.data.from_arrow(tbl), out_dir=out_dir, **kw)
    assert res.output is None
    committed = int(res.commit_report["row_count"].to_pandas().sum())
    assert committed == drv.output.num_rows
    got = (
        read_output(out_dir)
        .to_pandas()
        .drop(columns=["doc_id"])
        .sort_values(["source", "example_id"], ignore_index=True)
    )
    want = drv.output.to_pandas().sort_values(
        ["source", "example_id"], ignore_index=True
    )
    assert got[want.columns.tolist()].equals(want)


def test_streaming_pack_sink_checkpoint_kill_and_replay(ray_session, tmp_path):
    """Sink-mode resume: kill mid-stream, resume from the two-log
    checkpoint, committed layout byte-equal to an uninterrupted run."""
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import (
        read_output,
    )

    tbl = _seq_table(seed=37)
    kw = dict(length=L, n_actors=3, micro_batch_rows=16)
    clean_dir = str(tmp_path / "pack_clean")
    run_streaming_pack(ray.data.from_arrow(tbl), out_dir=clean_dir, **kw)
    ck_dir = str(tmp_path / "pack_ck_sink")
    with pytest.raises(RuntimeError, match="injected stop"):
        run_streaming_pack(
            ray.data.from_arrow(tbl), out_dir=ck_dir,
            checkpoint_every=2, _stop_after_batches=6, **kw
        )
    run_streaming_pack(
        ray.data.from_arrow(tbl), out_dir=ck_dir, checkpoint_every=2, **kw
    )
    a = (
        read_output(clean_dir).to_pandas()
        .sort_values(["source", "example_id"], ignore_index=True)
    )
    b = (
        read_output(ck_dir).to_pandas()
        .sort_values(["source", "example_id"], ignore_index=True)
    )
    assert a.equals(b)
