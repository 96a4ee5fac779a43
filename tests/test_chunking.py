"""Document chunking (functions/text.py::chunk_documents_batch) vs a
per-row Python reference — pins codepoint (not byte) slicing semantics
with multibyte text, overlap, empty docs, and exact-boundary lengths."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
    chunk_documents_batch,
)


def _brute(texts, window, stride):
    out = []
    for i, t in enumerate(texts):
        k = 0
        while k * stride < len(t):
            c = t[k * stride : k * stride + window]
            out.append((i, k, len(c), c))
            k += 1
    return out


@pytest.mark.parametrize("window,stride", [(10, 7), (8, 8), (5, 3)])
def test_chunking_matches_python_slicing(window, stride):
    texts = [
        "",  # zero chunks
        "short",
        "héllo wörld ünïcode ſpecial ¡text! " * 3,  # multibyte codepoints
        "x" * (stride * 4),  # exact boundary: len % stride == 0
        "日本語のテキストです。" * 5,
        "a" * (stride * 4 + 1),  # one char past the boundary
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
        }
    )
    got = chunk_documents_batch(batch, window=window, stride=stride)
    rows = sorted(
        zip(
            got["doc_id"].to_pylist(),
            got["chunk_id"].to_pylist(),
            got["n_chars"].to_pylist(),
            got["chunk"].to_pylist(),
        )
    )
    assert rows == _brute(texts, window, stride)
    # overlap invariant: consecutive chunks of one doc share window-stride chars
    if window > stride:
        by_doc = {}
        for d, k, _, c in rows:
            by_doc.setdefault(d, []).append(c)
        for chunks in by_doc.values():
            for a, b in zip(chunks, chunks[1:]):
                assert a[stride:] == b[: window - stride][: len(a[stride:])]


def test_chunking_empty_batch():
    batch = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
        }
    )
    got = chunk_documents_batch(batch)
    assert got.num_rows == 0
    assert got.schema.names == ["doc_id", "chunk_id", "n_chars", "chunk"]


def test_cdc_chunks_shift_invariance_and_layout(ray_session):
    """Content-defined chunking: (1) engine output equals the independent
    per-doc sequential twin; (2) the storage-dedup property — prepending
    an edit leaves the chunk-hash MULTISET of the far tail intact (fixed
    stride would shift every downstream chunk); (3) batch layout
    invariance."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.text import cdc_chunks_batch

    rng = np.random.default_rng(99)
    # high-entropy text: repetitive text has few gear candidates, so cuts
    # degenerate to forced max-len strides and nothing resynchronizes
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789 "))
    base = "".join(rng.choice(alphabet, size=2400))
    edited = "EDITED PREFIX " + base
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([base, edited]),
            "source": pa.array(["s", "s"]),
        }
    )
    out = cdc_chunks_batch(tbl)
    df = out.to_pandas()
    h1 = df[df.doc_id == 1]["chunk_hash"].tolist()
    h2 = df[df.doc_id == 2]["chunk_hash"].tolist()
    # the tail (beyond max_len of resynchronization) must share hashes
    common = set(h1) & set(h2)
    assert len(common) >= len(h1) - 4, (len(h1), len(common))
    # chunks tile each doc exactly
    for did, sub in df.groupby("doc_id"):
        sub = sub.sort_values("chunk_idx")
        assert sub["start"].iloc[0] == 0
        assert (
            sub["start"].to_numpy()[1:]
            == (sub["start"] + sub["length"]).to_numpy()[:-1]
        ).all()
        # every chunk but the FINAL remainder honors min_len
        if len(sub) > 1:
            assert 16 <= sub["length"].to_numpy()[:-1].min()
        assert sub["length"].max() <= 192
    # layout invariance: 1-row batches through Ray == one whole batch
    ds = ray.data.from_arrow(tbl).repartition(2)
    via_ray = (
        ds.map_batches(cdc_chunks_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    )
    direct = df.sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(via_ray, direct)
