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
