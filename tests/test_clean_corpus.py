"""Composed cleaning pipeline (pipelines/clean.py) vs per-row Python —
pins the gate conjunction, stopword language rule, and keep-lowest-doc_id
dedup across partitions (duplicates land in one hash partition)."""

import re

import numpy as np
import pyarrow as pa
import ray

from pdf_watermark_removal_otsu_inpaint_ray.pipelines.clean import (
    clean_corpus,
    quality_gate_batch,
)

STOP = {"the", "a", "and", "of", "to", "in", "is"}


def _brute_gate(t, min_words, min_chars):
    ws = re.findall(r"[^\t\n\f\r ]+", t.lower())
    return (
        len(ws) >= min_words
        and len(t) >= min_chars
        and any(w in STOP for w in ws)
    )


def test_quality_gate_matches_brute():
    texts = [
        "the quick brown fox jumps over the lazy dog",  # passes
        "short the one",  # too few words / chars
        "lorem ipsum dolor sit amet consectetur adipiscing",  # no stopword
        "",  # empty
        "a b c d e f g h i j k l m n o p q r s t",  # passes (has 'a')
        "das ist ein deutscher satz ohne englische woerter hier",  # no EN stop
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
        }
    )
    got = quality_gate_batch(batch, min_words=5, min_chars=20)
    expect = [i for i, t in enumerate(texts) if _brute_gate(t, 5, 20)]
    assert got["doc_id"].to_pylist() == expect
    for d, t in zip(got["doc_id"].to_pylist(), got["text"].to_pylist()):
        ws = re.findall(r"[^\t\n\f\r ]+", texts[d].lower())
        row = got.slice(got["doc_id"].to_pylist().index(d), 1)
        assert row["n_words"].to_pylist() == [len(ws)]
        assert row["n_chars"].to_pylist() == [len(texts[d])]


def test_clean_corpus_dedups_keep_lowest_id(ray_session):
    good = "the quick brown fox jumps over the lazy dog again"
    texts = [good, good, "tiny", good + " extra", good]
    ids = [7, 3, 1, 9, 20]  # duplicates of `good`: keep doc_id 3
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "source": pa.array(["s"] * len(texts), pa.string()),
            }
        )
    ).repartition(3)
    out = (
        clean_corpus(ds, min_words=5, min_chars=20, num_parts=8)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert out["doc_id"].tolist() == [3, 9]
    assert (out["n_words"] >= 5).all() and (out["n_chars"] >= 20).all()
