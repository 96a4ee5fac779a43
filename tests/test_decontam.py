"""Word n-gram helper + decontamination / repetition stages vs per-row
Python specs — pins gram formation at row boundaries, empty/short docs,
Unicode whitespace parity, empty eval sets, and the integer repetition
rule."""

import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_watermark_removal_otsu_inpaint_ray.functions.text import (
    DecontaminateStage,
    _grams_with_rows,
    eval_gram_array,
    repetition_stats_batch,
)


def _spec_grams(texts, n):
    out = []
    for i, t in enumerate(texts):
        ws = re.findall(r"[^\t\n\f\r ]+", (t or "").lower())
        for j in range(len(ws) - n + 1):
            out.append((i, " ".join(ws[j : j + n])))
    return out


_text = st.text(
    alphabet=st.sampled_from(list("ab \t\n xyz.!")), max_size=40
)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.one_of(_text, st.none()), max_size=12), st.integers(2, 4))
def test_grams_match_spec(texts, n):
    rows, grams = _grams_with_rows(pa.array(texts, pa.string()), n)
    got = list(zip(rows.tolist(), grams.to_pylist()))
    assert got == _spec_grams(texts, n)


def test_decontaminate_stage_counts(ray_session):
    import ray

    texts = [
        "alpha beta gamma delta",  # both eval grams occur
        "beta gamma delta alpha",  # shares "beta gamma delta" only
        "zz yy xx ww",  # clean
        "",  # no grams
        "one two",  # too short for a 3-gram
    ]
    ev = pa.array(["alpha beta gamma", "beta gamma delta"], pa.string())
    stage = DecontaminateStage(ray.put(ev), n=3)
    out = stage(
        pa.table(
            {"doc_id": pa.array(range(5), pa.int64()), "text": pa.array(texts)}
        )
    )
    assert out["n_grams"].to_pylist() == [2, 2, 2, 0, 0]
    assert out["n_hits"].to_pylist() == [2, 1, 0, 0, 0]
    assert out["is_contam"].to_pylist() == [1, 1, 0, 0, 0]


def test_decontaminate_empty_eval_set(ray_session):
    import ray

    stage = DecontaminateStage(ray.put(pa.array([], pa.string())), n=3)
    out = stage(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array(["a b c d"]),
            }
        )
    )
    assert out["n_hits"].to_pylist() == [0]
    assert out["is_contam"].to_pylist() == [0]


def test_eval_gram_array_distinct(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a b c a b c", "a b c"]),
            }
        )
    )
    grams = eval_gram_array(ds, n=3)
    assert grams.to_pylist() == ["a b c", "b c a", "c a b"]


@settings(max_examples=80, deadline=None)
@given(st.lists(_text, max_size=10))
def test_repetition_stats_match_spec(texts):
    out = repetition_stats_batch(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    for i, t in enumerate(texts):
        ws = re.findall(r"[^\t\n\f\r ]+", t.lower())
        b2 = [" ".join(ws[j : j + 2]) for j in range(len(ws) - 1)]
        g3 = [" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)]
        top = max((b2.count(g) for g in set(b2)), default=0)
        assert out["n_bigrams"][i].as_py() == len(b2)
        assert out["top_bigram_cnt"][i].as_py() == top
        assert out["dup_trigram_cnt"][i].as_py() == len(g3) - len(set(g3))
        assert out["is_repetitive"][i].as_py() == int(
            len(b2) > 0 and 5 * top >= len(b2)
        )
