"""Count-Min sketch (functions/sketch.py): one-sided error (est ≥ true),
superset-of-true-heavies contract, additivity of partials, and layout
invariance of the final (word, est) set."""

import numpy as np
import pyarrow as pa
import ray.data

from pdf_watermark_removal_otsu_inpaint_ray.functions.sketch import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_heavy_words,
    cms_partial_batch,
)


def _corpus(seed=4):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(300)]
    heavy = ["alpha", "beta", "gamma"]
    docs = []
    for _ in range(120):
        ws = [vocab[int(i)] for i in rng.integers(0, 300, 40)]
        ws += heavy * int(rng.integers(2, 6))
        rng.shuffle(ws)
        docs.append(" ".join(ws))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, pa.string()),
        }
    )


def _true_counts(tbl):
    from collections import Counter

    c = Counter()
    for t in tbl["text"].to_pylist():
        c.update(t.lower().split())
    return c


def test_cms_one_sided_and_superset(ray_session):
    tbl = _corpus()
    truth = _true_counts(tbl)
    n = sum(truth.values())
    ds = ray.data.from_arrow(tbl)
    res = cms_heavy_words(ds, phi=0.01).to_pandas()
    got = dict(zip(res["word"], res["est"].astype(int)))
    thresh = int(np.ceil(0.01 * n))
    # one-sided: every estimate >= the true count
    for w, e in got.items():
        assert e >= truth[w], (w, e, truth[w])
    # superset: every truly heavy word is present
    for w, c in truth.items():
        if c >= thresh:
            assert w in got, w
    assert {"alpha", "beta", "gamma"} <= set(got)


def test_cms_layout_invariant(ray_session):
    tbl = _corpus(seed=9)
    outs = []
    for nblocks in (1, 3, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        res = cms_heavy_words(ds, phi=0.01).to_pandas().sort_values("word")
        outs.append(list(zip(res["word"], res["est"].astype(int))))
    assert outs[0] == outs[1] == outs[2]


def test_cms_partials_additive(ray_session):
    tbl = _corpus(seed=2)
    half = tbl.num_rows // 2
    a, b = tbl.slice(0, half), tbl.slice(half)
    pa_ = cms_partial_batch(a)
    pb_ = cms_partial_batch(b)
    whole = cms_partial_batch(tbl)
    sa = np.asarray(pa_["sketch"][0].as_py(), np.int64)
    sb = np.asarray(pb_["sketch"][0].as_py(), np.int64)
    sw = np.asarray(whole["sketch"][0].as_py(), np.int64)
    assert sw.shape == (CMS_D * CMS_W,)
    assert np.array_equal(sa + sb, sw)
    sk, n = cms_build(ray.data.from_arrow(tbl).repartition(4))
    assert np.array_equal(sk.reshape(-1), sw)
    assert n == int(whole["n_words"][0].as_py())
