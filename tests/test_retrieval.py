"""BM25 retrieval: distributed two-pass scorer vs a brute single-process
implementation sharing only the scoring FORMULA (tokenization, df, avgdl,
tf and top-k are all recomputed from scratch here)."""

import math

import numpy as np
import pyarrow as pa


def _brute_bm25(texts, ids, terms, k, k1=1.2, b=0.75):
    toks = [t.lower().split() for t in texts]
    n = len(texts)
    dl = [len(x) for x in toks]
    avgdl = float(sum(dl)) / n
    idf = {}
    for t in terms:
        df = sum(1 for x in toks if t in x)
        idf[t] = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    scored = []
    for i, x in enumerate(toks):
        sq = 0
        hit = False
        for t in terms:
            tf = float(x.count(t))
            if tf == 0:
                continue
            hit = True
            c = idf[t] * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl[i] / avgdl)
            )
            sq += int(math.floor(c * 10000.0 + 0.5))
        if hit:
            scored.append((-sq, ids[i]))
    scored.sort()
    return [(doc, -negs) for negs, doc in scored[:k]]


def test_bm25_matches_brute(ray_session):
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.retrieval import bm25_topk

    rng = np.random.default_rng(7)
    vocab = ["join", "scan", "spark", "stream", "dup", "key", "row", "agg"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 40)).tolist())
        for _ in range(600)
    ]
    ids = list(range(600))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    terms = ("spark", "dup")
    out = bm25_topk(
        ray.data.from_arrow(tbl).repartition(5), terms, k=15
    ).to_pydict()
    got = list(zip(out["doc_id"], out["score_q"]))
    assert got == _brute_bm25(texts, ids, terms, 15)
    assert out["rank"] == list(range(1, len(got) + 1))


def test_bm25_no_matches(ray_session):
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.retrieval import bm25_topk

    tbl = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["a b", "c d"])}
    )
    out = bm25_topk(ray.data.from_arrow(tbl), ("zzz",), k=5)
    assert out.num_rows == 0
