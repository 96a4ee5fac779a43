"""Per-group top-k (functions/selection.py) vs per-row brute force."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from pdf_watermark_removal_otsu_inpaint_ray.functions.selection import topk_per_group


def _brute(groups, scores, ties, k):
    rows = sorted(zip(groups, scores, ties), key=lambda r: (r[0], -r[1], r[2]))
    out, seen = [], {}
    for g, s, t in rows:
        c = seen.get(g, 0)
        if c < k:
            out.append((g, s, t))
            seen[g] = c + 1
    return sorted(out)


@pytest.mark.parametrize("k,seed", [(1, 0), (3, 1), (7, 2)])
def test_topk_per_group_int_matches_brute_force(ray_session, k, seed):
    rng = np.random.default_rng(seed)
    n = 500
    g = rng.integers(0, 20, n)
    s = rng.integers(0, 15, n)  # small range → heavy score ties
    t = rng.permutation(n).astype(np.int64)

    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(g, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "t": pa.array(t, pa.int64()),
            }
        )
    ).repartition(7)
    got = topk_per_group(ds, group="g", score="s", tie="t", k=k, num_parts=8).to_pandas()
    assert sorted(zip(got["g"], got["s"], got["t"])) == _brute(g, s, t, k)


def test_topk_per_group_string_groups(ray_session):
    rng = np.random.default_rng(9)
    n = 300
    names = np.array(["alpha", "beta", "gamma", "delta"])
    g = names[rng.integers(0, 4, n)]
    s = rng.integers(0, 1000, n)
    t = np.arange(n, dtype=np.int64)

    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(g.tolist(), pa.string()),
                "s": pa.array(s, pa.int64()),
                "t": pa.array(t, pa.int64()),
            }
        )
    ).repartition(5)
    got = topk_per_group(ds, group="g", score="s", tie="t", k=2, num_parts=4).to_pandas()
    assert sorted(zip(got["g"], got["s"], got["t"])) == _brute(g.tolist(), s, t, 2)
    # extra payload columns survive untouched
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(g.tolist(), pa.string()),
                "s": pa.array(s, pa.int64()),
                "t": pa.array(t, pa.int64()),
                "payload": pa.array([f"p{i}" for i in range(n)], pa.string()),
            }
        )
    )
    got2 = topk_per_group(ds2, group="g", score="s", tie="t", k=2).to_pandas()
    assert set(got2.columns) == {"g", "s", "t", "payload"}
    assert got2["payload"].tolist() == [f"p{i}" for i in got2["t"]]


def test_training_shuffle_exact_order_and_determinism(ray_session):
    """The shuffle order must equal the closed-form permutation (sort by
    Lehmer hash of key+seed, tie-break key), be a permutation of the input,
    be block-layout independent, and differ between seeds."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.selection import (
        LEHMER_MOD,
        LEHMER_MULT,
        training_shuffle,
    )

    ids = np.arange(500, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})

    def expected(seed):
        sk = ((ids + seed) * LEHMER_MULT) % LEHMER_MOD
        sk = sk ^ (sk >> 15)
        sk = (sk * 16807) % LEHMER_MOD
        sk = sk ^ (sk >> 13)
        sk = (sk * LEHMER_MULT) % LEHMER_MOD
        order = np.lexsort((ids, sk))
        return ids[order].tolist()

    for nblocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        got = [r["doc_id"] for r in training_shuffle(ds, seed=3).take_all()]
        assert got == expected(3), f"nblocks={nblocks}"
        assert sorted(got) == ids.tolist()  # permutation

    other = [
        r["doc_id"]
        for r in training_shuffle(ray.data.from_arrow(tbl), seed=4).take_all()
    ]
    assert other == expected(4)
    assert other != expected(3)

    # shuffle QUALITY: the head of the order must not be an arithmetic
    # progression (the pure-LCG lattice failure mode on sequential ids)
    head = np.asarray(expected(3)[:20])
    assert len(set(np.diff(head).tolist())) > 3


def test_dsir_weights_planted_target(ray_session):
    """Planted corpus: a word exclusive to the target domain must score
    positive, a word exclusive to the background negative, and a uniform
    word in-between; docs made of target-words outrank background docs.
    Also pins layout invariance and the empty-doc drop."""
    import ray

    from pdf_watermark_removal_otsu_inpaint_ray.functions.selection import (
        dsir_weights,
    )

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "text": pa.array(
                [
                    "tgtword tgtword common",   # target docs
                    "tgtword common",
                    "tgtword tgtword tgtword",
                    "bgword common",            # background docs
                    "bgword bgword",
                    "bgword common common",
                    "",                         # empty doc → no output row
                    "common",
                ],
                pa.string(),
            ),
            "source": pa.array(
                ["t", "t", "t", "b", "b", "b", "b", "b"], pa.string()
            ),
        }
    )
    for parts in (1, 4):
        out = (
            dsir_weights(
                ray.data.from_arrow(docs).repartition(parts),
                target_sources=("t",),
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert out["doc_id"].tolist() == [0, 1, 2, 3, 4, 5, 7]
        w = dict(zip(out["doc_id"], out["weight_q"]))
        nw = dict(zip(out["doc_id"], out["n_words"]))
        assert nw[0] == 3 and nw[2] == 3 and nw[7] == 1
        # pure-target doc beats every background doc
        assert w[2] > max(w[3], w[4], w[5])
        # background-exclusive word scores negative overall
        assert w[4] < 0
        # weights are consistent across layouts (second loop == first)
    # per-word quantized contributions: doc of k copies of one word has
    # weight exactly k × (single-copy doc weight of that word)
    solo = dsir_weights(
        ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["tgtword", "tgtword tgtword tgtword"]),
                    "source": pa.array(["t", "t"]),
                }
            )
        ),
        target_sources=("t",),
    ).to_pandas().sort_values("doc_id", ignore_index=True)
    assert int(solo["weight_q"][1]) == 3 * int(solo["weight_q"][0])


def test_weighted_sample_matches_brute_and_layout_invariant(ray_session):
    """A-ES weighted sample vs a serial twin (same libm-ln priority),
    layout invariance, positive-weight contract, and the proportionality
    sanity check (heavy keys overrepresented vs uniform)."""
    import math

    import pytest

    from pdf_watermark_removal_otsu_inpaint_ray.functions.selection import (
        LEHMER_MOD,
        LEHMER_MULT,
        weighted_sample,
    )

    n = 4000
    keys = np.arange(n, dtype=np.int64)
    w = np.where(keys % 10 == 0, 50, 1).astype(np.int64)  # 10% heavy keys
    tbl = pa.table({"doc_id": pa.array(keys), "w": pa.array(w)})

    pri = np.array(
        [
            math.log(((int(k) * LEHMER_MULT) % LEHMER_MOD + 1) / 2147483648.0)
            / int(ww)
            for k, ww in zip(keys, w)
        ]
    )
    order = np.lexsort((keys, -pri))[:100]
    want = keys[order].tolist()

    for parts in (1, 7):
        out = weighted_sample(
            ray.data.from_arrow(tbl).repartition(parts),
            key="doc_id", weight="w", k=100,
        )
        got = out["doc_id"].to_pylist()
        assert got == want, parts
        assert out["rank"].to_pylist() == list(range(1, 101))

    # proportionality: heavy keys are 10% of rows but ~84% of the sample
    # (1 - (1-p)^50 style dominance); assert a safe margin
    heavy = sum(1 for k in want if k % 10 == 0)
    assert heavy > 50, heavy

    # the contract error surfaces wrapped in RayTaskError — match on text
    with pytest.raises(Exception, match="positive"):
        bad = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "w": pa.array([1, 0], pa.int64())}
        )
        weighted_sample(ray.data.from_arrow(bad), key="doc_id", weight="w", k=2)
