"""Edit-distance similarity join (functions/fuzzy.py): brute all-pairs
equality (independent pure-python DP), band-edge pairs, cross-source
exclusion, layout invariance, and the capped-DP/bag-bound unit contracts."""

import numpy as np
import pyarrow as pa
import ray.data

from pdf_watermark_removal_otsu_inpaint_ray.functions.fuzzy import (
    _bag_bound,
    _char_hist,
    _codepoints,
    _lev_capped,
    edit_distance_join,
)


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def _corpus():
    rng = np.random.default_rng(3)
    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = []
    did = 0

    def add(text, source):
        nonlocal did
        rows.append((did, text, source))
        did += 1

    # clusters of near-duplicates (small random edits), mixed sources
    for src in ("s0", "s1"):
        for c in range(3):
            seed = base + f"cluster {c} of {src} " * (c + 1)
            for v in range(3):
                chars = list(seed)
                for _ in range(rng.integers(0, 12)):
                    p = int(rng.integers(0, len(chars)))
                    chars[p] = chr(97 + int(rng.integers(0, 26)))
                add("".join(chars), src)
    # same text in DIFFERENT sources: must NOT pair
    add("identical across sources " * 6, "s0")
    add("identical across sources " * 6, "s1")
    # band-edge pair: lengths straddle a band boundary (width tau+1 = 31)
    add("x" * 61, "s0")   # band 1
    add("x" * 63, "s0")   # band 2, ed = 2
    # unrelated long docs
    for _ in range(12):
        add("".join(chr(97 + int(c)) for c in rng.integers(0, 26, 200)), "s0")
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _brute(tbl: pa.Table, tau: int) -> set:
    ids = tbl["doc_id"].to_pylist()
    txt = tbl["text"].to_pylist()
    src = tbl["source"].to_pylist()
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if src[i] != src[j] or abs(len(txt[i]) - len(txt[j])) > tau:
                continue
            d = _lev_ref(txt[i], txt[j])
            if d <= tau:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, d))
    return out


def test_edit_join_matches_brute_and_is_layout_invariant(ray_session):
    tbl = _corpus()
    tau = 30
    exp = _brute(tbl, tau)
    assert exp, "corpus must contain matching pairs"
    # the planted band-edge pair is present
    assert any(a == 20 and b == 21 for a, b, _ in exp)
    for nblocks in (1, 4, 9):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        res = edit_distance_join(ds, tau=tau, num_parts=8).to_pandas()
        got = set(zip(res["a"].astype(int), res["b"].astype(int), res["dist"].astype(int)))
        assert got == exp, f"nblocks={nblocks}"
    # identical text across sources excluded
    assert not any(a == 18 and b == 19 for a, b, _ in exp)


def test_lev_capped_exact_and_capped():
    cases = [("kitten", "sitting"), ("abc", ""), ("", ""), ("same", "same"),
             ("abcdef", "azcdxf"), ("aaaa", "bbbb")]
    for a, b in cases:
        ref = _lev_ref(a, b)
        assert _lev_capped(_codepoints(a), _codepoints(b), 10) == min(ref, 11)
        if ref > 2:
            assert _lev_capped(_codepoints(a), _codepoints(b), 2) > 2


def test_bag_bound_is_lower_bound():
    rng = np.random.default_rng(7)
    for _ in range(30):
        a = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 40))
        b = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 45))
        ca, cb = _codepoints(a), _codepoints(b)
        assert _bag_bound(_char_hist(ca), _char_hist(cb)) <= _lev_ref(a, b)


def test_lev_capped_many_matches_scalar():
    from pdf_watermark_removal_otsu_inpaint_ray.functions.fuzzy import _lev_capped_many

    rng = np.random.default_rng(13)
    left = "".join(chr(97 + int(c)) for c in rng.integers(0, 5, 60))
    partners = []
    for ln in (0, 3, 40, 58, 60, 62, 75, 95):
        partners.append("".join(chr(97 + int(c)) for c in rng.integers(0, 5, ln)))
    partners.append(left)  # identical -> 0
    for tau in (2, 10, 30):
        got = _lev_capped_many(
            _codepoints(left), [_codepoints(p) for p in partners], tau
        )
        for p, d in zip(partners, got):
            ref = _lev_ref(left, p)
            assert d == (ref if ref <= tau else tau + 1) or (ref > tau and d > tau), (
                p[:10], tau, d, ref)
    # empty left string
    got = _lev_capped_many(_codepoints(""), [_codepoints(p) for p in partners], 70)
    for p, d in zip(partners, got):
        assert d == (len(p) if len(p) <= 70 else 71)


def _brute_gram_jaccard(tbl: pa.Table, tau: float, ngram=3) -> set:
    """Independent brute twin over word n-gram sets (python string grams,
    no hash sharing: collisions would show as a mismatch)."""
    out = set()
    ids = tbl["doc_id"].to_pylist()
    sets = []
    for t in tbl["text"].to_pylist():
        ws = t.lower().split()
        if len(ws) == 0:
            sets.append(set())
        elif len(ws) < ngram:
            sets.append({" ".join(ws)})
        else:
            sets.append({" ".join(ws[i:i+ngram]) for i in range(len(ws)-ngram+1)})
    for i in range(len(ids)):
        for j in range(i+1, len(ids)):
            u = sets[i] | sets[j]
            if u and len(sets[i] & sets[j]) / len(u) >= tau:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_jaccard_prefix_join_matches_brute_near_threshold(ray_session):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        jaccard_prefix_join,
    )

    rng = np.random.default_rng(21)
    words = [f"tok{i}" for i in range(400)]
    docs = []
    # clusters with graded overlap so several pairs sit right at the 0.5
    # boundary (the regime where MinHash-LSH is allowed to miss)
    for c in range(12):
        base = [words[int(i)] for i in rng.integers(0, 400, 30)]
        docs.append(" ".join(base))
        for cut in (3, 7, 10, 14, 20):
            v = list(base)
            v[:cut] = [words[int(i)] for i in rng.integers(0, 400, cut)]
            docs.append(" ".join(v))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs, pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
        }
    )
    exp = _brute_gram_jaccard(tbl, 0.5)
    assert exp
    for nblocks in (1, 5):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        res = jaccard_prefix_join(ds, ngram=3, threshold=0.5).to_pandas()
        got = set(zip(res["a"].astype(int), res["b"].astype(int)))
        assert got == exp, f"nblocks={nblocks}"
        assert (res["jacc"] >= 0.5).all()


def test_prefix_dup_matches_brute(ray_session):
    """Planted prefix families + random noise: the distributed sorted-run
    sweep finds exactly the proper-prefix pairs, including chains
    (a < ab < abc), equal-text non-pairs, and cross-family separation."""
    from pdf_watermark_removal_otsu_inpaint_ray.functions.fuzzy import prefix_dup

    rng = np.random.default_rng(77)
    words = ["alpha", "beta", "gamma", "delta", "kappa", "zeta"]
    texts = []
    # prefix chains: w, w+x, w+x+y (every shorter is a prefix of every longer)
    for w in words[:3]:
        texts += [w, w + " one", w + " one two"]
    # equal texts (NOT prefix pairs of each other)
    texts += ["same doc", "same doc"]
    # noise
    for _ in range(40):
        texts.append(" ".join(rng.choice(words, size=rng.integers(2, 6))))
    ids = np.arange(len(texts), dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})

    exp = sorted(
        (int(ids[i]), int(ids[j]))
        for i in range(len(texts))
        for j in range(len(texts))
        if i != j
        and len(texts[i]) < len(texts[j])
        and texts[j].startswith(texts[i])
    )
    out = prefix_dup(ray.data.from_arrow(tbl).repartition(4), num_parts=8).to_pandas()
    got = sorted(zip(out["a"].astype(int), out["b"].astype(int)))
    assert got == exp
    assert len(exp) >= 9  # the planted chains alone contribute 3 per family
