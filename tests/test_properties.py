"""Property-based tests (hypothesis) for the kernel/oracle invariants."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pdf_watermark_removal_otsu_inpaint_ray import golden
from pdf_watermark_removal_otsu_inpaint_ray.config import DEFAULT_CONFIG

tokens_strategy = st.lists(st.integers(min_value=0, max_value=599), min_size=0, max_size=300)
flags_strategy = st.lists(st.booleans(), min_size=1, max_size=200)


@given(tokens_strategy)
@settings(max_examples=60, deadline=None)
def test_morphology_idempotence(toks):
    """OPEN and CLOSE are idempotent: f(f(x)) == f(x)."""
    flag = np.asarray([t % 3 == 0 for t in toks], dtype=bool)
    for r in (1, 2):
        o = golden.morph_open(flag, r)
        assert (golden.morph_open(o, r) == o).all()
        c = golden.morph_close(flag, r)
        assert (golden.morph_close(c, r) == c).all()
        # open shrinks-or-keeps, close grows-or-keeps
        assert not (o & ~flag).any()
        assert not (flag & ~c).any()


@given(flags_strategy)
@settings(max_examples=60, deadline=None)
def test_inpaint_invariants(flags):
    """Inpaint changes only flagged positions; every output value existed in
    the row; unflagged positions are untouched."""
    flag = np.asarray(flags, dtype=bool)
    rng = np.random.default_rng(3)
    toks = rng.integers(0, 500, size=flag.size).astype(np.int32)
    out = golden.inpaint_row(toks, flag)
    assert (out[~flag] == toks[~flag]).all()
    assert set(out.tolist()) <= set(toks.tolist())
    if not flag.all():
        # filled values come only from unflagged positions
        allowed = set(toks[~flag].tolist())
        assert set(out[flag].tolist()) <= allowed


@given(tokens_strategy, st.integers(min_value=-1, max_value=255))
@settings(max_examples=60, deadline=None)
def test_process_row_shape_dtype_passthrough(toks, wm):
    """Output preserves shape/dtype (reference images-in/images-out contract,
    test_watermark_core.py:38-45); wm<0 is byte-identity."""
    t = np.asarray(toks, dtype=np.int32)
    r = golden.process_row(t, wm)
    assert r.tokens.shape == t.shape and r.tokens.dtype == np.int32
    if wm < 0:
        assert (r.tokens == t).all()


@given(st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=256))
@settings(max_examples=60, deadline=None)
def test_detection_respects_bounds(counts):
    """Any detected wm token is inside the gray band with coverage in the
    configured range (watermark_detector.py:181 rule)."""
    h = np.zeros(256, dtype=np.int64)
    for i, c in enumerate(counts):
        h[i % 256] += c
    wm, cov = golden.detect_wm_token(h)
    cfg = DEFAULT_CONFIG
    if wm >= 0:
        assert cfg.wm_gray_lo <= wm <= cfg.wm_gray_hi
        assert cfg.wm_cov_lo <= cov <= cfg.wm_cov_hi
        total = h.sum()
        assert abs(cov - h[wm] / total * 100.0) < 1e-12


@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60), st.integers(1, 50))
@settings(max_examples=60, deadline=None)
def test_session_assignment_properties(ts, gap):
    """Sessions partition the sorted stream; gaps within a session <= gap,
    between sessions > gap."""
    t = np.sort(np.asarray(ts, dtype=np.int64))
    sess = golden.assign_session_windows(t, gap)
    assert sess[0] == t[0]
    for i in range(1, t.size):
        if t[i] - t[i - 1] > gap:
            assert sess[i] == t[i]  # new session starts here
        else:
            assert sess[i] == sess[i - 1]


_text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=120
)


@given(st.lists(_text_strategy, min_size=1, max_size=8))
@settings(max_examples=40, deadline=None)
def test_vectorized_hashing_matches_python_spec(texts):
    """The vectorized batch word/simhash kernels reproduce the pure-Python
    spec implementations (oracle_data) byte-for-byte on arbitrary unicode,
    including empty docs and batches ending with empty docs."""
    import re

    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        MinHashStage,
        SimHashStage,
        _word_hashes_flat,
        shingle_hashes,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.oracle_data import (
        _py_simhash,
        _py_word_hash,
    )

    wh, off = _word_hashes_flat(texts)
    exp = []
    for t in texts:
        exp.extend(_py_word_hash(w) for w in re.findall(r"\S+", t.lower()))
    assert wh.tolist() == exp
    assert off[-1] == len(exp)

    b = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    assert SimHashStage()(b)["simhash"].to_pylist() == [_py_simhash(t) for t in texts]

    # flat minhash signatures == scalar per-doc path over unique shingles,
    # and the gram-hash chain itself == the pure-Python spec mirror (so the
    # WHOLE minhash signature path is spec-checked, not just word hashes)
    from pdf_watermark_removal_otsu_inpaint_ray.oracle_data import _py_gram_hashes

    stage = MinHashStage(32)
    out = stage(b)
    for i, t in enumerate(texts):
        sh = shingle_hashes(t, stage.ngram)
        assert sh.tolist() == sorted(set(_py_gram_hashes(t, stage.ngram)))
        assert out["shingles"][i].as_py() == sh.tolist()
        assert out["sig"][i].as_py() == stage.signature(sh).tolist()


def test_simhash_broadcast_verify_equals_join_verify(ray_session):
    """The broadcast-signature popcount verify and the native double-join
    verify produce the identical pair set on a dup-heavy corpus."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import simhash_dedup

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(120)]
    texts, ids = [], []
    for b in range(50):
        base = list(rng.choice(words, 25))
        for v in range(4):
            t = base.copy()
            if v:
                t[v] = f"alt{v}"
            texts.append(" ".join(t))
            ids.append(b * 4 + v)
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts),
         "source": pa.array(["s"] * len(ids))}
    )
    ds = ray.data.from_arrow(t).repartition(4)
    got_b = simhash_dedup(ds, max_hamming=10, verify_mode="broadcast")
    got_j = simhash_dedup(ds, max_hamming=10, verify_mode="join")
    key = lambda tb: sorted(zip(tb["a"].to_pylist(), tb["b"].to_pylist(), tb["hamming"].to_pylist()))
    assert key(got_b) == key(got_j)
    assert got_b.num_rows > 50


def test_minhash_distributed_equals_twin_on_dup_heavy_corpus(ray_session):
    """High-pair-count regression: the fully distributed LSH pipeline
    (salted bucket groupbys + partition-sweep verify) produces EXACTLY the
    pair set of an independently coded single-process bucket+Jaccard twin
    on a duplicate-heavy corpus (the regime where per-group overheads and
    cross-band dedup bugs would surface)."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        MinHashStage,
        _band_rows,
        jaccard,
        minhash_lsh_dedup,
    )

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(300)]
    texts, ids = [], []
    for b in range(80):
        base = " ".join(rng.choice(words, 30))
        for v in range(6):
            texts.append(base + (f" variant {v}" if v else ""))
            ids.append(b * 6 + v)
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts),
         "source": pa.array(["s"] * len(ids))}
    )
    out = minhash_lsh_dedup(ray.data.from_arrow(t).repartition(4), threshold=0.5)
    got = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))

    stage = MinHashStage(64)
    sig = stage(t)
    band = _band_rows(sig, 16, 4)
    buckets = {}
    for bb, h, d in zip(band["band"].to_pylist(), band["band_hash"].to_pylist(),
                        band["doc_id"].to_pylist()):
        buckets.setdefault((bb, h), []).append(d)
    cand = set()
    for m in buckets.values():
        u = sorted(set(m))
        for i in range(len(u)):
            for j in range(i + 1, len(u)):
                cand.add((u[i], u[j]))
    sh = {d: np.asarray(s, np.int64)
          for d, s in zip(sig["doc_id"].to_pylist(), sig["shingles"].to_pylist())}
    exp = {(a, b) for a, b in cand if jaccard(sh[a], sh[b]) >= 0.5}
    assert got == exp and len(got) > 500


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40), w=st.integers(1, 40),
    n=st.integers(1, 2000), rate=st.sampled_from([8000, 16000, 44100]),
    data=st.data(),
)
def test_codec_round_trips_random(h, w, n, rate, data):
    """Property: PPM and WAV encode→decode are exact for arbitrary shapes."""
    import numpy as np

    from pdf_watermark_removal_otsu_inpaint_ray.functions.codecs import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav_pcm16,
    )

    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    samples = rng.integers(-32768, 32768, size=n).astype(np.int16)
    got, r, ch = decode_wav(encode_wav_pcm16(samples, rate))
    assert r == rate and ch == 1 and np.array_equal(got, samples)


def test_connected_components_union_find():
    """Union-find clusters: chains merge transitively, cluster_id is the
    component's min doc id, keep marks exactly one doc per cluster."""
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import connected_components

    pairs = pa.table(
        {
            # component {1,2,3,9} via chain 9-3, 3-2, 2-1; component {5,7}
            "a": pa.array([9, 3, 2, 5], pa.int64()),
            "b": pa.array([3, 2, 1, 7], pa.int64()),
        }
    )
    out = connected_components(pairs)
    got = {d: c for d, c in zip(out["doc_id"].to_pylist(), out["cluster_id"].to_pylist())}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 7: 5}
    keeps = {d for d, k in zip(out["doc_id"].to_pylist(), out["keep"].to_pylist()) if k}
    assert keeps == {1, 5}


def test_content_and_partition_hashes_batch_boundary_independent():
    """Regression (review finding): a batch ENDING with empty strings must
    not perturb the preceding non-empty string's content hash or partition
    id — hashes are per-value, never batch-composition-dependent."""
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import _text_hashes
    from pdf_watermark_removal_otsu_inpaint_ray.sinks.exactly_once import hash_partition_ids

    alone = _text_hashes(["ab"])
    trailing = _text_hashes(["ab", ""])
    middle = _text_hashes(["", "ab", "", ""])
    assert alone[0] == trailing[0] == middle[1]
    assert _text_hashes([""])[0] == trailing[1] == middle[0] == middle[2]

    pa_alone = hash_partition_ids(pa.array(["doc-7"]), 64)
    pa_trailing = hash_partition_ids(pa.array(["doc-7", "", ""]), 64)
    pa_middle = hash_partition_ids(pa.array(["", "doc-7"]), 64)
    assert pa_alone[0] == pa_trailing[0] == pa_middle[1]
    assert hash_partition_ids(pa.array([""]), 64)[0] == pa_trailing[1]


_QR_WORDS = [
    "query", "table", "stream", "customer", "merge", "join", "line", "slow",
    "small", "group", "key", "value", "vector", "spark", "fast", "big",
    "filter", "agg", "column", "zz", "ab", "abcde", "x", "qq",
]


def _py_qr_classify(p: str) -> str:
    """Per-row pure-Python spec of the two-stage QR classifier
    (qr_detector.py:309-351 analog): overlapping contains-counts, first-A
    ordered pair, charclass range — independent of the vectorized kernels."""

    def cnt(sub):  # overlapping occurrences fully inside the window
        return sum(1 for i in range(len(p)) if p.startswith(sub, i))

    def kw():
        if cnt("spark") or cnt("fast") or cnt("big"):
            return "advertisement"
        if cnt("filter") or cnt("agg") or cnt("column"):
            return "documentation"
        return "general"

    nc = sum(1 for ch in p if "a" <= ch <= "e")
    if p.startswith(" query") or p.startswith(" table"):
        return "website"
    if p.startswith(" stream"):
        return kw()
    if cnt("customer"):
        return "contact"
    if p.startswith(" merge") or cnt("join"):
        return "email"
    if p.startswith(" line") or 7 <= nc <= 15:
        return "phone"
    if p.startswith(" slow") or p.startswith(" small"):
        return "sms"
    ia = p.find("key")
    if p.startswith(" group") or (ia >= 0 and p.find("value", ia + 3) >= 0):
        return "location"
    if cnt("vector"):
        return "calendar"
    return kw()


@given(st.lists(st.lists(st.sampled_from(_QR_WORDS), min_size=0, max_size=12),
                min_size=1, max_size=10))
@settings(max_examples=60, deadline=None)
def test_qr_classifier_matches_python_spec(word_rows):
    """The vectorized TwoStageClassifier reproduces the per-row Python spec
    on arbitrary word sequences, including spans near row end (window
    clamp), multiple rule hits (chain priority), and rows with no span."""
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.config import DEFAULT_CONFIG
    from pdf_watermark_removal_otsu_inpaint_ray.registry import get_payload_rules
    from pdf_watermark_removal_otsu_inpaint_ray.stages.motif import MotifStage

    texts = [" ".join(ws) for ws in word_rows]
    t = pa.table(
        {
            "doc_id": pa.array([str(i) for i in range(len(texts))], pa.string()),
            "tokens": pa.array(
                [[ord(c) for c in x] for x in texts], pa.list_(pa.int32())
            ),
            "source": pa.array(["s"] * len(texts), pa.string()),
        }
    )
    st_ = MotifStage(
        [("website", tuple(ord(c) for c in "spark"))],
        DEFAULT_CONFIG,
        payload_rules=get_payload_rules("qr"),
    )
    out = st_(t)
    got = dict(zip(out["doc_id"].to_pylist(), out["payload_class"].to_pylist()))
    exp = {}
    for i, text in enumerate(texts):
        j = text.find("spark")
        if j >= 0:
            exp[str(i)] = _py_qr_classify(text[j + 5 : j + 5 + 24])
    assert got == exp


def test_empty_docs_never_near_dup(ray_session):
    """Regression (review finding, reproduced): empty/whitespace-only docs
    all share the zero MinHash/SimHash signature — without the empty-doc
    filter E of them explode into E(E-1)/2 'duplicate' pairs (jacc 1.0).
    They must produce NO pairs, and real dups must still be found."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        jaccard,
        minhash_lsh_dedup,
        simhash_dedup,
    )

    assert jaccard(np.zeros(0, np.int64), np.zeros(0, np.int64)) == 0.0

    dup = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [""] * 8 + ["   "] * 4 + [dup, dup] + ["completely different words here now ok"]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(["s"] * len(texts)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    mh = minhash_lsh_dedup(ds, threshold=0.5)
    pairs = set(zip(mh["a"].to_pylist(), mh["b"].to_pylist()))
    assert pairs == {(12, 13)}  # only the genuine duplicate pair
    sh = simhash_dedup(ray.data.from_arrow(t).repartition(2), max_hamming=3)
    spairs = set(zip(sh["a"].to_pylist(), sh["b"].to_pylist()))
    assert spairs == {(12, 13)}


@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=192, max_size=192),
    st.integers(min_value=8, max_value=16),
)
@settings(max_examples=40, deadline=None)
def test_phash64_stable_under_exact_duplicate_and_brightness_invariants(flat, w):
    """phash64 properties: (a) exact duplicate pixels → identical hash;
    (b) a constant-shift image (all pixels += c, clamped away) keeps the
    same above-average pattern → identical hash; (c) the all-equal image
    hashes to 0 (no cell is STRICTLY above average)."""
    import numpy as np

    from pdf_watermark_removal_otsu_inpaint_ray.functions.multimodal import phash64

    h = 192 // w // 3 * 1  # keep a (h, w, 3) shape from the flat pool
    n = h * w * 3
    if h < 1:
        return
    arr = np.asarray(flat[:n], np.uint8).reshape(h, w, 3)
    assert phash64(arr) == phash64(arr.copy())
    # constant shift without clamping preserves strict above-average bits
    if int(arr.max()) <= 205:
        shifted = (arr.astype(np.int64) + 50).astype(np.uint8)
        assert phash64(arr) == phash64(shifted)
    flat_img = np.full((h, w, 3), 7, np.uint8)
    assert phash64(flat_img) == 0


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # key
            st.integers(min_value=0, max_value=30),  # ts
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_latest_rows_idempotent_and_matches_dict_fold(rows):
    """_latest_rows (the grouped_latest kernel): idempotent, and equal to
    the obvious dict fold over (ts, seq)-max per key."""
    import numpy as np
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.functions.packing import _latest_rows

    tbl = pa.table(
        {
            "user_id": pa.array([k for k, _ in rows], pa.int64()),
            "ts_us": pa.array([t for _, t in rows], pa.int64()),
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
        }
    )
    once = _latest_rows(tbl, "user_id", "ts_us", "event_id")
    twice = _latest_rows(once, "user_id", "ts_us", "event_id")
    assert once.sort_by("user_id").equals(twice.sort_by("user_id"))
    best = {}
    for i, (k, t) in enumerate(rows):
        if k not in best or (t, i) > best[k][:2]:
            best[k] = (t, i)
    got = {
        (k, t, e)
        for k, t, e in zip(
            once["user_id"].to_pylist(),
            once["ts_us"].to_pylist(),
            once["event_id"].to_pylist(),
        )
    }
    assert got == {(k, t, i) for k, (t, i) in best.items()}


# --- third-resume kernels: banded multi-partner DP & Count-Min -----------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="abcd", max_size=40),
    st.lists(st.text(alphabet="abcd", max_size=50), min_size=1, max_size=6),
    st.integers(min_value=0, max_value=12),
)
def test_lev_capped_many_property(left, partners, tau):
    from pdf_watermark_removal_otsu_inpaint_ray.functions.fuzzy import (
        _codepoints,
        _lev_capped_many,
    )

    def ref(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[len(b)]

    got = _lev_capped_many(_codepoints(left), [_codepoints(p) for p in partners], tau)
    for p, d in zip(partners, got):
        r = ref(left, p)
        if r <= tau:
            assert d == r
        else:
            assert d == tau + 1


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="xyz ", min_size=1, max_size=30), min_size=1, max_size=20))
def test_cms_partials_one_sided_property(texts):
    import numpy as np
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.functions.sketch import (
        CMS_D,
        CMS_W,
        _cms_indices,
        cms_partial_batch,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        _word_hashes_flat,
    )

    batch = pa.table({"text": pa.array(texts, pa.string())})
    sk = np.asarray(
        cms_partial_batch(batch)["sketch"][0].as_py(), np.int64
    ).reshape(CMS_D, CMS_W)
    # every word's estimate >= its true count; sketch total == word total
    from collections import Counter

    truth = Counter(w for t in texts for w in t.lower().split())
    n = sum(truth.values())
    assert sk.sum() == n * CMS_D
    for w, c in truth.items():
        h, _ = _word_hashes_flat([w])
        idx = _cms_indices(h)
        est = min(int(sk[r, idx[r, 0]]) for r in range(CMS_D))
        assert est >= c


def test_connected_components_distributed_matches_union_find(ray_session):
    """The label-propagation scale path must produce exactly the driver
    union-find's (doc_id, cluster_id, keep) on random graphs — chains
    (multi-round propagation), cliques, isolated pairs — and converge,
    not just stop."""
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.functions.dedup import (
        connected_components,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.functions.graph import (
        connected_components_distributed,
    )

    import pandas as pd
    import ray.data

    rng = np.random.default_rng(55)
    # long chains force > 1 propagation round; random extra edges add
    # merges between chains; sparse ids exercise the hash partitioning
    ids = rng.choice(np.arange(0, 100_000), size=120, replace=False)
    a_parts, b_parts = [], []
    for c in range(6):  # 6 chains of 20
        chain = ids[c * 20 : (c + 1) * 20]
        a_parts.append(chain[:-1])
        b_parts.append(chain[1:])
    extra = rng.choice(ids, size=(7, 2), replace=True)
    a = np.concatenate(a_parts + [extra[:, 0]])
    b = np.concatenate(b_parts + [extra[:, 1]])
    keep = a != b
    pairs = pa.table(
        {"a": pa.array(a[keep], pa.int64()), "b": pa.array(b[keep], pa.int64())}
    )
    exp = connected_components(pairs).to_pandas().sort_values("doc_id", ignore_index=True)
    got = (
        connected_components_distributed(
            ray.data.from_arrow(pairs).repartition(5), num_parts=7
        )
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_connected_components_distributed_empty(ray_session):
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.functions.graph import (
        connected_components_distributed,
    )

    import ray.data

    pairs = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out = connected_components_distributed(ray.data.from_arrow(pairs))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "cluster_id", "keep"]


def test_triangle_stats_matches_brute(ray_session):
    """Degree-ordered distributed triangle counting == brute adjacency
    intersection on a random graph (plus the degree closed forms)."""
    import pyarrow as pa
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.graph import (
        triangle_stats,
    )

    rng = np.random.default_rng(2)
    edges = set()
    while len(edges) < 300:
        u, v = (int(x) for x in rng.integers(0, 70, 2))
        if u != v:
            edges.add((min(u, v), max(u, v)))
    E = sorted(edges)
    adj = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(1 for a, b in E for c in adj[a] & adj[b] if c > b)
    wed = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())

    tbl = pa.table(
        {
            "a": pa.array([a for a, _ in E], pa.int64()),
            "b": pa.array([b for _, b in E], pa.int64()),
        }
    )
    out = triangle_stats(
        ray.data.from_arrow(tbl).repartition(4), num_parts=8
    ).to_pandas()
    assert out.iloc[0].to_dict() == {
        "n_edges": len(E),
        "n_wedges": wed,
        "n_triangles": tri,
    }


def test_triangle_stats_known_shapes(ray_session):
    """K4 has 4 triangles; a star has none (wedges but no closures)."""
    import pyarrow as pa
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.graph import (
        triangle_stats,
    )

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    star = [(0, k) for k in range(1, 6)]
    for E, want_tri, want_wed in ((k4, 4, 12), (star, 0, 10)):
        tbl = pa.table(
            {
                "a": pa.array([a for a, _ in E], pa.int64()),
                "b": pa.array([b for _, b in E], pa.int64()),
            }
        )
        out = triangle_stats(ray.data.from_arrow(tbl), num_parts=4).to_pandas()
        row = out.iloc[0].to_dict()
        assert row["n_triangles"] == want_tri
        assert row["n_wedges"] == want_wed
        assert row["n_edges"] == len(E)


def test_triangle_support_hist_matches_brute(ray_session):
    """Two-pass per-edge support distribution == brute adjacency count
    (every triangle credits all three of its edges; support-0 backfill)."""
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.graph import (
        triangle_support_hist,
    )

    rng = np.random.default_rng(6)
    edges = set()
    while len(edges) < 260:
        u, v = (int(x) for x in rng.integers(0, 55, 2))
        if u != v:
            edges.add((min(u, v), max(u, v)))
    E = sorted(edges)
    adj = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sup = Counter({e: 0 for e in E})
    for a, b in E:
        for c in adj[a] & adj[b]:
            if c > b:
                for e in ((a, b), tuple(sorted((a, c))), tuple(sorted((b, c)))):
                    sup[e] += 1
    want = dict(Counter(sup.values()))
    tbl = pa.table(
        {
            "a": pa.array([a for a, _ in E], pa.int64()),
            "b": pa.array([b for _, b in E], pa.int64()),
        }
    )
    out = triangle_support_hist(
        ray.data.from_arrow(tbl).repartition(4), num_parts=8
    ).to_pandas()
    got = {int(r.support): int(r.n_edges) for _, r in out.iterrows()}
    assert got == want
    # a triangle-free star: single support-0 bucket
    star = pa.table(
        {
            "a": pa.array([0] * 5, pa.int64()),
            "b": pa.array(list(range(1, 6)), pa.int64()),
        }
    )
    o2 = triangle_support_hist(ray.data.from_arrow(star), num_parts=4).to_pandas()
    assert {int(r.support): int(r.n_edges) for _, r in o2.iterrows()} == {0: 5}
