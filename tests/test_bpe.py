"""BPE train/encode (functions/bpe.py): same-symbol-run counting, rank
encode vs sequential replay equivalence, memoized actor stage."""

import numpy as np
import pyarrow as pa

from pdf_watermark_removal_otsu_inpaint_ray.functions.bpe import (
    _merge_word,
    bpe_train,
    encode_len,
)


def test_merge_word_greedy_left_to_right():
    assert _merge_word(tuple("aaa"), "a", "a") == ("aa", "a")
    assert _merge_word(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert _merge_word(tuple("xaay"), "a", "a") == ("x", "aa", "y")
    assert _merge_word(("ab", "c", "ab"), "ab", "c") == ("abc", "ab")


def test_train_run_counting_and_tiebreak():
    # "aaa"×2: (a,a) counts 2 (one greedy occurrence per word), not 4
    merges = bpe_train([("aaa", 2)], 1)
    assert merges == [("a", "a")]
    # tie between ("ab","ba"→ wait) — construct an exact tie: "ab"×3 and
    # "cd"×3; highest count tied at 3 → lexicographically smallest pair
    merges = bpe_train([("ab", 3), ("cd", 3)], 1)
    assert merges == [("a", "b")]


def test_encode_equals_sequential_replay():
    # adversarial: repeated-symbol runs + merges that create new contexts
    vocab = [("aaabab", 5), ("abab", 3), ("bbb", 2), ("aabb", 1)]
    merges = bpe_train(vocab, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in vocab:
        sym = tuple(w)
        for a, b in merges:  # sequential replay in training order
            sym = _merge_word(sym, a, b)
        assert encode_len(w, ranks) == len(sym), (w, merges)


def test_encode_unknown_symbols_fall_through():
    ranks = {("a", "b"): 0}
    assert encode_len("zzz", ranks) == 3
    assert encode_len("ab", ranks) == 1
    assert encode_len("", ranks) == 0


def test_bpe_stage_counts_and_memo(ray_session):
    import ray
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.functions.bpe import (
        bpe_token_counts,
        word_freq,
    )

    texts = ["aa ab aa", "ab ab zz", "", "aa"]
    tbl = pa.table(
        {"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    wf = word_freq(ds)
    assert wf == [("aa", 3), ("ab", 3), ("zz", 1)]
    out = (
        bpe_token_counts(ds, ray.data.from_arrow(tbl), n_merges=2)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # round 1: (a,a)=3 ties (a,b)=3 → lexicographically smaller ("a","a")
    # merges first; round 2: ("a","b") — so "aa" and "ab" are ONE token
    # each while "zz" stays 2 (never merged within 2 rounds)
    assert out["n_words"].tolist() == [3, 3, 0, 1]
    assert out["n_bpe"].tolist() == [3, 4, 0, 1]
