"""Oracle unit tests — token-space ports of the reference's synthetic
image tests (FIXTURES.md fixtures 1-4; reference tests/test_watermark_core.py,
tests/fix_validation/test_protection_order.py)."""

import numpy as np
import pyarrow as pa

from pdf_watermark_removal_otsu_inpaint_ray import golden
from pdf_watermark_removal_otsu_inpaint_ray.config import DEFAULT_CONFIG


def row(*segments):
    return np.concatenate([np.full(n, v, dtype=np.int32) for v, n in segments])


def test_detect_wm_token_rule():
    # background 252 dominates but gray > 250 -> excluded; wm 150 at ~10% wins
    gray = row((252, 300), (150, 40), (20, 60))
    h = golden.hist_of(gray.astype(np.int64))
    wm, cov = golden.detect_wm_token(h)
    assert wm == 150
    assert abs(cov - 10.0) < 0.1


def test_detect_wm_coverage_bounds_inclusive():
    # exactly 20% coverage passes (reference: 1 <= coverage <= 20)
    h = np.zeros(256, dtype=np.int64)
    h[252] = 80
    h[150] = 20
    assert golden.detect_wm_token(h)[0] == 150
    # 25% fails
    h[150] = 30
    h[252] = 90
    assert golden.detect_wm_token(h)[0] == -1


def test_detect_topk_tiebreak_matches_argsort_reversed():
    h = np.zeros(256, dtype=np.int64)
    h[120] = 10
    h[130] = 10  # tie -> larger gray first (argsort stable, reversed)
    h[0] = 80
    assert golden.detect_wm_token(h)[0] == 130


def test_core_watermark_fixture():
    """Fixture 1: gray-200 background + gray-100 watermark span (reference
    test_watermark_core.py:12-36)."""
    tokens = row((200, 360), (100, 40))
    mask = golden.detect_mask(tokens, 100)
    assert mask.any()
    assert mask[360:400].all()
    assert not mask[:357].any()  # background never flagged (dilate can't extend: OPEN first)
    r = golden.process_row(tokens, 100)
    assert r.tokens.shape == tokens.shape and r.tokens.dtype == np.int32
    assert (r.tokens[360:] == 200).all()  # inpainted from background
    assert (r.tokens[:360] == 200).all()


def test_protect_order_fixture():
    """Fixture 2: content span inside watermark span is never flagged
    (Protect First), and a small gap is bridged by CLOSE (Refine Second).
    Port of test_protection_order.py:33-144."""
    # background 255 | wm 200 span | content 10 span inside | wm 200 | background
    tokens = row((255, 100), (200, 40), (10, 12), (200, 40), (255, 208))
    mask = golden.detect_mask(tokens, 200)
    content = slice(140, 152)
    assert not mask[content].any()  # zero flags in the text region
    # expanded protection: +-3 around content also unflagged
    assert not mask[137:155].any()
    assert mask[100:130].any() and mask[160:180].any()


def test_close_bridges_small_gap():
    # two wm spans separated by a 2-token gap of gray 240 -> CLOSE (r=1, x2) bridges
    tokens = row((252, 50), (200, 20), (240, 2), (200, 20), (252, 308))
    mask = golden.detect_mask(tokens, 200)
    assert mask[70:72].all()  # gap flagged
    r = golden.process_row(tokens, 200)
    assert (r.tokens[50:92] == 252).all()


def test_span_filter_fixture():
    """Fixture 4: spans outside [min_span, max_span] are dropped."""
    cfg = DEFAULT_CONFIG
    n = 3000
    tokens = np.full(n, 252, dtype=np.int32)
    tokens[10:12] = 150      # len 2 < min_span 3
    tokens[100:150] = 150    # len 50 -> kept
    tokens[1000:2800] = 150  # len 1800 > max_span 1000 -> dropped
    mask = golden.detect_mask(tokens, 150)
    assert not mask[10:12].any()
    assert mask[100:150].all()
    assert not mask[1000:2800].any()
    # motif override lifts max_span to n_tok (watermark_remover.py:117-141)
    mask2 = golden.detect_mask(tokens, 150, max_span=n)
    assert mask2[1000:2800].all()


def test_inpaint_nearest_tie_left():
    t = np.array([5, 7, 0, 0, 9], dtype=np.int32)
    f = np.array([False, False, True, True, False])
    out = golden.inpaint_row(t, f)
    # pos 2: dl=1 dr=2 -> left(7); pos 3: dl=2 dr=1 -> right(9)
    assert out.tolist() == [5, 7, 7, 9, 9]
    # tie -> left
    t2 = np.array([7, 0, 9], dtype=np.int32)
    f2 = np.array([False, True, False])
    assert golden.inpaint_row(t2, f2).tolist() == [7, 7, 9]
    # leading flags take right, fully flagged unchanged
    t3 = np.array([0, 0, 9], dtype=np.int32)
    f3 = np.array([True, True, False])
    assert golden.inpaint_row(t3, f3).tolist() == [9, 9, 9]
    assert golden.inpaint_row(t3, np.ones(3, bool)).tolist() == [0, 0, 9]


def test_multipass_dilates_and_stops():
    tokens = row((252, 100), (150, 30), (252, 270))
    cfg = DEFAULT_CONFIG.with_(passes=3)
    r = golden.process_row(tokens, 150, cfg)
    assert (r.tokens == 252).all()
    assert r.n_passes >= 1
    # pass 2 re-detects on inpainted row -> empty mask -> early stop
    assert r.n_passes == 1


def test_windows_tumbling_sliding_session():
    cfg = DEFAULT_CONFIG.with_(window_kind="tumbling", window_size=10)
    ts = np.array([0, 9, 10, 25], dtype=np.int64)
    assert golden.governing_window(ts, cfg).tolist() == [0, 0, 1, 2]
    cfg2 = DEFAULT_CONFIG.with_(window_kind="sliding", window_size=10, window_slide=5)
    assert golden.governing_window(ts, cfg2).tolist() == [0, 1, 2, 5]
    assert golden.contributing_windows(12, cfg2) == [1, 2]
    sess = golden.assign_session_windows(np.array([1, 2, 3, 30, 31, 60]), gap=5)
    assert sess.tolist() == [1, 1, 1, 30, 30, 60]


def _mk_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "event_ts": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def test_golden_pipeline_windowed_vs_sticky():
    cfg = DEFAULT_CONFIG.with_(window_size=10)
    wm_a = [150] * 40 + [252] * 360     # 10% coverage of 150
    none_row = [252] * 300 + [20] * 100  # no candidate (20 out of band... content)
    rows = [
        ("d0", wm_a, "s1", 0),
        ("d1", none_row, "s1", 15),   # window 1: no detection
        ("d2", wm_a, "s1", 25),       # window 2: detects again
    ]
    t = _mk_table(rows)
    wm = golden.golden_wm_table(t, cfg)
    assert wm[("s1", 0)][0] == 150
    assert wm[("s1", 1)][0] == -1
    assert wm[("s1", 2)][0] == 150
    sticky = golden.golden_wm_table(t, cfg.with_(detection_mode="sticky"))
    assert sticky[("s1", 1)][0] == 150  # first detection sticks
    out = golden.golden_pipeline(t, cfg)
    assert out["doc_id"].to_pylist() == ["d0", "d1", "d2"]
    assert out["tokens"][1].as_py() == none_row  # passthrough row unchanged
    assert (np.asarray(out["tokens"][0].as_py()) == 252).all()
