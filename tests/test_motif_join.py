"""Motif CEP + span-event join (J1/J3, FIXTURES.md fixture 5): span events
carry category/position, the removal set filters them, joined spans are
padded, force-flagged past protection, and inpainted; golden equality for
the full pipeline with motifs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_watermark_removal_otsu_inpaint_ray import golden, synth
from pdf_watermark_removal_otsu_inpaint_ray.config import DEFAULT_CONFIG
from pdf_watermark_removal_otsu_inpaint_ray.stages.kernels import flatten_list_column
from pdf_watermark_removal_otsu_inpaint_ray.stages.motif import MotifStage, category_filter, find_pattern_flat


def motif_list():
    return [
        (cat, tuple(synth.MOTIF_PREFIX) + (400 + i, 4))
        for i, cat in enumerate(synth.MOTIF_CATEGORIES)
    ]


@pytest.fixture(scope="module")
def stream_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("motifs") / "seq.parquet"
    synth.write_stream(
        str(p), 400, n_sources=3, n_tok_lo=64, n_tok_hi=200, plant_motifs=True
    )
    return str(p)


def test_find_pattern_respects_row_boundaries():
    col = pa.array([[1, 2, 3], [3, 1, 2], [2, 3, 1]], pa.list_(pa.int32()))
    fb = flatten_list_column(col)
    # pattern [2,3] occurs in row0 at 1, row2 at 0; the (row1 end, row2 start)
    # adjacency 2|2,3 must not match across the boundary
    starts = find_pattern_flat(fb, np.array([2, 3], dtype=np.int32))
    assert starts.tolist() == [1, 6]


def test_motif_stage_finds_planted_motifs(ray_session, stream_path):
    table = pq.read_table(stream_path)
    stage = MotifStage(motif_list(), DEFAULT_CONFIG)
    events = stage(table)
    assert events.num_rows > 0
    # every planted row (gi % 13 == 0) has exactly one event with the right category
    for i in range(events.num_rows):
        d = events["doc_id"][i].as_py()
        gi = int(d.split("doc")[1])
        assert gi % 13 == 0
        assert events["category"][i].as_py() == synth.MOTIF_CATEGORIES[gi % 5]
    planted = sum(1 for d in table["doc_id"].to_pylist() if int(d.split("doc")[1]) % 13 == 0)
    assert events.num_rows == planted


def test_category_semifilter_default_removal_set():
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
            "category": pa.array(
                ["website", "documentation", "advertisement", "general"], pa.string()
            ),
        }
    )
    out = category_filter(t, DEFAULT_CONFIG.removal_categories)
    assert out["doc_id"].to_pylist() == ["a", "c"]


def test_full_pipeline_with_motifs_matches_golden(ray_session, stream_path):
    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.full import run_full_pipeline
    from pdf_watermark_removal_otsu_inpaint_ray.sources import read_sequences
    from pdf_watermark_removal_otsu_inpaint_ray.stages.join import spans_to_ranges_table

    cfg = DEFAULT_CONFIG.with_(window_kind="tumbling", window_size=32)
    table = pq.read_table(stream_path)

    # golden: derive events with the same stage (deterministic), then oracle
    events = MotifStage(motif_list(), cfg)(table)
    removable = category_filter(events, cfg.removal_categories)
    ranges = spans_to_ranges_table(removable, cfg.motif_pad)
    expected = golden.golden_pipeline(
        table, cfg,
        motif_rows=set(removable["doc_id"].to_pylist()),
        motif_ranges=ranges,
    ).sort_by("doc_id")

    out_ds, got_events = run_full_pipeline(read_sequences(stream_path), motif_list(), cfg)
    got = pa.concat_tables(
        [pa.table(b) for b in out_ds.iter_batches(batch_format="pyarrow")]
    ).sort_by("doc_id")
    assert got_events.sort_by("doc_id").equals(events.sort_by("doc_id"))
    assert got["doc_id"].to_pylist() == expected["doc_id"].to_pylist()
    assert got["tokens"].to_pylist() == expected["tokens"].to_pylist()
    # forced spans actually rewrote motif rows
    motif_ids = set(removable["doc_id"].to_pylist())
    orig = {d: t for d, t in zip(table["doc_id"].to_pylist(), table["tokens"].to_pylist())}
    changed = sum(
        1 for d, t in zip(got["doc_id"].to_pylist(), got["tokens"].to_pylist())
        if d in motif_ids and t != orig[d]
    )
    assert changed > 0


def test_hash_join_events_documents(ray_session, stream_path):
    import ray.data

    from pdf_watermark_removal_otsu_inpaint_ray.pipelines.full import detect_motif_events
    from pdf_watermark_removal_otsu_inpaint_ray.sources import read_sequences
    from pdf_watermark_removal_otsu_inpaint_ray.stages.join import hash_join_events_documents

    cfg = DEFAULT_CONFIG
    docs = read_sequences(stream_path).select_columns(["doc_id", "n_tok", "source"])
    events = detect_motif_events(read_sequences(stream_path), motif_list(), cfg)
    joined = hash_join_events_documents(docs, events, num_buckets=4).to_pandas()
    table = pq.read_table(stream_path)
    exp_events = MotifStage(motif_list(), cfg)(table)
    assert len(joined) == exp_events.num_rows
    assert set(joined["doc_id"]) == set(exp_events["doc_id"].to_pylist())
    assert "span_start" in joined.columns and "category" in joined.columns


def test_payload_classification_rules_and_registry(ray_session):
    """Payload classifier: each rule kind fires correctly on crafted rows
    (prefix / count_min / ordered_pair / fallback), priority order wins,
    and custom rule tables plug in through the registry."""
    import numpy as np
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.registry import (
        get_payload_rules,
        register_payload_rules,
    )
    from pdf_watermark_removal_otsu_inpaint_ray.stages.motif import (
        MotifStage,
        PayloadRule,
    )

    texts = [
        "xx spark scan more words here",      # prefix ' scan' -> scan_link
        "xx spark window agg",                # prefix ' window' -> windowed
        "xx spark row and row again",         # 2x 'row' -> tabular
        "xx spark key then value later",      # ordered key..value -> keyed_pair
        "xx spark value then key later",      # wrong order -> plain
        "xx spark nothing special",           # -> plain
        "xx spark scan row row",              # prefix beats count (priority)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))], pa.string()),
            "tokens": pa.array(
                [[ord(c) for c in x] for x in texts], pa.list_(pa.int32())
            ),
            "source": pa.array(["s"] * len(texts), pa.string()),
        }
    )
    motifs = [("website", tuple(ord(c) for c in "spark"))]
    st = MotifStage(motifs, DEFAULT_CONFIG, payload_rules=get_payload_rules("default"))
    out = st(t)
    got = dict(zip(out["doc_id"].to_pylist(), out["payload_class"].to_pylist()))
    assert got == {
        "d0": "scan_link", "d1": "windowed", "d2": "tabular",
        "d3": "keyed_pair", "d4": "plain", "d5": "plain", "d6": "scan_link",
    }

    # custom registered table: single rule, everything else plain
    register_payload_rules("only_agg", [PayloadRule("agg_like", "count_min", ("agg",))])
    st2 = MotifStage(motifs, DEFAULT_CONFIG, payload_rules=get_payload_rules("only_agg"))
    got2 = dict(zip(st2(t)["doc_id"].to_pylist(), st2(t)["payload_class"].to_pylist()))
    assert got2["d1"] == "agg_like" and got2["d0"] == "plain"

    # window clamp: payload truncated at row end never matches past-end text
    t3 = pa.table(
        {
            "doc_id": pa.array(["e0"], pa.string()),
            "tokens": pa.array([[ord(c) for c in "xx spark sca"]], pa.list_(pa.int32())),
            "source": pa.array(["s"], pa.string()),
        }
    )
    assert st(t3)["payload_class"].to_pylist() == ["plain"]


def test_qr_two_stage_classifier(ray_session):
    """QR-breadth classifier (qr_detector.py:309-351 analog): type chain
    priority, OR'd predicates, the charclass count-range rule, and the
    wifi fall-through quirk (a wifi-typed payload is keyword-classified,
    NOT matched by later type rules)."""
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.registry import get_payload_rules
    from pdf_watermark_removal_otsu_inpaint_ray.stages.motif import (
        MotifStage,
        PayloadRule,
        TwoStageClassifier,
    )

    texts = [
        "xx spark query join more",        # url prefix wins over '@'-contains
        "xx spark table xyz",              # second url prefix (www. analog)
        "xx spark stream join spark",      # wifi quirk: NOT email; ad keyword
        "xx spark stream join zz",         # wifi quirk, no keyword -> general
        "xx spark zz customer zz",         # VCARD-anywhere -> contact
        "xx spark merge zz",               # mailto: prefix -> email
        "xx spark zz join zz",             # '@'-anywhere -> email
        "xx spark line zz",                # tel: prefix -> phone
        "xx spark zz vector zz",           # VEVENT-anywhere -> calendar
        "xx spark zz filter zz",           # doc keyword via text type
        "xx spark zz zz zz zz",            # nothing -> general
    ]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))], pa.string()),
            "tokens": pa.array(
                [[ord(c) for c in x] for x in texts], pa.list_(pa.int32())
            ),
            "source": pa.array(["s"] * len(texts), pa.string()),
        }
    )
    motifs = [("website", tuple(ord(c) for c in "spark"))]
    qr = get_payload_rules("qr")
    assert isinstance(qr, TwoStageClassifier)
    st = MotifStage(motifs, DEFAULT_CONFIG, payload_rules=qr)
    out = st(t)
    got = dict(zip(out["doc_id"].to_pylist(), out["payload_class"].to_pylist()))
    assert got == {
        "d0": "website", "d1": "website", "d2": "advertisement",
        "d3": "general", "d4": "contact", "d5": "email", "d6": "email",
        "d7": "phone", "d8": "calendar", "d9": "documentation",
        "d10": "general",
    }

    # charclass_range boundaries: count of [a-e] chars in the 24-token
    # window must land inside [min,max] (the 7..15-digit tel: rule shape)
    rules = [PayloadRule("hit", "charclass_range", (), min_count=3, max_count=4,
                         cls=("a", "e"))]
    st2 = MotifStage(motifs, DEFAULT_CONFIG, payload_rules=rules)
    t2 = pa.table(
        {
            "doc_id": pa.array(["lo", "in", "hi"], pa.string()),
            "tokens": pa.array(
                [
                    [ord(c) for c in "zz spark zz ab zz"],       # 2 -> plain
                    [ord(c) for c in "zz spark zz abc zz"],      # 3 -> hit
                    [ord(c) for c in "zz spark abcde zz"],       # 5 -> plain
                ],
                pa.list_(pa.int32()),
            ),
            "source": pa.array(["s"] * 3, pa.string()),
        }
    )
    got2 = dict(zip(st2(t2)["doc_id"].to_pylist(), st2(t2)["payload_class"].to_pylist()))
    assert got2 == {"lo": "plain", "in": "hit", "hi": "plain"}

    # construction-time validation
    import pytest

    with pytest.raises(ValueError):
        PayloadRule("x", "charclass_range", ())  # missing cls
    with pytest.raises(ValueError):
        PayloadRule("x", "charclass_range", (), cls=("e", "a"))  # lo > hi


def test_motif_matcher_backends_agree():
    """The rolling-hash matcher backend returns the identical start set as
    the shifted-AND exact matcher (self-overlapping patterns, row-boundary
    straddles, empty rows), and plugs in through the registry by name."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdf_watermark_removal_otsu_inpaint_ray.registry import get_motif_matcher
    from pdf_watermark_removal_otsu_inpaint_ray.stages.kernels import flatten_list_column
    from pdf_watermark_removal_otsu_inpaint_ray.stages.motif import (
        MotifStage,
        find_pattern_flat,
        find_pattern_rolling,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        rows=st.lists(
            st.lists(st.integers(0, 3), min_size=0, max_size=30), min_size=1, max_size=8
        ),
        pat=st.lists(st.integers(0, 3), min_size=1, max_size=5),
    )
    def check(rows, pat):
        t = pa.table({"tokens": pa.array(rows, pa.list_(pa.int32()))})
        fb = flatten_list_column(t["tokens"])
        p = np.asarray(pat, dtype=np.int32)
        a = find_pattern_flat(fb, p)
        b = find_pattern_rolling(fb, p)
        assert a.tolist() == b.tolist()

    check()

    # registry dispatch: MotifStage(matcher="rolling-hash") == default
    texts = ["ab spark cd", "spark", "no match", "sparkspark"]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))], pa.string()),
            "tokens": pa.array([[ord(c) for c in x] for x in texts], pa.list_(pa.int32())),
            "source": pa.array(["s"] * len(texts), pa.string()),
        }
    )
    motifs = [("website", tuple(ord(c) for c in "spark"))]
    e = MotifStage(motifs, DEFAULT_CONFIG)(t)
    r = MotifStage(motifs, DEFAULT_CONFIG, matcher="rolling-hash")(t)
    assert e.equals(r)


def test_payload_rule_rejects_unconsulted_params():
    """Construction-time validation: params a kind never reads must raise
    (silent-misclassification guard), and the registry rejects objects that
    are neither rule lists nor classifiers."""
    import pytest as _pytest

    from pdf_watermark_removal_otsu_inpaint_ray.registry import register_payload_rules
    from pdf_watermark_removal_otsu_inpaint_ray.stages.motif import PayloadRule

    with _pytest.raises(ValueError):
        PayloadRule("x", "prefix", (" tel",), min_count=2)
    with _pytest.raises(ValueError):
        PayloadRule("x", "ordered_pair", ("a", "b"), max_count=1)
    with _pytest.raises(ValueError):
        PayloadRule("x", "count_min", ("a",), cls=("0", "9"))
    with _pytest.raises(TypeError):
        register_payload_rules("bogus", object())


def test_payload_classifier_protocol_dispatch():
    """ANY object exposing .classify(...) dispatches as a classifier in
    MotifStage — not just the built-in TwoStageClassifier."""
    import numpy as np
    import pyarrow as pa

    from pdf_watermark_removal_otsu_inpaint_ray.registry import register_payload_rules
    from pdf_watermark_removal_otsu_inpaint_ray.stages.motif import MotifStage

    class Fixed:
        def classify(self, fb, starts, lens, window):
            return np.array(["custom"] * starts.size, dtype=object)

    register_payload_rules("fixed", Fixed())
    t = pa.table(
        {
            "doc_id": pa.array(["d0"], pa.string()),
            "tokens": pa.array([[ord(c) for c in "xx spark yy"]], pa.list_(pa.int32())),
            "source": pa.array(["s"], pa.string()),
        }
    )
    motifs = [("website", tuple(ord(c) for c in "spark"))]
    st = MotifStage(motifs, DEFAULT_CONFIG, payload_rules=Fixed())
    out = st(t)
    assert out["payload_class"].to_pylist() == ["custom"]
