"""CEP operator edge semantics (functions/cep.py): strictly-after funnel
chaining, lead-adjacency interruption, and arrival-rank tie handling.
The sf0.001 oracle equality runs in test_entry.py's mini driver."""

import numpy as np
import pyarrow as pa
import ray

from pdf_watermark_removal_otsu_inpaint_ray.functions.cep import (
    funnel,
    match_next,
    rate_limit,
)


def _ds(rows):
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts_us": pa.array([r[1] for r in rows], pa.int64()),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    return ray.data.from_arrow(tbl)


def test_funnel_strictly_after(ray_session):
    # user 1: view BEFORE signup must not count; the later view does.
    # user 2: signup only.  user 3: no step events at all -> stage 0.
    rows = [
        (1, 10, 1, "view"),
        (1, 20, 2, "signup"),
        (1, 30, 3, "view"),
        (1, 25, 4, "purchase"),  # before the counted view -> not stage 3
        (2, 5, 5, "signup"),
        (3, 7, 6, "click"),
    ]
    out = (
        funnel(_ds(rows), steps=("signup", "view", "purchase"))
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["stage"].tolist() == [2, 1, 0]
    assert out["ts_signup"].tolist() == [20, 5, -1]
    assert out["ts_view"].tolist() == [30, -1, -1]
    assert out["ts_purchase"].tolist() == [-1, -1, -1]


def test_funnel_unreached_stage_blocks_later(ray_session):
    # purchase exists but view never does: stage stops at 1 and the
    # purchase can never fire (threshold pinned at +inf for the group)
    rows = [(7, 1, 1, "signup"), (7, 2, 2, "purchase")]
    out = funnel(_ds(rows), steps=("signup", "view", "purchase")).to_pandas()
    assert out["stage"].tolist() == [1]
    assert out["ts_purchase"].tolist() == [-1]


def test_match_next_requires_adjacency(ray_session):
    # user 1: view->purchase adjacent (match); user 2: view->click->purchase
    # (interrupted, no match); user 3: adjacent but beyond max_gap
    rows = [
        (1, 100, 1, "view"),
        (1, 150, 2, "purchase"),
        (2, 100, 3, "view"),
        (2, 120, 4, "click"),
        (2, 140, 5, "purchase"),
        (3, 100, 6, "view"),
        (3, 900, 7, "purchase"),
    ]
    out = match_next(
        _ds(rows), first="view", second="purchase", max_gap=200
    ).to_pandas()
    assert out["user_id"].tolist() == [1]
    assert out["ts_first"].tolist() == [100]
    assert out["ts_second"].tolist() == [150]
    assert out["delta_us"].tolist() == [50]


def test_match_next_pair_never_spans_groups(ray_session):
    # last event of user 1 is a view; first of user 2 is a purchase —
    # group boundary must suppress the pair even in one sorted run
    rows = [(1, 10, 1, "view"), (2, 11, 2, "purchase")]
    out = match_next(_ds(rows), first="view", second="purchase").to_pandas()
    assert len(out) == 0


def test_rate_limit_arrival_rank_and_ties(ray_session):
    # user 1 window 0: four events, two sharing ts=5 -> event_id breaks the
    # tie; k=2 keeps ts=3 and the ts=5 row with the LOWER event_id
    rows = [
        (1, 3, 10, "e"),
        (1, 5, 12, "e"),
        (1, 5, 11, "e"),
        (1, 9, 13, "e"),
        (1, 105, 14, "e"),  # next window: rank restarts
    ]
    out = (
        rate_limit(_ds(rows).drop_columns(["event_type"]), window_us=100, k=2)
        .to_pandas()
        .sort_values(["window_id", "rn"], ignore_index=True)
    )
    assert out["event_id"].tolist() == [10, 11, 14]
    assert out["rn"].tolist() == [1, 2, 1]
    assert out["window_id"].tolist() == [0, 0, 1]
