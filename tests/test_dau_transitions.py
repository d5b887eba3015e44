"""Exact distinct-per-group and event-transition mining."""

import datetime as dt

import pandas as pd
import ray.data

from kgray.ops.stats import exact_distinct_per_group
from kgray.ops.temporal import event_transitions


def test_exact_distinct_dedups_across_batches(ray_session):
    rows = [{"g": "a", "u": i % 3} for i in range(20)] + [
        {"g": "b", "u": 7},
        {"g": "b", "u": 7},
    ]
    out = (
        exact_distinct_per_group(ray.data.from_items(rows).repartition(5), "g", "u")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert dict(zip(out["g"], out["n_distinct"])) == {"a": 3, "b": 1}


def _ev(eid, uid, t, typ):
    return {
        "event_id": eid,
        "user_id": uid,
        "ts": dt.datetime(2024, 1, 1) + dt.timedelta(minutes=t),
        "event_type": typ,
    }


def test_transitions_ordered_per_user(ray_session):
    rows = [
        _ev(0, 1, 0, "view"),
        _ev(1, 1, 5, "cart"),
        _ev(2, 1, 9, "buy"),
        _ev(3, 2, 0, "view"),
        _ev(4, 2, 1, "view"),
    ]
    out = event_transitions(ray.data.from_items(rows))
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    assert got == {("view", "cart"): 1, ("cart", "buy"): 1, ("view", "view"): 1}


def test_transitions_no_cross_user_pair(ray_session):
    rows = [_ev(0, 1, 0, "a"), _ev(1, 2, 1, "b")]
    out = event_transitions(ray.data.from_items(rows))
    assert len(out) == 0


def test_transitions_tie_broken_by_event_id(ray_session):
    rows = [_ev(1, 1, 0, "second"), _ev(0, 1, 0, "first")]  # same ts
    out = event_transitions(ray.data.from_items(rows))
    assert out.iloc[0]["prev_type"] == "first" and out.iloc[0]["next_type"] == "second"


def test_transitions_partition_invariant(ray_session):
    rows = [_ev(i, i % 5, i, f"t{i % 3}") for i in range(60)]
    a = event_transitions(ray.data.from_items(rows))
    b = event_transitions(ray.data.from_items(rows).repartition(9))
    pd.testing.assert_frame_equal(a, b)
