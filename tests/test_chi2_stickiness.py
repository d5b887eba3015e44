"""Pins for contingency_chi2, stickiness_ratio, degree_assortativity."""

import numpy as np
import pandas as pd
import ray.data

from kgray.functions.graph import degree_assortativity
from kgray.ops.stats import contingency_chi2, stickiness_ratio


def test_chi2_independent_grid_zero(ray_session):
    # perfectly proportional table -> chi2 == 0
    rows = []
    for r in (0, 1):
        for c in ("a", "b"):
            rows.extend([{"r": r, "c": c}] * 10)
    out = contingency_chi2(ray.data.from_pandas(pd.DataFrame(rows)), "r", "c")
    assert out["chi2"].iloc[0] == 0.0
    assert out["dof"].iloc[0] == 1
    assert out["n"].iloc[0] == 40


def test_chi2_perfect_association(ray_session):
    # diagonal table: chi2 == n for a 2x2 perfect association
    rows = [{"r": 0, "c": "a"}] * 10 + [{"r": 1, "c": "b"}] * 10
    out = contingency_chi2(ray.data.from_pandas(pd.DataFrame(rows)), "r", "c")
    assert abs(out["chi2"].iloc[0] - 20.0) < 1e-5


def test_stickiness_single_day_is_one(ray_session):
    days = ray.data.from_pandas(
        pd.DataFrame({"day": ["2024-01-01"] * 3, "user_id": [1, 2, 3]})
    )
    out = stickiness_ratio(days)
    assert len(out) == 1
    assert out["dau"].iloc[0] == 3
    assert out["wau"].iloc[0] == 3
    assert out["stickiness"].iloc[0] == 1.0


def test_stickiness_window_dilutes(ray_session):
    days = ray.data.from_pandas(
        pd.DataFrame(
            {
                "day": ["2024-01-01", "2024-01-02", "2024-01-02"],
                "user_id": [1, 2, 3],
            }
        )
    )
    out = stickiness_ratio(days)
    d2 = out[out["day"] == "2024-01-02"].iloc[0]
    assert d2["dau"] == 2 and d2["wau"] == 3
    assert abs(d2["stickiness"] - 0.666667) < 1e-6


def test_assortativity_star_is_negative(ray_session):
    # star graph: hub connects to leaves -> disassortative
    edges = pd.DataFrame(
        {
            "subj_name": ["hub"] * 5,
            "obj_name": [f"leaf{i}" for i in range(5)],
        }
    )
    out = degree_assortativity(ray.data.from_pandas(edges))
    # all x=5, y=1: zero variance on each side -> den2 == 0 -> 0.0 sentinel
    assert out["assortativity"].iloc[0] == 0.0
    # mixed star + path: genuinely negative
    edges2 = pd.concat(
        [edges, pd.DataFrame({"subj_name": ["leaf0"], "obj_name": ["leaf1"]})],
        ignore_index=True,
    )
    out2 = degree_assortativity(ray.data.from_pandas(edges2))
    assert out2["assortativity"].iloc[0] < 0
    assert out2["n_edges"].iloc[0] == 6


def test_weekday_profile_cosine(ray_session):
    from kgray.ops.stats import weekday_profile_cosine

    rows = []
    # type a and b both Monday-only (parallel); type c Friday-only (orthogonal)
    for t, day in (("a", 5), ("b", 5), ("c", 2)):  # 2024-01-05 Fri? pick distinct dows
        for i in range(4):
            rows.append({"event_type": t, "ts": f"2024-01-{day:02d} 10:00:00"})
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    out = weekday_profile_cosine(ray.data.from_pandas(df))
    m = {(a, b): c for a, b, c in zip(out["type_a"], out["type_b"], out["cosine"])}
    assert abs(m[("a", "b")] - 1.0) < 1e-6
    assert abs(m[("a", "c")]) < 1e-6
