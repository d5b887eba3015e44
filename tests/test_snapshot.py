"""Temporal-KG snapshot filter (kgray/ops/temporal.py valid_at)."""

import pandas as pd
import ray.data

from kgray.functions.timeparse import parse_timestamp
from kgray.ops.temporal import valid_at

T = parse_timestamp("2020-06-01")
EARLY = parse_timestamp("2020-01-15")
LATE = parse_timestamp("2021-03-01")


def _run(rows):
    ds = ray.data.from_items(rows)
    return (
        valid_at(ds, T)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )


def test_list_boundaries_cover_snapshot(ray_session):
    rows = [
        {"rid": 0, "t_start": [], "t_end": []},             # atemporal: kept
        {"rid": 1, "t_start": [EARLY], "t_end": []},        # started before: kept
        {"rid": 2, "t_start": [LATE], "t_end": []},         # starts after: dropped
        {"rid": 3, "t_start": [], "t_end": [LATE]},         # ends after: kept
        {"rid": 4, "t_start": [], "t_end": [EARLY]},        # ended before: dropped
        {"rid": 5, "t_start": [EARLY], "t_end": [LATE]},    # covers: kept
    ]
    out = _run(rows)
    assert out["rid"].tolist() == [0, 1, 3, 5]


def test_exact_boundary_is_inclusive(ray_session):
    rows = [
        {"rid": 0, "t_start": [T], "t_end": []},
        {"rid": 1, "t_start": [], "t_end": [T]},
    ]
    out = _run(rows)
    assert out["rid"].tolist() == [0, 1]


def test_scalar_float_columns_also_work(ray_session):
    rows = [
        {"rid": 0, "t_start": EARLY, "t_end": float("nan")},
        {"rid": 1, "t_start": LATE, "t_end": float("nan")},
    ]
    out = _run(rows)
    assert out["rid"].tolist() == [0]
