"""Pins for linear_attribution and error_rate_control_chart."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.temporal import error_rate_control_chart, linear_attribution


def _events(rows):
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return ray.data.from_pandas(df)


def test_linear_attribution_splits_credit(ray_session):
    rows = [
        {"user_id": 1, "event_type": "click", "ts": "2024-01-01 10:00:00"},
        {"user_id": 1, "event_type": "click", "ts": "2024-01-02 10:00:00"},
        {"user_id": 1, "event_type": "purchase", "ts": "2024-01-03 10:00:00"},
        # stale click outside the 7d window of the purchase
        {"user_id": 2, "event_type": "click", "ts": "2023-12-01 10:00:00"},
        {"user_id": 2, "event_type": "purchase", "ts": "2024-01-03 10:00:00"},
    ]
    out = linear_attribution(_events(rows))
    m = dict(zip(out["day"], out["credit"]))
    # the two in-window clicks split one conversion 50/50
    assert len(m) == 2
    assert all(abs(v - 0.5) < 1e-6 for v in m.values())


def test_pchart_flags_spike_day(ray_session):
    rows = []
    for day in range(1, 11):
        for i in range(50):
            # day 10: half errors; other days: 1 error in 50
            et = "error" if (day == 10 and i < 25) or (day != 10 and i == 0) else "view"
            rows.append({"event_type": et, "ts": f"2024-01-{day:02d} {i % 24:02d}:00:00"})
    out = error_rate_control_chart(_events(rows))
    flagged = out[out["flagged"] == 1]
    assert len(flagged) == 1
    assert flagged["n_errors"].iloc[0] == 25


def test_streaks_gaps_and_islands(ray_session):
    from kgray.ops.temporal import activity_streaks

    rows = []
    # user 1: days 1,2,3, 5,6 -> longest 3, active 5
    for d in (1, 2, 3, 5, 6):
        rows.append({"user_id": 1, "ts": f"2024-01-{d:02d} 10:00:00"})
    # user 2: one day
    rows.append({"user_id": 2, "ts": "2024-02-01 10:00:00"})
    out = activity_streaks(_events(rows))
    m = {r["user_id"]: (r["longest_streak"], r["n_active_days"]) for _, r in out.iterrows()}
    assert m[1] == (3, 5)
    assert m[2] == (1, 1)


def test_ztest_flags_shifted_share(ray_session):
    from kgray.ops.temporal import two_proportion_ztest

    rows = []
    # first half: 300 a / 100 b ; second half: 100 a / 300 b
    for i in range(300):
        rows.append({"event_type": "a", "ts": "2024-01-01 00:00:00"})
    for i in range(100):
        rows.append({"event_type": "b", "ts": "2024-01-01 00:00:00"})
    for i in range(100):
        rows.append({"event_type": "a", "ts": "2024-03-01 00:00:00"})
    for i in range(300):
        rows.append({"event_type": "b", "ts": "2024-03-01 00:00:00"})
    out = two_proportion_ztest(_events(rows))
    m = dict(zip(out["event_type"], out["significant"]))
    assert m == {"a": 1, "b": 1}
    za = out.loc[out["event_type"] == "a", "z"].iloc[0]
    assert za > 1.96


def test_session_paths_counts(ray_session):
    from kgray.ops.temporal import top_session_paths

    rows = []
    # two sessions for u1 with path a>b (gap 2h between), one for u2 with c
    for base in ("2024-01-01 09", "2024-01-01 13"):
        rows.append({"user_id": 1, "event_type": "a", "ts": f"{base}:00:00", "event_id": len(rows)})
        rows.append({"user_id": 1, "event_type": "b", "ts": f"{base}:01:00", "event_id": len(rows)})
    rows.append({"user_id": 2, "event_type": "c", "ts": "2024-01-01 10:00:00", "event_id": 99})
    out = top_session_paths(_events(rows))
    m = dict(zip(out["path"], out["n_sessions"]))
    assert m == {"a>b": 2, "c": 1}


def test_holt_constant_series_levels_flat(ray_session):
    from kgray.ops.temporal import holt_linear_smooth

    rows = []
    for d in range(1, 9):
        for _ in range(10):
            rows.append({"ts": f"2024-01-{d:02d} 10:00:00"})
    out = holt_linear_smooth(_events(rows))
    # constant 10/day: level locks to 10, trend to 0
    assert (out["level"] == 10).all()
    assert (out["trend"] == 0).all()
