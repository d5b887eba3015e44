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
