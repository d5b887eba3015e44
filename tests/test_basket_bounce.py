"""Pins for market_basket_lift and session_bounce_rate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgray.pipelines.relational import market_basket_lift, session_bounce_rate


def test_basket_lift(ray_session, tmp_path):
    # parts 1&2 always together (3 orders); part 3 alone in a 4th order
    rows = []
    for o in (1, 2, 3):
        rows += [(o, 1), (o, 2)]
    rows += [(4, 3)]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "lineitem.parquet")
    out = market_basket_lift(str(tmp_path), min_support=2)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["part_a"], r["part_b"], r["support"]) == (1, 2, 3)
    # lift = 3*4/(3*3)
    assert abs(r["lift"] - 4.0 / 3.0) < 1e-6


def test_bounce_rate(ray_session, tmp_path):
    ts = pd.to_datetime(
        [
            "2024-01-01 10:00:00",  # u1 session A (2 events)
            "2024-01-01 10:10:00",
            "2024-01-01 12:00:00",  # u1 session B (bounce)
            "2024-01-01 09:00:00",  # u2 session C (bounce)
        ]
    ).astype("datetime64[us]")
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(ts),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = session_bounce_rate(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_sessions"] == 3 and r["n_bounces"] == 2
    assert abs(r["bounce_rate"] - 0.666667) < 1e-6
