"""Pins for robust_standardize, discount_elasticity, seasonal anomalies."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.similarity import robust_standardize
from kgray.ops.temporal import seasonal_residual_anomalies


def test_robust_z_ignores_outlier(ray_session):
    # 5 vectors; one wild outlier should NOT shift the median much
    vals = [1.0, 1.1, 0.9, 1.05, 100.0]
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(5, dtype=np.int64),
                "embedding": [np.asarray([v, 0.0], dtype=np.float32) for v in vals],
            }
        )
    )
    out = robust_standardize(ds, dim=2).to_pandas()
    d1 = out[out["dim"] == 1].set_index("vec_id")["z"]
    assert abs(d1[0]) < 1.0  # near-median values stay small
    assert d1[4] > 10.0  # the outlier is far in robust units
    # constant dim 2: IQR 0 -> z == 0 sentinel
    assert (out[out["dim"] == 2]["z"] == 0.0).all()


def test_seasonal_anomaly_planted_spike(ray_session):
    rows = []
    # steady 2/day for 28 days, then one 30-event spike on the last day
    for day in range(1, 29):
        n = 30 if day == 28 else 2
        for i in range(n):
            rows.append(
                {"event_type": "x", "ts": f"2024-01-{day:02d} {i % 24:02d}:30:00"}
            )
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    out = seasonal_residual_anomalies(ray.data.from_pandas(df))
    assert len(out) == 1
    assert out["actual"].iloc[0] == 30 and out["resid"].iloc[0] == 28


def test_hash_split_no_leakage_and_full_coverage(ray_session):
    from kgray.ops.temporal import hash_split_assign

    df = pd.DataFrame({"user_id": np.arange(500, dtype=np.int64).repeat(3)})
    out = hash_split_assign(ray.data.from_pandas(df))
    assert out["n_events"].sum() == 1500
    assert out["n_users"].sum() == 500  # zero leakage: users sum exactly
    m = dict(zip(out["split"], out["n_users"]))
    assert m["train"] > m["val"] and m["train"] > m["test"]


def test_retention_decay_geometric(ray_session):
    from kgray.ops.temporal import retention_decay_fit

    # 64 users on day 0; halve the actives each subsequent day
    rows = []
    for age in range(0, 7):
        active = 64 >> age
        for u in range(active):
            rows.append({"user_id": u, "ts": f"2024-01-{age + 1:02d} 12:00:00"})
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    out = retention_decay_fit(ray.data.from_pandas(df))
    assert out["cohort"].iloc[0] == 64
    # halving per day -> slope = -ln 2
    assert abs(out["decay_per_day"].iloc[0] + np.log(2)) < 1e-3
