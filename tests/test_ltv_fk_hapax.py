"""Pins for ltv_age_curve, fk_integrity_audit, hapax_ratio."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from kgray.ops.stats import hapax_ratio
from kgray.ops.temporal import ltv_age_curve


def test_ltv_curve(ray_session):
    # u1: 1.00 on day0, 2.00 on day1 ; u2: 4.00 on its own day0
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-03-05"]
            ).astype("datetime64[us]"),
            "value": [1.0, 2.0, 4.0],
        }
    )
    out = ltv_age_curve(ray.data.from_pandas(df))
    m = dict(zip(out["age_day"], out["cum_value_per_user"]))
    assert abs(m[0] - 2.5) < 1e-6  # (1+4)/2 users
    assert abs(m[1] - 3.5) < 1e-6  # +2.00 at age 1


def test_hapax_ratio(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["a a b", "c"]}))
    out = hapax_ratio(ds)
    r = out.iloc[0]
    assert r["vocab"] == 3 and r["hapax"] == 2 and r["total_tokens"] == 4
    assert abs(r["hapax_ratio"] - 0.666667) < 1e-6


def test_fk_audit_detects_orphans(ray_session, tmp_path):
    from kgray.pipelines.relational import fk_integrity_audit

    pq.write_table(pa.table({"p_partkey": pa.array([1], pa.int64())}), tmp_path / "part.parquet")
    pq.write_table(
        pa.table({"s_suppkey": pa.array([1], pa.int64()), "s_nationkey": pa.array([0], pa.int32())}),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.table({"c_custkey": pa.array([1], pa.int64()), "c_nationkey": pa.array([0], pa.int32())}),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table({"n_nationkey": pa.array([0], pa.int32()), "n_regionkey": pa.array([0], pa.int32())}),
        tmp_path / "nation.parquet",
    )
    pq.write_table(pa.table({"r_regionkey": pa.array([0], pa.int32())}), tmp_path / "region.parquet")
    pq.write_table(
        pa.table({"o_orderkey": pa.array([10], pa.int64()), "o_custkey": pa.array([99], pa.int64())}),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([10, 11], pa.int64()),
                "l_partkey": pa.array([1, 2], pa.int64()),
                "l_suppkey": pa.array([1, 1], pa.int64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    out = fk_integrity_audit(str(tmp_path))
    m = dict(zip(out["fk_edge"], out["n_orphans"]))
    assert m["orders->customer"] == 1  # custkey 99 missing
    assert m["lineitem->orders"] == 1  # orderkey 11 missing
    assert m["lineitem->part"] == 1  # partkey 2 missing
    assert m["lineitem->supplier"] == 0
    assert m["customer->nation"] == 0


def test_type_drift_identical_halves_near_zero(ray_session):
    from kgray.ops.stats import type_drift

    rows = []
    for day in (1, 20):  # same mix in both halves
        for t, n in (("a", 4), ("b", 2)):
            for i in range(n):
                rows.append({"event_type": t, "ts": f"2024-01-{day:02d} 0{i}:00:00"})
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    out = type_drift(ray.data.from_pandas(df))
    assert abs(out["kl_ab"].iloc[0]) < 1e-6
    assert abs(out["tvd"].iloc[0]) < 1e-6
