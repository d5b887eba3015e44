"""Global rank/CDF transform (kgray/ops/stats.py percentile_transform)."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.stats import percentile_transform


def _run(vals, **kw):
    rows = [{"event_id": i, "value": float(v)} for i, v in enumerate(vals)]
    return (
        percentile_transform(ray.data.from_items(rows), **kw)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def test_exact_cume_dist_semantics(ray_session):
    out = _run([1.0, 2.0, 2.0, 3.0])
    # P(X <= x): 1.0 -> 1/4, 2.0 -> 3/4 (ties share the upper bound), 3.0 -> 1
    assert out["pct"].tolist() == [0.25, 0.75, 0.75, 1.0]
    assert out["cents"].tolist() == [100, 200, 200, 300]


def test_quantization_merges_near_values(ray_session):
    # 1.001 and 1.004 quantize to the same cent -> identical pct
    out = _run([1.001, 1.004, 9.99])
    assert out.loc[0, "pct"] == out.loc[1, "pct"]
    assert out.loc[2, "pct"] == 1.0


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 50, size=200)
    rows = [{"event_id": i, "value": float(v)} for i, v in enumerate(vals)]
    a = (
        percentile_transform(ray.data.from_items(rows))
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    b = (
        percentile_transform(ray.data.from_items(rows).repartition(9))
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # pct is a valid CDF: monotone in value, max exactly 1
    s = a.sort_values("cents")
    assert (np.diff(s["pct"].to_numpy()) >= 0).all()
    assert a["pct"].max() == 1.0
