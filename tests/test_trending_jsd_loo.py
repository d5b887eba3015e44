"""Pins for trending_types, group_jsd_matrix, knn_loo_accuracy."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.similarity import knn_loo_accuracy
from kgray.ops.temporal import trending_types
from kgray.ops.text import group_jsd_matrix


def test_trending_window(ray_session):
    rows = []
    # day 0: 3x a, 1x b ; day 8 (outside window of day 0): 5x b
    for _ in range(3):
        rows.append({"event_type": "a", "ts": "2024-01-01 10:00:00"})
    rows.append({"event_type": "b", "ts": "2024-01-01 11:00:00"})
    for _ in range(5):
        rows.append({"event_type": "b", "ts": "2024-01-09 10:00:00"})
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    out = trending_types(ray.data.from_pandas(df), top_k=2)
    d0 = out[out["rnk"] == 1].sort_values("day")
    # day 0 leader is a (3 > 1); day 8 leader is b (5, window excludes day 0)
    assert list(d0["event_type"]) == ["a", "b"]
    day8 = out[(out["day"] == out["day"].max())]
    assert set(day8["event_type"]) == {"b"}  # a fell out of the window


def test_jsd_symmetric_zero_for_identical(ray_session):
    docs = pd.DataFrame(
        {
            "source": ["s1", "s2", "s3"],
            "text": ["alpha beta gamma", "alpha beta gamma", "delta delta epsilon"],
        }
    )
    out = group_jsd_matrix(ray.data.from_pandas(docs))
    m = {(a, b): v for a, b, v in zip(out["group_a"], out["group_b"], out["jsd"])}
    assert abs(m[("s1", "s2")]) < 1e-9  # identical distributions
    assert m[("s1", "s3")] > 0.01
    # unordered pairs only
    assert ("s2", "s1") not in m


def test_knn_loo_separable(ray_session):
    # two tight, well-separated clusters: LOO accuracy 1.0 for both
    rng = np.random.default_rng(5)
    a = rng.normal(loc=(5, 0), scale=0.05, size=(6, 2))
    b = rng.normal(loc=(0, 5), scale=0.05, size=(6, 2))
    vecs = np.vstack([a, b]).astype(np.float32)
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.arange(12, dtype=np.int64),
                "embedding": list(vecs),
                "label": np.array([0] * 6 + [1] * 6, dtype=np.int32),
            }
        )
    )
    out = knn_loo_accuracy(ds, k=3)
    assert (out["accuracy"] == 1.0).all()
    assert out["n"].sum() == 12
