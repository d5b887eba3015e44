"""Pins for jl_project, bpe_top_pairs, orders_cohort_retention."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.similarity import jl_project
from kgray.ops.text import bpe_top_pairs


def test_jl_preserves_scaled_norm_roughly(ray_session):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(20, 64)).astype(np.float32)
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(20, dtype=np.int64), "embedding": list(vecs)}
        )
    )
    out = jl_project(ds).to_pandas()
    assert len(out) == 20 * 16
    # JL: projected squared norm concentrates around the original
    p = out.pivot(index="vec_id", columns="j", values="proj").to_numpy()
    ratio = (p**2).sum(axis=1) / (vecs.astype(np.float64) ** 2).sum(axis=1)
    assert 0.4 < ratio.mean() < 1.6


def test_jl_deterministic(ray_session):
    vecs = [np.ones(64, dtype=np.float32)]
    ds = ray.data.from_pandas(pd.DataFrame({"vec_id": [0], "embedding": vecs}))
    a = jl_project(ds).to_pandas().sort_values("j")["proj"].to_numpy()
    b = jl_project(ds).to_pandas().sort_values("j")["proj"].to_numpy()
    assert (a == b).all()


def test_bpe_top_pairs_counts(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["abab ab", "ba"]}))
    out = bpe_top_pairs(ds, top_n=5)
    m = dict(zip(out["pair"], out["cnt"]))
    # 'ab': abab has 2, ab has 1 -> 3 ; 'ba': abab 1, ba 1 -> 2
    assert m["ab"] == 3
    assert m["ba"] == 2


def test_bpe_pairs_do_not_cross_words(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["xy zw"]}))
    out = bpe_top_pairs(ds, top_n=10)
    assert "yz" not in set(out["pair"])
    assert "y z" not in set(out["pair"])
