"""Pins for kmv_distinct_tokens and lang_mixing_weights."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.stats import kmv_distinct_tokens, lang_mixing_weights


def test_kmv_exact_below_k(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["a b c", "b c d"]}))
    out = kmv_distinct_tokens(ds, k=256)
    assert out["k"].iloc[0] == 4  # a b c d
    assert out["estimate"].iloc[0] == 4.0


def test_kmv_estimate_in_range(ray_session):
    rng = np.random.default_rng(11)
    texts = [" ".join(f"tok{rng.integers(0, 5000)}" for _ in range(50)) for _ in range(200)]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    truth = len({t for s in texts for t in s.split(" ")})
    out = kmv_distinct_tokens(ds, k=256)
    est = out["estimate"].iloc[0]
    assert 0.7 * truth < est < 1.3 * truth


def test_mixing_weights_upsample_tail(ray_session):
    docs = pd.DataFrame(
        {
            "lang": ["en"] * 90 + ["de"] * 10,
            "text": ["three token text"] * 100,
        }
    )
    out = lang_mixing_weights(ray.data.from_pandas(docs), alpha=0.3)
    m = dict(zip(out["lang"], out["weight"]))
    # alpha < 1: tail language gets MORE than its 10% natural share
    assert m["de"] > 0.1
    assert abs(sum(m.values()) - 1.0) < 1e-4
    assert (out["chars_per_token"] > 0).all()
