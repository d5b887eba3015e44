"""Unit pins for user_type_entropy and value_gini."""

import math

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.stats import user_type_entropy, value_gini


def test_entropy_single_type_is_zero(ray_session):
    df = pd.DataFrame({"user_id": [1, 1, 1], "event_type": ["a", "a", "a"]})
    out = user_type_entropy(ray.data.from_pandas(df))
    assert out["entropy"].iloc[0] == 0.0
    assert out["n_events"].iloc[0] == 3


def test_entropy_uniform_two_types(ray_session):
    df = pd.DataFrame({"user_id": [7, 7], "event_type": ["a", "b"]})
    out = user_type_entropy(ray.data.from_pandas(df))
    # H = ln 2, micro-quantized per term at 1e-9
    assert abs(out["entropy"].iloc[0] - math.log(2)) < 2e-9


def test_gini_uniform_is_zero(ray_session):
    df = pd.DataFrame({"user_id": [1, 2, 3, 4], "value": [5.0, 5.0, 5.0, 5.0]})
    out = value_gini(ray.data.from_pandas(df))
    assert out["gini"].iloc[0] == 0.0
    assert out["n_users"].iloc[0] == 4


def test_gini_one_whale(ray_session):
    # one user owns everything: G = (n-1)/n
    df = pd.DataFrame({"user_id": [1, 2, 3, 4], "value": [0.0, 0.0, 0.0, 100.0]})
    out = value_gini(ray.data.from_pandas(df))
    assert abs(out["gini"].iloc[0] - 0.75) < 1e-6


def test_gini_empty(ray_session):
    df = pd.DataFrame({"user_id": pd.Series(dtype="int64"), "value": pd.Series(dtype="float64")})
    out = value_gini(ray.data.from_pandas(df))
    assert len(out) == 0
