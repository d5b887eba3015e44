"""hash_join (kgray.ops.join): reduce-side inner equi-join with typed-null
schema unification — dtypes (int64, lists, strings) must survive the
union, keys missing on either side must drop, and colliding non-key
column names must raise."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from kgray.ops.join import hash_join


def test_hash_join_inner_semantics(ray_session):
    left = pd.DataFrame({"k": [1, 2, 3, 5], "lval": ["a", "b", "c", "e"]})
    right = pd.DataFrame({"rk": [2, 3, 4, 2], "rval": [20, 30, 40, 21]})
    out = (
        hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right), "k", "rk")
        .to_pandas()
        .sort_values(["k", "rval"])
        .reset_index(drop=True)
    )
    # inner join: 1 and 5 (left-only) and 4 (right-only) drop; duplicate
    # right key 2 fans out
    assert list(zip(out["k"], out["lval"], out["rval"])) == [
        (2, "b", 20),
        (2, "b", 21),
        (3, "c", 30),
    ]
    assert out["k"].dtype == np.int64
    assert out["rval"].dtype == np.int64  # typed nulls, not NaN-floats


def test_hash_join_list_payload_and_partitions(ray_session):
    left = pd.DataFrame({"doc_id": range(50), "lang": [f"l{i % 3}" for i in range(50)]})
    right = pa.table(
        {
            "vec_id": pa.array(range(0, 100, 2), type=pa.int64()),
            "vec": pa.array(
                [[float(i), float(i + 1)] for i in range(0, 100, 2)],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    out = (
        hash_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_arrow(right).repartition(3),
            "doc_id",
            "vec_id",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 25  # even doc_ids below 50
    assert list(out["doc_id"])[:3] == [0, 2, 4]
    np.testing.assert_allclose(out.loc[1, "vec"], [2.0, 3.0])


def test_hash_join_rejects_column_collision(ray_session):
    a = ray.data.from_pandas(pd.DataFrame({"k": [1], "x": [1]}))
    b = ray.data.from_pandas(pd.DataFrame({"j": [1], "x": [2]}))
    with pytest.raises(ValueError, match="collide"):
        hash_join(a, b, "k", "j")


def test_hash_join_semi_and_anti(ray_session):
    left = pd.DataFrame({"k": [1, 2, 3, 5, 5], "lval": ["a", "b", "c", "e", "f"]})
    right = pd.DataFrame({"rk": [2, 2, 3, 9], "rval": [0, 1, 2, 3]})
    l = ray.data.from_pandas(left).repartition(3)
    r = ray.data.from_pandas(right).repartition(2)

    semi = hash_join(l, r, "k", "rk", how="semi").to_pandas().sort_values("k")
    # matched left rows, NO fan-out on duplicate right keys, left cols only
    assert list(semi["k"]) == [2, 3]
    assert list(semi.columns) == ["k", "lval"]

    anti = hash_join(l, r, "k", "rk", how="anti").to_pandas().sort_values(["k", "lval"])
    assert list(zip(anti["k"], anti["lval"])) == [(1, "a"), (5, "e"), (5, "f")]
    assert anti["k"].dtype == np.int64

    with pytest.raises(ValueError, match="unsupported how"):
        hash_join(l, r, "k", "rk", how="left")


def test_hash_join_hot_key_skew(ray_session):
    """A key carrying half of each side concentrates in one bucket: the
    join must still be exact (and the fan-out product correct)."""
    left = pd.DataFrame(
        {"k": [7] * 50 + list(range(100, 150)), "lval": [f"l{i}" for i in range(100)]}
    )
    right = pd.DataFrame(
        {"rk": [7] * 20 + list(range(100, 130)), "rval": range(50)}
    )
    out = hash_join(
        ray.data.from_pandas(left).repartition(6),
        ray.data.from_pandas(right).repartition(4),
        "k",
        "rk",
    ).to_pandas()
    assert (out["k"] == 7).sum() == 50 * 20          # hot-key product
    assert (out["k"] != 7).sum() == 30               # 100..129 one-to-one
    want = left.merge(right, left_on="k", right_on="rk")
    assert len(out) == len(want)
