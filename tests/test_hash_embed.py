"""Hashed document embeddings (kgray/ops/text.py HashedDocEmbedder)."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.text import HashedDocEmbedder


def _run(rows, concurrency=1):
    return (
        ray.data.from_items(rows)
        .map_batches(HashedDocEmbedder, batch_format="pyarrow", concurrency=concurrency)
        .to_pandas()
        .sort_values(["doc_id", "dim"])
        .reset_index(drop=True)
    )


def test_unit_norm_and_shape(ray_session):
    out = _run([{"doc_id": 0, "text": "hash join merge"}, {"doc_id": 1, "text": "scan"}])
    assert len(out) == 2 * HashedDocEmbedder.DIM
    for _, g in out.groupby("doc_id"):
        # unit L2 norm up to the 6-dp rounding
        assert abs(np.sqrt((g["val"] ** 2).sum()) - 1.0) < 1e-4


def test_same_tokens_same_vector_and_order_matters_not(ray_session):
    out = _run(
        [
            {"doc_id": 0, "text": "alpha beta"},
            {"doc_id": 1, "text": "beta alpha"},   # bag-of-tokens: same mean
            {"doc_id": 2, "text": "alpha gamma"},
        ]
    )
    v = {d: g["val"].to_numpy() for d, g in out.groupby("doc_id")}
    np.testing.assert_array_equal(v[0], v[1])
    assert not np.array_equal(v[0], v[2])


def test_partition_invariance(ray_session):
    rows = [{"doc_id": i, "text": f"tok{i % 7} tok{i % 3} common"} for i in range(40)]
    a = _run(rows)
    b = (
        ray.data.from_items(rows)
        .repartition(9)
        .map_batches(HashedDocEmbedder, batch_format="pyarrow", concurrency=2)
        .to_pandas()
        .sort_values(["doc_id", "dim"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
