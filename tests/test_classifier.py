"""Hashed-linear classifier (kgray/ops/ranking.py HashedLinearClassifier)."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.dedup import _md5_u64_np
from kgray.ops.ranking import HashedLinearClassifier


def _spec_score(text: str) -> tuple[int, int]:
    """Row-by-row reference: sum of md5-derived milli-weights."""
    toks = [t for t in text.split(" ") if t]
    total = 0
    for t in toks:
        # int() BEFORE the modulo: numpy-1.x uint64 SCALAR % python-int
        # silently routes through float64 and corrupts large hashes
        j = int(_md5_u64_np([t])[0]) % 256
        w = int(_md5_u64_np([f"w:{j}"])[0]) % 2001 - 1000
        total += w
    return total, len(toks)


def test_classifier_matches_scalar_spec(ray_session):
    rows = [
        {"doc_id": 0, "text": "hash join merge"},
        {"doc_id": 1, "text": "a a a a"},
        {"doc_id": 2, "text": "the quick brown fox jumps"},
    ]
    out = (
        ray.data.from_items(rows)
        .map_batches(HashedLinearClassifier, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, r in enumerate(rows):
        s, n = _spec_score(r["text"])
        assert out.loc[i, "score_milli"] == s
        assert out.loc[i, "n_tokens"] == n
        assert bool(out.loc[i, "keep"]) == (s > 0)


def test_classifier_partition_invariant(ray_session):
    rows = [{"doc_id": i, "text": f"tok{i} tok{i + 1} tok{i % 5}"} for i in range(50)]
    a = (
        ray.data.from_items(rows)
        .map_batches(HashedLinearClassifier, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        ray.data.from_items(rows)
        .repartition(9)
        .map_batches(HashedLinearClassifier, batch_format="pyarrow", concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_classifier_weights_are_bounded():
    c = HashedLinearClassifier()
    assert c.w.dtype == np.int64
    assert c.w.min() >= -1000 and c.w.max() <= 1000
    assert len(c.w) == 256
