"""Inter-document novelty score (kgray/ops/curation.py novelty_stats)."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.curation import novelty_stats


def _run(rows, **kw):
    return (
        novelty_stats(ray.data.from_items(rows), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_shared_gram_counts_as_duplicated(ray_session):
    rows = [
        {"doc_id": 0, "text": "a b c d x"},   # grams: 'a b c d', 'b c d x'
        {"doc_id": 1, "text": "a b c d y"},   # shares 'a b c d'
        {"doc_id": 2, "text": "p q r s t"},   # all novel
    ]
    out = _run(rows, n=4, min_docs=2)
    assert out["n_grams"].tolist() == [2, 2, 2]
    assert out["n_dup"].tolist() == [1, 1, 0]
    assert out.loc[0, "dup_frac"] == 0.5
    assert out.loc[2, "dup_frac"] == 0.0


def test_short_docs_emit_no_row(ray_session):
    rows = [
        {"doc_id": 0, "text": "a b c"},        # 3 tokens < n=4 -> no grams
        {"doc_id": 1, "text": "a b c d"},
    ]
    out = _run(rows, n=4, min_docs=2)
    assert out["doc_id"].tolist() == [1]
    assert out.loc[0, "n_dup"] == 0


def test_within_doc_repeat_is_not_duplication(ray_session):
    # the same gram twice in ONE doc: distinct-per-doc collapses it, so
    # the distinct-doc count stays 1 -> not common
    rows = [
        {"doc_id": 0, "text": "a b c d a b c d"},
        {"doc_id": 1, "text": "x y z w v u t s"},
    ]
    out = _run(rows, n=4, min_docs=2)
    assert out.loc[0, "n_dup"] == 0


def test_partition_invariance(ray_session):
    rows = [{"doc_id": i, "text": f"shared lead gram here u{i} v{i} w{i}"} for i in range(30)]
    a = _run(rows, n=4, min_docs=2)
    b = (
        novelty_stats(ray.data.from_items(rows).repartition(11), n=4, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_dup"] >= 1).all()
