"""Segment-level (CCNet-style) dedup: kgray/ops/dedup.py segment_dedup."""

import pandas as pd
import ray.data

from kgray.ops.dedup import segment_dedup


def _run(rows, **kw):
    ds = ray.data.from_items(rows)
    return (
        segment_dedup(ds, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_shared_segment_removed_from_all_docs(ray_session):
    rows = [
        {"doc_id": 0, "text": "a b c x y z"},      # 'a b c' shared with doc 1
        {"doc_id": 1, "text": "a b c q r s"},
        {"doc_id": 2, "text": "u v w m n o"},      # untouched
    ]
    out = _run(rows, seg_tokens=3, min_docs=2)
    assert out.loc[0, "text_dedup"] == "x y z"
    assert out.loc[1, "text_dedup"] == "q r s"
    assert out.loc[2, "text_dedup"] == "u v w m n o"
    assert out["n_segments"].tolist() == [2, 2, 2]
    assert out["n_removed"].tolist() == [1, 1, 0]


def test_fully_removed_doc_keeps_empty_text(ray_session):
    rows = [
        {"doc_id": 0, "text": "a b c"},
        {"doc_id": 1, "text": "a b c"},
    ]
    out = _run(rows, seg_tokens=3, min_docs=2)
    assert out["text_dedup"].tolist() == ["", ""]
    assert out["n_removed"].tolist() == [1, 1]


def test_partial_tail_segment_and_alignment(ray_session):
    # segments are position-aligned windows: doc 1 contains the same WORDS
    # 'a b c' but split across two segments ('z a b', 'c'), so nothing is
    # common between the docs
    rows = [
        {"doc_id": 0, "text": "a b c"},
        {"doc_id": 1, "text": "z a b c"},
    ]
    out = _run(rows, seg_tokens=3, min_docs=2)
    assert out.loc[0, "text_dedup"] == "a b c"
    assert out.loc[1, "text_dedup"] == "z a b c"
    assert out["n_segments"].tolist() == [1, 2]


def test_within_doc_repeat_does_not_count_as_two_docs(ray_session):
    # 'a b c' appears twice in ONE doc -> distinct-doc count is 1 -> kept
    rows = [
        {"doc_id": 0, "text": "a b c a b c"},
        {"doc_id": 1, "text": "x y z p q r"},
    ]
    out = _run(rows, seg_tokens=3, min_docs=2)
    assert out.loc[0, "text_dedup"] == "a b c a b c"
    assert out.loc[0, "n_removed"] == 0


def test_partition_invariance(ray_session):
    rows = [
        {"doc_id": i, "text": f"common seg here tail{i} x{i} y{i}"} for i in range(20)
    ]
    a = segment_dedup(ray.data.from_items(rows), seg_tokens=3, min_docs=2).to_pandas()
    b = segment_dedup(
        ray.data.from_items(rows).repartition(7), seg_tokens=3, min_docs=2
    ).to_pandas()
    key = ["doc_id", "text_dedup", "n_segments", "n_removed"]
    pd.testing.assert_frame_equal(
        a[key].sort_values("doc_id").reset_index(drop=True),
        b[key].sort_values("doc_id").reset_index(drop=True),
    )
    # the shared leading segment is gone from every doc
    assert (a["n_removed"] >= 1).all()
