"""Exact data mixing (kgray/ops/curation.py mix_to_proportions)."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.curation import mix_to_proportions
from kgray.ops.dedup import _md5_u64_np


def _rows(counts: dict[str, int]):
    rows, i = [], 0
    for s, n in counts.items():
        for _ in range(n):
            rows.append({"doc_id": i, "source": s})
            i += 1
    return rows


def test_exact_proportions(ray_session):
    ds = ray.data.from_items(_rows({"a": 40, "b": 40, "c": 7}))
    out = mix_to_proportions(ds, {"a": 4, "b": 2, "c": 1}).to_pandas()
    # unit = min(40//4, 40//2, 7//1) = 7 -> 28/14/7
    got = out.groupby("source").size().to_dict()
    assert got == {"a": 28, "b": 14, "c": 7}


def test_selection_is_smallest_hash_rank(ray_session):
    ds = ray.data.from_items(_rows({"a": 20, "b": 10}))
    out = mix_to_proportions(ds, {"a": 1, "b": 1}).to_pandas()
    # unit = 10 -> 10 of each; source a keeps its 10 smallest (hash, id)
    full = pd.DataFrame(_rows({"a": 20, "b": 10}))
    full["h"] = _md5_u64_np([str(x) for x in full["doc_id"]])
    expect_a = set(
        full[full["source"] == "a"]
        .sort_values(["h", "doc_id"])
        .head(10)["doc_id"]
    )
    assert set(out[out["source"] == "a"]["doc_id"]) == expect_a
    assert set(out[out["source"] == "b"]["doc_id"]) == set(
        full[full["source"] == "b"]["doc_id"]
    )


def test_unweighted_sources_dropped_and_missing_source_empties(ray_session):
    ds = ray.data.from_items(_rows({"a": 10, "b": 10}))
    out = mix_to_proportions(ds, {"a": 1}).to_pandas()
    assert set(out["source"]) == {"a"}
    assert len(out) == 10
    # a weighted source absent from the corpus -> unit 0 -> empty result
    out2 = mix_to_proportions(ds, {"a": 1, "zz": 1}).to_pandas()
    assert len(out2) == 0


def test_cluster_size_invariance(ray_session):
    rows = _rows({"a": 30, "b": 18, "c": 12})
    w = {"a": 3, "b": 2, "c": 1}
    a = mix_to_proportions(ray.data.from_items(rows), w).to_pandas()
    b = mix_to_proportions(ray.data.from_items(rows).repartition(9), w).to_pandas()
    key = ["doc_id", "source"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True),
    )
