"""CCNet perplexity-bucket split (kgray/ops/text.py perplexity_buckets)."""

import pandas as pd
import ray.data

from kgray.ops.text import perplexity_buckets


def test_terciles_and_ordering(ray_session):
    # 6 repetitive (low-bits) docs, 6 mixed, 6 rare-token (high-bits) docs
    rows = (
        [{"doc_id": i, "text": "a a a a a a"} for i in range(6)]
        + [{"doc_id": 10 + i, "text": f"a b{i % 3} c{i % 2} a d e"} for i in range(6)]
        + [{"doc_id": 20 + i, "text": f"u{i} v{i} w{i} x{i} y{i} z{i}"} for i in range(6)]
    )
    out = (
        perplexity_buckets(ray.data.from_items(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 18
    by = out.groupby("ppl_bucket")["bits_per_token"]
    # bucket boundaries are ordered: head <= middle <= tail
    assert by.max()["head"] <= by.min()["middle"]
    assert by.max()["middle"] <= by.min()["tail"]
    # the repeated-token docs are the cleanest (head)
    assert set(out[out["doc_id"] < 6]["ppl_bucket"]) == {"head"}
    # the all-rare docs land in the tail
    assert set(out[out["doc_id"] >= 20]["ppl_bucket"]) == {"tail"}


def test_partition_invariance(ray_session):
    rows = [{"doc_id": i, "text": f"w{i % 9} common text w{i % 4}"} for i in range(30)]
    a = (
        perplexity_buckets(ray.data.from_items(rows))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        perplexity_buckets(ray.data.from_items(rows).repartition(7))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
