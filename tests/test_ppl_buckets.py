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


def test_grouped_lm_scores_under_own_group_model(ray_session):
    """A token common in group A but absent from group B must cost more
    bits for a B doc than an A doc — per-group models, not one global."""
    import pandas as pd
    import ray.data

    from kgray.ops.text import unigram_lm_score_grouped

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "lang": ["en", "en", "fr", "fr"],
            "text": [
                "hello world hello world",
                "hello hello hello hello",
                "bonjour monde bonjour monde",
                "bonjour bonjour bonjour bonjour",
            ],
        }
    )
    out = (
        unigram_lm_score_grouped(ray.data.from_pandas(df), group_col="lang")
        .to_pandas()
        .set_index("doc_id")
    )
    # within each group: the all-same-token doc is cheaper than the mixed one
    assert out.loc[1, "bits_per_token"] < out.loc[0, "bits_per_token"]
    assert out.loc[3, "bits_per_token"] < out.loc[2, "bits_per_token"]
    # the en model never saw french tokens and vice versa — symmetric
    # corpora give identical bit costs across groups
    assert out.loc[0, "bits_per_token"] == out.loc[2, "bits_per_token"]
    assert (out["lang"] == df.set_index("doc_id")["lang"]).all()
