"""Edge-case semantics for the window (kgray/ops/window.py) and curation
(kgray/ops/curation.py) operators: per-key window isolation across buckets,
top-k ties and the partial combiner, contamination distinct-gram counting,
sampling determinism, and repetition math.  Full value checks vs DuckDB
(window SQL / n-gram CTEs / md5 sampling) live in tests/test_oracles.py."""

import numpy as np
import pandas as pd
import ray
import ray.data

from kgray.ops.curation import (
    benchmark_gram_set,
    ngram_contamination,
    repetition_stats,
    stratified_sample,
)
from kgray.ops.window import keyed_window, top_k_per_group


def test_keyed_window_per_key_isolation(ray_session):
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 9, 7],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 08:00", "2024-01-01 09:00", "2024-01-01 12:00"]
            ),
            "v": [10, 20, 30, 40],
        }
    )
    out = (
        keyed_window(ray.data.from_pandas(df), key="user_id", order_cols=("ts", "event_id"), value_col="v")
        .to_pandas()
        .set_index("event_id")
    )
    # user 7 ordered by ts: 2 (08:00), 1 (10:00), 4 (12:00)
    assert list(out.loc[[2, 1, 4], "rn"]) == [1, 2, 3]
    assert list(out.loc[[2, 1, 4], "run_v"]) == [20, 30, 70]
    assert pd.isna(out.loc[2, "prev_v"]) and out.loc[1, "prev_v"] == 20
    # user 9 is its own window
    assert out.loc[3, "rn"] == 1 and out.loc[3, "run_v"] == 30


def test_top_k_per_group_ties_and_partials(ray_session):
    # 2 blocks so the per-batch partial really runs before the shuffle;
    # ties on value break by ascending id
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "lang": ["en", "en", "en", "en", "fr", "fr"],
            "n_chars": [9, 9, 7, 5, 3, 8],
        }
    )
    ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:]])
    out = top_k_per_group(ds, key="lang", value_col="n_chars", id_col="doc_id", k=2)
    en = out[out["lang"] == "en"]
    assert list(en["doc_id"]) == [1, 2] and list(en["rank"]) == [1, 2]
    fr = out[out["lang"] == "fr"]
    assert list(fr["doc_id"]) == [6, 5]


def test_contamination_distinct_grams_and_short_docs(ray_session):
    bench = pd.DataFrame({"doc_id": [100], "text": ["a b c d e f"]})
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c x y z w",      # no 3-gram overlap ("a b c" IS shared)
                "a b c d e a b c d e",  # repeated grams count ONCE (distinct)
                "too short",           # <3 tokens → no row
            ],
        }
    )
    ref = benchmark_gram_set(ray.data.from_pandas(bench), n=3)
    out = (
        ngram_contamination(ray.data.from_pandas(corpus), ref, n=3)
        .to_pandas()
        .set_index("doc_id")
    )
    assert 3 not in out.index
    assert out.loc[1, "n_hit"] == 1 and bool(out.loc[1, "contaminated"])
    # doc 2: 8 positional 3-grams, 5 distinct (abc bcd cde dea eab);
    # hits = the 3 that bench contains (a b c / b c d / c d e)
    assert out.loc[2, "n_grams"] == 5
    assert out.loc[2, "n_hit"] == 3


def test_stratified_sample_deterministic_and_stratified(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(400), "lang": ["en", "fr"] * 200})
    ds = ray.data.from_pandas(df)
    a = stratified_sample(ds, rates={"en": 100, "fr": 0}).to_pandas()
    assert set(a["lang"]) == {"en"} and len(a) == 200
    b1 = stratified_sample(ds, rates={"en": 30}, default_pct=10).to_pandas()
    b2 = stratified_sample(ds, rates={"en": 30}, default_pct=10).to_pandas()
    pd.testing.assert_frame_equal(
        b1.sort_values("doc_id").reset_index(drop=True),
        b2.sort_values("doc_id").reset_index(drop=True),
    )
    # rates hold approximately and differ per stratum
    en = (b1["lang"] == "en").sum() / 200
    fr = (b1["lang"] == "fr").sum() / 200
    assert 0.15 < en < 0.45 and fr < 0.2


def test_repetition_stats_math(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b a b a", "one-token"]})
    out = repetition_stats(ray.data.from_pandas(df)).to_pandas().set_index("doc_id")
    # bigrams of doc 1: "a b","b a","a b","b a" → n=4, max=2, share 0.5
    assert out.loc[1, "n_bigrams"] == 4
    assert out.loc[1, "max_bigram"] == 2
    assert out.loc[1, "top_bigram_share"] == 0.5
    assert 2 not in out.index  # single token → no bigrams → no row


def test_scrub_pii_redacts_and_counts(ray_session):
    from kgray.ops.curation import scrub_pii

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail me at jane.doe+x@example.co.uk or call +1 (415) 555-0100",
                "server at 192.0.2.7 responded",
                "nothing sensitive here",
            ],
        }
    )
    out = scrub_pii(ray.data.from_pandas(df)).to_pandas().set_index("doc_id")
    assert "<EMAIL>" in out.loc[1, "text_scrubbed"]
    assert "<PHONE>" in out.loc[1, "text_scrubbed"]
    assert "jane" not in out.loc[1, "text_scrubbed"]
    assert out.loc[1, "n_pii"] == 2
    assert out.loc[2, "text_scrubbed"] == "server at <IP> responded"
    assert out.loc[2, "n_pii"] == 1
    assert out.loc[3, "text_scrubbed"] == "nothing sensitive here"
    assert out.loc[3, "n_pii"] == 0


def test_normalize_text(ray_session):
    from kgray.ops.curation import normalize_text

    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["  Hello\t\tWORLD \n", "ok"]}
    )
    out = normalize_text(ray.data.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[1, "text_clean"] == "hello world"
    assert out.loc[1, "n_chars_clean"] == 11
    assert out.loc[2, "text_clean"] == "ok"


def test_dsir_weights_prefer_target_like_docs(ray_session):
    """Docs sharing the target subset's vocabulary must score higher than
    vocabulary-disjoint docs (the DSIR selection property)."""
    import numpy as np
    import ray.data

    from kgray.ops.curation import dsir_weights

    # target = doc_id % 5 == 0 -> ids 0,5 are targets with vocab A;
    # ids 1,6 share vocab A (should score high); ids 2,3 use vocab B
    rows = {
        0: "alpha beta gamma delta " * 5,
        5: "alpha beta gamma epsilon " * 5,
        1: "alpha beta gamma delta epsilon " * 4,
        6: "beta gamma delta alpha " * 5,
        2: "zebra yak xylophone walrus " * 5,
        3: "quokka puffin otter narwhal " * 5,
    }
    df = pd.DataFrame({"doc_id": list(rows), "text": list(rows.values())})
    out = dsir_weights(ray.data.from_pandas(df)).to_pandas().set_index("doc_id")
    w = out["dsir_weight"]
    assert min(w[0], w[5], w[1], w[6]) > max(w[2], w[3])
    assert (out["n_tokens"] > 0).all()


def test_bloom_contamination_one_sided_vs_exact(ray_session):
    """Every exact hit is a bloom hit (no false negatives); false
    positives bounded; counts match the exact op on clean data."""
    import numpy as np
    import ray.data

    from kgray.ops.curation import (
        benchmark_gram_set,
        bloom_bits,
        bloom_contamination,
        ngram_contamination,
    )

    bench_txt = ["the secret benchmark question about ancient rome history"]
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "prefix text the secret benchmark question about ancient rome history suffix",
                "completely unrelated words about gardening and cooking recipes here",
                "another clean document describing mountains rivers and weather patterns",
            ],
        }
    )
    bench = ray.data.from_pandas(pd.DataFrame({"doc_id": [0], "text": bench_txt}))
    corp = ray.data.from_pandas(corpus)
    exact = (
        ngram_contamination(corp, benchmark_gram_set(bench, n=5), n=5)
        .to_pandas()
        .set_index("doc_id")
    )
    bloom = (
        bloom_contamination(corp, bloom_bits(bench, n=5), n=5)
        .to_pandas()
        .set_index("doc_id")
    )
    # one-sided: bloom hits >= exact hits, per doc
    assert (bloom["n_hit"] >= exact["n_hit"]).all()
    assert bool(bloom.loc[1, "contaminated"])
    # at 2^20 bits with a ~dozen benchmark grams, FP probability is ~0
    assert not bloom.loc[2, "contaminated"] and not bloom.loc[3, "contaminated"]
    assert (bloom["n_grams"] == exact["n_grams"]).all()
