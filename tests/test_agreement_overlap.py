"""Hand-computed pins for the session-5 agreement/overlap/skew ops:
cohen_kappa, dau_overlap, daily_crosscorr, shard_skew."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.stats import cohen_kappa, daily_crosscorr, shard_skew
from kgray.ops.temporal import dau_overlap


def test_cohen_kappa_hand():
    # confusion: (x,x)x2, (x,y), (y,y) -> n=4 diag=3 rows x:3 y:1 cols x:2 y:2
    # s = 3*2 + 1*2 = 8; kappa = (4*3 - 8) / (16 - 8) = 0.5; agree = 0.75
    ds = ray.data.from_pandas(
        pd.DataFrame({"a": ["x", "x", "x", "y"], "b": ["x", "x", "y", "y"]})
    )
    out = cohen_kappa(ds, "a", "b")
    assert out.iloc[0]["n"] == 4
    assert out.iloc[0]["agree"] == 0.75
    assert out.iloc[0]["kappa"] == 0.5


def test_cohen_kappa_degenerate_and_empty():
    # both raters constant -> pe = 1 -> no row
    ds = ray.data.from_pandas(pd.DataFrame({"a": ["x", "x"], "b": ["x", "x"]}))
    assert len(cohen_kappa(ds, "a", "b")) == 0
    empty = ray.data.from_pandas(
        pd.DataFrame({"a": pd.Series(dtype=object), "b": pd.Series(dtype=object)})
    )
    out = cohen_kappa(empty, "a", "b")
    assert len(out) == 0 and list(out.columns) == ["n", "agree", "kappa"]


def test_dau_overlap_hand():
    ts = pd.to_datetime(
        [
            "2020-01-01 10:00",
            "2020-01-01 11:00",
            "2020-01-02 09:00",
            "2020-01-02 10:00",
            "2020-01-04 10:00",  # gap day: no (jan2, jan3) or (jan3, jan4) row
        ]
    )
    ds = ray.data.from_pandas(
        pd.DataFrame({"user_id": [1, 2, 2, 3, 3], "ts": ts})
    )
    out = dau_overlap(ds)
    assert list(out["day"]) == ["2020-01-01"]
    r = out.iloc[0]
    assert (r["n_today"], r["n_next"], r["n_both"]) == (2, 2, 1)
    assert r["jaccard"] == round(1 / 3, 6)


def test_daily_crosscorr_perfect_and_zero_fill():
    # a on days 1..3 with counts 1,2,3; b only on days 1 and 3 (day 2
    # zero-fills): lag-0 pairs (1,2),(2,0),(3,6)
    rows = []
    for day, n in (("01", 1), ("02", 2), ("03", 3)):
        rows += [("view", f"2020-01-{day} 08:00")] * n
    rows += [("purchase", "2020-01-01 09:00")] * 2
    rows += [("purchase", "2020-01-03 09:00")] * 6
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = daily_crosscorr(ray.data.from_pandas(df), max_lag=1)
    out = out.set_index("lag")
    x = np.array([1, 2, 3], dtype=np.float64)
    y = np.array([2, 0, 6], dtype=np.float64)
    exp0 = np.corrcoef(x, y)[0, 1]
    assert out.loc[0, "n_pairs"] == 3
    assert abs(out.loc[0, "r"] - exp0) < 2e-6
    # lag 1: x=[1,2] vs y=[0,6] -> r = 1.0
    assert out.loc[1, "r"] == 1.0


def test_shard_skew_matches_md5_and_load():
    from kgray.ops.dedup import _md5_u64_np

    keys = list(range(100))
    ds = ray.data.from_pandas(pd.DataFrame({"user_id": keys}))
    out = shard_skew(ds, n_shards=8).set_index("shard")
    h = _md5_u64_np([str(k) for k in keys]) % np.uint64(8)
    u, c = np.unique(h.astype(np.int64), return_counts=True)
    for shard, cnt in zip(u, c):
        assert out.loc[shard, "n_rows"] == cnt
        assert out.loc[shard, "load"] == (int(cnt) * 8 * 10**6 // 100) / 1e6
    assert int(out["n_rows"].sum()) == 100


def test_rrf_fusion_hand():
    from kgray.ops.ranking import rrf_fuse_rank

    # doc 1: both terms many times but long; doc 2: one term, short; doc 3
    # no terms (rank by id among zero scores)
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["hash join " * 5 + "filler " * 20, "hash", "nothing here"],
        }
    )
    out = rrf_fuse_rank(
        ray.data.from_pandas(df), ("hash", "join"), pool=2, top_k=3
    )
    # pool=2 -> doc 3 absent from both lists and from the fused output
    assert set(out["doc_id"]) == {1, 2}
    top = out.iloc[0]
    # every doc in the output carries its per-list rank (0 = absent)
    assert set(out["rank_bm25"]) == {1, 2} and set(out["rank_tf"]) == {1, 2}
    assert top["rrf"] >= out.iloc[1]["rrf"]


def test_rrf_fusion_empty():
    from kgray.ops.ranking import rrf_fuse_rank

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype=object)})
    )
    out = rrf_fuse_rank(ds, ("hash",))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "rrf", "rank_bm25", "rank_tf"]


def test_classifier_calibration_counts():
    from kgray.ops.ranking import ClassifierCalibration, finish_calibration

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["the cat and the dog", "xyzzy plugh", "the the the"],
            "lang": ["en", "zh", "fr"],  # exactly one gold positive
        }
    )
    parts = (
        ray.data.from_pandas(df)
        .map_batches(ClassifierCalibration, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    out = finish_calibration(parts)
    assert int(out["n_docs"].sum()) == 3
    assert int(out["n_gold"].sum()) == 1
    # rate is the exact integer micro-division
    for _, r in out.iterrows():
        assert r["gold_rate"] == (int(r["n_gold"]) * 10**6 // int(r["n_docs"])) / 1e6


def test_predicate_cardinality_hand():
    from kgray.functions.graph import predicate_cardinality

    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "pred": ["works_at"] * 3 + ["ceo_of"],
                "subj_id": ["a", "a", "b", "c"],
                "obj_id": ["x", "y", "x", "x"],
            }
        )
    )
    out = predicate_cardinality(edges).set_index("pred")
    assert out.loc["works_at", "n_edges"] == 3
    assert out.loc["works_at", "n_subj"] == 2
    assert out.loc["works_at", "n_obj"] == 2
    assert out.loc["works_at", "obj_per_subj"] == 1.5
    assert out.loc["ceo_of", "obj_per_subj"] == 1.0
    empty = ray.data.from_pandas(
        pd.DataFrame(
            {
                "pred": pd.Series(dtype=object),
                "subj_id": pd.Series(dtype=object),
                "obj_id": pd.Series(dtype=object),
            }
        )
    )
    assert len(predicate_cardinality(empty)) == 0


def test_token_coverage_hand():
    from kgray.ops.stats import token_coverage_curve

    # counts: a:4 b:2 c:1 -> total 7, vocab 3
    ds = ray.data.from_pandas(
        pd.DataFrame({"text": ["a a b", "a a b c", ""]})
    )
    out = token_coverage_curve(ds, ks=(1, 2, 5)).set_index("k")
    assert int(out.loc[1, "covered"]) == 4
    assert int(out.loc[2, "covered"]) == 6
    assert int(out.loc[5, "covered"]) == 7  # k beyond vocab covers all
    assert int(out.loc[5, "n_vocab"]) == 3
    assert out.loc[1, "share"] == (4 * 10**6 // 7) / 1e6


def test_source_overlap_hand():
    from kgray.ops.curation import source_token_overlap

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "source": ["s1", "s1", "s2", "s3"],
                "text": ["a b", "b c", "b c d", "zzz"],
            }
        )
    )
    out = source_token_overlap(ds).set_index(["src_a", "src_b"])
    r = out.loc[("s1", "s2")]
    # s1={a,b,c}, s2={b,c,d}: inter 2, union 4
    assert (r["n_a"], r["n_b"], r["n_common"]) == (3, 3, 2)
    assert r["jaccard"] == 0.5
    # complete grid: zero-overlap pair present with jaccard 0
    assert out.loc[("s1", "s3")]["n_common"] == 0
    assert out.loc[("s2", "s3")]["jaccard"] == 0.0


def test_temporal_conflicts_hand():
    from kgray.functions.graph import temporal_conflicts

    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "pred": ["works_at"] * 4 + ["ceo_of"] * 2,
                "subj_id": ["s1", "s1", "s1", "s2", "s3", "s3"],
                "obj_id": ["o1", "o2", "o3", "o1", "o1", "o2"],
                # s1: o1=[10,20], o2=[15,30] overlap; o3=[25,inf) overlaps
                # o2 but not o1. s2 single object: no pair.
                # s3 ceo_of: o1=(-inf,5], o2=[6,inf): disjoint.
                "t_start": [[10.0], [15.0], [25.0], [1.0], [], [6.0]],
                "t_end": [[20.0], [30.0], [], [2.0], [5.0], []],
            }
        )
    )
    out = temporal_conflicts(edges).set_index("pred")
    assert out.loc["works_at", "n_pairs"] == 3
    assert out.loc["works_at", "n_conflicts"] == 2  # (o1,o2) and (o2,o3)
    assert out.loc["works_at", "n_subj_conflict"] == 1
    assert out.loc["ceo_of", "n_pairs"] == 1
    assert out.loc["ceo_of", "n_conflicts"] == 0
    assert out.loc["ceo_of", "n_subj_conflict"] == 0


def test_quantile_sketch_audit_hand():
    from kgray.ops.stats import quantile_sketch_audit

    # values 1..100 (cents): exact p50 = 50; with width 30 buckets are
    # [0,29],[30,59],[60,89],[90,119] -> p50 estimate = 59
    ds = ray.data.from_pandas(pd.DataFrame({"cents": list(range(1, 101))}))
    out = quantile_sketch_audit(ds, bucket_width=30).set_index("pct")
    assert int(out.loc["p50", "exact"]) == 50
    assert int(out.loc["p50", "estimate"]) == 59
    assert int(out.loc["p50", "abs_err"]) == 9
    assert int(out.loc["p99", "exact"]) == 99
    assert int(out.loc["p99", "estimate"]) == 119


def test_bm25_ndcg_bounds_and_perfect():
    from kgray.ops.ranking import bm25_ndcg

    # every relevant doc scores above every irrelevant one -> the BM25
    # order IS the ideal order -> ndcg == 1.0
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["hash join", "hash", "filler text", "more filler"],
        }
    )
    out = bm25_ndcg(ray.data.from_pandas(df), ("hash", "join"), k=3)
    assert len(out) == 1
    assert out.iloc[0]["ndcg"] == 1.0
    # no relevant docs -> IDCG 0 -> no row
    none = bm25_ndcg(
        ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["abc"]})),
        ("zzz",),
    )
    assert len(none) == 0


def test_predicate_cooccurrence_hand():
    from kgray.functions.graph import predicate_cooccurrence

    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "pred": ["works_at", "lives_in", "works_at", "codes_in"],
                "subj_id": ["a", "a", "b", "c"],
                "obj_id": ["x", "y", "z", "w"],
            }
        )
    )
    out = predicate_cooccurrence(edges).set_index(["pred_a", "pred_b"])
    # complete grid over 3 predicates = 3 pairs
    assert len(out) == 3
    r = out.loc[("lives_in", "works_at")]
    assert (r["n_a"], r["n_b"], r["n_both"]) == (1, 2, 1)
    assert out.loc[("codes_in", "works_at")]["n_both"] == 0


def test_cluster_cohesion_invariants():
    from kgray.ops.similarity import cluster_cohesion

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = cluster_cohesion(ds)
    total = int(out["n"].sum())
    assert total == 500
    # loads are the exact integer micro-division and sum to ~n_centroids
    for _, r in out.iterrows():
        assert r["load"] == (int(r["n"]) * 16 * 10**6 // total) / 1e6
        assert r["min_cos"] <= r["mean_cos"] + 1e-9


def test_image_histogram_decode_parity():
    from kgray.ops.multimodal import image_histograms

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [0, 1, 7]}))
    out = image_histograms(ds, concurrency=1).to_pandas().set_index("doc_id")
    for d in (0, 1, 7):
        w, h = 8 + d % 5, 6 + d % 7
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        lum = (
            (3 * x + 5 * y + 7 * d) % 256
            + (11 * x + 2 * y + 13 * d) % 256
            + (7 * x + 17 * y + 3 * d) % 256
        ) // 3
        exp = np.bincount((lum // 64).ravel(), minlength=4)
        r = out.loc[d]
        assert (r["src_w"], r["src_h"]) == (w, h)
        assert [r["b0"], r["b1"], r["b2"], r["b3"]] == exp.tolist()
        assert int(r[["b0", "b1", "b2", "b3"]].sum()) == w * h


def test_kendall_tau_daily_hand():
    """Two types over 4 calendar days; counts x=(2,1,1,0), y=(1,0,2,1).
    Pairs (i<j over 6): dx/dy signs ->
      (0,1): x 2>1, y 1>0 -> concordant
      (0,2): x 2>1, y 1<2 -> discordant
      (0,3): x 2>0, y 1=1 -> tie_y
      (1,2): x 1=1, y 0<2 -> tie_x
      (1,3): x 1>0, y 0<1 -> discordant
      (2,3): x 1>0, y 2>1 -> concordant
    C=2 D=2 ties_x=1 ties_y=1 -> tau = 0 / sqrt(5*5) = 0."""
    from kgray.ops.stats import kendall_tau_daily

    rows = []
    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    xs, ys = [2, 1, 1, 0], [1, 0, 2, 1]
    for d, x, y in zip(days, xs, ys):
        rows += [{"event_type": "view", "ts": pd.Timestamp(d)}] * x
        rows += [{"event_type": "purchase", "ts": pd.Timestamp(d)}] * y
    out = kendall_tau_daily(ray.data.from_pandas(pd.DataFrame(rows)))
    r = out.iloc[0]
    assert (
        r["n_days"], r["n_pairs"], r["concordant"], r["discordant"],
        r["ties_x"], r["ties_y"], r["tau"],
    ) == (4, 6, 2, 2, 1, 1, 0.0)


def test_kendall_tau_daily_degenerate():
    from kgray.ops.stats import kendall_tau_daily

    # constant x series (all pairs tied in x) -> den 0 -> no row
    rows = [
        {"event_type": "view", "ts": pd.Timestamp("2024-01-01")},
        {"event_type": "view", "ts": pd.Timestamp("2024-01-02")},
        {"event_type": "purchase", "ts": pd.Timestamp("2024-01-01")},
        {"event_type": "purchase", "ts": pd.Timestamp("2024-01-02")},
        {"event_type": "purchase", "ts": pd.Timestamp("2024-01-02")},
    ]
    assert len(kendall_tau_daily(ray.data.from_pandas(pd.DataFrame(rows)))) == 0
    # empty input -> empty frame, right columns
    empty = kendall_tau_daily(
        ray.data.from_pandas(
            pd.DataFrame({"event_type": pd.Series(dtype=str),
                          "ts": pd.Series(dtype="datetime64[us]")})
        )
    )
    assert list(empty.columns) == [
        "n_days", "n_pairs", "concordant", "discordant", "ties_x", "ties_y", "tau"
    ]
    assert len(empty) == 0


def test_rake_keywords_hand():
    """Two docs; 'and'/'the' are stopword boundaries.  Candidate phrases:
    'quick brown fox' (x2, len 3) and 'lazy dog' (len 2).  Word scores
    (deg*1e6 // freq): quick/brown/fox = 6e6//2 = 3e6, lazy/dog = 2e6.
    Phrase scores: 9e6 and 4e6."""
    from kgray.ops.text import rake_keywords

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {"text": ["quick brown fox and the lazy dog", "quick brown fox"]}
        )
    )
    out = rake_keywords(docs)
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("quick brown fox", 2, 9_000_000),
        ("lazy dog", 1, 4_000_000),
    ]


def test_rake_keywords_cap_and_empty():
    from kgray.ops.text import rake_keywords

    # a 5-token run is discarded entirely (candidates AND word stats)
    docs = ray.data.from_pandas(
        pd.DataFrame({"text": ["alpha beta gamma delta epsilon", "alpha beta"]})
    )
    out = rake_keywords(docs, max_phrase_len=4)
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("alpha beta", 1, 4_000_000)
    ]
    # all-stopword corpus -> empty frame with the right columns
    empty = rake_keywords(
        ray.data.from_pandas(pd.DataFrame({"text": ["the and of", ""]}))
    )
    assert len(empty) == 0
    assert list(empty.columns) == ["phrase", "n_occurrences", "score_micro"]


def test_lsh_bucket_balance_invariant():
    """Total histogram mass == n_docs x n_bands (every doc lands in exactly
    one bucket per band), and identical docs share every band bucket."""
    from kgray.ops.dedup import lsh_bucket_balance

    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha beta gamma delta epsilon zeta",
                    "alpha beta gamma delta epsilon zeta",
                    "one two three four five six seven",
                ],
            }
        )
    )
    out = lsh_bucket_balance(docs, n_bands=21)
    assert int((out["bucket_size"] * out["n_buckets"]).sum()) == 3 * 21
    # docs 1 and 2 are identical -> 21 buckets of size exactly 2
    assert int(out.loc[out["bucket_size"] == 2, "n_buckets"].sum()) == 21
