"""Pin the scale-factor-independent DuckDB SQL oracles against their Ray
pipelines at sf0.001 (the driver's own gate runs at sf0.01; this keeps the
oracle SQL honest in CI at the cheap scale).

The closed-world KG oracles are NOT exercised here: their SQL pins the
driver's sf0.01 transcript cache by construction (see
__ray_entry__._closed_world_oracle_ctes) — they are covered by
tools/check_correctness.py and the driver gate.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64").round(6)
        else:
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(query: str):
    import __ray_entry__ as m

    mine = m.queries()[query](SF)
    if hasattr(mine, "to_pandas"):
        mine = mine.to_pandas()
    con = duckdb.connect()
    for t in (
        "documents",
        "embeddings",
        "events",
        "customer",
        "orders",
        "lineitem",
        "nation",
        "region",
        "part",
        "supplier",
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = con.sql(m.oracle_sql()[query]).df()
    pd.testing.assert_frame_equal(_canon(mine), _canon(oracle))


# knn_ivf & friends work here too: the embeddings table is 500 rows at
# every scale factor, so the k-means oracle's embedded 500-row seeded
# init indices pin sf0.001 exactly as they pin the driver's sf0.01
@pytest.mark.parametrize(
    "query",
    [
        "knn_ivf",
        "embedding_kmeans",
        "embedding_semdedup",
        "doc_simhash_pairs",
        "doc_simhash_components",
        "doc_simhash_triangles",
        "doc_minhash_dedup",
        "doc_ngram_jaccard",
        "knn_lsh",
        "events_windowed_6h",
        "events_asof_attribution",
        "events_error_burst",
        "events_user_running",
        "top_docs_per_lang",
        "doc_contamination",
        "doc_stratified_sample",
        "doc_repetition",
        "events_value_deciles",
        "events_zscore_outliers",
        "doc_top_tokens",
        "events_props_rollup",
        "doc_pii_scrub",
        "doc_bm25_rank",
        "doc_inverted_index",
        "multimodal_frame_sample",
        "multimodal_resize",
        "multimodal_audio_windows",
        "shipping_priority",
        "returned_items",
        "doc_cms_counts",
        "doc_unigram_lm",
        "kg_pagerank_events",
        "doc_hll_distinct",
        "doc_normalize",
        "doc_cooccur_pmi",
        "events_funnel",
        "events_cohort",
        "doc_split_overlap",
        "doc_length_filter",
        "corpus_curation",
        "doc_pack_sequences",
        "doc_segment_dedup",
        "doc_classifier_score",
        "embedding_pca",
        "doc_novelty",
        "doc_bigram_lm",
        "doc_mixture",
        "doc_packed_shards",
        "kg_khop_events",
        "doc_hash_embed",
        "doc_ppl_buckets",
        "doc_incremental_dedup",
        "events_value_percentile",
        "events_dau",
        "events_transitions",
        "curated_packed",
        "doc_minhash_incremental",
        "knn_join_self",
        "doc_dsir_weights",
        "kg_kcore_events",
        "doc_simhash_dedup",
        "doc_token_entropy",
        "doc_bloom_contamination",
        "corpus_curation_fuzzy",
        "doc_unigram_lm_by_lang",
        "events_decay_score",
        "events_mad_outliers",
        "events_cusum",
        "doc_tfidf_topk",
        "events_asof_forward",
        "events_rolling_sum",
        "doc_boolean_search",
        "events_rollup",
        "order_fulfillment_latency",
        "events_user_gaps",
        "embedding_standardize",
        "doc_top_bigrams",
        "kg_diff_events",
        "customer_ltv_quantiles",
        "events_session_funnel",
        "part_skyline",
        "events_mode",
        "doc_dedup_weights",
        "events_heatmap",
        "events_daily_anomaly",
        "doc_jsonl_roundtrip",
        "orders_backlog_daily",
        "doc_hll_incremental",
        "events_first_last",
        "doc_missing_embeddings",
        "customer_rfm_segments",
        "doc_minhash_match_hist",
        "doc_weighted_sample",
        "events_pct_by_type",
        "events_burstiness",
        "events_interarrival_hist",
        "events_type_combos",
        "events_daily_delta",
        "forecast_revenue_change",
        "promo_revenue_share",
        "bilateral_trade",
        "customer_order_dist",
        "nation_market_share",
        "supplier_part_coverage",
        "product_profit",
        "important_parts",
        "dominant_suppliers",
        "waiting_suppliers",
        "idle_customer_balance",
        "min_balance_supplier",
        "lineitem_qty_discount_spearman",
        "events_ks_test",
        "events_mannwhitney",
        "embedding_dot_hist",
        "events_changepoint",
        "events_burst_users",
        "events_heavy_hitters",
        "doc_gopher_rules",
        "doc_minhash_eval",
        "doc_minhash_eval_sampled",
        "knn_ivf_recall",
        "knn_truncated_recall",
        "events_circadian",
        "events_welch_ttest",
        "nation_revenue_hhi",
        "engagement_revenue_link",
        "events_theilsen_trend",
        "events_error_uplift",
        "orders_seasonal_index",
        "doc_encoding_audit",
        "events_run_lengths",
        "events_frequency_cap",
        "events_dominant_cycle",
        "embedding_centroid_drift",
        "doc_readability",
        "doc_zipf_slope",
        "doc_heaps_curve",
        "events_user_entropy",
        "events_value_gini",
        "doc_substring_dedup",
        "embedding_outlier_z",
        "kg_assortativity_events",
        "customer_segment_chi2",
        "events_stickiness",
        "doc_lang_confusion",
        "doc_token_len_hist",
        "doc_winnowing_pairs",
        "embedding_jl_project",
        "orders_cohort_retention",
        "doc_bpe_top_pairs",
        "events_markov_stationary",
        "events_seasonal_naive",
        "customer_lorenz_curve",
        "market_basket_lift",
        "events_bounce_rate",
        "events_trending",
        "doc_source_jsd",
        "embedding_knn_loo",
        "events_ltv_age_curve",
        "fk_integrity_audit",
        "doc_hapax_ratio",
        "events_type_drift",
        "doc_kmv_distinct",
        "doc_mixing_weights",
        "embedding_label_cosine",
        "embedding_robust_z",
        "lineitem_discount_elasticity",
        "events_seasonal_anomalies",
        "events_retention_decay",
        "events_hash_split",
        "events_activity_powerlaw",
        "events_linear_attribution",
        "events_error_pchart",
        "events_streaks",
        "events_share_ztest",
        "orders_basket_size",
        "events_session_paths",
        "events_holt_smooth",
        "events_weekday_cosine",
        "events_markov_entropy",
        "events_conversion_lag",
        "doc_sentence_stats",
        "events_benford",
        "doc_cluster_size_hist",
        "orders_profile",
        "events_daily_autocorr",
        "events_type_phi",
        "doc_length_psi",
        "doc_lang_kl",
        "lineitem_price_qty_corr",
        "events_dup_audit",
        "events_shard_skew",
        "doc_rrf_fusion",
        "doc_classifier_calibration",
        "doc_token_coverage",
        "doc_source_overlap",
        "events_quantile_sketch",
        "doc_bm25_ndcg",
        "corpus_curation_funnel",
        "embedding_cluster_cohesion",
        "multimodal_image_histogram",
        "doc_cluster_lang_purity",
        "doc_label_kappa",
        "events_crosscorr",
        "events_dau_overlap",
        "events_weekday_chi2",
        "small_qty_revenue",
        "large_orders",
        "top_supplier",
        "brand_disjunction_revenue",
        "kg_random_walks_events",
        "events_kendall_tau",
        "doc_rake_keywords",
        "doc_lsh_bucket_balance",
        "knn_filtered",
    ],
)
def test_sql_oracle_matches_ray(query):
    _compare(query)


def test_md5_u64_matches_duckdb():
    """The token/shingle hash used by MinHasher and SimHasher equals
    DuckDB's md5_number_lower — the invariant every dedup oracle rests on."""
    from kgray.ops.dedup import _md5_u64_np

    strs = ["", "hello", "a b c", "quick brown fox", "ünïcödé"]
    got = _md5_u64_np(strs)
    exp = duckdb.sql(
        "SELECT " + ", ".join(f"md5_number_lower('{s}')" for s in strs)
    ).fetchone()
    assert [int(g) for g in got] == [int(e) for e in exp]
