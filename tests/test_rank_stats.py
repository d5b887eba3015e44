"""Semantic pins for the rank statistics (KS, Mann-Whitney/AUC,
Spearman, pairwise-dot histogram) on hand-built inputs."""

import numpy as np
import pandas as pd
import pytest
import ray.data


def _events(rows):
    df = pd.DataFrame(rows)
    return ray.data.from_pandas(df)


def test_ks_identical_distributions_zero(ray_session):
    from kgray.ops.stats import ks_two_sample

    rows = [{"event_type": t, "value": v} for t in ("purchase", "view") for v in (1.0, 2.0, 3.0)]
    out = ks_two_sample(_events(rows))
    assert out["d_num"].iloc[0] == 0
    assert out["ks_d"].iloc[0] == 0.0


def test_ks_disjoint_distributions_one(ray_session):
    from kgray.ops.stats import ks_two_sample

    rows = [{"event_type": "purchase", "value": v} for v in (1.0, 2.0)] + [
        {"event_type": "view", "value": v} for v in (10.0, 20.0)
    ]
    out = ks_two_sample(_events(rows))
    assert out["ks_d"].iloc[0] == 1.0
    assert out["n_a"].iloc[0] == 2 and out["n_b"].iloc[0] == 2


def test_mannwhitney_full_separation_auc_one(ray_session):
    from kgray.ops.stats import mannwhitney_auc

    # every purchase value above every view value -> AUC 1
    rows = [{"event_type": "purchase", "value": v} for v in (10.0, 20.0)] + [
        {"event_type": "view", "value": v} for v in (1.0, 2.0)
    ]
    out = mannwhitney_auc(_events(rows))
    assert out["auc"].iloc[0] == 1.0
    assert out["u2"].iloc[0] == 2 * 2 * 2  # 2*U = 2*na*nb


def test_mannwhitney_ties_half(ray_session):
    from kgray.ops.stats import mannwhitney_auc

    # all values equal -> AUC exactly 0.5 via midranks
    rows = [{"event_type": t, "value": 5.0} for t in ("purchase", "view")] * 3
    out = mannwhitney_auc(_events(rows))
    assert out["auc"].iloc[0] == 0.5


def test_spearman_monotone_one(ray_session, tmp_path):
    from kgray.pipelines.relational import qty_discount_spearman

    # discount strictly increases with quantity -> rho = 1
    df = pd.DataFrame(
        {"l_quantity": [1.0, 2.0, 3.0, 4.0], "l_discount": [0.01, 0.02, 0.03, 0.04]}
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "lineitem.parquet")
    out = qty_discount_spearman(str(d))
    assert out["rho"].iloc[0] == pytest.approx(1.0)
    df["l_discount"] = [0.04, 0.03, 0.02, 0.01]
    df.to_parquet(d / "lineitem.parquet")
    out = qty_discount_spearman(str(d))
    assert out["rho"].iloc[0] == pytest.approx(-1.0)


def test_pairwise_dot_hist_counts_all_pairs(ray_session):
    from kgray.ops.similarity import pairwise_dot_hist

    rng = np.random.default_rng(3)
    n = 37
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.normal(size=64).astype(np.float32) * 0.1 for _ in range(n)],
        }
    )
    out = pairwise_dot_hist(ray.data.from_pandas(df), batch_size=8)
    assert out["n_pairs"].sum() == n * (n - 1) // 2


def test_welch_separated_means(ray_session):
    from kgray.ops.stats import welch_ttest

    rows = [{"event_type": "purchase", "value": v} for v in (10.0, 11.0, 12.0, 13.0)] + [
        {"event_type": "view", "value": v} for v in (1.0, 2.0, 1.5, 2.5)
    ]
    out = welch_ttest(_events(rows))
    assert out["mean_a"].iloc[0] == 11.5
    assert out["mean_b"].iloc[0] == 1.75
    assert out["t_stat"].iloc[0] > 5  # clearly separated


def test_welch_identical_zero_t(ray_session):
    from kgray.ops.stats import welch_ttest

    rows = [{"event_type": t, "value": v} for t in ("purchase", "view") for v in (1.0, 2.0, 3.0)]
    out = welch_ttest(_events(rows))
    assert out["t_stat"].iloc[0] == 0.0


def test_hhi_monopoly_and_uniform(ray_session, tmp_path):
    from kgray.pipelines.relational import nation_revenue_hhi

    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame({"c_custkey": [1, 2], "c_nationkey": [0, 1]}).to_parquet(
        d / "customer.parquet"
    )
    # all revenue in nation 0 -> HHI = 1, top_share = 1
    pd.DataFrame({"o_custkey": [1, 1], "o_totalprice": [10.0, 20.0]}).to_parquet(
        d / "orders.parquet"
    )
    out = nation_revenue_hhi(str(d))
    assert out["hhi"].iloc[0] == 1.0 and out["top_share"].iloc[0] == 1.0
    # 50/50 split -> HHI = 0.5
    pd.DataFrame({"o_custkey": [1, 2], "o_totalprice": [15.0, 15.0]}).to_parquet(
        d / "orders.parquet"
    )
    out = nation_revenue_hhi(str(d))
    assert out["hhi"].iloc[0] == 0.5 and out["top_share"].iloc[0] == 0.5


def test_centroid_drift_identical_halves(ray_session):
    from kgray.ops.similarity import centroid_drift

    # even and odd ids get the SAME vector -> cosine 1, shift 0
    v = np.arange(64, dtype=np.float64) / 64.0
    df = pd.DataFrame(
        {"vec_id": np.arange(10, dtype=np.int64), "embedding": [v.copy() for _ in range(10)]}
    )
    out = centroid_drift(ray.data.from_pandas(df))
    assert out["cosine"].iloc[0] == 1.0
    assert out["max_dim_shift"].iloc[0] == 0.0
    assert out["n_even"].iloc[0] == 5 and out["n_odd"].iloc[0] == 5


def test_centroid_drift_orthogonal_halves(ray_session):
    from kgray.ops.similarity import centroid_drift

    a = np.zeros(64); a[0] = 1.0
    b = np.zeros(64); b[1] = 1.0
    df = pd.DataFrame(
        {
            "vec_id": np.arange(4, dtype=np.int64),
            "embedding": [a, b, a, b],  # even ids -> a, odd -> b
        }
    )
    out = centroid_drift(ray.data.from_pandas(df))
    assert out["cosine"].iloc[0] == 0.0
    assert out["max_dim_shift"].iloc[0] == 1.0
