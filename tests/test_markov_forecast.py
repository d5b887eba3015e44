"""Pins for markov_stationary, seasonal_naive_backtest, customer_lorenz_curve."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.temporal import markov_stationary, seasonal_naive_backtest


def _events(rows):
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    if "event_id" not in df:
        df["event_id"] = np.arange(len(df), dtype=np.int64)
    return ray.data.from_pandas(df)


def test_markov_two_state_cycle(ray_session):
    # a -> b -> a -> b ... : stationary = (1/2, 1/2)
    rows = [
        {"user_id": 1, "event_type": t, "ts": f"2024-01-01 00:0{i}:00"}
        for i, t in enumerate(["a", "b", "a", "b", "a"])
    ]
    out = markov_stationary(_events(rows))
    m = dict(zip(out["event_type"], out["stationary"]))
    assert abs(m["a"] - 0.5) < 1e-9
    assert abs(m["b"] - 0.5) < 1e-9


def test_markov_absorbing_state(ray_session):
    # a -> b and b never leaves: all mass drains to b
    rows = [
        {"user_id": 1, "event_type": "a", "ts": "2024-01-01 00:00:00"},
        {"user_id": 1, "event_type": "b", "ts": "2024-01-01 00:01:00"},
    ]
    out = markov_stationary(_events(rows))
    m = dict(zip(out["event_type"], out["stationary"]))
    assert m["b"] > 0.99
    assert m["a"] < 0.01


def test_seasonal_naive_perfect_weekly_cycle(ray_session):
    # same count every 7 days -> MAE 0
    rows = []
    for week in range(3):
        for d in (0, 3):
            day = week * 7 + d
            rows.append(
                {"user_id": 1, "event_type": "x", "ts": f"2024-01-{day + 1:02d} 12:00:00"}
            )
    out = seasonal_naive_backtest(_events(rows))
    assert out["mae"].iloc[0] == 0.0
    assert out["n_days"].iloc[0] == 4  # weeks 2 and 3 backtested, 2 days each


def test_lorenz_uniform(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgray.pipelines.relational import customer_lorenz_curve

    t = pa.table(
        {
            "o_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "o_totalprice": pa.array([10.0] * 5, pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    out = customer_lorenz_curve(str(tmp_path))
    # uniform spend: decile d covers n*d//10 customers -> share = that/5
    m = dict(zip(out["decile"], out["cum_share"]))
    assert m[10] == 1.0
    assert abs(m[5] - 0.4) < 1e-9  # 5*5//10 = 2 of 5 customers


def test_markov_entropy_deterministic_chain_zero(ray_session):
    from kgray.ops.temporal import markov_entropy_rate

    # a->b->a->b: every transition deterministic -> entropy rate 0
    rows = [
        {"user_id": 1, "event_type": t, "ts": f"2024-01-01 00:0{i}:00"}
        for i, t in enumerate(["a", "b", "a", "b", "a"])
    ]
    out = markov_entropy_rate(_events(rows))
    assert abs(out["entropy_rate"].iloc[0]) < 1e-9


def test_conversion_lag_bins(ray_session):
    from kgray.ops.temporal import conversion_lag_hist

    rows = [
        {"user_id": 1, "event_type": "click", "ts": "2024-01-01 10:00:00"},
        # 100 s later -> bit_length(100) = 7
        {"user_id": 1, "event_type": "purchase", "ts": "2024-01-01 10:01:40"},
        # purchase with no prior click is dropped
        {"user_id": 2, "event_type": "purchase", "ts": "2024-01-01 09:00:00"},
    ]
    out = conversion_lag_hist(_events(rows))
    assert len(out) == 1
    assert out["lag_bin"].iloc[0] == 7
    assert out["n_conversions"].iloc[0] == 1


def test_theilsen_linear_series(ray_session):
    from kgray.ops.temporal import theil_sen_trend

    # counts 1,2,3,...,6 per day -> every pairwise slope is 1
    rows = []
    for d in range(1, 7):
        rows += [{"ts": pd.Timestamp(f"2024-01-0{d} 08:00:00")}] * d
    out = theil_sen_trend(ray.data.from_pandas(pd.DataFrame(rows)))
    assert out["slope"].iloc[0] == 1.0
    assert out["n_pairs"].iloc[0] == 15


def test_theilsen_outlier_immune(ray_session):
    from kgray.ops.temporal import theil_sen_trend

    # flat at 5/day with one 100-spike: median slope stays 0
    counts = [5, 5, 5, 100, 5, 5, 5]
    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [{"ts": pd.Timestamp(f"2024-01-0{d} 08:00:00")}] * c
    out = theil_sen_trend(ray.data.from_pandas(pd.DataFrame(rows)))
    assert out["slope"].iloc[0] == 0.0


def test_exposure_uplift_cohorts(ray_session):
    from kgray.ops.temporal import exposure_uplift

    rows = (
        # user 1: 4 errors (above avg), 1 purchase
        [{"user_id": 1, "event_type": "error"}] * 4
        + [{"user_id": 1, "event_type": "purchase"}]
        # user 2: 0 errors, 3 purchases
        + [{"user_id": 2, "event_type": "purchase"}] * 3
        # user 3: 0 errors, 1 purchase (avg error = 4/3; cut e*3 > 4)
        + [{"user_id": 3, "event_type": "purchase"}]
    )
    out = exposure_uplift(ray.data.from_pandas(pd.DataFrame(rows)))
    assert out["exp_users"].iloc[0] == 1 and out["ctl_users"].iloc[0] == 2
    assert out["rate_exposed"].iloc[0] == 1.0
    assert out["rate_control"].iloc[0] == 2.0
    assert out["rate_ratio"].iloc[0] == 0.5


def test_run_length_census(ray_session):
    rows = [
        {"user_id": 1, "event_type": t, "ts": f"2024-01-01 00:0{i}:00", "event_id": i}
        for i, t in enumerate(["a", "a", "a", "b", "a"])
    ] + [
        {"user_id": 2, "event_type": "a", "ts": "2024-01-01 09:00:00", "event_id": 99}
    ]
    from kgray.ops.temporal import run_length_census

    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"])
    out = run_length_census(ray.data.from_pandas(df))
    m = {(r.event_type, r.run_len): r.n_runs for r in out.itertuples()}
    # user1: aaa (3), b (1), a (1); user2: a (1) -> runs don't span users
    assert m[("a", 3)] == 1 and m[("a", 1)] == 2 and m[("b", 1)] == 1


def test_frequency_cap_audit(ray_session):
    from kgray.ops.temporal import frequency_cap_audit

    rows = [
        # user 1 'a': 0s, +100s (suppressed), +2h (kept w/ ttl 3600)
        {"user_id": 1, "event_type": "a", "ts": "2024-01-01 00:00:00", "event_id": 1},
        {"user_id": 1, "event_type": "a", "ts": "2024-01-01 00:01:40", "event_id": 2},
        {"user_id": 1, "event_type": "a", "ts": "2024-01-01 02:30:00", "event_id": 3},
        # different type not capped against 'a'
        {"user_id": 1, "event_type": "b", "ts": "2024-01-01 00:00:30", "event_id": 4},
    ]
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"])
    out = frequency_cap_audit(ray.data.from_pandas(df), ttl_s=3600).set_index("event_type")
    assert out.loc["a", "n_events"] == 3 and out.loc["a", "n_suppressed"] == 1
    assert out.loc["b", "n_suppressed"] == 0


def test_dominant_cycle_weekly(ray_session):
    from kgray.ops.temporal import dominant_cycle

    # period-7 square wave over 28 days: lag 7 wins
    rows = []
    for d in range(28):
        c = 20 if d % 7 == 0 else 5
        rows += [{"ts": pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, hours=9)}] * c
    out = dominant_cycle(ray.data.from_pandas(pd.DataFrame(rows)))
    assert out["best_lag"].iloc[0] == 7
    assert out["strength"].iloc[0] > 0.5
