"""Edge-case semantics of the distributed statistics ops
(kgray/ops/stats.py): the discrete-quantile index formula (ceil(q*n)-1,
integer arithmetic), per-group isolation, and top-n ordering/tie-breaks
across multiple blocks.  Full value checks vs DuckDB (quantile_disc /
unnest counting) live in tests/test_oracles.py."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.stats import grouped_quantiles, token_frequencies


def test_grouped_quantiles_index_formula(ray_session):
    # group a: sorted values 10,20,30,40 (n=4) — quantile_disc picks
    # index ceil(q*n)-1: p50 → idx 1 → 20; p60 → idx ceil(2.4)-1=2 → 30
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 4 + ["b"] * 5,
            "cents": [40, 10, 30, 20, 5, 4, 3, 2, 1],
        }
    )
    out = grouped_quantiles(
        ray.data.from_pandas([df.iloc[:3], df.iloc[3:]]),
        group_col="event_type",
        value_col="cents",
        quantiles=((5, 10), (6, 10), (1, 10), (10, 10)),
    ).set_index("event_type")
    assert out.loc["a", "n"] == 4
    assert out.loc["a", "p50"] == 20 and out.loc["a", "p60"] == 30
    assert out.loc["a", "p10"] == 10 and out.loc["a", "p100"] == 40
    # group b: 1..5 (n=5) — p50 → idx ceil(2.5)-1=2 → 3
    assert out.loc["b", "p50"] == 3


def test_grouped_quantiles_duplicate_values(ray_session):
    # histogram path: duplicates collapse to counts but ranks still count
    # every occurrence (7,7,7,9 → p50 = 7, p100 = 9)
    df = pd.DataFrame({"event_type": ["x"] * 4, "cents": [7, 7, 9, 7]})
    out = grouped_quantiles(
        ray.data.from_pandas(df), quantiles=((5, 10), (10, 10))
    ).set_index("event_type")
    assert out.loc["x", "p50"] == 7 and out.loc["x", "p100"] == 9


def test_token_frequencies_order_and_ties(ray_session):
    # counts: b=3, a=3, c=2 — ties break by token asc; two blocks so the
    # per-batch pre-count really merges across blocks
    df = pd.DataFrame({"text": ["a b c", "b a c", "b a"]})
    out = token_frequencies(
        ray.data.from_pandas([df.iloc[:1], df.iloc[1:]]), top_n=2
    )
    assert list(out["token"]) == ["a", "b"]
    assert list(out["cnt"]) == [3, 3]


def test_json_field_rollup_null_semantics(ray_session):
    from kgray.ops.nested import json_field_rollup

    df = pd.DataFrame(
        {
            "event_type": ["a", "a", "a", "b", "b"],
            "props": ['{"k": 5}', '{"x": 1}', "not json", '{"k": 7}', None],
        }
    )
    out = json_field_rollup(ray.data.from_pandas(df)).set_index("event_type")
    # missing field / malformed / null rows don't count and don't crash
    assert out.loc["a", "n_k"] == 1 and out.loc["a", "sum_k"] == 5
    assert out.loc["b", "n_k"] == 1 and out.loc["b", "sum_k"] == 7


def test_hll_accuracy_and_partition_invariance(ray_session):
    from kgray.ops.stats import hll_distinct_tokens

    rng = np.random.default_rng(3)
    # ~4000 distinct tokens spread over 300 docs, heavy repetition
    vocab = [f"tok{i}" for i in range(4000)]
    docs = pd.DataFrame(
        {
            "doc_id": range(300),
            "text": [
                " ".join(rng.choice(vocab, size=200)) for _ in range(300)
            ],
        }
    )
    exact = len(set(" ".join(docs["text"]).split()))
    out1 = hll_distinct_tokens(ray.data.from_pandas(docs))
    assert out1.loc[0, "n_exact"] == exact
    # m=256 -> ~6.5% standard error; 3 sigma bound
    assert abs(out1.loc[0, "est_distinct"] - exact) / exact < 0.2
    # sketch is mergeable: block layout must not change the estimate
    out2 = hll_distinct_tokens(ray.data.from_pandas(docs).repartition(7))
    assert out1.loc[0, "est_distinct"] == out2.loc[0, "est_distinct"]
    assert out1.loc[0, "n_exact"] == out2.loc[0, "n_exact"]


def test_cms_overestimates_never_under(ray_session):
    from kgray.ops.stats import cms_token_counts

    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "apple apple apple banana",
                "apple cherry cherry",
                "banana apple",
                "durian",
            ],
        }
    )
    truth = {"apple": 5, "banana": 2, "cherry": 2, "durian": 1, "absent": 0}
    out = cms_token_counts(
        ray.data.from_pandas(df), tuple(truth), d=4, w=1024
    ).set_index("token")["est_cnt"]
    for tok, exact in truth.items():
        assert out[tok] >= exact  # CMS never underestimates
    # tiny vocab in a wide sketch: collisions are virtually impossible
    assert out["apple"] == 5 and out["absent"] == 0

    # partition invariance: 4 single-row blocks merge to the same sketch
    out4 = cms_token_counts(
        ray.data.from_pandas(df).repartition(4), tuple(truth), d=4, w=1024
    ).set_index("token")["est_cnt"]
    pd.testing.assert_series_equal(out.sort_index(), out4.sort_index())


def test_zscore_outliers(ray_session):
    from kgray.ops.stats import zscore_outliers

    vals = [10.0] * 20 + [10.5] * 20 + [1000.0]  # one wild outlier in group a
    df = pd.DataFrame(
        {
            "event_id": range(len(vals) + 3),
            "event_type": ["a"] * len(vals) + ["b"] * 3,
            "value": vals + [5.0, 5.0, 5.0],  # group b constant: sd == 0
        }
    )
    out = zscore_outliers(ray.data.from_pandas(df)).to_pandas()
    assert out["event_id"].tolist() == [len(vals) - 1]
    assert out["z"].iloc[0] > 6
    # constant group never flags (sd=0 guarded, no division blowup)
    assert not (out["event_type"] == "b").any()


def test_rolling_distinct_per_day(ray_session):
    """Sliding 7-day distinct: a user active on several window days counts
    once; target days with no events at all are dropped; boundaries are
    inclusive-trailing [d-6, d]."""
    import pandas as pd
    import ray.data

    from kgray.ops.stats import rolling_distinct_per_day

    df = pd.DataFrame(
        {
            "day": [
                "2024-01-01", "2024-01-01",  # u1, u2
                "2024-01-03",                # u1 again (same window as Jan 1)
                "2024-01-10",                # u3 far away
            ],
            "user_id": [1, 2, 1, 3],
        }
    )
    out = (
        rolling_distinct_per_day(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("day")["n_rolling"]
    )
    # observed days only: Jan 1, 3, 10
    assert set(out.index) == {"2024-01-01", "2024-01-03", "2024-01-10"}
    assert out["2024-01-01"] == 2            # u1, u2 on the day itself
    assert out["2024-01-03"] == 2            # u1 counted ONCE, u2 trailing
    assert out["2024-01-10"] == 1            # Jan 3 is 7 days back -> outside

    # partition invariance (unit-bucket shuffle rebuilds full per-user sets)
    out7 = (
        rolling_distinct_per_day(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("day")["n_rolling"]
    )
    assert out7.sort_index().equals(out.sort_index())


def test_winsorized_mean_clips_outliers():
    import ray.data

    from kgray.ops.stats import winsorized_mean

    # one key, 100 values 1..99 plus a huge outlier; p95 bound clips it
    vals = list(range(1, 100)) + [10_000]
    df = pd.DataFrame({"event_type": ["a"] * 100, "value": [float(v) for v in vals]})
    out = winsorized_mean(ray.data.from_pandas(df))
    assert out["n"].tolist() == [100]
    # cume-dist p95 over cents: min c with cdf >= 0.95 -> 95*100 cents
    assert out["hi_cents"].tolist() == [9500]
    assert out["lo_cents"].tolist() == [500]
    raw = np.clip(np.array(vals) * 100, 500, 9500).sum() / 100 / 100
    assert abs(out["wmean"].iloc[0] - round(raw, 4)) < 1e-9


def test_winsorized_mean_empty():
    import ray.data

    from kgray.ops.stats import winsorized_mean

    ds = ray.data.from_pandas(
        pd.DataFrame({"event_type": pd.Series(dtype=object), "value": pd.Series(dtype="float64")})
    )
    assert len(winsorized_mean(ds)) == 0


def test_decay_engagement_exact_weights(ray_session):
    import ray.data

    from kgray.ops.stats import decay_engagement

    # two users; watermark = latest event. user 1: event AT the watermark
    # (decay 1.0) + one exactly 7 days old (decay e^-1); user 2: one event
    # 14 days old (decay e^-2).
    t0 = pd.Timestamp("2024-03-01 00:00:00")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": [t0, t0 - pd.Timedelta(days=7), t0 - pd.Timedelta(days=14)],
            "value": [10.0, 10.0, 100.0],
        }
    )
    out = decay_engagement(ray.data.from_pandas(df).repartition(3)).set_index("user_id")
    m1 = np.floor(np.exp(-1.0) * 1e6 + 0.5)
    m2 = np.floor(np.exp(-2.0) * 1e6 + 0.5)
    exp1 = np.floor((1000 * 1e6 + 1000 * m1) / 1e8 * 1e4 + 0.5) / 1e4
    exp2 = np.floor(10000 * m2 / 1e8 * 1e4 + 0.5) / 1e4
    assert out.loc[1, "n"] == 2 and out.loc[2, "n"] == 1
    assert out.loc[1, "decay_score"] == exp1
    assert out.loc[2, "decay_score"] == exp2


def test_decay_engagement_empty(ray_session):
    import ray.data

    from kgray.ops.stats import decay_engagement

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "ts": pd.Series(dtype="datetime64[us]"),
                "value": pd.Series(dtype="float64"),
            }
        )
    )
    assert len(decay_engagement(ds)) == 0


def test_mad_outliers_flags_and_partition_invariance(ray_session):
    import ray.data

    from kgray.ops.stats import mad_outliers

    # key a: cents sorted [100,300,400,500,500,500,600,700,900,10000];
    # median = min c with cdf >= 0.5 -> 500.  Deviations sorted
    # [0,0,0,100,100,200,200,400,400,9500]; MAD = min d with cdf >= 0.5
    # -> 100.  Flag |c-500| > 300 -> devs 400 (values 1, 9) and 9500.
    df = pd.DataFrame(
        {
            "event_id": range(10),
            "event_type": ["a"] * 10,
            "value": [1.0, 3.0, 4.0, 5.0, 5.0, 5.0, 6.0, 7.0, 9.0, 100.0],
        }
    )
    out = mad_outliers(ray.data.from_pandas(df)).to_pandas().sort_values("event_id")
    assert out["event_id"].tolist() == [0, 8, 9]
    assert out["mad_cents"].tolist() == [100, 100, 100]
    assert out["dev_cents"].tolist() == [400, 400, 9500]
    out3 = mad_outliers(ray.data.from_pandas(df).repartition(4)).to_pandas()
    assert out3.sort_values("event_id").reset_index(drop=True).equals(
        out.sort_values("event_id").reset_index(drop=True)
    )


def test_mad_outliers_empty(ray_session):
    import ray.data

    from kgray.ops.stats import mad_outliers

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype=object),
                "value": pd.Series(dtype="float64"),
            }
        )
    )
    out = mad_outliers(ds)
    assert out.count() == 0
    assert out.schema().names == ["event_id", "event_type", "dev_cents", "mad_cents"]


def test_bigram_frequencies_raw_positions(ray_session):
    import ray.data

    from kgray.ops.stats import bigram_frequencies

    # double space: "a  b" splits to [a, '', b] -> NO "a b" bigram (the
    # empty middle kills both raw-adjacent pairs); row boundary never pairs
    df = pd.DataFrame({"text": ["a b a b", "a  b", "b"]})
    out = bigram_frequencies(ray.data.from_pandas(df).repartition(2), top_n=5)
    got = dict(zip(out["bigram"], out["cnt"]))
    assert got == {"a b": 2, "b a": 1}
    # tie-break: count desc then bigram asc
    assert out["bigram"].tolist() == ["a b", "b a"]


def test_grouped_mode_tie_breaks(ray_session):
    import ray.data

    from kgray.ops.stats import grouped_mode

    # key a: 2.0 x2, 1.0 x2 -> tie broken by smaller cents (100)
    df = pd.DataFrame(
        {
            "event_type": ["a"] * 4 + ["b"] * 3,
            "value": [2.0, 1.0, 2.0, 1.0, 7.0, 7.0, 3.0],
        }
    )
    out = grouped_mode(ray.data.from_pandas(df).repartition(3)).set_index("event_type")
    assert out.loc["a", "mode_cents"] == 100 and out.loc["a", "n_mode"] == 2
    assert out.loc["b", "mode_cents"] == 700 and out.loc["b", "n_mode"] == 2


def test_daily_anomalies_integer_predicate(ray_session):
    import ray.data

    from kgray.ops.stats import daily_anomalies

    # type a: 9 quiet days of 10 events + one day of 100 -> flags;
    # type b: constant -> variance 0, the strict > never fires
    t = []
    for d in range(9):
        t += [("a", pd.Timestamp(f"2024-01-{d+1:02d} 12:00:00"))] * 10
    t += [("a", pd.Timestamp("2024-01-10 12:00:00"))] * 100
    t += [("b", pd.Timestamp("2024-01-01 12:00:00"))] * 5
    t += [("b", pd.Timestamp("2024-01-02 12:00:00"))] * 5
    df = pd.DataFrame(t, columns=["event_type", "ts"])
    out = daily_anomalies(ray.data.from_pandas(df).repartition(4), k_sigma=2)
    assert out["event_type"].tolist() == ["a"]
    assert out["day"].tolist() == ["2024-01-10"]
    assert out["n_events"].tolist() == [100]


def test_hll_store_incremental_equals_oneshot(ray_session, tmp_path):
    from kgray.ops.stats import hll_distinct_tokens, hll_distinct_with_store

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(3000)]
    docs = pd.DataFrame(
        {
            "doc_id": range(200),
            "text": [" ".join(rng.choice(vocab, size=80)) for _ in range(200)],
        }
    )
    oneshot = hll_distinct_tokens(ray.data.from_pandas(docs))["est_distinct"].iloc[0]
    store = str(tmp_path / "hll")
    a = ray.data.from_pandas(docs.iloc[:90])
    b = ray.data.from_pandas(docs.iloc[90:])
    hll_distinct_with_store(a, store, run_id="r1")
    two = hll_distinct_with_store(b, store, run_id="r2")["est_distinct"].iloc[0]
    assert two == oneshot  # register max-merge is exact, not approximate
    # idempotent resume: re-running a run overwrites its own file, no drift
    three = hll_distinct_with_store(b, store, run_id="r2")["est_distinct"].iloc[0]
    assert three == oneshot


def test_type_phi_correlation_signs(ray_session):
    from kgray.ops.stats import type_phi_correlation

    # users 1-4: a & b always together (phi=1 over {a,b} among carriers);
    # users 5-8: only c.  a-c never co-occur -> strong negative phi.
    rows = []
    for u in (1, 2, 3, 4):
        rows += [(u, "a"), (u, "b")]
    for u in (5, 6, 7, 8):
        rows.append((u, "c"))
    df = pd.DataFrame(rows, columns=["user_id", "event_type"])
    out = type_phi_correlation(ray.data.from_pandas(df).repartition(3)).set_index(["ta", "tb"])
    assert out.loc[("a", "b"), "phi"] == 1.0
    assert out.loc[("a", "c"), "phi"] == -1.0
    assert out.loc[("a", "b"), "n11"] == 4
    # partition invariance
    out2 = type_phi_correlation(ray.data.from_pandas(df).repartition(7)).set_index(["ta", "tb"])
    assert out2.sort_index().equals(out.sort_index())


def test_daily_autocorr_alternating_series(ray_session):
    from kgray.ops.stats import daily_autocorr

    # alternating 1,3,1,3... daily counts -> consecutive pairs perfectly
    # anti-correlated (r1 = -1)
    rows = []
    for d in range(8):
        n = 1 if d % 2 == 0 else 3
        for i in range(n):
            rows.append(("a", pd.Timestamp(f"2024-01-{d+1:02d} 0{i}:00:00")))
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    out = daily_autocorr(ray.data.from_pandas(df).repartition(3))
    assert out["event_type"].tolist() == ["a"]
    assert out["r1"].tolist() == [-1.0]
    assert out["n_pairs"].tolist() == [7]


def test_duplicate_row_audit_counts(ray_session):
    from kgray.ops.stats import duplicate_row_audit

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["a", "a", "a", "b", "b"],
            "ts": [t0, t0, t0, t0, t0 + pd.Timedelta(seconds=1)],
            "value": [5.0, 5.0, 5.0, 7.0, 7.0],
        }
    )
    # rows 0-2 identical (1 group, 2 extra); rows 3-4 differ by ts
    out = duplicate_row_audit(ray.data.from_pandas(df).repartition(3))
    assert out["n_dup_groups"].tolist() == [1]
    assert out["n_extra_rows"].tolist() == [2]
