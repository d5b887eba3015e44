"""Edge-case semantics of the temporal operators (kgray/ops/temporal.py):
window boundary exclusivity, as-of tie handling and missing-prior rows,
zero-match lefts under left-join semantics. The full value check against
DuckDB (ASOF JOIN / interval join / epoch windows) lives in
tests/test_oracles.py."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.temporal import asof_join, range_join_count, windowed_aggregate


def _ts(*specs):
    return pd.to_datetime(list(specs), format="ISO8601")


def test_windowed_aggregate_boundaries(ray_session):
    # window = 60 s; an event exactly on the boundary opens the next window
    df = pd.DataFrame(
        {
            "event_type": ["a", "a", "a", "b"],
            "ts": _ts(
                "2024-01-01 00:00:30",
                "2024-01-01 00:00:59.999999",
                "2024-01-01 00:01:00",
                "2024-01-01 00:00:10",
            ),
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    out = windowed_aggregate(ray.data.from_pandas(df), window_seconds=60)
    got = {
        (r.event_type, r.window_start): (r.n_events, r.sum_value)
        for r in out.itertuples()
    }
    assert got[("a", "2024-01-01 00:00:00")] == (2, 3.0)
    assert got[("a", "2024-01-01 00:01:00")] == (1, 4.0)
    assert got[("b", "2024-01-01 00:00:00")] == (1, 8.0)


def test_asof_join_semantics(ray_session):
    left = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [7, 7, 9],
            "ts": _ts("2024-01-01 10:00", "2024-01-01 08:00", "2024-01-01 10:00"),
            "value": [10.0, 20.0, 30.0],
        }
    )
    right = pd.DataFrame(
        {
            "event_id": [0, 0, 0, 0],
            "user_id": [7, 7, 7, 8],
            # two clicks at the SAME (user, ts): max value (5.0) must win
            "ts": _ts(
                "2024-01-01 09:00", "2024-01-01 09:00", "2024-01-01 09:30", "2024-01-01 09:45"
            ),
            "value": [3.0, 5.0, 4.0, 99.0],
        }
    )
    out = (
        asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right))
        .to_pandas()
        .set_index("event_id")
    )
    # event 1: latest prior click for user 7 is 09:30 → 4.0
    assert out.loc[1, "prior_value"] == 4.0
    assert out.loc[1, "prior_ts"] == pd.Timestamp("2024-01-01 09:30")
    # event 2: 08:00 precedes every click → nulls
    assert pd.isna(out.loc[2, "prior_value"]) and pd.isna(out.loc[2, "prior_ts"])
    # event 3: user 9 never clicked (user 8's click must not leak across keys)
    assert pd.isna(out.loc[3, "prior_value"])


def test_asof_join_exact_tie_prefers_max_value(ray_session):
    left = pd.DataFrame(
        {"event_id": [1], "user_id": [5], "ts": _ts("2024-01-01 12:00"), "value": [1.0]}
    )
    right = pd.DataFrame(
        {
            "event_id": [0, 0],
            "user_id": [5, 5],
            "ts": _ts("2024-01-01 12:00", "2024-01-01 12:00"),  # exact match allowed
            "value": [2.0, 6.0],
        }
    )
    out = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right)).to_pandas()
    assert out.loc[0, "prior_value"] == 6.0


def test_range_join_count_window_exclusive(ray_session):
    left = pd.DataFrame(
        {"event_id": [1, 2], "ts": _ts("2024-01-01 00:00:00", "2024-01-05 00:00:00")}
    )
    right = pd.DataFrame(
        {
            "ts": _ts(
                "2024-01-01 00:00:00",  # inclusive start
                "2024-01-01 00:59:59",  # inside
                "2024-01-01 01:00:00",  # exclusive end — NOT counted
                "2023-12-31 23:59:59",  # before — not counted
            )
        }
    )
    out = range_join_count(
        ray.data.from_pandas(left), ray.data.from_pandas(right), window_seconds=3600
    ).set_index("event_id")
    assert out.loc[1, "n_matches"] == 2
    # left-join semantics: a left with zero matches is kept at 0
    assert out.loc[2, "n_matches"] == 0


def test_range_join_counts_across_bin_boundary(ray_session):
    # left interval straddles two hour bins; rights in BOTH bins count once
    left = pd.DataFrame({"event_id": [1], "ts": _ts("2024-01-01 00:30:00")})
    right = pd.DataFrame(
        {"ts": _ts("2024-01-01 00:45:00", "2024-01-01 01:15:00", "2024-01-01 01:45:00")}
    )
    out = range_join_count(
        ray.data.from_pandas(left), ray.data.from_pandas(right), window_seconds=3600
    )
    assert out.loc[0, "n_matches"] == 2  # 00:45 and 01:15; 01:45 is past 01:30


def test_funnel_strict_ordering(ray_session):
    from kgray.ops.temporal import funnel_counts

    ts = pd.to_datetime
    # u1 completes in order; u2 purchases BEFORE viewing (not counted at
    # step 2); u3 only signs up; u4 never signs up (invisible)
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2, 3, 4],
            "event_type": [
                "signup", "view", "purchase",
                "signup", "purchase", "view",
                "signup", "purchase",
            ],
            "ts": [
                ts("2024-01-01"), ts("2024-01-02"), ts("2024-01-03"),
                ts("2024-01-01"), ts("2024-01-02"), ts("2024-01-03"),
                ts("2024-01-01"), ts("2024-01-01"),
            ],
        }
    )
    out = funnel_counts(
        ray.data.from_pandas(ev), ("signup", "view", "purchase")
    ).set_index("step")
    assert out.loc["signup", "n_users"] == 3
    assert out.loc["view", "n_users"] == 2
    assert out.loc["purchase", "n_users"] == 1


def test_funnel_equal_timestamps_not_counted(ray_session):
    from kgray.ops.temporal import funnel_counts

    ts = pd.to_datetime("2024-01-01")
    ev = pd.DataFrame(
        {"user_id": [1, 1], "event_type": ["signup", "view"], "ts": [ts, ts]}
    )
    out = funnel_counts(ray.data.from_pandas(ev), ("signup", "view")).set_index("step")
    assert out.loc["signup", "n_users"] == 1
    assert out.loc["view", "n_users"] == 0  # strict > on equal ts


def test_cohort_retention_cells(ray_session):
    from kgray.ops.temporal import cohort_retention

    ts = pd.to_datetime
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": [
                ts("2024-01-01 08:00"), ts("2024-01-01 22:00"),  # same day
                ts("2024-01-03 05:00"),
                ts("2024-01-02 01:00"), ts("2024-01-03 01:00"),
            ],
        }
    )
    out = cohort_retention(ray.data.from_pandas(ev)).set_index(
        ["cohort_day", "age_days"]
    )
    assert out.loc[("2024-01-01", 0), "n_users"] == 1
    assert out.loc[("2024-01-01", 2), "n_users"] == 1
    assert out.loc[("2024-01-02", 0), "n_users"] == 1
    assert out.loc[("2024-01-02", 1), "n_users"] == 1
    assert ("2024-01-01", 1) not in out.index  # u1 inactive on day 2


def test_sessionize_gap_boundaries(ray_session):
    """Sessions split strictly when the gap EXCEEDS gap_s; ties in ts order
    by event_id; per-user session_idx restarts at 0."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import sessionize

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # user 1: 3 events within gaps, then a 31-min gap -> 2 sessions
        (1, base, 10),
        (1, base + pd.Timedelta(minutes=10), 11),
        (1, base + pd.Timedelta(minutes=40), 12),  # exactly 1800s gap: SAME session
        (1, base + pd.Timedelta(minutes=71, seconds=1), 13),  # >1800s: new session
        # user 2: single event
        (2, base, 20),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    out = (
        sessionize(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    got = list(zip(out["user_id"], out["session_idx"], out["n_events"]))
    assert got == [(1, 0, 3), (1, 1, 1), (2, 0, 1)]
    s0 = out.iloc[0]
    assert s0["end_s"] - s0["start_s"] == 40 * 60

    # partition invariance: the user-bucket shuffle rebuilds full histories
    out7 = (
        sessionize(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out7)


def test_event_motifs_user_boundaries(ray_session):
    """Trigrams never span users; ordering is (ts, event_id); top-k ties
    break lexicographically."""
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import event_motifs

    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: a b c a b c  -> abc x2, bca, cab
    for i, et in enumerate(["a", "b", "c", "a", "b", "c"]):
        rows.append((1, base + pd.Timedelta(seconds=i), i, et))
    # user 2: c a b — contributes ONE trigram (cab), no cross-user span
    for i, et in enumerate(["c", "a", "b"]):
        rows.append((2, base + pd.Timedelta(seconds=i), 100 + i, et))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "event_type"])
    out = event_motifs(ray.data.from_pandas(df).repartition(3))
    got = list(zip(out["e1"], out["e2"], out["e3"], out["n"]))
    assert got[0] == ("a", "b", "c", 2)
    assert ("c", "a", "b", 2) in got       # once from each user
    assert ("b", "c", "a", 1) in got
    # total trigrams = 4 (user1) + 1 (user2) across 3 distinct patterns
    assert out["n"].sum() == 5 and len(out) == 3


def test_cusum_alarms_recursion_and_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import cusum_alarms

    # user 1: values 10,10,1,10 with target 5 -> d = +500,+500,-400,+500
    # S = 500,1000,600,1100 ; threshold 10 ($1000 cents) -> one alarm, peak 1100
    # user 2: all below target -> S stays 0, never alarms
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": range(8),
            "user_id": [1, 1, 1, 1, 2, 2, 2, 2],
            "ts": [t0 + pd.Timedelta(minutes=i) for i in range(8)],
            "value": [10.0, 10.0, 1.0, 10.0, 1.0, 2.0, 1.0, 2.0],
        }
    )
    out = cusum_alarms(ray.data.from_pandas(df), target=5.0, threshold=10.0)
    assert out["user_id"].tolist() == [1]
    assert out["max_cusum_cents"].tolist() == [1100]
    assert out["n_alarms"].tolist() == [1]
    # reset-at-zero: a deep dip must not go negative (S clamps at 0)
    df2 = pd.DataFrame(
        {
            "event_id": range(3),
            "user_id": [7, 7, 7],
            "ts": [t0 + pd.Timedelta(minutes=i) for i in range(3)],
            "value": [0.0, 20.0, 20.0],  # d = -500, +1500, +1500
        }
    )
    out2 = cusum_alarms(ray.data.from_pandas(df2), target=5.0, threshold=10.0)
    # S = 0, 1500, 3000 (NOT 1000, 2500 — the dip clamps at zero)
    assert out2["max_cusum_cents"].tolist() == [3000]
    # partition invariance
    out3 = cusum_alarms(ray.data.from_pandas(df).repartition(5), target=5.0, threshold=10.0)
    assert out3.equals(out)


def test_asof_forward_direction(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import asof_join

    t0 = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": [t0, t0 + pd.Timedelta(hours=5)],
            "value": [1.0, 2.0],
        }
    )
    right = pd.DataFrame(
        {
            "event_id": [10, 11],
            "user_id": [1, 1],
            "ts": [t0 + pd.Timedelta(hours=1), t0 + pd.Timedelta(hours=9)],
            "value": [7.0, 9.0],
        }
    )
    out = (
        asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), direction="forward"
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 1 -> earliest right at +1h (7.0); event 2 (+5h) -> right at +9h
    assert out["next_value"].tolist() == [7.0, 9.0]
    assert out["next_ts"].tolist() == [t0 + pd.Timedelta(hours=1), t0 + pd.Timedelta(hours=9)]


def test_rolling_window_sum_peers_and_bounds(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import rolling_window_sum

    t0 = pd.Timestamp("2024-01-10")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 1],
            "ts": [
                t0 - pd.Timedelta(days=8),   # outside the 7d window of the others
                t0,
                t0,                          # equal-ts peer: both count for each other
                t0 + pd.Timedelta(days=7),   # exactly 7d later: t0 rows still inside
            ],
            "value": [100.0, 1.0, 2.0, 10.0],
        }
    )
    out = (
        rolling_window_sum(ray.data.from_pandas(df).repartition(3), window_days=7)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 1: only itself (100); events 2 & 3: peers sum 3.0 (RANGE includes
    # equal-ts rows both directions); event 4: 1+2+10 (the -8d row is out)
    assert out["window_sum"].tolist() == [100.0, 3.0, 3.0, 13.0]


def test_user_gap_stats_sentinels(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import user_gap_stats

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 2],
            "ts": [
                t0,
                t0 + pd.Timedelta(seconds=90),
                t0 + pd.Timedelta(seconds=100),
                t0 + pd.Timedelta(seconds=40),  # single-event user; watermark-60s
            ],
        }
    )
    out = (
        user_gap_stats(ray.data.from_pandas(df).repartition(3))
        .set_index("user_id")
    )
    assert out.loc[1, "n_events"] == 3
    assert out.loc[1, "max_gap_s"] == 90
    assert out.loc[1, "idle_s"] == 0          # user 1 owns the watermark
    assert out.loc[2, "n_events"] == 1
    assert out.loc[2, "max_gap_s"] == -1      # no gap exists
    assert out.loc[2, "idle_s"] == 60


def test_session_funnel_gap_and_order(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import session_funnel

    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # user 1, session 1: click then purchase -> converted
        (1, 1, t0, "click"),
        (2, 1, t0 + pd.Timedelta(minutes=5), "purchase"),
        # user 1, session 2 (>30min gap): purchase BEFORE click -> no conversion
        (3, 1, t0 + pd.Timedelta(hours=2), "purchase"),
        (4, 1, t0 + pd.Timedelta(hours=2, minutes=1), "click"),
        # user 2, one session, no click at all
        (5, 2, t0, "view"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    out = session_funnel(ray.data.from_pandas(df).repartition(3))
    assert out["n_sessions"].tolist() == [3]
    assert out["n_with_first"].tolist() == [2]
    assert out["n_converted"].tolist() == [1]


def test_session_funnel_equal_ts_converts(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import session_funnel

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": [t0, t0],  # purchase at the SAME instant as the click
            "event_type": ["click", "purchase"],
        }
    )
    out = session_funnel(ray.data.from_pandas(df))
    assert out["n_converted"].tolist() == [1]


def test_first_last_per_key_cross_block(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import first_last_per_key

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": [3, 1, 2, 9],
            "user_id": [1, 1, 1, 2],
            "ts": [t0, t0, t0 + pd.Timedelta(hours=1), t0],
            "event_type": ["b", "a", "c", "x"],
        }
    )
    # 4 single-row blocks: first/last must merge associatively across
    # partials; equal ts ties break by event_id (1 before 3)
    out = first_last_per_key(ray.data.from_pandas(df).repartition(4)).set_index("user_id")
    assert out.loc[1, "first_type"] == "a"
    assert out.loc[1, "last_type"] == "c"
    assert out.loc[1, "n_events"] == 3
    assert out.loc[2, "first_type"] == "x" and out.loc[2, "last_type"] == "x"


def test_burstiness_fano_semantics(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import burstiness_fano

    rows = []
    # user 1: 5 events every day for 4 days -> var 0 -> fano 0
    for d in range(4):
        for i in range(5):
            rows.append((1, pd.Timestamp(f"2024-01-{d+1:02d} 0{i}:00:00")))
    # user 2: counts 1 and 9 over two days -> mean 5, pop var 16 -> fano 3.2
    rows.append((2, pd.Timestamp("2024-01-01 01:00:00")))
    for i in range(9):
        rows.append((2, pd.Timestamp(f"2024-01-02 0{i}:00:00")))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = burstiness_fano(ray.data.from_pandas(df).repartition(3)).set_index("user_id")
    assert out.loc[1, "fano"] == 0.0 and out.loc[1, "n_days"] == 4
    assert out.loc[2, "fano"] == 3.2


def test_interarrival_histogram_bins(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.temporal import interarrival_histogram

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [1, 1, 1, 2, 2],
            "ts": [
                t0,
                t0 + pd.Timedelta(seconds=1),       # gap 1s  -> bin 1
                t0 + pd.Timedelta(seconds=6),       # gap 5s  -> bin 3
                t0,
                t0 + pd.Timedelta(milliseconds=400) # gap 0s (floor) -> bin 0
            ],
        }
    )
    out = interarrival_histogram(ray.data.from_pandas(df).repartition(2)).set_index("log2_bin")
    assert out.loc[0, "n_gaps"] == 1
    assert out.loc[1, "n_gaps"] == 1
    assert out.loc[3, "n_gaps"] == 1
