"""Semantic pins for the session-4 curation/monitoring ops: CUSUM
change point, burst windows, Misra-Gries heavy hitters, Gopher word
rules, zlib compression ratio."""

import numpy as np
import pandas as pd
import ray.data


def test_changepoint_step_series(ray_session):
    from kgray.ops.temporal import daily_changepoint

    # 5 days at 2/day then 5 days at 10/day -> change after day 5
    rows = []
    for d in range(1, 6):
        rows += [{"ts": pd.Timestamp(f"2024-01-0{d} 12:00:00")}] * 2
    for d in range(6, 10):
        rows += [{"ts": pd.Timestamp(f"2024-01-0{d} 12:00:00")}] * 10
    rows += [{"ts": pd.Timestamp("2024-01-10 12:00:00")}] * 10
    out = daily_changepoint(ray.data.from_pandas(pd.DataFrame(rows)))
    assert out["change_day"].iloc[0] == "2024-01-05"
    assert out["mean_before"].iloc[0] == 2.0
    assert out["mean_after"].iloc[0] == 10.0


def test_burst_windows_counts_starts(ray_session):
    from kgray.ops.temporal import burst_windows

    t0 = pd.Timestamp("2024-01-01 10:00:00")
    rows = (
        # user 1: 4 events within 30s -> starts at i=0 and i=1 with k=3
        [{"user_id": 1, "ts": t0 + pd.Timedelta(seconds=s)} for s in (0, 10, 20, 30)]
        # user 2: 3 events spread over 3 hours -> no burst
        + [{"user_id": 2, "ts": t0 + pd.Timedelta(hours=h)} for h in (0, 1.5, 3.0)]
    )
    out = burst_windows(ray.data.from_pandas(pd.DataFrame(rows)), k=3, window_s=60)
    assert list(out["user_id"]) == [1]
    assert list(out["n_bursts"]) == [2]


def test_heavy_hitters_exact_and_superset(ray_session):
    from kgray.ops.stats import heavy_hitters

    # user 7 has 60 of 120 events (> 120/4=30); user 8 has 30 (NOT > 30)
    ids = [7] * 60 + [8] * 30 + list(range(100, 130))
    ds = ray.data.from_pandas(pd.DataFrame({"user_id": ids}))
    out = heavy_hitters(ds, denom=4, capacity=8)
    assert list(out["user_id"]) == [7]
    assert list(out["n_events"]) == [60]


def test_heavy_hitters_small_batches_never_miss(ray_session):
    from kgray.ops.stats import heavy_hitters

    # scatter a heavy key across many tiny blocks; MG must still keep it
    rng = np.random.default_rng(5)
    ids = np.concatenate([np.full(500, 42, dtype=np.int64),
                          rng.integers(1000, 3000, size=1500)])
    rng.shuffle(ids)
    ds = ray.data.from_pandas(pd.DataFrame({"user_id": ids})).repartition(20)
    out = heavy_hitters(ds, denom=8, capacity=64)  # threshold 250
    assert 42 in set(out["user_id"])
    assert int(out.loc[out["user_id"] == 42, "n_events"].iloc[0]) == 500


def test_gopher_word_rules_bounds():
    from kgray.ops.text import gopher_word_rules

    good = "the cat sat on the mat and that dog ran with joy " * 5  # 60 words
    short = "the cat sat"  # < 50 words
    nostop = "alpha beta gamma delta " * 15  # no stopwords
    b = pd.DataFrame({"doc_id": [1, 2, 3], "text": [good.strip(), short, nostop.strip()]})
    out = gopher_word_rules(b)
    assert list(out["keep"]) == [1, 0, 0]
    assert out["n_words"].iloc[0] == 60


def test_compression_ratio_repetitive_compresses():
    from kgray.ops.text import compression_ratio

    b = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["abc " * 500, "the quick brown fox jumps"]}
    )
    out = compression_ratio(b)
    assert out["ratio"].iloc[0] < 0.05  # pure repetition
    assert out["ratio"].iloc[1] > 0.5
    assert (out["compressed_bytes"] > 0).all()


def test_minhash_eval_clean_corpus(ray_session):
    from kgray.ops.dedup import minhash_eval

    base = "the quick brown fox jumps over the lazy dog near the old river bank " * 4
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                base.strip(),
                base.strip() + " extra tail words here",  # near-dup of 1
                "completely different text about ray data pipelines and arrow " * 4,
                "yet another unrelated document discussing parquet readers " * 4,
            ],
        }
    )
    out = minhash_eval(ray.data.from_pandas(docs))
    assert out["tp"].iloc[0] >= 1  # the (1,2) near-dup pair is found
    assert out["fp"].iloc[0] == 0
    assert out["prec"].iloc[0] == 1.0


def test_minhash_eval_sample_mod_parity(ray_session):
    """sample_mod=k must equal a full-mode eval over the explicitly
    pre-filtered corpus (the md5-parity predicate applied by hand)."""
    from kgray.ops.dedup import _md5_u64_np, minhash_eval

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        toks = list(rng.choice(words, size=30))
        rows.append({"doc_id": i, "text": " ".join(toks)})
        if i % 4 == 0:  # plant near-dups
            rows.append({"doc_id": 1000 + i, "text": " ".join(toks[:-2] + ["tailx"])})
    docs = pd.DataFrame(rows)

    sampled = minhash_eval(ray.data.from_pandas(docs), sample_mod=3)
    keep = _md5_u64_np(docs["doc_id"].astype(str).tolist()) % np.uint64(3) == 0
    manual = minhash_eval(ray.data.from_pandas(docs.loc[keep]))
    pd.testing.assert_frame_equal(
        sampled.reset_index(drop=True), manual.reset_index(drop=True)
    )
    # the sample is a strict subset: fewer (or equal) truth pairs than full
    full = minhash_eval(ray.data.from_pandas(docs))
    assert sampled["n_true"].iloc[0] <= full["n_true"].iloc[0]


def test_encoding_audit_multibyte():
    from kgray.ops.text import encoding_audit

    b = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["abcd", "日本語です", "bad�byte"]})
    out = encoding_audit(b)
    assert out["multibyte_ratio"].iloc[0] == 0.0
    # 5 chars, 15 bytes -> (15-5)*1e6//5 = 2.0
    assert out["n_bytes"].iloc[1] == 15
    assert out["multibyte_ratio"].iloc[1] == 2.0
    assert list(out["has_replacement"]) == [0, 0, 1]


def test_encoding_audit_empty_doc_zero_ratio():
    from kgray.ops.text import encoding_audit

    b = pd.DataFrame({"doc_id": [1], "text": [""]})
    out = encoding_audit(b)
    assert out["multibyte_ratio"].iloc[0] == 0.0
    assert out["n_chars"].iloc[0] == 0 and out["n_bytes"].iloc[0] == 0


def test_conversion_lag_duplicate_timestamp_purchases(ray_session):
    from kgray.ops.temporal import conversion_lag_hist
    import ray.data as rd

    rows = [
        {"user_id": 1, "event_type": "click", "ts": "2024-01-01 10:00:00"},
        # TWO purchases at the identical microsecond: both are conversions
        {"user_id": 1, "event_type": "purchase", "ts": "2024-01-01 10:01:40"},
        {"user_id": 1, "event_type": "purchase", "ts": "2024-01-01 10:01:40"},
    ]
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    out = conversion_lag_hist(rd.from_pandas(df))
    assert out["n_conversions"].sum() == 2

    # and the SQL twin must carry the multiplicity too
    import duckdb

    import __ray_entry__ as m

    con = duckdb.connect()
    con.register("events", df)
    oracle = con.sql(m.oracle_sql()["events_conversion_lag"]).df()
    assert int(oracle["n_conversions"].sum()) == 2
