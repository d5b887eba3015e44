"""Edge cases for the corpus-scaling diagnostics (zipf_slope, heaps_curve)
and the Flesch readability kernel."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kgray.ops.stats import heaps_curve, zipf_slope
from kgray.ops.text import flesch_readability


def test_zipf_slope_descending(ray_session):
    # geometric counts → slope of ln(cnt) on ln(rank) is negative
    rows = []
    for i, (tok, n) in enumerate([("a", 64), ("b", 32), ("c", 16), ("d", 8)]):
        rows.extend({"text": tok} for _ in range(n))
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = zipf_slope(ds, top_n=4)
    assert len(out) == 1
    assert out["n_ranks"].iloc[0] == 4
    assert out["slope"].iloc[0] < -0.5


def test_zipf_slope_degenerate(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": ["solo"]}))
    out = zipf_slope(ds)
    assert len(out) == 0
    assert list(out.columns) == ["n_ranks", "slope"]


def test_heaps_curve_monotone(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": ["a b", "a c", "d", "a b c", "e f", "g"],
        }
    )
    ds = ray.data.from_pandas(docs)
    out = heaps_curve(ds)
    assert list(out["checkpoint"]) == [1, 2, 4, 5]
    assert out["vocab"].is_monotonic_increasing
    assert out["total_tokens"].is_monotonic_increasing
    # full-corpus point: 7 distinct tokens, 11 total
    assert out["vocab"].iloc[-1] == 7
    assert out["total_tokens"].iloc[-1] == 11
    # checkpoint 1 covers docs 0..1: tokens {a,b,c}, 4 occurrences
    assert out["vocab"].iloc[0] == 3
    assert out["total_tokens"].iloc[0] == 4


def test_flesch_readability_kernel():
    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": ["The cat sat. It purred!", ""],
        }
    )
    out = flesch_readability(t).to_pandas()
    assert list(out["n_words"]) == [5, 1]  # empty text clamps to 1
    assert list(out["n_sentences"]) == [2, 1]
    assert out["n_syllables"].iloc[0] == 6  # e,a,a,I,u,e vowel groups
    assert np.isfinite(out["fre"]).all()


def test_sentence_length_stats_kernel():
    from kgray.ops.text import sentence_length_stats

    t = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": ["aaaa. bb! c", "nodots", ""],
        }
    )
    out = sentence_length_stats(t).to_pandas()
    # doc 1: sentences 'aaaa', ' bb', ' c' -> lens 4,3,2
    assert out.loc[0, "n_sentences"] == 3
    assert abs(out.loc[0, "mean_len"] - 3.0) < 1e-6
    assert abs(out.loc[0, "var_len"] - 2.0 / 3.0) < 1e-6
    # doc 2: one sentence of 6 chars, zero variance
    assert out.loc[1, "n_sentences"] == 1 and out.loc[1, "var_len"] == 0.0
    # doc 3: empty text -> one empty sentence
    assert out.loc[2, "n_sentences"] == 1 and out.loc[2, "mean_len"] == 0.0


def test_activity_powerlaw_slope(ray_session):
    from kgray.ops.stats import activity_powerlaw_slope

    rows = []
    for u, n in [(1, 64), (2, 32), (3, 16), (4, 8)]:
        rows.extend({"user_id": u} for _ in range(n))
    out = activity_powerlaw_slope(ray.data.from_pandas(pd.DataFrame(rows)), top_n=4)
    assert out["n_ranks"].iloc[0] == 4
    assert out["slope"].iloc[0] < -0.5
