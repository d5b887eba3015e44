"""Interpolated bigram LM score (kgray/ops/text.py bigram_lm_score)."""

import math

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.text import bigram_lm_score


def _run(rows, **kw):
    return (
        bigram_lm_score(ray.data.from_items(rows), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_exact_value_tiny_corpus(ray_session):
    # corpus: one doc "a b a b" -> unigrams a:2 b:2 total 4
    # bigrams: "a b":2, "b a":1
    out = _run([{"doc_id": 0, "text": "a b a b"}])
    a, b, tot = 2.0, 2.0, 4.0
    lp = [
        math.log2(a / tot),                          # first token 'a'
        math.log2(0.7 * 2 / a + (1 - 0.7) * b / tot),  # a->b
        math.log2(0.7 * 1 / b + (1 - 0.7) * a / tot),  # b->a
        math.log2(0.7 * 2 / a + (1 - 0.7) * b / tot),  # a->b
    ]
    expect = math.floor(-sum(lp) / 4 * 1e6 + 0.5) / 1e6
    assert out.loc[0, "n_tokens"] == 4
    assert abs(out.loc[0, "bits_per_token"] - expect) < 1e-9


def test_fluent_text_scores_lower_than_scrambled(ray_session):
    rows = [{"doc_id": i, "text": "the cat sat on the mat"} for i in range(20)]
    rows.append({"doc_id": 99, "text": "mat the on sat cat the"})  # same unigrams
    out = _run(rows)
    fluent = out[out["doc_id"] < 20]["bits_per_token"].iloc[0]
    scrambled = out[out["doc_id"] == 99]["bits_per_token"].iloc[0]
    assert scrambled > fluent


def test_partition_invariance(ray_session):
    rows = [{"doc_id": i, "text": f"alpha beta gamma t{i % 4} delta"} for i in range(40)]
    a = _run(rows)
    b = (
        bigram_lm_score(ray.data.from_items(rows).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, atol=1e-6, rtol=0)


def test_single_token_doc_uses_unigram_only(ray_session):
    out = _run([{"doc_id": 0, "text": "solo"}, {"doc_id": 1, "text": "solo solo"}])
    # doc 0: p(solo) = 3/3 = 1 -> 0 bits
    assert out.loc[0, "bits_per_token"] == 0.0
    assert out.loc[0, "n_tokens"] == 1


def test_lang_kl_asymmetry_and_zero(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.text import lang_kl_matrix

    df = pd.DataFrame(
        {
            "lang": ["en", "en", "de", "de", "fr"],
            "text": [
                "the cat sat",
                "the dog sat",
                "der hund sass",
                "die katze sass",
                "the cat sat",  # fr == an en doc: KL(fr||en) small
            ],
        }
    )
    out = lang_kl_matrix(ray.data.from_pandas(df).repartition(2)).set_index(
        ["lang_a", "lang_b"]
    )
    assert len(out) == 6  # 3 langs, ordered pairs
    # disjoint vocabularies diverge much more than overlapping ones
    assert out.loc[("en", "de"), "kl"] > out.loc[("fr", "en"), "kl"]
    # KL is asymmetric in general — both directions present
    assert ("de", "en") in out.index and ("en", "de") in out.index
    out2 = lang_kl_matrix(ray.data.from_pandas(df).repartition(5)).set_index(
        ["lang_a", "lang_b"]
    )
    assert out2.sort_index()["kl"].equals(out.sort_index()["kl"])
