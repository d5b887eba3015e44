"""Lexical retrieval ops: BM25 scoring math and inverted-index postings,
pinned against hand-computed values on a tiny corpus."""

import math

import pandas as pd
import ray.data

from kgray.ops.ranking import bm25_rank, inverted_index

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3],
        "text": [
            "hash join hash",          # dl 3, tf(hash)=2
            "merge sort run",          # dl 3
            "join ",                   # trailing space -> empty token dropped, dl 1
        ],
    }
)


def test_bm25_matches_hand_formula(ray_session):
    out = bm25_rank(ray.data.from_pandas(DOCS), ("hash", "join"), top_k=3)
    n, avgdl, k1, b = 3, 7 / 3, 1.2, 0.75

    def idf(df):
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def w(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = idf(1) * w(2, 3) + idf(2) * w(1, 3)  # doc 1: hash x2, join x1
    exp3 = idf(2) * w(1, 1)  # doc 3: join x1
    got = out.set_index("doc_id")["score"]
    assert got.loc[1] == round(exp1, 6)
    assert got.loc[3] == round(exp3, 6)
    assert got.loc[2] == 0.0
    # ranking: doc1 > doc3 > doc2
    assert list(out["doc_id"]) == [1, 3, 2]


def test_inverted_index_postings(ray_session):
    out = (
        inverted_index(ray.data.from_pandas(DOCS))
        .to_pandas()
        .set_index("token")
        .sort_index()
    )
    assert out.loc["hash", "df"] == 1
    assert out.loc["hash", "cnt"] == 2
    assert out.loc["hash", "postings"] == "1"
    assert out.loc["join", "df"] == 2
    assert out.loc["join", "cnt"] == 2
    assert out.loc["join", "postings"] == "1,3"
    assert "" not in out.index  # empty token from trailing space dropped


def test_inverted_index_max_postings(ray_session):
    df = pd.DataFrame({"doc_id": list(range(10)), "text": ["the"] * 10})
    out = (
        inverted_index(ray.data.from_pandas(df), max_postings=3)
        .to_pandas()
        .set_index("token")
    )
    assert out.loc["the", "df"] == 10  # df stays exact past the cap
    assert out.loc["the", "postings"] == "0,1,2"


def test_cooccurrence_pmi_math(ray_session):
    import math

    from kgray.ops.ranking import token_cooccurrence_pmi

    # 4 docs: (a,b) together in 3, (a,c) in 1 (pruned by min_count=2)
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b", "a b x", "b a", "a c"],
        }
    )
    out = (
        token_cooccurrence_pmi(ray.data.from_pandas(df), min_count=2)
        .to_pandas()
        .set_index(["tok_a", "tok_b"])
    )
    assert ("a", "c") not in out.index
    assert out.loc[("a", "b"), "n_ab"] == 3
    # df(a)=4, df(b)=3, N=4 -> pmi = ln(4*3/(4*3)) = 0
    assert out.loc[("a", "b"), "pmi"] == round(math.log(4 * 3 / (4.0 * 3.0)), 6)
    # partition invariance: same result with many blocks
    out2 = (
        token_cooccurrence_pmi(ray.data.from_pandas(df).repartition(4), min_count=2)
        .to_pandas()
        .set_index(["tok_a", "tok_b"])
    )
    assert out.sort_index()["n_ab"].equals(out2.sort_index()["n_ab"])


def test_tfidf_topk_order_and_ties(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.ops.ranking import tfidf_topk

    # 3 docs; "common" appears in all (lowest idf), "rare" in one.
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "common rare rare zeta",
                "common beta beta",
                "common beta",
            ],
        }
    )
    out = tfidf_topk(ray.data.from_pandas(df), k=2).to_pandas()
    d1 = out[out["doc_id"] == 1].reset_index(drop=True)
    # doc 1: rare (tf 2, df 1) outranks zeta (tf 1, df 1) outranks common
    assert d1["token"].tolist() == ["rare", "zeta"]
    assert d1["tf"].tolist() == [2, 1]
    idf_rare = np.floor(np.log(4.0 / 2.0) * 1e6 + 0.5)
    assert d1["tfidf"].iloc[0] == 2 * idf_rare / 1e6
    # doc 3: common and beta have equal integer score iff tf and df tie;
    # df(common)=3 > df(beta)=2 so beta outranks common
    d3 = out[out["doc_id"] == 3].reset_index(drop=True)
    assert d3["token"].tolist() == ["beta", "common"]
    # partition invariance
    out2 = tfidf_topk(ray.data.from_pandas(df).repartition(3), k=2).to_pandas()
    key = ["doc_id", "token"]
    assert (
        out2.sort_values(key).reset_index(drop=True).equals(out.sort_values(key).reset_index(drop=True))
    )


def test_tfidf_topk_empty(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.ranking import tfidf_topk

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "text": pd.Series(dtype=object)})
    )
    out = tfidf_topk(ds, k=3)
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "token", "tf", "tfidf"]


def test_boolean_search_semantics(ray_session):
    import pandas as pd
    import ray.data

    from kgray.ops.ranking import boolean_search

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "hash join fast",     # AND branch
                "hash only here",     # neither (join missing, no slow)
                "very slow scan",     # OR branch
                "nothing relevant",   # no match
            ],
        }
    )
    out = (
        boolean_search(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 3]
    assert out["match_all"].tolist() == [1, 0]
    assert out["match_any"].tolist() == [0, 1]
