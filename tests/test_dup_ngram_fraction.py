"""dup_ngram_fraction (kgray.ops.dedup): per-doc duplicated-shingle
share must be exact on a hand-built corpus and partition-invariant."""

import pandas as pd
import ray.data

from kgray.ops.dedup import dup_ngram_fraction


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    out = dup_ngram_fraction(ray.data.from_pandas(df), **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_dup_ngram_fraction_hand_corpus(ray_session):
    # doc 1: 6 tokens -> 4 distinct 3-shingles; doc 2 repeats doc 1's
    # first 5 tokens (3 shared shingles) then diverges; doc 3 disjoint.
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c d e f",
                "a b c d e x y",
                "p q r s",
            ],
        }
    )
    out = _run(docs)
    by = out.set_index("doc_id")
    # doc1 shingles: abc bcd cde def (4); shared with doc2: abc bcd cde (3)
    assert by.loc[1, "n_shingles"] == 4
    assert by.loc[1, "n_shared"] == 3
    assert by.loc[1, "dup_fraction"] == 0.75
    # doc2 shingles: abc bcd cde dex exy (5); shared: 3
    assert by.loc[2, "n_shingles"] == 5
    assert by.loc[2, "n_shared"] == 3
    assert by.loc[2, "dup_fraction"] == 0.6
    # doc3: pqr qrs (2), nothing shared
    assert by.loc[3, "n_shared"] == 0
    assert by.loc[3, "dup_fraction"] == 0.0


def test_dup_ngram_fraction_short_and_dup_docs(ray_session):
    # short docs (<3 tokens) collapse to one whole-text shingle; exact
    # duplicates share 100% of their shingles
    docs = pd.DataFrame(
        {
            "doc_id": [10, 11, 12],
            "text": ["hi there", "hi there", "solo"],
        }
    )
    out = _run(docs).set_index("doc_id")
    assert out.loc[10, "n_shingles"] == 1 and out.loc[10, "dup_fraction"] == 1.0
    assert out.loc[11, "dup_fraction"] == 1.0
    assert out.loc[12, "dup_fraction"] == 0.0


def test_dup_ngram_fraction_partition_invariance(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                ("common header tokens here " + f"body {i} varies a lot {i * 7}")
                for i in range(40)
            ],
        }
    )
    one = _run(docs)
    many = (
        dup_ngram_fraction(ray.data.from_pandas(docs).repartition(9))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
    assert (one["n_shared"] > 0).any()


def test_ngram_containment_vs_jaccard(ray_session):
    """A small doc fully embedded in a big one: containment = 1.0 while
    symmetric Jaccard sits below the 0.5 cut — the asymmetric score is
    the one that flags it."""
    from kgray.ops.dedup import ngram_containment_pairs, ngram_jaccard_pairs

    words = [f"tok{i}" for i in range(22)]
    big = " ".join(words)              # 20 3-shingles
    small = " ".join(words[:11])       # 9 3-shingles, all inside big
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": [big, small, "zzz yyy xxx www"]})
    ds = ray.data.from_pandas(docs)

    cont = ngram_containment_pairs(ds)
    jac = ngram_jaccard_pairs(ds)
    got = {(r.a, r.b): r.containment for r in cont.itertuples()}
    assert got.get((1, 2)) == 1.0          # small ⊂ big
    assert (1, 2) not in {(r.a, r.b) for r in jac.itertuples()}  # J = 9/20 < 0.5
