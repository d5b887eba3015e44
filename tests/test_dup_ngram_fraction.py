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


# ---- CDC chunking dedup (round-5) ---------------------------------------

from kgray.ops.dedup import cdc_chunk_stats


def _docs(texts):
    import pandas as pd
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_cdc_exact_duplicates_halve_unique_mass():
    import numpy as np

    rng = np.random.default_rng(3)
    t = "".join(rng.choice(list("abcdefghijklmnop ")) for _ in range(1500))
    solo = cdc_chunk_stats(_docs([t])).iloc[0]
    r = cdc_chunk_stats(_docs([t, t])).iloc[0]
    # a second identical copy adds chunk mass but zero unique mass
    assert r["total_chars"] == 2 * len(t) == 2 * solo["total_chars"]
    assert r["unique_chars"] == solo["unique_chars"]
    assert r["n_unique_chunks"] == solo["n_unique_chunks"]
    assert r["n_chunks"] == 2 * solo["n_chunks"]


def test_cdc_insertion_shifts_at_most_prefix_chunks():
    import numpy as np

    rng = np.random.default_rng(11)
    base = "".join(rng.choice(list("abcdefgh ")) for _ in range(2000))
    shifted = "XYZPREFIX-" + base
    out = cdc_chunk_stats(_docs([base, shifted]))
    r = out.iloc[0]
    # content-defined boundaries re-sync after the insertion: most of the
    # shared run dedups even though every byte offset differs
    assert r["unique_chars"] < r["total_chars"] * 0.65
    assert r["savings"] > 0.35


def test_cdc_short_and_empty_docs():
    out = cdc_chunk_stats(_docs(["tiny", "", None]))
    r = out.iloc[0]
    # one whole-doc chunk for the short doc; empty/None contribute nothing
    assert r["n_chunks"] == 1 and r["n_unique_chunks"] == 1
    assert r["total_chars"] == 4 and r["unique_chars"] == 4
    assert r["savings"] == 0.0


def test_cdc_empty_corpus():
    out = cdc_chunk_stats(_docs([]))
    r = out.iloc[0]
    assert r["n_chunks"] == 0 and r["total_chars"] == 0 and r["savings"] == 0.0


def test_cdc_incremental_two_run_equals_one_shot_delta():
    import shutil
    import tempfile

    from kgray.ops.dedup import cdc_against_store

    import numpy as np

    rng = np.random.default_rng(5)
    mk = lambda n: "".join(rng.choice(list("abcdefgh ")) for _ in range(n))
    a_docs = [mk(600), mk(600)]
    shared = mk(400)
    b_docs = [a_docs[0], shared + mk(100)]  # one exact dup, one partial
    store = tempfile.mkdtemp(prefix="cdcstore_", dir="/tmp")
    try:
        first = cdc_against_store(_docs(a_docs), store).iloc[0]
        second = cdc_against_store(_docs(b_docs), store).iloc[0]
    finally:
        shutil.rmtree(store, ignore_errors=True)
    # run 1 against an empty store: everything unique in-run is new
    solo_a = cdc_chunk_stats(_docs(a_docs)).iloc[0]
    assert first["n_new_chunks"] == solo_a["n_unique_chunks"]
    assert first["new_chars"] == solo_a["unique_chars"]
    # run 2's new-unique mass == union unique − run-1 unique (set algebra
    # over the same deterministic chunk keys)
    union = cdc_chunk_stats(_docs(a_docs + b_docs)).iloc[0]
    assert second["n_new_chunks"] == union["n_unique_chunks"] - solo_a["n_unique_chunks"]
    assert second["new_chars"] == union["unique_chars"] - solo_a["unique_chars"]
    # the exact-dup doc contributes zero new chunks; only the fresh tail
    # and boundary-crossing chunks of doc 2 are new
    assert second["n_new_chunks"] < second["n_chunks"]


def test_cdc_incremental_empty_store_dir_and_empty_run():
    import shutil
    import tempfile

    from kgray.ops.dedup import cdc_against_store

    store = tempfile.mkdtemp(prefix="cdcstore_", dir="/tmp")
    try:
        out = cdc_against_store(_docs([]), store).iloc[0]
        assert out["n_chunks"] == 0 and out["n_new_chunks"] == 0
        assert out["new_ratio"] == 0.0
        out2 = cdc_against_store(_docs(["hello world of chunks"]), store).iloc[0]
        assert out2["n_new_chunks"] >= 1
    finally:
        shutil.rmtree(store, ignore_errors=True)
