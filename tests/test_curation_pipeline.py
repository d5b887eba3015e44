"""The composed curation chain: every stage must provably fire on a
corpus crafted so each one has work to do."""

import pandas as pd
import ray.data

from kgray.pipelines.curation import curate_corpus


def test_each_stage_fires(ray_session):
    long_a = " ".join(["alpha beta gamma delta epsilon zeta"] * 3)  # 107 chars
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "  " + long_a.upper() + "  ",       # normalized, split into 3 chunks
                long_a,                              # duplicate of 1 after cleaning
                "tiny",                              # below p25 length -> filtered
                "the BENCH gram one two three four", # shares a 5-gram with benchmark
                "totally different words here with enough length to survive the cut",
            ],
        }
    )
    bench = pd.DataFrame(
        {"doc_id": [99], "text": ["x bench gram one two three y"]}
    )
    out = (
        curate_corpus(
            ray.data.from_pandas(docs),
            ray.data.from_pandas(bench),
            chunk_chars=48,
            overlap=8,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    survivors = set(out["doc_id"])
    assert 1 in survivors          # kept (min doc_id of the dup pair)
    assert 2 not in survivors      # exact dup of 1 after normalization
    assert 3 not in survivors      # too short
    assert 4 not in survivors      # contaminated ("bench gram one two three")
    assert 5 in survivors
    d1 = out[out["doc_id"] == 1]
    assert len(d1) >= 2            # long doc split into several windows
    assert d1["chunk_text"].iloc[0].startswith("alpha beta")  # lowercased+trimmed
    assert (d1["n_chars"] <= 48).all()
    # overlap: consecutive windows share the trailing 8 chars
    assert d1["chunk_text"].iloc[0][-8:] == d1["chunk_text"].iloc[1][:8]


def test_fuzzy_chain_collapses_near_dups_exact_chain_keeps(ray_session):
    """Boilerplate with a one-word edit survives the exact chain but
    collapses in the fuzzy chain (minhash_keep_canonical slot)."""
    import ray.data

    from kgray.pipelines.curation import curate_corpus, curate_corpus_fuzzy

    base = "the quick brown fox jumps over the lazy dog near the river bank " * 4
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [base, base.replace("river", "creek"), "totally different words " * 16],
            }
        )
    )
    bench = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": ["held out benchmark sentence entirely distinct"]})
    )
    exact = curate_corpus(docs, bench, chunk_chars=64, overlap=16).to_pandas()
    fuzzy = curate_corpus_fuzzy(docs, bench, chunk_chars=64, overlap=16).to_pandas()
    assert set(exact["doc_id"]) == {1, 2, 3}  # one-word edit beats exact dedup
    assert set(fuzzy["doc_id"]) == {1, 3}  # near-dup 2 collapsed onto 1


def test_dedup_cluster_weights_sum_to_content(ray_session):
    """Weights are 1/|cluster| so each cluster's weights sum to ~1 and
    singletons keep weight exactly 1.0."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.ops.curation import dedup_cluster_weights

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the distributed engine watches every single shingle closely"
    )
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [base, base, base + " tail", "completely different content about nothing"],
        }
    )
    out = (
        dedup_cluster_weights(ray.data.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    # docs 1/2 are exact dups -> same cluster; doc 4 is a singleton
    assert out.loc[0, "canonical_id"] == out.loc[1, "canonical_id"]
    assert out.loc[3, "cluster_size"] == 1 and out.loc[3, "weight"] == 1.0
    sz = out.loc[0, "cluster_size"]
    assert out.loc[0, "weight"] == np.floor(1.0 / sz * 1e6 + 0.5) / 1e6
    # every member of one cluster carries the identical weight
    grp = out.groupby("canonical_id")["weight"].nunique()
    assert (grp == 1).all()


def test_length_psi_zero_on_identical_halves(ray_session):
    """Identical even/odd length distributions give term ≈ 0 in every bin
    (only smoothing noise when counts differ by the +1)."""
    import pandas as pd
    import ray.data

    from kgray.ops.curation import length_psi

    # even and odd ids carry the SAME multiset of lengths
    texts = ["x" * n for n in (10, 20, 30, 40, 50)] * 8
    df = pd.DataFrame({"doc_id": range(40), "text": texts})
    out = length_psi(ray.data.from_pandas(df).repartition(4))
    assert len(out) == 10
    assert out["n_ref"].sum() == 20 and out["n_cur"].sum() == 20
    assert (out["term_nano"].abs() <= 1).all()  # identical halves -> PSI ~ 0

    # drifted current half: reference lengths spread 10..200, current
    # lengths all in the top decile -> mass shifts to the last bin
    texts2 = [
        "x" * ((i // 2 % 20 + 1) * 10) if i % 2 == 0 else "x" * 200 for i in range(40)
    ]
    out2 = length_psi(ray.data.from_pandas(pd.DataFrame({"doc_id": range(40), "text": texts2})))
    assert out2["term_nano"].sum() > 100_000_000  # PSI > 0.1 (drift alarm)


def test_funnel_n_raw_counts_null_text_rows(ray_session):
    """Review regression: n_raw must equal the INGESTED row count even when
    some docs carry null text (normalize yields a null length; the
    histogram's null group must not be dropped from the raw count, while
    the quantile threshold and every later stage see non-null rows only)."""
    from kgray.pipelines.curation import curation_funnel

    texts = ["alpha beta gamma"] * 6 + ["delta epsilon zeta eta theta iota"] * 6
    df = pd.DataFrame({"doc_id": range(14), "text": texts + [None, None]})
    bench = pd.DataFrame(
        {"doc_id": [99], "text": ["benchmark only words kappa lambda mu nu"]}
    )
    out = curation_funnel(
        ray.data.from_pandas(df),
        ray.data.from_pandas(bench),
        chunk_chars=16,
        overlap=4,
    )
    r = out.iloc[0]
    assert r["n_raw"] == 14  # nulls included
    assert r["n_filtered"] == 12  # nulls dropped by the length filter
    assert r["n_deduped"] == 2  # two distinct texts
    assert r["n_decontaminated"] == 2
    assert r["n_chunks"] >= 2
