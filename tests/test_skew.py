"""Skew robustness: pathological hot keys must not drop data.

The minhash LSH pair generator bounds per-bucket work; above
``max_bucket`` members it star-links to the bucket min instead of
truncating — a duplicate cluster far larger than the cap still resolves
to ONE canonical id with every member mapped."""

import pandas as pd
import pytest
import ray.data

from kgray.ops.dedup import minhash_lsh_dedup


def test_minhash_giant_duplicate_cluster(ray_session):
    # 800 identical docs (4x the 200-member bucket cap) + distinct tails
    dup_text = "the same boilerplate footer text repeated on every page of the site"
    distinct = [f"unique document number {i} about topic {i * 7} " * 3 for i in range(50)]
    df = pd.DataFrame(
        {
            "doc_id": list(range(800)) + list(range(1000, 1050)),
            "text": [dup_text] * 800 + distinct,
        }
    )
    out = minhash_lsh_dedup(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 850
    canon = dict(zip(out["doc_id"], out["canonical_id"]))
    # every duplicate maps to the cluster min — nothing dropped by the cap
    assert all(canon[i] == 0 for i in range(800))
    # distinct docs stay their own canonical
    assert all(canon[i] == i for i in range(1000, 1050))


def test_minhash_small_buckets_unchanged(ray_session):
    # below the cap the all-pairs path is untouched: two near-dup pairs
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [base, base + " tail", "totally different words here " * 8, base],
        }
    )
    out = minhash_lsh_dedup(ray.data.from_pandas(df)).to_pandas()
    canon = dict(zip(out["doc_id"], out["canonical_id"]))
    assert canon[1] == 1 and canon[4] == 1 and canon[3] == 3

def test_minhash_fully_distributed_matches_driver_rungs(ray_session):
    """VERDICT r2 #3: with driver_pair_max=0 AND driver_edge_max=0 the
    candidate pairs are verified by the distributed reduce-side attach and
    clustered by the distributed label rung — the result must equal the
    default driver-verify + union-find path exactly."""
    dup_text = "the same boilerplate footer text repeated on every page of the site"
    near = dup_text + " with one extra tail clause"
    distinct = [f"unique document number {i} about topic {i * 7} " * 3 for i in range(30)]
    df = pd.DataFrame(
        {
            "doc_id": list(range(300)) + [500] + list(range(1000, 1030)),
            "text": [dup_text] * 300 + [near] + distinct,
        }
    )
    ds = ray.data.from_pandas(df)
    default = (
        minhash_lsh_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    distributed = (
        minhash_lsh_dedup(ds, driver_pair_max=0, driver_edge_max=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(default, distributed)
    assert (default[default["doc_id"] < 300]["canonical_id"] == 0).all()


def test_semdedup_distributed_clustering_matches_driver(ray_session):
    """SemDeDup routes within-cluster pairs through the shared
    pair_clusters_min_rep rung; forcing driver_edge_max=0 (distributed
    label propagation) must not change the mapping."""
    import numpy as np

    from kgray.ops.similarity import semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((6, 8))
    rows = []
    vid = 0
    for i in range(6):
        for _ in range(3):  # three near-copies of each base vector
            rows.append((vid, list(base[i] + 1e-4 * rng.standard_normal(8))))
            vid += 1
    df = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ds = ray.data.from_pandas(df)
    default = (
        semantic_dedup(ds, threshold=0.99, n_centroids=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    distributed = (
        semantic_dedup(ds, threshold=0.99, n_centroids=3, driver_edge_max=0)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(default, distributed)
    # near-copy triplets actually merged
    assert (default["canonical_id"] != default["vec_id"]).any()


def test_minhash_match_histogram_counts(ray_session):
    """Exact duplicates land in the k=63 bin; the histogram total equals
    the deduped candidate-pair count."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.ops.dedup import minhash_match_histogram

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [base, base, "wholly unrelated text about other things entirely"],
        }
    )
    out = minhash_match_histogram(ray.data.from_pandas(df).repartition(2))
    assert out.loc[out["k"] == 63, "n_pairs"].tolist() == [1]  # the exact dup pair
    assert out["n_pairs"].sum() >= 1
