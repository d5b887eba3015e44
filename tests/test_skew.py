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
