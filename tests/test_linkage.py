"""Blocked fuzzy record linkage (kgray/ops/linkage.py): batched
Levenshtein DP vs a scalar reference, and the one-shuffle blocked pair
op's semantics (within-block only, a<b ordering, threshold filter)."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.linkage import blocked_name_linkage, levenshtein_pairs


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_levenshtein_matches_scalar_reference():
    rng = np.random.default_rng(7)
    alpha = list("abcde#01")
    pairs = [
        (
            "".join(rng.choice(alpha, rng.integers(0, 12))),
            "".join(rng.choice(alpha, rng.integers(0, 12))),
        )
        for _ in range(300)
    ]
    got = levenshtein_pairs([a for a, _ in pairs], [b for _, b in pairs])
    want = np.array([_lev_ref(a, b) for a, b in pairs])
    assert np.array_equal(got, want)


def test_levenshtein_empty_and_unequal_lengths():
    got = levenshtein_pairs(["", "abc", "", "kitten"], ["xyz", "", "", "sitting"])
    assert got.tolist() == [3, 3, 0, 3]


def test_blocked_linkage_within_block_only():
    df = pd.DataFrame(
        {
            "k": [1, 2, 3, 4],
            "name": ["aaaa", "aaab", "aaaa", "zzzz"],
            "blk": [0, 0, 1, 1],
        }
    )
    out = (
        blocked_name_linkage(
            ray.data.from_pandas(df), key_col="k", name_col="name", block_col="blk", max_dist=2
        )
        .to_pandas()
        .sort_values(["a_k", "b_k"])
        .reset_index(drop=True)
    )
    # (1,2) dist 1 in block 0; (3,4) dist 4 fails threshold; cross-block
    # (1,3) identical names NOT emitted — blocking is the documented contract
    assert out.to_dict("list") == {"a_k": [1], "b_k": [2], "dist": [1]}


def test_blocked_linkage_singleton_and_empty_blocks():
    df = pd.DataFrame({"k": [9], "name": ["solo"], "blk": [5]})
    out = blocked_name_linkage(
        ray.data.from_pandas(df), key_col="k", name_col="name", block_col="blk"
    ).to_pandas()
    assert len(out) == 0


def _snm_ref(df, window, max_dist):
    g = df.sort_values(["name", "k"], kind="mergesort").reset_index(drop=True)
    rows = []
    for i in range(len(g)):
        for j in range(i + 1, min(i + window + 1, len(g))):
            d = _lev_ref(g.loc[i, "name"], g.loc[j, "name"])
            if d <= max_dist:
                a, b = sorted((int(g.loc[i, "k"]), int(g.loc[j, "k"])))
                rows.append((a, b, d))
    return (
        pd.DataFrame(rows, columns=["a_k", "b_k", "dist"])
        .sort_values(["a_k", "b_k"])
        .reset_index(drop=True)
    )


def test_sorted_neighborhood_matches_reference_across_bins():
    from kgray.ops.linkage import sorted_neighborhood_linkage

    rng = np.random.default_rng(13)
    names = [
        "rec" + "".join(rng.choice(list("abc012"), 6)) for _ in range(200)
    ]
    df = pd.DataFrame({"k": np.arange(200, dtype=np.int64), "name": names})
    got = (
        sorted_neighborhood_linkage(
            ray.data.from_pandas(df), key_col="k", name_col="name",
            window=4, max_dist=3, bin_size=16,  # tiny bins -> many boundaries
        )
        .to_pandas()
        .sort_values(["a_k", "b_k"])
        .reset_index(drop=True)
    )
    want = _snm_ref(df, window=4, max_dist=3)
    assert len(want) > 10
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_sorted_neighborhood_empty():
    from kgray.ops.linkage import sorted_neighborhood_linkage

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": pd.Series(dtype="int64"), "name": pd.Series(dtype=object)})
    )
    out = sorted_neighborhood_linkage(ds, key_col="k", name_col="name").to_pandas()
    assert len(out) == 0


def test_levenshtein_prune_bounds_are_safe(ray_session):
    """The banded kernel must never misjudge a pair whose true distance
    is within the threshold — rotation is the adversarial case (hamming
    6 but lev 2, the path hugs the band edge)."""
    import numpy as np

    from kgray.ops.linkage import levenshtein_pairs

    a = ["abcdef", "abcdef", "short", "aaaa"]
    b = ["bcdefa", "abcdef", "muchlongerstring", "zzzz"]
    exact = levenshtein_pairs(a, b)
    pruned = levenshtein_pairs(a, b, prune_above=2)
    # rotation: lev("abcdef","bcdefa") == 2 -> must survive pruning exact
    assert exact[0] == 2 and pruned[0] == 2
    assert pruned[1] == 0
    # hopeless pairs report SOME value > threshold (lower bound, not exact)
    assert pruned[2] > 2 and pruned[3] > 2
    # and the <= threshold decision matches the exact computation
    assert ((pruned <= 2) == (exact <= 2)).all()
