"""Distributed min-label propagation must pick the same representatives as
the driver-side union-find (the documented scale path for clustering
beyond driver RAM)."""

import pandas as pd
import ray.data

from kgray.state.unionfind import cluster_representatives, label_propagation_representatives


def _run(edges, ranks):
    pairs = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["a", "b"])
        if edges
        else pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str)})
    )
    ranks_ds = ray.data.from_pandas(
        pd.DataFrame({"key": list(ranks), "rank": [ranks[k] for k in ranks]})
    )
    out = label_propagation_representatives(pairs, ranks_ds, num_partitions=2).to_pandas()
    if out.empty:
        return {}
    return dict(zip(out["key"], out["rep"]))


def test_matches_union_find_on_chains_and_stars():
    ranks = {k: f"r{i:02d}" for i, k in enumerate("abcdefgh")}
    edges = [("b", "a"), ("c", "b"), ("e", "d"), ("f", "d"), ("g", "h")]
    want = {k: v for k, v in cluster_representatives(edges, ranks).items()}
    got = _run(edges, ranks)
    assert got == {k: v[0] if isinstance(v, tuple) else v for k, v in want.items()}


def test_deep_chain_converges():
    n = 12
    keys = [f"k{i:02d}" for i in range(n)]
    ranks = {k: f"r{i:02d}" for i, k in enumerate(keys)}
    edges = [(keys[i + 1], keys[i]) for i in range(n - 1)]  # one long chain
    got = _run(edges, ranks)
    assert set(got.values()) == {"k00"}
    assert set(got) == set(keys[1:])


def test_no_edges_identity():
    assert _run([], {"a": "r0", "b": "r1"}) == {}


def test_rank_not_key_decides_representative():
    # 'z' has the SMALLEST rank but largest key — it must win
    ranks = {"a": "r9", "z": "r0"}
    got = _run([("a", "z")], ranks)
    assert got == {"a": "z"}
