"""PageRank pinned against a dense power-iteration reference and basic
invariants (mass conservation, dangling redistribution)."""

import numpy as np
import pandas as pd
import ray.data

from kgray.functions.graph import pagerank


def _dense_reference(edges: pd.DataFrame, d=0.85, iters=10):
    nodes = sorted(set(edges["subj_name"]) | set(edges["obj_name"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for _, e in edges.iterrows():
        w[idx[e["subj_name"]], idx[e["obj_name"]]] += e["n_obs"]
    sw = w.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for i in range(n):
            if sw[i] > 0:
                inflow += r[i] * w[i] / sw[i]
        mass = r[sw == 0].sum()
        r = (1 - d) / n + d * (inflow + mass / n)
    return pd.Series(r, index=nodes)


def test_pagerank_matches_dense_reference(ray_session):
    rng = np.random.default_rng(11)
    edges = pd.DataFrame(
        {
            "subj_name": [f"n{i}" for i in rng.integers(0, 12, 60)],
            "obj_name": [f"n{i}" for i in rng.integers(0, 15, 60)],
            "n_obs": rng.integers(1, 5, 60),
        }
    )
    ds = ray.data.from_pandas(edges)
    out = pagerank(ds).set_index("node")["pr"]
    ref = _dense_reference(edges)
    assert np.allclose(out.sort_index(), ref.sort_index(), atol=2e-6)
    assert abs(out.sum() - 1.0) < 1e-3  # mass conserved
    # distributed branch (driver_edge_max=0) agrees with the driver branch
    dist = pagerank(ds, driver_edge_max=0).set_index("node")["pr"]
    assert np.allclose(out.sort_index(), dist.sort_index(), atol=2e-6)


def test_pagerank_all_dangling_sinks(ray_session):
    # bipartite a,b -> x: x is dangling; its mass must recirculate
    edges = pd.DataFrame(
        {"subj_name": ["a", "b"], "obj_name": ["x", "x"], "n_obs": [1, 1]}
    )
    out = pagerank(ray.data.from_pandas(edges)).set_index("node")["pr"]
    assert out.loc["x"] > out.loc["a"]
    assert out.loc["a"] == out.loc["b"]
    assert abs(out.sum() - 1.0) < 1e-3


def test_pagerank_empty(ray_session):
    edges = pd.DataFrame({"subj_name": [], "obj_name": [], "n_obs": []})
    out = pagerank(ray.data.from_pandas(edges))
    assert len(out) == 0


def test_connected_components_chain_and_singleton_free(ray_session):
    from kgray.functions.graph import connected_components

    # 10-20-30-40 is a chain (no direct 10-40 edge); 7-8 separate; 99-99 self
    pairs = pd.DataFrame(
        {"a": [20, 10, 30, 7, 99], "b": [30, 20, 40, 8, 99]}
    )
    out = (
        connected_components(ray.data.from_pandas(pairs))
        .set_index("node")["component"]
    )
    assert out.loc[10] == out.loc[20] == out.loc[30] == out.loc[40] == 10
    assert out.loc[7] == out.loc[8] == 7
    assert out.loc[99] == 99
    assert len(out) == 7  # only nodes touched by edges appear

    # distributed rung (driver_edge_max=0) lands the identical labelling
    dist = (
        connected_components(ray.data.from_pandas(pairs), driver_edge_max=0)
        .set_index("node")["component"]
    )
    pd.testing.assert_series_equal(out.sort_index(), dist.sort_index())


def test_connected_components_empty(ray_session):
    from kgray.functions.graph import connected_components

    out = connected_components(
        ray.data.from_pandas(pd.DataFrame({"a": pd.Series(dtype="int64"),
                                           "b": pd.Series(dtype="int64")}))
    )
    assert len(out) == 0 and list(out.columns) == ["node", "component"]


def test_triangle_counts(ray_session):
    from kgray.functions.graph import triangle_counts

    # triangle 1-2-3, plus a pendant 3-4, plus an isolated edge 7-8
    pairs = pd.DataFrame({"a": [1, 2, 1, 3, 7], "b": [2, 3, 3, 4, 8]})
    out = triangle_counts(ray.data.from_pandas(pairs)).set_index("node")["n_tri"]
    assert out.loc[1] == 1 and out.loc[2] == 1 and out.loc[3] == 1
    assert out.loc[4] == 0 and out.loc[7] == 0 and out.loc[8] == 0

    # K4: every node sits on C(3,2) = 3 triangles
    k4 = pd.DataFrame(
        {"a": [1, 1, 1, 2, 2, 3], "b": [2, 3, 4, 3, 4, 4]}
    )
    out4 = triangle_counts(ray.data.from_pandas(k4)).set_index("node")["n_tri"]
    assert (out4 == 3).all()


from hypothesis import given, settings
from hypothesis import strategies as st


def _edges_strategy():
    return st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )


@settings(max_examples=30, deadline=None)
@given(_edges_strategy())
def test_connected_components_matches_unionfind(pairs):
    from kgray.functions.graph import connected_components
    from kgray.state.unionfind import UnionFind

    df = pd.DataFrame(pairs, columns=["a", "b"])
    got = (
        connected_components(ray.data.from_pandas(df))
        .set_index("node")["component"]
        .to_dict()
    )
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    # same partition, canonical = min node id of each class
    nodes = sorted({x for p in pairs for x in p})
    roots = {}
    for v in nodes:
        roots.setdefault(uf.find(v), []).append(v)
    expect = {v: min(members) for members in roots.values() for v in members}
    assert got == expect


@settings(max_examples=30, deadline=None)
@given(_edges_strategy())
def test_triangle_counts_match_bruteforce(pairs):
    from itertools import combinations

    from kgray.functions.graph import triangle_counts

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    df = pd.DataFrame(pairs, columns=["a", "b"])
    got = triangle_counts(ray.data.from_pandas(df)).set_index("node")["n_tri"].to_dict()
    edges = {frozenset(p) for p in pairs}
    nodes = sorted({x for p in pairs for x in p})
    expect = {v: 0 for v in nodes}
    for u, v, w in combinations(nodes, 3):
        if {u, v} in edges and {v, w} in edges and {u, w} in edges:
            expect[u] += 1
            expect[v] += 1
            expect[w] += 1
    assert got == expect


def test_kcore_peels_leaf_chain(ray_session):
    """A chain hanging off a clique peels entirely; the clique survives
    with full internal degrees — and the distributed rung (driver_edge_max
    forced to 0) matches the driver loop exactly."""
    import pandas as pd
    import ray.data

    from kgray.functions.graph import kcore

    # triangle a-b-c (2-core) + chain c-d-e (peels: e deg1 -> d deg1 -> gone)
    edges = pd.DataFrame(
        {
            "a": ["a", "b", "c", "c", "d"],
            "b": ["b", "c", "a", "d", "e"],
        }
    )
    ds = ray.data.from_pandas(edges)
    out = kcore(ds, k=2).sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == ["a", "b", "c"]
    assert out["core_degree"].tolist() == [2, 2, 2]

    dist = kcore(ds, k=2, driver_edge_max=0).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, dist)

    # k=3 on a triangle: everything peels
    assert len(kcore(ds, k=3)) == 0


def test_kcore_dedups_edges_across_batches(ray_session):
    """The same edge arriving in two different input blocks must count
    once toward core degree in BOTH rungs (global bucket dedup)."""
    import pandas as pd
    import ray.data

    from kgray.functions.graph import kcore

    # path a-b-c: every node has degree <= 1 except b (2) -> 2-core empty.
    # Without global dedup, the duplicated a-b edge would give a and b
    # degree 2 and fake a surviving core.
    b1 = pd.DataFrame({"a": ["a", "b"], "b": ["b", "c"]})
    b2 = pd.DataFrame({"a": ["a"], "b": ["b"]})  # duplicate of edge a-b
    ds = ray.data.from_pandas([b1, b2])
    assert len(kcore(ds, k=2)) == 0
    assert len(kcore(ds, k=2, driver_edge_max=0)) == 0
    # and reversed duplicates (b-a vs a-b) also collapse
    b3 = pd.DataFrame({"a": ["b"], "b": ["a"]})
    ds2 = ray.data.from_pandas([b1, b3])
    assert len(kcore(ds2, k=2)) == 0


def test_kcore_deep_peel_chain_runs_to_fixpoint(ray_session):
    """ADVICE r3: a long path graph needs ~n/2 synchronized peel rounds
    (two endpoints drop per round); the engine must reach the fixpoint
    (empty 2-core) rather than silently returning a supergraph at a fixed
    round cap, and max_rounds must raise instead of truncating."""
    import pytest
    import ray.data

    from kgray.functions.graph import kcore

    n = 140  # ~70 synchronized rounds to peel — past any fixed 16/64 cap
    edges = pd.DataFrame(
        {"a": [f"n{i}" for i in range(n - 1)], "b": [f"n{i + 1}" for i in range(n - 1)]}
    )
    ds = ray.data.from_pandas(edges)
    assert len(kcore(ds, k=2)) == 0
    assert len(kcore(ds, k=2, driver_edge_max=0)) == 0
    with pytest.raises(RuntimeError, match="max_rounds"):
        kcore(ds, k=2, max_rounds=3)


def test_pagerank_bucketed_rung_matches_driver(ray_session):
    """VERDICT r3 #6: driver_node_max=0 forces the hash-bucketed rank
    Dataset rung (no node-sized driver state); ranks must match the
    driver rung at the output's 1e-6 rounding, weighted and unweighted."""
    import ray.data

    from kgray.functions.graph import pagerank

    pairs = [
        ("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 3.0), ("c", "d", 1.0),
        ("d", "a", 1.0), ("e", "a", 1.0),  # e dangling-in only; sink via d? no: d->a
        ("f", "g", 1.0),  # separate component, g is a dangling sink
    ]
    ds = ray.data.from_items(
        [{"subj_name": s, "obj_name": o, "n_obs": w} for s, o, w in pairs]
    )
    # 3 iterations keep the test fast (each bucketed iteration is two
    # all-to-alls); rung parity is iteration-count-independent
    drv = (
        pagerank(ds, weight_col="n_obs", iterations=3)
        .sort_values("node")
        .reset_index(drop=True)
    )
    bkt = (
        pagerank(ds, weight_col="n_obs", iterations=3, driver_node_max=0)
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(drv, bkt, atol=1.5e-6, rtol=0)


def test_ppr_seeds_all_rungs_agree(ray_session):
    """Personalized teleport: dense reference == driver rung == encoded
    rung == bucketed rung; mass conserved; seeds outrank comparable
    non-seeds; absent seeds raise."""
    import pytest

    rng = np.random.default_rng(23)
    edges = pd.DataFrame(
        {
            "subj_name": [f"n{i}" for i in rng.integers(0, 12, 60)],
            "obj_name": [f"n{i}" for i in rng.integers(0, 15, 60)],
            "n_obs": rng.integers(1, 5, 60),
        }
    )
    seeds = ["n1", "n3"]
    ds = ray.data.from_pandas(edges)

    # dense reference with seeded teleport
    nodes = sorted(set(edges["subj_name"]) | set(edges["obj_name"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for _, e in edges.iterrows():
        w[idx[e["subj_name"]], idx[e["obj_name"]]] += e["n_obs"]
    sw = w.sum(axis=1)
    t = np.zeros(n)
    for s in seeds:
        t[idx[s]] = 1.0 / len(seeds)
    r = t.copy()
    for _ in range(10):
        inflow = np.zeros(n)
        for i in range(n):
            if sw[i] > 0:
                inflow += r[i] * w[i] / sw[i]
        mass = r[sw == 0].sum()
        r = 0.15 * t + 0.85 * (inflow + mass * t)
    ref = pd.Series(r, index=nodes).sort_index()

    driver = pagerank(ds, teleport_nodes=seeds).set_index("node")["pr"].sort_index()
    assert np.allclose(driver, ref, atol=2e-6)
    assert abs(driver.sum() - 1.0) < 1e-3
    # non-seed teleport share is zero: an in-link-free non-seed ranks 0
    dangling_only = set(nodes) - set(edges["obj_name"]) - set(seeds)
    for node in dangling_only:
        assert driver.loc[node] == 0.0

    encoded = (
        pagerank(ds, teleport_nodes=seeds, driver_edge_max=0)
        .set_index("node")["pr"].sort_index()
    )
    assert np.allclose(driver, encoded, atol=2e-6)

    bucketed = (
        pagerank(ds, teleport_nodes=seeds, driver_node_max=0, iterations=3)
        .set_index("node")["pr"].sort_index()
    )
    short = pagerank(ds, teleport_nodes=seeds, iterations=3).set_index("node")["pr"].sort_index()
    assert np.allclose(bucketed, short, atol=2e-6)

    with pytest.raises(ValueError, match="no teleport node"):
        pagerank(ds, teleport_nodes=["not-a-node"])


def test_hits_bipartite_and_rung_parity(ray_session):
    """On a bipartite src→dst graph: sources carry hub mass only and
    sinks authority only; both vectors are unit-L2; the encoded
    distributed rung equals the driver rung."""
    from kgray.functions.graph import hits

    rng = np.random.default_rng(31)
    edges = pd.DataFrame(
        {
            "subj_name": [f"u{i}" for i in rng.integers(0, 8, 40)],
            "obj_name": [f"t{i}" for i in rng.integers(0, 4, 40)],
            "n_obs": rng.integers(1, 6, 40),
        }
    )
    ds = ray.data.from_pandas(edges)
    out = hits(ds).set_index("node")
    us = out[out.index.str.startswith("u")]
    ts = out[out.index.str.startswith("t")]
    assert (us["authority"] == 0.0).all() and (ts["hub"] == 0.0).all()
    assert abs((out["hub"] ** 2).sum() - 1.0) < 1e-3
    assert abs((out["authority"] ** 2).sum() - 1.0) < 1e-3
    # the busiest event type is the top authority
    top = edges.groupby("obj_name")["n_obs"].sum().idxmax()
    assert ts["authority"].idxmax() == top

    dist = hits(ds, driver_edge_max=0).set_index("node")
    pd.testing.assert_frame_equal(
        out.sort_index(), dist.sort_index(), atol=2e-6, rtol=0
    )


def test_hits_empty(ray_session):
    from kgray.functions.graph import hits

    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table(
            {
                "subj_name": pa.array([], pa.string()),
                "obj_name": pa.array([], pa.string()),
                "n_obs": pa.array([], pa.int64()),
            }
        )
    )
    out = hits(empty)
    assert len(out) == 0 and list(out.columns) == ["node", "hub", "authority"]
