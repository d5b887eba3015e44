"""Unit tests for the round-4 graph additions: string-keyed connected
components, hop-bounded Bellman-Ford shortest paths, and synchronous
label-propagation communities (kgray/functions/graph.py) — each on both
the driver rung and the distributed rung (driver_edge_max=0)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.functions.graph import (
    connected_components_named,
    label_propagation,
    shortest_paths,
)


def _chain_and_pair():
    # components {a,b,c} and {x,y}
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj_name": ["b", "c", "x"],
                "obj_name": ["a", "b", "y"],
                "n_obs": [2, 1, 4],
            }
        )
    )


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_components_named_two_components(dmax):
    out = connected_components_named(_chain_and_pair(), driver_edge_max=dmax)
    got = dict(zip(out["node"], out["component"]))
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_components_named_empty():
    ds = ray.data.from_pandas(
        pd.DataFrame({"subj_name": pd.Series(dtype=object), "obj_name": pd.Series(dtype=object)})
    )
    out = connected_components_named(ds)
    assert len(out) == 0
    assert list(out.columns) == ["node", "component"]


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_shortest_paths_weighted(dmax):
    out = shortest_paths(
        _chain_and_pair(), seeds=["a"], hops=4, driver_edge_max=dmax
    )
    got = dict(zip(out["node"], out["dist"]))
    # cost = 1/n_obs: a-b edge w=2 -> 0.5; b-c edge w=1 -> 1.0
    assert got == {"a": 0.0, "b": 0.5, "c": 1.5}  # x, y unreachable


def test_shortest_paths_hop_bound_cuts():
    out = shortest_paths(_chain_and_pair(), seeds=["a"], hops=1)
    got = dict(zip(out["node"], out["dist"]))
    assert got == {"a": 0.0, "b": 0.5}  # c needs 2 hops


def test_shortest_paths_multi_seed_and_unweighted():
    out = shortest_paths(
        _chain_and_pair(), seeds=["a", "x"], hops=3, weight_col=None
    )
    got = dict(zip(out["node"], out["dist"]))
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0, "x": 0.0, "y": 1.0}


def test_shortest_paths_missing_seed_raises():
    with pytest.raises(ValueError):
        shortest_paths(_chain_and_pair(), seeds=["nope"], hops=2)


def test_shortest_paths_directed():
    ds = ray.data.from_pandas(
        pd.DataFrame({"subj_name": ["a", "b"], "obj_name": ["b", "c"], "n_obs": [1, 1]})
    )
    fwd = shortest_paths(ds, seeds=["a"], hops=3, directed=True)
    assert dict(zip(fwd["node"], fwd["dist"])) == {"a": 0.0, "b": 1.0, "c": 2.0}
    back = shortest_paths(ds, seeds=["c"], hops=3, directed=True)
    assert dict(zip(back["node"], back["dist"])) == {"c": 0.0}


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_lpa_star_absorbs_leaves(dmax):
    # star: hub h with leaves l1..l4 — leaves adopt 'h' in round 1 and the
    # hub adopts the (unanimous) leaf-name min in round 1; round 2 swaps
    # back symmetric states; fixed 2-round unroll is deterministic
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj_name": ["h"] * 4,
                "obj_name": [f"l{i}" for i in range(1, 5)],
            }
        )
    )
    out = label_propagation(ds, rounds=2, driver_edge_max=dmax)
    got = dict(zip(out["node"], out["community"]))
    # round 1: leaves -> 'h'; hub -> min(l1..l4) = 'l1'
    # round 2: leaves see hub's 'l1' -> 'l1'; hub sees unanimous 'h' -> 'h'
    assert got == {"h": "h", "l1": "l1", "l2": "l1", "l3": "l1", "l4": "l1"}


def test_lpa_two_cliques_converge_to_two_communities():
    # two triangles joined by nothing: each settles on its min member
    tri = lambda p: [(f"{p}1", f"{p}2"), (f"{p}1", f"{p}3"), (f"{p}2", f"{p}3")]
    e = tri("a") + tri("b")
    ds = ray.data.from_pandas(
        pd.DataFrame({"subj_name": [x for x, _ in e], "obj_name": [y for _, y in e]})
    )
    out = label_propagation(ds, rounds=4)
    got = dict(zip(out["node"], out["community"]))
    assert set(got[n] for n in ("a1", "a2", "a3")) == {"a1"}
    assert set(got[n] for n in ("b1", "b2", "b3")) == {"b1"}


def test_lpa_duplicate_and_self_edges_ignored():
    # duplicated edge must not double-vote; self-loop must not vote at all
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj_name": ["a", "b", "a", "c", "c"],
                "obj_name": ["b", "a", "a", "a", "b"],
            }
        )
    )
    dup = label_propagation(ds, rounds=1)
    clean = label_propagation(
        ray.data.from_pandas(
            pd.DataFrame({"subj_name": ["a", "c", "c"], "obj_name": ["b", "a", "b"]})
        ),
        rounds=1,
    )
    assert dict(zip(dup["node"], dup["community"])) == dict(
        zip(clean["node"], clean["community"])
    )


def test_lpa_empty():
    ds = ray.data.from_pandas(
        pd.DataFrame({"subj_name": pd.Series(dtype=object), "obj_name": pd.Series(dtype=object)})
    )
    out = label_propagation(ds)
    assert len(out) == 0
