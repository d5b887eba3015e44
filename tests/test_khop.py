"""k-hop neighborhood extraction (kgray/functions/graph.py)."""

import pandas as pd
import ray.data

from kgray.functions.graph import k_hop_neighborhood


def _edges(pairs):
    return ray.data.from_items(
        [{"subj_name": s, "obj_name": o} for s, o in pairs]
    )


CHAIN = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]


def test_undirected_hops_and_cutoff(ray_session):
    out = k_hop_neighborhood(_edges(CHAIN), seeds=["a"], hops=2)
    assert dict(zip(out["name"], out["hop"])) == {"a": 0, "b": 1, "c": 2}
    # 'd' is 3 hops out, 'x'/'y' disconnected -> absent


def test_directed_respects_edge_direction(ray_session):
    out = k_hop_neighborhood(_edges(CHAIN), seeds=["b"], hops=2, directed=True)
    assert dict(zip(out["name"], out["hop"])) == {"b": 0, "c": 1, "d": 2}
    out_u = k_hop_neighborhood(_edges(CHAIN), seeds=["b"], hops=2)
    assert dict(zip(out_u["name"], out_u["hop"])) == {"b": 0, "a": 1, "c": 1, "d": 2}


def test_seed_absent_from_graph_still_hop0(ray_session):
    out = k_hop_neighborhood(_edges(CHAIN), seeds=["zz"], hops=3)
    assert out["name"].tolist() == ["zz"]
    assert out["hop"].tolist() == [0]


def test_first_reach_wins_on_cycles(ray_session):
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]  # triangle
    out = k_hop_neighborhood(_edges(pairs), seeds=["a"], hops=5)
    assert dict(zip(out["name"], out["hop"])) == {"a": 0, "b": 1, "c": 1}


def test_partition_invariance(ray_session):
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(40)]
    a = k_hop_neighborhood(_edges(pairs), seeds=["n0"], hops=4)
    b = k_hop_neighborhood(_edges(pairs).repartition(7), seeds=["n0"], hops=4)
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_frontier_matches_broadcast_rung(ray_session):
    """VERDICT r3 #6: frontier_broadcast_max=0 forces the hash-bucketed
    Dataset-join BFS (frontier x edges co-location + visited anti-join);
    result must match the broadcast rung exactly, directed and not."""
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(12)] + [
        ("n3", "side1"), ("side1", "side2"), ("n5", "n2"), ("x", "y"),
    ]
    a = k_hop_neighborhood(_edges(pairs), seeds=["n0", "side2"], hops=2)
    b = k_hop_neighborhood(
        _edges(pairs), seeds=["n0", "side2"], hops=2, frontier_broadcast_max=0
    )
    pd.testing.assert_frame_equal(a, b)
    ad = k_hop_neighborhood(_edges(pairs), seeds=["n1"], hops=2, directed=True)
    bd = k_hop_neighborhood(
        _edges(pairs), seeds=["n1"], hops=2, directed=True, frontier_broadcast_max=0
    )
    pd.testing.assert_frame_equal(ad, bd)


def test_bucketed_frontier_mid_bfs_switch(ray_session):
    """A frontier outgrowing the knob mid-BFS switches to the Dataset rung
    for the REMAINING hops and still matches the pure-broadcast result."""
    # star fan-out: hop-1 frontier = 12 nodes > knob 4
    pairs = [("hub", f"leaf{i}") for i in range(12)] + [
        (f"leaf{i}", f"deep{i}") for i in range(12)
    ]
    a = k_hop_neighborhood(_edges(pairs), seeds=["hub"], hops=2)
    b = k_hop_neighborhood(_edges(pairs), seeds=["hub"], hops=2, frontier_broadcast_max=4)
    pd.testing.assert_frame_equal(a, b)
