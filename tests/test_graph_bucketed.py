"""VERDICT r4 #3: the fully-bucketed no-driver-vector rungs for
shortest_paths, label_propagation and degree_assortativity must match
their driver rungs exactly (forced knob driver_node_max=0 — the
kcore/CC/pagerank parity pattern)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.functions.graph import (
    degree_assortativity,
    label_propagation,
    shortest_paths,
)


def _graph(seed=11, n_nodes=40, n_edges=160):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return pd.DataFrame(
        {
            "subj_name": [f"n{i:03d}" for i in src],
            "obj_name": [f"n{i:03d}" for i in dst],
            "n_obs": rng.integers(1, 6, n_edges),
        }
    )


@pytest.mark.parametrize("directed", [False, True])
def test_shortest_paths_bucketed_matches_driver(ray_session, directed):
    df = _graph()
    ds = ray.data.from_pandas(df)
    driver = shortest_paths(
        ds, seeds=["n000", "n007"], hops=3, directed=directed
    )
    bucketed = shortest_paths(
        ds,
        seeds=["n000", "n007"],
        hops=3,
        directed=directed,
        driver_node_max=0,
        num_buckets=8,
    )
    pd.testing.assert_frame_equal(driver, bucketed)


def test_shortest_paths_bucketed_missing_seed_raises(ray_session):
    ds = ray.data.from_pandas(_graph())
    with pytest.raises(ValueError):
        shortest_paths(ds, seeds=["nope"], hops=2, driver_node_max=0)


def test_shortest_paths_bucketed_empty_graph_matches_driver(ray_session):
    """Rung parity on the empty graph: both rungs return the empty typed
    frame (neither raises — only seeds absent from a NON-empty graph do)."""
    empty = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj_name": pd.Series(dtype=object),
                "obj_name": pd.Series(dtype=object),
                "n_obs": pd.Series(dtype="int64"),
            }
        )
    )
    driver = shortest_paths(empty, seeds=["a"], hops=2)
    bucketed = shortest_paths(empty, seeds=["a"], hops=2, driver_node_max=0)
    pd.testing.assert_frame_equal(driver, bucketed)
    assert driver.empty and list(driver.columns) == ["node", "dist"]


def test_lpa_bucketed_matches_driver(ray_session):
    df = _graph(seed=5, n_nodes=30, n_edges=90)
    # add a self-loop-only node: it must appear in BOTH rungs' output,
    # keeping its own label (self-loops don't vote)
    df = pd.concat(
        [df, pd.DataFrame({"subj_name": ["zzz"], "obj_name": ["zzz"], "n_obs": [1]})],
        ignore_index=True,
    )
    ds = ray.data.from_pandas(df)
    driver = label_propagation(ds, rounds=3)
    bucketed = label_propagation(ds, rounds=3, driver_node_max=0, num_buckets=8)
    pd.testing.assert_frame_equal(driver, bucketed)
    assert dict(zip(bucketed["node"], bucketed["community"]))["zzz"] == "zzz"


def test_lpa_bucketed_star(ray_session):
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"subj_name": ["h"] * 4, "obj_name": [f"l{i}" for i in range(1, 5)]}
        )
    )
    out = label_propagation(ds, rounds=2, driver_node_max=0, num_buckets=4)
    got = dict(zip(out["node"], out["community"]))
    assert got == {"h": "h", "l1": "l1", "l2": "l1", "l3": "l1", "l4": "l1"}


def test_assortativity_bucketed_matches_driver(ray_session):
    ds = ray.data.from_pandas(_graph(seed=3))
    driver = degree_assortativity(ds)
    bucketed = degree_assortativity(ds, driver_node_max=0, num_buckets=8)
    pd.testing.assert_frame_equal(driver, bucketed)


def test_random_walk_visits_bucketed_matches_driver(ray_session):
    """Forced-knob parity: the bucketed frontier-join rung (no node- or
    edge-sized driver state) must reproduce the driver CSR rung walk for
    walk, plus a hand-pinned visit table for the 5-node cycle world."""
    import pandas as pd
    import ray.data

    from kgray.functions.graph import random_walk_visits

    df = pd.DataFrame(
        {
            "subj_name": ["a", "a", "b", "c", "d", "e", "e"],
            "obj_name": ["b", "c", "c", "d", "e", "a", "b"],
        }
    )
    ds = ray.data.from_pandas(df)
    drv = random_walk_visits(ds, n_steps=3)
    bkt = random_walk_visits(ds, n_steps=3, driver_edge_max=0)
    pd.testing.assert_frame_equal(drv, bkt)
    # hand-derived from md5_number_lower(v || '|' || t) % deg: 5 walkers,
    # 3 steps = 15 visits; node d is never chosen
    pinned = pd.DataFrame(
        {"name": ["a", "b", "c", "e"], "visits": pd.array([3, 4, 4, 4], dtype="int64")}
    )
    pd.testing.assert_frame_equal(drv, pinned)


def test_entity_lifespan_hand(ray_session):
    """Edge a->b observed at days 0 and 2 (epoch 0, 172800), edge b->c at
    day 1: a spans [0, 172800] (2 days, 2 dates), b [0, 172800] (3 dates),
    c [86400, 86400] (0 days, 1 date)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from kgray.functions.graph import entity_lifespan

    t = pa.table(
        {
            "subj_name": ["a", "b"],
            "subj_label": ["x", "x"],
            "obj_name": ["b", "c"],
            "obj_label": ["x", "x"],
            "t_obs": pa.array([[0.0, 172800.0], [86400.0]], pa.list_(pa.float64())),
        }
    )
    out = entity_lifespan(ray.data.from_arrow(t))
    exp = pd.DataFrame(
        {
            "name": ["a", "b", "c"],
            "label": ["x", "x", "x"],
            "first_obs": [0.0, 0.0, 86400.0],
            "last_obs": [172800.0, 172800.0, 86400.0],
            "span_days": pd.array([2, 2, 0], dtype="int64"),
            "n_dates": pd.array([2, 3, 1], dtype="int64"),
        }
    )
    pd.testing.assert_frame_equal(out, exp)
