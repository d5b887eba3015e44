"""Unit tests for the round-5 KG schema/similarity analytics:
meta-path census (per-middle-node degree products — no edge-by-edge
join), neighbor-set Jaccard (adamic_adar wedge discipline + exact full
degrees), and the undirected degree spectrum by label
(kgray/functions/graph.py).  All three are oracle-checked at sf0.01 by
tools/check_correctness.py; here the semantics are hand-pinned on tiny
graphs, including the hub cut and self-loop conventions."""

import pandas as pd
import ray.data

from kgray.functions.graph import (
    degree_spectrum,
    meta_path_census,
    neighbor_jaccard,
)


def _edges(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            rows,
            columns=["subj_id", "subj_label", "pred", "obj_id", "obj_label"],
        )
    )


def test_meta_path_census_counts_ordered_pairs():
    # a -p-> m, b -p-> m, m -q-> c  => 2 paths (p, q); plus m -q-> c
    # feeding nothing and a self-loop-free graph
    ds = _edges(
        [
            ("a", "person", "p", "m", "org"),
            ("b", "person", "p", "m", "org"),
            ("m", "org", "q", "c", "org"),
        ]
    )
    out = meta_path_census(ds)
    got = {(r.pred_a, r.pred_b): r.n_paths for r in out.itertuples()}
    assert got == {("p", "q"): 2}


def test_meta_path_census_backtracking_counts():
    # a -p-> m and m -q-> a: the 2-path a->m->a backtracks and COUNTS
    # (plain SQL self-join semantics, documented)
    ds = _edges(
        [
            ("a", "person", "p", "m", "org"),
            ("m", "org", "q", "a", "person"),
        ]
    )
    out = meta_path_census(ds)
    got = {(r.pred_a, r.pred_b): r.n_paths for r in out.itertuples()}
    assert got == {("p", "q"): 1, ("q", "p"): 1}


def test_meta_path_census_empty():
    out = meta_path_census(_edges([]))
    assert len(out) == 0
    assert list(out.columns) == ["pred_a", "pred_b", "n_paths"]


def test_neighbor_jaccard_triangle_plus_tail():
    # u-z, v-z, u-v, v-t: N(u)={z,v}, N(v)={z,u,t}, common via center z
    # (and centers u, v themselves contribute the (z, v)/(z, u)/... pairs)
    ds = _edges(
        [
            ("u", "person", "p", "z", "org"),
            ("v", "person", "p", "z", "org"),
            ("u", "person", "q", "v", "person"),
            ("v", "person", "p", "t", "org"),
        ]
    )
    out = neighbor_jaccard(ds)
    got = {(r.u, r.v): (r.common, r.deg_u, r.deg_v, r.jaccard) for r in out.itertuples()}
    # pair (u, v): shared neighbor z only; deg_u=2, deg_v=3, union=4
    assert got[("u", "v")] == (1, 2, 3, 0.25)
    # pair (t, z): shared neighbor v; deg_t=1, deg_z=2, union=2 -> 0.5
    assert got[("t", "z")] == (1, 1, 2, 0.5)
    # pairs through centers u and v also appear: (v, z) via u; (t, u), (t, z), (u, z) via v
    assert ("v", "z") in got and ("t", "u") in got and ("u", "z") in got


def test_neighbor_jaccard_hub_cut_drops_center_not_degree():
    # star center h with 3 leaves, cut at max_center_degree=2: h emits no
    # wedges, leaves (degree 1) emit none either -> no pairs at all; but
    # with the default cut the leaf pairs appear with h's FULL degree
    rows = [("h", "org", "p", leaf, "person") for leaf in ("x", "y", "z")]
    ds = _edges(rows)
    assert len(neighbor_jaccard(ds, max_center_degree=2)) == 0
    out = neighbor_jaccard(ds)
    got = {(r.u, r.v): (r.common, r.deg_u, r.deg_v, r.jaccard) for r in out.itertuples()}
    assert got == {
        ("x", "y"): (1, 1, 1, 1.0),
        ("x", "z"): (1, 1, 1, 1.0),
        ("y", "z"): (1, 1, 1, 1.0),
    }


def test_neighbor_jaccard_multi_pred_edges_dedup():
    # two predicates between the same endpoints = ONE neighbor relation
    ds = _edges(
        [
            ("a", "person", "p", "z", "org"),
            ("a", "person", "q", "z", "org"),
            ("b", "person", "p", "z", "org"),
        ]
    )
    out = neighbor_jaccard(ds)
    got = {(r.u, r.v): (r.common, r.deg_u, r.deg_v, r.jaccard) for r in out.itertuples()}
    assert got == {("a", "b"): (1, 1, 1, 1.0)}


def test_degree_spectrum_star():
    rows = [("h", "org", "p", leaf, "person") for leaf in ("x", "y", "z")]
    out = degree_spectrum(_edges(rows))
    got = {(r.label, r.degree): r.n_nodes for r in out.itertuples()}
    assert got == {("org", 3): 1, ("person", 1): 3}


def test_degree_spectrum_self_loop_excluded():
    ds = _edges(
        [
            ("a", "person", "p", "a", "person"),
            ("a", "person", "p", "b", "person"),
        ]
    )
    out = degree_spectrum(ds)
    got = {(r.label, r.degree): r.n_nodes for r in out.itertuples()}
    # the self-loop contributes no neighbor; both nodes have degree 1
    assert got == {("person", 1): 2}


# ---- label_pair_census / reciprocity / nobs_spectrum --------------------

from kgray.functions.graph import label_pair_census, nobs_spectrum, reciprocity


def _edges_with_obs(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            rows,
            columns=["subj_id", "subj_label", "pred", "obj_id", "obj_label", "n_obs"],
        )
    )


def test_label_pair_census_counts_and_mass():
    ds = _edges_with_obs(
        [
            ("a", "person", "works_at", "m", "org", 3),
            ("b", "person", "works_at", "m", "org", 1),
            ("m", "org", "acquired", "n", "org", 2),
        ]
    )
    out = label_pair_census(ds)
    got = {
        (r.subj_label, r.pred, r.obj_label): (r.n_edges, r.total_obs)
        for r in out.itertuples()
    }
    assert got == {
        ("person", "works_at", "org"): (2, 4),
        ("org", "acquired", "org"): (1, 2),
    }


def test_reciprocity_mutual_and_oneway():
    ds = _edges_with_obs(
        [
            ("a", "org", "partner_of", "b", "org", 1),
            ("b", "org", "partner_of", "a", "org", 1),
            ("a", "org", "partner_of", "c", "org", 1),
            ("p", "person", "works_at", "a", "org", 1),
            ("s", "person", "works_at", "s", "person", 1),  # self-loop: dropped
        ]
    )
    out = reciprocity(ds)
    got = {r.pred: (r.n_edges, r.n_reciprocal, r.reciprocity) for r in out.itertuples()}
    assert got["partner_of"] == (3, 2, 0.666666)
    assert got["works_at"] == (1, 0, 0.0)


def test_nobs_spectrum_histogram():
    ds = _edges_with_obs(
        [
            ("a", "person", "p", "m", "org", 1),
            ("b", "person", "p", "n", "org", 1),
            ("c", "person", "p", "m", "org", 5),
            ("m", "org", "q", "n", "org", 2),
        ]
    )
    out = nobs_spectrum(ds)
    got = {(r.pred, r.n_obs): r.n_edges for r in out.itertuples()}
    assert got == {("p", 1): 2, ("p", 5): 1, ("q", 2): 1}


# ---- functional_violations / predicate_redundancy -----------------------

from kgray.functions.graph import functional_violations, predicate_redundancy


def test_functional_violations_fanout():
    ds = _edges(
        [
            ("a", "person", "works_at", "m", "org"),
            ("a", "person", "works_at", "n", "org"),
            ("b", "person", "works_at", "m", "org"),
            ("a", "person", "lives_in", "c", "city"),
        ]
    )
    out = functional_violations(ds)
    got = {
        r.pred: (r.n_subjects, r.n_violating, r.max_fanout, r.violation_rate)
        for r in out.itertuples()
    }
    assert got["works_at"] == (2, 1, 2, 0.5)
    assert got["lives_in"] == (1, 0, 1, 0.0)


def test_predicate_redundancy_synonym_detection():
    # p and q connect the same two pairs; r shares one pair with p
    ds = _edges(
        [
            ("a", "person", "p", "m", "org"),
            ("b", "person", "p", "n", "org"),
            ("a", "person", "q", "m", "org"),
            ("b", "person", "q", "n", "org"),
            ("a", "person", "r", "m", "org"),
        ]
    )
    out = predicate_redundancy(ds)
    got = {
        (r.pred_a, r.pred_b): (r.n_a, r.n_b, r.n_both, r.jaccard)
        for r in out.itertuples()
    }
    assert got[("p", "q")] == (2, 2, 2, 1.0)
    assert got[("p", "r")] == (2, 1, 1, 0.5)
    assert got[("q", "r")] == (2, 1, 1, 0.5)


def test_predicate_redundancy_complete_grid_zero():
    ds = _edges(
        [
            ("a", "person", "p", "m", "org"),
            ("b", "person", "q", "n", "org"),
        ]
    )
    out = predicate_redundancy(ds)
    got = {(r.pred_a, r.pred_b): (r.n_both, r.jaccard) for r in out.itertuples()}
    assert got == {("p", "q"): (0, 0.0)}


# ---- betweenness_sampled ------------------------------------------------

import pytest

from kgray.functions.graph import betweenness_sampled


def _pairs(rows):
    return ray.data.from_pandas(
        pd.DataFrame(rows, columns=["subj_id", "obj_id"])
    )


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_betweenness_chain_with_shortcut(dmax):
    # a->b->c, a->c (shortcut), c->d: only c lies on shortest paths
    # (a->d and b->d both pass through c; 1e6 each)
    out = betweenness_sampled(
        _pairs([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]),
        driver_edge_max=dmax,
    )
    got = dict(zip(out["node"], out["bc_micro"]))
    assert got == {"c": 2_000_000}


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_betweenness_diamond_splits_sigma(dmax):
    # a->{b,c}->d: two shortest a->d paths, each middle gets 1e6 // 2
    out = betweenness_sampled(
        _pairs([("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]),
        driver_edge_max=dmax,
    )
    got = dict(zip(out["node"], out["bc_micro"]))
    assert got == {"b": 500_000, "c": 500_000}


def test_betweenness_hop_bound_cuts_pairs():
    # chain a->b->c->d with hops=2: pair (a, d) is out of range, so only
    # the 2-hop pairs contribute (b on a->c, c on b->d)
    out = betweenness_sampled(
        _pairs([("a", "b"), ("b", "c"), ("c", "d")]), hops=2
    )
    got = dict(zip(out["node"], out["bc_micro"]))
    assert got == {"b": 1_000_000, "c": 1_000_000}


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_betweenness_sampling_restricts_seed_pairs(dmax):
    # sample_mod=2 keeps only hash-even endpoints as sources/targets on
    # BOTH rungs; result must equal the driver rung on the same seeds
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("b", "e")]
    full = betweenness_sampled(_pairs(edges), sample_mod=2, driver_edge_max=200_000)
    got = betweenness_sampled(_pairs(edges), sample_mod=2, driver_edge_max=dmax)
    assert dict(zip(got["node"], got["bc_micro"])) == dict(
        zip(full["node"], full["bc_micro"])
    )


def test_betweenness_empty():
    out = betweenness_sampled(_pairs([]))
    assert len(out) == 0
    assert list(out.columns) == ["node", "bc_micro"]


# ---- harmonic_sampled ---------------------------------------------------

from kgray.functions.graph import harmonic_sampled


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_harmonic_chain(dmax):
    # a->b->c->d: from a, dists {b:1, c:2, d:3} -> 1e6 + 5e5 + 333333
    out = harmonic_sampled(
        _pairs([("a", "b"), ("b", "c"), ("c", "d")]), driver_edge_max=dmax
    )
    got = {
        r.node: (r.n_reached, r.ecc, r.harmonic_micro) for r in out.itertuples()
    }
    assert got["a"] == (3, 3, 1_833_333)
    assert got["b"] == (2, 2, 1_500_000)
    assert got["c"] == (1, 1, 1_000_000)
    assert "d" not in got  # reaches nothing


def test_harmonic_hop_bound():
    out = harmonic_sampled(_pairs([("a", "b"), ("b", "c"), ("c", "d")]), hops=2)
    got = {r.node: (r.n_reached, r.ecc, r.harmonic_micro) for r in out.itertuples()}
    assert got["a"] == (2, 2, 1_500_000)


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_harmonic_sampling_parity(dmax):
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    full = harmonic_sampled(_pairs(edges), sample_mod=2, driver_edge_max=200_000)
    got = harmonic_sampled(_pairs(edges), sample_mod=2, driver_edge_max=dmax)
    assert got.to_dict("records") == full.to_dict("records")


def test_harmonic_empty():
    out = harmonic_sampled(_pairs([]))
    assert len(out) == 0
    assert list(out.columns) == ["node", "n_reached", "ecc", "harmonic_micro"]


# ---- ktruss -------------------------------------------------------------

from kgray.functions.graph import ktruss


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_ktruss_triangle_keeps_tail_drops(dmax):
    out = ktruss(
        _pairs([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]),
        k=3,
        driver_edge_max=dmax,
    )
    got = {(r.a, r.b): r.support for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_ktruss_k4_clique_support_two(dmax):
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    out = ktruss(_pairs(k4), k=4, driver_edge_max=dmax)
    got = {(r.a, r.b): r.support for r in out.itertuples()}
    assert got == {(a, b): 2 for a, b in k4}


@pytest.mark.parametrize("dmax", [200_000, 0])
def test_ktruss_cascade_peel(dmax):
    # two triangles sharing edge (b, c): each edge sits in one triangle
    # except (b, c) in two -> k=4 (support >= 2) first drops the four
    # outer edges, then (b, c) loses its triangles -> empty
    two = [("a", "b"), ("b", "c"), ("a", "c"), ("b", "d"), ("c", "d")]
    assert len(ktruss(_pairs(two), k=4, driver_edge_max=dmax)) == 0
    out = ktruss(_pairs(two), k=3, driver_edge_max=dmax)
    assert len(out) == 5


def test_ktruss_direction_and_dups_collapse():
    # directed duplicates and reverse edges are ONE undirected edge
    out = ktruss(
        _pairs([("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("a", "c")]), k=3
    )
    got = {(r.a, r.b): r.support for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_ktruss_max_rounds_raises():
    # a 6-cycle chained to force >0 peel rounds with max_rounds=0
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    with pytest.raises(RuntimeError):
        ktruss(_pairs(cyc), k=3, max_rounds=0)


def test_ktruss_empty():
    out = ktruss(_pairs([]))
    assert len(out) == 0
    assert list(out.columns) == ["a", "b", "support"]


# ---- entity_activity_decay ----------------------------------------------

from kgray.functions.graph import entity_activity_decay


def _edges_with_tobs(rows):
    return ray.data.from_pandas(
        pd.DataFrame(
            rows,
            columns=["subj_name", "subj_label", "obj_name", "obj_label", "t_obs"],
        )
    )


def test_activity_decay_staircase():
    wk = 604800.0
    t0 = 1_600_000_000.0
    ds = _edges_with_tobs(
        [
            # a observed at max date and 2 weeks prior; b only 2 weeks prior
            ("a", "person", "x", "org", [t0, t0 - 2 * wk]),
            ("b", "person", "x", "org", [t0 - 2 * wk]),
        ]
    )
    out = entity_activity_decay(ds)
    got = {
        (r.name, r.label): (r.n_dates, r.last_obs, r.decayed_micro)
        for r in out.itertuples()
    }
    assert got[("a", "person")] == (2, t0, 1_000_000 + 250_000)
    assert got[("b", "person")] == (1, t0 - 2 * wk, 250_000)
    # x sits on both edges: dates {t0, t0-2wk} dedup to two
    assert got[("x", "org")] == (2, t0, 1_250_000)


def test_activity_decay_dedups_same_date_across_edges():
    t0 = 1_600_000_000.0
    ds = _edges_with_tobs(
        [
            ("a", "person", "x", "org", [t0]),
            ("a", "person", "y", "org", [t0]),
        ]
    )
    out = entity_activity_decay(ds)
    got = {(r.name, r.label): (r.n_dates, r.decayed_micro) for r in out.itertuples()}
    # a's single date counts once despite two incident edges
    assert got[("a", "person")] == (1, 1_000_000)


def test_activity_decay_old_observations_zero():
    wk = 604800.0
    t0 = 1_600_000_000.0
    ds = _edges_with_tobs(
        [("a", "person", "x", "org", [t0]), ("b", "person", "y", "org", [t0 - 25 * wk])]
    )
    out = entity_activity_decay(ds)
    got = {(r.name, r.label): r.decayed_micro for r in out.itertuples()}
    assert got[("b", "person")] == 0  # 1e6 // 2^25 == 0
    assert got[("a", "person")] == 1_000_000


# ---- negative_samples ---------------------------------------------------

import numpy as np

from kgray.functions.graph import _md5_u64, negative_samples


def test_negative_samples_deterministic_filtered_and_reproducible():
    rows = [
        ("a", "person", "p", "x", "org"),
        ("b", "person", "p", "y", "org"),
        ("a", "person", "q", "y", "org"),
    ]
    ds = _edges(rows)
    out1 = negative_samples(ds, k=2)
    out2 = negative_samples(ds, k=2)
    # deterministic: identical across runs
    assert out1.to_dict("records") == out2.to_dict("records")
    vocab = np.array(sorted({"a", "b", "x", "y"}), dtype=object)
    true = {(s, p, o) for s, _, p, o, _ in rows}
    assert len(out1) > 0
    for r in out1.itertuples():
        # filtered setting: never a true triple, always from the vocab
        assert (r.subj_id, r.pred, r.neg_obj_id) not in true
        assert r.neg_obj_id in set(vocab)
    # every row reproduces the documented draw for SOME source triple:
    # neg_obj == vocab[md5(s|p|o|slot) % n] with the original tail o
    emitted = {(r.subj_id, r.pred, r.neg_obj_id, r.slot) for r in out1.itertuples()}
    for s, _, p, o, _ in rows:
        for slot in (0, 1):
            idx = int(_md5_u64([f"{s}|{p}|{o}|{slot}"])[0] % np.uint64(len(vocab)))
            cand = vocab[idx]
            if cand != o and (s, p, cand) not in true:
                assert (s, p, cand, slot) in emitted


def test_negative_samples_empty():
    out = negative_samples(_edges([]))
    assert len(out) == 0
    assert list(out.columns) == ["subj_id", "pred", "neg_obj_id", "slot"]


# ---- path_features / transitive_audit -----------------------------------

from kgray.functions.graph import path_features, transitive_audit


def test_path_features_per_pair_counts():
    # a-p->m, b-p->m, m-q->c: pairs (a,c) and (b,c) each get (p,q) x1;
    # backtracks a->m->a do not exist here (no q edge back)
    ds = _edges(
        [
            ("a", "person", "p", "m", "org"),
            ("b", "person", "p", "m", "org"),
            ("m", "org", "q", "c", "org"),
        ]
    )
    out = path_features(ds)
    got = {(r.s, r.t, r.pred_a, r.pred_b): r.n_paths for r in out.itertuples()}
    assert got == {("a", "c", "p", "q"): 1, ("b", "c", "p", "q"): 1}


def test_path_features_multi_middle_fold():
    # a->m1->c and a->m2->c, same pred pair: ONE feature row with count 2
    ds = _edges(
        [
            ("a", "person", "p", "m1", "org"),
            ("a", "person", "p", "m2", "org"),
            ("m1", "org", "q", "c", "org"),
            ("m2", "org", "q", "c", "org"),
        ]
    )
    out = path_features(ds)
    got = {(r.s, r.t, r.pred_a, r.pred_b): r.n_paths for r in out.itertuples()}
    assert got[("a", "c", "p", "q")] == 2


def test_path_features_hub_cut():
    # middle with total degree 3 > cap 2 emits nothing
    ds = _edges(
        [
            ("a", "person", "p", "m", "org"),
            ("b", "person", "p", "m", "org"),
            ("m", "org", "q", "c", "org"),
        ]
    )
    assert len(path_features(ds, max_center_degree=2)) == 0


def test_transitive_audit_chain_and_closure():
    # p: a->b, b->c, a->c  => (a,c) implied by a->b->c; 1/3 implied
    # q: x->y only         => 0 implied
    ds = _edges(
        [
            ("a", "org", "p", "b", "org"),
            ("b", "org", "p", "c", "org"),
            ("a", "org", "p", "c", "org"),
            ("x", "org", "q", "y", "org"),
        ]
    )
    out = transitive_audit(ds)
    got = {r.pred: (r.n_edges, r.n_implied, r.implied_rate) for r in out.itertuples()}
    assert got["p"] == (3, 1, 0.333333)
    assert got["q"] == (1, 0, 0.0)


def test_transitive_audit_cross_pred_not_implied():
    # a-p->b-q->c does NOT imply (a, p, c)
    ds = _edges(
        [
            ("a", "org", "p", "b", "org"),
            ("b", "org", "q", "c", "org"),
            ("a", "org", "p", "c", "org"),
        ]
    )
    out = transitive_audit(ds)
    got = {r.pred: r.n_implied for r in out.itertuples()}
    assert got["p"] == 0


# ---- turn_taking --------------------------------------------------------

from kgray.ops.transcripts import turn_taking


def test_turn_taking_switches_runs_median():
    ts0 = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame(
        {
            "conv_id": ["c1"] * 5 + ["c2"],
            "turn_idx": [0, 1, 2, 3, 4, 0],
            "role": ["user", "assistant", "assistant", "user", "assistant", "user"],
            "text": [""] * 6,
            "tool": [""] * 6,
            "ts": [
                ts0,
                ts0 + pd.Timedelta(seconds=1),
                ts0 + pd.Timedelta(seconds=3),
                ts0 + pd.Timedelta(seconds=4),
                ts0 + pd.Timedelta(seconds=10),
                ts0,
            ],
        }
    )
    out = turn_taking(ray.data.from_pandas(df)).to_pandas()
    got = {
        r.conv_id: (r.n_turns, r.n_switches, r.max_run, r.med_gap_us)
        for r in out.itertuples()
    }
    # c1: switches at turns 1, 3, 4 -> 3; runs [1, 2, 1, 1] -> max 2;
    # gaps [1s, 2s, 1s, 6s] sorted [1, 1, 2, 6] lower-median idx 1 -> 1s
    assert got == {"c1": (5, 3, 2, 1_000_000)}  # c2 has 1 turn: excluded


def test_turn_taking_spans_batches():
    ts0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 6,
            "turn_idx": range(6),
            "role": ["user", "user", "user", "assistant", "user", "assistant"],
            "text": [""] * 6,
            "tool": [""] * 6,
            "ts": [ts0 + pd.Timedelta(seconds=i) for i in range(6)],
        }
    )
    # 3 single-row blocks: the conversation must reassemble in its bucket
    ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:4], df.iloc[4:]])
    out = turn_taking(ds).to_pandas()
    r = out.iloc[0]
    assert (r["n_turns"], r["n_switches"], r["max_run"], r["med_gap_us"]) == (
        6, 3, 3, 1_000_000,
    )


def test_turn_taking_null_role_three_valued_parity():
    # twin semantics: a NULL role is never a switch and never starts a
    # run; the row AFTER it starts a new run (prole IS NULL)
    ts0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 5,
            "turn_idx": range(5),
            "role": ["user", None, "user", "user", "assistant"],
            "text": [""] * 5,
            "tool": [""] * 5,
            "ts": [ts0 + pd.Timedelta(seconds=i) for i in range(5)],
        }
    )
    out = turn_taking(ray.data.from_pandas(df)).to_pandas().iloc[0]
    # switches: only turn 4 (user -> assistant); the null row and the row
    # after it are not switches
    assert out["n_switches"] == 1
    # runs: [user, None] | [user, user] | [assistant] -> max run 2
    assert out["max_run"] == 2


# ---- validity_timeline --------------------------------------------------

from kgray.ops.temporal import validity_timeline


def test_validity_timeline_hand_pinned():
    # rows: open (always valid), start@10 (valid from 10), end@20 (valid
    # until 20), start@25
    import pyarrow as pa

    t = pa.table(
        {
            "t_start": pa.array([[], [10.0], [], [25.0]], type=pa.list_(pa.float64())),
            "t_end": pa.array([[], [], [20.0], []], type=pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(t)
    grid = [("g5", 5.0), ("g15", 15.0), ("g30", 30.0)]
    out = validity_timeline(ds, grid)
    got = dict(zip(out["snap_date"], out["n_valid"]))
    # g5: open + end@20 -> 2; g15: open + start@10 + end@20 -> 3;
    # g30: open + start@10 + start@25 -> 3
    assert got == {"g5": 2, "g15": 3, "g30": 3}
    assert list(out["snap_date"]) == ["g5", "g15", "g30"]  # grid order kept


def test_validity_timeline_empty():
    import pyarrow as pa

    t = pa.table(
        {
            "t_start": pa.array([], type=pa.list_(pa.float64())),
            "t_end": pa.array([], type=pa.list_(pa.float64())),
        }
    )
    out = validity_timeline(ray.data.from_arrow(t), [("g", 0.0)])
    assert list(out["n_valid"]) == [0]
