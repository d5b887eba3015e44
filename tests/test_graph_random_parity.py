"""Randomized brute-force parity for the round-5 graph analytics: each
operator's driver rung is checked against an independent pure-Python
brute force on seeded random digraphs, and the distributed rung against
the driver rung on one of them.  Complements the hand-pinned cases in
test_graph_schema_ops.py with adversarial shapes (hubs, multi-pred
parallel edges, self-loops, disconnected pieces)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.functions.graph import (
    _md5_u64,
    betweenness_sampled,
    degree_spectrum,
    harmonic_sampled,
    ktruss,
    meta_path_census,
    neighbor_jaccard,
    reciprocity,
    transitive_audit,
)

LABELS = ("person", "org", "city")
PREDS = ("p", "q", "r")


def _random_edges(seed: int, n_nodes: int = 14, n_edges: int = 40):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i}" for i in range(n_nodes)]
    label = {n: LABELS[i % len(LABELS)] for i, n in enumerate(nodes)}
    rows = []
    for _ in range(n_edges):
        s, o = rng.choice(nodes, size=2, replace=True)  # self-loops possible
        rows.append((s, label[s], str(rng.choice(PREDS)), o, label[o]))
    df = pd.DataFrame(
        rows, columns=["subj_id", "subj_label", "pred", "obj_id", "obj_label"]
    ).drop_duplicates()
    return df


def _ds(df):
    return ray.data.from_pandas(df.reset_index(drop=True))


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_meta_path_census_brute(seed):
    df = _random_edges(seed)
    got = meta_path_census(_ds(df))
    eset = set(zip(df.subj_id, df.pred, df.obj_id))
    want: dict = {}
    for s1, p1, o1 in eset:
        for s2, p2, o2 in eset:
            if o1 == s2:
                want[(p1, p2)] = want.get((p1, p2), 0) + 1
    assert {(r.pred_a, r.pred_b): r.n_paths for r in got.itertuples()} == want


@pytest.mark.parametrize("seed", [2, 11])
def test_neighbor_jaccard_brute(seed):
    df = _random_edges(seed)
    got = neighbor_jaccard(_ds(df), max_center_degree=5)
    nbr: dict = {}
    for s, o in set(zip(df.subj_id, df.obj_id)):
        if s == o:
            continue
        nbr.setdefault(s, set()).add(o)
        nbr.setdefault(o, set()).add(s)
    want = {}
    # wedge pairs through centers with degree <= 5 only
    for z, ns in nbr.items():
        if len(ns) > 5:
            continue
        for u in ns:
            for v in ns:
                if u < v:
                    want.setdefault((u, v), 0)
    for (u, v) in want:
        common = sum(
            1
            for z in nbr[u] & nbr[v]
            if len(nbr[z]) <= 5
        )
        want[(u, v)] = (
            common,
            len(nbr[u]),
            len(nbr[v]),
            common * 1_000_000 // (len(nbr[u]) + len(nbr[v]) - common),
        )
    got_d = {
        (r.u, r.v): (r.common, r.deg_u, r.deg_v, int(round(r.jaccard * 1e6)))
        for r in got.itertuples()
    }
    assert got_d == want


@pytest.mark.parametrize("seed", [3, 13])
def test_degree_spectrum_brute(seed):
    df = _random_edges(seed)
    got = degree_spectrum(_ds(df))
    label = {}
    nbr: dict = {}
    for r in df.itertuples():
        label[r.subj_id] = r.subj_label
        label[r.obj_id] = r.obj_label
        if r.subj_id != r.obj_id:
            nbr.setdefault(r.subj_id, set()).add(r.obj_id)
            nbr.setdefault(r.obj_id, set()).add(r.subj_id)
    want: dict = {}
    for n, ns in nbr.items():
        k = (label[n], len(ns))
        want[k] = want.get(k, 0) + 1
    assert {(r.label, r.degree): r.n_nodes for r in got.itertuples()} == want


@pytest.mark.parametrize("seed", [5, 17])
def test_reciprocity_brute(seed):
    df = _random_edges(seed)
    got = reciprocity(_ds(df))
    eset = {
        (s, p, o)
        for s, p, o in zip(df.subj_id, df.pred, df.obj_id)
        if s != o
    }
    want: dict = {}
    for s, p, o in eset:
        n, r = want.get(p, (0, 0))
        want[p] = (n + 1, r + (1 if (o, p, s) in eset else 0))
    got_d = {r.pred: (r.n_edges, r.n_reciprocal) for r in got.itertuples()}
    assert got_d == want


@pytest.mark.parametrize("seed", [4, 19])
def test_transitive_audit_brute(seed):
    df = _random_edges(seed)
    got = transitive_audit(_ds(df), max_center_degree=256)
    eset = {
        (s, p, o)
        for s, p, o in zip(df.subj_id, df.pred, df.obj_id)
        if s != o
    }
    want: dict = {}
    for s, p, o in eset:
        implied = any(
            (s, p, m) in eset and (m, p, o) in eset and m != s and m != o
            for m in {e[2] for e in eset if e[0] == s and e[1] == p}
        )
        n, i = want.get(p, (0, 0))
        want[p] = (n + 1, i + (1 if implied else 0))
    got_d = {r.pred: (r.n_edges, r.n_implied) for r in got.itertuples()}
    assert got_d == want


def _brute_ktruss(edges: set, k: int):
    alive = set(edges)
    while True:
        nbr: dict = {}
        for a, b in alive:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        sup = {e: len(nbr[e[0]] & nbr[e[1]]) for e in alive}
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return {e: s for e, s in sup.items()}
        alive -= drop
        if not alive:
            return {}


@pytest.mark.parametrize("seed", [6, 29])
def test_ktruss_brute(seed):
    df = _random_edges(seed, n_nodes=10, n_edges=34)
    und = set()
    for s, o in zip(df.subj_id, df.obj_id):
        if s != o:
            und.add((min(s, o), max(s, o)))
    want = _brute_ktruss(und, k=3)
    got = ktruss(_ds(df), k=3)
    assert {(r.a, r.b): r.support for r in got.itertuples()} == want


def _brute_bfs(adj, s, hops):
    out = {s: (0, 1)}
    frontier = [s]
    for lvl in range(hops):
        nxt: dict = {}
        for x in frontier:
            for y in adj.get(x, ()):  # multiset ok: adj holds sets
                if y in out:
                    continue
                nxt[y] = nxt.get(y, 0) + out[x][1]
        if not nxt:
            break
        for y, c in nxt.items():
            out[y] = (lvl + 1, c)
        frontier = list(nxt)
    return out


@pytest.mark.parametrize("seed", [8, 31])
def test_betweenness_and_harmonic_brute(seed):
    df = _random_edges(seed, n_nodes=10, n_edges=30)
    pairs = {
        (s, o) for s, o in zip(df.subj_id, df.obj_id) if s != o
    }
    fwd: dict = {}
    rev: dict = {}
    nodes = set()
    for u, v in pairs:
        fwd.setdefault(u, set()).add(v)
        rev.setdefault(v, set()).add(u)
        nodes.update((u, v))
    seeds = [
        n for n in sorted(nodes) if int(_md5_u64([n])[0] % np.uint64(2)) == 0
    ]
    hops = 4
    F = {s: _brute_bfs(fwd, s, hops) for s in seeds}
    R = {t: _brute_bfs(rev, t, hops) for t in seeds}
    bc: dict = {}
    for s in seeds:
        for t in seeds:
            if t == s or t not in F[s]:
                continue
            dst, sst = F[s][t]
            for v, (dfv, sfv) in F[s].items():
                if v in (s, t):
                    continue
                hit = R[t].get(v)
                if hit and dfv + hit[0] == dst:
                    bc[v] = bc.get(v, 0) + sfv * hit[1] * 1_000_000 // sst
    want_bc = {n: c for n, c in bc.items() if c > 0}
    got_bc = betweenness_sampled(_ds(df), sample_mod=2, hops=hops)
    assert dict(zip(got_bc["node"], got_bc["bc_micro"])) == want_bc

    want_h = {}
    for s in sorted(nodes):
        d = _brute_bfs(fwd, s, hops)
        reached = [dd for n, (dd, _) in d.items() if n != s]
        if reached:
            want_h[s] = (
                len(reached),
                max(reached),
                sum(1_000_000 // dd for dd in reached),
            )
    got_h = harmonic_sampled(_ds(df), sample_mod=1, hops=hops)
    got_hd = {
        r.node: (r.n_reached, r.ecc, r.harmonic_micro) for r in got_h.itertuples()
    }
    assert got_hd == want_h


def test_distributed_rungs_match_driver_on_random_graph():
    df = _random_edges(42, n_nodes=12, n_edges=36)
    ds = _ds(df)
    for fn, kw in (
        (ktruss, dict(k=3)),
        (betweenness_sampled, dict(sample_mod=2, hops=4)),
        (harmonic_sampled, dict(sample_mod=1, hops=4)),
    ):
        drv = fn(ds, driver_edge_max=200_000, **kw)
        dist = fn(ds, driver_edge_max=0, **kw)
        assert drv.to_dict("records") == dist.to_dict("records"), fn.__name__


def test_cross_block_duplicate_pairs_distributed_parity():
    """Two edges with the same endpoints but different predicates placed
    in DIFFERENT input blocks: per-batch dedup alone would let both
    copies into the distributed rungs (inflating BFS sigma / duplicating
    peel rows); the global pair dedup must collapse them exactly like
    the driver rung does."""
    rows1 = pd.DataFrame(
        [("a", "x", "p", "b", "y"), ("b", "y", "p", "c", "y"), ("a", "x", "p", "c", "y")],
        columns=["subj_id", "subj_label", "pred", "obj_id", "obj_label"],
    )
    rows2 = pd.DataFrame(
        [("a", "x", "q", "b", "y"), ("c", "y", "q", "d", "y"), ("b", "y", "r", "c", "y")],
        columns=["subj_id", "subj_label", "pred", "obj_id", "obj_label"],
    )
    ds = ray.data.from_pandas([rows1, rows2])  # 2 blocks, (a,b)/(b,c) duplicated
    for fn, kw in (
        (betweenness_sampled, dict(sample_mod=1, hops=4)),
        (harmonic_sampled, dict(sample_mod=1, hops=4)),
        (ktruss, dict(k=3)),
    ):
        drv = fn(ds, driver_edge_max=200_000, **kw)
        dist = fn(ds, driver_edge_max=0, **kw)
        assert drv.to_dict("records") == dist.to_dict("records"), fn.__name__
    # betweenness hand count on the deduped graph {a->b, b->c, a->c,
    # c->d}: (a,c) is a DIRECT edge so b sits on no shortest path;
    # c carries (a,d) and (b,d) fully — duplicate inflation would have
    # put sigma(a,c)=2 and surfaced b with a 500_000 term
    out = betweenness_sampled(ds, sample_mod=1, hops=4, driver_edge_max=0)
    got = dict(zip(out["node"], out["bc_micro"]))
    assert "b" not in got
    assert got["c"] == 2_000_000
    # ktruss yields each surviving edge exactly once
    kt = ktruss(ds, k=3, driver_edge_max=0)
    assert not kt.duplicated(["a", "b"]).any()
