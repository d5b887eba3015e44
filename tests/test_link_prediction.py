"""Adamic-Adar link prediction (kgray.functions.graph.adamic_adar):
wedge emission per center, hub cut, existing-edge exclusion, and the
two-shuffle aggregation must be exact on a hand-computed graph.
"""

import math

import pandas as pd
import ray.data

from kgray.functions.graph import adamic_adar


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    out = adamic_adar(ray.data.from_pandas(df), **kw).to_pandas()
    if "u" not in out.columns:  # zero-row to_pandas loses the schema
        return pd.DataFrame(
            {"u": [], "v": [], "common_neighbors": [], "adamic_adar": []}
        )
    return out.sort_values(["u", "v"]).reset_index(drop=True)


def test_adamic_adar_hand_graph(ray_session):
    """Path a-z1-b plus a-z2-b (two shared neighbors, deg(z1)=deg(z2)=2)
    and a wedge c-z3-d where (c,d) is ALREADY an edge -> excluded."""
    edges = pd.DataFrame(
        {
            "src": ["a", "z1", "a", "z2", "c", "z3", "c"],
            "dst": ["z1", "b", "z2", "b", "z3", "d", "d"],
        }
    )
    out = _run(edges)
    # (a,b): common z1,z2 with weight 1/ln(2) each; (c,d) excluded; the
    # degree-2 shared-endpoint wedges: a and b share neighbors through
    # z1/z2 only; centers a,b,c,d themselves have deg 2 and emit wedges
    # (z1,z2) via a and via b.
    got = {(r.u, r.v): (r.common_neighbors, r.adamic_adar) for r in out.itertuples()}
    w2 = round(2 / math.log(2), 6)
    assert got[("a", "b")] == (2, w2)
    assert got[("z1", "z2")] == (2, w2)
    assert ("c", "d") not in got  # existing edge excluded
    # (z3, d) share center c? c's neighbors are {z3, d}: wedge (d, z3) —
    # but (z3,d) IS an edge -> excluded too
    assert ("d", "z3") not in got

    # without exclusion the existing edges reappear with their scores
    out2 = _run(edges, exclude_existing=False)
    got2 = {(r.u, r.v): r.common_neighbors for r in out2.itertuples()}
    assert got2[("c", "d")] == 1  # through z3
    assert got2[("d", "z3")] == 1  # through c


def test_adamic_adar_hub_cut_and_dedup(ray_session):
    """A center above max_center_degree emits no wedges; duplicate and
    reversed edge rows do not change degrees or counts."""
    rows = [("hub", f"n{i}") for i in range(5)]
    edges = pd.DataFrame(rows + rows + [(b, a) for a, b in rows], columns=["src", "dst"])
    full = _run(edges, max_center_degree=64)
    # all 10 pairs among n0..n4 through the hub, weight 1/ln(5)
    assert len(full) == 10
    assert (full["common_neighbors"] == 1).all()
    assert (full["adamic_adar"] == round(1 / math.log(5), 6)).all()

    cut = _run(edges, max_center_degree=4)
    assert len(cut) == 0  # hub excluded, no other center has >=2 neighbors


def test_adamic_adar_partition_invariance(ray_session):
    import numpy as np

    rng = np.random.default_rng(11)
    edges = pd.DataFrame(
        {
            "src": [f"u{i}" for i in rng.integers(0, 30, 300)],
            "dst": [f"v{i}" for i in rng.integers(0, 12, 300)],
        }
    )
    one = _run(edges)
    many = adamic_adar(ray.data.from_pandas(edges).repartition(7)).to_pandas()
    many = many.sort_values(["u", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
    assert len(one) > 0


def test_link_prediction_recall_matches_bruteforce(ray_session):
    """kg-completion recall: the distributed pipeline (hash holdout ->
    adamic_adar on the remainder -> bipartite role filter -> per-block
    top-k partials) must match an independent all-in-one brute force."""
    import hashlib
    import math

    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.functions.graph import link_prediction_recall

    rng = np.random.default_rng(11)
    people = [f"p{i}" for i in range(12)]
    orgs = [f"org{i}" for i in range(6)]
    rows = set()
    for p in people:
        for o in rng.choice(orgs, size=2, replace=False):
            rows.add((p, o))
    for i in range(len(orgs) - 1):  # org-org edges so AA has wedges
        rows.add((orgs[i], orgs[i + 1]))
    df = pd.DataFrame(sorted(rows), columns=["subj_name", "obj_name"])
    ks, mod = (3, 8), 3
    out = link_prediction_recall(
        ray.data.from_pandas(df), src_col="subj_name", dst_col="obj_name",
        holdout_mod=mod, ks=ks,
    )

    # ---- brute force ----
    def h64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")

    lo = df["subj_name"].where(df["subj_name"] <= df["obj_name"], df["obj_name"])
    hi = df["obj_name"].where(df["subj_name"] <= df["obj_name"], df["subj_name"])
    held = {
        (l, h) for l, h in zip(lo, hi) if h64(f"{l}|{h}") % mod == 0
    }
    train = df[[h64(f"{l}|{h}") % mod != 0 for l, h in zip(lo, hi)]]
    srcs = set(train["subj_name"])
    dsts = set(train["obj_name"])
    adj: dict = {}
    for s, d in zip(train["subj_name"], train["obj_name"]):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    score: dict = {}
    for z, nbrs in adj.items():
        if not (2 <= len(nbrs) <= 64):
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                score[(ns[i], ns[j])] = score.get((ns[i], ns[j]), 0.0) + 1.0 / math.log(len(nbrs))
    cand = [
        (round(aa, 6), u, v)
        for (u, v), aa in score.items()
        if v not in adj.get(u, set())
        and ((u in srcs and v in dsts) or (u in dsts and v in srcs))
    ]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    for k, row in zip(ks, out.itertuples(index=False)):
        hits = sum(1 for _, u, v in cand[:k] if (u, v) in held)
        assert row.k == k
        assert row.n_holdout == len(held)
        assert row.n_hits == hits, (k, cand[:k], held)
        exp = (hits * 1_000_000 // len(held)) / 1e6 if held else 0.0
        assert row.recall == exp
    assert len(held) > 0 and out["n_hits"].max() >= 0
