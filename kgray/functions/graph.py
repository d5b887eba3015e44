"""Graph-side operators over the nodes/edges datasets.

- isolated entities: the reference's anti-join ``entities − (start ∪ end)``
  (itext2kg/atom/models/knowledge_graph.py:80-83), used by the legacy
  isolated-entity re-prompt loop;
- node degrees: per-entity edge participation (a pre-aggregated groupby).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kgray.functions.broadcast import rows_of



def node_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(entity_id, name, label, out_degree, in_degree, degree) from the
    edges table — partial per-batch counts, then one small groupby."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        subj = b.groupby(["subj_id", "subj_name", "subj_label"], sort=False).size()
        obj = b.groupby(["obj_id", "obj_name", "obj_label"], sort=False).size()
        s = subj.reset_index()
        s.columns = ["entity_id", "name", "label", "out_degree"]
        s["in_degree"] = 0
        o = obj.reset_index()
        o.columns = ["entity_id", "name", "label", "in_degree"]
        o["out_degree"] = 0
        out = pd.concat([s, o], ignore_index=True)
        out["out_degree"] = out["out_degree"].astype("int64")
        out["in_degree"] = out["in_degree"].astype("int64")
        return out[["entity_id", "name", "label", "out_degree", "in_degree"]]

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (
            pd.util.hash_array(b["entity_id"].to_numpy(dtype=object)) % 64
        ).astype("int32")
        return b

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["entity_id", "name", "label"], sort=False)
            .agg(out_degree=("out_degree", "sum"), in_degree=("in_degree", "sum"))
            .reset_index()
        )
        out["out_degree"] = out["out_degree"].astype("int64")
        out["in_degree"] = out["in_degree"].astype("int64")
        out["degree"] = out["out_degree"] + out["in_degree"]
        return out

    return (
        edges.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )


def isolated_entities(nodes: ray.data.Dataset, edges: ray.data.Dataset) -> pd.DataFrame:
    """Anti-join: nodes that participate in no edge
    (knowledge_graph.py:80-83).  The referenced id set is collected from a
    distinct projection (vocabulary-sized) and broadcast as a filter."""
    ref_ids = set(
        r["entity_id"]
        for r in rows_of(node_degrees(edges).select_columns(["entity_id"]))
    )

    def keep_isolated(t: pa.Table) -> pa.Table:
        mask = pa.array([eid not in ref_ids for eid in t["entity_id"].to_pylist()])
        return t.filter(mask)

    return nodes.map_batches(keep_isolated, batch_format="pyarrow").to_pandas()


def pagerank(
    edges: ray.data.Dataset,
    src_col: str = "subj_name",
    dst_col: str = "obj_name",
    weight_col: str | None = "n_obs",
    damping: float = 0.85,
    iterations: int = 10,
    driver_edge_max: int = 200_000,
    driver_node_max: int = 10_000_000,
    num_buckets: int = 64,
    teleport_nodes=None,
) -> pd.DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution.

    ``teleport_nodes``: optional seed set for PERSONALIZED PageRank —
    teleport (and dangling mass) goes uniformly to the seeds instead of
    all nodes, ranking the graph "from the seeds' point of view"
    (graph-based retrieval / related-entity expansion).  The seed set is
    small by definition and broadcasts; seeds absent from the graph are
    ignored, an empty intersection raises.  ``None`` keeps the classic
    uniform behavior on the byte-identical code path.

    Scale ladder (VERDICT r3 #6): the EDGE stream never leaves the
    cluster on any rung.  Below ``driver_edge_max`` edges a driver numpy
    loop finishes instantly; between that and ``driver_node_max`` nodes
    the edge stream is integer-encoded once (node → dense index via a
    broadcast vocabulary) and re-streamed per iteration with sparse
    ``np.bincount`` partials — driver holds the node-sized rank vector;
    past ``driver_node_max`` (or with the knob forced to 0) NO node-sized
    driver state exists: ranks live as a hash-bucketed (node, out_w, r)
    Dataset and each iteration is two reduce-side joins (rank→edge-src
    co-location emits per-dst flow partials; flow→node co-location sums
    inflow and rewrites ranks), with only scalar dangling-mass reductions
    on the driver (see :func:`_pagerank_bucketed`).

    Float evaluation order mirrors the SQL oracle exactly:
    ``(r[src] * w) / out_w[src]`` per edge, ``damping * (inflow +
    dangling_mass / N)`` per node (distributed rungs sum inflow partials
    in shuffle order — agreement with the oracle is at the output's 1e-6
    rounding, same as the encoded rung).
    """
    import numpy as np
    import pyarrow as pa

    from kgray.functions.broadcast import cached_get

    def vocab_partial(t: pa.Table) -> pa.Table:
        w = (
            t[weight_col].cast(pa.float64())
            if weight_col is not None
            else pa.array(np.ones(len(t)), type=pa.float64())
        )
        srcs = (
            pa.table({"node": t[src_col], "out_w": w})
            .group_by("node")
            .aggregate([("out_w", "sum")])
        )
        dsts = pa.table({"node": t[dst_col]}).group_by("node").aggregate([([], "count_all")])
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [srcs["node"].combine_chunks().cast(pa.large_string()),
                     dsts["node"].combine_chunks().cast(pa.large_string())]
                ),
                "out_w": pa.concat_arrays(
                    [srcs["out_w_sum"].combine_chunks(),
                     pa.array(np.zeros(len(dsts)), type=pa.float64())]
                ),
            }
        )

    vp = edges.map_batches(vocab_partial, batch_format="pyarrow").materialize()
    # rung pick WITHOUT collecting the vocabulary: per-block partial rows
    # upper-bound the distinct node count
    if driver_node_max <= 0 or vp.count() > driver_node_max:
        return _pagerank_bucketed(
            edges,
            vp,
            src_col=src_col,
            dst_col=dst_col,
            weight_col=weight_col,
            damping=damping,
            iterations=iterations,
            num_buckets=num_buckets,
            teleport_nodes=teleport_nodes,
        )
    vocab = vp.to_pandas()
    if "node" in vocab.columns:
        nodes_df = vocab.groupby("node", sort=True)["out_w"].sum()
    else:  # zero-row input: partials never materialized a schema
        nodes_df = pd.Series(dtype="float64")
    n = len(nodes_df)
    if n == 0:
        return pd.DataFrame({"node": pd.Series(dtype=object), "pr": pd.Series(dtype="float64")})
    node_names = nodes_df.index.to_numpy(dtype=object)
    sw_vec = nodes_df.to_numpy(dtype=np.float64)
    idx_ref = ray.put({name: i for i, name in enumerate(node_names)})
    sw_ref = ray.put(sw_vec)

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        idx = cached_get(idx_ref)
        sw = cached_get(sw_ref)
        si = b[src_col].map(idx).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "si": si,
                "di": b[dst_col].map(idx).to_numpy(dtype=np.int64),
                "w": (
                    b[weight_col].to_numpy(dtype=np.float64)
                    if weight_col is not None
                    else np.ones(len(b))
                ),
                "sw": sw[si],
            }
        )

    encoded = edges.map_batches(encode, batch_format="pandas").materialize()
    n_edges = encoded.count()

    dangling = sw_vec == 0.0
    if teleport_nodes is not None:
        tmask = np.isin(node_names, list(teleport_nodes))
        ns = int(tmask.sum())
        if ns == 0:
            raise ValueError("no teleport node present in the graph")
        t = np.where(tmask, 1.0 / ns, 0.0)
        r = t.copy()
    else:
        t = None
        r = np.full(n, 1.0 / n)
    if n_edges <= driver_edge_max:
        # tiny aggregated graph: ten distributed rounds would be pure
        # per-iteration Dataset overhead — same ladder rule as entity
        # resolution (driver below the threshold, cluster above); math is
        # identical to the distributed branch
        e = encoded.to_pandas()
        si = e["si"].to_numpy()
        di = e["di"].to_numpy()
        w = e["w"].to_numpy()
        sw = e["sw"].to_numpy()
        for _ in range(iterations):
            flow = (r[si] * w) / sw
            inflow = np.bincount(di, weights=flow, minlength=n)
            mass = r[dangling].sum()
            if t is None:
                r = (1.0 - damping) / n + damping * (inflow + mass / n)
            else:
                r = (1.0 - damping) * t + damping * (inflow + mass * t)
    else:
        for _ in range(iterations):
            r_ref = ray.put(r)

            def contrib(b: pd.DataFrame, r_ref=r_ref) -> pd.DataFrame:
                rv = cached_get(r_ref)
                flow = (rv[b["si"].to_numpy()] * b["w"].to_numpy()) / b["sw"].to_numpy()
                dense = np.bincount(b["di"].to_numpy(), weights=flow, minlength=n)
                nz = np.nonzero(dense)[0]
                return pd.DataFrame({"di": nz, "inflow": dense[nz]})

            partials = encoded.map_batches(contrib, batch_format="pandas").to_pandas()
            inflow = np.zeros(n)
            np.add.at(inflow, partials["di"].to_numpy(), partials["inflow"].to_numpy())
            mass = r[dangling].sum()
            if t is None:
                r = (1.0 - damping) / n + damping * (inflow + mass / n)
            else:
                r = (1.0 - damping) * t + damping * (inflow + mass * t)

    pr = np.floor(r * 1e6 + 0.5) / 1e6  # half-away, matches DuckDB round()
    return pd.DataFrame({"node": node_names, "pr": pr})


def _pagerank_bucketed(
    edges: ray.data.Dataset,
    vp: ray.data.Dataset,
    *,
    src_col: str,
    dst_col: str,
    weight_col: str | None,
    damping: float,
    iterations: int,
    num_buckets: int,
    teleport_nodes=None,
) -> pd.DataFrame:
    """PageRank rung with NO node-sized driver state (VERDICT r3 #6 —
    the upgrade path past the broadcast-vocabulary ceiling): ranks live
    as a hash-bucketed (node, out_w, r) Dataset keyed by the node NAME
    (no integer encoding — an encoding dict would itself be node-sized
    driver state).

    Per iteration: (1) a scalar dangling-mass reduction; (2) rank rows
    and edge rows co-locate in hash(src) buckets and each bucket emits
    per-dst flow partials, pre-summed within the bucket; (3) flow
    partials and the rank base co-locate in hash(node) buckets and each
    bucket rewrites its ranks.  Driver traffic is one float per
    iteration; everything else is two bounded all-to-alls over the edge
    stream + the (node-count-sized, bucketed) rank state.

    ``vp``: the per-block (node, out_w) vocabulary partials, reused so
    the edge stream isn't re-scanned for the node table.
    """
    import numpy as np

    B = num_buckets

    def _nb(names) -> np.ndarray:
        return (
            pd.util.hash_array(np.asarray(names, dtype=object)) % np.uint64(B)
        ).astype("int32")

    def tag_nodes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "nb": _nb(b["node"]),
                "node": b["node"].astype(object),
                "out_w": b["out_w"].astype(np.float64),
            }
        )

    def combine_nodes(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False)["out_w"].sum().reset_index()
        out.insert(0, "nb", _nb(out["node"]))
        return out

    nodes = (
        vp.map_batches(tag_nodes, batch_format="pandas")
        .groupby("nb")
        .map_groups(combine_nodes, batch_format="pandas")
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "pr": pd.Series(dtype="float64")}
        )

    # personalized teleport: the seed set is small by definition and
    # broadcasts; the seed count present in the graph is one tiny reduce
    if teleport_nodes is not None:
        from kgray.functions.broadcast import cached_get as _cg

        seed_ref = ray.put(frozenset(teleport_nodes))

        def seed_hits(b: pd.DataFrame) -> pd.DataFrame:
            sset = _cg(seed_ref)
            return pd.DataFrame({"c": [int(b["node"].isin(sset).sum())]})

        ns = int(
            nodes.map_batches(seed_hits, batch_format="pandas").to_pandas()["c"].sum()
        )
        if ns == 0:
            raise ValueError("no teleport node present in the graph")

        def _tvals(names: pd.Series) -> np.ndarray:
            sset = _cg(seed_ref)
            return np.where(names.isin(sset), 1.0 / ns, 0.0)
    else:
        _tvals = None

    # shared wide schema for every unioned stream (pandas-block unions
    # need identical schemas): kind 0 = rank row (w=out_w, r=rank),
    # kind 1 = edge row (node=src, dst, w=weight), kind 2 = flow partial
    # (node=dst, r=partial inflow)
    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bkt": pd.Series(dtype="int32"),
                "kind": pd.Series(dtype="int8"),
                "node": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "w": pd.Series(dtype="float64"),
                "r": pd.Series(dtype="float64"),
            }
        )

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        w = (
            b[weight_col].to_numpy(dtype=np.float64)
            if weight_col is not None
            else np.ones(len(b))
        )
        return pd.DataFrame(
            {
                "bkt": _nb(b[src_col]),
                "kind": np.ones(len(b), dtype=np.int8),
                "node": b[src_col].astype(object),
                "dst": b[dst_col].astype(object),
                "w": w,
                "r": np.zeros(len(b)),
            }
        )

    edges_b = edges.map_batches(edge_rows, batch_format="pandas").materialize()

    def init_rank(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bkt": b["nb"].astype("int32"),
                "kind": np.zeros(len(b), dtype=np.int8),
                "node": b["node"].astype(object),
                "dst": np.full(len(b), "", dtype=object),
                "w": b["out_w"].to_numpy(dtype=np.float64),
                "r": (
                    np.full(len(b), 1.0 / n)
                    if _tvals is None
                    else _tvals(b["node"])
                ),
            }
        )

    rank = nodes.map_batches(init_rank, batch_format="pandas").materialize()

    def flow_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rk = g[g["kind"] == 0]
        e = g[g["kind"] == 1]
        if not len(e) or not len(rk):
            return _empty()
        m = e.merge(
            rk[["node", "w", "r"]].rename(columns={"w": "ow", "r": "rr"}), on="node"
        )
        flow = m["rr"].to_numpy() * m["w"].to_numpy() / m["ow"].to_numpy()
        out = (
            pd.DataFrame({"node": m["dst"].to_numpy(dtype=object), "f": flow})
            .groupby("node", sort=False)["f"]
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {
                "bkt": _nb(out["node"]),
                "kind": np.full(len(out), 2, dtype=np.int8),
                "node": out["node"].astype(object),
                "dst": np.full(len(out), "", dtype=object),
                "w": np.zeros(len(out)),
                "r": out["f"].to_numpy(dtype=np.float64),
            }
        )

    def mass_partial(b: pd.DataFrame) -> pd.DataFrame:
        z = b[(b["kind"] == 0) & (b["w"] == 0.0)]
        return pd.DataFrame({"m": [float(z["r"].sum())]})

    for _ in range(iterations):
        mass = float(
            rank.map_batches(mass_partial, batch_format="pandas").to_pandas()["m"].sum()
        )

        def update_in_bucket(
            g: pd.DataFrame, mass=mass, n=n, damping=damping
        ) -> pd.DataFrame:
            base = g[g["kind"] == 0]
            if not len(base):
                return _empty()
            fl = g[g["kind"] == 2]
            inflow = (
                fl.groupby("node", sort=False)["r"].sum()
                if len(fl)
                else pd.Series(dtype="float64")
            )
            iv = base["node"].map(inflow).fillna(0.0).to_numpy(dtype=np.float64)
            if _tvals is None:
                r_new = (1.0 - damping) / n + damping * (iv + mass / n)
            else:
                tv = _tvals(base["node"])
                r_new = (1.0 - damping) * tv + damping * (iv + mass * tv)
            return pd.DataFrame(
                {
                    "bkt": base["bkt"].astype("int32"),
                    "kind": np.zeros(len(base), dtype=np.int8),
                    "node": base["node"].astype(object),
                    "dst": np.full(len(base), "", dtype=object),
                    "w": base["w"].to_numpy(dtype=np.float64),
                    "r": r_new,
                }
            )

        flows = (
            rank.union(edges_b)
            .groupby("bkt")
            .map_groups(flow_in_bucket, batch_format="pandas")
        )
        rank = (
            rank.union(flows)
            .groupby("bkt")
            .map_groups(update_in_bucket, batch_format="pandas")
            .materialize()
        )

    out = rank.to_pandas()
    pr = np.floor(out["r"].to_numpy(dtype=np.float64) * 1e6 + 0.5) / 1e6
    return (
        pd.DataFrame({"node": out["node"].astype(object), "pr": pr})
        .sort_values("node", kind="mergesort")
        .reset_index(drop=True)
    )


def connected_components(
    edges: ray.data.Dataset,
    src_col: str = "a",
    dst_col: str = "b",
    driver_edge_max: int = 200_000,
    max_rounds: int = 64,
) -> pd.DataFrame:
    """Connected components over an undirected integer-keyed edge stream;
    returns (node, component) with component = the minimum node id of the
    component (reference counterpart: the transitive merge closure the
    matcher's union-find computes, itext2kg/atom/graph_matching).

    Scale shape (the pagerank ladder): the node VOCABULARY is collected
    once (bounded by nodes touched by edges — for dedup graphs that is the
    duplicate-pair universe, not the corpus) and sorted so dense index
    order == node-id order; edges integer-encode once and are re-streamed
    per round.  Below ``driver_edge_max`` a driver min-label loop finishes
    in microseconds; above it each round is one ``map_batches`` pass whose
    per-batch partial is a ``np.minimum``-reduced sparse update — the
    driver holds only the node-sized label vector and applies pointer
    jumping (``labels[labels]``) between rounds, so rounds needed is
    O(log diameter), not O(diameter).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from kgray.functions.broadcast import cached_get

    def vocab_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [
                t[src_col].combine_chunks().cast(pa.int64()),
                t[dst_col].combine_chunks().cast(pa.int64()),
            ]
        )
        return pa.table({"node": pc.unique(nodes)})

    vocab = edges.map_batches(vocab_partial, batch_format="pyarrow").to_pandas()
    if "node" not in vocab.columns or not len(vocab):
        return pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "component": pd.Series(dtype="int64")}
        )
    node_ids = np.unique(vocab["node"].to_numpy(dtype=np.int64))  # sorted
    n = len(node_ids)
    idx_of = {int(v): i for i, v in enumerate(node_ids)}
    idx_ref = ray.put(idx_of)

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        idx = cached_get(idx_ref)
        return pd.DataFrame(
            {
                "si": b[src_col].map(idx).to_numpy(dtype=np.int64),
                "di": b[dst_col].map(idx).to_numpy(dtype=np.int64),
            }
        )

    encoded = edges.map_batches(encode, batch_format="pandas").materialize()
    labels = np.arange(n, dtype=np.int64)

    if encoded.count() <= driver_edge_max:
        e = encoded.to_pandas()
        si = e["si"].to_numpy()
        di = e["di"].to_numpy()
        for _ in range(max_rounds):
            m = np.minimum(labels[si], labels[di])
            before = labels.copy()
            np.minimum.at(labels, si, m)
            np.minimum.at(labels, di, m)
            while True:  # pointer jumping to the fixpoint
                nxt = labels[labels]
                if np.array_equal(nxt, labels):
                    break
                labels = nxt
            if np.array_equal(before, labels):
                break
    else:
        for _ in range(max_rounds):
            l_ref = ray.put(labels)

            def upd(b: pd.DataFrame, l_ref=l_ref) -> pd.DataFrame:
                lv = cached_get(l_ref)
                si = b["si"].to_numpy()
                di = b["di"].to_numpy()
                m = np.minimum(lv[si], lv[di])
                dense = np.full(len(lv), np.iinfo(np.int64).max)
                np.minimum.at(dense, si, m)
                np.minimum.at(dense, di, m)
                nz = np.nonzero(dense < lv)[0]
                return pd.DataFrame({"i": nz, "l": dense[nz]})

            partials = encoded.map_batches(upd, batch_format="pandas").to_pandas()
            if not len(partials):
                break
            before = labels.copy()
            np.minimum.at(labels, partials["i"].to_numpy(), partials["l"].to_numpy())
            while True:
                nxt = labels[labels]
                if np.array_equal(nxt, labels):
                    break
                labels = nxt
            if np.array_equal(before, labels):
                break

    return pd.DataFrame(
        {"node": node_ids, "component": node_ids[labels].astype(np.int64)}
    )


def connected_components_named(
    edges: ray.data.Dataset,
    src_col: str = "subj_name",
    dst_col: str = "obj_name",
    driver_edge_max: int = 200_000,
) -> pd.DataFrame:
    """Connected components over a STRING-keyed undirected edge stream;
    returns (node, component) with component = the lexicographically
    smallest member name.

    Thin encoding rung over :func:`connected_components`: the node
    vocabulary is collected once (edge-touched nodes only — the same
    documented budget as pagerank/kcore), SORTED so dense-index order ==
    lexicographic name order (min index ↔ min name, which is what the
    SQL twin's transitive-closure ``min(name)`` computes), the edge
    stream integer-encodes once, and the min-label ladder runs on the
    encoded stream (driver numpy below ``driver_edge_max``, distributed
    sparse-update rounds with pointer jumping above)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kgray.functions.broadcast import cached_get

    def vocab_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [
                t[src_col].combine_chunks().cast(pa.large_string()),
                t[dst_col].combine_chunks().cast(pa.large_string()),
            ]
        )
        return pa.table({"node": pc.unique(nodes)})

    vocab = edges.map_batches(vocab_partial, batch_format="pyarrow").to_pandas()
    if "node" not in vocab.columns or not len(vocab):
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "component": pd.Series(dtype=object)}
        )
    node_names = np.unique(vocab["node"].to_numpy())  # sorted
    idx_ref = ray.put({v: i for i, v in enumerate(node_names)})

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        idx = cached_get(idx_ref)
        return pd.DataFrame(
            {
                "a": b[src_col].map(idx).to_numpy(dtype=np.int64),
                "b": b[dst_col].map(idx).to_numpy(dtype=np.int64),
            }
        )

    comp = connected_components(
        edges.map_batches(encode, batch_format="pandas"),
        src_col="a",
        dst_col="b",
        driver_edge_max=driver_edge_max,
    )
    return pd.DataFrame(
        {
            "node": node_names[comp["node"].to_numpy(dtype=np.int64)],
            "component": node_names[comp["component"].to_numpy(dtype=np.int64)],
        }
    )


def _shortest_paths_bucketed(
    edges: ray.data.Dataset,
    seeds: list[str],
    *,
    hops: int,
    src_col: str,
    dst_col: str,
    weight_col: str | None,
    directed: bool,
    num_buckets: int,
) -> pd.DataFrame:
    """Shortest-paths rung with NO node-sized driver state (the pagerank
    `_pagerank_bucketed` pattern): distances live as a hash-bucketed
    (node, d) Dataset keyed by the node NAME, initialized sparse at the
    seed set, and each Bellman-Ford round is two reduce-side bucket
    joins — (dist ∪ edges) co-locate in hash(src) buckets and emit
    per-dst candidate minima; (dist ∪ candidates) co-locate in
    hash(node) buckets and keep the min.  Driver traffic is zero during
    the rounds; the final result (reached nodes only) is output-sized.

    Candidate values are the identical ``dist + cost`` floats the driver
    rung computes and min() is order-independent, so the rungs agree
    bit-for-bit before the 1e-6 rounding (pinned by a forced-knob parity
    test)."""
    B = num_buckets

    def _nb(names) -> np.ndarray:
        return (
            pd.util.hash_array(np.asarray(names, dtype=object)) % np.uint64(B)
        ).astype("int32")

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bkt": pd.Series(dtype="int32"),
                "kind": pd.Series(dtype="int8"),
                "node": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "d": pd.Series(dtype="float64"),
            }
        )

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        w = (
            b[weight_col].to_numpy(dtype=np.float64)
            if weight_col is not None
            else np.ones(len(b))
        )
        c = 1.0 / w
        src = b[src_col].to_numpy(dtype=object)
        dst = b[dst_col].to_numpy(dtype=object)
        if not directed:
            src, dst, c = (
                np.concatenate([src, dst]),
                np.concatenate([dst, src]),
                np.concatenate([c, c]),
            )
        out = pd.DataFrame({"node": src, "dst": dst, "d": c})
        # parallel edges keep the cheapest per (src, dst) within the batch;
        # the bucket-level min below makes it global (src keys co-locate)
        out = out.groupby(["node", "dst"], sort=False, as_index=False)["d"].min()
        out.insert(0, "kind", np.int8(1))
        out.insert(0, "bkt", _nb(out["node"]))
        return out

    def edge_dedup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["node", "dst"], sort=False, as_index=False)["d"].min()
        out.insert(0, "kind", np.int8(1))
        out.insert(0, "bkt", _nb(out["node"]))
        return out

    edges_b = (
        edges.map_batches(edge_rows, batch_format="pandas")
        .groupby("bkt")
        .map_groups(edge_dedup, batch_format="pandas")
        .materialize()
    )

    # seed membership: the seed set is small by definition and broadcasts;
    # one tiny distinct reduce finds the seeds present in the graph
    from kgray.functions.broadcast import cached_get as _cg

    seed_ref = ray.put(frozenset(seeds))

    def seed_hits(b: pd.DataFrame) -> pd.DataFrame:
        sset = _cg(seed_ref)
        hit = pd.unique(
            np.concatenate(
                [
                    b.loc[b["node"].isin(sset), "node"].to_numpy(dtype=object),
                    b.loc[b["dst"].isin(sset), "dst"].to_numpy(dtype=object),
                ]
            )
        )
        return pd.DataFrame({"node": pd.Series(hit, dtype=object)})

    present = edges_b.map_batches(seed_hits, batch_format="pandas").to_pandas()
    present_names = (
        np.unique(present["node"].to_numpy(dtype=object))
        if "node" in present.columns and len(present)
        else np.array([], dtype=object)
    )
    if not len(present_names):
        # rung parity: an EMPTY graph returns the empty typed frame (the
        # driver rung's early return); seeds absent from a non-empty
        # graph raise, exactly as the driver rung does
        if edges_b.count() == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype=object), "dist": pd.Series(dtype="float64")}
            )
        raise ValueError("no seed present in the graph")

    dist = ray.data.from_pandas(
        pd.DataFrame(
            {
                "bkt": _nb(present_names),
                "kind": np.zeros(len(present_names), dtype=np.int8),
                "node": pd.Series(present_names, dtype=object),
                "dst": pd.Series([""] * len(present_names), dtype=object),
                "d": np.zeros(len(present_names)),
            }
        )
    )

    def cand_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dv = g[g["kind"] == 0]
        e = g[g["kind"] == 1]
        if not len(e) or not len(dv):
            return _empty()
        m = e.merge(dv[["node", "d"]].rename(columns={"d": "dd"}), on="node")
        if not len(m):
            return _empty()
        out = (
            pd.DataFrame(
                {
                    "node": m["dst"].to_numpy(dtype=object),
                    "d": m["dd"].to_numpy() + m["d"].to_numpy(),
                }
            )
            .groupby("node", sort=False, as_index=False)["d"]
            .min()
        )
        return pd.DataFrame(
            {
                "bkt": _nb(out["node"]),
                "kind": np.full(len(out), 2, dtype=np.int8),
                "node": out["node"].astype(object),
                "dst": np.full(len(out), "", dtype=object),
                "d": out["d"].to_numpy(dtype=np.float64),
            }
        )

    def min_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False, as_index=False)["d"].min()
        return pd.DataFrame(
            {
                "bkt": _nb(out["node"]),
                "kind": np.zeros(len(out), dtype=np.int8),
                "node": out["node"].astype(object),
                "dst": np.full(len(out), "", dtype=object),
                "d": out["d"].to_numpy(dtype=np.float64),
            }
        )

    for _ in range(hops):
        cands = (
            dist.union(edges_b)
            .groupby("bkt")
            .map_groups(cand_in_bucket, batch_format="pandas")
        )
        dist = (
            dist.union(cands)
            .groupby("bkt")
            .map_groups(min_in_bucket, batch_format="pandas")
            .materialize()
        )

    out = dist.to_pandas()
    d = np.floor(out["d"].to_numpy(dtype=np.float64) * 1e6 + 0.5) / 1e6
    return (
        pd.DataFrame({"node": out["node"].astype(object), "dist": d})
        .sort_values("node", kind="mergesort")
        .reset_index(drop=True)
    )


def shortest_paths(
    edges: ray.data.Dataset,
    seeds: list[str],
    hops: int = 4,
    src_col: str = "subj_name",
    dst_col: str = "obj_name",
    weight_col: str | None = "n_obs",
    directed: bool = False,
    driver_edge_max: int = 200_000,
    driver_node_max: int = 10_000_000,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Hop-bounded weighted single-source shortest distances (multi-seed
    Bellman-Ford): for every node reachable from the seed set within
    ``hops`` relaxation rounds, the minimum path cost, where edge cost =
    ``1 / weight`` (strong ties are short — the KG-proximity convention;
    ``weight_col=None`` degrades to hop counting).  A bounded unroll, not
    a fixpoint: both the engine and the SQL twin run EXACTLY ``hops``
    synchronized rounds, so they agree even on graphs whose true shortest
    paths need more hops.

    Scale ladder mirrors :func:`pagerank`'s: sorted node vocabulary
    collected once, edges integer-encode once; below ``driver_edge_max``
    the relaxation loop is driver numpy, above it each round re-streams
    the encoded edges with per-batch ``np.minimum``-reduced sparse
    partials over the broadcast distance vector — driver state is one
    float per node; past ``driver_node_max`` (or with the knob forced to
    0) NO node-sized driver state exists — distances live as a
    hash-bucketed sparse (node, d) Dataset and each round is two
    reduce-side bucket joins (see :func:`_shortest_paths_bucketed`).
    min() is order-independent and each candidate is the identical
    ``dist + 1/w`` float, so all rungs match bit-for-bit before the 1e-6
    rounding.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from kgray.functions.broadcast import cached_get

    INF = np.float64(1e18)

    def vocab_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [
                t[src_col].combine_chunks().cast(pa.large_string()),
                t[dst_col].combine_chunks().cast(pa.large_string()),
            ]
        )
        return pa.table({"node": pc.unique(nodes)})

    vp = edges.map_batches(vocab_partial, batch_format="pyarrow").materialize()
    # rung pick WITHOUT collecting the vocabulary: per-block partial rows
    # upper-bound the distinct node count
    if driver_node_max <= 0 or vp.count() > driver_node_max:
        return _shortest_paths_bucketed(
            edges,
            seeds,
            hops=hops,
            src_col=src_col,
            dst_col=dst_col,
            weight_col=weight_col,
            directed=directed,
            num_buckets=num_buckets,
        )
    vocab = vp.to_pandas()
    if "node" not in vocab.columns or not len(vocab):
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "dist": pd.Series(dtype="float64")}
        )
    node_names = np.unique(vocab["node"].to_numpy())  # sorted
    n = len(node_names)
    idx_of = {v: i for i, v in enumerate(node_names)}
    idx_ref = ray.put(idx_of)

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        idx = cached_get(idx_ref)
        si = b[src_col].map(idx).to_numpy(dtype=np.int64)
        di = b[dst_col].map(idx).to_numpy(dtype=np.int64)
        w = (
            b[weight_col].to_numpy(dtype=np.float64)
            if weight_col is not None
            else np.ones(len(b))
        )
        c = 1.0 / w
        if not directed:
            si, di, c = (
                np.concatenate([si, di]),
                np.concatenate([di, si]),
                np.concatenate([c, c]),
            )
        # parallel edges keep only the cheapest per (si, di) — min() later
        # makes extras harmless, this just trims the re-streamed volume
        out = pd.DataFrame({"si": si, "di": di, "c": c})
        return out.groupby(["si", "di"], sort=False, as_index=False)["c"].min()

    encoded = edges.map_batches(encode, batch_format="pandas").materialize()
    dist = np.full(n, INF)
    seed_idx = [idx_of[s] for s in seeds if s in idx_of]
    if not seed_idx:
        raise ValueError("no seed present in the graph")
    dist[seed_idx] = 0.0

    if encoded.count() <= driver_edge_max:
        e = encoded.to_pandas()
        si = e["si"].to_numpy()
        di = e["di"].to_numpy()
        c = e["c"].to_numpy()
        for _ in range(hops):
            cand = dist[si] + c
            nxt = dist.copy()
            np.minimum.at(nxt, di, cand)
            if np.array_equal(nxt, dist):
                break
            dist = nxt
    else:
        for _ in range(hops):
            d_ref = ray.put(dist)

            def relax(b: pd.DataFrame, d_ref=d_ref) -> pd.DataFrame:
                dv = cached_get(d_ref)
                cand = dv[b["si"].to_numpy()] + b["c"].to_numpy()
                dense = np.full(len(dv), INF)
                np.minimum.at(dense, b["di"].to_numpy(), cand)
                nz = np.nonzero(dense < dv)[0]
                return pd.DataFrame({"i": nz, "d": dense[nz]})

            parts = encoded.map_batches(relax, batch_format="pandas").to_pandas()
            if not len(parts):
                break
            np.minimum.at(dist, parts["i"].to_numpy(), parts["d"].to_numpy())

    reached = dist < INF
    d = np.floor(dist[reached] * 1e6 + 0.5) / 1e6  # half-away, = DuckDB round()
    return pd.DataFrame({"node": node_names[reached], "dist": d})


def _lpa_bucketed(
    edges: ray.data.Dataset,
    *,
    rounds: int,
    src_col: str,
    dst_col: str,
    num_buckets: int,
) -> pd.DataFrame:
    """Label-propagation rung with NO node-sized driver state: labels
    live as a hash-bucketed (node, lbl) Dataset keyed by the node NAME;
    each synchronous round is two reduce-side bucket joins — (labels ∪
    directed edges) co-locate in hash(src) buckets and emit
    pre-aggregated (voter, label, count) vote partials; (labels ∪ votes)
    co-locate in hash(node) buckets and each bucket applies the argmax
    (max count, tie → lexicographically smallest label — identical to
    the driver rung's sorted-vocabulary index tie-break, since the dense
    index order IS lexicographic).  Driver traffic during the rounds is
    zero; the returned frame is output-sized, as in the other rungs."""
    B = num_buckets

    def _nb(names) -> np.ndarray:
        return (
            pd.util.hash_array(np.asarray(names, dtype=object)) % np.uint64(B)
        ).astype("int32")

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bkt": pd.Series(dtype="int32"),
                "kind": pd.Series(dtype="int8"),
                "node": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "lbl": pd.Series(dtype=object),
                "c": pd.Series(dtype="int64"),
            }
        )

    def seed_rows(b: pd.DataFrame) -> pd.DataFrame:
        src = b[src_col].to_numpy(dtype=object)
        dst = b[dst_col].to_numpy(dtype=object)
        # every endpoint (self-loop-only nodes included) seeds a label row
        nodes = pd.unique(np.concatenate([src, dst]))
        keep = src != dst  # self-loops don't vote
        # directed BOTH ways so each endpoint's label reaches the other
        vs = np.concatenate([src[keep], dst[keep]])
        vd = np.concatenate([dst[keep], src[keep]])
        ev = pd.DataFrame({"node": vs, "dst": vd}).drop_duplicates()
        out = pd.DataFrame(
            {
                "bkt": np.concatenate([_nb(nodes), _nb(ev["node"])]),
                "kind": np.concatenate(
                    [np.zeros(len(nodes), dtype=np.int8), np.ones(len(ev), dtype=np.int8)]
                ),
                "node": np.concatenate(
                    [nodes, ev["node"].to_numpy(dtype=object)]
                ),
                "dst": np.concatenate(
                    [np.full(len(nodes), "", dtype=object), ev["dst"].to_numpy(dtype=object)]
                ),
                "lbl": np.concatenate(
                    [nodes, np.full(len(ev), "", dtype=object)]
                ),
                "c": np.zeros(len(nodes) + len(ev), dtype=np.int64),
            }
        )
        return out

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # hash(node) co-locates every copy of a directed edge AND every
        # seed copy of a node, so in-bucket dedup is global
        e = g[g["kind"] == 1].drop_duplicates(["node", "dst"])
        s = g[g["kind"] == 0].drop_duplicates(["node"])
        return pd.concat([s, e], ignore_index=True)

    state0 = (
        edges.map_batches(seed_rows, batch_format="pandas")
        .groupby("bkt")
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()
    )
    edges_b = state0.map_batches(
        lambda b: b[b["kind"] == 1], batch_format="pandas"
    ).materialize()
    labels = state0.map_batches(
        lambda b: b[b["kind"] == 0], batch_format="pandas"
    ).materialize()

    def votes_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lb = g[g["kind"] == 0]
        e = g[g["kind"] == 1]
        if not len(e) or not len(lb):
            return _empty()
        m = e.merge(lb[["node", "lbl"]].rename(columns={"lbl": "sl"}), on="node")
        if not len(m):
            return _empty()
        out = (
            pd.DataFrame(
                {
                    "node": m["dst"].to_numpy(dtype=object),
                    "lbl": m["sl"].to_numpy(dtype=object),
                }
            )
            .groupby(["node", "lbl"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )
        return pd.DataFrame(
            {
                "bkt": _nb(out["node"]),
                "kind": np.full(len(out), 2, dtype=np.int8),
                "node": out["node"].astype(object),
                "dst": np.full(len(out), "", dtype=object),
                "lbl": out["lbl"].astype(object),
                "c": out["c"].to_numpy(dtype=np.int64),
            }
        )

    def update_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["kind"] == 0]
        if not len(base):
            return _empty()
        v = g[g["kind"] == 2]
        if len(v):
            # votes from two bucket tasks for the same voter merge here
            v = v.groupby(["node", "lbl"], sort=False, as_index=False)["c"].sum()
            v = v.sort_values(["node", "c", "lbl"], ascending=[True, False, True])
            win = v.drop_duplicates("node").set_index("node")["lbl"]
            new = base["node"].map(win)
            lbl = np.where(
                new.notna().to_numpy(),
                new.to_numpy(dtype=object),
                base["lbl"].to_numpy(dtype=object),
            )
        else:
            lbl = base["lbl"].to_numpy(dtype=object)
        return pd.DataFrame(
            {
                "bkt": base["bkt"].astype("int32"),
                "kind": np.zeros(len(base), dtype=np.int8),
                "node": base["node"].astype(object),
                "dst": np.full(len(base), "", dtype=object),
                "lbl": pd.Series(lbl, dtype=object).to_numpy(dtype=object),
                "c": np.zeros(len(base), dtype=np.int64),
            }
        )

    for _ in range(rounds):
        votes = (
            labels.union(edges_b)
            .groupby("bkt")
            .map_groups(votes_in_bucket, batch_format="pandas")
        )
        labels = (
            labels.union(votes)
            .groupby("bkt")
            .map_groups(update_in_bucket, batch_format="pandas")
            .materialize()
        )

    out = labels.to_pandas()
    if "node" not in out.columns or not len(out):
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "community": pd.Series(dtype=object)}
        )
    return (
        pd.DataFrame(
            {"node": out["node"].astype(object), "community": out["lbl"].astype(object)}
        )
        .sort_values("node", kind="mergesort")
        .reset_index(drop=True)
    )


def label_propagation(
    edges: ray.data.Dataset,
    rounds: int = 4,
    src_col: str = "subj_name",
    dst_col: str = "obj_name",
    driver_edge_max: int = 200_000,
    driver_node_max: int = 10_000_000,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Synchronous label-propagation community detection over the
    undirected DISTINCT edge set: every node starts labelled with its own
    name; each round every node simultaneously adopts the most frequent
    label among its neighbours (ties → lexicographically smallest label;
    isolated nodes keep their label).  A FIXED unroll of ``rounds``
    synchronized rounds — sync LPA can oscillate on bipartite graphs, so
    determinism comes from both the engine and the SQL twin running the
    identical round count, not from a fixpoint claim.

    Scale shape (the pagerank ladder): sorted vocabulary collected once
    (dense-index order == lexicographic label order, so integer argmin
    tie-breaks == the twin's ``min(label)``), distinct undirected edges
    integer-encode once; below ``driver_edge_max`` the rounds are driver
    numpy (bincount over (dst, label) pairs + lexsort argmax), above it
    per-batch (dst, label, count) partials pre-aggregate in
    ``map_batches`` and the driver combines label votes — driver state is
    one int per node plus the (node, label) vote stream, bounded by the
    distinct edge count; past ``driver_node_max`` (or with the knob
    forced to 0) NO node-sized driver state exists — labels live as a
    hash-bucketed (node, lbl) Dataset and each round is two reduce-side
    bucket joins (see :func:`_lpa_bucketed`)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kgray.functions.broadcast import cached_get

    def vocab_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [
                t[src_col].combine_chunks().cast(pa.large_string()),
                t[dst_col].combine_chunks().cast(pa.large_string()),
            ]
        )
        return pa.table({"node": pc.unique(nodes)})

    vp = edges.map_batches(vocab_partial, batch_format="pyarrow").materialize()
    # rung pick WITHOUT collecting the vocabulary: per-block partial rows
    # upper-bound the distinct node count
    if driver_node_max <= 0 or vp.count() > driver_node_max:
        return _lpa_bucketed(
            edges,
            rounds=rounds,
            src_col=src_col,
            dst_col=dst_col,
            num_buckets=num_buckets,
        )
    vocab = vp.to_pandas()
    if "node" not in vocab.columns or not len(vocab):
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "community": pd.Series(dtype=object)}
        )
    node_names = np.unique(vocab["node"].to_numpy())  # sorted
    n = len(node_names)
    idx_ref = ray.put({v: i for i, v in enumerate(node_names)})

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        idx = cached_get(idx_ref)
        si = b[src_col].map(idx).to_numpy(dtype=np.int64)
        di = b[dst_col].map(idx).to_numpy(dtype=np.int64)
        keep = si != di  # self-loops don't vote
        lo = np.minimum(si[keep], di[keep])
        hi = np.maximum(si[keep], di[keep])
        out = pd.DataFrame({"si": lo, "di": hi}).drop_duplicates()
        out["eb"] = ((out["si"] * 1315423911 + out["di"]) % 64).astype("int32")
        return out

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["si", "di"])[["si", "di"]]

    # global dedup (an edge seen in two batches must not double-vote):
    # per-batch dedup + one bucketed groupby, same shape as kcore's
    encoded = (
        edges.map_batches(encode, batch_format="pandas")
        .groupby("eb")
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()
    )
    labels = np.arange(n, dtype=np.int64)

    def argmax_votes(
        v: np.ndarray, lbl: np.ndarray, w: np.ndarray | None = None
    ) -> np.ndarray:
        """labels' next value from (node, label[, count]) vote rows: most
        votes, tie → smallest label index; nodes with no votes keep their
        own.  ``w=None`` means each row is one vote."""
        if not len(v):
            return labels
        key = v * np.int64(n) + lbl
        if w is None:
            uk, cnt = np.unique(key, return_counts=True)
        else:  # pre-aggregated (node, label, count) partials
            uk, inv = np.unique(key, return_inverse=True)
            cnt = np.zeros(len(uk), dtype=np.int64)
            np.add.at(cnt, inv, w)
        uv = uk // n
        ul = uk % n
        # per node: max count, tie min label — lexsort puts the winner last
        order = np.lexsort((-ul, cnt, uv))
        uv, ul, cnt = uv[order], ul[order], cnt[order]
        last = np.flatnonzero(np.r_[uv[1:] != uv[:-1], True])
        nxt = labels.copy()
        nxt[uv[last]] = ul[last]
        return nxt

    if encoded.count() <= driver_edge_max:
        e = encoded.to_pandas()
        if not len(e) or "si" not in e.columns:
            return pd.DataFrame({"node": node_names, "community": node_names})
        si = e["si"].to_numpy()
        di = e["di"].to_numpy()
        for _ in range(rounds):
            v = np.concatenate([di, si])  # undirected: both endpoints vote
            lbl = np.concatenate([labels[si], labels[di]])
            labels = argmax_votes(v, lbl)
    else:
        for _ in range(rounds):
            l_ref = ray.put(labels)

            def votes(b: pd.DataFrame, l_ref=l_ref) -> pd.DataFrame:
                lv = cached_get(l_ref)
                si = b["si"].to_numpy()
                di = b["di"].to_numpy()
                v = np.concatenate([di, si])
                lbl = np.concatenate([lv[si], lv[di]])
                out = pd.DataFrame({"v": v, "l": lbl})
                return out.groupby(["v", "l"], sort=False).size().rename("c").reset_index()

            parts = encoded.map_batches(votes, batch_format="pandas").to_pandas()
            if not len(parts):
                break
            labels = argmax_votes(
                parts["v"].to_numpy(np.int64),
                parts["l"].to_numpy(np.int64),
                parts["c"].to_numpy(np.int64),
            )

    return pd.DataFrame({"node": node_names, "community": node_names[labels]})


def pair_clusters_min_rep(
    pairs: ray.data.Dataset,
    src_col: str = "a",
    dst_col: str = "b",
    driver_edge_max: int = 200_000,
) -> dict[int, int]:
    """Shared clustering rung for EVERY pair-graph dedup variant (MinHash,
    SimHash, SemDeDup, embedding near-dup): connected components over the
    pair Dataset with representative = component-minimum id, returned as
    the NON-IDENTITY ``{id → representative}`` map (merged docs only —
    the thing small enough to broadcast).

    Below ``driver_edge_max`` edges this is a driver min-label loop
    (equivalent to union-find); above it — or with the knob forced to 0 —
    each round is a distributed ``map_batches`` sparse-update pass
    (see :func:`connected_components`), so no dedup variant ever holds a
    driver-bound pair set (VERDICT r2 #3)."""
    comp = connected_components(
        pairs, src_col=src_col, dst_col=dst_col, driver_edge_max=driver_edge_max
    )
    node = comp["node"].to_numpy(dtype=np.int64)
    rep = comp["component"].to_numpy(dtype=np.int64)
    keep = node != rep
    return dict(zip(node[keep].tolist(), rep[keep].tolist()))


def triangle_counts(
    edges: ray.data.Dataset,
    src_col: str = "a",
    dst_col: str = "b",
) -> pd.DataFrame:
    """Per-node triangle counts over an undirected edge stream — the
    clustering-coefficient numerator (dup-graph density diagnostics).

    Scale shape: adjacency is built over the nodes TOUCHED BY EDGES (the
    dup universe, not the corpus — the connected_components budget) and
    broadcast once via ``ray.put``; the edge stream is processed in
    ``map_batches``, each edge contributing one sorted-array intersection
    (``np.intersect1d`` on the two neighbor lists); per-batch (node,
    count) partials reduce driver-side.  tri(v) = Σ_incident-edge
    |N(a)∩N(b)| / 2 — each triangle reaches v through exactly two of its
    incident edges."""
    import numpy as np

    from kgray.functions.broadcast import cached_get

    raw = edges.select_columns([src_col, dst_col]).to_pandas()
    if src_col not in raw.columns or not len(raw):
        # all-empty blocks lose their schema on to_pandas (column-less frame)
        return pd.DataFrame(
            {"node": pd.Series(dtype="int64"), "n_tri": pd.Series(dtype="int64")}
        )
    # the edge list itself is dup-universe-sized (see connected_components);
    # adjacency build is a driver-side sort over it.  Canonicalize a<b and
    # dedupe so reversed/repeated stream rows can't double-count, and drop
    # self-loops (a triangle needs three distinct nodes).
    nodes = np.unique(
        np.concatenate(
            [raw[src_col].to_numpy(dtype=np.int64), raw[dst_col].to_numpy(dtype=np.int64)]
        )
    )
    lo = raw[[src_col, dst_col]].min(axis=1).to_numpy(dtype=np.int64)
    hi = raw[[src_col, dst_col]].max(axis=1).to_numpy(dtype=np.int64)
    e = pd.DataFrame({src_col: lo, dst_col: hi})[lo != hi].drop_duplicates()
    if not len(e):
        return pd.DataFrame({"node": nodes, "n_tri": np.zeros(len(nodes), dtype=np.int64)})
    a = e[src_col].to_numpy(dtype=np.int64)
    b = e[dst_col].to_numpy(dtype=np.int64)
    adj: dict[int, np.ndarray] = {}
    both = pd.DataFrame({"u": np.concatenate([a, b]), "v": np.concatenate([b, a])})
    for u, grp in both.groupby("u")["v"]:
        adj[int(u)] = np.sort(grp.to_numpy(dtype=np.int64))
    adj_ref = ray.put(adj)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ad = cached_get(adj_ref)
        cnt: dict[int, int] = {}
        for u, v in zip(batch[src_col].to_numpy(), batch[dst_col].to_numpy()):
            n = len(np.intersect1d(ad[int(u)], ad[int(v)], assume_unique=True))
            if n:
                cnt[int(u)] = cnt.get(int(u), 0) + n
                cnt[int(v)] = cnt.get(int(v), 0) + n
        return pd.DataFrame({"node": list(cnt), "c": list(cnt.values())})

    parts = ray.data.from_pandas(e).map_batches(partial, batch_format="pandas").to_pandas()
    total = (
        parts.groupby("node")["c"].sum() // 2
        if len(parts)
        else pd.Series(dtype="int64")
    )
    out = pd.DataFrame({"node": nodes})
    out["n_tri"] = out["node"].map(total).fillna(0).astype("int64")
    return out


def k_hop_neighborhood(
    edges: ray.data.Dataset,
    seeds: list[str],
    hops: int = 2,
    directed: bool = False,
    src_col: str = "subj_name",
    dst_col: str = "obj_name",
    frontier_broadcast_max: int = 1_000_000,
) -> pd.DataFrame:
    """BFS subgraph extraction (the GraphRAG retrieval primitive): every
    node within ``hops`` of the seed set, labeled with its first-reach
    hop.  Seeds are hop 0 whether or not they appear in the graph.

    Ladder (VERDICT r3 #6): while the frontier fits
    ``frontier_broadcast_max`` it ships via ``ray.put`` (never per batch)
    and each edge block emits its batch-distinct matches — driver state
    bounded by the reached set.  The moment a frontier outgrows the knob
    (or with the knob forced to 0), the remaining hops run as
    hash-bucketed Dataset joins: frontier rows co-locate with edge rows
    in hash(endpoint) buckets to emit neighbors, neighbors co-locate with
    visited rows in hash(node) buckets for the anti-join, and only the
    final result (inherently reached-set-sized — it IS the return value)
    is collected.  The reference has no graph-query layer; this extends
    the engine's analytics the way pagerank does.
    """
    visited: dict[str, int] = {s: 0 for s in seeds}
    frontier = sorted(visited)
    for h in range(1, hops + 1):
        if len(frontier) > frontier_broadcast_max or frontier_broadcast_max <= 0:
            return _k_hop_bucketed(
                edges,
                visited,
                frontier,
                start_hop=h,
                hops=hops,
                directed=directed,
                src_col=src_col,
                dst_col=dst_col,
            )
        f_ref = ray.put(np.array(frontier, dtype=object))

        def expand(b: pd.DataFrame, f_ref=f_ref) -> pd.DataFrame:
            from kgray.functions.broadcast import cached_get

            fr = cached_get(f_ref)
            s = b[src_col].to_numpy(dtype=object)
            o = b[dst_col].to_numpy(dtype=object)
            found = [o[np.isin(s, fr)]]
            if not directed:
                found.append(s[np.isin(o, fr)])
            u = np.unique(np.concatenate(found)) if found else np.empty(0, object)
            return pd.DataFrame({"name": u})

        out = edges.map_batches(expand, batch_format="pandas").to_pandas()
        neigh = out["name"].unique() if "name" in out.columns else []
        new = sorted(n for n in neigh if n not in visited)
        if not new:
            break
        for n in new:
            visited[n] = h
        frontier = new
    return (
        pd.DataFrame({"name": list(visited), "hop": np.array(list(visited.values()), dtype=np.int64)})
        .sort_values(["hop", "name"], kind="mergesort")
        .reset_index(drop=True)
    )


def _k_hop_bucketed(
    edges: ray.data.Dataset,
    visited: dict[str, int],
    frontier: list[str],
    *,
    start_hop: int,
    hops: int,
    directed: bool,
    src_col: str,
    dst_col: str,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Dataset-join BFS rung for frontiers past the broadcast knob: the
    frontier and visited sets live as hash-bucketed Datasets; each hop is
    two reduce-side co-locations (frontier×edges → neighbors, neighbors×
    visited → anti-join) and ships one COUNT to the driver.  Entered
    mid-BFS with whatever broadcast hops already reached."""

    def _nb(names) -> np.ndarray:
        return (
            pd.util.hash_array(np.asarray(names, dtype=object)) % np.uint64(num_buckets)
        ).astype("int32")

    def _rows(names, hops_v, kind: int) -> pd.DataFrame:
        names = np.asarray(names, dtype=object)
        return pd.DataFrame(
            {
                "nb": _nb(names),
                "kind": np.full(len(names), kind, dtype=np.int8),
                "node": names,
                "dst": np.full(len(names), "", dtype=object),
                "hop": np.asarray(hops_v, dtype=np.int64),
            }
        )

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "nb": pd.Series(dtype="int32"),
                "kind": pd.Series(dtype="int8"),
                "node": pd.Series(dtype=object),
                "dst": pd.Series(dtype=object),
                "hop": pd.Series(dtype="int64"),
            }
        )

    # edge stream bucketed ONCE by hash(walk source); undirected graphs
    # double the stream with the reversed orientation so both directions
    # co-locate with the frontier
    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].to_numpy(dtype=object)
        o = b[dst_col].to_numpy(dtype=object)
        if not directed:
            s, o = np.concatenate([s, o]), np.concatenate([o, s])
        out = pd.DataFrame(
            {
                "nb": _nb(s),
                "kind": np.ones(len(s), dtype=np.int8),
                "node": s,
                "dst": o,
                "hop": np.zeros(len(s), dtype=np.int64),
            }
        )
        return out.drop_duplicates(["node", "dst"])

    edges_b = edges.map_batches(edge_rows, batch_format="pandas").materialize()
    visited_ds = ray.data.from_pandas(
        _rows(list(visited), list(visited.values()), kind=0)
    ).materialize()
    frontier_ds = ray.data.from_pandas(
        _rows(frontier, [visited[f] for f in frontier], kind=2)
    ).materialize()

    def neighbors_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        fr = g.loc[g["kind"] == 2, "node"]
        e = g[g["kind"] == 1]
        if not len(fr) or not len(e):
            return _empty()
        hit = e.loc[e["node"].isin(set(fr)), "dst"].unique()
        return _rows(hit, np.zeros(len(hit)), kind=3)

    for h in range(start_hop, hops + 1):

        def anti_join(g: pd.DataFrame, h=h) -> pd.DataFrame:
            seen = set(g.loc[g["kind"] == 0, "node"])
            cand = g.loc[g["kind"] == 3, "node"].unique()
            new = np.array([c for c in cand if c not in seen], dtype=object)
            return _rows(new, np.full(len(new), h), kind=0)

        neigh = (
            frontier_ds.union(edges_b)
            .groupby("nb")
            .map_groups(neighbors_in_bucket, batch_format="pandas")
        )
        new_vis = (
            visited_ds.union(neigh)
            .groupby("nb")
            .map_groups(anti_join, batch_format="pandas")
            .materialize()
        )
        if new_vis.count() == 0:
            break
        visited_ds = visited_ds.union(new_vis).materialize()

        def as_frontier(b: pd.DataFrame) -> pd.DataFrame:
            out = b.copy()
            out["kind"] = np.full(len(b), 2, dtype=np.int8)
            return out

        frontier_ds = new_vis.map_batches(as_frontier, batch_format="pandas")

    out = visited_ds.to_pandas()
    return (
        pd.DataFrame({"name": out["node"].astype(object), "hop": out["hop"].astype("int64")})
        .sort_values(["hop", "name"], kind="mergesort")
        .reset_index(drop=True)
    )


def kcore(
    edges: ray.data.Dataset,
    k: int = 2,
    src_col: str = "a",
    dst_col: str = "b",
    driver_edge_max: int = 200_000,
    max_rounds: int | None = None,
) -> pd.DataFrame:
    """k-core decomposition membership: synchronized peeling — each round
    simultaneously removes every node whose degree in the surviving
    subgraph is < ``k`` — until a fixed point; returns the surviving
    (node, core_degree) rows.  The standard graph-cleanup primitive before
    community/centrality analytics (peels leaf chains and stragglers).

    Always runs to the fixed point (every non-final round removes at
    least one node, so the loop is bounded by the node count — no silent
    non-fixpoint supergraph, ADVICE r3); pass ``max_rounds`` to instead
    RAISE if convergence takes longer than expected.

    Scale shape (the pagerank/components ladder): the node vocabulary is
    collected once (bounded by edge-touched nodes), edges integer-encode
    once and re-stream per round; below ``driver_edge_max`` the peel loop
    is driver numpy, above it each round is one ``map_batches`` pass whose
    per-batch partial is a degree ``bincount`` over the broadcast alive
    mask — driver state stays one bool + one int vector per node.

    Synchronized peeling is order-independent, so the result is exactly
    the k-core (and the SQL oracle can unroll the same rounds verbatim).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from kgray.functions.broadcast import cached_get

    def vocab_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [
                t[src_col].combine_chunks().cast(pa.large_string()),
                t[dst_col].combine_chunks().cast(pa.large_string()),
            ]
        )
        return pa.table({"node": pc.unique(nodes)})

    vocab = edges.map_batches(vocab_partial, batch_format="pyarrow").to_pandas()
    if "node" not in vocab.columns or not len(vocab):
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "core_degree": pd.Series(dtype="int64")}
        )
    node_ids = np.unique(vocab["node"].to_numpy())  # sorted
    n = len(node_ids)
    idx_of = {v: i for i, v in enumerate(node_ids)}
    idx_ref = ray.put(idx_of)

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        idx = cached_get(idx_ref)
        si = b[src_col].map(idx).to_numpy(dtype=np.int64)
        di = b[dst_col].map(idx).to_numpy(dtype=np.int64)
        keep = si != di  # self-loops don't count toward core degree
        # canonicalize a<b and pre-dedup per batch; the bucket groupby
        # below finishes the GLOBAL dedup (an edge duplicated across
        # batches must not double-count toward core degree — both rungs
        # see the same deduped edge set)
        lo = np.minimum(si[keep], di[keep])
        hi = np.maximum(si[keep], di[keep])
        out = pd.DataFrame({"si": lo, "di": hi}).drop_duplicates()
        out["eb"] = ((out["si"] * 1315423911 + out["di"]) % 64).astype("int32")
        return out

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["si", "di"])[["si", "di"]]

    encoded = (
        edges.map_batches(encode, batch_format="pandas")
        .groupby("eb")
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()
    )
    alive = np.ones(n, dtype=bool)

    def dedup_driver(e: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        if not len(e) or "si" not in e.columns:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return e["si"].to_numpy(dtype=np.int64), e["di"].to_numpy(dtype=np.int64)

    if encoded.count() <= driver_edge_max:
        si, di = dedup_driver(encoded.to_pandas())
        deg = np.zeros(n, dtype=np.int64)
        rounds = 0
        while True:
            live = alive[si] & alive[di]
            deg = (
                np.bincount(si[live], minlength=n) + np.bincount(di[live], minlength=n)
            ).astype(np.int64)
            drop = alive & (deg < k)
            if not drop.any():
                break
            alive &= ~drop
            rounds += 1
            if max_rounds is not None and rounds >= max_rounds:
                raise RuntimeError(
                    f"kcore: no fixpoint within max_rounds={max_rounds}"
                )
    else:
        # distributed rounds: per-batch degree partials over the broadcast
        # alive mask (edges pre-canonicalized a<b per batch would not dedup
        # across batches, so the vocabulary-sized driver dedup degree uses
        # batch-distinct partials + a driver np.add over (node, count))
        rounds = 0
        while True:
            a_ref = ray.put(alive)

            def degp(b: pd.DataFrame, a_ref=a_ref) -> pd.DataFrame:
                av = cached_get(a_ref)
                si_, di_ = dedup_driver(b)
                live = av[si_] & av[di_]
                d = np.bincount(si_[live], minlength=len(av)) + np.bincount(
                    di_[live], minlength=len(av)
                )
                nz = np.nonzero(d)[0]
                return pd.DataFrame({"i": nz, "d": d[nz].astype(np.int64)})

            parts = encoded.map_batches(degp, batch_format="pandas").to_pandas()
            deg = np.zeros(n, dtype=np.int64)
            if len(parts):
                np.add.at(deg, parts["i"].to_numpy(), parts["d"].to_numpy())
            drop = alive & (deg < k)
            if not drop.any():
                break
            alive &= ~drop
            rounds += 1
            if max_rounds is not None and rounds >= max_rounds:
                raise RuntimeError(
                    f"kcore: no fixpoint within max_rounds={max_rounds}"
                )

    keep = alive & (deg >= k)
    return pd.DataFrame(
        {"node": node_ids[keep], "core_degree": deg[keep].astype(np.int64)}
    )


def adamic_adar(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    max_center_degree: int = 64,
    min_common: int = 1,
    num_buckets: int = 64,
    exclude_existing: bool = True,
) -> ray.data.Dataset:
    """Link-prediction candidate scoring: for every non-adjacent node pair
    sharing at least ``min_common`` neighbors, the common-neighbor count
    and the Adamic-Adar score sum(1/ln(deg(z))) over shared neighbors z.

    Scale shape — the quadratic part is fully distributed:
    - the undirected adjacency never exists in one place: both edge
      directions stream into hash(center) buckets (ONE shuffle), and each
      bucket dedupes its centers' neighbor lists vectorized, then emits
      wedge pairs per center via ``np.triu_indices`` — O(deg^2) work
      happens where the center's rows already live;
    - centers with more than ``max_center_degree`` neighbors are SKIPPED
      (the standard hub cut: a hub's 1/ln(deg) weight is negligible while
      its deg^2 wedge blowup is what kills all-pairs jobs; the SQL twin
      applies the identical cut so the result is still oracle-exact);
    - wedge partials pre-aggregate per (u, v) inside their bucket, then
      meet once more in hash(u,v) pair buckets (second shuffle) for the
      final sum — the driver never sees pairs;
    - ``exclude_existing`` drops pairs that are already edges (prediction
      targets must be NEW links).  The membership set is edge-universe-
      sized and broadcasts via ``ray.put`` — the same documented budget as
      ``connected_components``/``triangle_counts``; filtering happens on
      the AGGREGATED pair stream, not per wedge.

    Returns a Dataset (u, v, common_neighbors, adamic_adar) with u < v.
    """
    import ray

    from kgray.functions.broadcast import cached_get

    sep = "\x1f"

    if exclude_existing:
        raw = edges.select_columns([src_col, dst_col]).to_pandas()
        if src_col in raw.columns and len(raw):
            a = raw[src_col].astype(str)
            b = raw[dst_col].astype(str)
            lo = a.where(a <= b, b)
            hi = b.where(a <= b, a)
            edge_keys = set(lo + sep + hi)
        else:
            edge_keys = set()
        edge_ref = ray.put(edge_keys)
    else:
        edge_ref = None

    def und_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].astype(str).to_numpy(dtype=object)
        d = b[dst_col].astype(str).to_numpy(dtype=object)
        z = np.concatenate([s, d])
        nbr = np.concatenate([d, s])
        out = pd.DataFrame({"z": z, "nbr": nbr})
        out = out[out["z"] != out["nbr"]]
        out["bucket"] = (
            pd.util.hash_array(out["z"].to_numpy(dtype=object)) % num_buckets
        ).astype("int32")
        return out

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "u": pd.Series(dtype=object),
                "v": pd.Series(dtype=object),
                "common": pd.Series(dtype="int64"),
                "aa": pd.Series(dtype="float64"),
            }
        )
        if not len(g):
            return empty
        g = g[["z", "nbr"]].drop_duplicates()
        g = g.sort_values(["z", "nbr"], kind="mergesort")
        z = g["z"].to_numpy(dtype=object)
        nbr = g["nbr"].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]])
        ends = np.r_[starts[1:], len(z)]
        us: list = []
        vs: list = []
        ws: list = []
        for s, e in zip(starts, ends):
            d = e - s
            if d < 2 or d > max_center_degree:
                continue
            block = nbr[s:e]  # sorted unique neighbor list of this center
            iu, iv = np.triu_indices(d, k=1)
            us.append(block[iu])
            vs.append(block[iv])
            ws.append(np.full(len(iu), 1.0 / np.log(d)))
        if not us:
            return empty
        out = pd.DataFrame(
            {
                "u": np.concatenate(us),
                "v": np.concatenate(vs),
                "w": np.concatenate(ws),
            }
        )
        # pre-aggregate within the bucket: many centers here can share a pair
        out = (
            out.groupby(["u", "v"], sort=False)
            .agg(common=("w", "size"), aa=("w", "sum"))
            .reset_index()
        )
        out["common"] = out["common"].astype("int64")
        return out

    def add_pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            b = b.copy()
            b["pbucket"] = pd.Series(dtype="int32")
            return b
        key = (b["u"].astype(str) + sep + b["v"].astype(str)).to_numpy(dtype=object)
        b = b.copy()
        b["pbucket"] = (pd.util.hash_array(key) % num_buckets).astype("int32")
        return b

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["u", "v"], sort=False)
            .agg(common_neighbors=("common", "sum"), adamic_adar=("aa", "sum"))
            .reset_index()
        )
        out = out[out["common_neighbors"] >= min_common]
        if edge_ref is not None and len(out):
            keys = cached_get(edge_ref)
            pair = out["u"].astype(str) + sep + out["v"].astype(str)
            out = out[~pair.isin(keys)]
        out["common_neighbors"] = out["common_neighbors"].astype("int64")
        out["adamic_adar"] = out["adamic_adar"].astype(float).round(6)
        return out

    return (
        edges.map_batches(und_rows, batch_format="pandas")
        .groupby("bucket")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(add_pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(reduce_pairs, batch_format="pandas")
    )


def hits(
    edges: ray.data.Dataset,
    src_col: str = "subj_name",
    dst_col: str = "obj_name",
    weight_col: str | None = "n_obs",
    iterations: int = 10,
    driver_edge_max: int = 200_000,
) -> pd.DataFrame:
    """Weighted HITS: hub/authority scores (the principal singular pair of
    the weighted adjacency) — on the bipartite user↔event_type KG, hubs
    rank users by breadth of participation and authorities rank event
    types by who reaches them.  L2-normalized after each half-step; both
    engines run the identical (authority, normalize, hub, normalize)
    order so the SQL twin matches at 1e-6.

    Scale ladder mirrors :func:`pagerank`'s first two rungs: below
    ``driver_edge_max`` edges a driver numpy loop; above it the
    integer-encoded edge stream re-streams per half-step with sparse
    ``np.bincount`` partials and only the node-sized score vectors live
    on the driver (the same documented vocabulary budget).  Past the
    ~10^8-node ceiling the rank-as-bucketed-Dataset rung proven in
    :func:`_pagerank_bucketed` is the stated upgrade path (two
    co-locations per half-step plus a scalar norm reduce).
    """
    import numpy as np
    import pyarrow as pa

    from kgray.functions.broadcast import cached_get

    def vocab_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        pa.compute.unique(t[src_col].combine_chunks()).cast(pa.large_string()),
                        pa.compute.unique(t[dst_col].combine_chunks()).cast(pa.large_string()),
                    ]
                )
            }
        )

    vp = edges.map_batches(vocab_partial, batch_format="pyarrow").to_pandas()
    if "node" not in vp.columns or not len(vp):
        return pd.DataFrame(
            {
                "node": pd.Series(dtype=object),
                "hub": pd.Series(dtype="float64"),
                "authority": pd.Series(dtype="float64"),
            }
        )
    node_names = np.sort(vp["node"].unique().astype(object))
    n = len(node_names)
    idx_ref = ray.put({name: i for i, name in enumerate(node_names)})

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        idx = cached_get(idx_ref)
        return pd.DataFrame(
            {
                "si": b[src_col].map(idx).to_numpy(dtype=np.int64),
                "di": b[dst_col].map(idx).to_numpy(dtype=np.int64),
                "w": (
                    b[weight_col].to_numpy(dtype=np.float64)
                    if weight_col is not None
                    else np.ones(len(b))
                ),
            }
        )

    encoded = edges.map_batches(encode, batch_format="pandas").materialize()

    def _norm(v: np.ndarray) -> np.ndarray:
        z = np.sqrt((v * v).sum())
        return v / z if z > 0 else v

    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    if encoded.count() <= driver_edge_max:
        e = encoded.to_pandas()
        si = e["si"].to_numpy()
        di = e["di"].to_numpy()
        w = e["w"].to_numpy()
        for _ in range(iterations):
            a = _norm(np.bincount(di, weights=h[si] * w, minlength=n))
            h = _norm(np.bincount(si, weights=a[di] * w, minlength=n))
    else:
        def half_step(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
            v_ref = ray.put(vec)

            def contrib(b: pd.DataFrame, v_ref=v_ref) -> pd.DataFrame:
                vv = cached_get(v_ref)
                flow = vv[b[from_col].to_numpy()] * b["w"].to_numpy()
                dense = np.bincount(b[to_col].to_numpy(), weights=flow, minlength=n)
                nz = np.nonzero(dense)[0]
                return pd.DataFrame({"i": nz, "x": dense[nz]})

            parts = encoded.map_batches(contrib, batch_format="pandas").to_pandas()
            out = np.zeros(n)
            np.add.at(out, parts["i"].to_numpy(), parts["x"].to_numpy())
            return _norm(out)

        for _ in range(iterations):
            a = half_step(h, "si", "di")
            h = half_step(a, "di", "si")

    return pd.DataFrame(
        {
            "node": node_names,
            "hub": np.floor(h * 1e6 + 0.5) / 1e6,
            "authority": np.floor(a * 1e6 + 0.5) / 1e6,
        }
    )


def _assortativity_moments_bucketed(
    edges: ray.data.Dataset,
    degs_ds: ray.data.Dataset,
    *,
    src_col: str,
    dst_col: str,
    num_buckets: int,
) -> pd.DataFrame:
    """Edge-degree moment partials with the degree table NEVER on the
    driver: (degree rows ∪ edge rows) co-locate in hash(src) buckets to
    attach x = deg(src); the annotated edges re-key by dst and meet the
    degree rows again in hash(dst) buckets, where each bucket emits ONE
    int64 (n, sx, sy, sxx, syy, sxy) partial row."""
    B = num_buckets

    def _nb(names) -> np.ndarray:
        return (
            pd.util.hash_array(np.asarray(names, dtype=object)) % np.uint64(B)
        ).astype("int32")

    def deg_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bkt": _nb(b["name"]),
                "kind": np.zeros(len(b), dtype=np.int8),
                "name": b["name"].astype(object),
                "dst": np.full(len(b), "", dtype=object),
                "v": b["deg"].to_numpy(dtype=np.int64),
            }
        )

    deg_b = degs_ds.map_batches(deg_rows, batch_format="pandas").materialize()

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bkt": _nb(b[src_col]),
                "kind": np.ones(len(b), dtype=np.int8),
                "name": b[src_col].astype(object),
                "dst": b[dst_col].astype(object),
                "v": np.zeros(len(b), dtype=np.int64),
            }
        )

    def attach_x(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["kind"] == 0]
        e = g[g["kind"] == 1]
        if not len(e) or not len(d):
            return pd.DataFrame(
                {
                    "bkt": pd.Series(dtype="int32"),
                    "kind": pd.Series(dtype="int8"),
                    "name": pd.Series(dtype=object),
                    "dst": pd.Series(dtype=object),
                    "v": pd.Series(dtype="int64"),
                }
            )
        m = e.merge(d[["name", "v"]].rename(columns={"v": "x"}), on="name")
        return pd.DataFrame(
            {
                "bkt": _nb(m["dst"]),
                "kind": np.full(len(m), 2, dtype=np.int8),
                "name": m["dst"].astype(object),
                "dst": np.full(len(m), "", dtype=object),
                "v": m["x"].to_numpy(dtype=np.int64),
            }
        )

    annotated = (
        deg_b.union(edges.map_batches(edge_rows, batch_format="pandas"))
        .groupby("bkt")
        .map_groups(attach_x, batch_format="pandas")
    )

    def moments_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["kind"] == 0]
        e = g[g["kind"] == 2]
        if not len(e) or not len(d):
            return pd.DataFrame(
                {c: pd.Series(dtype="int64") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
            )
        m = e.merge(d[["name", "v"]].rename(columns={"v": "y"}), on="name")
        x = m["v"].to_numpy(dtype=np.int64)
        y = m["y"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "n": [np.int64(len(x))],
                "sx": [x.sum()],
                "sy": [y.sum()],
                "sxx": [(x * x).sum()],
                "syy": [(y * y).sum()],
                "sxy": [(x * y).sum()],
            }
        )

    return (
        deg_b.union(annotated)
        .groupby("bkt")
        .map_groups(moments_in_bucket, batch_format="pandas")
        .to_pandas()
    )


def degree_assortativity(
    edges: ray.data.Dataset,
    src_col: str = "subj_name",
    dst_col: str = "obj_name",
    driver_node_max: int = 10_000_000,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Degree assortativity of the KG: Pearson correlation between the
    TOTAL degrees at the two ends of every edge (negative = hubs link to
    leaves, the usual KG shape; positive = rich-club).

    Scale ladder: degrees come from per-batch (node, count) partials and
    one node-hash groupby.  Below ``driver_node_max`` nodes the combined
    degree table broadcasts and annotates the re-streamed edge batches,
    which emit int64-exact moment partials — the driver reduces a
    6-scalar row per block and does the one float division.  Past the
    ceiling (or with the knob forced to 0) the degree table NEVER
    reaches the driver: two reduce-side bucket joins annotate each edge
    with its endpoint degrees (hash(src) co-location attaches x, the
    re-keyed stream meets the degree rows again in hash(dst) buckets for
    y) and the moment partials reduce to the same 6 scalars — integer
    sums are order-independent, so the rungs agree exactly (pinned by a
    forced-knob parity test)."""
    from kgray.functions.broadcast import cached_get

    B = num_buckets

    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby(src_col, sort=False).size().reset_index(name="d")
        s.columns = ["name", "d"]
        o = b.groupby(dst_col, sort=False).size().reset_index(name="d")
        o.columns = ["name", "d"]
        out = pd.concat([s, o], ignore_index=True)
        out["bucket"] = (
            pd.util.hash_array(out["name"].to_numpy(dtype=object)) % np.uint64(B)
        ).astype("int32")
        out["d"] = out["d"].astype("int64")
        return out

    def deg_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("name", sort=False)["d"].sum().reset_index(name="deg")
        out["deg"] = out["deg"].astype("int64")
        return out[["name", "deg"]]

    degs_ds = (
        edges.map_batches(deg_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(deg_combine, batch_format="pandas")
        .materialize()  # one row per node, still distributed
    )
    empty = pd.DataFrame(
        {"n_edges": pd.Series(dtype="int64"), "assortativity": pd.Series(dtype="float64")}
    )
    n_nodes = degs_ds.count()
    if n_nodes == 0:
        return empty

    if driver_node_max <= 0 or n_nodes > driver_node_max:
        mo = _assortativity_moments_bucketed(
            edges, degs_ds, src_col=src_col, dst_col=dst_col, num_buckets=B
        )
    else:
        degs = degs_ds.to_pandas()
        if "name" not in degs.columns or not len(degs):
            return empty
        deg_ref = ray.put(dict(zip(degs["name"], degs["deg"].astype(np.int64))))

        def moment_partial(b: pd.DataFrame) -> pd.DataFrame:
            d = cached_get(deg_ref)
            x = b[src_col].map(d).to_numpy(dtype=np.int64)
            y = b[dst_col].map(d).to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "n": [np.int64(len(x))],
                    "sx": [x.sum()],
                    "sy": [y.sum()],
                    "sxx": [(x * x).sum()],
                    "syy": [(y * y).sum()],
                    "sxy": [(x * y).sum()],
                }
            )

        mo = edges.map_batches(
            moment_partial, batch_format="pandas", batch_size=262144
        ).to_pandas()
    n = int(mo["n"].sum())
    if n == 0:
        return empty
    sx, sy = int(mo["sx"].sum()), int(mo["sy"].sum())
    sxx, syy, sxy = int(mo["sxx"].sum()), int(mo["syy"].sum()), int(mo["sxy"].sum())
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    if den2 <= 0:
        return pd.DataFrame({"n_edges": [np.int64(n)], "assortativity": [0.0]})
    r = float(n * sxy - sx * sy) / np.sqrt(np.float64(den2))
    return pd.DataFrame(
        {"n_edges": [np.int64(n)], "assortativity": [np.floor(r * 1e6 + 0.5) / 1e6]}
    )


def predicate_cardinality(edges: ray.data.Dataset) -> pd.DataFrame:
    """Per-predicate cardinality profile of a canonical KG edge table:
    edge count, distinct subjects, distinct objects, and the mean objects
    per subject (micro-quantized integer division) — the ontology-QA
    readout that tells a schema designer which predicates are functional
    (≈1 object per subject) and which are set-valued.

    Edges are already distinct (subj, pred, obj) post-merge, so counts
    are exact.  Scale shape: ONE pred-key shuffle of the
    (pred, subj_id, obj_id) projection; per-group nunique — bounded by
    the (small) predicate vocabulary on the driver."""

    def per_pred(g: pd.DataFrame) -> pd.DataFrame:
        n = np.int64(len(g))
        ns = np.int64(g["subj_id"].nunique())
        no = np.int64(g["obj_id"].nunique())
        return pd.DataFrame(
            {
                "pred": [g["pred"].iloc[0]],
                "n_edges": [n],
                "n_subj": [ns],
                "n_obj": [no],
                "obj_per_subj": [(int(n) * 10**6 // int(ns)) / 1e6],
            }
        )

    out = (
        edges.select_columns(["pred", "subj_id", "obj_id"])
        .groupby("pred")
        .map_groups(per_pred, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame(
            {
                "pred": pd.Series(dtype=object),
                "n_edges": pd.Series(dtype="int64"),
                "n_subj": pd.Series(dtype="int64"),
                "n_obj": pd.Series(dtype="int64"),
                "obj_per_subj": pd.Series(dtype="float64"),
            }
        )
    return out.sort_values("pred", kind="mergesort").reset_index(drop=True)


def temporal_conflicts(edges: ray.data.Dataset) -> pd.DataFrame:
    """Temporal-consistency audit of a canonical KG: for every
    (subject, predicate) holding ≥2 distinct objects, count object pairs
    whose validity intervals overlap — the contradiction detector a
    temporal KG runs after ingest (two simultaneous CEOs, two concurrent
    employers).  An edge's interval is [min(t_start), max(t_end)] with a
    missing boundary OPEN (an atemporal fact conflicts with everything on
    the same slot, mirroring the snapshot semantics).

    Output per predicate: n_pairs (same-subject object pairs),
    n_conflicts (overlapping pairs), n_subj_conflict (subjects with ≥1).
    All counts exact int64; interval comparison is order-isomorphic
    between the engine's epoch floats and the twin's ISO date strings.

    Scale shape: per-batch vectorized interval extraction (flatten +
    reduceat, no per-row Python), then ONE pred-key shuffle; the
    within-subject pair blowup is bounded by objects-per-subject (the
    cardinality profile above is the guard to check first)."""

    def intervals(t: "pa.Table") -> "pa.Table":
        import numpy as np  # noqa: PLC0415 (worker-local)
        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.compute as pc  # noqa: PLC0415

        def bound(col, fn, empty_val):
            lens = pc.list_value_length(t[col]).to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(t[col]).to_numpy(zero_copy_only=False)
            out = np.full(len(lens), empty_val, dtype=np.float64)
            nz = lens > 0
            if nz.any():
                offs = np.zeros(len(lens), dtype=np.int64)
                offs[1:] = np.cumsum(lens)[:-1]
                red = fn.reduceat(flat, offs[nz])
                out[nz] = red
            return out

        ts = bound("t_start", np.minimum, -np.inf)
        te = bound("t_end", np.maximum, np.inf)
        return pa.table(
            {
                "pred": t["pred"],
                "subj_id": t["subj_id"],
                "obj_id": t["obj_id"],
                "ts": pa.array(ts, pa.float64()),
                "te": pa.array(te, pa.float64()),
            }
        )

    def per_pred(g: pd.DataFrame) -> pd.DataFrame:
        j = g.merge(g, on="subj_id", suffixes=("_a", "_b"))
        j = j[j["obj_id_a"] < j["obj_id_b"]]
        if not len(j):
            return pd.DataFrame(
                {
                    "pred": pd.Series(dtype=object),
                    "n_pairs": pd.Series(dtype="int64"),
                    "n_conflicts": pd.Series(dtype="int64"),
                    "n_subj_conflict": pd.Series(dtype="int64"),
                }
            )
        conflict = (j["ts_a"].to_numpy() <= j["te_b"].to_numpy()) & (
            j["ts_b"].to_numpy() <= j["te_a"].to_numpy()
        )
        subj_conf = j.loc[conflict, "subj_id"].nunique()
        return pd.DataFrame(
            {
                "pred": [g["pred"].iloc[0]],
                "n_pairs": [np.int64(len(j))],
                "n_conflicts": [np.int64(int(conflict.sum()))],
                "n_subj_conflict": [np.int64(subj_conf)],
            }
        )

    out = (
        edges.select_columns(["pred", "subj_id", "obj_id", "t_start", "t_end"])
        .map_batches(intervals, batch_format="pyarrow")
        .groupby("pred")
        .map_groups(per_pred, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame(
            {
                "pred": pd.Series(dtype=object),
                "n_pairs": pd.Series(dtype="int64"),
                "n_conflicts": pd.Series(dtype="int64"),
                "n_subj_conflict": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values("pred", kind="mergesort").reset_index(drop=True)


def predicate_cooccurrence(edges: ray.data.Dataset, n_buckets: int = 64) -> pd.DataFrame:
    """Predicate co-occurrence over subjects — the schema-discovery grid
    (which attributes appear on the same entities): for every unordered
    predicate pair, how many subjects hold BOTH, beside each predicate's
    own subject count.  The grid is COMPLETE (never-co-occurring pairs
    report 0).

    Scale shape: per-batch distinct (subj, pred) pre-shrink → ONE
    subject-hash bucket shuffle (each subject lives in one bucket, so
    bucket partials add exactly) → per-bucket preds² pair partials;
    driver fold bounded by buckets × predicates²."""
    from kgray.ops.dedup import _md5_u64_np

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["subj_id", "pred"]].drop_duplicates()
        out = out.assign(
            bucket=(
                _md5_u64_np([str(x) for x in out["subj_id"]]) % np.uint64(n_buckets)
            ).astype("int32")
        )
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["subj_id", "pred"])
        frames = [
            g.groupby("pred", sort=False)
            .size()
            .reset_index(name="cnt")
            .rename(columns={"pred": "pa"})
            .assign(pb="")
        ]
        j = g.merge(g, on="subj_id", suffixes=("_a", "_b"))
        j = j[j["pred_a"] < j["pred_b"]]
        if len(j):
            co = j.groupby(["pred_a", "pred_b"], sort=False).size().reset_index(name="cnt")
            co.columns = ["pa", "pb", "cnt"]
            frames.append(co)
        return pd.concat(frames, ignore_index=True)[["pa", "pb", "cnt"]]

    parts = (
        edges.select_columns(["subj_id", "pred"])
        .map_batches(pair_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "pred_a": pd.Series(dtype=object),
            "pred_b": pd.Series(dtype=object),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "n_both": pd.Series(dtype="int64"),
        }
    )
    if not len(parts):
        return empty
    agg = parts.groupby(["pa", "pb"], sort=True)["cnt"].sum()
    singles = {k[0]: int(v) for k, v in agg.items() if k[1] == ""}
    both = {(k[0], k[1]): int(v) for k, v in agg.items() if k[1] != ""}
    preds = sorted(singles)
    rows = [
        (a, b, singles[a], singles[b], both.get((a, b), 0))
        for i, a in enumerate(preds)
        for b in preds[i + 1 :]
    ]
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["pred_a", "pred_b", "n_a", "n_b", "n_both"])


def _md5_u64(strings) -> np.ndarray:
    """uint64 string hash equal to DuckDB's ``md5_number_lower(s)`` — the
    ONE md5-lower-64 kernel, delegated to kgray.ops.dedup._md5_u64_np so
    the graph and dedup families can never drift apart (the module
    already imports from dedup in predicate_cooccurrence)."""
    from kgray.ops.dedup import _md5_u64_np

    return _md5_u64_np(strings)


def random_walk_visits(
    edges: ray.data.Dataset,
    src_col: str = "subj_name",
    dst_col: str = "obj_name",
    n_steps: int = 3,
    driver_edge_max: int = 200_000,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Deterministic hash-seeded random walks — the graph-ML sampling
    primitive (DeepWalk/node2vec neighborhoods, GraphSAGE fan-out) made
    SQL-reproducible: one walk starts at EVERY node of the undirected
    distinct-edge graph and advances ``n_steps`` steps, where the step
    from node ``v`` at time ``t`` goes to sorted-neighbor index
    ``md5_u64(v + '|' + t) % deg(v)`` (DuckDB ``md5_number_lower``
    semantics, so the oracle replays the exact walks).  Returns per-node
    visit counts over steps 1..n_steps summed across all walks — the
    visit distribution a sampling-based embedding trainer would see.

    The choice depends only on ``(v, t)``, so colliding walkers follow
    the same continuation: walker state collapses to a (node → walker
    count) frontier, which is what makes the op scale — the frontier is
    vocabulary-bounded regardless of walk count.

    Rungs (the pagerank ladder):
    - driver (default, distinct edge set ≤ ``driver_edge_max`` — the
      documented connected_components budget): CSR + ``np.add.at``
      weight propagation, one vectorized pass per step;
    - bucketed (knob forced to 0 or exceeded): ranked adjacency built in
      hash(node) buckets ONCE (one shuffle), then each step co-locates
      the (node, walkers) frontier with its adjacency bucket and emits
      the chosen neighbors — ``n_steps`` + 2 bucket shuffles total, no
      node- or edge-sized driver state (parity pinned in tests).
    """
    und_cols = edges.select_columns([src_col, dst_col])
    n_edges = und_cols.count()
    if n_edges == 0:
        return pd.DataFrame(
            {"name": pd.Series(dtype=object), "visits": pd.Series(dtype="int64")}
        )
    if driver_edge_max > 0 and n_edges <= driver_edge_max:
        raw = und_cols.to_pandas()
        s = raw[src_col].astype(str).to_numpy(dtype=object)
        d = raw[dst_col].astype(str).to_numpy(dtype=object)
        z = np.concatenate([s, d])
        nbr = np.concatenate([d, s])
        keep = z != nbr
        pairs = pd.DataFrame({"z": z[keep], "nbr": nbr[keep]}).drop_duplicates()
        if not len(pairs):
            return pd.DataFrame(
                {"name": pd.Series(dtype=object), "visits": pd.Series(dtype="int64")}
            )
        pairs = pairs.sort_values(["z", "nbr"], kind="mergesort")
        zv = pairs["z"].to_numpy(dtype=object)
        nv = pairs["nbr"].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, zv[1:] != zv[:-1]])
        nodes = zv[starts]
        deg = np.diff(np.r_[starts, len(zv)])
        # map neighbor surface -> node index for the hop (every neighbor
        # IS a node: the graph is built from both edge orientations)
        order = np.argsort(nodes, kind="mergesort")
        nbr_idx = order[np.searchsorted(nodes[order], nv)]
        w = np.ones(len(nodes), dtype=np.int64)
        visits = np.zeros(len(nodes), dtype=np.int64)
        for t in range(n_steps):
            r = (_md5_u64([f"{v}|{t}" for v in nodes]) % deg.astype(np.uint64)).astype(
                np.int64
            )
            nxt = nbr_idx[starts + r]
            new_w = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(new_w, nxt, w)
            visits += new_w
            w = new_w
        keep_v = visits > 0
        return (
            pd.DataFrame({"name": nodes[keep_v], "visits": visits[keep_v]})
            .sort_values("name", kind="mergesort")
            .reset_index(drop=True)
        )

    # ---- bucketed rung: no node- or edge-sized driver state ----
    def _nb(names) -> np.ndarray:
        return (
            pd.util.hash_array(np.asarray(names, dtype=object)) % np.uint64(num_buckets)
        ).astype("int32")

    def und_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = b[src_col].astype(str).to_numpy(dtype=object)
        d = b[dst_col].astype(str).to_numpy(dtype=object)
        z = np.concatenate([s, d])
        nbr = np.concatenate([d, s])
        out = pd.DataFrame({"z": z, "nbr": nbr})
        out = out[out["z"] != out["nbr"]].drop_duplicates()
        out["nb"] = _nb(out["z"].to_numpy(dtype=object))
        return out

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["z", "nbr"]].drop_duplicates().sort_values(["z", "nbr"], kind="mergesort")
        g["rnk"] = g.groupby("z", sort=False).cumcount().astype("int64")
        g["dg"] = g.groupby("z", sort=False)["nbr"].transform("size").astype("int64")
        g["nb"] = _nb(g["z"].to_numpy(dtype=object))
        return g

    adj = (
        edges.map_batches(und_rows, batch_format="pandas")
        .groupby("nb")
        .map_groups(rank_bucket, batch_format="pandas")
        .materialize()
    )

    def start_rows(b: pd.DataFrame) -> pd.DataFrame:
        # rnk==0 row exists for every node (deg >= 1 by construction)
        f = b[b["rnk"] == 0]
        return pd.DataFrame(
            {
                "node": f["z"].to_numpy(dtype=object),
                "w": np.ones(len(f), dtype=np.int64),
                "nb": f["nb"].to_numpy(),
            }
        )

    frontier = adj.map_batches(start_rows, batch_format="pandas").materialize()
    step_outputs = []
    for t in range(n_steps):

        def advance(g: pd.DataFrame, t=t) -> pd.DataFrame:
            e = g[g["kind"] == 1]
            f = g[g["kind"] == 2]
            if not len(f) or not len(e):
                return pd.DataFrame(
                    {"node": pd.Series(dtype=object), "w": pd.Series(dtype="int64")}
                )
            f = f.groupby("node", sort=False, as_index=False)["w"].sum()
            dg = e.drop_duplicates("z").set_index("z")["dg"]
            d = f["node"].map(dg)
            ok = d.notna()
            f = f[ok]
            r = (
                _md5_u64([f"{v}|{t}" for v in f["node"]])
                % d[ok].to_numpy(dtype=np.uint64)
            ).astype("int64")
            key = pd.MultiIndex.from_arrays([f["node"], r])
            nxt = e.set_index(["z", "rnk"])["nbr"].reindex(key)
            return pd.DataFrame(
                {"node": nxt.to_numpy(dtype=object), "w": f["w"].to_numpy()}
            )

        def tag_adj(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["kind"] = np.int8(1)
            b["node"] = b["z"]
            b["w"] = np.int64(0)
            return b[["nb", "kind", "node", "w", "z", "nbr", "rnk", "dg"]]

        def tag_frontier(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["kind"] = np.int8(2)
            b["z"] = ""
            b["nbr"] = ""
            b["rnk"] = np.int64(0)
            b["dg"] = np.int64(0)
            return b[["nb", "kind", "node", "w", "z", "nbr", "rnk", "dg"]]

        stepped = (
            adj.map_batches(tag_adj, batch_format="pandas")
            .union(frontier.map_batches(tag_frontier, batch_format="pandas"))
            .groupby("nb")
            .map_groups(advance, batch_format="pandas")
        )

        def rebucket(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["nb"] = _nb(b["node"].to_numpy(dtype=object)) if len(b) else pd.Series(
                dtype="int32"
            )
            return b

        frontier = stepped.map_batches(rebucket, batch_format="pandas").materialize()
        step_outputs.append(frontier)

    def reduce_visits(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False, as_index=False)["w"].sum()
        return pd.DataFrame(
            {"name": out["node"].to_numpy(dtype=object), "visits": out["w"].astype("int64")}
        )

    allv = step_outputs[0]
    for ds in step_outputs[1:]:
        allv = allv.union(ds)
    out = (
        allv.groupby("nb")
        .map_groups(reduce_visits, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("name", kind="mergesort").reset_index(drop=True)


def link_prediction_recall(
    edges: ray.data.Dataset,
    src_col: str = "subj_name",
    dst_col: str = "obj_name",
    holdout_mod: int = 5,
    ks: tuple[int, ...] = (10, 50, 100),
    max_center_degree: int = 64,
) -> pd.DataFrame:
    """KG-completion evaluation (the standard link-prediction benchmark
    protocol, FB15k-style, made deterministic): hold out every distinct
    edge whose ``md5_u64(src + '|' + dst) % holdout_mod == 0``, score all
    non-adjacent pairs of the REMAINING graph with :func:`adamic_adar`
    (identical hub cut), rank by (score desc, u, v), and report
    recall@k — the fraction of held-out edges recovered in the top-k
    candidates — for each ``k``.

    Candidates are restricted to BIPARTITE pairs — one endpoint from the
    training graph's src-role node set, one from its dst-role set — i.e.
    pairs with the same shape as real edges.  Without this the ranking is
    dominated by same-side affinity pairs (two users sharing event types)
    that can never be edges, and recall is structurally zero.

    Scale shape: the scoring reuses adamic_adar's distributed wedge
    pipeline; the top-``max(ks)`` selection is a per-block partial
    (each block ships at most max(ks) rows, with the role filter applied
    before the cut) + driver merge, and the holdout set is
    1/``holdout_mod`` of the edge universe — the same documented driver
    budget as adamic_adar's ``exclude_existing`` membership set (the role
    sets are node-vocabulary-sized, strictly smaller).  ``recall`` is
    integer micro-division (``hits * 1e6 // n_holdout / 1e6``) so the SQL
    twin is value-exact.
    """
    kmax = max(ks)
    sep = "|"

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        # the holdout universe is UNORDERED pairs (an edge present in both
        # orientations is one retrieval target): hash the (lo, hi) form
        s = b[src_col].astype(str)
        d = b[dst_col].astype(str)
        lo = s.where(s <= d, d)
        hi = d.where(s <= d, s)
        h = _md5_u64((lo + sep + hi).to_numpy(dtype=object)) % np.uint64(holdout_mod)
        b = b.copy()
        b["_holdout"] = h == 0
        return b

    tagged = edges.map_batches(tag, batch_format="pandas").materialize()
    train = tagged.map_batches(
        lambda b: b[~b["_holdout"]].drop(columns=["_holdout"]), batch_format="pandas"
    )

    hold = tagged.map_batches(
        lambda b: b.loc[b["_holdout"], [src_col, dst_col]], batch_format="pandas"
    ).to_pandas()
    if len(hold):
        a = hold[src_col].astype(str)
        b_ = hold[dst_col].astype(str)
        lo = a.where(a <= b_, b_)
        hi = b_.where(a <= b_, a)
        holdout_keys = set(lo + "\x1f" + hi)
    else:
        holdout_keys = set()
    n_holdout = len(holdout_keys)

    def role_partial(b: pd.DataFrame) -> pd.DataFrame:
        # build the arrays once and size the roles off THOSE arrays —
        # astype(str).unique() and nunique() disagree on nulls
        s = b[src_col].astype(str).unique()
        d = b[dst_col].astype(str).unique()
        return pd.DataFrame(
            {
                "node": np.concatenate([s, d]),
                "role": np.concatenate(
                    [np.zeros(len(s), dtype=np.int8), np.ones(len(d), dtype=np.int8)]
                ),
            }
        ).drop_duplicates()

    roles = train.map_batches(
        role_partial, batch_format="pandas"
    ).to_pandas().drop_duplicates()
    src_set = set(roles.loc[roles["role"] == 0, "node"])
    dst_set = set(roles.loc[roles["role"] == 1, "node"])
    roles_ref = ray.put((src_set, dst_set))

    cand = adamic_adar(
        train,
        src_col=src_col,
        dst_col=dst_col,
        max_center_degree=max_center_degree,
    )

    def topk_partial(b: pd.DataFrame) -> pd.DataFrame:
        from kgray.functions.broadcast import cached_get

        if not len(b):
            return b
        ss, ds_ = cached_get(roles_ref)
        u = b["u"].astype(str)
        v = b["v"].astype(str)
        bip = (u.isin(ss) & v.isin(ds_)) | (u.isin(ds_) & v.isin(ss))
        b = b[bip]
        return b.sort_values(
            ["adamic_adar", "u", "v"], ascending=[False, True, True], kind="mergesort"
        ).head(kmax)

    parts = cand.map_batches(topk_partial, batch_format="pandas").to_pandas()
    if len(parts):
        top = parts.sort_values(
            ["adamic_adar", "u", "v"], ascending=[False, True, True], kind="mergesort"
        ).head(kmax)
        keys = (top["u"].astype(str) + "\x1f" + top["v"].astype(str)).to_numpy(
            dtype=object
        )
        is_hit = np.fromiter((k in holdout_keys for k in keys), dtype=bool, count=len(keys))
        cum_hits = np.cumsum(is_hit)
    else:
        cum_hits = np.zeros(0, dtype=np.int64)

    rows = []
    for k in ks:
        hits = int(cum_hits[min(k, len(cum_hits)) - 1]) if len(cum_hits) else 0
        recall = (hits * 1_000_000 // n_holdout) / 1e6 if n_holdout else 0.0
        rows.append(
            {"k": np.int64(k), "n_holdout": np.int64(n_holdout),
             "n_hits": np.int64(hits), "recall": float(recall)}
        )
    return pd.DataFrame(rows)


def _entity_obs_explode(t: "pa.Table", num_buckets: int) -> "pa.Table":
    """Shared temporal-KG explode kernel: both endpoints x each edge's
    ``t_obs`` entries, batch-distinct per (name, label, t), bucketed by
    entity-name hash — the partial entity_lifespan and
    entity_activity_decay both shuffle."""
    obs = t["t_obs"]
    if isinstance(obs, pa.ChunkedArray):
        obs = obs.combine_chunks()
    lens = np.diff(obs.offsets.to_numpy())
    flat = obs.flatten().to_numpy(zero_copy_only=False)
    rows = []
    for side in ("subj", "obj"):
        names = t[f"{side}_name"].to_numpy(zero_copy_only=False)
        labels = t[f"{side}_label"].to_numpy(zero_copy_only=False)
        rows.append(
            pa.table(
                {
                    "name": pa.array(np.repeat(names, lens), pa.large_string()),
                    "label": pa.array(np.repeat(labels, lens), pa.large_string()),
                    "t": pa.array(flat, pa.float64()),
                }
            )
        )
    out = pa.concat_tables(rows).group_by(["name", "label", "t"]).aggregate([])
    b = pd.util.hash_array(
        np.asarray(out["name"].to_pandas(), dtype=object)
    ) % num_buckets
    return out.append_column("bucket", pa.array(b.astype(np.int32)))


def entity_lifespan(
    edges: ray.data.Dataset,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Temporal-KG QA: per canonical entity, the observation lifespan —
    first/last observation timestamp across ALL incident edges' ``t_obs``
    lists (both endpoints of an edge are observed at each of its
    observation dates), the span in whole days, and the count of distinct
    observation timestamps.  The readout an evolving-KG operator checks
    for stale entities (old last_obs) and one-shot mentions (n_dates 1).

    Scale shape: per-batch explode of both endpoints × ``t_obs`` →
    batch-distinct (name, label, t) Arrow partials → ONE entity-hash
    bucket shuffle → per-bucket dedup + min/max/count.  Driver receives
    the per-entity result only (vocabulary-sized — it IS the return
    value)."""

    def partial(t: pa.Table) -> pa.Table:
        return _entity_obs_explode(t, num_buckets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["name", "label", "t"])
        agg = g.groupby(["name", "label"], sort=False).agg(
            first_obs=("t", "min"), last_obs=("t", "max"), n_dates=("t", "size")
        )
        # floor division, matching the twin's (max - min) // 86400 exactly
        # (np.round would diverge on non-day-aligned timestamps)
        agg["span_days"] = (
            ((agg["last_obs"] - agg["first_obs"]) // 86400.0).astype("int64")
        )
        agg["n_dates"] = agg["n_dates"].astype("int64")
        return agg.reset_index()[
            ["name", "label", "first_obs", "last_obs", "span_days", "n_dates"]
        ]

    out = (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(out) or "name" not in out.columns:
        return pd.DataFrame(
            {
                "name": pd.Series(dtype=object),
                "label": pd.Series(dtype=object),
                "first_obs": pd.Series(dtype="float64"),
                "last_obs": pd.Series(dtype="float64"),
                "span_days": pd.Series(dtype="int64"),
                "n_dates": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values(["name", "label"], kind="mergesort").reset_index(drop=True)


def meta_path_census(edges: ray.data.Dataset, n_buckets: int = 64) -> pd.DataFrame:
    """Directed 2-path census grouped by predicate pair — the meta-path
    profile of the KG schema (how often does an ``acquired`` edge feed a
    ``works_at`` edge, etc.).  A 2-path is an ordered edge pair
    (a -p1-> m, m -p2-> b); backtracking (b == a) counts, matching the
    plain SQL self-join semantics.

    Scale shape: the path count through a middle node m for (p1, p2) is
    in_deg(m, p1) * out_deg(m, p2), so NO edge-by-edge join ever runs —
    per-batch (node, pred, side) count partials shrink first, ONE
    node-hash bucket shuffle co-locates each middle node, each bucket
    multiplies its in x out pred counts per node, and the driver folds
    bucket partials bounded by buckets x preds².  Works on any edge
    distribution: hubs cost O(preds) per node, never O(deg²).
    """

    def io_partial(b: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for node_col, side in (("obj_id", "i"), ("subj_id", "o")):
            g = (
                b.groupby([node_col, "pred"], sort=False)
                .size()
                .reset_index(name="cnt")
                .rename(columns={node_col: "node"})
            )
            g["side"] = side
            frames.append(g)
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (
            _md5_u64([str(x) for x in out["node"]]) % np.uint64(n_buckets)
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby(["node", "pred", "side"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        ins = g[g["side"] == "i"][["node", "pred", "cnt"]]
        outs = g[g["side"] == "o"][["node", "pred", "cnt"]]
        j = ins.merge(outs, on="node", suffixes=("_a", "_b"))
        if not len(j):
            return pd.DataFrame(
                {
                    "pred_a": pd.Series(dtype=object),
                    "pred_b": pd.Series(dtype=object),
                    "n_paths": pd.Series(dtype="int64"),
                }
            )
        j["n_paths"] = j["cnt_a"].to_numpy("int64") * j["cnt_b"].to_numpy("int64")
        return (
            j.groupby(["pred_a", "pred_b"], sort=False)["n_paths"]
            .sum()
            .reset_index()
        )

    parts = (
        edges.select_columns(["subj_id", "pred", "obj_id"])
        .map_batches(io_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "pred_a": pd.Series(dtype=object),
                "pred_b": pd.Series(dtype=object),
                "n_paths": pd.Series(dtype="int64"),
            }
        )
    out = (
        parts.groupby(["pred_a", "pred_b"], sort=True)["n_paths"]
        .sum()
        .astype("int64")
        .reset_index()
    )
    return out.reset_index(drop=True)


def neighbor_jaccard(
    edges: ray.data.Dataset,
    max_center_degree: int = 64,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Neighbor-set Jaccard similarity for canonical entity pairs that
    share at least one (non-hub) neighbor: |N(u) ∩ N(v)| over
    |N(u) ∪ N(v)| on the UNDIRECTED distinct-neighbor sets.

    Same wedge discipline as ``adamic_adar``: shared neighbors are found
    per CENTER in hash(center) buckets (one shuffle), centers with more
    than ``max_center_degree`` neighbors are skipped (the standard hub
    cut, applied identically in the SQL twin so the result stays
    oracle-exact — a hub contributes deg² wedges but near-zero
    similarity signal), pair partials meet once in hash(u, v) buckets
    (second shuffle).  Full degrees (hub edges included) come from the
    same first shuffle: each bucket owns its centers outright, so
    (node, degree) is exact there and rides along as a third frame.
    Jaccard is micro-quantized to 1e-6 by integer floor division so the
    DuckDB twin is bit-exact.

    Returns (u, v, common, deg_u, deg_v, jaccard) with u < v, driver
    frame bounded by the surviving pair set (the same budget as the
    Adamic-Adar candidate output).
    """
    sep = "\x1f"

    def und_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = b["subj_id"].astype(str).to_numpy(dtype=object)
        d = b["obj_id"].astype(str).to_numpy(dtype=object)
        out = pd.DataFrame(
            {"z": np.concatenate([s, d]), "nbr": np.concatenate([d, s])}
        )
        out = out[out["z"] != out["nbr"]].drop_duplicates()
        out["bucket"] = (
            _md5_u64([str(x) for x in out["z"]]) % np.uint64(n_buckets)
        ).astype("int32")
        return out

    def wedges_and_degrees(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "u": pd.Series(dtype=object),
                "v": pd.Series(dtype=object),
                "common": pd.Series(dtype="int64"),
                "deg_node": pd.Series(dtype=object),
                "deg": pd.Series(dtype="int64"),
            }
        )
        if not len(g):
            return empty
        g = g[["z", "nbr"]].drop_duplicates().sort_values(["z", "nbr"], kind="mergesort")
        z = g["z"].to_numpy(dtype=object)
        nbr = g["nbr"].to_numpy(dtype=object)
        starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]])
        ends = np.r_[starts[1:], len(z)]
        degs = pd.DataFrame(
            {
                "u": "",
                "v": "",
                "common": np.zeros(len(starts), dtype="int64"),
                "deg_node": z[starts],
                "deg": (ends - starts).astype("int64"),
            }
        )
        us: list = []
        vs: list = []
        for s, e in zip(starts, ends):
            d = e - s
            if d < 2 or d > max_center_degree:
                continue
            block = nbr[s:e]
            iu, iv = np.triu_indices(d, k=1)
            us.append(block[iu])
            vs.append(block[iv])
        if not us:
            return degs
        pairs = pd.DataFrame({"u": np.concatenate(us), "v": np.concatenate(vs)})
        pairs = pairs.groupby(["u", "v"], sort=False).size().reset_index(name="common")
        pairs["common"] = pairs["common"].astype("int64")
        pairs["deg_node"] = ""
        pairs["deg"] = np.int64(0)
        return pd.concat([pairs, degs], ignore_index=True)

    def pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if not len(b):
            b["pbucket"] = pd.Series(dtype="int32")
            return b
        # degree rows shuffle by their node, pair rows by the pair key, so
        # each reduce bucket owns complete pairs AND complete degree rows
        key = np.where(
            b["deg_node"].astype(str) != "",
            b["deg_node"].astype(str),
            b["u"].astype(str) + sep + b["v"].astype(str),
        )
        b["pbucket"] = (_md5_u64(list(key)) % np.uint64(n_buckets)).astype("int32")
        return b

    parts = (
        edges.select_columns(["subj_id", "obj_id"])
        .map_batches(und_rows, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(wedges_and_degrees, batch_format="pandas")
        .map_batches(pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(
            lambda g: g.groupby(["u", "v", "deg_node"], sort=False)
            .agg(common=("common", "sum"), deg=("deg", "sum"))
            .reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    cols = ["u", "v", "common", "deg_u", "deg_v", "jaccard"]
    if not len(parts):
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    deg = parts[parts["deg_node"] != ""].set_index("deg_node")["deg"]
    pairs = parts[parts["deg_node"] == ""][["u", "v", "common"]].copy()
    if not len(pairs):
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
    pairs["deg_u"] = pairs["u"].map(deg).astype("int64")
    pairs["deg_v"] = pairs["v"].map(deg).astype("int64")
    union = pairs["deg_u"] + pairs["deg_v"] - pairs["common"]
    pairs["jaccard"] = (
        (pairs["common"] * 1_000_000 // union).astype("int64").astype("float64") / 1e6
    )
    pairs["common"] = pairs["common"].astype("int64")
    return (
        pairs.sort_values(["u", "v"], kind="mergesort").reset_index(drop=True)[cols]
    )


def degree_spectrum(edges: ray.data.Dataset, n_buckets: int = 64) -> pd.DataFrame:
    """Undirected distinct-neighbor degree spectrum split by canonical
    label: one row per (label, degree) with the node count — the
    shape-of-the-graph readout (stars vs chains vs cliques per entity
    type).

    Scale shape: per-batch distinct (node, label, nbr) pre-shrink → ONE
    node-hash shuffle (a node's neighbor rows all land in its bucket, so
    the per-bucket distinct count is the true degree) → (label, degree)
    partials; driver fold bounded by buckets x labels x distinct degrees.
    """

    def und_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "node": np.concatenate(
                    [
                        b["subj_id"].astype(str).to_numpy(dtype=object),
                        b["obj_id"].astype(str).to_numpy(dtype=object),
                    ]
                ),
                "label": np.concatenate(
                    [
                        b["subj_label"].astype(str).to_numpy(dtype=object),
                        b["obj_label"].astype(str).to_numpy(dtype=object),
                    ]
                ),
                "nbr": np.concatenate(
                    [
                        b["obj_id"].astype(str).to_numpy(dtype=object),
                        b["subj_id"].astype(str).to_numpy(dtype=object),
                    ]
                ),
            }
        )
        out = out[out["node"] != out["nbr"]].drop_duplicates()
        out["bucket"] = (
            _md5_u64([str(x) for x in out["node"]]) % np.uint64(n_buckets)
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["node", "label", "nbr"]].drop_duplicates()
        d = (
            g.groupby(["node", "label"], sort=False)
            .size()
            .reset_index(name="degree")
        )
        out = (
            d.groupby(["label", "degree"], sort=False)
            .size()
            .reset_index(name="n_nodes")
        )
        return out

    parts = (
        edges.select_columns(["subj_id", "subj_label", "obj_id", "obj_label"])
        .map_batches(und_rows, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "label": pd.Series(dtype=object),
                "degree": pd.Series(dtype="int64"),
                "n_nodes": pd.Series(dtype="int64"),
            }
        )
    out = (
        parts.groupby(["label", "degree"], sort=True)["n_nodes"]
        .sum()
        .astype("int64")
        .reset_index()
    )
    out["degree"] = out["degree"].astype("int64")
    return out.reset_index(drop=True)


def label_pair_census(edges: ray.data.Dataset) -> pd.DataFrame:
    """Ontology signature of the canonical KG: one row per
    (subj_label, pred, obj_label) with the distinct-edge count and the
    total observation mass — the induced schema with usage weights.

    Scale shape: purely additive partials (per-batch groupby over the
    distinct edge stream), label x pred fold on the driver — no shuffle
    at all; the output is schema-sized, never data-sized."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (
            b.groupby(["subj_label", "pred", "obj_label"], sort=False)
            .agg(n_edges=("n_obs", "size"), total_obs=("n_obs", "sum"))
            .reset_index()
        )
        return g

    parts = (
        edges.select_columns(["subj_label", "pred", "obj_label", "n_obs"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    cols = ["subj_label", "pred", "obj_label", "n_edges", "total_obs"]
    if not len(parts):
        return pd.DataFrame(
            {
                "subj_label": pd.Series(dtype=object),
                "pred": pd.Series(dtype=object),
                "obj_label": pd.Series(dtype=object),
                "n_edges": pd.Series(dtype="int64"),
                "total_obs": pd.Series(dtype="int64"),
            }
        )
    out = (
        parts.groupby(["subj_label", "pred", "obj_label"], sort=True)
        .sum()
        .reset_index()
    )
    out["n_edges"] = out["n_edges"].astype("int64")
    out["total_obs"] = out["total_obs"].astype("int64")
    return out[cols]


def reciprocity(edges: ray.data.Dataset, n_buckets: int = 64) -> pd.DataFrame:
    """Same-predicate reciprocity per predicate: of the distinct directed
    edges (u, p, v) with u != v, how many have the reverse (v, p, u) —
    plus the micro-quantized ratio.  Asymmetric ontologies (employment)
    read 0; genuinely mutual relations (partnerships) read high.

    Scale shape: distinct-edge batch partials → ONE unordered-pair-hash
    shuffle (both directions of a pair land together) → per-bucket
    direction matching; driver fold is preds-sized."""

    def pair_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["subj_id", "pred", "obj_id"]].drop_duplicates()
        out = out[out["subj_id"] != out["obj_id"]]
        u = out["subj_id"].astype(str).to_numpy(dtype=object)
        v = out["obj_id"].astype(str).to_numpy(dtype=object)
        lo = np.where(u <= v, u, v)
        hi = np.where(u <= v, v, u)
        key = [a + "\x1f" + b_ + "\x1f" + p for a, b_, p in zip(lo, hi, out["pred"])]
        out = out.assign(
            bucket=(_md5_u64(key) % np.uint64(n_buckets)).astype("int32")
        )
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["subj_id", "pred", "obj_id"]].drop_duplicates()
        rev = g.rename(columns={"subj_id": "obj_id", "obj_id": "subj_id"})
        m = g.merge(rev, on=["subj_id", "pred", "obj_id"], how="left", indicator=True)
        out = pd.DataFrame(
            {
                "pred": m["pred"],
                "n": np.int64(1),
                "n_recip": (m["_merge"] == "both").astype("int64"),
            }
        )
        return out.groupby("pred", sort=False).sum().reset_index()

    parts = (
        edges.select_columns(["subj_id", "pred", "obj_id"])
        .map_batches(pair_rows, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "pred": pd.Series(dtype=object),
                "n_edges": pd.Series(dtype="int64"),
                "n_reciprocal": pd.Series(dtype="int64"),
                "reciprocity": pd.Series(dtype="float64"),
            }
        )
    out = parts.groupby("pred", sort=True).sum().reset_index()
    out.columns = ["pred", "n_edges", "n_reciprocal"]
    out["n_edges"] = out["n_edges"].astype("int64")
    out["n_reciprocal"] = out["n_reciprocal"].astype("int64")
    out["reciprocity"] = (
        (out["n_reciprocal"] * 1_000_000 // out["n_edges"]).astype("int64").astype("float64")
        / 1e6
    )
    return out


def nobs_spectrum(edges: ray.data.Dataset) -> pd.DataFrame:
    """Per-predicate observation-count histogram over the canonical edge
    table: one row per (pred, n_obs) with the edge count — the
    evidence-mass profile (how much of the KG rests on single
    observations vs repeatedly-confirmed facts).

    Scale shape: additive (pred, n_obs) batch partials, no shuffle;
    output bounded by preds x distinct observation counts."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["pred", "n_obs"], sort=False).size().reset_index(name="n_edges")
        return g

    parts = (
        edges.select_columns(["pred", "n_obs"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "pred": pd.Series(dtype=object),
                "n_obs": pd.Series(dtype="int64"),
                "n_edges": pd.Series(dtype="int64"),
            }
        )
    out = parts.groupby(["pred", "n_obs"], sort=True)["n_edges"].sum().reset_index()
    out["n_obs"] = out["n_obs"].astype("int64")
    out["n_edges"] = out["n_edges"].astype("int64")
    return out


def functional_violations(edges: ray.data.Dataset, n_buckets: int = 64) -> pd.DataFrame:
    """Functional-predicate audit: per predicate, how many subjects have
    MORE than one distinct object — the constraint check an ontology
    engineer runs to decide which predicates are functional (a person has
    one employer at a time?) and where extraction over-merged.

    Scale shape: batch-distinct (pred, subj, obj) pre-shrink → ONE
    subject-hash shuffle (a subject's edges land together, so per-bucket
    fan-out counts are exact) → per-bucket (pred) partials
    (n_subjects, n_violating, max_fanout); driver fold is preds-sized.
    Returns (pred, n_subjects, n_violating, max_fanout, violation_rate)
    with the rate micro-quantized."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["pred", "subj_id", "obj_id"]].drop_duplicates()
        out = out.assign(
            bucket=(
                _md5_u64([str(x) for x in out["subj_id"]]) % np.uint64(n_buckets)
            ).astype("int32")
        )
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["pred", "subj_id", "obj_id"]].drop_duplicates()
        fan = (
            g.groupby(["pred", "subj_id"], sort=False)
            .size()
            .reset_index(name="fanout")
        )
        out = fan.groupby("pred", sort=False).agg(
            n_subjects=("fanout", "size"),
            n_violating=("fanout", lambda s: int((s > 1).sum())),
            max_fanout=("fanout", "max"),
        )
        return out.reset_index()

    parts = (
        edges.select_columns(["pred", "subj_id", "obj_id"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "pred": pd.Series(dtype=object),
                "n_subjects": pd.Series(dtype="int64"),
                "n_violating": pd.Series(dtype="int64"),
                "max_fanout": pd.Series(dtype="int64"),
                "violation_rate": pd.Series(dtype="float64"),
            }
        )
    out = parts.groupby("pred", sort=True).agg(
        n_subjects=("n_subjects", "sum"),
        n_violating=("n_violating", "sum"),
        max_fanout=("max_fanout", "max"),
    ).reset_index()
    for c in ("n_subjects", "n_violating", "max_fanout"):
        out[c] = out[c].astype("int64")
    out["violation_rate"] = (
        (out["n_violating"] * 1_000_000 // out["n_subjects"]).astype("int64").astype("float64")
        / 1e6
    )
    return out


def predicate_redundancy(edges: ray.data.Dataset, n_buckets: int = 64) -> pd.DataFrame:
    """Predicate-redundancy grid: for every unordered predicate pair, the
    Jaccard overlap of their directed endpoint-pair sets — near-synonym
    predicates (``works_at`` vs ``is_employed_at`` extracted from
    different phrasings) connect the same (subj, obj) pairs and light up
    here; the grid is COMPLETE (non-overlapping pairs report 0), the
    schema-normalization counterpart of ``predicate_cooccurrence``.

    Scale shape: batch-distinct (subj, obj, pred) → ONE endpoint-pair-hash
    shuffle (both preds of a shared pair land together) → per-bucket
    preds² co-count partials; driver fold bounded by buckets × preds².
    Jaccard micro-quantized by integer floor division."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["subj_id", "pred", "obj_id"]].drop_duplicates()
        key = [
            str(s) + "\x1f" + str(o)
            for s, o in zip(out["subj_id"], out["obj_id"])
        ]
        out = out.assign(
            bucket=(_md5_u64(key) % np.uint64(n_buckets)).astype("int32")
        )
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["subj_id", "pred", "obj_id"]].drop_duplicates()
        frames = [
            g.groupby("pred", sort=False)
            .size()
            .reset_index(name="cnt")
            .rename(columns={"pred": "pa"})
            .assign(pb="")
        ]
        j = g.merge(g, on=["subj_id", "obj_id"], suffixes=("_a", "_b"))
        j = j[j["pred_a"] < j["pred_b"]]
        if len(j):
            co = (
                j.groupby(["pred_a", "pred_b"], sort=False)
                .size()
                .reset_index(name="cnt")
            )
            co.columns = ["pa", "pb", "cnt"]
            frames.append(co)
        return pd.concat(frames, ignore_index=True)[["pa", "pb", "cnt"]]

    parts = (
        edges.select_columns(["subj_id", "pred", "obj_id"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["pred_a", "pred_b", "n_a", "n_b", "n_both", "jaccard"]
    if not len(parts):
        return pd.DataFrame(
            {
                "pred_a": pd.Series(dtype=object),
                "pred_b": pd.Series(dtype=object),
                "n_a": pd.Series(dtype="int64"),
                "n_b": pd.Series(dtype="int64"),
                "n_both": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
    agg = parts.groupby(["pa", "pb"], sort=True)["cnt"].sum()
    singles = {k[0]: int(v) for k, v in agg.items() if k[1] == ""}
    both = {(k[0], k[1]): int(v) for k, v in agg.items() if k[1] != ""}
    preds = sorted(singles)
    rows = []
    for i, a in enumerate(preds):
        for b in preds[i + 1 :]:
            nb = both.get((a, b), 0)
            union = singles[a] + singles[b] - nb
            rows.append(
                (a, b, singles[a], singles[b], nb, float(nb * 1_000_000 // union) / 1e6)
            )
    if not rows:
        return pd.DataFrame(
            {
                "pred_a": pd.Series(dtype=object),
                "pred_b": pd.Series(dtype=object),
                "n_a": pd.Series(dtype="int64"),
                "n_b": pd.Series(dtype="int64"),
                "n_both": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
    out = pd.DataFrame(rows, columns=cols)
    for c in ("n_a", "n_b", "n_both"):
        out[c] = out[c].astype("int64")
    return out


def _global_pair_dedup(
    pairs: "ray.data.Dataset", cols: tuple, n_buckets: int = 64
) -> "ray.data.Dataset":
    """Globally deduplicate a projected pair stream: per-batch dedup only
    removes duplicates WITHIN a 262k-row batch, but two edges with the
    same endpoints and different predicates can land in different
    batches — one hash-bucket exchange makes the dedup exact (a
    duplicated pair would otherwise inflate BFS sigma counts or emit
    duplicate peel rows).  Returns a materialized Dataset."""
    key_cols = list(cols)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            b = b.copy()
            b["_dbkt"] = pd.Series(dtype="int32")
            return b
        key = b[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            key = key + "\x1f" + b[c].astype(str)
        b = b.copy()
        b["_dbkt"] = (_md5_u64(list(key)) % np.uint64(n_buckets)).astype("int32")
        return b

    return (
        pairs.map_batches(tag, batch_format="pandas")
        .groupby("_dbkt")
        .map_groups(
            lambda g: g.drop_duplicates(key_cols), batch_format="pandas"
        )
        .drop_columns(["_dbkt"])
        .materialize()
    )


def betweenness_sampled(
    edges: ray.data.Dataset,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    sample_mod: int = 1,
    hops: int = 6,
    driver_edge_max: int = 200_000,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Betweenness centrality over hash-sampled seed pairs (directed,
    unweighted, hop-bounded) — the Brandes pair identity computed from a
    forward and a reverse BFS: for seeds S = {n : md5_u64(n) %
    ``sample_mod`` == 0} and every ordered pair (s, t) ∈ S×S with
    d(s, t) <= ``hops``,

        bc(v) += floor(sigma(s→v) * sigma(v→t) * 1e6 / sigma(s→t))

    for every v on a shortest s→t path (d(s,v) + d(v,t) == d(s,t),
    v ∉ {s, t}).  ``sample_mod=1`` is the exact hop-bounded betweenness;
    larger values sample deterministically (the md5 convention shared
    with minhash_eval's corpus sample), so the DuckDB twin applies the
    identical predicate and every term floors identically — the result
    is oracle-exact at any sampling rate.  All sigma arithmetic is
    Python-int (no int64 wrap on dense graphs; the daily_crosscorr
    convention).

    Rungs (the pagerank/k-hop ladder):
    - driver rung (<= ``driver_edge_max`` distinct edges): adjacency
      dicts + per-seed BFS on the driver — exact, vocabulary-sized;
    - distributed rung (``driver_edge_max=0`` forces): BFS state is a
      hash-bucketed (seed, node, dist, sigma) Dataset per direction;
      each level is two reduce-side bucket joins (frontier ⋈ edges by
      node, candidate-merge + settled anti-join by (seed, node)) with
      ZERO driver traffic during rounds; contributions meet in
      hash(v) buckets (F ⋈ R), pair distances in hash(s, t) buckets
      (⋈ ST), partials fold per node.  Seed membership is recomputed
      from the hash — no broadcast set.

    Returns (node, bc_micro) with bc_micro > 0, BIGINT micro-units.
    """
    sep = "\x1f"

    def _pair_rows(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"u": pd.Series(dtype=object), "v": pd.Series(dtype=object)}
            )
        out = (
            b[[src_col, dst_col]]
            .astype(str)
            .drop_duplicates()
            .rename(columns={src_col: "u", dst_col: "v"})
        )
        return out[out["u"] != out["v"]]

    pairs = _global_pair_dedup(
        edges.select_columns([src_col, dst_col]).map_batches(
            _pair_rows, batch_format="pandas", batch_size=262144
        ),
        ("u", "v"),
        n_buckets=num_buckets,
    )

    def _is_seed(names) -> np.ndarray:
        return _md5_u64(list(names)) % np.uint64(sample_mod) == 0

    n_edges = pairs.count()
    if n_edges == 0:
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "bc_micro": pd.Series(dtype="int64")}
        )
    if driver_edge_max and n_edges <= driver_edge_max:
        df = pairs.to_pandas().drop_duplicates()
        fwd: dict[str, list[str]] = {}
        rev: dict[str, list[str]] = {}
        nodes: set[str] = set()
        for u, v in zip(df["u"], df["v"]):
            fwd.setdefault(u, []).append(v)
            rev.setdefault(v, []).append(u)
            nodes.add(u)
            nodes.add(v)
        node_list = sorted(nodes)
        if not node_list:
            return pd.DataFrame(
                {"node": pd.Series(dtype=object), "bc_micro": pd.Series(dtype="int64")}
            )
        seeds = [n for n, m in zip(node_list, _is_seed(node_list)) if m]

        def _bfs(adj: dict, s: str) -> dict[str, tuple[int, int]]:
            out = {s: (0, 1)}
            frontier = [s]
            for lvl in range(hops):
                nxt: dict[str, int] = {}
                for x in frontier:
                    sx = out[x][1]
                    for y in adj.get(x, ()):
                        if y in out:
                            continue
                        nxt[y] = nxt.get(y, 0) + sx
                if not nxt:
                    break
                for y, sy in nxt.items():
                    out[y] = (lvl + 1, sy)
                frontier = list(nxt)
            return out

        F = {s: _bfs(fwd, s) for s in seeds}
        R = {t: _bfs(rev, t) for t in seeds}
        bc: dict[str, int] = {}
        for s in seeds:
            fs = F[s]
            for t in seeds:
                if t == s or t not in fs:
                    continue
                dst, sst = fs[t]
                rt = R[t]
                for v, (dfv, sfv) in fs.items():
                    if v == s or v == t:
                        continue
                    hit = rt.get(v)
                    if hit is None or dfv + hit[0] != dst:
                        continue
                    bc[v] = bc.get(v, 0) + sfv * hit[1] * 1_000_000 // sst
        rows = sorted((n, c) for n, c in bc.items() if c > 0)
        return pd.DataFrame(
            {
                "node": [r[0] for r in rows],
                "bc_micro": np.array([r[1] for r in rows], dtype="int64"),
            }
        )

    # ---- distributed rung ------------------------------------------------
    B = num_buckets

    def _kb(keys) -> np.ndarray:
        return (_md5_u64(list(keys)) % np.uint64(B)).astype("int32")

    def _edge_rows(rev: bool):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            u = b["v" if rev else "u"].to_numpy(dtype=object)
            v = b["u" if rev else "v"].to_numpy(dtype=object)
            return pd.DataFrame(
                {
                    "bkt": _kb(u),
                    "kind": np.int8(0),
                    "seed": "",
                    "node": u,
                    "dst": v,
                    "dist": np.int64(-1),
                    "sigma": np.zeros(len(u), dtype=object),
                }
            )

        return f

    def _bfs_ds(rev: bool) -> ray.data.Dataset:
        """(seed, node, dist, sigma[object-int]) rows, all levels."""
        e_ds = pairs.map_batches(_edge_rows(rev), batch_format="pandas")

        def seed_rows(b: pd.DataFrame) -> pd.DataFrame:
            n = pd.unique(
                np.concatenate(
                    [b["u"].to_numpy(dtype=object), b["v"].to_numpy(dtype=object)]
                )
            )
            n = n[_is_seed(n)]
            return pd.DataFrame(
                {
                    "seed": n,
                    "node": n,
                    "dist": np.int64(0),
                    "sigma": np.array([1] * len(n), dtype=object),
                }
            )

        # dedupe seed rows (a seed appears in many batches)
        state = (
            pairs.map_batches(seed_rows, batch_format="pandas")
            .map_batches(
                lambda b: b.assign(bkt=_kb(b["seed"].astype(str) + sep + b["node"].astype(str))),
                batch_format="pandas",
            )
            .groupby("bkt")
            .map_groups(
                lambda g: g.drop_duplicates(["seed", "node"]),
                batch_format="pandas",
            )
            .drop_columns(["bkt"])
            .materialize()
        )

        for lvl in range(hops):
            frontier = state.map_batches(
                lambda b, lvl=lvl: b[b["dist"] == lvl], batch_format="pandas"
            )
            fr = frontier.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "bkt": _kb(b["node"].astype(str)),
                        "kind": np.int8(1),
                        "seed": b["seed"].to_numpy(dtype=object),
                        "node": b["node"].to_numpy(dtype=object),
                        "dst": "",
                        "dist": b["dist"].to_numpy(dtype="int64"),
                        "sigma": b["sigma"].to_numpy(dtype=object),
                    }
                ),
                batch_format="pandas",
            )

            def expand(g: pd.DataFrame) -> pd.DataFrame:
                e = g[g["kind"] == 0][["node", "dst"]]
                f = g[g["kind"] == 1][["seed", "node", "sigma"]]
                if not len(e) or not len(f):
                    return pd.DataFrame(
                        {
                            "seed": pd.Series(dtype=object),
                            "node": pd.Series(dtype=object),
                            "sigma": pd.Series(dtype=object),
                        }
                    )
                j = f.merge(e, on="node")
                if not len(j):
                    return pd.DataFrame(
                        {
                            "seed": pd.Series(dtype=object),
                            "node": pd.Series(dtype=object),
                            "sigma": pd.Series(dtype=object),
                        }
                    )
                out = (
                    j.groupby(["seed", "dst"], sort=False)["sigma"]
                    .apply(lambda s: sum(s.tolist()))
                    .reset_index()
                    .rename(columns={"dst": "node"})
                )
                out["sigma"] = out["sigma"].astype(object)
                return out

            cand = (
                e_ds.union(fr)
                .groupby("bkt")
                .map_groups(expand, batch_format="pandas")
            )
            # candidate-merge + settled anti-join in (seed, node) buckets
            c2 = cand.map_batches(
                lambda b, lvl=lvl: pd.DataFrame(
                    {
                        "bkt": _kb(b["seed"].astype(str) + sep + b["node"].astype(str)),
                        "new": np.int8(1),
                        "seed": b["seed"].to_numpy(dtype=object),
                        "node": b["node"].to_numpy(dtype=object),
                        "dist": np.int64(lvl + 1),
                        "sigma": b["sigma"].to_numpy(dtype=object),
                    }
                ),
                batch_format="pandas",
            )
            s2 = state.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "bkt": _kb(b["seed"].astype(str) + sep + b["node"].astype(str)),
                        "new": np.int8(0),
                        "seed": b["seed"].to_numpy(dtype=object),
                        "node": b["node"].to_numpy(dtype=object),
                        "dist": b["dist"].to_numpy(dtype="int64"),
                        "sigma": b["sigma"].to_numpy(dtype=object),
                    }
                ),
                batch_format="pandas",
            )

            def settle(g: pd.DataFrame) -> pd.DataFrame:
                old = g[g["new"] == 0]
                new = g[g["new"] == 1]
                if len(new):
                    merged = (
                        new.groupby(["seed", "node"], sort=False)
                        .agg(sigma=("sigma", lambda s: sum(s.tolist())), dist=("dist", "first"))
                        .reset_index()
                    )
                    key_old = set(
                        zip(old["seed"].tolist(), old["node"].tolist())
                    )
                    keep = merged[
                        [
                            (s, n) not in key_old
                            for s, n in zip(merged["seed"], merged["node"])
                        ]
                    ]
                    out = pd.concat(
                        [old[["seed", "node", "dist", "sigma"]], keep[["seed", "node", "dist", "sigma"]]],
                        ignore_index=True,
                    )
                else:
                    out = old[["seed", "node", "dist", "sigma"]].copy()
                out["sigma"] = out["sigma"].astype(object)
                out["dist"] = out["dist"].astype("int64")
                return out

            state = (
                c2.union(s2)
                .groupby("bkt")
                .map_groups(settle, batch_format="pandas")
                .materialize()
            )
        return state

    F = _bfs_ds(rev=False)
    Rv = _bfs_ds(rev=True)

    def _tag(direction: np.int8):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "bkt": _kb(b["node"].astype(str)),
                    "dirn": direction,
                    "seed": b["seed"].to_numpy(dtype=object),
                    "node": b["node"].to_numpy(dtype=object),
                    "dist": b["dist"].to_numpy(dtype="int64"),
                    "sigma": b["sigma"].to_numpy(dtype=object),
                }
            )

        return f

    def vjoin(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["dirn"] == 0]
        r = g[g["dirn"] == 1]
        f = f[f["node"] != f["seed"]]
        r = r[r["node"] != r["seed"]]
        if not len(f) or not len(r):
            return pd.DataFrame(
                {
                    "s": pd.Series(dtype=object),
                    "t": pd.Series(dtype=object),
                    "v": pd.Series(dtype=object),
                    "sumd": pd.Series(dtype="int64"),
                    "prod": pd.Series(dtype=object),
                }
            )
        j = f.merge(r, on="node", suffixes=("_f", "_r"))
        j = j[j["seed_f"] != j["seed_r"]]
        j = j[j["dist_f"] + j["dist_r"] <= hops]
        out = pd.DataFrame(
            {
                "s": j["seed_f"].to_numpy(dtype=object),
                "t": j["seed_r"].to_numpy(dtype=object),
                "v": j["node"].to_numpy(dtype=object),
                "sumd": (j["dist_f"] + j["dist_r"]).to_numpy(dtype="int64"),
                "prod": np.array(
                    [a * b for a, b in zip(j["sigma_f"], j["sigma_r"])], dtype=object
                ),
            }
        )
        return out

    contrib = (
        F.map_batches(_tag(np.int8(0)), batch_format="pandas")
        .union(Rv.map_batches(_tag(np.int8(1)), batch_format="pandas"))
        .groupby("bkt")
        .map_groups(vjoin, batch_format="pandas")
    )

    # pair-distance table: forward rows whose node is itself a seed
    st = F.map_batches(
        lambda b: (
            lambda m: pd.DataFrame(
                {
                    "bkt": _kb(
                        b["seed"][m].astype(str) + sep + b["node"][m].astype(str)
                    ),
                    "kind": np.int8(0),
                    "s": b["seed"][m].to_numpy(dtype=object),
                    "t": b["node"][m].to_numpy(dtype=object),
                    "v": "",
                    "sumd": b["dist"][m].to_numpy(dtype="int64"),
                    "prod": b["sigma"][m].to_numpy(dtype=object),
                }
            )
        )(np.asarray(_is_seed(b["node"].astype(str))) & (b["node"] != b["seed"]).to_numpy()),
        batch_format="pandas",
    )
    cb = contrib.map_batches(
        lambda b: pd.DataFrame(
            {
                "bkt": _kb(b["s"].astype(str) + sep + b["t"].astype(str)),
                "kind": np.int8(1),
                "s": b["s"].to_numpy(dtype=object),
                "t": b["t"].to_numpy(dtype=object),
                "v": b["v"].to_numpy(dtype=object),
                "sumd": b["sumd"].to_numpy(dtype="int64"),
                "prod": b["prod"].to_numpy(dtype=object),
            }
        ),
        batch_format="pandas",
    )

    def pair_terms(g: pd.DataFrame) -> pd.DataFrame:
        stt = g[g["kind"] == 0][["s", "t", "sumd", "prod"]].rename(
            columns={"sumd": "dst", "prod": "sst"}
        )
        c = g[g["kind"] == 1]
        if not len(stt) or not len(c):
            return pd.DataFrame(
                {"v": pd.Series(dtype=object), "term": pd.Series(dtype=object)}
            )
        j = c.merge(stt, on=["s", "t"])
        j = j[j["sumd"] == j["dst"]]
        if not len(j):
            return pd.DataFrame(
                {"v": pd.Series(dtype=object), "term": pd.Series(dtype=object)}
            )
        out = pd.DataFrame(
            {
                "v": j["v"].to_numpy(dtype=object),
                "term": np.array(
                    [p * 1_000_000 // s for p, s in zip(j["prod"], j["sst"])],
                    dtype=object,
                ),
            }
        )
        return (
            out.groupby("v", sort=False)["term"]
            .apply(lambda s: sum(s.tolist()))
            .reset_index()
        )

    parts = (
        st.union(cb)
        .groupby("bkt")
        .map_groups(pair_terms, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {"node": pd.Series(dtype=object), "bc_micro": pd.Series(dtype="int64")}
        )
    agg = parts.groupby("v", sort=True)["term"].apply(lambda s: sum(s.tolist()))
    agg = agg[agg > 0]
    return pd.DataFrame(
        {
            "node": agg.index.to_numpy(dtype=object),
            "bc_micro": np.array([int(x) for x in agg.to_numpy()], dtype="int64"),
        }
    ).reset_index(drop=True)


def harmonic_sampled(
    edges: ray.data.Dataset,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    sample_mod: int = 1,
    hops: int = 6,
    driver_edge_max: int = 200_000,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Harmonic centrality + eccentricity for hash-sampled seeds
    (directed, unweighted, hop-bounded): per seed s,

        harmonic_micro = Σ_{t reached, t != s} floor(1e6 / d(s, t))
        ecc            = max d(s, t)      n_reached = |{t}|

    Unreachable nodes contribute 0 (the harmonic convention — why this
    metric, unlike closeness, is well-defined on disconnected KGs).
    Seeds are {n : md5_u64(n) % sample_mod == 0}; ``sample_mod=1`` scores
    every node.  Same rung ladder as ``betweenness_sampled``: driver BFS
    under ``driver_edge_max`` distinct edges, else a hash-bucketed
    (seed, node, dist) Dataset BFS — one frontier-expand + one settle
    shuffle per level, ZERO driver state, int64 throughout (no sigma).

    Returns (node, n_reached, ecc, harmonic_micro) for seeds that reach
    at least one node, micro-units BIGINT."""
    sep = "\x1f"

    def _pair_rows(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"u": pd.Series(dtype=object), "v": pd.Series(dtype=object)}
            )
        out = (
            b[[src_col, dst_col]]
            .astype(str)
            .drop_duplicates()
            .rename(columns={src_col: "u", dst_col: "v"})
        )
        return out[out["u"] != out["v"]]

    pairs = _global_pair_dedup(
        edges.select_columns([src_col, dst_col]).map_batches(
            _pair_rows, batch_format="pandas", batch_size=262144
        ),
        ("u", "v"),
        n_buckets=num_buckets,
    )

    def _is_seed(names) -> np.ndarray:
        return _md5_u64(list(names)) % np.uint64(sample_mod) == 0

    cols = ["node", "n_reached", "ecc", "harmonic_micro"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.Series(dtype=object),
                "n_reached": pd.Series(dtype="int64"),
                "ecc": pd.Series(dtype="int64"),
                "harmonic_micro": pd.Series(dtype="int64"),
            }
        )

    n_edges = pairs.count()
    if n_edges == 0:
        return _empty()

    if driver_edge_max and n_edges <= driver_edge_max:
        df = pairs.to_pandas().drop_duplicates()
        adj: dict[str, list[str]] = {}
        nodes: set[str] = set()
        for u, v in zip(df["u"], df["v"]):
            adj.setdefault(u, []).append(v)
            nodes.add(u)
            nodes.add(v)
        node_list = sorted(nodes)
        seeds = [n for n, m in zip(node_list, _is_seed(node_list)) if m]
        rows = []
        for s in seeds:
            dist = {s: 0}
            frontier = [s]
            for lvl in range(hops):
                nxt = []
                for x in frontier:
                    for y in adj.get(x, ()):
                        if y not in dist:
                            dist[y] = lvl + 1
                            nxt.append(y)
                if not nxt:
                    break
                frontier = nxt
            reached = [d for n, d in dist.items() if n != s]
            if reached:
                rows.append(
                    (
                        s,
                        len(reached),
                        max(reached),
                        sum(1_000_000 // d for d in reached),
                    )
                )
        rows.sort()
        return pd.DataFrame(rows, columns=cols).astype(
            {"n_reached": "int64", "ecc": "int64", "harmonic_micro": "int64"}
        )

    # ---- distributed rung: (seed, node, dist) BFS, int64 only ------------
    B = num_buckets

    def _kb(keys) -> np.ndarray:
        return (_md5_u64(list(keys)) % np.uint64(B)).astype("int32")

    def edge_rows(b: pd.DataFrame) -> pd.DataFrame:
        u = b["u"].to_numpy(dtype=object)
        v = b["v"].to_numpy(dtype=object)
        return pd.DataFrame(
            {
                "bkt": _kb(u),
                "kind": np.int8(0),
                "seed": "",
                "node": u,
                "dst": v,
                "dist": np.int64(-1),
            }
        )

    e_ds = pairs.map_batches(edge_rows, batch_format="pandas")

    def seed_rows(b: pd.DataFrame) -> pd.DataFrame:
        n = pd.unique(
            np.concatenate(
                [b["u"].to_numpy(dtype=object), b["v"].to_numpy(dtype=object)]
            )
        )
        n = n[_is_seed(n)]
        return pd.DataFrame({"seed": n, "node": n, "dist": np.int64(0)})

    state = (
        pairs.map_batches(seed_rows, batch_format="pandas")
        .map_batches(
            lambda b: b.assign(
                bkt=_kb(b["seed"].astype(str) + sep + b["node"].astype(str))
            ),
            batch_format="pandas",
        )
        .groupby("bkt")
        .map_groups(
            lambda g: g.drop_duplicates(["seed", "node"]),
            batch_format="pandas",
        )
        .drop_columns(["bkt"])
        .materialize()
    )

    for lvl in range(hops):
        fr = state.map_batches(
            lambda b, lvl=lvl: (
                lambda f: pd.DataFrame(
                    {
                        "bkt": _kb(f["node"].astype(str)),
                        "kind": np.int8(1),
                        "seed": f["seed"].to_numpy(dtype=object),
                        "node": f["node"].to_numpy(dtype=object),
                        "dst": "",
                        "dist": f["dist"].to_numpy(dtype="int64"),
                    }
                )
            )(b[b["dist"] == lvl]),
            batch_format="pandas",
        )

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["kind"] == 0][["node", "dst"]]
            f = g[g["kind"] == 1][["seed", "node"]]
            if not len(e) or not len(f):
                return pd.DataFrame(
                    {"seed": pd.Series(dtype=object), "node": pd.Series(dtype=object)}
                )
            j = f.merge(e, on="node")[["seed", "dst"]].drop_duplicates()
            return j.rename(columns={"dst": "node"})

        cand = (
            e_ds.union(fr).groupby("bkt").map_groups(expand, batch_format="pandas")
        )
        c2 = cand.map_batches(
            lambda b, lvl=lvl: pd.DataFrame(
                {
                    "bkt": _kb(b["seed"].astype(str) + sep + b["node"].astype(str)),
                    "new": np.int8(1),
                    "seed": b["seed"].to_numpy(dtype=object),
                    "node": b["node"].to_numpy(dtype=object),
                    "dist": np.int64(lvl + 1),
                }
            ),
            batch_format="pandas",
        )
        s2 = state.map_batches(
            lambda b: pd.DataFrame(
                {
                    "bkt": _kb(b["seed"].astype(str) + sep + b["node"].astype(str)),
                    "new": np.int8(0),
                    "seed": b["seed"].to_numpy(dtype=object),
                    "node": b["node"].to_numpy(dtype=object),
                    "dist": b["dist"].to_numpy(dtype="int64"),
                }
            ),
            batch_format="pandas",
        )

        def settle(g: pd.DataFrame) -> pd.DataFrame:
            old = g[g["new"] == 0]
            new = g[g["new"] == 1].drop_duplicates(["seed", "node"])
            if len(new):
                key_old = set(zip(old["seed"].tolist(), old["node"].tolist()))
                keep = new[
                    [
                        (s, n) not in key_old
                        for s, n in zip(new["seed"], new["node"])
                    ]
                ]
                out = pd.concat(
                    [
                        old[["seed", "node", "dist"]],
                        keep[["seed", "node", "dist"]],
                    ],
                    ignore_index=True,
                )
            else:
                out = old[["seed", "node", "dist"]].copy()
            out["dist"] = out["dist"].astype("int64")
            return out

        state = (
            c2.union(s2)
            .groupby("bkt")
            .map_groups(settle, batch_format="pandas")
            .materialize()
        )

    def seed_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["dist"] > 0]
        if not len(b):
            return pd.DataFrame(
                {
                    "bkt": pd.Series(dtype="int32"),
                    "node": pd.Series(dtype=object),
                    "n_reached": pd.Series(dtype="int64"),
                    "ecc": pd.Series(dtype="int64"),
                    "harmonic_micro": pd.Series(dtype="int64"),
                }
            )
        h = (1_000_000 // b["dist"].to_numpy(dtype="int64")).astype("int64")
        g = (
            pd.DataFrame(
                {"node": b["seed"].to_numpy(dtype=object), "d": b["dist"], "h": h}
            )
            .groupby("node", sort=False)
            .agg(n_reached=("d", "size"), ecc=("d", "max"), harmonic_micro=("h", "sum"))
            .reset_index()
        )
        g.insert(0, "bkt", _kb(g["node"].astype(str)))
        return g

    parts = (
        state.map_batches(seed_partial, batch_format="pandas")
        .groupby("bkt")
        .map_groups(
            lambda g: g.groupby("node", sort=False)
            .agg(
                n_reached=("n_reached", "sum"),
                ecc=("ecc", "max"),
                harmonic_micro=("harmonic_micro", "sum"),
            )
            .reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if not len(parts):
        return _empty()
    out = parts.sort_values("node", kind="mergesort").reset_index(drop=True)
    for c in ("n_reached", "ecc", "harmonic_micro"):
        out[c] = out[c].astype("int64")
    return out[cols]


def ktruss(
    edges: ray.data.Dataset,
    k: int = 3,
    src_col: str = "subj_id",
    dst_col: str = "obj_id",
    driver_edge_max: int = 200_000,
    num_buckets: int = 64,
    max_rounds: int | None = None,
) -> pd.DataFrame:
    """k-truss decomposition membership (undirected): synchronized
    peeling — each round simultaneously removes every surviving edge in
    fewer than ``k - 2`` triangles of the surviving subgraph — until a
    fixed point; returns the surviving edges with their final support.
    The community-robustness upgrade of k-core: a k-truss edge is
    embedded in overlapping triangles, not merely incident to busy nodes.

    Synchronized peeling is order-independent, so the result is exactly
    the k-truss and the SQL twin unrolls the same rounds verbatim (the
    kcore convention; a too-shallow unroll surfaces as a hash mismatch,
    never a silently wrong engine result).  Always runs to the fixpoint;
    ``max_rounds`` set RAISES if convergence takes longer.

    Scale shape: under ``driver_edge_max`` distinct undirected edges the
    peel loop is driver sets; above, each round is three bucket
    exchanges with NO driver edge-state — (1) neighbor lists meet in
    hash(center) buckets and emit wedge pairs (deg² per center, exact by
    necessity: truss support admits no hub cut — document hubs as the
    cost driver), (2) wedges + alive edges meet in hash(u, v) buckets to
    confirm triangles and emit the 3 per-edge support increments,
    (3) increments + alive edges meet in hash(edge) buckets for the sum
    and the < k-2 filter; the driver sees one removed-count scalar per
    round.

    Returns (a, b, support) with a < b, BIGINT support."""
    sep = "\x1f"

    def _pair_rows(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame(
                {"a": pd.Series(dtype=object), "b": pd.Series(dtype=object)}
            )
        u = b[src_col].astype(str).to_numpy(dtype=object)
        v = b[dst_col].astype(str).to_numpy(dtype=object)
        keep = u != v
        u, v = u[keep], v[keep]
        lo = np.where(u <= v, u, v)
        hi = np.where(u <= v, v, u)
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    pairs = _global_pair_dedup(
        edges.select_columns([src_col, dst_col]).map_batches(
            _pair_rows, batch_format="pandas", batch_size=262144
        ),
        ("a", "b"),
        n_buckets=num_buckets,
    )
    out_cols = ["a", "b", "support"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": pd.Series(dtype=object),
                "b": pd.Series(dtype=object),
                "support": pd.Series(dtype="int64"),
            }
        )

    n_edges = pairs.count()
    if n_edges == 0:
        return _empty()

    need = k - 2

    if driver_edge_max and n_edges <= driver_edge_max:
        df = pairs.to_pandas().drop_duplicates()
        alive = set(zip(df["a"], df["b"]))
        rounds = 0
        while True:
            adj: dict[str, set] = {}
            for a, b in alive:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            sup = {e: len(adj[e[0]] & adj[e[1]]) for e in alive}
            drop = [e for e, s in sup.items() if s < need]
            if not drop:
                rows = sorted((a, b, s) for (a, b), s in sup.items())
                return pd.DataFrame(rows, columns=out_cols).astype(
                    {"support": "int64"}
                )
            alive.difference_update(drop)
            rounds += 1
            if max_rounds is not None and rounds > max_rounds:
                raise RuntimeError(
                    f"ktruss did not converge within max_rounds={max_rounds}"
                )
            if not alive:
                return _empty()

    # ---- distributed rung ------------------------------------------------
    # Triangle enumeration uses DEGREE-ORDERED ORIENTATION (the standard
    # forward/compact algorithm): every edge points from its lower-
    # (degree, name) endpoint to the higher one, and wedges form only
    # among a node's OUT-neighbors — each triangle then surfaces exactly
    # once, at its minimum corner, and emits increments for all three of
    # its edges.  Wedge mass drops from sum(deg^2) (quadratic in hub
    # degree — intractable on a vocab-heavy KG whose orgs hold thousands
    # of edges) to sum(outdeg^2) <= O(E^1.5), tiny under skew because a
    # hub's edges all point INTO it.  Five bucket exchanges per round
    # (degree count, two degree-attach joins, triangle confirm, support
    # filter); the driver sees one removed-count scalar per round.
    B = num_buckets

    def _kb(keys) -> np.ndarray:
        return (_md5_u64(list(keys)) % np.uint64(B)).astype("int32")

    alive_ds = pairs
    rounds = 0
    while True:
        # (1) degrees of the surviving graph
        def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
            n = pd.Series(
                np.concatenate(
                    [b["a"].to_numpy(dtype=object), b["b"].to_numpy(dtype=object)]
                )
            )
            g = n.value_counts().rename_axis("node").reset_index(name="c")
            g["bkt"] = _kb(g["node"].astype(str))
            return g[["bkt", "node", "c"]]

        deg_ds = (
            alive_ds.map_batches(deg_partial, batch_format="pandas")
            .groupby("bkt")
            .map_groups(
                lambda g: g.groupby("node", sort=False)["c"].sum().reset_index(),
                batch_format="pandas",
            )
        )

        # (2) attach deg to endpoint a, then endpoint b (two bucket joins)
        def _attach(ds, key_col, out_col):
            left = ds.map_batches(
                lambda b: b.assign(
                    bkt=_kb(b[key_col].astype(str)), kind=np.int8(1)
                ),
                batch_format="pandas",
            )
            right = deg_ds.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "bkt": _kb(b["node"].astype(str)),
                        "kind": np.int8(0),
                        "node": b["node"].to_numpy(dtype=object),
                        "c": b["c"].to_numpy(dtype="int64"),
                    }
                ),
                batch_format="pandas",
            )

            def join(g: pd.DataFrame) -> pd.DataFrame:
                e = g[g["kind"] == 1].drop(columns=["bkt", "kind"])
                d = g[g["kind"] == 0][["node", "c"]]
                if not len(e):
                    e = e.copy()
                    e[out_col] = pd.Series(dtype="int64")
                    return e.drop(columns=[x for x in ("node", "c") if x in e.columns])
                out = e.merge(
                    d.rename(columns={"node": key_col, "c": out_col}),
                    on=key_col,
                    how="left",
                )
                out[out_col] = out[out_col].fillna(0).astype("int64")
                return out

            return left.union(right).groupby("bkt").map_groups(
                join, batch_format="pandas"
            )

        withdeg = _attach(_attach(alive_ds, "a", "deg_a"), "b", "deg_b")

        # (3) orient + (4) wedges among out-neighbors
        def orient(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return pd.DataFrame(
                    {
                        "bkt": pd.Series(dtype="int32"),
                        "src": pd.Series(dtype=object),
                        "dst": pd.Series(dtype=object),
                    }
                )
            a = b["a"].to_numpy(dtype=object)
            bb = b["b"].to_numpy(dtype=object)
            da = b["deg_a"].to_numpy(dtype="int64")
            db = b["deg_b"].to_numpy(dtype="int64")
            a_first = (da < db) | ((da == db) & (a < bb))
            src = np.where(a_first, a, bb)
            dst = np.where(a_first, bb, a)
            return pd.DataFrame(
                {"bkt": _kb(src.astype(str)), "src": src, "dst": dst}
            )

        def wedges(g: pd.DataFrame) -> pd.DataFrame:
            g = g[["src", "dst"]].drop_duplicates().sort_values(
                ["src", "dst"], kind="mergesort"
            )
            z = g["src"].to_numpy(dtype=object)
            nbr = g["dst"].to_numpy(dtype=object)
            starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]])
            ends = np.r_[starts[1:], len(z)]
            us, vs, zs = [], [], []
            for s, e in zip(starts, ends):
                d = e - s
                if d < 2:
                    continue
                block = nbr[s:e]
                iu, iv = np.triu_indices(d, k=1)
                us.append(block[iu])
                vs.append(block[iv])
                zs.append(np.repeat(z[s], len(iu)))
            if not us:
                return pd.DataFrame(
                    {
                        "u": pd.Series(dtype=object),
                        "v": pd.Series(dtype=object),
                        "z": pd.Series(dtype=object),
                    }
                )
            u = np.concatenate(us)
            v = np.concatenate(vs)
            lo = np.where(u <= v, u, v)
            hi = np.where(u <= v, v, u)
            return pd.DataFrame({"u": lo, "v": hi, "z": np.concatenate(zs)})

        w_ds = (
            withdeg.map_batches(orient, batch_format="pandas")
            .groupby("bkt")
            .map_groups(wedges, batch_format="pandas")
        )

        # (5) confirm triangles in hash(u, v) buckets; each confirmed
        # triangle (found ONCE at its minimum corner) increments all 3
        # of its edges
        wt = w_ds.map_batches(
            lambda b: pd.DataFrame(
                {
                    "bkt": _kb(b["u"].astype(str) + sep + b["v"].astype(str)),
                    "kind": np.int8(1),
                    "u": b["u"].to_numpy(dtype=object),
                    "v": b["v"].to_numpy(dtype=object),
                    "z": b["z"].to_numpy(dtype=object),
                }
            ),
            batch_format="pandas",
        )
        et = alive_ds.map_batches(
            lambda b: pd.DataFrame(
                {
                    "bkt": _kb(b["a"].astype(str) + sep + b["b"].astype(str)),
                    "kind": np.int8(0),
                    "u": b["a"].to_numpy(dtype=object),
                    "v": b["b"].to_numpy(dtype=object),
                    "z": "",
                }
            ),
            batch_format="pandas",
        )

        def confirm(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["kind"] == 0]
            w = g[g["kind"] == 1]
            cols = {"ea": pd.Series(dtype=object), "eb": pd.Series(dtype=object)}
            if not len(e) or not len(w):
                return pd.DataFrame(cols)
            key_e = set(zip(e["u"].tolist(), e["v"].tolist()))
            m = np.array(
                [(u, v) in key_e for u, v in zip(w["u"], w["v"])], dtype=bool
            )
            t = w[m]
            if not len(t):
                return pd.DataFrame(cols)
            u = t["u"].to_numpy(dtype=object)
            v = t["v"].to_numpy(dtype=object)
            z = t["z"].to_numpy(dtype=object)
            ea = [u, np.where(z <= u, z, u), np.where(z <= v, z, v)]
            eb = [v, np.where(z <= u, u, z), np.where(z <= v, v, z)]
            return pd.DataFrame(
                {"ea": np.concatenate(ea), "eb": np.concatenate(eb)}
            )

        inc = (
            wt.union(et).groupby("bkt").map_groups(confirm, batch_format="pandas")
        )

        # (6) sum + filter in hash(edge) buckets
        ib = inc.map_batches(
            lambda b: (
                lambda g: pd.DataFrame(
                    {
                        "bkt": _kb(g["ea"].astype(str) + sep + g["eb"].astype(str)),
                        "kind": np.int8(1),
                        "a": g["ea"].to_numpy(dtype=object),
                        "b": g["eb"].to_numpy(dtype=object),
                        "c": g["c"].to_numpy(dtype="int64"),
                    }
                )
            )(
                b.groupby(["ea", "eb"], sort=False)
                .size()
                .reset_index(name="c")
            )
            if len(b)
            else pd.DataFrame(
                {
                    "bkt": pd.Series(dtype="int32"),
                    "kind": pd.Series(dtype="int8"),
                    "a": pd.Series(dtype=object),
                    "b": pd.Series(dtype=object),
                    "c": pd.Series(dtype="int64"),
                }
            ),
            batch_format="pandas",
        )
        eb2 = alive_ds.map_batches(
            lambda b: pd.DataFrame(
                {
                    "bkt": _kb(b["a"].astype(str) + sep + b["b"].astype(str)),
                    "kind": np.int8(0),
                    "a": b["a"].to_numpy(dtype=object),
                    "b": b["b"].to_numpy(dtype=object),
                    "c": np.zeros(len(b), dtype="int64"),
                }
            ),
            batch_format="pandas",
        )

        def supfilter(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["kind"] == 0][["a", "b"]]
            if not len(e):
                return pd.DataFrame(
                    {
                        "a": pd.Series(dtype=object),
                        "b": pd.Series(dtype=object),
                        "support": pd.Series(dtype="int64"),
                    }
                )
            s = (
                g[g["kind"] == 1]
                .groupby(["a", "b"], sort=False)["c"]
                .sum()
                .reset_index()
            )
            out = e.merge(s, on=["a", "b"], how="left")
            out["support"] = out["c"].fillna(0).astype("int64")
            return out[["a", "b", "support"]]

        scored = (
            ib.union(eb2)
            .groupby("bkt")
            .map_groups(supfilter, batch_format="pandas")
            .materialize()
        )
        survivors = scored.map_batches(
            lambda b: b[b["support"] >= need], batch_format="pandas"
        ).materialize()
        n_new = survivors.count()
        n_old = alive_ds.count()
        if n_new == n_old:
            out = survivors.to_pandas()
            if not len(out):
                return _empty()
            return (
                out.sort_values(["a", "b"], kind="mergesort")
                .reset_index(drop=True)[out_cols]
                .astype({"support": "int64"})
            )
        if n_new == 0:
            return _empty()
        alive_ds = survivors.drop_columns(["support"]).materialize()
        rounds += 1
        if max_rounds is not None and rounds > max_rounds:
            raise RuntimeError(
                f"ktruss did not converge within max_rounds={max_rounds}"
            )

def entity_activity_decay(
    edges: ray.data.Dataset,
    max_shift: int = 40,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Temporal-KG recency score: per canonical entity, the
    staircase-decayed observation mass Σ over distinct observation dates
    of floor(1e6 / 2^weeks_since), where weeks_since = (corpus max
    observation epoch − date epoch) // 604800 — an integer-exact weekly
    half-life (no transcendentals, so the DuckDB twin matches
    bit-for-bit).  Fresh entities score ≈ n_recent_dates × 1e6; anything
    unobserved for ~20 weeks decays to 0.  The ranking an evolving-KG
    operator uses to pick re-extraction / re-embedding candidates.

    Scale shape: one tiny max-epoch aggregate pass, then the
    entity_lifespan explode — batch-distinct (name, label, t) Arrow
    partials → ONE entity-hash shuffle → per-bucket dedup + integer
    weight sum; driver holds the scalar max and the vocabulary-sized
    result only.

    Returns (name, label, n_dates, last_obs, decayed_micro)."""

    def max_partial(t: pa.Table) -> pa.Table:
        obs = t["t_obs"]
        if isinstance(obs, pa.ChunkedArray):
            obs = obs.combine_chunks()
        flat = obs.flatten().to_numpy(zero_copy_only=False)
        m = float(flat.max()) if len(flat) else float("-inf")
        return pa.table({"m": pa.array([m], pa.float64())})

    mx = edges.select_columns(["t_obs"]).map_batches(
        max_partial, batch_format="pyarrow"
    ).to_pandas()
    cols = ["name", "label", "n_dates", "last_obs", "decayed_micro"]
    if not len(mx) or not np.isfinite(mx["m"].max()):
        return pd.DataFrame(
            {
                "name": pd.Series(dtype=object),
                "label": pd.Series(dtype=object),
                "n_dates": pd.Series(dtype="int64"),
                "last_obs": pd.Series(dtype="float64"),
                "decayed_micro": pd.Series(dtype="int64"),
            }
        )
    max_epoch = int(mx["m"].max())

    def partial(t: pa.Table) -> pa.Table:
        return _entity_obs_explode(t, num_buckets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["name", "label", "t"])
        ti = g["t"].to_numpy(dtype="float64").astype("int64")
        weeks = (max_epoch - ti) // 604800
        shift = np.minimum(weeks, max_shift)
        w = 1_000_000 // (np.int64(1) << shift)
        agg = (
            pd.DataFrame(
                {"name": g["name"], "label": g["label"], "t": g["t"], "w": w}
            )
            .groupby(["name", "label"], sort=False)
            .agg(n_dates=("t", "size"), last_obs=("t", "max"), decayed_micro=("w", "sum"))
            .reset_index()
        )
        agg["n_dates"] = agg["n_dates"].astype("int64")
        agg["decayed_micro"] = agg["decayed_micro"].astype("int64")
        return agg

    out = (
        edges.select_columns(["subj_name", "subj_label", "obj_name", "obj_label", "t_obs"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame(
            {
                "name": pd.Series(dtype=object),
                "label": pd.Series(dtype=object),
                "n_dates": pd.Series(dtype="int64"),
                "last_obs": pd.Series(dtype="float64"),
                "decayed_micro": pd.Series(dtype="int64"),
            }
        )
    return (
        out.sort_values(["name", "label"], kind="mergesort").reset_index(drop=True)[cols]
    )


def negative_samples(
    edges: ray.data.Dataset,
    k: int = 2,
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Negative sampling for KG-embedding training (the TransE/DistMult
    data-prep stage, FILTERED setting): for every distinct true triple
    (s, p, o) and slot index i in 0..k-1, a corrupted tail is drawn
    deterministically — vocab[md5_u64(s|p|o|i) % |vocab|] over the
    lexicographically-ranked entity vocabulary — and kept only if the
    corrupted triple is NOT itself a true edge (and not the original
    tail).  Deterministic draws make the sample reproducible shard-by-
    shard AND SQL-twinnable (md5_number_lower + row_number rank).

    Scale shape: the entity vocabulary broadcasts once as a sorted array
    (vocabulary-sized, the adamic_adar/edge-set budget) — corruption is
    then one vectorized hash + take per batch; the filtered-setting
    anti-join runs in hash(s, p, o) buckets against the true edge
    stream, never on the driver.

    Returns (subj_id, pred, neg_obj_id, slot) sorted."""
    sep = "\x1f"

    import ray as _ray

    from kgray.functions.broadcast import cached_get

    def _dedup(b: pd.DataFrame) -> pd.DataFrame:
        return b[["subj_id", "pred", "obj_id"]].astype(str).drop_duplicates()

    eset = (
        edges.select_columns(["subj_id", "pred", "obj_id"])
        .map_batches(_dedup, batch_format="pandas", batch_size=262144)
        .materialize()
    )
    cols = ["subj_id", "pred", "neg_obj_id", "slot"]

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "subj_id": pd.Series(dtype=object),
                "pred": pd.Series(dtype=object),
                "neg_obj_id": pd.Series(dtype=object),
                "slot": pd.Series(dtype="int64"),
            }
        )

    vparts = eset.map_batches(
        lambda b: pd.DataFrame(
            {
                "eid": pd.unique(
                    np.concatenate(
                        [
                            b["subj_id"].to_numpy(dtype=object),
                            b["obj_id"].to_numpy(dtype=object),
                        ]
                    )
                )
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    if not len(vparts):
        return _empty()
    vocab = np.unique(vparts["eid"].to_numpy(dtype=object))  # sorted
    n_vocab = len(vocab)
    vocab_ref = _ray.put(vocab)

    def corrupt(b: pd.DataFrame) -> pd.DataFrame:
        v = cached_get(vocab_ref)
        frames = []
        s = b["subj_id"].to_numpy(dtype=object)
        p = b["pred"].to_numpy(dtype=object)
        o = b["obj_id"].to_numpy(dtype=object)
        for i in range(k):
            key = [
                f"{a}|{q}|{c}|{i}" for a, q, c in zip(s, p, o)
            ]
            idx = (_md5_u64(key) % np.uint64(n_vocab)).astype(np.int64)
            cand = v[idx]
            keep = cand != o
            frames.append(
                pd.DataFrame(
                    {
                        "subj_id": s[keep],
                        "pred": p[keep],
                        "neg_obj_id": cand[keep],
                        "slot": np.int64(i),
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (
            _md5_u64(
                [
                    a + sep + q + sep + c
                    for a, q, c in zip(out["subj_id"], out["pred"], out["neg_obj_id"])
                ]
            )
            % np.uint64(n_buckets)
        ).astype("int32")
        out["kind"] = np.int8(1)
        return out

    truth = eset.map_batches(
        lambda b: pd.DataFrame(
            {
                "subj_id": b["subj_id"].to_numpy(dtype=object),
                "pred": b["pred"].to_numpy(dtype=object),
                "neg_obj_id": b["obj_id"].to_numpy(dtype=object),
                "slot": np.int64(-1),
                "bucket": (
                    _md5_u64(
                        [
                            a + sep + q + sep + c
                            for a, q, c in zip(b["subj_id"], b["pred"], b["obj_id"])
                        ]
                    )
                    % np.uint64(n_buckets)
                ).astype("int32"),
                "kind": np.int8(0),
            }
        ),
        batch_format="pandas",
    )

    def antijoin(g: pd.DataFrame) -> pd.DataFrame:
        true_keys = set(
            zip(
                g.loc[g["kind"] == 0, "subj_id"],
                g.loc[g["kind"] == 0, "pred"],
                g.loc[g["kind"] == 0, "neg_obj_id"],
            )
        )
        neg = g[g["kind"] == 1]
        if not len(neg):
            return _empty()
        m = [
            (a, q, c) not in true_keys
            for a, q, c in zip(neg["subj_id"], neg["pred"], neg["neg_obj_id"])
        ]
        out = neg[m][cols].copy()
        out["slot"] = out["slot"].astype("int64")
        return out

    out = (
        eset.map_batches(corrupt, batch_format="pandas")
        .union(truth)
        .groupby("bucket")
        .map_groups(antijoin, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return _empty()
    return (
        out.sort_values(cols, kind="mergesort").reset_index(drop=True)[cols]
    )


def path_features(
    edges: ray.data.Dataset,
    n_buckets: int = 64,
    max_center_degree: int = 256,
) -> pd.DataFrame:
    """PRA-style path features for KG completion (Lao & Cohen's Path
    Ranking Algorithm, feature-extraction stage): for every ordered
    entity pair (s, t) connected by at least one directed 2-hop path,
    the count of paths per predicate pair — the feature matrix a
    completion model consumes (``(s, ?, t)`` scored by which meta-paths
    connect them).

    Scale shape: the in/out halves of each middle node meet in ONE
    node-hash bucket shuffle and emit per-pair features there (deg_in ×
    deg_out per middle, the wedge budget); middles above
    ``max_center_degree`` total degree are SKIPPED on both sides (the
    adamic_adar hub cut — a hub connects everything to everything and
    carries no discriminative signal; the twin applies the identical
    cut); a second (s, t)-hash shuffle folds duplicate features emitted
    through different middles.

    Returns (s, t, pred_a, pred_b, n_paths) with n_paths BIGINT."""
    sep = "\x1f"

    def io_rows(b: pd.DataFrame) -> pd.DataFrame:
        d = b[["subj_id", "pred", "obj_id"]].astype(str).drop_duplicates()
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "node": d["obj_id"].to_numpy(dtype=object),
                        "side": np.int8(0),
                        "other": d["subj_id"].to_numpy(dtype=object),
                        "pred": d["pred"].to_numpy(dtype=object),
                    }
                ),
                pd.DataFrame(
                    {
                        "node": d["subj_id"].to_numpy(dtype=object),
                        "side": np.int8(1),
                        "other": d["obj_id"].to_numpy(dtype=object),
                        "pred": d["pred"].to_numpy(dtype=object),
                    }
                ),
            ],
            ignore_index=True,
        )
        out["bucket"] = (
            _md5_u64([str(x) for x in out["node"]]) % np.uint64(n_buckets)
        ).astype("int32")
        return out

    def per_middle(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["node", "side", "other", "pred"])
        deg = g.groupby("node", sort=False).size()
        ok = deg[deg <= max_center_degree].index
        g = g[g["node"].isin(ok)]
        ins = g[g["side"] == 0][["node", "other", "pred"]].rename(
            columns={"other": "s", "pred": "pred_a"}
        )
        outs = g[g["side"] == 1][["node", "other", "pred"]].rename(
            columns={"other": "t", "pred": "pred_b"}
        )
        if not len(ins) or not len(outs):
            return pd.DataFrame(
                {
                    "s": pd.Series(dtype=object),
                    "t": pd.Series(dtype=object),
                    "pred_a": pd.Series(dtype=object),
                    "pred_b": pd.Series(dtype=object),
                    "n": pd.Series(dtype="int64"),
                }
            )
        j = ins.merge(outs, on="node")
        out = (
            j.groupby(["s", "t", "pred_a", "pred_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        return out

    def pair_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if not len(b):
            b["pbucket"] = pd.Series(dtype="int32")
            return b
        key = [
            s + sep + t for s, t in zip(b["s"].astype(str), b["t"].astype(str))
        ]
        b["pbucket"] = (_md5_u64(key) % np.uint64(n_buckets)).astype("int32")
        return b

    out = (
        edges.select_columns(["subj_id", "pred", "obj_id"])
        .map_batches(io_rows, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_middle, batch_format="pandas")
        .map_batches(pair_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(
            lambda g: g.groupby(["s", "t", "pred_a", "pred_b"], sort=False)["n"]
            .sum()
            .reset_index(name="n_paths")
            if len(g)
            else pd.DataFrame(
                {
                    "s": pd.Series(dtype=object),
                    "t": pd.Series(dtype=object),
                    "pred_a": pd.Series(dtype=object),
                    "pred_b": pd.Series(dtype=object),
                    "n_paths": pd.Series(dtype="int64"),
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    cols = ["s", "t", "pred_a", "pred_b", "n_paths"]
    if not len(out):
        return pd.DataFrame(
            {
                "s": pd.Series(dtype=object),
                "t": pd.Series(dtype=object),
                "pred_a": pd.Series(dtype=object),
                "pred_b": pd.Series(dtype=object),
                "n_paths": pd.Series(dtype="int64"),
            }
        )
    out["n_paths"] = out["n_paths"].astype("int64")
    return out.sort_values(cols[:4], kind="mergesort").reset_index(drop=True)[cols]


def transitive_audit(
    edges: ray.data.Dataset,
    n_buckets: int = 64,
    max_center_degree: int = 256,
) -> pd.DataFrame:
    """Transitive-redundancy audit per predicate: how many distinct
    directed edges (a, p, c) are IMPLIED by a same-predicate 2-path
    a -p-> b -p-> c — the transitive-reduction readout an ontology
    engineer uses to decide whether a predicate is transitive (high
    implied rate: ``part_of``-likes, candidates for closure pruning) or
    genuinely flat.

    Scale shape: same-pred wedges form in ONE middle-hash shuffle
    (middles above ``max_center_degree`` per-pred degree skipped, twin
    identical), then wedge pairs + the true edge stream meet in
    hash(s, p, t) buckets — implied membership is confirmed where the
    edge lives; per-pred partials fold driver-side.

    Returns (pred, n_edges, n_implied, implied_rate) micro-quantized."""
    sep = "\x1f"

    def io_rows(b: pd.DataFrame) -> pd.DataFrame:
        d = b[["subj_id", "pred", "obj_id"]].astype(str).drop_duplicates()
        d = d[d["subj_id"] != d["obj_id"]]
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "node": d["obj_id"].to_numpy(dtype=object),
                        "pred": d["pred"].to_numpy(dtype=object),
                        "side": np.int8(0),
                        "other": d["subj_id"].to_numpy(dtype=object),
                    }
                ),
                pd.DataFrame(
                    {
                        "node": d["subj_id"].to_numpy(dtype=object),
                        "pred": d["pred"].to_numpy(dtype=object),
                        "side": np.int8(1),
                        "other": d["obj_id"].to_numpy(dtype=object),
                    }
                ),
            ],
            ignore_index=True,
        )
        out["bucket"] = (
            _md5_u64(
                [n + sep + p for n, p in zip(out["node"], out["pred"])]
            )
            % np.uint64(n_buckets)
        ).astype("int32")
        return out

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["node", "pred", "side", "other"])
        deg = g.groupby(["node", "pred"], sort=False).size()
        keep = deg[deg <= max_center_degree].index
        g = g.set_index(["node", "pred"]).loc[
            g.set_index(["node", "pred"]).index.isin(keep)
        ].reset_index()
        ins = g[g["side"] == 0][["node", "pred", "other"]].rename(
            columns={"other": "s"}
        )
        outs = g[g["side"] == 1][["node", "pred", "other"]].rename(
            columns={"other": "t"}
        )
        if not len(ins) or not len(outs):
            return pd.DataFrame(
                {
                    "s": pd.Series(dtype=object),
                    "pred": pd.Series(dtype=object),
                    "t": pd.Series(dtype=object),
                }
            )
        j = ins.merge(outs, on=["node", "pred"])
        j = j[j["s"] != j["t"]]
        return j[["s", "pred", "t"]].drop_duplicates()

    wedges = (
        edges.select_columns(["subj_id", "pred", "obj_id"])
        .map_batches(io_rows, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(wedge_pairs, batch_format="pandas")
    )

    def tag_wedge(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bkt": (
                    _md5_u64(
                        [
                            s + sep + p + sep + t
                            for s, p, t in zip(b["s"], b["pred"], b["t"])
                        ]
                    )
                    % np.uint64(n_buckets)
                ).astype("int32"),
                "kind": np.int8(1),
                "s": b["s"].to_numpy(dtype=object),
                "pred": b["pred"].to_numpy(dtype=object),
                "t": b["t"].to_numpy(dtype=object),
            }
        )

    def tag_edge(b: pd.DataFrame) -> pd.DataFrame:
        d = b[["subj_id", "pred", "obj_id"]].astype(str).drop_duplicates()
        d = d[d["subj_id"] != d["obj_id"]]
        return pd.DataFrame(
            {
                "bkt": (
                    _md5_u64(
                        [
                            s + sep + p + sep + t
                            for s, p, t in zip(d["subj_id"], d["pred"], d["obj_id"])
                        ]
                    )
                    % np.uint64(n_buckets)
                ).astype("int32"),
                "kind": np.int8(0),
                "s": d["subj_id"].to_numpy(dtype=object),
                "pred": d["pred"].to_numpy(dtype=object),
                "t": d["obj_id"].to_numpy(dtype=object),
            }
        )

    def confirm(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0]
        w = g[g["kind"] == 1].drop_duplicates(["s", "pred", "t"])
        if not len(e):
            return pd.DataFrame(
                {
                    "pred": pd.Series(dtype=object),
                    "n_edges": pd.Series(dtype="int64"),
                    "n_implied": pd.Series(dtype="int64"),
                }
            )
        wk = set(zip(w["s"].tolist(), w["pred"].tolist(), w["t"].tolist()))
        implied = np.array(
            [
                (s, p, t) in wk
                for s, p, t in zip(e["s"], e["pred"], e["t"])
            ],
            dtype=bool,
        )
        out = pd.DataFrame({"pred": e["pred"], "i": implied.astype("int64")})
        agg = out.groupby("pred", sort=False).agg(
            n_edges=("i", "size"), n_implied=("i", "sum")
        )
        return agg.reset_index().astype({"n_edges": "int64", "n_implied": "int64"})

    parts = (
        wedges.map_batches(tag_wedge, batch_format="pandas")
        .union(
            edges.select_columns(["subj_id", "pred", "obj_id"]).map_batches(
                tag_edge, batch_format="pandas"
            )
        )
        .groupby("bkt")
        .map_groups(confirm, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame(
            {
                "pred": pd.Series(dtype=object),
                "n_edges": pd.Series(dtype="int64"),
                "n_implied": pd.Series(dtype="int64"),
                "implied_rate": pd.Series(dtype="float64"),
            }
        )
    out = parts.groupby("pred", sort=True).sum().reset_index()
    out["n_edges"] = out["n_edges"].astype("int64")
    out["n_implied"] = out["n_implied"].astype("int64")
    out["implied_rate"] = (
        (out["n_implied"] * 1_000_000 // out["n_edges"]).astype("int64").astype("float64")
        / 1e6
    )
    return out
