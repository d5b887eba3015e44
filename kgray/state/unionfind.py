"""Union-find over match edges.

The distributed replacement for the reference's pairwise-tree KG merging
(itext2kg/atom/atom.py:55-84): per-shard matchers emit match edges between
entity keys; this driver-side union-find computes the transitive clustering
those tree merges converge to.  Cluster representative = the member with the
smallest ``rank`` (we rank by first-seen sort key), matching the reference's
behaviour that the earlier/"global" side of a merge survives
(merge_two_kgs passes the accumulated KG as ``entities_2``, whose surface
form the match keeps, matcher.py:84-91).

The match-edge table is tiny relative to the input (≤ #distinct entities),
so a driver-side pass is sound; an iterative min-label-propagation groupby
is the documented fallback if the distinct-entity set ever outgrows driver
RAM (see kgray/stages/canonicalize.py module docstring).
"""

from __future__ import annotations


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(self, a, b) -> None:
        self.parent.setdefault(a, a)
        self.parent.setdefault(b, b)
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb

    def components(self) -> dict:
        """key → root for every key ever seen."""
        return {k: self.find(k) for k in list(self.parent)}


def label_propagation_representatives(
    pairs: "ray.data.Dataset",
    ranks: "ray.data.Dataset",
    max_rounds: int = 16,
    num_partitions: int = 4,
):
    """Distributed twin of :func:`cluster_representatives` for match-edge
    sets that outgrow driver RAM: iterative min-label propagation.

    ``pairs``: columns (a, b) — flattened entity keys.  ``ranks``: columns
    (key, rank).  Each node's label starts as ``"{rank}\\x1f{key}"``;
    every round each node adopts the minimum label among itself and its
    neighbours (one groupby per round); at the fixed point every connected
    component carries the label of its minimum-(rank, key) member — the
    exact representative :func:`cluster_representatives` picks.  Rounds
    needed = component diameter: production match graphs are stars/short
    chains (each surface points at its argmax neighbour), so a handful of
    rounds converges; the early-stop checksum exits as soon as labels are
    stable, and ``max_rounds`` guards adversarially deep chains (raise it
    for pathological graphs).

    Returns a Dataset (key, rep) containing only keys whose representative
    differs from themselves (identity omitted, as in the driver version).
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Min

    def init_labels(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": b["key"], "label": b["rank"].str.cat(b["key"], sep="\x1f")}
        )

    labels = ranks.map_batches(init_labels, batch_format="pandas").materialize()
    pairs = pairs.materialize()
    n_edges = pairs.count()
    if n_edges == 0:
        return ray.data.from_pandas(pd.DataFrame({"key": [], "rep": []}))

    def checksum(ds) -> int:
        # order-insensitive fingerprint of the current labelling
        def h(b: pd.DataFrame) -> pd.DataFrame:
            v = pd.util.hash_array(
                b["key"].str.cat(b["label"], sep="\x00").to_numpy(dtype=object)
            )
            return pd.DataFrame({"s": [int(v.sum() % (1 << 63))]})

        parts = ds.map_batches(h, batch_format="pandas").to_pandas()
        return int(parts["s"].sum() % (1 << 63))

    # join partitions spawn hash-shuffle aggregator actors; keep within
    # the CPU budget or the pool starves (raise for real clusters)
    n_parts = num_partitions

    def project(ds, key_col: str):
        def p(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": b[key_col], "label": b["label"]})

        return ds.map_batches(p, batch_format="pandas")

    prev = checksum(labels)
    for _ in range(max_rounds):
        # messages via hash-partitioned joins (both sides scale-out): each
        # endpoint offers its current label to the other
        j_a = pairs.join(labels, "inner", num_partitions=n_parts, on=("a",), right_on=("key",))
        j_b = pairs.join(labels, "inner", num_partitions=n_parts, on=("b",), right_on=("key",))
        messages = project(j_a, "b").union(project(j_b, "a"))
        labels = (
            messages.union(labels)
            .groupby("key")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        rep = b["label"].str.split("\x1f", n=1).str[1]
        out = pd.DataFrame({"key": b["key"], "rep": rep})
        return out[out["key"] != out["rep"]]

    return labels.map_batches(finish, batch_format="pandas")


def cluster_representatives(edges, ranks: dict) -> dict:
    """Cluster keys via union-find over ``edges`` and pick, per cluster, the
    member with the minimal ``ranks[key]`` as representative.

    Returns {key → representative_key} for every key that ends up in a
    non-singleton cluster (identity mappings are omitted).
    """
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    roots: dict = {}
    for k in list(uf.parent):
        roots.setdefault(uf.find(k), []).append(k)
    mapping: dict = {}
    for members in roots.values():
        rep = min(members, key=lambda k: (ranks.get(k), k))
        for m in members:
            if m != rep:
                mapping[m] = rep
    return mapping
