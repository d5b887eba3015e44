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
