"""Graph-side operators over the nodes/edges datasets.

- isolated entities: the reference's anti-join ``entities − (start ∪ end)``
  (itext2kg/atom/models/knowledge_graph.py:80-83), used by the legacy
  isolated-entity re-prompt loop;
- node degrees: per-entity edge participation (a pre-aggregated groupby).
"""

from __future__ import annotations

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
