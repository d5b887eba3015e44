"""Neo4j export: bulk-import CSV shards and Cypher statement streams.

The reference loads the final KG into Neo4j one ``MERGE`` statement at a
time over a driver-held session
(``itext2kg/graph_integration/neo4j_storage.py:155-265``).  At
10^12-turn scale a statement-per-row driver loop is not a viable load
path; the Neo4j-sanctioned bulk path is ``neo4j-admin database import``
over CSV shards.  This module provides both surfaces, each as a
streaming Ray Data stage over the nodes/edges tables ``write_kg``
produces:

* :func:`export_admin_csv` — ``neo4j-admin`` import layout: one header
  file per table (written driver-side, a single line) plus headerless
  data shards, one shard per Ray block, so the export streams with
  backpressure and a partial run can resume by re-writing only missing
  shards.  List-typed edge properties use the admin importer's array
  syntax (``name:double[]`` headers, ``;``-joined values); entity
  embeddings, when present, use the reference's comma-joined float
  codec (``neo4j_storage.py:55-82``).
* :func:`node_statements` / :func:`relationship_statements` — per-row
  ``MERGE`` Cypher matching the reference's ``create_nodes`` /
  ``create_relationships`` text (``neo4j_storage.py:155-245``): double
  quotes backslash-escaped (``:84-90``), numbers unquoted, lists as
  Cypher literals with string items escaped (``:97-135``).  Produced as
  a ``cypher`` column, vectorized per batch, for the incremental path
  where statements are replayed against a live server.
* :func:`export_cypher` — the statement stream written as ``.cypher``
  text shards (one per block).

No ``neo4j`` driver exists in this environment (and a live server would
be a driver-side bottleneck anyway), so the transport layer stays out of
scope by design; the emitted artifacts are the documented Neo4j input
formats.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data

from kgray.functions import normalize as nz

# ---------------------------------------------------------------------------
# Embedding codec (reference parity: neo4j_storage.py:55-82)
# ---------------------------------------------------------------------------


def embeddings_to_str(vec) -> str:
    """Comma-joined float string, the reference's embedding property codec
    (``transform_embeddings_to_str_list``, neo4j_storage.py:55-67)."""
    if vec is None:
        return ""
    return ",".join(list(np.asarray(vec).astype("str")))


def str_to_embeddings(s: str | None) -> np.ndarray:
    """Inverse codec (``transform_str_list_to_embeddings``,
    neo4j_storage.py:69-82)."""
    if s is None or s == "":
        return np.array([], dtype=np.float64)
    return np.array(s.split(",")).astype(np.float64)


# ---------------------------------------------------------------------------
# Cypher text helpers (reference parity: neo4j_storage.py:84-135)
# ---------------------------------------------------------------------------


def escape_str(s: str) -> str:
    return str(s).replace('"', '\\"')


def format_property_value(key: str, value) -> str:
    """Cypher literal for one property (``format_property_value``,
    neo4j_storage.py:97-135): embeddings → quoted codec string, lists →
    Cypher list with escaped string items and bare numbers, numbers bare,
    everything else quoted+escaped."""
    if key == "embeddings":
        return f'"{embeddings_to_str(value)}"'
    if isinstance(value, np.ndarray):
        value = value.tolist()
    if isinstance(value, list):
        if not value:
            return "[]"
        items = []
        for item in value:
            if isinstance(item, (int, float, np.integer, np.floating)) and not isinstance(
                item, bool
            ):
                items.append(str(item))
            else:
                items.append(f'"{escape_str(item)}"')
        return f"[{', '.join(items)}]"
    if isinstance(value, (int, float, np.integer, np.floating)) and not isinstance(value, bool):
        return str(value)
    return f'"{escape_str(value)}"'


_EDGE_PROP_COLS = ("t_obs", "t_start", "t_end", "atomic_facts", "n_obs", "first_seen")


def _node_cypher(batch: pd.DataFrame) -> pd.DataFrame:
    out = []
    has_emb = "embeddings" in batch.columns
    labels = nz.sanitize_neo4j_labels(pa.array(batch["label"].astype(str))).to_pylist()
    for i, (_, row) in enumerate(batch.iterrows()):
        props = [f'SET n.entity_id = "{escape_str(row["entity_id"])}"']
        if has_emb:
            props.append(f'SET n.embeddings = {format_property_value("embeddings", row["embeddings"])}')
        stmt = f'MERGE (n:{labels[i]} {{name: "{escape_str(row["name"])}"}}) ' + " ".join(props)
        out.append(stmt)
    return pd.DataFrame({"cypher": out})


def _edge_cypher(batch: pd.DataFrame) -> pd.DataFrame:
    out = []
    rel_types = nz.sanitize_neo4j_rel_types(pa.array(batch["pred"].astype(str))).to_pylist()
    s_labels = nz.sanitize_neo4j_labels(pa.array(batch["subj_label"].astype(str))).to_pylist()
    o_labels = nz.sanitize_neo4j_labels(pa.array(batch["obj_label"].astype(str))).to_pylist()
    prop_cols = [c for c in _EDGE_PROP_COLS if c in batch.columns]
    for i, (_, row) in enumerate(batch.iterrows()):
        sets = ", ".join(
            f"r.{c} = {format_property_value(c, row[c])}" for c in prop_cols
        )
        set_clause = f"SET {sets}" if sets else ""
        stmt = (
            f'MATCH (n:{s_labels[i]} {{name: "{escape_str(row["subj_name"])}"}}), '
            f'(m:{o_labels[i]} {{name: "{escape_str(row["obj_name"])}"}}) '
            f"MERGE (n)-[r:{rel_types[i]}]->(m) "
            f"ON CREATE {set_clause} "
            f"ON MATCH {set_clause}"
        )
        out.append(stmt)
    return pd.DataFrame({"cypher": out})


def node_statements(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """One ``MERGE`` per canonical entity (``create_nodes``,
    neo4j_storage.py:155-191)."""
    return nodes.map_batches(_node_cypher, batch_format="pandas")


def relationship_statements(edges: ray.data.Dataset) -> ray.data.Dataset:
    """One ``MATCH``+``MERGE`` per canonical edge (``create_relationships``,
    neo4j_storage.py:193-245), edge properties in ``ON CREATE``/``ON MATCH``
    ``SET`` clauses."""
    return edges.map_batches(_edge_cypher, batch_format="pandas")


def export_cypher(nodes: ray.data.Dataset, edges: ray.data.Dataset, out_dir: str) -> None:
    """Write the statement streams as ``.cypher`` text shards (one file per
    block; nodes before relationships, mirroring ``visualize_graph``,
    neo4j_storage.py:251-265).  Each writer task owns its shard, so the
    export streams and never funnels through the driver."""

    def writer(sub: str):
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)

        def write_block(batch: pd.DataFrame) -> pd.DataFrame:
            path = os.path.join(d, f"{uuid.uuid4().hex}.cypher")
            tmp = path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                for s in batch["cypher"]:
                    f.write(s)
                    f.write(";\n")
            os.rename(tmp, path)
            return pd.DataFrame({"n": [len(batch)]})

        return write_block

    # count() consumes the stream; the per-task writes are the side effect
    node_statements(nodes).map_batches(writer("nodes"), batch_format="pandas").count()
    relationship_statements(edges).map_batches(writer("relationships"), batch_format="pandas").count()


# ---------------------------------------------------------------------------
# neo4j-admin bulk-import CSV layout (the 100-TB load path)
# ---------------------------------------------------------------------------

def _no_header_args() -> dict:
    # WriteOptions is not picklable; built on the writer task via
    # arrow_csv_args_fn
    return {"write_options": pacsv.WriteOptions(include_header=False)}


def _join_list_col(t: pa.Table, col: str) -> pa.Array:
    """``;``-join a list column into the admin importer's array syntax.
    Offset arithmetic on the flattened values — no per-cell Python lists."""
    import pyarrow.compute as pc

    casted = pc.cast(t[col], pa.list_(pa.string()))
    joined = pc.binary_join(casted, ";")
    return pc.fill_null(joined, "")


def export_admin_csv(nodes: ray.data.Dataset, edges: ray.data.Dataset, out_dir: str) -> dict:
    """Write the KG in ``neo4j-admin database import`` layout: per-table
    single-line header files plus headerless data shards (one per block),
    under ``out_dir/nodes`` and ``out_dir/relationships``.

    Returns the header paths and the ready-to-run import command.  The
    shard-per-block layout is the resumable-output shape: a partial export
    re-runs only the missing shards, and the importer globs the directory.
    """
    node_cols = ["entity_id", "name", "label", "neo4j_label"]
    node_header = "entity_id:ID,name,label,:LABEL"

    def node_rows(t: pa.Table) -> pa.Table:
        lab = nz.sanitize_neo4j_labels(pa.array(t["label"].to_pylist(), type=pa.string()))
        t = t.set_column(t.schema.get_field_index("neo4j_label"), "neo4j_label", lab) \
            if "neo4j_label" in t.column_names else t.append_column("neo4j_label", lab)
        return t.select(node_cols)

    def edge_rows(t: pa.Table) -> pa.Table:
        cols = {
            "subj_id": t["subj_id"],
            "obj_id": t["obj_id"],
            "neo4j_type": t["neo4j_type"]
            if "neo4j_type" in t.column_names
            else nz.sanitize_neo4j_rel_types(pa.array(t["pred"].to_pylist(), type=pa.string())),
            "pred": t["pred"],
            "n_obs": t["n_obs"],
            "first_seen": t["first_seen"],
            "t_obs": _join_list_col(t, "t_obs"),
            "t_start": _join_list_col(t, "t_start"),
            "t_end": _join_list_col(t, "t_end"),
            "atomic_facts": _join_list_col(t, "atomic_facts"),
        }
        return pa.table(cols)

    edge_header = (
        ":START_ID,:END_ID,:TYPE,pred,n_obs:long,first_seen,"
        "t_obs:double[],t_start:double[],t_end:double[],atomic_facts:string[]"
    )

    nodes.map_batches(node_rows, batch_format="pyarrow").write_csv(
        f"{out_dir}/nodes", arrow_csv_args_fn=_no_header_args
    )
    edges.map_batches(edge_rows, batch_format="pyarrow").write_csv(
        f"{out_dir}/relationships", arrow_csv_args_fn=_no_header_args
    )

    node_header_path = os.path.join(out_dir, "nodes-header.csv")
    edge_header_path = os.path.join(out_dir, "relationships-header.csv")
    with open(node_header_path, "w") as f:
        f.write(node_header + "\n")
    with open(edge_header_path, "w") as f:
        f.write(edge_header + "\n")

    cmd = (
        "neo4j-admin database import full --array-delimiter=';' "
        f"--nodes='{node_header_path},{out_dir}/nodes/.*' "
        f"--relationships='{edge_header_path},{out_dir}/relationships/.*' neo4j"
    )
    with open(os.path.join(out_dir, "IMPORT.md"), "w") as f:
        f.write("# neo4j-admin bulk import\n\n```\n" + cmd + "\n```\n")
    return {
        "nodes_header": node_header_path,
        "relationships_header": edge_header_path,
        "import_command": cmd,
    }
