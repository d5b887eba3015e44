"""Neo4j export sinks: codec parity, Cypher statement text, and the
neo4j-admin CSV layout read back with DuckDB as an independent reader."""

import glob
import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.sinks import neo4j as sink


def test_embedding_codec_roundtrip():
    # reference codec: comma-joined str(float64) (neo4j_storage.py:55-82)
    v = np.array([0.5, -1.25, 3.0])
    s = sink.embeddings_to_str(v)
    assert s == "0.5,-1.25,3.0"
    assert np.array_equal(sink.str_to_embeddings(s), v)
    assert sink.embeddings_to_str(None) == ""
    assert sink.str_to_embeddings("").size == 0


def test_format_property_value_shapes():
    # numbers bare, strings quoted+escaped, lists mixed, embeddings codec
    assert sink.format_property_value("n_obs", 3) == "3"
    assert sink.format_property_value("first_seen", 'say "hi"') == '"say \\"hi\\""'
    assert sink.format_property_value("t_obs", [1.5, 2.0]) == "[1.5, 2.0]"
    assert sink.format_property_value("atomic_facts", ['a "quote"', "b"]) == '["a \\"quote\\"", "b"]'
    assert sink.format_property_value("t_obs", []) == "[]"
    assert sink.format_property_value("embeddings", np.array([1.0, 2.0])) == '"1.0,2.0"'


def test_node_and_relationship_statement_text(ray_session):
    nodes = ray.data.from_pandas(
        pd.DataFrame(
            {
                "entity_id": ["e_1"],
                "name": ['acme "labs"'],
                "label": ["3d printer"],  # digit-leading + space → sanitized
            }
        )
    )
    stmts = sink.node_statements(nodes).to_pandas()["cypher"].tolist()
    assert stmts == [
        'MERGE (n:L3dprinter {name: "acme \\"labs\\""}) SET n.entity_id = "e_1"'
    ]

    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subj_name": ["acme"],
                "subj_label": ["org"],
                "obj_name": ["bob"],
                "obj_label": ["person"],
                "pred": ["works at!"],
                "n_obs": [2],
                "first_seen": ["c1|0"],
                "t_obs": [[1.5]],
            }
        )
    )
    (stmt,) = sink.relationship_statements(edges).to_pandas()["cypher"].tolist()
    assert stmt.startswith(
        'MATCH (n:org {name: "acme"}), (m:person {name: "bob"}) MERGE (n)-[r:worksat]->(m) '
    )
    # properties land in BOTH ON CREATE and ON MATCH (neo4j_storage.py:236-243)
    assert stmt.count('r.n_obs = 2, r.first_seen = "c1|0", r.t_obs = [1.5]') == 0
    assert stmt.count('r.t_obs = [1.5], r.n_obs = 2, r.first_seen = "c1|0"') == 2


@pytest.fixture(scope="module")
def small_kg(ray_session, tmp_path_factory):
    """Build the seed-7 KG once and export it both ways."""
    from kgray.config import PipelineConfig
    from kgray.pipelines.kg import build_kg, write_kg
    from kgray.sources.testdata import embedder_concepts, write_transcripts
    from kgray.stages.embed import HashEmbedder

    base = str(tmp_path_factory.mktemp("neo4j_export"))
    cfg = PipelineConfig(extract_concurrency=2)
    world = write_transcripts(f"{base}/transcripts.parquet", seed=7, n_conversations=60)
    ts = ray.data.read_parquet(f"{base}/transcripts.parquet")
    res = build_kg(
        ts,
        cfg=cfg,
        embedder_factory=lambda: HashEmbedder(dim=cfg.embed_dim, concepts=embedder_concepts(world)),
    )
    kg_dir = f"{base}/kg"
    shutil.rmtree(kg_dir, ignore_errors=True)
    write_kg(res, kg_dir)
    return base, kg_dir


def test_export_admin_csv_roundtrip(small_kg):
    base, kg_dir = small_kg
    nodes = ray.data.read_parquet(f"{kg_dir}/nodes")
    edges = ray.data.read_parquet(f"{kg_dir}/edges")
    out = f"{base}/admin"
    info = sink.export_admin_csv(nodes, edges, out)

    node_header = open(info["nodes_header"]).read().strip().split(",")
    con = duckdb.connect()
    got_nodes = con.sql(
        f"SELECT * FROM read_csv('{out}/nodes/*.csv', header=false, "
        "columns={'id':'VARCHAR','name':'VARCHAR','label':'VARCHAR','neo':'VARCHAR'})"
    ).df()
    got_edges = con.sql(
        f"SELECT * FROM read_csv('{out}/relationships/*.csv', header=false, "
        "columns={'s':'VARCHAR','o':'VARCHAR','t':'VARCHAR','pred':'VARCHAR',"
        "'n_obs':'BIGINT','fs':'VARCHAR','t_obs':'VARCHAR','t_start':'VARCHAR',"
        "'t_end':'VARCHAR','facts':'VARCHAR'})"
    ).df()

    assert node_header == ["entity_id:ID", "name", "label", ":LABEL"]
    assert len(got_nodes) == nodes.count()
    assert len(got_edges) == edges.count()
    # referential integrity survives the export
    assert set(got_edges["s"]).issubset(set(got_nodes["id"]))
    assert set(got_edges["o"]).issubset(set(got_nodes["id"]))
    # array syntax: ';'-joined doubles parse back to floats
    some = [x for x in got_edges["t_obs"] if x]
    assert some and all(float(p) or True for x in some for p in str(x).split(";"))
    assert "neo4j-admin database import" in info["import_command"]


def test_export_cypher_shards(small_kg):
    base, kg_dir = small_kg
    nodes = ray.data.read_parquet(f"{kg_dir}/nodes")
    edges = ray.data.read_parquet(f"{kg_dir}/edges")
    out = f"{base}/cypher"
    sink.export_cypher(nodes, edges, out)

    node_stmts = []
    for p in glob.glob(f"{out}/nodes/*.cypher"):
        node_stmts += [l for l in open(p).read().splitlines() if l]
    rel_stmts = []
    for p in glob.glob(f"{out}/relationships/*.cypher"):
        rel_stmts += [l for l in open(p).read().splitlines() if l]
    assert len(node_stmts) == nodes.count()
    assert len(rel_stmts) == edges.count()
    assert all(s.startswith("MERGE (n:") and s.endswith(";") for s in node_stmts)
    assert all(s.startswith("MATCH (n:") and " MERGE (n)-[r:" in s for s in rel_stmts)
    # no tmp files left behind
    assert not glob.glob(f"{out}/**/*.tmp", recursive=True)
