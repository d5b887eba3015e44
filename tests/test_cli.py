"""python -m kgray job entrypoint: fresh, checkpointed and resumed runs
produce identical graphs; manifest carries lineage + per-run metrics."""

import json
import os

import duckdb
import pytest

from kgray.__main__ import main
from kgray.sources.testdata import write_transcripts


@pytest.fixture(scope="module")
def transcripts(ray_session, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("cli"))
    path = f"{base}/transcripts.parquet"
    write_transcripts(path, seed=11, n_conversations=80)
    return base, path


def _edge_set(out_dir: str) -> set:
    rows = duckdb.sql(
        f"SELECT subj_id, pred, obj_id FROM read_parquet('{out_dir}/edges/*.parquet')"
    ).fetchall()
    return set(rows)


@pytest.fixture(scope="module")
def direct_kg(transcripts):
    base, path = transcripts
    m = main(["--input", path, "--out", f"{base}/kg_direct"])
    return m


def test_cli_fresh_build(transcripts, direct_kg):
    base, path = transcripts
    m = direct_kg
    assert m["nodes"] > 0 and m["edges"] > 0 and not m["checkpointed"]
    # referential integrity via an independent reader
    dangling = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{base}/kg_direct/edges/*.parquet') e
        WHERE e.subj_id NOT IN (SELECT entity_id FROM read_parquet('{base}/kg_direct/nodes/*.parquet'))
           OR e.obj_id  NOT IN (SELECT entity_id FROM read_parquet('{base}/kg_direct/nodes/*.parquet'))"""
    ).fetchone()[0]
    assert dangling == 0


def test_cli_checkpointed_equals_direct_and_resumes(transcripts):
    base, path = transcripts
    ck = f"{base}/ckpt"
    m1 = main(["--input", path, "--out", f"{base}/kg_ck", "--checkpoint-dir", ck,
               "--num-partitions", "8"])
    assert m1["checkpointed"]
    assert _edge_set(f"{base}/kg_ck") == _edge_set(f"{base}/kg_direct")

    manifest = json.load(open(os.path.join(ck, "manifest.json")))
    assert len(manifest["partitions"]) == 8
    assert len(manifest["runs"]) == 1
    run = manifest["runs"][0]
    assert run["wall_sec"] > 0
    assert run["rows"] == sum(p["rows"] for p in manifest["partitions"].values())

    # resume: nothing to redo — no new run entry, identical output
    m2 = main(["--input", path, "--out", f"{base}/kg_ck2", "--checkpoint-dir", ck,
               "--num-partitions", "8"])
    manifest2 = json.load(open(os.path.join(ck, "manifest.json")))
    assert len(manifest2["runs"]) == 1
    assert _edge_set(f"{base}/kg_ck2") == _edge_set(f"{base}/kg_ck")
    assert m2["edges"] == m1["edges"]


def test_cli_save_store_and_export(transcripts, capsys):
    base, path = transcripts
    m = main([
        "--input", path, "--out", f"{base}/kg_exp",
        "--save-store", f"{base}/store",
        "--export-neo4j-csv", f"{base}/neo4j_csv",
    ])
    # one JSON metrics line on stdout
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["edges"] == m["edges"]
    assert os.path.exists(f"{base}/store")
    n_csv = duckdb.sql(
        f"SELECT count(*) FROM read_csv('{base}/neo4j_csv/nodes/*.csv', header=false)"
    ).fetchone()[0]
    assert n_csv == m["nodes"]
    assert os.path.exists(f"{base}/neo4j_csv/IMPORT.md")
