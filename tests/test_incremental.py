"""Incremental-store and checkpoint/resume tests (FIXTURES.md §6 scenarios
8-10; reference ST4 semantics, atom.py:196-208)."""

import glob
import json
import os

import pandas as pd
import pytest
import ray.data

from kgray.config import PipelineConfig
from kgray.pipelines.kg import build_kg, save_kg_store
from kgray.sources.testdata import embedder_concepts, generate_transcripts
from kgray.stages.embed import HashEmbedder
from kgray.state.checkpoint import completed_partitions, extract_with_checkpoints

CFG = PipelineConfig(extract_concurrency=2)


def _triple_key(df):
    return set(zip(df.subj_name, df.subj_label, df.pred, df.obj_name, df.obj_label))


@pytest.fixture(scope="module")
def split_world(tmp_path_factory):
    df, world = generate_transcripts(seed=42, n_conversations=80)
    d = tmp_path_factory.mktemp("inc")
    # split TEMPORALLY by conversation observation date: increments arrive
    # in time order, as in the reference's per-date ingest batches
    # (evaluation/latency/testing_atom.py:439-447).  Canonical
    # representatives are first-seen-wins, so out-of-order increments
    # would legitimately pick different (cluster-equivalent) surfaces.
    obs = df.groupby("conv_id")["ts"].min().dt.strftime("%Y-%m-%d")
    cutoff = sorted(obs.unique())[len(obs.unique()) // 2]
    a_convs = obs[obs < cutoff].index
    a = df[df.conv_id.isin(a_convs)]
    b = df[~df.conv_id.isin(a_convs)]
    paths = {}
    for name, part in [("full", df), ("a", a), ("b", b)]:
        p = str(d / f"{name}.parquet")
        part.to_parquet(p, index=False)
        paths[name] = p
    return paths, world, str(d)


def test_incremental_matches_full_build(split_world):
    paths, world, d = split_world
    concepts = embedder_concepts(world)
    emb = lambda: HashEmbedder(dim=CFG.embed_dim, concepts=concepts)

    full = build_kg(ray.data.read_parquet(paths["full"]), cfg=CFG, embedder_factory=emb)
    full_edges = full.edges.to_pandas()

    run_a = build_kg(ray.data.read_parquet(paths["a"]), cfg=CFG, embedder_factory=emb)
    store_dir = os.path.join(d, "store")
    save_kg_store(run_a, store_dir)

    run_b = build_kg(
        ray.data.read_parquet(paths["b"]), cfg=CFG, embedder_factory=emb,
        existing_store=store_dir,
    )
    inc_edges = run_b.edges.to_pandas()

    # triple sets identical between one-shot and incremental builds
    assert _triple_key(inc_edges) == _triple_key(full_edges)

    # per-triple time/provenance content matches (t_obs as date sets —
    # blind list-extension on the existing-KG merge can duplicate a date,
    # exactly as the reference's combine_timestamps does; see PARITY.md)
    fk = full_edges.set_index(["subj_name", "subj_label", "pred", "obj_name", "obj_label"])
    ik = inc_edges.set_index(["subj_name", "subj_label", "pred", "obj_name", "obj_label"])
    for key in fk.index:
        f, i = fk.loc[key], ik.loc[key]
        assert set(f["t_obs"]) == set(i["t_obs"]), key
        assert sorted(f["t_start"]) == sorted(i["t_start"]), key
        assert sorted(f["t_end"]) == sorted(i["t_end"]), key
        assert sorted(f["atomic_facts"]) == sorted(i["atomic_facts"]), key

    # node sets identical
    assert set(run_b.nodes.to_pandas()["entity_id"]) == set(full.nodes.to_pandas()["entity_id"])


def test_checkpoint_resume(split_world, tmp_path):
    paths, world, d = split_world
    work = str(tmp_path / "ckpt")

    q1 = extract_with_checkpoints(paths["full"], work, CFG, num_partitions=4)
    n1 = q1.count()
    parts = completed_partitions(work)
    assert sorted(int(k) for k in parts) == [0, 1, 2, 3]
    assert sum(p["rows"] for p in parts.values()) == n1
    files_before = {f: os.path.getmtime(f) for f in glob.glob(f"{work}/quintuples/**/*.parquet", recursive=True)}

    # immediate rerun: everything checkpointed → no files rewritten
    q2 = extract_with_checkpoints(paths["full"], work, CFG, num_partitions=4)
    assert q2.count() == n1
    files_after = {f: os.path.getmtime(f) for f in glob.glob(f"{work}/quintuples/**/*.parquet", recursive=True)}
    assert files_before == files_after

    # simulate a crashed partition: drop its manifest entry + files
    manifest_path = os.path.join(work, "manifest.json")
    m = json.load(open(manifest_path))
    del m["partitions"]["2"]
    json.dump(m, open(manifest_path, "w"))
    q3 = extract_with_checkpoints(paths["full"], work, CFG, num_partitions=4)
    assert q3.count() == n1  # partition 2 recomputed, others untouched
    assert sorted(int(k) for k in completed_partitions(work)) == [0, 1, 2, 3]
    # untouched partitions kept their original files
    untouched = {f: t for f, t in files_before.items() if "partition_id=2" not in f}
    for f, t in untouched.items():
        assert os.path.getmtime(f) == t

    # input change voids the checkpoint
    q4 = extract_with_checkpoints(paths["a"], work, CFG, num_partitions=4)
    assert q4.count() < n1
    assert completed_partitions(work)["0"]["input_fingerprint"] != parts["0"]["input_fingerprint"]
