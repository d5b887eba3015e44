"""The LSH matching path must reproduce the broadcast/driver path's
clusters on worlds with clean similarity margins (the calibrated regime)."""

import pytest
import ray.data

from kgray.config import PipelineConfig
from kgray.pipelines.kg import build_kg
from kgray.sources.testdata import embedder_concepts, generate_transcripts
from kgray.stages.embed import HashEmbedder


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    df, world = generate_transcripts(seed=42, n_conversations=60)
    p = str(tmp_path_factory.mktemp("lsh") / "t.parquet")
    df.to_parquet(p, index=False)
    return p, embedder_concepts(world)


def _build(path, concepts, cfg):
    return build_kg(
        ray.data.read_parquet(path),
        cfg=cfg,
        embedder_factory=lambda: HashEmbedder(dim=cfg.embed_dim, concepts=concepts),
    )


def test_lsh_incremental_merges_onto_existing(data, tmp_path):
    """ADVICE r1 (high): an incremental build that takes the LSH branch must
    still merge new surfaces onto the prior store's canonical entities —
    the existing canonicals are unioned into the candidate Dataset BEFORE
    the branch, not only on the broadcast path."""
    import pandas as pd
    import os

    from kgray.pipelines.kg import save_kg_store

    path, concepts = data
    lsh_cfg = PipelineConfig(
        extract_concurrency=2,
        driver_match_max_entities=0,
        broadcast_match_max_entities=0,  # force LSH even for the increment
    )
    full = _build(path, concepts, lsh_cfg)

    # temporal split by conversation observation date (first-seen-wins reps)
    df = pd.read_parquet(path)
    obs = df.groupby("conv_id")["ts"].min().dt.strftime("%Y-%m-%d")
    cutoff = sorted(obs.unique())[len(obs.unique()) // 2]
    a = df[df.conv_id.isin(obs[obs < cutoff].index)]
    b = df[~df.conv_id.isin(obs[obs < cutoff].index)]
    pa_, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    a.to_parquet(pa_, index=False)
    b.to_parquet(pb, index=False)

    emb = lambda: HashEmbedder(dim=lsh_cfg.embed_dim, concepts=concepts)
    run_a = build_kg(ray.data.read_parquet(pa_), cfg=lsh_cfg, embedder_factory=emb)
    store = os.path.join(str(tmp_path), "store")
    save_kg_store(run_a, store)
    run_b = build_kg(
        ray.data.read_parquet(pb), cfg=lsh_cfg, embedder_factory=emb, existing_store=store
    )

    key = lambda df: set(zip(df.subj_name, df.subj_label, df.pred, df.obj_name, df.obj_label))
    assert key(run_b.edges.to_pandas()) == key(full.edges.to_pandas())
    assert set(run_b.nodes.to_pandas()["entity_id"]) == set(full.nodes.to_pandas()["entity_id"])


def test_lsh_branch_never_pulls_vectors(data, monkeypatch):
    """VERDICT r1 #1: on the LSH branch no driver call may materialize the
    embedding vectors — take_all/to_pandas must only ever see vec-free
    schemas (ranks, pair lists, vocab)."""
    path, concepts = data

    orig_take_all = ray.data.Dataset.take_all
    orig_to_pandas = ray.data.Dataset.to_pandas

    def guard(ds):
        names = ds.schema().names
        assert "vec" not in names, f"driver pull of embedding vectors: {names}"

    def take_all(self, *a, **kw):
        guard(self)
        return orig_take_all(self, *a, **kw)

    def to_pandas(self, *a, **kw):
        guard(self)
        return orig_to_pandas(self, *a, **kw)

    monkeypatch.setattr(ray.data.Dataset, "take_all", take_all)
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", to_pandas)
    res = _build(
        path,
        concepts,
        PipelineConfig(
            extract_concurrency=2,
            driver_match_max_entities=0,
            broadcast_match_max_entities=0,
        ),
    )
    assert res.edges.count() > 0


def test_label_propagation_path_matches_driver_unionfind(data):
    """VERDICT r1 #1: above cfg.driver_edge_max the representatives come
    from distributed min-label propagation; forcing the cutoff to 0 must
    reproduce the driver union-find clustering exactly."""
    path, concepts = data
    default = _build(path, concepts, PipelineConfig(extract_concurrency=2))
    lp = _build(
        path,
        concepts,
        PipelineConfig(
            extract_concurrency=2,
            driver_match_max_entities=0,
            broadcast_match_max_entities=0,
            driver_edge_max=0,  # force label propagation
        ),
    )
    assert lp.ent_map == default.ent_map


def test_lsh_matches_driver_path(data):
    path, concepts = data
    default = _build(path, concepts, PipelineConfig(extract_concurrency=2))
    lsh = _build(
        path,
        concepts,
        PipelineConfig(
            extract_concurrency=2,
            driver_match_max_entities=0,   # force the distributed ladder
            broadcast_match_max_entities=0,  # force LSH
        ),
    )
    assert lsh.ent_map == default.ent_map
    key = lambda df: set(zip(df.subj_name, df.pred, df.obj_name))
    assert key(lsh.edges.to_pandas()) == key(default.edges.to_pandas())


COMPACT_CFG_KW = dict(
    extract_concurrency=2,
    driver_match_max_entities=0,
    broadcast_match_max_entities=0,
    driver_edge_max=0,
    identity_map_max_entities=0,  # force the compact / 10^8-entity path
)


def test_compact_map_matches_driver(data):
    """Above cfg.identity_map_max_entities the resolution returns only the
    non-identity entries and build_kg derives nodes from the edge stream —
    the result graph must be identical to the driver path's."""
    path, concepts = data
    default = _build(path, concepts, PipelineConfig(extract_concurrency=2))
    compact = _build(path, concepts, PipelineConfig(**COMPACT_CFG_KW))

    assert getattr(compact.ent_map, "identity_omitted", False)
    non_identity = {
        k: v for k, v in default.ent_map.items() if (v[0], v[1]) != k
    }
    assert dict(compact.ent_map) == non_identity
    assert len(non_identity) < len(default.ent_map)  # compaction is real here

    key = lambda df: set(
        zip(df.subj_id, df.subj_name, df.pred, df.obj_id, df.obj_name)
    )
    assert key(compact.edges.to_pandas()) == key(default.edges.to_pandas())
    n_def = default.nodes.to_pandas()
    n_cmp = compact.nodes.to_pandas()
    assert set(zip(n_cmp.entity_id, n_cmp.name, n_cmp.label, n_cmp.neo4j_label)) == set(
        zip(n_def.entity_id, n_def.name, n_def.label, n_def.neo4j_label)
    )


def test_compact_map_never_pulls_vocabulary(data, monkeypatch):
    """On the compact path no driver pull may carry the entity vocabulary:
    every take_all/to_pandas schema must be free of the vocab/embedding
    columns (n_mentions, vec) — only predicate rows, match reps and
    scalar partials reach the driver."""
    path, concepts = data

    orig_take_all = ray.data.Dataset.take_all
    orig_to_pandas = ray.data.Dataset.to_pandas

    def guard(ds):
        names = set(ds.schema().names)
        bad = names & {"n_mentions", "vec"}
        assert not bad, f"driver pull of vocabulary columns: {sorted(names)}"

    def take_all(self, *a, **kw):
        guard(self)
        return orig_take_all(self, *a, **kw)

    def to_pandas(self, *a, **kw):
        guard(self)
        return orig_to_pandas(self, *a, **kw)

    monkeypatch.setattr(ray.data.Dataset, "take_all", take_all)
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", to_pandas)
    res = _build(path, concepts, PipelineConfig(**COMPACT_CFG_KW))
    assert res.edges.count() > 0
    assert res.nodes.count() > 0


def test_compact_incremental_merges_onto_existing(data, tmp_path):
    """Incremental build on the compact path: new surfaces still merge onto
    the prior store's canonicals (existing rows unioned into the candidate
    Dataset; min-rank label propagation keeps the existing representative)."""
    import os

    import pandas as pd

    from kgray.pipelines.kg import save_kg_store

    path, concepts = data
    cfg = PipelineConfig(**COMPACT_CFG_KW)
    full = _build(path, concepts, cfg)

    df = pd.read_parquet(path)
    obs = df.groupby("conv_id")["ts"].min().dt.strftime("%Y-%m-%d")
    cutoff = sorted(obs.unique())[len(obs.unique()) // 2]
    a = df[df.conv_id.isin(obs[obs < cutoff].index)]
    b = df[~df.conv_id.isin(obs[obs < cutoff].index)]
    pa_, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    a.to_parquet(pa_, index=False)
    b.to_parquet(pb, index=False)

    from kgray.stages.embed import HashEmbedder as _HE

    emb = lambda: _HE(dim=cfg.embed_dim, concepts=concepts)
    run_a = build_kg(ray.data.read_parquet(pa_), cfg=cfg, embedder_factory=emb)
    store = os.path.join(str(tmp_path), "store")
    save_kg_store(run_a, store)
    run_b = build_kg(
        ray.data.read_parquet(pb), cfg=cfg, embedder_factory=emb, existing_store=store
    )

    key = lambda df: set(zip(df.subj_name, df.subj_label, df.pred, df.obj_name, df.obj_label))
    assert key(run_b.edges.to_pandas()) == key(full.edges.to_pandas())
    assert set(run_b.nodes.to_pandas()["entity_id"]) == set(full.nodes.to_pandas()["entity_id"])


def test_resolution_cluster_histogram_compact_matches_dict(data):
    """ER-QA histogram parity: the compact-map distributed rung (vocabulary
    stream -> broadcast non-identity lookup -> eid groupby -> histogram
    partials) must reproduce the full-dict driver groupby exactly."""
    import pandas as pd

    from kgray.pipelines.kg import extract_quintuples
    from kgray.stages.canonicalize import (
        resolution_cluster_histogram,
        resolve_vocabulary,
    )

    path, concepts = data
    emb = lambda cfg: (lambda: HashEmbedder(dim=cfg.embed_dim, concepts=concepts))

    default_cfg = PipelineConfig(extract_concurrency=2)
    quints = extract_quintuples(
        ray.data.read_parquet(path), default_cfg
    ).materialize()

    ent_dict, _ = resolve_vocabulary(quints, default_cfg, emb(default_cfg))
    compact_cfg = PipelineConfig(**COMPACT_CFG_KW)
    ent_compact, _ = resolve_vocabulary(quints, compact_cfg, emb(compact_cfg))
    assert getattr(ent_compact, "identity_omitted", False)

    h_dict = resolution_cluster_histogram(ent_dict)
    h_compact = resolution_cluster_histogram(ent_compact, raw=quints)
    pd.testing.assert_frame_equal(
        h_dict.reset_index(drop=True), h_compact.reset_index(drop=True)
    )
    # merging happened in this world: at least one multi-variant cluster
    assert (h_dict["n_variants"] > 1).any()
