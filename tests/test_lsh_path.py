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
