"""Legacy two-step pipeline, graph functions, distiller, prompts, eval."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.config import PipelineConfig
from kgray.eval import merge_quality, quintuple_quality
from kgray.functions.graph import isolated_entities, node_degrees
from kgray.functions.prompts import assemble_prompt, count_tokens, split_request_batches
from kgray.pipelines.kg import build_kg
from kgray.pipelines.legacy import TwoStepRuleExtractor, build_kg_legacy
from kgray.sources.testdata import embedder_concepts, generate_transcripts
from kgray.stages.distill import FactoidSplitter, combine_distilled, distill, split_factoids
from kgray.stages.embed import HashEmbedder

CFG = PipelineConfig(extract_concurrency=2)


@pytest.fixture(scope="module")
def world_data(tmp_path_factory):
    df, world = generate_transcripts(seed=42, n_conversations=60)
    p = str(tmp_path_factory.mktemp("legacy") / "t.parquet")
    df.to_parquet(p, index=False)
    return p, embedder_concepts(world), world


def test_legacy_two_step_matches_atom_triples(world_data):
    path, concepts, _world = world_data
    emb = lambda: HashEmbedder(dim=CFG.embed_dim, concepts=concepts)
    atom = build_kg(ray.data.read_parquet(path), cfg=CFG, embedder_factory=emb)
    legacy = build_kg_legacy(ray.data.read_parquet(path), embedder_factory=emb)
    key = lambda df: set(zip(df.subj_name, df.pred, df.obj_name))
    assert key(legacy.edges.to_pandas()) == key(atom.edges.to_pandas())


def test_invented_entity_correction(world_data):
    path, concepts, world = world_data
    emb = lambda: HashEmbedder(dim=CFG.embed_dim, concepts=concepts)
    ex = TwoStepRuleExtractor(embedder_factory=emb)
    from kgray.functions.normalize import normalize_name_py
    canonical = normalize_name_py(world.person_surfaces[0][0])
    variant = normalize_name_py(world.person_surfaces[0][1])
    allowed = [(canonical, "person"), ("google", "organization")]
    # a known variant corrects onto the in-list surface (cos > 0.5)
    assert ex._correct((variant, "person"), allowed) == (canonical, "person")
    # exact hit adopted unchanged
    assert ex._correct(("google", "organization"), allowed) == ("google", "organization")
    # unrelated invented surface kept (legacy find_match keeps obj1)
    assert ex._correct(("zzz unrelated thing", "gadget"), allowed) == (
        "zzz unrelated thing", "gadget",
    )


def test_node_degrees_and_isolated(world_data):
    path, concepts, _world = world_data
    emb = lambda: HashEmbedder(dim=CFG.embed_dim, concepts=concepts)
    res = build_kg(ray.data.read_parquet(path), cfg=CFG, embedder_factory=emb)
    deg = node_degrees(res.edges).to_pandas()
    edges = res.edges.to_pandas()
    # spot-check one subject's out_degree against a direct count
    some = edges["subj_id"].iloc[0]
    want = int((edges["subj_id"] == some).sum())
    assert int(deg.set_index("entity_id").loc[some, "out_degree"]) == want
    # all KG nodes participate in edges → no isolated nodes
    assert isolated_entities(res.nodes, res.edges).empty
    # inject an orphan node → found by the anti-join
    orphan = pd.DataFrame(
        [{"entity_id": "e_orphan", "name": "orphan", "label": "thing", "neo4j_label": "thing"}]
    )
    nodes2 = ray.data.from_pandas(pd.concat([res.nodes.to_pandas(), orphan], ignore_index=True))
    iso = isolated_entities(nodes2, res.edges)
    assert list(iso["entity_id"]) == ["e_orphan"]


def test_factoid_splitter():
    docs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "First fact. Second fact! Third?  ",
                    "Single sentence only.",
                ],
            }
        )
    )
    out = split_factoids(docs).to_pandas().sort_values(["doc_id", "fact_idx"])
    assert out[out.doc_id == 1]["fact"].tolist() == ["First fact.", "Second fact!", "Third?"]
    assert out[out.doc_id == 2]["fact"].tolist() == ["Single sentence only."]


def test_distill_combiner_semantics():
    # documents_distiller.py:96-173: lists extend, strings join, dicts update
    assert combine_distilled([[1, 2], [3]]) == [1, 2, 3]
    assert combine_distilled(["a", "b", ""]) == "a b"
    assert combine_distilled([{"x": 1}, {"y": 2}, {"x": 3}]) == {"x": 3, "y": 2}
    assert combine_distilled([None, "only"]) == "only"

    parts = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 1, 2],
                "skills": [["python"], ["ray"], ["sql"]],
                "summary": ["part one", "part two", "solo"],
            }
        )
    )
    out = distill(parts).to_pandas().sort_values("doc_id")
    assert out[out.doc_id == 1]["skills"].iloc[0] == ["python", "ray"]
    assert out[out.doc_id == 1]["summary"].iloc[0] == "part one part two"
    assert out[out.doc_id == 2]["skills"].iloc[0] == ["sql"]


def test_prompt_batching():
    p = assemble_prompt("ctx", "query")
    assert p == "# Context: ctx\n\n# Question: query\n\nAnswer: "
    contexts = [f"context number {i}" for i in range(100)]
    batches = split_request_batches(contexts, max_elements=40, max_tokens=8000)
    assert [len(b) for b in batches] == [40, 40, 20]
    assert [c for b in batches for c in b] == contexts  # order preserved
    # token budget splits before element budget when texts are long
    long = ["word " * 3000, "word " * 3000]
    assert len(split_request_batches(long, max_elements=40, max_tokens=4000)) == 2
    assert count_tokens("Hello, world!") == 4


def test_quintuple_quality_metric():
    emb = HashEmbedder(dim=32)
    gold = [
        {"subj": "john", "pred": "works_at", "obj": "google", "t_start": [1.0], "t_end": []},
        {"subj": "mary", "pred": "lives_in", "obj": "paris", "t_start": [], "t_end": []},
    ]
    perfect = quintuple_quality(gold, gold, emb.embed_texts)
    assert perfect["precision"] == 1.0 and perfect["recall"] == 1.0
    assert perfect["match_t"] == 1  # one non-empty matching temporal slot
    pred = [dict(gold[0], t_start=[]), {"subj": "x", "pred": "y", "obj": "z",
                                        "t_start": [9.0], "t_end": []}]
    partial = quintuple_quality(pred, gold, emb.embed_texts)
    assert partial["precision"] == 0.5 and partial["recall"] == 0.5
    assert partial["omitted_t"] == 1  # dropped the t_start


def test_merge_quality_metric():
    rng = np.random.default_rng(5)
    distinct = rng.standard_normal((10, 16))
    assert merge_quality(distinct, threshold=0.8)["residual_pairs"] == 0
    with_dup = np.vstack([distinct, distinct[0] + 0.01])
    assert merge_quality(with_dup, threshold=0.8)["residual_pairs"] == 1


def test_stability_metric():
    from kgray.eval import corpus_stability, quintuple_stability

    emb = HashEmbedder(dim=32)
    q = [
        {"subj": "john", "pred": "works_at", "obj": "google", "t_start": ["2020-01-01"], "t_end": []},
        {"subj": "mary", "pred": "lives_in", "obj": "paris", "t_start": [], "t_end": []},
    ]
    same = quintuple_stability(q, q, emb.embed_texts)
    assert same["similarity"] == 1.0 and same["comparison_type"] == "full_comparison"

    other = [{"subj": "zeta", "pred": "orbits", "obj": "star", "t_start": [], "t_end": []}]
    diff = quintuple_stability(q, other, emb.embed_texts)
    assert diff["similarity"] < 0.5  # hash embeddings: unrelated ≈ orthogonal

    assert quintuple_stability([], [], emb.embed_texts)["similarity"] == 1.0
    assert quintuple_stability(q, [], emb.embed_texts)["similarity"] == 0.0

    corpus = corpus_stability({"d1": q, "d2": []}, {"d1": q, "d2": []}, emb.embed_texts)
    assert corpus["mean_similarity"] == 1.0 and corpus["n_documents"] == 2


def test_cost_estimation():
    from kgray.eval import extraction_cost, price_tokens

    p = price_tokens("gpt-4.1", input_tokens=1_000_000, output_tokens=500_000)
    assert p["input_cost_usd"] == 2.0 and p["output_cost_usd"] == 4.0
    assert p["total_cost_usd"] == 6.0
    assert price_tokens("gpt-4.1", 1_000_000, 500_000, batch=True)["total_cost_usd"] == 3.0

    facts = ["alice works at acme.", "bob lives in lyon."]
    c = extraction_cost(facts, model="claude-sonnet-4", obs_date="2024-06-15")
    assert c["n_facts"] == 2 and c["output_estimated"]
    # every prompt includes the obs-date-anchored system query + few-shots
    assert c["input_tokens"] > 2 * 300
    with_outputs = extraction_cost(facts, outputs=['{"relationships": []}'] * 2)
    assert not with_outputs["output_estimated"]
    assert with_outputs["output_tokens"] < c["output_tokens"]
