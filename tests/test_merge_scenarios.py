"""Focused merge-semantics scenarios (FIXTURES.md §6), mirroring the
reference's unit tests (tests/atom/test_atom_matching.py) with hand-built
transcripts and a controlled concept table."""

import pandas as pd
import pytest
import ray.data
from dateutil import parser as dp

from kgray.config import PipelineConfig
from kgray.pipelines.kg import build_kg
from kgray.stages.embed import HashEmbedder

CFG = PipelineConfig(extract_concurrency=2)

# controlled embedding space: variants share a concept, labels disambiguated
CONCEPTS = {
    "john doe": "person:jd", "j. doe": "person:jd",
    "google": "org:g", "google inc": "org:g",
    "works_at": "pred:work", "is_employed_at": "pred:work",
}


def _ds(rows):
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    return ray.data.from_pandas(df)


def _build(rows):
    return build_kg(
        _ds(rows), cfg=CFG,
        embedder_factory=lambda: HashEmbedder(dim=CFG.embed_dim, concepts=CONCEPTS),
    ).edges.to_pandas()


def test_same_triple_two_dates_merges_time_lists():
    # scenario 1 (reference :307-353): one edge, both t_obs, both facts
    edges = _build([
        ("c1", 0, "user", "John Doe is a engineer at Google on 2021-01-05.", "", "2021-01-01 10:00"),
        ("c2", 0, "user", "John Doe is a engineer at Google on 2021-01-05.", "", "2021-02-01 10:00"),
    ])
    assert len(edges) == 1
    e = edges.iloc[0]
    assert set(e["t_obs"]) == {dp.parse("2021-01-01").timestamp(), dp.parse("2021-02-01").timestamp()}
    assert len(e["atomic_facts"]) == 2 and e["n_obs"] == 2


def test_start_and_end_facts_merge_into_interval():
    # scenario 2 (reference :428-538; README.md:92-98): end-validity fact
    # keeps the affirmative predicate, contributes only t_end
    edges = _build([
        ("c1", 0, "user", "John Doe is a engineer at Google on 2021-01-05.", "", "2021-01-01 10:00"),
        ("c2", 0, "user", "John Doe is no longer a engineer at Google on 2022-06-30.", "", "2022-07-01 10:00"),
    ])
    assert len(edges) == 1
    e = edges.iloc[0]
    assert e["pred"] == "works_at"
    assert e["t_start"] == [dp.parse("2021-01-05").timestamp()]
    assert e["t_end"] == [dp.parse("2022-06-30").timestamp()]


def test_exact_duplicates_across_conversations_single_node():
    # scenario 3: exact (name,label) duplicates → one node
    edges = _build([
        ("c1", 0, "user", "John Doe lives in Paris.", "", "2021-01-01 10:00"),
        ("c2", 0, "user", "JOHN DOE lives in Paris.", "", "2021-01-02 10:00"),
    ])
    assert len(edges) == 1 and edges.iloc[0]["subj_name"] == "john doe"


def test_near_duplicate_surfaces_merge_distinct_labels_dont():
    # scenario 4: variant above θ_E merges; unrelated concept stays apart
    edges = _build([
        ("c1", 0, "user", "John Doe lives in Paris.", "", "2021-01-01 10:00"),
        ("c2", 0, "user", "J. Doe lives in Paris.", "", "2021-01-02 10:00"),
        ("c3", 0, "user", "Alice Smith lives in Paris.", "", "2021-01-03 10:00"),
    ])
    assert len(edges) == 2  # john-doe cluster merged; alice separate
    assert set(edges["subj_name"]) == {"john doe", "alice smith"}
    merged = edges[edges.subj_name == "john doe"].iloc[0]
    assert merged["n_obs"] == 2


def test_predicate_variants_rename_to_canonical():
    # scenario 5: predicate above θ_R renamed; endpoints untouched
    edges = _build([
        ("c1", 0, "user", "John Doe is a engineer at Google on 2021-01-05.", "", "2021-01-01 10:00"),
        ("c2", 0, "user", "J. Doe is employed as a engineer at Google Inc on 2021-03-01.", "", "2021-02-01 10:00"),
    ])
    assert len(edges) == 1
    e = edges.iloc[0]
    assert e["pred"] == "works_at"  # earliest surface wins
    assert sorted(e["t_start"]) == sorted(
        [dp.parse("2021-01-05").timestamp(), dp.parse("2021-03-01").timestamp()]
    )


def test_invalid_dates_skipped_without_failure():
    # scenario 6 (reference :589-607)
    edges = _build([
        ("c1", 0, "user", "John Doe is a engineer at Google on an-unknown-date.", "", "2021-01-01 10:00"),
    ])
    assert len(edges) == 1
    assert len(edges.iloc[0]["t_start"]) == 0
    assert len(edges.iloc[0]["t_obs"]) == 1  # obs date still stamped


def test_empty_extractions_filtered():
    # scenario 7 (atom.py:186)
    edges = _build([
        ("c1", 0, "user", "The weather is nice today.", "", "2021-01-01 10:00"),
        ("c1", 1, "tool", "", "search", "2021-01-01 10:01"),
    ])
    assert len(edges) == 0


def test_shuffled_turn_idx_identical_output():
    # scenario 9: shuffled rows on disk → identical output
    rows = [
        ("c1", 1, "assistant", "John Doe lives in Paris.", "", "2021-01-01 10:01"),
        ("c1", 0, "user", "John Doe is a engineer at Google on 2021-01-05.", "", "2021-01-01 10:00"),
        ("c1", 2, "tool", "J. Doe is the CEO of Google on 2021-06-01.", "", "2021-01-01 10:02"),
    ]
    shuffled = _build(rows)
    ordered = _build(sorted(rows, key=lambda r: r[1]))
    key = ["subj_name", "pred", "obj_name"]
    a = shuffled.sort_values(key).reset_index(drop=True)
    b = ordered.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
    assert a["atomic_facts"].map(tuple).equals(b["atomic_facts"].map(tuple))
