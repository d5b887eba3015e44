"""End-to-end KG construction pipeline (the engine's flagship).

Ray-Data-first restructuring of Atom.build_graph_from_different_obs_times
(itext2kg/atom/atom.py:211-234 → :155-209):

    read transcripts (Parquet)
      → groupby(conv_id) + in-group turn sort → chunks          [1 shuffle]
      → map_batches(Extractor actor pool)     → raw quintuples  [streaming]
      → map_batches(normalize, zero-copy Arrow)                 [streaming]
      → map_batches(parse timestamps)                           [streaming]
      → distinct-entity groupby → embed → broadcast cosine match
        → union-find → resolution maps                          [1 shuffle, small]
      → map_batches(apply resolution, broadcast dicts)          [streaming]
      → groupby(subj_id, pred, obj_id) → list-concat merge      [1 shuffle]
      → nodes + edges (Neo4j-compatible Parquet)

No driver-resident graph: the only driver-side state is the distinct
entity/predicate tables (already collapsed by groupby) and the match-edge
union-find.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
import pyarrow as pa
import ray.data

from kgray.config import DEFAULT_CONFIG, PipelineConfig
from kgray.functions import normalize as nz
from kgray.stages.canonicalize import apply_resolution, resolve_entities, resolve_predicates
from kgray.stages.chunk import assemble_chunks
from kgray.stages.extract import RuleExtractor
from kgray.stages.merge import merge_triples
from kgray.stages.timeparse import parse_quintuple_times


def normalize_quintuples(batch: pa.Table) -> pa.Table:
    """Vectorized normalization of names/labels/predicates
    (entity.py:30-38, relationship.py:34-36) — pyarrow.compute, zero copy in."""
    return (
        batch.set_column(batch.schema.get_field_index("subj_name"), "subj_name", nz.normalize_name(batch["subj_name"]))
        .set_column(batch.schema.get_field_index("subj_label"), "subj_label", nz.normalize_label(batch["subj_label"]))
        .set_column(batch.schema.get_field_index("obj_name"), "obj_name", nz.normalize_name(batch["obj_name"]))
        .set_column(batch.schema.get_field_index("obj_label"), "obj_label", nz.normalize_label(batch["obj_label"]))
        .set_column(batch.schema.get_field_index("pred"), "pred", nz.normalize_predicate(batch["pred"]))
    )


@dataclass
class KGBuildResult:
    nodes: ray.data.Dataset
    edges: ray.data.Dataset
    ent_map: dict
    pred_map: dict


def extract_quintuples(
    transcripts: ray.data.Dataset | None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    extractor_cls=RuleExtractor,
    extractor_kwargs: dict | None = None,
    chunks: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """transcripts → normalized, time-parsed quintuple rows.

    ``chunks``: pre-assembled (conv_id, chunk_idx, text, obs_ts, obs_date)
    rows — skips the conversation-assembly shuffle when the source already
    co-located and chunked conversations (e.g.
    kgray.sources.events_transcripts.chunks_from_events)."""
    if chunks is None:
        chunks = assemble_chunks(transcripts, cfg.max_chunk_chars)
    if getattr(extractor_cls, "STATELESS", False):
        # trivial-state extractor → plain tasks (one cached instance per
        # worker process); no actor pool to spawn or size
        kwargs = extractor_kwargs or {}
        cache: dict = {}

        def extract_fn(batch):
            ext = cache.get("x")
            if ext is None:
                ext = cache["x"] = extractor_cls(**kwargs)
            return ext(batch)

        raw = chunks.map_batches(
            extract_fn, batch_format="numpy", batch_size=cfg.extract_batch_size
        )
    else:
        raw = chunks.map_batches(
            extractor_cls,
            fn_constructor_kwargs=extractor_kwargs or {},
            batch_format="numpy",
            batch_size=cfg.extract_batch_size,
            # autoscaling pool: tiny inputs spawn one actor, big inputs
            # grow to the configured ceiling
            concurrency=(1, cfg.extract_concurrency or 4),
        )
    normalized = raw.map_batches(normalize_quintuples, batch_format="pyarrow")
    return normalized.map_batches(parse_quintuple_times, batch_format="pyarrow")


_CANON_COLS = [
    "subj_id", "subj_name", "subj_label", "pred", "obj_id", "obj_name", "obj_label",
    "t_obs", "t_start", "t_end", "atomic_facts", "obs_date", "sort_key",
]


def build_kg(
    transcripts: ray.data.Dataset | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    embedder_factory=None,
    extractor_cls=RuleExtractor,
    extractor_kwargs: dict | None = None,
    existing_store: str | None = None,
    chunks: ray.data.Dataset | None = None,
    quintuples: ray.data.Dataset | None = None,
) -> KGBuildResult:
    """Fresh or incremental KG build.

    ``existing_store``: directory written by :func:`save_kg_store` on a
    previous run — its canonical entities/predicates seed the resolution
    candidate sets (existing canonicals always win, mirroring the
    reference's existing-KG merge, atom.py:196-208) and its edges re-enter
    the triple merge so time/provenance lists extend.

    ``quintuples``: an already-extracted (e.g. checkpointed) normalized
    quintuple stream — skips extraction entirely; this is the resume path
    ``python -m kgray --checkpoint-dir`` uses.
    """
    if embedder_factory is None:
        from kgray.stages.embed import HashEmbedder

        embedder_factory = lambda: HashEmbedder(dim=cfg.embed_dim)

    store = None
    if existing_store is not None:
        from kgray.state.store import load_store

        store = load_store(existing_store)

    if quintuples is None:
        quintuples = extract_quintuples(
            transcripts, cfg, extractor_cls, extractor_kwargs, chunks=chunks
        )
    # The quintuple stream feeds three consumers (entity resolution,
    # predicate resolution, final rewrite); materialize once — it is the
    # collapsed fact stream, orders of magnitude smaller than the input,
    # and Ray spills blocks if it outgrows the object store.
    quintuples = quintuples.materialize()

    from kgray.stages.canonicalize import resolve_vocabulary

    ent_map, pred_map = resolve_vocabulary(
        quintuples, cfg, embedder_factory,
        existing_entities=store.entities if store else None,
        existing_predicates=store.predicates if store else None,
    )

    canon = apply_resolution(quintuples, ent_map, pred_map)
    if store is not None and store.edges is not None:
        import numpy as np

        from kgray.state.store import edges_as_canon_rows

        old_canon = apply_resolution(edges_as_canon_rows(store.edges), ent_map, pred_map)

        # fresh quintuples carry one observation each; stored edges carry
        # their accumulated n_obs — the merge sums the column, so counts
        # survive the store round-trip instead of resetting to 1
        def one_obs(t: pa.Table) -> pa.Table:
            return t.append_column(
                "n_obs", pa.array(np.ones(len(t), dtype=np.int64))
            )

        cols = _CANON_COLS + ["n_obs"]
        canon = (
            canon.map_batches(one_obs, batch_format="pyarrow")
            .select_columns(cols)
            .union(old_canon.select_columns(cols))
        )
    edges = merge_triples(canon)

    if getattr(ent_map, "identity_omitted", False):
        # compact-map path (vocabulary beyond driver RAM): the node table is
        # derived from the merged edge stream — materialize edges once so
        # the merge doesn't execute twice (once per consumer)
        edges = edges.materialize()
        nodes = nodes_from_edges(edges)
    else:
        nodes = _nodes_from_mapping(ent_map)
    return KGBuildResult(nodes=nodes, edges=edges, ent_map=ent_map, pred_map=pred_map)


def save_kg_store(result: KGBuildResult, store_dir: str) -> None:
    """Persist the canonical state for the next incremental run."""
    from kgray.state.store import save_store

    save_store(result.edges, store_dir)


def _nodes_from_mapping(ent_map: dict) -> ray.data.Dataset:
    """Canonical nodes table from the resolution map (driver-side: the map
    is the already-collapsed distinct-entity set)."""
    seen = {}
    for (_, _), (cn, cl, cid) in ent_map.items():
        seen[cid] = (cn, cl)
    if not seen:
        return ray.data.from_pandas(
            pd.DataFrame({"entity_id": [], "name": [], "label": [], "neo4j_label": []})
        )
    df = pd.DataFrame(
        {
            "entity_id": list(seen.keys()),
            "name": [v[0] for v in seen.values()],
            "label": [v[1] for v in seen.values()],
        }
    ).sort_values("entity_id", kind="mergesort")
    lab = nz.sanitize_neo4j_labels(pa.array(df["label"].tolist(), type=pa.string()))
    df["neo4j_label"] = lab.to_pylist()
    return ray.data.from_pandas(df.reset_index(drop=True))


def nodes_from_edges(edges: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Distributed alternative to :func:`_nodes_from_mapping` for canonical
    vocabularies beyond driver RAM: the node table is the distinct set of
    canonical endpoints in the edge stream (in a fresh build every
    canonical entity appears in ≥1 edge; equivalence pinned by
    tests/test_pipeline.py::test_nodes_from_edges_matches_mapping).

    Zero-copy Arrow partial per block → bucketed shuffle of the (small)
    distinct rows → per-bucket dedup — the same pre-aggregated shape as
    the vocabulary distinct."""

    def partial(t: pa.Table) -> pa.Table:
        both = pa.concat_tables(
            [
                pa.table(
                    {"entity_id": t["subj_id"], "name": t["subj_name"], "label": t["subj_label"]}
                ),
                pa.table(
                    {"entity_id": t["obj_id"], "name": t["obj_name"], "label": t["obj_label"]}
                ),
            ]
        )
        return both.group_by(["entity_id", "name", "label"]).aggregate([])

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (
            pd.util.hash_array(b["entity_id"].to_numpy(dtype=object)) % num_buckets
        ).astype("int32")
        return b

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(subset=["entity_id"])[["entity_id", "name", "label"]]
        lab = nz.sanitize_neo4j_labels(pa.array(out["label"].tolist(), type=pa.string()))
        out = out.assign(neo4j_label=lab.to_pylist())
        return out

    return (
        edges.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )


def write_kg(result: KGBuildResult, out_dir: str) -> None:
    """Materialize nodes + edges as Neo4j-compatible partitioned Parquet
    (the engine's equivalent of Neo4jStorage.visualize_graph,
    neo4j_storage.py:155-265, with sanitized labels/types :267-321)."""

    def finalize_edges(batch: pa.Table) -> pa.Table:
        neo = nz.sanitize_neo4j_rel_types(
            pa.array(batch["pred"].to_pylist(), type=pa.string())
        )
        return batch.append_column("neo4j_type", neo)

    edges = result.edges.map_batches(finalize_edges, batch_format="pyarrow")
    edges.write_parquet(f"{out_dir}/edges")
    result.nodes.write_parquet(f"{out_dir}/nodes")
