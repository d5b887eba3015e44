"""Pipeline configuration.

Default thresholds / weights mirror the reference ATOM defaults:
- ent_threshold=0.8, rel_threshold=0.7  (itext2kg/atom/atom.py:159-160)
- entity name/label embedding weights 0.8/0.2 (atom.py:161-162)
Cosine acceptance is `>=` threshold (atom/graph_matching/matcher.py:80,145).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PipelineConfig:
    # --- matching semantics (reference parity knobs) ---
    ent_threshold: float = 0.8
    rel_threshold: float = 0.7
    entity_name_weight: float = 0.8
    entity_label_weight: float = 0.2

    # --- chunking ---
    # reference found chunks < ~400 tokens optimal (README.md:79); we chunk
    # by characters (~4 chars/token).
    max_chunk_chars: int = 1600

    # --- embedding ---
    embed_dim: int = 64

    # --- scale knobs ---
    extract_batch_size: int = 256
    embed_batch_size: int = 4096
    # actor pool size for stateful stages; None → let Ray autoscale tasks.
    extract_concurrency: int | None = None
    # entity-match strategy ladder (all reproduce the same >=threshold
    # argmax semantics):
    # - N <= driver_match_max_entities: embed+match driver-side in one
    #   numpy pass (the distinct set is already collapsed; no actor-pool
    #   spin-up for tiny vocabularies)
    # - N <= broadcast_match_max_entities: actor-pool blocks vs a
    #   broadcast candidate matrix (exactly the reference's candidate set,
    #   parallelized over blocks)
    # - beyond: LSH bucketing bounds the candidate sets (scale path).
    driver_match_max_entities: int = 20_000
    broadcast_match_max_entities: int = 200_000
    # LSH (random-hyperplane band) parameters for the scale path.  24
    # bands x 8 bits → per-pair miss ~(1-p^8)^24 ≈ 5e-6 at the ~0.94
    # variant cosine the thresholds are calibrated for.
    lsh_n_bands: int = 24
    lsh_band_bits: int = 8
    # match-edge sets above this stay distributed: representatives are
    # computed by iterative min-label propagation
    # (kgray/state/unionfind.py:46) instead of driver union-find.
    driver_edge_max: int = 2_000_000
    # vocabularies above this never build a driver-resident identity map:
    # resolution returns only the NON-identity entries (surfaces that merge
    # onto another canonical — proportional to the duplicate rate, not the
    # vocabulary) and the node table is derived from the edge stream
    # (kgray/pipelines/kg.py::nodes_from_edges).  This is the 10^8-entity
    # path: driver state stays O(merged), the rest stays a Dataset.
    identity_map_max_entities: int = 2_000_000

    # --- lineage / checkpointing ---
    num_partitions: int = 16

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = PipelineConfig()
