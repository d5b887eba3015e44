"""Legacy iText2KG / iText2KG_Star pipeline shapes, Ray-Data-first.

The legacy generation extracts in two steps per chunk — entities first,
then relations constrained to those entities — with an invented-entity
correction and a bounded isolated-entity retry loop
(itext2kg/itext2kg_star/ientities_extraction/ientities_extractor.py:25-85,
irelations_extraction/irelations_extractor.py:29-216), then folds chunks
sequentially into a global KG.  This module reproduces the extraction
semantics as one actor/task stage per chunk (the per-chunk loops are local
and bounded) and reuses the ATOM-style distributed canonicalization for
the global fold — the order-free semantics ATOM introduced precisely
because the legacy sequential fold cannot scale (README.md:111-118).

Legacy knob differences (kept as config options here):
- entity embedding weights default 0.6 name / 0.4 label
  (itext2kg_star/itext2kg.py:43-44) vs ATOM's 0.8/0.2;
- the legacy matcher accepts strictly ``>`` threshold
  (itext2kg_star/graph_matching/matcher.py:40-41); ATOM uses ``>=``.
  Cosine exactly equal to the threshold is measure-zero, so the engine's
  ``>=`` path is shared (PARITY.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from kgray.config import PipelineConfig
from kgray.functions.normalize import normalize_label_py, normalize_name_py
from kgray.pipelines.kg import KGBuildResult, _nodes_from_mapping, normalize_quintuples
from kgray.stages.canonicalize import apply_resolution, resolve_vocabulary
from kgray.stages.chunk import assemble_chunks
from kgray.stages.extract import RAW_QUINTUPLE_SCHEMA, RuleExtractor
from kgray.stages.merge import merge_triples
from kgray.stages.timeparse import parse_quintuple_times


class TwoStepRuleExtractor:
    """Per-chunk two-step extraction with the legacy correction semantics.

    1. entity extraction over the chunk (rule-based stand-in for
       ientities_extractor.py:25-85);
    2. relation extraction; every endpoint is verified against the
       chunk's entity list: exact (name,label) hit is adopted, otherwise
       the endpoint embeds and maps to the best input entity when cosine
       ``>= correction_threshold`` (0.5, irelations_extractor.py:128), else
       the invented surface is kept (legacy find_match keeps obj1);
    3. isolated entities (no relationship after step 2) are re-prompted up
       to ``max_tries_isolated_entities`` times
       (irelations_extractor.py:163-216) — with a deterministic extractor
       the loop exits on the first no-progress round.
    """

    STATELESS = True

    def __init__(
        self,
        embedder_factory=None,
        correction_threshold: float = 0.5,
        max_tries_isolated_entities: int = 3,
        name_weight: float = 0.6,
        label_weight: float = 0.4,
        base_extractor_cls=RuleExtractor,
    ):
        self.base = base_extractor_cls()
        self.correction_threshold = correction_threshold
        self.max_tries = max_tries_isolated_entities
        self.name_weight = name_weight
        self.label_weight = label_weight
        self._embedder = None
        self._embedder_factory = embedder_factory

    # -- step 1: entities --------------------------------------------------
    def extract_entities(self, chunk_text: str) -> list[tuple[str, str]]:
        seen: dict = {}
        for line in chunk_text.split("\n"):
            hit = self.base._extract_line(line)
            if hit is None:
                continue
            s, sl, _pred, o, ol, _ts, _te = hit
            for name, label in ((s, sl), (o, ol)):
                key = (normalize_name_py(name), normalize_label_py(label))
                seen.setdefault(key, None)
        return list(seen)

    # -- step 2: relations + invented-entity correction --------------------
    def _correct(self, key: tuple[str, str], allowed: list[tuple[str, str]]):
        if key in allowed:
            return key
        if self._embedder is None and self._embedder_factory is not None:
            self._embedder = self._embedder_factory()
        if self._embedder is None or not allowed:
            return key  # no embedder → keep the invented surface
        from kgray.stages.embed import combine_entity_embeddings

        cand = allowed + [key]
        nv = self._embedder.embed_texts([k[0] for k in cand])
        lv = self._embedder.embed_texts([k[1] for k in cand])
        mat = combine_entity_embeddings(nv, lv, self.name_weight, self.label_weight)
        unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = unit[-1] @ unit[:-1].T
        j = int(np.argmax(sims))
        # legacy find_match keeps obj1 unless strictly above threshold
        # (itext2kg_star/graph_matching/matcher.py:40-41)
        return allowed[j] if sims[j] > self.correction_threshold else key

    def extract_relations(self, chunk_text: str, allowed: list[tuple[str, str]]):
        rels = []
        related: set = set()
        for line in chunk_text.split("\n"):
            hit = self.base._extract_line(line)
            if hit is None:
                continue
            s, sl, pred, o, ol, t_start, t_end = hit
            skey = self._correct((normalize_name_py(s), normalize_label_py(sl)), allowed)
            okey = self._correct((normalize_name_py(o), normalize_label_py(ol)), allowed)
            related.update((skey, okey))
            rels.append((skey, pred, okey, t_start, t_end, line))
        return rels, related

    def __call__(self, batch: dict) -> pa.Table:
        cols: dict[str, list] = {n: [] for n in RAW_QUINTUPLE_SCHEMA.names}
        for text, conv_id, chunk_idx, obs_date in zip(
            batch["text"], batch["conv_id"], batch["chunk_idx"], batch["obs_date"]
        ):
            text = str(text)
            entities = self.extract_entities(text)
            rels, related = self.extract_relations(text, entities)
            isolated = [e for e in entities if e not in related]
            tries = 0
            while isolated and tries < self.max_tries:
                extra, related_extra = self.extract_relations(text, isolated)
                new = [r for r in extra if r not in rels]
                if not new:
                    break  # deterministic extractor: no progress
                rels.extend(new)
                related |= related_extra
                isolated = [e for e in entities if e not in related]
                tries += 1
            for fact_idx, (skey, pred, okey, t_start, t_end, line) in enumerate(rels):
                cols["subj_name"].append(skey[0])
                cols["subj_label"].append(skey[1])
                cols["pred"].append(pred)
                cols["obj_name"].append(okey[0])
                cols["obj_label"].append(okey[1])
                cols["t_start"].append(t_start)
                cols["t_end"].append(t_end)
                cols["atomic_fact"].append(line)
                cols["obs_date"].append(str(obs_date))
                cols["conv_id"].append(str(conv_id))
                cols["chunk_idx"].append(int(chunk_idx))
                cols["fact_idx"].append(fact_idx)
                cols["sort_key"].append(
                    f"{obs_date}|{conv_id}|{int(chunk_idx):05d}|{fact_idx:05d}"
                )
        return pa.table(
            {n: pa.array(cols[n], type=RAW_QUINTUPLE_SCHEMA.field(n).type) for n in RAW_QUINTUPLE_SCHEMA.names}
        )


def build_kg_legacy(
    transcripts: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    embedder_factory=None,
    base_extractor_cls=RuleExtractor,
) -> KGBuildResult:
    """Legacy two-step pipeline end to end: two-step per-chunk extraction
    (legacy 0.6/0.4 weights for correction), then the shared distributed
    canonicalization and triple merge."""
    cfg = cfg or PipelineConfig(
        entity_name_weight=0.6, entity_label_weight=0.4
    )
    if embedder_factory is None:
        from kgray.stages.embed import HashEmbedder

        embedder_factory = lambda: HashEmbedder(dim=cfg.embed_dim)

    chunks = assemble_chunks(transcripts, cfg.max_chunk_chars)
    extractor = TwoStepRuleExtractor(
        embedder_factory=embedder_factory,
        name_weight=cfg.entity_name_weight,
        label_weight=cfg.entity_label_weight,
        base_extractor_cls=base_extractor_cls,
    )
    raw = chunks.map_batches(extractor, batch_format="numpy", batch_size=cfg.extract_batch_size)
    quintuples = (
        raw.map_batches(normalize_quintuples, batch_format="pyarrow")
        .map_batches(parse_quintuple_times, batch_format="pyarrow")
        .materialize()
    )
    ent_map, pred_map = resolve_vocabulary(quintuples, cfg, embedder_factory)
    edges = merge_triples(apply_resolution(quintuples, ent_map, pred_map))
    return KGBuildResult(
        nodes=_nodes_from_mapping(ent_map), edges=edges, ent_map=ent_map, pred_map=pred_map
    )
