"""Reference-semantics oracle (parity target for the Ray engine).

A deterministic, driver-local reimplementation of the reference's matching
and merging pipeline — NOT used by the engine, only by tests to define
ground truth (SURVEY.md §7.1 step 10):

- Atom.build_graph per observation date: atomic KG per fact, pairwise tree
  merge (itext2kg/atom/atom.py:55-84,155-209) with the reference's pair
  structure ((0,1),(2,3)…, leftover appended after the merged pairs) run
  sequentially (the reference's as_completed thread ordering is
  nondeterministic; list order is one of its legal schedules);
- GraphMatcher semantics exactly (atom/graph_matching/matcher.py): exact
  (name,label) pass then cosine argmax with ``>= threshold`` acceptance,
  matched-e2 exclusion, predicate rename without re-embedding, triple merge
  extending time/fact lists, endpoint remap via the old→new entity mapping;
- t_obs stamped once per date after the per-date merge (atom.py:193-194);
- per-date KGs merged pairwise in date order (atom.py:220-234);
- finally, duplicate (s,p,o) rows are collapsed by concatenating their
  lists — the fixed point the reference's Neo4j sink reaches anyway, since
  it MERGEs on name+endpoints (graph_integration/neo4j_storage.py:155-265).

Entity/predicate normalization and embedding are shared with the engine
(identical by construction, as the reference shares them across its
modules).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from kgray.functions.normalize import normalize_label_py, normalize_name_py, normalize_predicate_py
from kgray.functions.timeparse import TimestampParser


@dataclass
class ORel:
    pred: str
    s: tuple  # (name, label)
    o: tuple
    vec: np.ndarray  # predicate embedding, fixed at build time (stale after rename, like the reference)
    t_obs: list = field(default_factory=list)
    t_start: list = field(default_factory=list)
    t_end: list = field(default_factory=list)
    facts: list = field(default_factory=list)

    def key(self) -> tuple:
        return (self.pred, self.s, self.o)


@dataclass
class OKG:
    entities: list  # list of (name, label) keys, order preserved, deduped
    rels: list  # list[ORel]


def _cos_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    an = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    bn = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    return an @ bn.T


class ReferenceOracle:
    def __init__(self, embedder, name_weight: float = 0.8, label_weight: float = 0.2,
                 ent_threshold: float = 0.8, rel_threshold: float = 0.7):
        self.embedder = embedder
        self.name_weight = name_weight
        self.label_weight = label_weight
        self.ent_threshold = ent_threshold
        self.rel_threshold = rel_threshold
        self._evec: dict[tuple, np.ndarray] = {}
        self._pvec: dict[str, np.ndarray] = {}
        self._parser = TimestampParser()

    # --- embeddings (knowledge_graph.py:29-53) --------------------------
    def entity_vec(self, key: tuple) -> np.ndarray:
        v = self._evec.get(key)
        if v is None:
            nv = self.embedder.embed_texts([key[0]])[0]
            lv = self.embedder.embed_texts([key[1]])[0]
            v = self.name_weight * nv + self.label_weight * lv
            self._evec[key] = v
        return v

    def pred_vec(self, pred: str) -> np.ndarray:
        v = self._pvec.get(pred)
        if v is None:
            v = self.embedder.embed_texts([pred])[0]
            self._pvec[pred] = v
        return v

    # --- matcher.py:19-103 ----------------------------------------------
    def _batch_match_entities(self, e1: list, e2: list, threshold: float):
        matched = [None] * len(e1)
        to_match = []
        e2_set = set(e2)
        for i, k in enumerate(e1):
            if k in e2_set:
                matched[i] = k
            else:
                to_match.append((i, k))
        already = {k for k in e2 if k in {m for m in matched if m is not None}}
        unmatched_e2 = [k for k in e2 if k not in already]
        if to_match and unmatched_e2:
            m1 = np.vstack([self.entity_vec(k) for _, k in to_match])
            m2 = np.vstack([self.entity_vec(k) for k in unmatched_e2])
            sim = _cos_matrix(m1, m2)
            best = sim.argmax(axis=1)
            score = sim.max(axis=1)
            for r, (i, k) in enumerate(to_match):
                matched[i] = unmatched_e2[int(best[r])] if score[r] >= threshold else k
        else:
            for i, k in to_match:
                matched[i] = k
        combined = list(dict.fromkeys(matched + e2))
        return matched, combined

    def _batch_match_relationships(self, r1: list, r2: list, threshold: float):
        if not r1:
            return [], r2
        if not r2:
            return r1, r1
        m1 = np.vstack([r.vec for r in r1])
        m2 = np.vstack([r.vec for r in r2])
        sim = _cos_matrix(m1, m2)
        best = sim.argmax(axis=1)
        score = sim.max(axis=1)
        to_remove = []
        # rels2 lookup dict: later duplicates overwrite earlier, as in
        # get_relationship (knowledge_graph.py:62-67)
        for i, rel1 in enumerate(r1):
            if score[i] >= threshold:
                rel1.pred = r2[int(best[i])].pred  # rename; embedding NOT recomputed
            lookup = {r.key(): r for r in r2}
            hit = lookup.get(rel1.key())
            if hit is not None:
                hit.t_obs.extend(rel1.t_obs)
                hit.t_start.extend(rel1.t_start)
                hit.t_end.extend(rel1.t_end)
                hit.facts.extend(rel1.facts)
                to_remove.append(rel1)
        for rel in to_remove:
            r1.remove(rel)
        return r1, r1 + r2

    def match_and_update(self, e1, e2, r1, r2):
        matched_e1, global_entities = self._batch_match_entities(
            list(e1), list(e2), self.ent_threshold
        )
        matched_r1, _ = self._batch_match_relationships(list(r1), list(r2), self.rel_threshold)
        mapping = {old: new for old, new in zip(e1, matched_e1) if old != new}
        updated = []
        for rel in matched_r1:
            s = mapping.get(rel.s, rel.s)
            o = mapping.get(rel.o, rel.o)
            updated.append(ORel(pred=rel.pred, s=s, o=o, vec=rel.vec, t_obs=rel.t_obs,
                                t_start=rel.t_start, t_end=rel.t_end, facts=rel.facts))
        return global_entities, r2 + updated

    def merge_two_kgs(self, kg1: OKG, kg2: OKG) -> OKG:
        """atom.py:41-54 — kg1 is the accumulated/'global' side (entities_2)."""
        entities, rels = self.match_and_update(
            e1=kg2.entities, e2=kg1.entities, r1=kg2.rels, r2=kg1.rels
        )
        return OKG(entities=entities, rels=rels)

    def parallel_atomic_merge(self, kgs: list) -> OKG:
        """atom.py:55-84 with deterministic in-order pair completion."""
        current = kgs
        while len(current) > 1:
            merged = [
                self.merge_two_kgs(current[i], current[i + 1])
                for i in range(0, len(current) - 1, 2)
            ]
            if len(current) % 2 == 1:
                merged.append(current[-1])
            current = merged
        return current[0] if current else OKG(entities=[], rels=[])

    # --- atom.py:86-209 --------------------------------------------------
    def build_atomic_kg(self, row: dict) -> OKG:
        s = (normalize_name_py(row["subj_name"]), normalize_label_py(row["subj_label"]))
        o = (normalize_name_py(row["obj_name"]), normalize_label_py(row["obj_label"]))
        pred = normalize_predicate_py(row["pred"])
        rel = ORel(
            pred=pred, s=s, o=o, vec=self.pred_vec(pred),
            t_start=self._parser.parse_list(row.get("t_start") or []),
            t_end=self._parser.parse_list(row.get("t_end") or []),
            facts=[row["atomic_fact"]],
        )
        return OKG(entities=list(dict.fromkeys([s, o])), rels=[rel])

    def build_graph_for_date(self, rows: list[dict]) -> OKG:
        atomic = [self.build_atomic_kg(r) for r in rows]
        atomic = [kg for kg in atomic if kg.rels]
        if not atomic:
            return OKG(entities=[], rels=[])
        merged = self.parallel_atomic_merge(atomic)
        t_obs = self._parser.parse_list([rows[0]["obs_date"]])
        for rel in merged.rels:
            rel.t_obs.extend(t_obs)
        return merged

    def build(self, quintuple_rows: list[dict]) -> dict:
        """quintuple rows (surface forms, date strings) → final triples.

        Returns {(s_name, s_label, pred, o_name, o_label) →
        {"t_obs","t_start","t_end","facts"}} after collapsing duplicate
        triples (the Neo4j-MERGE fixed point).
        """
        rows = sorted(quintuple_rows, key=lambda r: r["sort_key"])
        by_date: dict[str, list] = {}
        for r in rows:
            by_date.setdefault(r["obs_date"], []).append(r)
        kgs = [self.build_graph_for_date(by_date[d]) for d in sorted(by_date)]
        kgs = [kg for kg in kgs if kg.rels or kg.entities]
        final = self.parallel_atomic_merge(kgs) if kgs else OKG(entities=[], rels=[])

        triples: dict[tuple, dict] = {}
        for rel in final.rels:
            key = (rel.s[0], rel.s[1], rel.pred, rel.o[0], rel.o[1])
            agg = triples.setdefault(
                key, {"t_obs": [], "t_start": [], "t_end": [], "facts": []}
            )
            agg["t_obs"].extend(rel.t_obs)
            agg["t_start"].extend(rel.t_start)
            agg["t_end"].extend(rel.t_end)
            agg["facts"].extend(rel.facts)
        return triples


def precision_recall(engine_keys: set, oracle_keys: set) -> tuple[float, float]:
    if not engine_keys and not oracle_keys:
        return 1.0, 1.0
    tp = len(engine_keys & oracle_keys)
    p = tp / len(engine_keys) if engine_keys else 0.0
    r = tp / len(oracle_keys) if oracle_keys else 0.0
    return p, r
