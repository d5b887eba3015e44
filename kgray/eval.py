"""Quality-evaluation metrics, mirroring the reference's eval scripts.

- :func:`quintuple_quality`: greedy 1-1 maximum-similarity matching of
  predicted vs gold quintuples above a threshold → precision/recall/F1
  (evaluation/quintuples_quality/calculate_quintuples_quality.py:150-260);
  temporal slots classified MATCH_t / OMITTED_t / HALLUCINATED_t.
- :func:`merge_quality`: residual-similar-pair counting — after a merge,
  how many entity (resp. relation) pairs remain with cosine above the
  calibration threshold (evaluation/merge/evaluate_atom_merge.py:305-388).
  A perfect merge leaves none.

Driver-side numpy over materialized small tables (these are metrics over
canonical vocabularies, not corpus-scale scans).
"""

from __future__ import annotations

import numpy as np


def _greedy_match(sim: np.ndarray, threshold: float) -> list[tuple[int, int]]:
    """Greedy 1-1 matching: repeatedly take the best remaining pair above
    threshold (calculate_quintuples_quality.py greedy strategy)."""
    sim = sim.copy()
    pairs = []
    while sim.size:
        i, j = np.unravel_index(np.argmax(sim), sim.shape)
        if sim[i, j] < threshold:
            break
        pairs.append((int(i), int(j)))
        sim[i, :] = -np.inf
        sim[:, j] = -np.inf
    return pairs


def quintuple_quality(
    predicted: list[dict],
    gold: list[dict],
    embed_texts,
    threshold: float = 0.8,
) -> dict:
    """predicted/gold rows: {subj, pred, obj, t_start: list, t_end: list}.

    Semantic similarity of a quintuple = cosine of the embedded
    's pred o' strings; matched pairs then classify each temporal slot:
    equal sets → MATCH_t, gold-only → OMITTED_t, predicted-only →
    HALLUCINATED_t.
    """
    if not predicted or not gold:
        return {
            "precision": 1.0 if not predicted and not gold else 0.0,
            "recall": 1.0 if not gold and not predicted else 0.0,
            "f1": 0.0, "match_t": 0, "omitted_t": 0, "hallucinated_t": 0,
        }

    def text(r):
        return f"{r['subj']} {r['pred']} {r['obj']}"

    pv = np.asarray(embed_texts([text(r) for r in predicted]), dtype=np.float64)
    gv = np.asarray(embed_texts([text(r) for r in gold]), dtype=np.float64)
    pu = pv / np.maximum(np.linalg.norm(pv, axis=1, keepdims=True), 1e-12)
    gu = gv / np.maximum(np.linalg.norm(gv, axis=1, keepdims=True), 1e-12)
    pairs = _greedy_match(pu @ gu.T, threshold)

    tp = len(pairs)
    precision = tp / len(predicted)
    recall = tp / len(gold)
    f1 = 2 * precision * recall / (precision + recall) if tp else 0.0

    match_t = omitted_t = hallucinated_t = 0
    for i, j in pairs:
        for slot in ("t_start", "t_end"):
            p_set = set(predicted[i].get(slot) or [])
            g_set = set(gold[j].get(slot) or [])
            if p_set == g_set and g_set:
                match_t += 1
            elif g_set - p_set:
                omitted_t += 1
            if p_set - g_set:
                hallucinated_t += 1
    return {
        "precision": round(precision, 6), "recall": round(recall, 6),
        "f1": round(f1, 6), "match_t": match_t, "omitted_t": omitted_t,
        "hallucinated_t": hallucinated_t,
    }


def merge_quality(vectors: np.ndarray, threshold: float = 0.8) -> dict:
    """Residual similar pairs among canonical vectors: pairs with cosine
    above threshold that survived the merge (evaluate_atom_merge.py:305-388
    counts these as merge misses)."""
    if len(vectors) < 2:
        return {"residual_pairs": 0, "n": int(len(vectors))}
    v = np.asarray(vectors, dtype=np.float64)
    u = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    sims = u @ u.T
    iu = np.triu_indices(len(u), k=1)
    return {
        "residual_pairs": int((sims[iu] >= threshold).sum()),
        "n": int(len(u)),
    }
