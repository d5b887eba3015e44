"""Quality-evaluation metrics, mirroring the reference's eval scripts.

- :func:`quintuple_quality`: greedy 1-1 maximum-similarity matching of
  predicted vs gold quintuples above a threshold → precision/recall/F1
  (evaluation/quintuples_quality/calculate_quintuples_quality.py:150-260);
  temporal slots classified MATCH_t / OMITTED_t / HALLUCINATED_t.
- :func:`merge_quality`: residual-similar-pair counting — after a merge,
  how many entity (resp. relation) pairs remain with cosine above the
  calibration threshold (evaluation/merge/evaluate_atom_merge.py:305-388).
  A perfect merge leaves none.
- :func:`quintuple_stability` / :func:`corpus_stability`: run-to-run
  extraction stability via embedded-quintuple cosine
  (evaluation/stability/calculate_stability.py:84-117, 197-261).
- :func:`price_tokens` / :func:`extraction_cost`: token-cost estimation for
  the factoid vs direct extraction scenarios
  (evaluation/costs/cost_estimation.py:32-76, 190-199).

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


def format_quintuple_text(q: dict) -> str:
    """'{subj} {pred} {obj} {t_start}-{t_end}' — the embedding text the
    stability eval compares (calculate_stability.py:84-117)."""
    parts = f"{q.get('subj', '')} {q.get('pred', '')} {q.get('obj', '')}".strip()
    ts = ",".join(q.get("t_start") or [])
    te = ",".join(q.get("t_end") or [])
    return f"{parts} {ts}-{te}" if (ts or te) else parts


def quintuple_stability(run1: list[dict], run2: list[dict], embed_texts) -> dict:
    """Run-to-run stability of one document's extracted quintuples
    (calculate_stability.py:197-261): embed each quintuple's text; for every
    run-1 quintuple take its best cosine in run 2; stability = the mean of
    those maxima (plus the overall matrix mean as the secondary measure).
    Both runs empty → 1.0; exactly one empty → 0.0."""
    if not run1 and not run2:
        return {"similarity": 1.0, "overall_mean_similarity": 1.0,
                "count1": 0, "count2": 0, "comparison_type": "both_empty"}
    if not run1 or not run2:
        return {"similarity": 0.0, "overall_mean_similarity": 0.0,
                "count1": len(run1), "count2": len(run2), "comparison_type": "one_empty"}
    v1 = np.asarray(embed_texts([format_quintuple_text(q) for q in run1]), dtype=np.float64)
    v2 = np.asarray(embed_texts([format_quintuple_text(q) for q in run2]), dtype=np.float64)
    u1 = v1 / np.maximum(np.linalg.norm(v1, axis=1, keepdims=True), 1e-12)
    u2 = v2 / np.maximum(np.linalg.norm(v2, axis=1, keepdims=True), 1e-12)
    sims = u1 @ u2.T
    return {
        "similarity": float(np.mean(sims.max(axis=1))),
        "overall_mean_similarity": float(np.mean(sims)),
        "count1": len(run1),
        "count2": len(run2),
        "comparison_type": "full_comparison",
    }


def corpus_stability(
    runs1: dict[str, list[dict]], runs2: dict[str, list[dict]], embed_texts
) -> dict:
    """Aggregate per-document stability over a corpus keyed by doc id
    (calculate_stability.py:263-300 aggregates per-row results): mean/std of
    the per-document avg-max similarity."""
    keys = sorted(set(runs1) | set(runs2))
    per_doc = {
        k: quintuple_stability(runs1.get(k, []), runs2.get(k, []), embed_texts)
        for k in keys
    }
    sims = np.array([r["similarity"] for r in per_doc.values()]) if per_doc else np.array([1.0])
    return {
        "mean_similarity": float(np.mean(sims)),
        "std_similarity": float(np.std(sims)),
        "n_documents": len(per_doc),
        "per_document": per_doc,
    }


# Published list-price table per 1M tokens (input, output, batch variants at
# the providers' batch discount) — evaluation/costs/cost_estimation.py:32-76.
MODEL_PRICING: dict[str, dict] = {
    "claude-sonnet-4": {"input": 3.00, "output": 15.00, "batch_input": 1.50, "batch_output": 7.50},
    "gpt-4o": {"input": 2.50, "output": 10.00, "batch_input": 1.25, "batch_output": 5.00},
    "mistral-large": {"input": 2.00, "output": 6.00, "batch_input": 1.00, "batch_output": 3.00},
    "o3-mini": {"input": 1.10, "output": 4.40, "batch_input": 0.55, "batch_output": 2.20},
    "gpt-4.1": {"input": 2.00, "output": 8.00, "batch_input": 1.00, "batch_output": 4.00},
}

# Heuristic when actual completions aren't available: one quintuple JSON
# object is ~40 tokens and a short factoid yields ~1 relationship.
_EST_OUTPUT_TOKENS_PER_FACT = 40


def price_tokens(model: str, input_tokens: int, output_tokens: int, batch: bool = False) -> dict:
    """USD cost of a token count at the model's per-1M list price
    (cost_estimation.py pricing application)."""
    p = MODEL_PRICING[model]
    ik, ok = ("batch_input", "batch_output") if batch else ("input", "output")
    cost_in = input_tokens / 1e6 * p[ik]
    cost_out = output_tokens / 1e6 * p[ok]
    return {
        "model": model,
        "input_tokens": int(input_tokens),
        "output_tokens": int(output_tokens),
        "input_cost_usd": round(cost_in, 6),
        "output_cost_usd": round(cost_out, 6),
        "total_cost_usd": round(cost_in + cost_out, 6),
        "batch": batch,
    }


def extraction_cost(
    facts: list[str],
    model: str = "gpt-4.1",
    obs_date: str = "2024-01-01",
    outputs: list[str] | None = None,
    batch: bool = False,
) -> dict:
    """Token cost of quintuple-extracting ``facts`` through the full ATOM
    prompt (system query + few-shots + wrapper — the same prompt
    :class:`~kgray.stages.extract.LLMQuintupleExtractor` sends).  Output
    tokens come from ``outputs`` when given, else from the per-fact
    heuristic (documented above)."""
    from kgray.functions.prompts import atom_extraction_prompt, count_tokens

    input_tokens = sum(count_tokens(atom_extraction_prompt(f, obs_date)) for f in facts)
    if outputs is not None:
        output_tokens = sum(count_tokens(o) for o in outputs)
    else:
        output_tokens = _EST_OUTPUT_TOKENS_PER_FACT * len(facts)
    out = price_tokens(model, input_tokens, output_tokens, batch)
    out["n_facts"] = len(facts)
    out["output_estimated"] = outputs is None
    return out


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
