"""Deterministic fake structured-output clients for exercising the
LLM-backed extraction path without a network — the engine's counterpart of
the reference's mocked-LLM unit tests (tests/atom/test_atom_matching.py:173-240).

These are importable from worker processes (unlike classes defined inside a
test module), which matters because ``LLMQuintupleExtractor`` runs as a Ray
actor pool: the constructor argument must resolve on the worker.
"""

from __future__ import annotations

from kgray.stages.extract import EventsRuleExtractor, RuleExtractor


def context_of(prompt: str) -> str:
    """Invert ``assemble_prompt``: recover the context (atomic fact)."""
    return prompt.split("# Context: ", 1)[1].split("\n\n# Question:", 1)[0]


class RuleBackedStructuredClient:
    """'LLM' that answers every prompt with the closed-world rule
    extraction as a ``RelationshipsExtractor``-shaped payload."""

    def __init__(self):
        self._rule = RuleExtractor()

    def __call__(self, prompts):
        out = []
        for p in prompts:
            hit = self._rule._extract_line(context_of(p))
            rels = []
            if hit:
                s, sl, pred, o, ol, ts, te = hit
                rels = [
                    {
                        "startNode": {"name": s, "label": sl},
                        "endNode": {"name": o, "label": ol},
                        "name": pred,
                        "t_start": ts,
                        "t_end": te,
                    }
                ]
            out.append({"relationships": rels})
        return out


class EventsRuleBackedStructuredClient(RuleBackedStructuredClient):
    """Same shape over the events-derived transcript templates
    ('User N did X event M.') — gives the LLM extraction path a fully
    SQL-checkable end-to-end driver query."""

    def __init__(self):
        self._rule = EventsRuleExtractor()


class FaultInjectingEventsClient(EventsRuleBackedStructuredClient):
    """Events rule-backed client that injects faults MID-STREAM on a
    deterministic per-actor schedule: the 2nd request of each actor's
    client raises a rate-limit error, the 4th returns a schema-invalid
    payload, and every 9th request thereafter alternates the two — so a
    live ``map_batches`` run exercises both retry paths (exponential for
    rate limits, flat re-request for malformed output) inside every actor
    while still converging to the exact rule-backed result.  No two fault
    indices are adjacent, so a single retry always lands on a clean
    request."""

    def __init__(self):
        super().__init__()
        self._count = 0

    def __call__(self, prompts):
        from kgray.functions.retry import RateLimitError

        self._count += 1
        c = self._count
        fault = None
        if c == 2:
            fault = "rate"
        elif c == 4:
            fault = "malformed"
        elif c > 4 and c % 9 == 0:
            fault = "rate" if (c // 9) % 2 else "malformed"
        if fault == "rate":
            raise RateLimitError("429 too many requests (injected)")
        if fault == "malformed":
            return [{"not_relationships": []} for _ in prompts]
        return super().__call__(prompts)
