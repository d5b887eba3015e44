"""Retry/backoff machinery for LLM request batches (reference ST3).

Mirrors the reference's per-batch retry loop
(itext2kg/llm_output_parsing/langchain_output_parser.py:287-386):

- ``max_retries`` retries after the first attempt (so ``max_retries + 1``
  attempts total); the final failure re-raises;
- rate-limit-class errors back off exponentially: ``base_sleep * 2**attempt``
  (the reference's OpenAI/Claude schedule; Mistral's 3**attempt variant is a
  policy knob, not hardcoded);
- malformed-output / bad-request-class errors retry after a flat
  ``base_sleep`` (reference :315-324 — the request is re-sent as-is, since
  structured-output parse failures are usually transient sampling noise);
- anything else also retries flat (reference :374-386).

Pure control flow — no network needed; tests inject a fake clock and flaky
clients to pin the schedule.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable


class RateLimitError(Exception):
    """Provider said slow down (HTTP 429 family)."""


class MalformedOutputError(Exception):
    """Structured output failed validation; re-request."""


_RATE_LIMIT_MARKERS = ("rate limit", "429", "too many requests")


def classify_error(exc: Exception) -> str:
    """'rate_limit' | 'malformed' | 'other' — typed first, then the
    reference's message heuristics (langchain_output_parser.py:330-343)."""
    if isinstance(exc, RateLimitError):
        return "rate_limit"
    if isinstance(exc, MalformedOutputError):
        return "malformed"
    msg = str(exc).lower()
    if any(m in msg for m in _RATE_LIMIT_MARKERS):
        return "rate_limit"
    return "other"


@dataclass
class RetryPolicy:
    max_retries: int = 3            # reference: 3 for Mistral/Claude, 2 others
    base_sleep: float = 2.0         # PROVIDER_CONFIGS sleep_time
    backoff_factor: float = 2.0     # 2**attempt; Mistral uses 3**attempt
    extra_after_first: float = 0.0  # reference adds +5s/+10s from attempt 2
    sleep: Callable[[float], None] = field(default=time.sleep)

    def backoff(self, attempt: int, kind: str) -> float:
        if kind == "rate_limit":
            s = self.base_sleep * (self.backoff_factor ** attempt)
            if attempt >= 1:
                s += self.extra_after_first
            return s
        return self.base_sleep


def with_retries(fn: Callable[[], "object"], policy: RetryPolicy | None = None):
    """Run ``fn`` with the reference's retry semantics; returns its value or
    re-raises the final error after ``max_retries`` failed retries."""
    policy = policy or RetryPolicy()
    for attempt in range(policy.max_retries + 1):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — mirror reference catch-all
            if attempt == policy.max_retries:
                raise
            policy.sleep(policy.backoff(attempt, classify_error(exc)))
    raise AssertionError("unreachable")
