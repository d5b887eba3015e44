"""Prompt assembly and provider-aware request batching.

Mirrors the reference's LLM request plumbing:
- prompt shape ``"# Context: {context}\\n\\n# Question: {query}\\n\\nAnswer: "``
  (itext2kg/llm_output_parsing/langchain_output_parser.py:268-271);
- greedy sub-batching by max elements AND max tokens per request batch
  (40 elements / 8,000 tokens for OpenAI, :38-71, :168-221);
- token counting: tiktoken when available, whitespace+punct heuristic
  otherwise (:157-166 — this container has no tiktoken).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

try:
    import tiktoken  # not available in this container; kept for parity

    _ENC = tiktoken.get_encoding("cl100k_base")

    def count_tokens(text: str) -> int:
        return len(_ENC.encode(text))

except ImportError:
    _TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

    def count_tokens(text: str) -> int:
        """BPE-ish proxy: words + number runs + punctuation marks."""
        return len(_TOKEN_RE.findall(text))


PROVIDER_CONFIGS = {
    # mirrors langchain_output_parser.py:38-71
    "openai": {"max_elements": 40, "max_tokens": 8000, "sleep_time": 2},
    "default": {"max_elements": 20, "max_tokens": 4000, "sleep_time": 2},
}


def assemble_prompt(context: str, system_query: str) -> str:
    return f"# Context: {context}\n\n# Question: {system_query}\n\nAnswer: "


def split_request_batches(
    contexts: Sequence[str],
    max_elements: int = 40,
    max_tokens: int = 8000,
) -> list[list[str]]:
    """Greedy split preserving order (langchain_output_parser.py:168-221):
    a batch closes when adding the next context would exceed either limit;
    a single oversized context still forms its own batch."""
    batches: list[list[str]] = []
    current: list[str] = []
    current_tokens = 0
    for ctx in contexts:
        t = count_tokens(ctx)
        if current and (len(current) >= max_elements or current_tokens + t > max_tokens):
            batches.append(current)
            current, current_tokens = [], 0
        current.append(ctx)
        current_tokens += t
    if current:
        batches.append(current)
    return batches
