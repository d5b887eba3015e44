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
    # mirrors langchain_output_parser.py:38-71 (batch caps + inter-batch
    # sleep per provider; "default" is the reference's UNKNOWN profile,
    # langchain_output_parser.py:63-70 — deliberately ultra-conservative
    # for undetected providers: tiny batches, very long sleeps)
    "openai": {"max_elements": 40, "max_tokens": 8000, "sleep_time": 2.0},
    "mistral": {"max_elements": 1, "max_tokens": 10000, "sleep_time": 0.2},
    "claude": {"max_elements": 50, "max_tokens": 8000, "sleep_time": 1.2},
    "default": {"max_elements": 5, "max_tokens": 4000, "sleep_time": 10.0},
}


def detect_provider(model) -> str:
    """Infer the provider profile from a model object OR a plain model
    string — the reference's autodetection
    (langchain_output_parser.py:114-155): class name, then module, then
    the ``model_name`` attribute / string, checked for openai → mistral →
    claude indicators in that order; anything unrecognized falls back to
    the conservative ``default`` profile."""
    if isinstance(model, str):
        class_name, module, model_name = "", "", model.lower()
    else:
        class_name = type(model).__name__.lower()
        module = type(model).__module__.lower()
        model_name = str(getattr(model, "model_name", "")).lower()

    for needle in ("openai", "chatgpt", "gpt"):
        if needle in class_name:
            return "openai"
    if "openai" in module:
        return "openai"
    for needle in ("mistral", "chatmistral"):
        if needle in class_name:
            return "mistral"
    if "mistral" in module:
        return "mistral"
    for needle in ("claude", "anthropic"):
        if needle in class_name:
            return "claude"
    if "anthropic" in module or "claude" in module:
        return "claude"
    if model_name:
        if "gpt" in model_name or "openai" in model_name:
            return "openai"
        if "mistral" in model_name:
            return "mistral"
        if "claude" in model_name or "anthropic" in model_name:
            return "claude"
    return "default"


def assemble_prompt(context: str, system_query: str) -> str:
    return f"# Context: {context}\n\n# Question: {system_query}\n\nAnswer: "


# --- ATOM temporal extraction prompt (itext2kg/atom/models/prompts.py:4-56)
# Paraphrased to the same structure: an observation-date-anchored system
# query plus few-shot quintuple examples covering explicit dates, relative
# dates resolved against the observation date, end-only actions, and
# atemporal facts — the documented source of the reference's
# temporal-exhaustivity gains (README.md:36).

TEMPORAL_FEW_SHOT_EXAMPLES = """\
FEW-SHOT EXAMPLES

* Michel served as CFO at Acme Corp from 2019 to 2021, then joined Beta Inc \
in 2021 and left in 2023.
-> (Michel, is_CFO_of, Acme Corp, ["01-01-2019"], ["01-01-2021"]), \
(Michel, works_at, Beta Inc, ["01-01-2021"], ["01-01-2023"])

* Sarah was a board member of GreenFuture until 2019.
-> (Sarah, is_board_member_of, GreenFuture, [], ["01-01-2019"])

* (observation_date = 2024-06-15) John Doe is no longer the CEO of GreenIT \
a few months ago.
-> (John Doe, is_CEO_of, GreenIT, [], ["2024-03-15"])

* (observation_date = 2024-03-20) The AI Summit conference started yesterday \
and will end tomorrow.
-> (AI Summit, has_status, Started, ["2024-03-19"], ["2024-03-21"])

* Researchers used high-resolution imaging in a study on neural plasticity.
-> (Researchers, use, High-Resolution Imaging, [], []), \
(High-Resolution Imaging, is_used_in, Study on Neural Plasticity, [], [])
"""


def temporal_system_query(obs_date: str) -> str:
    """Observation-date-anchored system query (prompts.py:47-56): extract
    relationships as present-tense predicates with t_start/t_end lists,
    resolving relative time references against the observation date."""
    return (
        f"Observation Time : {obs_date}\n\n"
        "You are a top-tier algorithm designed for extracting information in "
        "structured formats to build a knowledge graph.\n"
        "Extract every relationship as (subject, present-tense predicate, "
        "object, t_start[], t_end[]). Capture as much information from the "
        "text as possible without sacrificing accuracy; never add information "
        "that is not explicitly in the text. Resolve relative temporal "
        "expressions (today, yesterday, last month, ...) against the "
        "observation time; keep explicit dates as-is; use t_end for end "
        "actions while keeping the predicate in affirmative present tense. "
        "Keep entity references consistent so the knowledge graph stays "
        "coherent.\n\n" + TEMPORAL_FEW_SHOT_EXAMPLES
    )


def atom_extraction_prompt(atomic_fact: str, obs_date: str) -> str:
    """Full per-fact extraction prompt: the reference sends the fact as the
    context and the obs-date-anchored system query as the question
    (langchain_output_parser.py:268-271 + prompts.py:47-56)."""
    return assemble_prompt(atomic_fact, temporal_system_query(obs_date))


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
