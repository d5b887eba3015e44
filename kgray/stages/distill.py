"""Document distillation (the reference's front-end Module 1).

Reference: DocumentsDistiller.distill maps raw documents through an LLM
with an arbitrary pydantic output schema and merges the per-document
structured outputs field-wise — lists extend, strings concatenate with
a space, dicts update (itext2kg/documents_distiller/documents_distiller.py:
20-173, 176-196); ATOM's variant decomposes documents into atomic,
self-contained, temporally-grounded factoid strings
(atom/models/schemas.py:7-105).

Ray Data mapping: an actor-pool ``map_batches`` stage holding the
extractor (LLM client in production, deterministic sentence splitter in
tests), followed by a field-wise reduce via ``groupby(group_col)``.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data


class FactoidSplitter:
    """Deterministic Module-1 stand-in: split a text into atomic fact
    strings (sentence-level, trimmed, empties dropped).  The LLM-backed
    version resolves pronouns and anchors relative dates to the
    observation date (schemas.py:46-105); this splitter covers the
    pipeline shape for worlds whose sentences are already atomic."""

    STATELESS = True

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self._sent = re.compile(r"(?<=[.!?])\s+")
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: dict) -> pa.Table:
        ids, facts, idxs = [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            for i, sent in enumerate(s.strip() for s in self._sent.split(str(text))):
                if sent:
                    ids.append(doc_id)
                    facts.append(sent)
                    idxs.append(i)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "fact_idx": pa.array(idxs, type=pa.int32()),
                "fact": pa.array(facts, type=pa.large_string()),
            }
        )


def split_factoids(
    docs: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    return docs.map_batches(
        FactoidSplitter(id_col=id_col, text_col=text_col), batch_format="numpy"
    )


ATOMIC_FACTS_QUERY = (
    "Decompose the text into a list of atomic, self-contained, "
    "temporally-grounded factoids: one fact per statement, pronouns "
    "replaced by full entity names, every relative time reference resolved "
    "to an absolute date using the observation date, end actions stated "
    "explicitly with their end time, redundancies removed."
)  # paraphrase of the reference factoid guidelines, atom/models/schemas.py:46-105


class LLMDistiller:
    """Module-1 LLM distiller with a USER-SUPPLIED structured-output
    schema (§2.10: documents_distiller.py:20-196 accepts any pydantic
    model via llm_output_parser_interface.py:54-73).

    ``schema``: a pydantic model class or flat dict spec
    ``{field: str|int|float|list}``; each document's validated payload
    lands in typed Arrow columns (``schema_arrow_fields``), ready for the
    field-wise :func:`distill` reduce.  Client lifecycle, provider
    batching and retry/backoff are identical to
    :class:`~kgray.stages.extract.LLMQuintupleExtractor`."""

    STATELESS = False

    def __init__(
        self,
        client_factory=None,
        schema=None,
        system_query: str = ATOMIC_FACTS_QUERY,
        id_col: str = "doc_id",
        text_col: str = "text",
        provider: str | None = None,
        model: str | object | None = None,
        max_retries: int = 3,
        base_sleep: float = 2.0,
        sleep=None,
    ):
        if client_factory is None:
            raise NotImplementedError(
                "No LLM client available in this environment; pass client_factory "
                "or use FactoidSplitter."
            )
        import time as _time

        from kgray.functions.prompts import PROVIDER_CONFIGS, detect_provider
        from kgray.functions.retry import RetryPolicy
        from kgray.functions.schemas import AtomicFactsModel, flat_spec

        self.client = client_factory()
        self.schema = schema if schema is not None else AtomicFactsModel
        self.spec = flat_spec(self.schema)
        self.system_query = system_query
        self.id_col = id_col
        self.text_col = text_col
        # provider autodetection — explicit provider= wins (see
        # LLMQuintupleExtractor for the detection ladder)
        if provider is None:
            probe = model if model is not None else self.client
            provider = detect_provider(probe)
            if provider == "default" and model is None:
                provider = "openai"
        self.provider = provider
        cfg = PROVIDER_CONFIGS.get(provider, PROVIDER_CONFIGS["default"])
        self.max_elements = int(cfg["max_elements"])
        self.max_tokens = int(cfg["max_tokens"])
        self.policy = RetryPolicy(
            max_retries=max_retries,
            base_sleep=base_sleep,
            sleep=sleep if sleep is not None else _time.sleep,
        )

    def __call__(self, batch: dict) -> pa.Table:
        from kgray.functions.prompts import assemble_prompt, split_request_batches
        from kgray.functions.retry import MalformedOutputError, with_retries
        from kgray.functions.schemas import schema_arrow_fields, validate_output

        ids = list(batch[self.id_col])
        prompts = [
            assemble_prompt(str(t), self.system_query) for t in batch[self.text_col]
        ]
        outputs: list[dict] = []
        for req in split_request_batches(prompts, self.max_elements, self.max_tokens):

            def request(r=req):
                payloads = self.client(r)
                if len(payloads) != len(r):
                    raise MalformedOutputError(
                        f"client returned {len(payloads)} payloads for {len(r)} prompts"
                    )
                return [validate_output(p, self.schema) for p in payloads]

            outputs.extend(with_retries(request, self.policy))

        cols: dict = {self.id_col: pa.array(ids)}
        for f in schema_arrow_fields(self.spec):
            cols[f.name] = pa.array([o.get(f.name) for o in outputs], type=f.type)
        return pa.table(cols)


def combine_distilled(values: list) -> object:
    """Field-wise combiner, replicating documents_distiller.py:96-173:
    lists extend, strings join with ' ', dicts update, numbers keep the
    last non-null, None skipped."""
    out = None
    for v in values:
        if v is None:
            continue
        if out is None:
            out = list(v) if isinstance(v, list) else (dict(v) if isinstance(v, dict) else v)
        elif isinstance(out, list) and isinstance(v, list):
            out = out + list(v)
        elif isinstance(out, str) and isinstance(v, str):
            if v:
                out = f"{out} {v}".strip()
        elif isinstance(out, dict) and isinstance(v, dict):
            out = {**out, **v}
        else:
            out = v
    return out


def distill(
    extracted: ray.data.Dataset,
    group_col: str = "doc_id",
) -> ray.data.Dataset:
    """Merge many structured outputs per group field-wise (the reduce side
    of DocumentsDistiller.distill)."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        row = {group_col: g[group_col].iloc[0]}
        for col in g.columns:
            if col == group_col:
                continue
            row[col] = combine_distilled(list(g[col]))
        return pd.DataFrame([row])

    return extracted.groupby(group_col).map_groups(per_group, batch_format="pandas")
