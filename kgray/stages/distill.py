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
