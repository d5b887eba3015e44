"""Embedding stage: pluggable embedder + deterministic hash embedder.

Reference semantics:
- entity embedding = name_weight * embed(name) + label_weight * embed(label)
  (itext2kg/atom/models/knowledge_graph.py:29-43), weights 0.8/0.2
  (atom/atom.py:161-162);
- relationship embedding = embed(name) (knowledge_graph.py:45-53).

Production would plug an LLM-embedding-backed ``Embedder`` (one client per
actor, batched requests, mirroring
itext2kg/llm_output_parsing/langchain_output_parser.py:223-233).  Tests and
benchmarks use :class:`HashEmbedder` — fully deterministic, no network: each
string gets a seeded unit gaussian vector; an optional *concept table* maps
surface variants of the same real-world concept to nearby vectors
(cos(variant, base) ≈ 1/sqrt(1+eps^2)) so embedding-based matching has
something real to resolve, with margins controllably above/below the 0.8 /
0.7 thresholds.
"""

from __future__ import annotations

import hashlib
from typing import Protocol, Sequence

import numpy as np


def _seed_from(key: str) -> int:
    return int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:8], "little")


class Embedder(Protocol):
    dim: int

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:  # (N, dim) float32
        ...


class HashEmbedder:
    """Deterministic embedder: md5-seeded unit gaussian per distinct string.

    ``concepts`` maps a (normalized) surface string to a concept key; all
    surfaces of one concept embed near the concept's base vector:
    ``v(s) = base(concept) + eps * noise(s)`` (then used unnormalized, as the
    reference uses raw model outputs — cosine normalizes internally).
    """

    def __init__(self, dim: int = 64, concepts: dict[str, str] | None = None, eps: float = 0.25):
        self.dim = dim
        self.concepts = concepts or {}
        self.eps = eps
        self._cache: dict[str, np.ndarray] = {}

    def _unit(self, key: str) -> np.ndarray:
        rng = np.random.default_rng(_seed_from(key))
        v = rng.standard_normal(self.dim)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def _vec(self, s: str) -> np.ndarray:
        v = self._cache.get(s)
        if v is None:
            concept = self.concepts.get(s)
            if concept is not None:
                v = self._unit("concept:" + concept) + self.eps * self._unit("noise:" + s)
            else:
                v = self._unit("str:" + s)
            self._cache[s] = v
        return v

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            out[i] = self._vec(t if t is not None else "")
        return out


def combine_entity_embeddings(
    name_vecs: np.ndarray,
    label_vecs: np.ndarray,
    name_weight: float = 0.8,
    label_weight: float = 0.2,
) -> np.ndarray:
    """Weighted entity embedding (knowledge_graph.py:43)."""
    return (name_weight * name_vecs + label_weight * label_vecs).astype(np.float32)


class EntityEmbedderStage:
    """Actor-pool stage: adds a ``vec`` column (list<float32>) to a batch of
    distinct entities with columns ``name`` and ``label``.

    Built once per actor (``map_batches(EntityEmbedderStage, concurrency=N,
    fn_constructor_kwargs=...)``) so any model/client state is amortized.
    """

    def __init__(self, embedder_factory, name_weight: float = 0.8, label_weight: float = 0.2):
        self.embedder: Embedder = embedder_factory()
        self.name_weight = name_weight
        self.label_weight = label_weight

    def __call__(self, batch: dict) -> dict:
        names = [x if x is not None else "" for x in batch["name"].tolist()]
        labels = [x if x is not None else "" for x in batch["label"].tolist()]
        nv = self.embedder.embed_texts(names)
        lv = self.embedder.embed_texts(labels)
        batch["vec"] = combine_entity_embeddings(nv, lv, self.name_weight, self.label_weight)
        return batch


class TextEmbedderStage:
    """Actor-pool stage: embed one text column into ``vec`` (predicates)."""

    def __init__(self, embedder_factory, column: str = "pred"):
        self.embedder: Embedder = embedder_factory()
        self.column = column

    def __call__(self, batch: dict) -> dict:
        texts = [x if x is not None else "" for x in batch[self.column].tolist()]
        batch["vec"] = self.embedder.embed_texts(texts)
        return batch
