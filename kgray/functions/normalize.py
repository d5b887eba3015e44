"""Vectorized normalization kernels (pyarrow.compute).

Replicates the reference's normalization exactly:
- entity label / predicate: ``re.sub(r'[^a-zA-Z0-9]+', '_', s).replace('&','and').lower()``
  (itext2kg/atom/models/entity.py:30-38, relationship.py:34-36).  Note the
  ``replace('&','and')`` is dead code in the reference — the regex has
  already replaced '&' with '_' — and we replicate the *effective*
  behaviour (regex → lower).
- entity name: ``s.lower()`` → ``re.sub(r'[_"\\-]+', ' ', s)`` → ``strip()``
  (entity.py:35-37).

Also Neo4j-compatible sanitizers mirroring
itext2kg/graph_integration/neo4j_storage.py:267-321.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_LABEL_RE = r"[^a-zA-Z0-9]+"
_NAME_RE = r"[_\"\-]+"
_LABEL_RE_PY = re.compile(_LABEL_RE)
_NAME_RE_PY = re.compile(r'[_"\-]+')


def normalize_label_py(s: str) -> str:
    """Scalar twin of :func:`normalize_label` (entity.py:34)."""
    return _LABEL_RE_PY.sub("_", s).replace("&", "and").lower()


def normalize_name_py(s: str) -> str:
    """Scalar twin of :func:`normalize_name` (entity.py:35-37)."""
    return _NAME_RE_PY.sub(" ", s.lower()).strip()


normalize_predicate_py = normalize_label_py


def entity_id_py(name: str, label: str) -> str:
    return "e_" + hashlib.md5(f"{name}|{label}".encode("utf-8")).hexdigest()[:16]


def normalize_label(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Entity label / predicate normalization (entity.py:34, relationship.py:35)."""
    return pc.utf8_lower(pc.replace_substring_regex(arr, _LABEL_RE, "_"))


def normalize_name(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Entity name normalization (entity.py:35-37)."""
    return pc.utf8_trim_whitespace(
        pc.replace_substring_regex(pc.utf8_lower(arr), _NAME_RE, " ")
    )


normalize_predicate = normalize_label


def entity_ids(names: pa.Array | pa.ChunkedArray, labels: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Stable entity id = md5 of 'name|label' (hex, 16 chars).

    Vectorized via numpy over the utf8 buffers; deterministic across runs
    and processes (no PYTHONHASHSEED dependence).
    """
    joined = pc.binary_join_element_wise(names, labels, "|")
    py = joined.to_pylist()
    out = np.empty(len(py), dtype=object)
    for i, s in enumerate(py):
        out[i] = "e_" + hashlib.md5(s.encode("utf-8")).hexdigest()[:16] if s is not None else None
    return pa.array(out, type=pa.string())


def sanitize_neo4j_labels(arr: pa.Array | pa.ChunkedArray, default: str = "Entity", prefix: str = "L") -> pa.Array:
    """Vectorized Neo4j label sanitizer (neo4j_storage.py:267-293).

    Keep [A-Za-z0-9_], prefix a leading digit with `prefix`, fall back to
    `default` when empty.
    """
    cleaned = pc.replace_substring_regex(arr, r"[^A-Za-z0-9_]+", "")
    needs_prefix = pc.match_substring_regex(cleaned, r"^[0-9]")
    prefixed = pc.binary_join_element_wise(pa.scalar(prefix), cleaned, "")
    cleaned = pc.if_else(needs_prefix, prefixed, cleaned)
    empty = pc.or_kleene(pc.is_null(cleaned), pc.equal(cleaned, ""))
    return pc.if_else(empty, pa.scalar(default), cleaned)


def sanitize_neo4j_rel_types(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Neo4j relationship-type sanitizer (neo4j_storage.py:295-321)."""
    return sanitize_neo4j_labels(arr, default="RELATES_TO", prefix="R")
