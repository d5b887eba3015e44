"""kgray — Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of AuvaLab/itext2kg
(ATOM generation) as idiomatic Ray Data pipelines: transcripts →
ordered per-conversation chunks → quintuple extraction (actor pool) →
normalization / timestamp parsing (vectorized Arrow) → embedding
(actor pool) → entity & predicate canonicalization (exact hash join +
cosine matching + union-find) → triple merge (groupby + list-concat)
→ Neo4j-compatible node/edge Parquet.

Reference semantics are cited per-module as /root/reference/file:line.
"""

from kgray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
