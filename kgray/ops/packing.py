"""Sequence packing for training-batch assembly: place documents into
fixed token-budget bins (greedy next-fit) so downstream training reads
dense, fixed-size sequences instead of ragged documents.

Scale shape
-----------
Packing is inherently sequential *within a packing domain*, so the domain
is a hash bucket: docs shuffle ONCE on ``md5(doc_id) % num_buckets`` and
each bucket packs independently in deterministic ``doc_id`` order.  The
per-bucket kernel is not a per-row Python loop — next-fit bin boundaries
are found with one ``np.searchsorted`` jump per BIN over the token-count
cumsum (O(bins·log n), bins ≈ tokens/budget « rows).  At 100 TB, raise
``num_buckets`` so a bucket's (doc_id, n_tokens) rows fit one group; the
packed assignment is metadata-sized (4 int columns), never the text.

The md5-lower-64 bucket hash equals DuckDB ``md5_number_lower`` so the
whole assignment is SQL-verifiable (the oracle replays next-fit as a
recursive CTE).  The reference engine has no packing layer (its batching
is prompt-size splitting, langchain_output_parser.py:157-166); this is a
training-data extension like ops/curation.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kgray.ops.dedup import _md5_u64_np


def _next_fit(lens: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy next-fit over ``lens`` in order: doc j joins the current bin
    iff the bin's fill + lens[j] <= budget, else opens a new bin (an
    oversized doc gets a bin of its own).  Returns (bin_id, offset) with
    offset = token offset of the doc inside its bin."""
    n = len(lens)
    cum = np.cumsum(lens, dtype=np.int64)
    bins = np.empty(n, dtype=np.int64)
    offs = np.empty(n, dtype=np.int64)
    start, b, base = 0, 0, np.int64(0)
    while start < n:
        end = int(np.searchsorted(cum, base + budget, side="right"))
        if end <= start:  # oversized doc: alone in its bin
            end = start + 1
        bins[start:end] = b
        offs[start:end] = cum[start:end] - lens[start:end] - base
        base = cum[end - 1]
        b += 1
        start = end
    return bins, offs


def pack_sequences(
    docs: ray.data.Dataset,
    budget: int = 256,
    num_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Assign every document to a (bucket, bin_id) packing slot under a
    ``budget``-token bin capacity.  Token counts are whitespace fields
    (``#separators + 1``, DuckDB ``len(string_split(...))`` semantics).

    One metadata-only shuffle: the text column is dropped BEFORE the
    bucket groupby — only (doc_id, bucket, n_tokens) rows cross the wire.
    Returns (doc_id, bucket, bin_id, offset_tokens, n_tokens).
    """

    def tokens_and_bucket(t: pa.Table) -> pa.Table:
        n_tokens = pc.cast(pc.add(pc.count_substring(t[text_col], " "), 1), pa.int64())
        ids = t[id_col].to_numpy(zero_copy_only=False)
        bucket = (_md5_u64_np([str(x) for x in ids]) % num_buckets).astype(np.int32)
        return pa.table(
            {
                id_col: t[id_col],
                "bucket": pa.array(bucket, type=pa.int32()),
                "n_tokens": n_tokens,
            }
        )

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, offs = _next_fit(g["n_tokens"].to_numpy(dtype=np.int64), budget)
        g["bin_id"] = bins
        g["offset_tokens"] = offs
        return g[[id_col, "bucket", "bin_id", "offset_tokens", "n_tokens"]]

    return (
        docs.map_batches(tokens_and_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_bucket, batch_format="pandas")
    )
