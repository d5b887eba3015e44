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


def write_packed_corpus(
    docs: ray.data.Dataset,
    out_dir: str,
    budget: int = 256,
    num_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Materialize training shards: pack every document and WRITE each
    bucket as its own Parquet partition ``out_dir/bucket=<k>/data.parquet``
    (rows carry bin_id / offset_tokens so a trainer can reassemble dense
    ``budget``-token sequences by concatenating texts within a bin).

    Resumable at partition granularity: a bucket that finished earlier
    (its ``_DONE`` marker exists, written atomically AFTER the shard) is
    filtered out BEFORE the shuffle on re-runs — a crashed run redoes only
    its unfinished buckets, and the payload for finished buckets never
    crosses the wire again.  This is the ONE corpus-payload shuffle of the
    packing path (the assignment-only :func:`pack_sequences` shuffles
    metadata; a sink must move the text).  Single-node path writes to a
    local dir; on a cluster point ``out_dir`` at shared/object storage.

    Returns a per-bucket summary (bucket, n_docs, n_bins, n_tokens) —
    fresh buckets from this run plus previously-finished ones from their
    markers, so the summary is total regardless of resume history.
    """
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def marker(k: int) -> str:
        return os.path.join(out_dir, f"bucket={k}", "_DONE")

    done = {k for k in range(num_buckets) if os.path.exists(marker(k))}

    def tag(t: pa.Table) -> pa.Table:
        n_tokens = pc.cast(pc.add(pc.count_substring(t[text_col], " "), 1), pa.int64())
        ids = t[id_col].to_numpy(zero_copy_only=False)
        bucket = (_md5_u64_np([str(x) for x in ids]) % num_buckets).astype(np.int32)
        out = pa.table(
            {
                id_col: t[id_col],
                "bucket": pa.array(bucket, type=pa.int32()),
                "n_tokens": n_tokens,
                text_col: t[text_col],
            }
        )
        if done:
            out = out.filter(pa.array(~np.isin(bucket, list(done))))
        return out

    def pack_and_write(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, offs = _next_fit(g["n_tokens"].to_numpy(dtype=np.int64), budget)
        g["bin_id"] = bins
        g["offset_tokens"] = offs
        k = int(g["bucket"].iloc[0])
        part_dir = os.path.join(out_dir, f"bucket={k}")
        os.makedirs(part_dir, exist_ok=True)
        shard = g[[id_col, "bin_id", "offset_tokens", "n_tokens", text_col]]
        tmp = os.path.join(part_dir, ".data.parquet.tmp")
        shard.to_parquet(tmp, index=False)
        os.replace(tmp, os.path.join(part_dir, "data.parquet"))
        stats = {
            "bucket": k,
            "n_docs": int(len(g)),
            "n_bins": int(bins[-1]) + 1 if len(bins) else 0,
            "n_tokens": int(g["n_tokens"].sum()),
        }
        with open(marker(k) + ".tmp", "w") as f:
            json.dump(stats, f)
        os.replace(marker(k) + ".tmp", marker(k))
        return pd.DataFrame([stats])

    fresh = (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_and_write, batch_format="pandas")
        .to_pandas()
    )
    rows = [] if fresh.empty else [fresh]
    for k in sorted(done):
        with open(marker(k)) as f:
            rows.append(pd.DataFrame([json.load(f)]))
    if not rows:
        return pd.DataFrame(columns=["bucket", "n_docs", "n_bins", "n_tokens"])
    return (
        pd.concat(rows, ignore_index=True)
        .astype({"bucket": "int64", "n_docs": "int64", "n_bins": "int64", "n_tokens": "int64"})
        .sort_values("bucket")
        .reset_index(drop=True)
    )
