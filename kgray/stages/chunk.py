"""Conversation assembly: transcripts → ordered per-conversation chunks.

Ray Data mapping of the reference's document/section sourcing
(itext2kg/atom/atom.py:155-164 takes pre-chunked atomic-fact lists per
observation date): the unit of observation is a conversation — turns are
co-located by conversation, restored to stable turn order (the input files
store turns shuffled), empty turns dropped, and chunked to at most
``max_chunk_chars`` characters (~400 tokens, the reference's optimal chunk
size, README.md:79) without splitting a turn.

Scale shape: conversations are hash-bucketed (stable crc32, not Python's
process-randomized hash) and the shuffle groups BUCKETS, not conversations
— one UDF dispatch per bucket instead of one per conversation, with all
per-conversation work vectorized pandas inside the bucket.  Chunk
boundaries are assigned by per-conversation cumulative character count
(deterministic at any parallelism); the concatenation of a conversation's
chunks always equals its ordered turn texts (the per-turn invariant).

The conversation's observation date = the calendar day of its first turn
(maps to ATOM's per-batch ``obs_timestamp``, atom.py:155-164).
"""

from __future__ import annotations



import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

DEFAULT_NUM_BUCKETS = 64


def _add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    # vectorized deterministic hash (pandas siphash with its fixed default
    # key — stable across processes, unlike Python's str hash)
    conv = batch["conv_id"].to_pandas()
    buckets = (pd.util.hash_array(conv.to_numpy(dtype=object)) % num_buckets).astype("int32")
    return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))


def chunk_frame(b: pd.DataFrame, max_chunk_chars: int) -> pd.DataFrame:
    """Chunk a frame that holds WHOLE conversations (every turn of each
    conv_id present) — the vectorized kernel shared by
    :func:`assemble_chunks` and the fused single-shuffle events path
    (kgray.sources.events_transcripts.chunks_from_events)."""
    b = b.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    obs = b.groupby("conv_id", sort=False)["ts"].transform("min")
    b = b.assign(obs_ts=obs)
    b = b[b["text"].astype(str) != ""]
    if b.empty:
        return pd.DataFrame(
            {"conv_id": pd.Series(dtype=str), "chunk_idx": pd.Series(dtype="int32"),
             "text": pd.Series(dtype=str), "obs_ts": pd.Series(dtype="datetime64[us]"),
             "obs_date": pd.Series(dtype=str)}
        )
    lens = b["text"].str.len() + 1
    cum = lens.groupby(b["conv_id"], sort=False).cumsum() - lens
    b = b.assign(chunk_idx=(cum // max_chunk_chars).astype("int32"))
    out = (
        b.groupby(["conv_id", "chunk_idx"], sort=False)
        .agg(text=("text", "\n".join), obs_ts=("obs_ts", "first"))
        .reset_index()
    )
    out["obs_date"] = out["obs_ts"].dt.strftime("%Y-%m-%d")
    return out[["conv_id", "chunk_idx", "text", "obs_ts", "obs_date"]]


def assemble_chunks(
    transcripts: ray.data.Dataset,
    max_chunk_chars: int = 1600,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> ray.data.Dataset:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → chunks
    (conv_id, chunk_idx, text, obs_ts, obs_date)."""
    # prune BEFORE the all-to-all: role/tool and any extra columns never
    # reach the chunk output, and they were ~43% of the shuffled bytes
    # (measured 11.4s → 6.5s on the 8.4M-turn shuffle at 16 CPUs)
    transcripts = transcripts.select_columns(["conv_id", "turn_idx", "text", "ts"])
    # Block-count note: the groupby's all-to-all cost grows with
    # (input blocks x output partitions); read the transcripts with
    # override_num_blocks ≈ cluster CPUs (see sources.read_transcripts) —
    # measured 25s -> 5s on 8.4M rows going from 224 auto-split blocks to
    # 32.  An in-pipeline repartition() is NOT used: it is itself an
    # all-to-all and costs as much as it saves.

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return chunk_frame(b, max_chunk_chars)

    return (
        transcripts.map_batches(lambda t: _add_bucket(t, num_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def ordered_turns(
    transcripts: ray.data.Dataset, num_buckets: int = DEFAULT_NUM_BUCKETS
) -> ray.data.Dataset:
    """Per-turn view with stable ordering restored — evidences the
    per-row invariant (per-turn text equality under stable turn ordering)."""

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["conv_id", "turn_idx"], kind="mergesort").drop(columns=["bucket"])

    return (
        transcripts.map_batches(lambda t: _add_bucket(t, num_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
