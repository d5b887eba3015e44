"""Conversation assembly: transcripts → ordered per-conversation chunks.

Ray Data mapping of the reference's document/section sourcing
(itext2kg/atom/atom.py:155-164 takes pre-chunked atomic-fact lists per
observation date): here the unit of observation is a conversation — we
``groupby(conv_id)`` (one shuffle, the partitioning key reused downstream),
restore stable turn order by sorting ``turn_idx`` inside each group (the
input files store turns shuffled), drop empty turns, and emit chunks of at
most ``max_chunk_chars`` characters (~400 tokens, the reference's optimal
chunk size, README.md:79), never splitting a turn across chunks.

The conversation's observation date = the calendar day of its first turn
(maps to ATOM's per-batch ``obs_timestamp``, atom.py:155-164).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def assemble_chunks(
    transcripts: ray.data.Dataset,
    max_chunk_chars: int = 1600,
) -> ray.data.Dataset:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → chunks
    (conv_id, chunk_idx, text, obs_ts, obs_date)."""

    def per_conv(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("turn_idx", kind="mergesort")
        conv_id = group["conv_id"].iloc[0]
        obs_ts = group["ts"].min()
        obs_date = pd.Timestamp(obs_ts).strftime("%Y-%m-%d")
        texts = [t for t in group["text"].tolist() if t]
        chunks: list[str] = []
        cur: list[str] = []
        cur_len = 0
        for t in texts:
            if cur and cur_len + len(t) + 1 > max_chunk_chars:
                chunks.append("\n".join(cur))
                cur, cur_len = [], 0
            cur.append(t)
            cur_len += len(t) + 1
        if cur:
            chunks.append("\n".join(cur))
        if not chunks:
            return pd.DataFrame(columns=["conv_id", "chunk_idx", "text", "obs_ts", "obs_date"])
        return pd.DataFrame(
            {
                "conv_id": conv_id,
                "chunk_idx": np.arange(len(chunks), dtype="int32"),
                "text": chunks,
                "obs_ts": obs_ts,
                "obs_date": obs_date,
            }
        )

    return transcripts.groupby("conv_id").map_groups(per_conv, batch_format="pandas")


def ordered_turns(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """Per-turn view with stable ordering restored — evidences the
    per-row invariant (per-turn text equality under stable turn ordering)."""

    def per_conv(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("turn_idx", kind="mergesort")

    return transcripts.groupby("conv_id").map_groups(per_conv, batch_format="pandas")
