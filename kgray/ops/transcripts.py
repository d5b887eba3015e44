"""Transcript-stream analytics — per-conversation statistics over the
(conv_id, turn_idx, role, text, tool, ts) table the engine's KG pipeline
ingests (BASELINE.json input_hint shape).  The curation primitive for
agent-trace corpora: role mix, tool-call rate, size and wall-clock span
per conversation feed filter/mixture decisions the same way doc-level
quality scores do for documents.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def conversation_stats(
    transcripts: ray.data.Dataset, num_buckets: int = 64
) -> ray.data.Dataset:
    """Per-conversation rollup: turn counts by role, tool-call count,
    total characters, wall-clock span.

    Scale shape: a conversation's turns may span input blocks, so each
    batch pre-aggregates per conv_id (the combiner — output is
    convs-touched-sized, not turn-sized) and the partials meet once in
    hash(conv_id) buckets for the final sum/min/max.  One small shuffle;
    nothing driver-resident.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        role = b["role"]
        ts_us = b["ts"].astype("datetime64[ns]").astype("int64") // 1000
        out = (
            b.assign(
                is_user=(role == "user"),
                is_assistant=(role == "assistant"),
                is_tool=(role == "tool"),
                has_tool=(b["tool"] != ""),
                n_chars=b["text"].str.len(),
                ts_us=ts_us,
            )
            .groupby("conv_id", sort=False)
            .agg(
                n_turns=("role", "size"),
                n_user=("is_user", "sum"),
                n_assistant=("is_assistant", "sum"),
                n_tool=("is_tool", "sum"),
                n_tool_calls=("has_tool", "sum"),
                n_chars=("n_chars", "sum"),
                first_us=("ts_us", "min"),
                last_us=("ts_us", "max"),
            )
            .reset_index()
        )
        out["bucket"] = (
            pd.util.hash_array(out["conv_id"].to_numpy(dtype=object)) % num_buckets
        ).astype("int32")
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("conv_id", sort=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_user=("n_user", "sum"),
                n_assistant=("n_assistant", "sum"),
                n_tool=("n_tool", "sum"),
                n_tool_calls=("n_tool_calls", "sum"),
                n_chars=("n_chars", "sum"),
                first_us=("first_us", "min"),
                last_us=("last_us", "max"),
            )
            .reset_index()
        )
        for c in ("n_turns", "n_user", "n_assistant", "n_tool", "n_tool_calls", "n_chars"):
            out[c] = out[c].astype("int64")
        out["duration_us"] = (out["last_us"] - out["first_us"]).astype("int64")
        return out.drop(columns=["first_us", "last_us"])

    return (
        transcripts.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )
