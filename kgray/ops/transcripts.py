"""Transcript-stream analytics — per-conversation statistics over the
(conv_id, turn_idx, role, text, tool, ts) table the engine's KG pipeline
ingests (BASELINE.json input_hint shape).  The curation primitive for
agent-trace corpora: role mix, tool-call rate, size and wall-clock span
per conversation feed filter/mixture decisions the same way doc-level
quality scores do for documents.
"""

from __future__ import annotations

import numpy as np
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


def turn_taking(
    transcripts: ray.data.Dataset, num_buckets: int = 64
) -> ray.data.Dataset:
    """Order-sensitive conversation-structure rollup: per conversation
    with >= 2 turns, the role-switch count, the longest same-role run,
    and the LOWER-median inter-turn gap in microseconds (exact discrete
    median — index (n-1)//2 of the sorted gaps — so the SQL twin's
    row_number pick matches bit-for-bit).  The dialogue-shape readout
    agent-trace curation uses to separate ping-pong chats from
    monologues and tool-burst traces.

    Scale shape: ONE hash(conv_id) shuffle of the pruned (conv_id,
    turn_idx, role, ts) projection — order-dependent metrics need the
    conversation co-located, and a conversation is bounded (the
    sessionize budget); within a bucket everything is vectorized
    (shift-compare for switches, cumsum run-ids, sorted cumcount pick
    for the median).
    """

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].astype("int64"),
                "role": b["role"],
                "ts_us": b["ts"].astype("datetime64[ns]").astype("int64") // 1000,
            }
        )
        out["bucket"] = (
            pd.util.hash_array(out["conv_id"].to_numpy(dtype=object)) % num_buckets
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "conv_id": pd.Series(dtype=object),
                "n_turns": pd.Series(dtype="int64"),
                "n_switches": pd.Series(dtype="int64"),
                "max_run": pd.Series(dtype="int64"),
                "med_gap_us": pd.Series(dtype="int64"),
            }
        )
        if not len(g):
            return empty
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
            drop=True
        )
        conv = g["conv_id"].to_numpy(dtype=object)
        role = g["role"].to_numpy(dtype=object)
        ts = g["ts_us"].to_numpy(dtype="int64")
        same = np.r_[False, conv[1:] == conv[:-1]]
        # SQL three-valued parity (the twin's lag() comparisons): a NULL
        # role is never a switch and never starts a run, but the row
        # AFTER it does start a new run (prole IS NULL)
        role_na = pd.isna(role)
        prev_na = np.r_[True, role_na[:-1]]
        neq = np.r_[False, role[1:] != role[:-1]]
        valid_cmp = ~role_na & ~prev_na
        switch = same & valid_cmp & neq
        nt = pd.Series(1, index=g.index).groupby(conv).sum()
        keep = nt[nt >= 2].index
        sw = pd.Series(switch.astype("int64")).groupby(conv).sum()
        run_id = np.cumsum(~same | (same & (prev_na | (valid_cmp & neq))))
        runs = (
            pd.DataFrame({"conv": conv, "rid": run_id})
            .groupby(["conv", "rid"], sort=False)
            .size()
            .reset_index(name="rl")
        )
        mr = runs.groupby("conv", sort=False)["rl"].max()
        gaps = pd.DataFrame({"conv": conv[same], "gap": (ts - np.r_[0, ts[:-1]])[same]})
        gaps = gaps.sort_values(["conv", "gap"], kind="mergesort")
        gaps["rn"] = gaps.groupby("conv", sort=False).cumcount()
        cnt = gaps.groupby("conv", sort=False)["gap"].transform("size")
        med = gaps[gaps["rn"] == (cnt - 1) // 2].set_index("conv")["gap"]
        out = pd.DataFrame(
            {
                "conv_id": list(keep),
                "n_turns": nt[keep].to_numpy(dtype="int64"),
                "n_switches": sw[keep].to_numpy(dtype="int64"),
                "max_run": mr[keep].to_numpy(dtype="int64"),
                "med_gap_us": med[keep].to_numpy(dtype="int64"),
            }
        )
        return out

    return (
        transcripts.select_columns(["conv_id", "turn_idx", "role", "ts"])
        .map_batches(tag, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
