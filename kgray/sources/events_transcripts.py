"""Derive a transcripts table from the ``events`` stream table.

A deterministic projection both the Ray engine and a SQL oracle can
compute, giving the conversation-assembly and KG operators an
oracle-checkable end-to-end path over driver-provided data:

- ``conv_id``  = 'conv-' || lpad(user_id, 6, '0')  (one conversation per user)
- turn order   = (ts, event_id) within user; ``turn_idx`` = rank - 1
- ``role``     = cycle user/assistant/tool by turn_idx % 3
- ``text``     = 'User {user_id} did {event_type} event {event_id}.'
- ``tool``     = event_type on tool turns, '' otherwise
- ``ts``       = event ts

The rendered text matches :class:`kgray.stages.extract.EventsRuleExtractor`
templates, so the full KG pipeline over these transcripts reduces to an
exact SQL aggregate (all surfaces distinct → canonicalization is identity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
  'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
  CASE (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) % 3
    WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
  'User ' || CAST(user_id AS VARCHAR) || ' did ' || event_type
    || ' event ' || CAST(event_id AS VARCHAR) || '.' AS text,
  CASE WHEN (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) % 3 = 2
    THEN event_type ELSE '' END AS tool,
  ts
FROM events
"""


def _render_turns(b: pd.DataFrame) -> pd.DataFrame:
    """Events of WHOLE users → transcript rows (vectorized rank assignment
    per user; one frame in, one frame out)."""
    b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
    idx = b.groupby("user_id", sort=False).cumcount().to_numpy(dtype="int32")
    uids = b["user_id"].to_numpy()
    roles = np.array(["user", "assistant", "tool"], dtype=object)[idx % 3]
    return pd.DataFrame(
        {
            "conv_id": [f"conv-{u:06d}" for u in uids],
            "turn_idx": idx,
            "role": roles,
            "text": [
                f"User {u} did {et} event {eid}."
                for u, et, eid in zip(uids, b["event_type"], b["event_id"])
            ],
            "tool": np.where(idx % 3 == 2, b["event_type"], ""),
            "ts": b["ts"],
        }
    )


def _bucketed_by_user(events: ray.data.Dataset, num_buckets: int):
    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (b["user_id"] % num_buckets).astype("int32")
        return b

    return events.map_batches(add_bucket, batch_format="pandas").groupby("bucket")


def transcripts_from_events(events: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Ray twin of :data:`TRANSCRIPTS_FROM_EVENTS_SQL` — users hash into
    buckets so the shuffle groups buckets (one UDF dispatch per bucket,
    vectorized rank assignment per user inside)."""
    return _bucketed_by_user(events, num_buckets).map_groups(
        _render_turns, batch_format="pandas"
    )


def chunks_from_events(
    events: ray.data.Dataset, max_chunk_chars: int = 1600, num_buckets: int = 64
) -> ray.data.Dataset:
    """Fused single-shuffle path for the KG-over-events pipeline: since
    conv_id is 1:1 with user_id, the conversation-assembly shuffle in
    kgray.stages.chunk.assemble_chunks would re-co-locate rows that the
    user-bucket shuffle here already co-located — so render turns AND chunk
    them inside one per-bucket UDF.  Equals
    assemble_chunks(transcripts_from_events(events)) row-for-row
    (tests/test_pipeline.py::test_chunks_from_events_fusion); measured
    ~2x on the events→KG path at sf0.1 (two ~4.5s same-key shuffles → one)."""

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        from kgray.stages.chunk import chunk_frame

        return chunk_frame(_render_turns(b), max_chunk_chars)

    return _bucketed_by_user(events, num_buckets).map_groups(
        per_bucket, batch_format="pandas"
    )
