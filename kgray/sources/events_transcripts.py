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


def transcripts_from_events(events: ray.data.Dataset) -> ray.data.Dataset:
    """Ray twin of :data:`TRANSCRIPTS_FROM_EVENTS_SQL` — one shuffle on
    user_id, rank assignment inside the group."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        uid = int(g["user_id"].iloc[0])
        idx = np.arange(len(g), dtype="int32")
        roles = np.array(["user", "assistant", "tool"], dtype=object)[idx % 3]
        return pd.DataFrame(
            {
                "conv_id": f"conv-{uid:06d}",
                "turn_idx": idx,
                "role": roles,
                "text": [
                    f"User {uid} did {et} event {eid}."
                    for et, eid in zip(g["event_type"], g["event_id"])
                ],
                "tool": np.where(idx % 3 == 2, g["event_type"], ""),
                "ts": g["ts"],
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")
