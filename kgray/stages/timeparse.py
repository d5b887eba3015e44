"""Timestamp-parsing stage: date strings → epoch floats.

Reference semantics: ``dateutil.parser.parse(s).timestamp()``, unparseable
strings silently skipped (itext2kg/atom/atom.py:111-134); the observation
timestamp is parsed the same way and appended once per ingest batch
(atom.py:193-194, relationship.py:38-72).

Arrow-native so the quintuple stream stays in zero-copy Arrow blocks; the
parse itself memoizes distinct date strings per batch (transcript worlds
repeat a small set of dates massively, so cost is O(distinct dates)).
"""

from __future__ import annotations

import pyarrow as pa

from kgray.functions.timeparse import TimestampParser


def parse_quintuple_times(batch: pa.Table) -> pa.Table:
    """t_start/t_end: list<str> → list<float64>; adds t_obs=[parse(obs_date)]."""
    p = TimestampParser()
    t_start = [p.parse_list(v) for v in batch["t_start"].to_pylist()]
    t_end = [p.parse_list(v) for v in batch["t_end"].to_pylist()]
    t_obs = [
        [v] if (v := p.parse_one(d)) is not None else [] for d in batch["obs_date"].to_pylist()
    ]
    lf = pa.list_(pa.float64())
    batch = batch.set_column(
        batch.schema.get_field_index("t_start"), "t_start", pa.array(t_start, type=lf)
    )
    batch = batch.set_column(
        batch.schema.get_field_index("t_end"), "t_end", pa.array(t_end, type=lf)
    )
    return batch.append_column("t_obs", pa.array(t_obs, type=lf))
