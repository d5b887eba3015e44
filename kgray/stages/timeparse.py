"""Timestamp-parsing stage: date strings → epoch floats.

Reference semantics: ``dateutil.parser.parse(s).timestamp()``, unparseable
strings silently skipped (itext2kg/atom/atom.py:111-134); the observation
timestamp is parsed the same way and appended once per ingest batch
(atom.py:193-194, relationship.py:38-72).

Vectorized: each batch parses only its DISTINCT date strings (pyarrow
dictionary-encode over the flattened list values), then rebuilds the
list<float64> columns from offsets with numpy.  dateutil remains the
scalar kernel so any format the reference accepted parses identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgray.functions.timeparse import TimestampParser


def _parse_list_column(col: pa.ChunkedArray | pa.Array, parser: TimestampParser) -> pa.Array:
    """list<string> → list<float64>, dropping unparseable entries."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    if len(flat) == 0:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(len(col) + 1, dtype=np.int32)), pa.array([], type=pa.float64())
        )
    dict_arr = pc.dictionary_encode(flat)
    lookup = np.array(
        [
            v if (v := parser.parse_one(s)) is not None else np.nan
            for s in dict_arr.dictionary.to_pylist()
        ],
        dtype=np.float64,
    )
    values = lookup[np.asarray(dict_arr.indices)]
    valid = ~np.isnan(values)
    # per-list counts of valid entries → new offsets (slice-safe: derived
    # from list_value_length, not raw buffer offsets)
    lengths = np.asarray(pc.list_value_length(col).fill_null(0), dtype=np.int64)
    starts = np.zeros(len(lengths), dtype=np.int64)
    if len(lengths) > 1:
        np.cumsum(lengths[:-1], out=starts[1:])
    cum_valid = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
    counts = cum_valid[starts + lengths] - cum_valid[starts]
    new_offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(counts, out=new_offsets[1:])
    return pa.LargeListArray.from_arrays(
        pa.array(new_offsets), pa.array(values[valid], type=pa.float64())
    ).cast(pa.list_(pa.float64()))


def parse_quintuple_times(batch: pa.Table) -> pa.Table:
    """t_start/t_end: list<str> → list<float64>; adds t_obs=[parse(obs_date)]."""
    p = TimestampParser()
    batch = batch.set_column(
        batch.schema.get_field_index("t_start"), "t_start",
        _parse_list_column(batch["t_start"], p),
    )
    batch = batch.set_column(
        batch.schema.get_field_index("t_end"), "t_end",
        _parse_list_column(batch["t_end"], p),
    )
    obs = batch["obs_date"]
    if isinstance(obs, pa.ChunkedArray):
        obs = obs.combine_chunks()
    dict_arr = pc.dictionary_encode(obs)
    lookup = np.array(
        [
            v if (v := p.parse_one(s)) is not None else np.nan
            for s in dict_arr.dictionary.to_pylist()
        ],
        dtype=np.float64,
    )
    vals = lookup[np.asarray(dict_arr.indices)]
    valid = ~np.isnan(vals)
    offsets = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(valid.astype(np.int64), out=offsets[1:])
    t_obs = pa.LargeListArray.from_arrays(
        pa.array(offsets), pa.array(vals[valid], type=pa.float64())
    ).cast(pa.list_(pa.float64()))
    return batch.append_column("t_obs", t_obs)
