"""Semi-structured (JSON) column operators: vectorized field extraction
and grouped rollups over extracted fields.

Scale shape: extraction is a stateless ``map_batches`` transform using
polars' vectorized JSON kernels (pyarrow has no in-memory JSON parse in
this environment; a ``json.loads`` row loop would be the hot-path
anti-pattern) — the column streams through, nothing shuffles.  The rollup
pre-aggregates per batch so only (groups × batches) partial rows reach
the driver combine, the same partial-agg shape as the relational queries.

The reference engine never parses nested payloads (its inputs are plain
strings); this extends the engine for event/property tables.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def extract_json_int(
    batch: pd.DataFrame, json_col: str = "props", path: str = "$.k", out_col: str = "k"
) -> pd.DataFrame:
    """Vectorized JSONPath extraction of an integer field; malformed JSON,
    missing fields, and non-numeric values become nulls (DuckDB
    ``json_extract`` + CAST semantics)."""
    import polars as pl

    s = pl.from_pandas(batch[json_col]).str.json_path_match(path).cast(pl.Int64, strict=False)
    out = batch.copy()
    out[out_col] = s.to_pandas()
    return out


def json_field_rollup(
    ds: ray.data.Dataset,
    group_col: str = "event_type",
    json_col: str = "props",
    path: str = "$.k",
) -> pd.DataFrame:
    """Per-group non-null count and sum of a JSON integer field: extract +
    per-batch partial aggregate in ONE fused map, tiny driver combine."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = extract_json_int(b[[group_col, json_col]], json_col, path, "k")
        g = b.groupby(group_col, sort=False)["k"].agg(["count", "sum"]).reset_index()
        return g.rename(columns={"count": "n_k", "sum": "sum_k"})

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        partials.groupby(group_col, sort=True)[["n_k", "sum_k"]]
        .sum()
        .reset_index()
    )
    out["n_k"] = out["n_k"].astype("int64")
    out["sum_k"] = out["sum_k"].astype("int64")
    return out
