"""Distributed corpus statistics Ray Data has no aggregate for: exact
per-group quantiles and global token frequencies (tokenizer-vocabulary
induction).

Scale shapes
------------
* ``grouped_quantiles`` is the HISTOGRAM method: values are pre-quantized
  to an integer domain (cents) so each batch collapses to (group, value,
  count) partials via Arrow ``group_by`` — the shuffle moves histograms
  bounded by the value domain, never the row stream.  Quantile indices
  use integer arithmetic (``ceil(q·n) − 1`` as ``(num·n + den − 1) //
  den − 1``), matching DuckDB ``quantile_disc`` with decimal-literal
  fractions exactly.
* ``token_frequencies`` pre-counts inside every batch (combiner), hash-
  buckets the partial counts, keeps a per-bucket top-n, and merges only
  ``buckets × n`` rows on the driver — the heavy-hitters shape; the raw
  token stream never reaches a global shuffle.

The reference engine has no statistics layer; these run over the
``events`` and ``documents`` tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DECILES = tuple((d, 10) for d in range(1, 10))


def grouped_quantiles(
    ds: ray.data.Dataset,
    group_col: str = "event_type",
    value_col: str = "cents",
    quantiles: tuple[tuple[int, int], ...] = DECILES,
) -> pd.DataFrame:
    """Exact per-group quantiles of an integer-valued column, one wide row
    per group (``p<pct>`` columns + ``n``).  Quantiles are exact fractions
    (numerator, denominator); the selected element is the sorted value at
    index ``ceil(q·n) − 1`` (discrete quantile, no interpolation)."""

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({group_col: t[group_col], value_col: t[value_col]})
            .group_by([group_col, value_col])
            .aggregate([([], "count_all")])
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        group_key = g[group_col].iloc[0]
        g = (
            g.groupby(value_col, sort=True)["count_all"].sum().reset_index()
        )  # sorted histogram for ONE group
        counts = g["count_all"].to_numpy(dtype=np.int64)
        vals = g[value_col].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        row: dict = {group_col: group_key, "n": n}
        for num, den in quantiles:
            idx = max(0, -(-(num * n) // den) - 1)  # ceil(num*n/den) - 1
            row[f"p{100 * num // den}"] = vals[np.searchsorted(cum, idx + 1)]
        return pd.DataFrame([row])

    # group_col cardinality is small (it IS the grouping dimension); each
    # group's histogram is bounded by the quantized value domain, so
    # map_groups sees histograms, not rows
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values(group_col, kind="mergesort")
        .reset_index(drop=True)
    )
    return out


def token_frequencies(
    ds: ray.data.Dataset,
    top_n: int = 30,
    text_col: str = "text",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Global top-n token frequencies (count desc, token asc tie-break) —
    the first step of tokenizer-vocabulary induction.  Per-batch Arrow
    ``group_by`` pre-counts, per-bucket sum + top-n partials, then a
    ``buckets × n``-row driver merge."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(pc.cast(texts, pa.large_string()), " ").flatten()
        counted = pa.table({"token": toks}).group_by("token").aggregate([([], "count_all")])
        bucket = pd.util.hash_array(
            np.asarray(counted["token"].to_pandas(), dtype=object)
        ) % num_buckets
        return counted.append_column("bucket", pa.array(bucket.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("token", sort=False)["count_all"].sum().reset_index(name="cnt")
        return c.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort").head(
            top_n
        )

    candidates = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = candidates.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
    out["cnt"] = out["cnt"].astype("int64")
    return out.head(top_n).reset_index(drop=True)
