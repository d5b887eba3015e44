"""Distributed window functions — operators Ray Data has no native API for:
per-key ``row_number`` / ``lag`` / running sum over an ordered stream, and
top-k-per-group (the ``row_number() OVER (PARTITION BY ...) <= k`` idiom).

Scale shapes
------------
``keyed_window`` needs every row of a key in one place in order — that is
inherent to ordered window semantics — so it hash-buckets the key and pays
ONE all-to-all shuffle, then runs vectorized pandas kernels (``cumcount`` /
``shift`` / ``cumsum``) per bucket.  Partitioning assumption: a single
key's history fits one group; per-key volume, not corpus volume, is the
skew bound (raise ``num_buckets`` to spread distinct keys).

``top_k_per_group`` never ships the corpus: a per-batch PARTIAL top-k
(combiner) runs before the shuffle, so at most ``k × distinct_keys`` rows
per input block cross the wire — the same partial-then-reduce shape the
engine's aggregates use everywhere.

The reference engine has no window layer at all (its merge is whole-list
pairwise, itext2kg/atom/atom.py:55-84); these extend the engine the same
way ops/temporal.py does.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def keyed_window(
    ds: ray.data.Dataset,
    key: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    value_col: str = "value",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key ordered window functions in one pass: row number (``rn``),
    previous value (``prev_<value_col>``, null when first), and running sum
    (``run_<value_col>``), ordered by ``order_cols`` within each ``key``.

    Integer keys only (hash-bucketed with ``%``); pass an integer-encoded
    value column when exact (oracle-comparable) running sums are needed.
    """
    order = list(order_cols)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = (b[key] % num_buckets).astype("int32")
        return b

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        gb = g.groupby(key, sort=False)[value_col]
        g["rn"] = gb.cumcount().astype("int64") + 1
        g[f"prev_{value_col}"] = gb.shift(1)
        g[f"run_{value_col}"] = gb.cumsum()
        return g.drop(columns=["bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def top_k_per_group(
    ds: ray.data.Dataset,
    key: str = "lang",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    k: int = 3,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Top-k rows per group by ``value_col`` (descending; ties broken by
    ascending ``id_col`` so the result is total-ordered), with a 1-based
    ``rank`` column — ``row_number() OVER (PARTITION BY key ORDER BY value
    DESC, id) <= k`` without a window engine.

    A per-batch partial keeps only k rows per key seen in that batch, so
    the bucketed shuffle moves ≤ k × keys-per-block rows, never the corpus.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = (
            b.sort_values([key, value_col, id_col], ascending=[True, False, True], kind="mergesort")
            .groupby(key, sort=False)
            .head(k)
        )
        out = out.copy()
        out["bucket"] = (
            pd.util.hash_array(out[key].to_numpy()) % num_buckets
        ).astype("int32")
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, value_col, id_col], ascending=[True, False, True], kind="mergesort")
        g = g.groupby(key, sort=False).head(k).copy()
        g["rank"] = (g.groupby(key, sort=False).cumcount() + 1).astype("int64")
        return g.drop(columns=["bucket"])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values([key, "rank"], kind="mergesort")
        .reset_index(drop=True)
    )
