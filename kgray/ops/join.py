"""Distributed equi-join of two corpus-sized Datasets.

The relational reports join facts to (ladder-guarded) dimensions and the
ANN ops join by similarity; this is the remaining fundamental shape — a
plain hash join where BOTH sides are too big to broadcast (documents ⋈
embeddings, shard ⋈ shard).  Both streams bucket by key hash (one
all-to-all each) and each bucket joins locally: the classic reduce-side
join, no driver-resident side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str,
    num_buckets: int = 64,
    how: str = "inner",
) -> ray.data.Dataset:
    """Equi-join ``left ⋈ right`` on ``left_on == right_on``.

    ``how``: "inner" (both sides' columns, right keys fan out), "semi"
    (left rows WITH a match — left columns only, no fan-out), or "anti"
    (left rows WITHOUT a match — the distributed NOT-EXISTS, the shape
    ``dormant_customers`` specializes).  "left"-outer is deliberately
    unsupported: pandas would NaN-corrupt int columns on the unmatched
    rows; use semi+anti and union if you need both halves.

    Non-key column names must be disjoint between the two sides (no
    silent suffixing — rename upstream; the oracle-checked column
    contract demands explicit names).  The key column keeps ``left_on``'s
    name in the output.

    Scale shape: each side maps to a UNIFIED Arrow schema (its own
    columns + typed nulls for the other side's — typed nulls, not pandas
    NaN, so int64/list columns survive the union intact), the union
    shuffles once into hash(key) buckets, and each bucket splits back
    into typed sub-tables and merges.  Wire cost is both streams moved
    once — the lower bound for a join with two unbroadcastable sides.
    Skewed keys concentrate in their bucket; salt upstream if one key
    dominates.
    """
    if how not in ("inner", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r} (inner | semi | anti)")

    def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
        # parquet-backed datasets expose their Arrow schema as metadata;
        # pandas-block datasets (tests, from_pandas) need a 1-row probe
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return base
        for t in ds.limit(1).iter_batches(batch_size=1, batch_format="pyarrow"):
            return t.schema
        raise ValueError("cannot infer Arrow schema of an empty non-Arrow dataset")

    l_schema = _arrow_schema(left)
    r_schema = _arrow_schema(right)
    l_cols = [n for n in l_schema.names if n != left_on]
    r_cols = [n for n in r_schema.names if n != right_on]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"non-key columns collide: {sorted(overlap)} — rename upstream")
    key_field = l_schema.field(left_on)

    if how != "inner":
        r_cols = []  # semi/anti need key EXISTENCE only — don't ship payload
    l_types = {n: l_schema.field(n).type for n in l_cols}
    r_types = {n: r_schema.field(n).type for n in r_cols}
    unified = pa.schema(
        [pa.field("__key", key_field.type), pa.field("__side", pa.int8()),
         pa.field("__bucket", pa.int32())]
        + [pa.field(n, l_types[n]) for n in l_cols]
        + [pa.field(n, r_types[n]) for n in r_cols]
    )

    def to_unified(side: int, key_col: str, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            key = t[key_col].cast(key_field.type)  # right key may be narrower
            if side == 1 and how != "inner":
                key = key.unique()  # existence combiner: batch-distinct keys
            n = len(key)
            bucket = pa.array(
                (pd.util.hash_array(np.asarray(key)) % num_buckets).astype(np.int32)
            )
            cols = {
                "__key": key,
                "__side": pa.array(np.full(n, side, dtype=np.int8)),
                "__bucket": bucket,
            }
            for name in l_cols + r_cols:
                if name in own:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(n, type=unified.field(name).type)
            return pa.table(cols, schema=unified)

        return fn

    def join_bucket(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lt = t.filter(pc.equal(t["__side"], 0)).select(["__key"] + l_cols)
        rt = t.filter(pc.equal(t["__side"], 1)).select(["__key"] + r_cols)
        lf = lt.to_pandas()
        if how == "inner":
            rf = rt.to_pandas()
            out = lf.merge(rf, on="__key", how="inner")
        else:
            keys = rt["__key"].unique().to_pandas()
            hit = lf["__key"].isin(keys)
            out = lf[hit] if how == "semi" else lf[~hit]
        return out.rename(columns={"__key": left_on})

    lu = left.map_batches(to_unified(0, left_on, l_cols), batch_format="pyarrow")
    ru = right.map_batches(to_unified(1, right_on, r_cols), batch_format="pyarrow")
    return (
        lu.union(ru)
        .groupby("__bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
