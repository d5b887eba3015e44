"""Relational operator coverage over the TPC-H-ish tables: pruned reads,
vectorized Arrow filters/projections, pre-aggregated groupbys, broadcast
hash joins, sort/limit, windowed (sessionized) per-key aggregation.

Each function takes ``sf_dir`` and returns a Dataset/DataFrame whose
column names match the SQL oracle in ``__ray_entry__.oracle_sql`` exactly.
Float aggregates are rounded (4 dp) on both sides so distributed summation
order cannot flip the value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data



def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped aggregate: filter at the read, compute the derived
    revenue column vectorized, pre-aggregable groupby."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def derive(t: pa.Table) -> pa.Table:
        cutoff = pa.scalar(pd.Timestamp("1998-09-02"), type=t["l_shipdate"].type)
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc_price)

    # partial per-batch aggregation (C-speed pandas) → tiny partial stream
    # → driver combine: Ray's builtin Sum/Mean reduce per ROW in Python,
    # which does not survive corpus-sized streams
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                sum_disc=("l_discount", "sum"),
                count_order=("l_quantity", "size"),
            )
            .reset_index()
        )

    partials = (
        ds.map_batches(derive, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()  # a handful of rows per block
    )
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"], sort=False)
        .sum()
        .reset_index()
    )
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    out["avg_disc"] = out["sum_disc"] / out["count_order"]
    out = out.drop(columns=["sum_disc"])
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc"):
        out[c] = out[c].astype(float).round(4)
    out["count_order"] = out["count_order"].astype("int64")
    out = out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "avg_qty", "avg_disc", "count_order"]]
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def revenue_by_nation(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation revenue rollup.

    Join shape for the 100 TB regime (VERDICT r1 #4 — no fact table ever
    collects to the driver):
    - the dimension chain customer⋈nation collapses to ONE small
      custkey→nation dict, broadcast via ``ray.put`` (read once per
      worker, never re-shipped per batch);
    - lineitem pre-aggregates per orderkey inside ``map_batches`` (the
      combiner: revenue/count partials, ~1 row per order per batch);
    - orders maps to (orderkey, nation) via the broadcast lookup;
    - both partial streams hash into orderkey buckets and join inside
      ``groupby(bucket).map_groups`` — the only all-to-all moves partial
      rows, not the lineitem stream.
    """
    from kgray.functions.broadcast import cached_get

    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nat_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    lookup_ref = ray.put(dict(zip(customer["c_custkey"], customer["c_nationkey"].map(nat_of))))

    def orders_side(b: pd.DataFrame) -> pd.DataFrame:
        lookup = cached_get(lookup_ref)
        nat = b["o_custkey"].map(lookup)
        # inner-join semantics: drop orders whose custkey is missing from
        # the customer dimension (astype(str) would otherwise turn the NaN
        # into a literal 'nan' nation group)
        keep = nat.notna()
        return pd.DataFrame(
            {
                "bucket": (b.loc[keep, "o_orderkey"] % num_buckets).astype("int32"),
                "okey": b.loc[keep, "o_orderkey"].astype("int64"),
                "side": np.int8(0),
                "n_name": nat[keep].astype(str),
                "revenue": 0.0,
                "n_items": np.int64(0),
            }
        )

    def lineitem_side(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue"] = b["l_extendedprice"] * (1.0 - b["l_discount"])
        out = (
            b.groupby("l_orderkey", sort=False)["revenue"]
            .agg(revenue="sum", n_items="size")
            .reset_index()
        )
        return pd.DataFrame(
            {
                "bucket": (out["l_orderkey"] % num_buckets).astype("int32"),
                "okey": out["l_orderkey"].astype("int64"),
                "side": np.int8(1),
                "n_name": "",
                "revenue": out["revenue"].astype(float),
                "n_items": out["n_items"].astype("int64"),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        orders_side, batch_format="pandas", batch_size=262144
    )
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        lineitem_side, batch_format="pandas", batch_size=262144
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["okey", "n_name"]]
        l = (
            g[g["side"] == 1]
            .groupby("okey", sort=False)[["revenue", "n_items"]]
            .sum()
            .reset_index()
        )
        m = l.merge(o, on="okey")
        return m.groupby("n_name", sort=False)[["revenue", "n_items"]].sum().reset_index()

    partials = (
        orders.union(line)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ |nation| rows per bucket
    )
    out = partials.groupby("n_name", sort=False).sum().reset_index()
    out["revenue"] = out["revenue"].astype(float).round(4)
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q3-shaped top-k join: unshipped-revenue per order for one
    market segment (reference relational surface; ref has no native Q3 —
    this is the canonical selective fact⋈fact join for the inventory).

    Scale shape mirrors ``revenue_by_nation``: the segment's custkeys are
    a SMALL set broadcast once via ``ray.put``; orders filter at the batch
    against it; lineitem pre-aggregates revenue per orderkey inside
    ``map_batches``; both partial streams meet in orderkey hash buckets.
    Because an orderkey lives wholly inside one bucket, a per-bucket top-k
    is an exact partial — the driver reduces only buckets × k rows.
    """
    from kgray.functions.broadcast import cached_get

    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    keys = customer.loc[customer["c_mktsegment"] == segment, "c_custkey"].to_numpy()
    keys_ref = ray.put(frozenset(int(x) for x in keys))
    cut = pd.Timestamp(cutoff)

    def orders_side(b: pd.DataFrame) -> pd.DataFrame:
        custkeys = cached_get(keys_ref)
        m = (b["o_orderdate"] < cut) & b["o_custkey"].isin(custkeys)
        b = b.loc[m]
        return pd.DataFrame(
            {
                "bucket": (b["o_orderkey"] % num_buckets).astype("int32"),
                "okey": b["o_orderkey"].astype("int64"),
                "side": np.int8(0),
                "o_orderdate": b["o_orderdate"],
                "revenue": 0.0,
            }
        )

    def lineitem_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["l_shipdate"] > cut].copy()
        b["revenue"] = b["l_extendedprice"] * (1.0 - b["l_discount"])
        out = b.groupby("l_orderkey", sort=False)["revenue"].sum().reset_index()
        return pd.DataFrame(
            {
                "bucket": (out["l_orderkey"] % num_buckets).astype("int32"),
                "okey": out["l_orderkey"].astype("int64"),
                "side": np.int8(1),
                "o_orderdate": pd.NaT,
                "revenue": out["revenue"].astype(float),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_side, batch_format="pandas", batch_size=262144
    )
    line = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(lineitem_side, batch_format="pandas", batch_size=262144)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["okey", "o_orderdate"]]
        l = g[g["side"] == 1].groupby("okey", sort=False)["revenue"].sum().reset_index()
        m = l.merge(o, on="okey")
        m["revenue"] = m["revenue"].round(4)
        m = m.sort_values(
            ["revenue", "o_orderdate", "okey"], ascending=[False, True, True]
        ).head(k)
        return m[["okey", "o_orderdate", "revenue"]]

    cands = (
        orders.union(line)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ buckets × k rows
    )
    out = (
        cands.sort_values(["revenue", "o_orderdate", "okey"], ascending=[False, True, True])
        .head(k)
        .reset_index(drop=True)
        .rename(columns={"okey": "o_orderkey"})
    )
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["o_orderdate"] = out["o_orderdate"].dt.strftime("%Y-%m-%d")
    return out[["o_orderkey", "o_orderdate", "revenue"]]


def returned_items(
    sf_dir: str,
    date_from: str = "1998-01-01",
    date_to: str = "1998-04-01",
    k: int = 20,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q10-shaped report: per-customer revenue of returned items in
    a 3-month order window, top-k by revenue.

    Same join ladder as :func:`shipping_priority`: orders filter at the
    batch, lineitem pre-aggregates returned revenue per orderkey, the two
    partial streams meet in orderkey buckets; each bucket emits per-custkey
    partials (bounded by custkeys touched, not rows) and the driver's final
    combine is customer-dimension-sized — the accepted dimension budget
    (``revenue_by_nation`` holds the same customer-keyed broadcast).
    """
    lo, hi = pd.Timestamp(date_from), pd.Timestamp(date_to)

    def orders_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)]
        return pd.DataFrame(
            {
                "bucket": (b["o_orderkey"] % num_buckets).astype("int32"),
                "okey": b["o_orderkey"].astype("int64"),
                "side": np.int8(0),
                "custkey": b["o_custkey"].astype("int64"),
                "revenue": 0.0,
            }
        )

    def lineitem_side(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["l_returnflag"] == "R"].copy()
        b["revenue"] = b["l_extendedprice"] * (1.0 - b["l_discount"])
        out = b.groupby("l_orderkey", sort=False)["revenue"].sum().reset_index()
        return pd.DataFrame(
            {
                "bucket": (out["l_orderkey"] % num_buckets).astype("int32"),
                "okey": out["l_orderkey"].astype("int64"),
                "side": np.int8(1),
                "custkey": np.int64(-1),
                "revenue": out["revenue"].astype(float),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_side, batch_format="pandas", batch_size=262144
    )
    line = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
    ).map_batches(lineitem_side, batch_format="pandas", batch_size=262144)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["okey", "custkey"]]
        l = g[g["side"] == 1].groupby("okey", sort=False)["revenue"].sum().reset_index()
        m = l.merge(o, on="okey")
        return m.groupby("custkey", sort=False)["revenue"].sum().reset_index()

    partials = (
        orders.union(line)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ custkeys-touched rows per bucket
    )
    per_cust = partials.groupby("custkey", sort=False)["revenue"].sum().reset_index()
    per_cust["revenue"] = per_cust["revenue"].round(4)
    dims = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]).to_pandas()
    out = per_cust.merge(dims, left_on="custkey", right_on="c_custkey")
    out = out.sort_values(["revenue", "c_custkey"], ascending=[False, True]).head(k)
    out["revenue"] = out["revenue"].astype(float)
    return out[["c_custkey", "c_name", "revenue", "c_acctbal"]].reset_index(drop=True)


def events_daily(sf_dir: str) -> pd.DataFrame:
    """Per (event_type, day) count + value sum — the tumbling-window shape."""

    def derive(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        return pa.table({"event_type": t["event_type"], "day": day, "value": t["value"]})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (
            b.groupby(["event_type", "day"], sort=False)["value"]
            .agg(n_events="size", sum_value="sum")
            .reset_index()
        )

    partials = (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(derive, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    out = partials.groupby(["event_type", "day"], sort=False).sum().reset_index()
    out["sum_value"] = out["sum_value"].astype(float).round(4)
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def top_parts(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Global sort + limit."""
    return (
        _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
        .sort(["p_retailprice", "p_partkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )


def user_sessions(sf_dir: str, gap_minutes: int = 30, num_buckets: int = 64) -> pd.DataFrame:
    """Sessionization: per-user ordered event stream split at >gap_minutes
    idle gaps — the stream-shaped windowed aggregate.  Users hash into
    buckets (one UDF dispatch per bucket); inside a bucket, session starts
    are computed fully vectorized: first event per user OR gap exceeded."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (b["user_id"] % num_buckets).astype("int32")
        return b

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = b["ts"].to_numpy()
        uid = b["user_id"].to_numpy()
        new_session = np.ones(len(b), dtype=bool)
        if len(b) > 1:
            same_user = uid[1:] == uid[:-1]
            new_session[1:] = ~same_user | ((ts[1:] - ts[:-1]) > gap)
        out = (
            pd.DataFrame({"user_id": uid, "new_session": new_session})
            .groupby("user_id", sort=False)["new_session"]
            .agg(n_events="size", n_sessions="sum")
            .reset_index()
        )
        out["user_id"] = out["user_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "ts"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
