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


def revenue_by_nation(
    sf_dir: str, num_buckets: int = 64, broadcast_dim_max: int = 5_000_000
) -> pd.DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation revenue rollup.

    Join shape for the 100 TB regime (VERDICT r1 #4 — no fact table ever
    collects to the driver):
    - nation (25 rows) always broadcasts; customer is SF-PROPORTIONAL, so
      it gets a ladder (VERDICT r2 #2): below ``broadcast_dim_max`` rows
      the custkey→nation dict broadcasts via ``ray.put`` (read once per
      worker, never re-shipped per batch); above it — or with the knob
      forced to 0 — customer and orders meet in a CUSTKEY hash-bucket
      partial join that emits the same (orderkey, nation) stream without
      any driver-resident dimension;
    - lineitem pre-aggregates per orderkey inside ``map_batches`` (the
      combiner: revenue/count partials, ~1 row per order per batch);
    - both partial streams hash into orderkey buckets and join inside
      ``groupby(bucket).map_groups`` — the all-to-alls move partial rows,
      not the lineitem stream.
    """
    from kgray.functions.broadcast import cached_get

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nat_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    customer_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    if customer_ds.count() <= broadcast_dim_max:
        customer = customer_ds.to_pandas()
        lookup_ref = ray.put(
            dict(zip(customer["c_custkey"], customer["c_nationkey"].map(nat_of)))
        )

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

        orders = orders_ds.map_batches(orders_side, batch_format="pandas", batch_size=262144)
    else:
        nat_ref = ray.put(nat_of)

        def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "cbucket": (b["c_custkey"] % num_buckets).astype("int32"),
                    "ckey": b["c_custkey"].astype("int64"),
                    "cside": np.int8(0),
                    "okey": np.int64(-1),
                    "n_name": b["c_nationkey"].map(cached_get(nat_ref)).astype(str),
                }
            )

        def order_rows(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "cbucket": (b["o_custkey"] % num_buckets).astype("int32"),
                    "ckey": b["o_custkey"].astype("int64"),
                    "cside": np.int8(1),
                    "okey": b["o_orderkey"].astype("int64"),
                    "n_name": "",
                }
            )

        def join_cust(g: pd.DataFrame) -> pd.DataFrame:
            c = g[g["cside"] == 0][["ckey", "n_name"]]
            o = g[g["cside"] == 1][["ckey", "okey"]]
            m = o.merge(c.drop_duplicates("ckey"), on="ckey")  # inner: missing custkeys drop
            return pd.DataFrame(
                {
                    "bucket": (m["okey"] % num_buckets).astype("int32"),
                    "okey": m["okey"].astype("int64"),
                    "side": np.int8(0),
                    "n_name": m["n_name"].astype(str),
                    "revenue": 0.0,
                    "n_items": np.int64(0),
                }
            )

        orders = (
            customer_ds.map_batches(cust_rows, batch_format="pandas", batch_size=262144)
            .union(orders_ds.map_batches(order_rows, batch_format="pandas", batch_size=262144))
            .groupby("cbucket")
            .map_groups(join_cust, batch_format="pandas")
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
    broadcast_dim_max: int = 5_000_000,
) -> pd.DataFrame:
    """TPC-H Q3-shaped top-k join: unshipped-revenue per order for one
    market segment (reference relational surface; ref has no native Q3 —
    this is the canonical selective fact⋈fact join for the inventory).

    Scale shape mirrors ``revenue_by_nation``: below ``broadcast_dim_max``
    customer rows the segment's custkeys broadcast once via ``ray.put``
    and orders filter at the batch; above it (VERDICT r2 #2) the
    segment-filtered customer stream and the date-filtered orders stream
    semi-join in CUSTKEY hash buckets instead — no driver-resident
    dimension.  lineitem pre-aggregates revenue per orderkey inside
    ``map_batches``; both partial streams meet in orderkey hash buckets.
    Because an orderkey lives wholly inside one bucket, a per-bucket top-k
    is an exact partial — the driver reduces only buckets × k rows.
    """
    from kgray.functions.broadcast import cached_get

    cut = pd.Timestamp(cutoff)
    customer_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    if customer_ds.count() <= broadcast_dim_max:
        customer = customer_ds.to_pandas()
        keys = customer.loc[customer["c_mktsegment"] == segment, "c_custkey"].to_numpy()
        keys_ref = ray.put(frozenset(int(x) for x in keys))

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

        orders = orders_ds.map_batches(orders_side, batch_format="pandas", batch_size=262144)
    else:

        def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
            b = b.loc[b["c_mktsegment"] == segment]
            return pd.DataFrame(
                {
                    "cbucket": (b["c_custkey"] % num_buckets).astype("int32"),
                    "ckey": b["c_custkey"].astype("int64"),
                    "cside": np.int8(0),
                    "okey": np.int64(-1),
                    "o_orderdate": pd.NaT,
                }
            )

        def order_rows(b: pd.DataFrame) -> pd.DataFrame:
            b = b.loc[b["o_orderdate"] < cut]
            return pd.DataFrame(
                {
                    "cbucket": (b["o_custkey"] % num_buckets).astype("int32"),
                    "ckey": b["o_custkey"].astype("int64"),
                    "cside": np.int8(1),
                    "okey": b["o_orderkey"].astype("int64"),
                    "o_orderdate": b["o_orderdate"],
                }
            )

        def semi_join(g: pd.DataFrame) -> pd.DataFrame:
            seg_keys = g.loc[g["cside"] == 0, "ckey"]
            o = g[(g["cside"] == 1) & g["ckey"].isin(set(seg_keys))]
            return pd.DataFrame(
                {
                    "bucket": (o["okey"] % num_buckets).astype("int32"),
                    "okey": o["okey"].astype("int64"),
                    "side": np.int8(0),
                    "o_orderdate": o["o_orderdate"],
                    "revenue": 0.0,
                }
            )

        orders = (
            customer_ds.map_batches(cust_rows, batch_format="pandas", batch_size=262144)
            .union(orders_ds.map_batches(order_rows, batch_format="pandas", batch_size=262144))
            .groupby("cbucket")
            .map_groups(semi_join, batch_format="pandas")
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
    broadcast_dim_max: int = 5_000_000,
) -> pd.DataFrame:
    """TPC-H Q10-shaped report: per-customer revenue of returned items in
    a 3-month order window, top-k by revenue.

    Same join ladder as :func:`shipping_priority`: orders filter at the
    batch, lineitem pre-aggregates returned revenue per orderkey, the two
    partial streams meet in orderkey buckets; each bucket emits per-custkey
    partials (bounded by custkeys touched, not rows).  Below
    ``broadcast_dim_max`` customer rows the final name/acctbal attach is a
    driver merge; above it (VERDICT r2 #2) the partials re-bucket on
    CUSTKEY, meet the customer-dimension stream there, and each bucket
    emits an exact local top-k (a custkey lives wholly inside one bucket)
    — the driver reduces only buckets × k rows.
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

    partial_ds = orders.union(line).groupby("bucket").map_groups(
        per_bucket, batch_format="pandas"
    )
    dims_ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    if dims_ds.count() <= broadcast_dim_max:
        partials = partial_ds.to_pandas()  # ≤ custkeys-touched rows per bucket
        per_cust = partials.groupby("custkey", sort=False)["revenue"].sum().reset_index()
        per_cust["revenue"] = per_cust["revenue"].round(4)
        dims = dims_ds.to_pandas()
        out = per_cust.merge(dims, left_on="custkey", right_on="c_custkey")
        out = out.sort_values(["revenue", "c_custkey"], ascending=[False, True]).head(k)
        out["revenue"] = out["revenue"].astype(float)
        return out[["c_custkey", "c_name", "revenue", "c_acctbal"]].reset_index(drop=True)

    def part_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cbucket": (b["custkey"] % num_buckets).astype("int32"),
                "ckey": b["custkey"].astype("int64"),
                "cside": np.int8(1),
                "revenue": b["revenue"].astype(float),
                "c_name": "",
                "c_acctbal": 0.0,
            }
        )

    def dim_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cbucket": (b["c_custkey"] % num_buckets).astype("int32"),
                "ckey": b["c_custkey"].astype("int64"),
                "cside": np.int8(0),
                "revenue": 0.0,
                "c_name": b["c_name"].astype(str),
                "c_acctbal": b["c_acctbal"].astype(float),
            }
        )

    def per_cbucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["cside"] == 1].groupby("ckey", sort=False)["revenue"].sum().reset_index()
        p["revenue"] = p["revenue"].round(4)
        d = g[g["cside"] == 0][["ckey", "c_name", "c_acctbal"]]
        m = p.merge(d.drop_duplicates("ckey"), on="ckey")
        m = m.sort_values(["revenue", "ckey"], ascending=[False, True]).head(k)
        return m[["ckey", "c_name", "revenue", "c_acctbal"]]

    cands = (
        partial_ds.map_batches(part_rows, batch_format="pandas")
        .union(dims_ds.map_batches(dim_rows, batch_format="pandas", batch_size=262144))
        .groupby("cbucket")
        .map_groups(per_cbucket, batch_format="pandas")
        .to_pandas()  # ≤ buckets × k rows
    )
    out = (
        cands.sort_values(["revenue", "ckey"], ascending=[False, True])
        .head(k)
        .rename(columns={"ckey": "c_custkey"})
        .reset_index(drop=True)
    )
    out["revenue"] = out["revenue"].astype(float)
    out["c_custkey"] = out["c_custkey"].astype("int64")
    return out[["c_custkey", "c_name", "revenue", "c_acctbal"]]


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


def dormant_customers(
    sf_dir: str,
    since: str = "2000-01-01",
    num_buckets: int = 64,
    broadcast_keys_max: int = 5_000_000,
) -> pd.DataFrame:
    """TPC-H Q22-shaped ANTI-JOIN report: per-nation count + total balance
    of customers whose account balance exceeds the global positive-balance
    average and who placed NO order on/after ``since`` (dormant
    high-balance accounts).

    This is the one relational shape the other reports don't cover — a
    fact-table NOT-EXISTS.  Scale ladder:

    - the global average is two scalar passes over the (pruned, 3-column)
      customer stream: per-batch (sum, count) partials, driver divide —
      no shuffle;
    - the orders side pre-shrinks to DISTINCT recent custkeys inside
      ``map_batches`` (the anti-join only needs key existence, so the
      combiner drops the fact stream to ≤ |customers| keys before any
      exchange);
    - below ``broadcast_keys_max`` order rows the distinct-key set
      broadcasts once via ``ray.put`` and eligibility is a vectorized
      ``np.isin`` filter per customer batch (no shuffle at all);
    - above it — or with the knob forced to 0 — the key partials and the
      eligible-customer stream meet in CUSTKEY hash buckets and each
      bucket emits per-nation (count, balance) partials; the driver
      reduces ≤ buckets x nations rows.
    """
    from kgray.functions.broadcast import cached_get

    cutoff = pd.Timestamp(since)
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def avg_partial(b: pd.DataFrame) -> pd.DataFrame:
        pos = b.loc[b["c_acctbal"] > 0.0, "c_acctbal"]
        return pd.DataFrame({"s": [pos.sum()], "n": [len(pos)]})

    parts = cust_ds.map_batches(avg_partial, batch_format="pandas", batch_size=262144).to_pandas()
    n_pos = int(parts["n"].sum())
    if not n_pos:
        return pd.DataFrame(
            {
                "c_nationkey": pd.Series(dtype="int64"),
                "numcust": pd.Series(dtype="int64"),
                "totacctbal": pd.Series(dtype="float64"),
            }
        )
    threshold = float(parts["s"].sum()) / n_pos

    orders_ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent_keys(b: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(b.loc[b["o_orderdate"] >= cutoff, "o_custkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"ckey": keys})

    keys_ds = orders_ds.map_batches(recent_keys, batch_format="pandas", batch_size=262144)

    def finish(per_cust: pd.DataFrame) -> pd.DataFrame:
        out = (
            per_cust.groupby("c_nationkey", sort=True)
            .agg(numcust=("numcust", "sum"), totacctbal=("totacctbal", "sum"))
            .reset_index()
        )
        out["c_nationkey"] = out["c_nationkey"].astype("int64")
        out["numcust"] = out["numcust"].astype("int64")
        out["totacctbal"] = out["totacctbal"].astype(float).round(4)
        return out

    if orders_ds.count() <= broadcast_keys_max:
        keys = np.unique(keys_ds.to_pandas()["ckey"].to_numpy(dtype=np.int64))
        keys_ref = ray.put(keys)

        def anti(b: pd.DataFrame) -> pd.DataFrame:
            k = cached_get(keys_ref)
            b = b.loc[b["c_acctbal"] > threshold]
            b = b.loc[~np.isin(b["c_custkey"].to_numpy(dtype=np.int64), k, assume_unique=False)]
            return (
                b.groupby("c_nationkey", sort=False)
                .agg(numcust=("c_custkey", "size"), totacctbal=("c_acctbal", "sum"))
                .reset_index()
            )

        return finish(
            cust_ds.map_batches(anti, batch_format="pandas", batch_size=262144).to_pandas()
        )

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["c_acctbal"] > threshold]
        return pd.DataFrame(
            {
                "bucket": (b["c_custkey"] % num_buckets).astype("int32"),
                "ckey": b["c_custkey"].astype("int64"),
                "side": np.int8(0),
                "nation": b["c_nationkey"].astype("int64"),
                "acctbal": b["c_acctbal"].astype(float),
            }
        )

    def key_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": (b["ckey"] % num_buckets).astype("int32"),
                "ckey": b["ckey"].astype("int64"),
                "side": np.int8(1),
                "nation": np.int64(-1),
                "acctbal": 0.0,
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ordered = g.loc[g["side"] == 1, "ckey"].unique()
        c = g[g["side"] == 0]
        c = c.loc[~np.isin(c["ckey"].to_numpy(dtype=np.int64), ordered)]
        return (
            c.groupby("nation", sort=False)
            .agg(numcust=("ckey", "size"), totacctbal=("acctbal", "sum"))
            .reset_index()
            .rename(columns={"nation": "c_nationkey"})
        )

    per_cust = (
        cust_ds.map_batches(cust_rows, batch_format="pandas", batch_size=262144)
        .union(keys_ds.map_batches(key_rows, batch_format="pandas"))
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ buckets x nations rows
    )
    if "c_nationkey" not in per_cust.columns:  # all-empty blocks lose schema
        return finish(pd.DataFrame({"c_nationkey": [], "numcust": [], "totacctbal": []}))
    return finish(per_cust)


def order_priority_returns(
    sf_dir: str,
    num_buckets: int = 64,
    broadcast_keys_max: int = 5_000_000,
) -> pd.DataFrame:
    """TPC-H Q4-shaped EXISTS report: per-priority count of orders with at
    least one RETURNED lineitem — the semi-join mirror of
    :func:`dormant_customers`'s anti-join.

    Scale ladder: the lineitem side pre-shrinks to DISTINCT returned
    orderkeys inside ``map_batches`` (existence needs keys only); below
    ``broadcast_keys_max`` lineitem rows the key set broadcasts via
    ``ray.put`` and eligibility is a vectorized ``np.isin`` per order
    batch; above it the generic reduce-side ``hash_join(how='semi')``
    co-locates keys and orders in orderkey hash buckets.  Either way the
    driver reduces only (priority, count) partials."""
    from kgray.functions.broadcast import cached_get
    from kgray.ops.join import hash_join

    orders_ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li_ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def ret_keys(b: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(
            b.loc[b["l_returnflag"] == "R", "l_orderkey"].to_numpy(dtype=np.int64)
        )
        return pd.DataFrame({"rkey": keys})

    keys_ds = li_ds.map_batches(ret_keys, batch_format="pandas", batch_size=262144)

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("o_orderpriority", sort=False).size().rename("n").reset_index()
        return out

    if li_ds.count() <= broadcast_keys_max:
        keys = np.unique(keys_ds.to_pandas().get("rkey", pd.Series(dtype="int64")).to_numpy(dtype=np.int64))
        keys_ref = ray.put(keys)

        def semi(b: pd.DataFrame) -> pd.DataFrame:
            k = cached_get(keys_ref)
            return count_partial(b[np.isin(b["o_orderkey"].to_numpy(dtype=np.int64), k)])

        parts = orders_ds.map_batches(semi, batch_format="pandas", batch_size=262144).to_pandas()
    else:
        joined = hash_join(orders_ds, keys_ds, "o_orderkey", "rkey", how="semi",
                           num_buckets=num_buckets)
        parts = joined.map_batches(count_partial, batch_format="pandas").to_pandas()
    if "o_orderpriority" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {"o_orderpriority": pd.Series(dtype=object), "n_orders": pd.Series(dtype="int64")}
        )
    out = (
        parts.groupby("o_orderpriority", sort=True)["n"].sum().astype("int64")
        .rename("n_orders").reset_index()
    )
    return out


def priority_shipmonths(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """TPC-H Q12-shaped report over the columns this schema has: per ship
    MONTH, how many lineitems belong to high-priority (1-URGENT/2-HIGH)
    vs lower-priority orders.  The join is the genuinely big×big shape —
    lineitem ⋈ orders on orderkey via the generic reduce-side
    ``hash_join`` (both streams move once into orderkey hash buckets);
    the aggregate is per-batch (month, hi/lo) partials + a driver combine
    over month-count-sized rows."""
    from kgray.ops.join import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def month_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype("int64"),
                "ship_month": b["l_shipdate"].astype("datetime64[ns]").dt.strftime("%Y-%m"),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = hash_join(
        li.map_batches(month_rows, batch_format="pandas"),
        orders,
        "l_orderkey",
        "o_orderkey",
        num_buckets=num_buckets,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hi = b["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        return (
            pd.DataFrame({"ship_month": b["ship_month"], "hi": hi})
            .groupby("ship_month", sort=False)["hi"]
            .agg(high_count="sum", low_count=lambda s: int((~s).sum()))
            .reset_index()
        )

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    if "ship_month" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {
                "ship_month": pd.Series(dtype=object),
                "high_count": pd.Series(dtype="int64"),
                "low_count": pd.Series(dtype="int64"),
            }
        )
    out = (
        parts.groupby("ship_month", sort=True)[["high_count", "low_count"]]
        .sum().astype("int64").reset_index()
    )
    return out


def small_qty_revenue(sf_dir: str, brand: str = "Brand#12") -> pd.DataFrame:
    """TPC-H Q17-shaped correlated-average report: yearly revenue lost by
    fulfilling orders for ``brand`` parts whose quantity sits below 20 % of
    that PART's own average order quantity.

    Exactness: the predicate ``qty < 0.2·avg(qty)`` is evaluated in pure
    int64 cents — ``5·qty_cents·cnt < sum_cents`` — and the revenue sum is
    integer cents with one final division, so engine and twin agree
    bit-for-bit (no float average ever materializes).

    Scale shape: the brand's partkeys broadcast (a brand is ~1/25 of the
    part dimension); pass 1 folds lineitem batches to per-(brand-)part
    (sum, count) partials via Arrow ``group_by`` — driver reduce traffic
    is blocks × brand parts, never the fact stream; the per-part stats
    broadcast back and pass 2 is a streaming filtered integer sum (one
    row per batch)."""
    from kgray.functions.broadcast import cached_get

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    def brand_keys(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pkey": b.loc[b["p_brand"] == brand, "p_partkey"].to_numpy(dtype=np.int64)}
        )

    bp = part_ds.map_batches(brand_keys, batch_format="pandas").to_pandas()
    keys = np.sort(bp["pkey"].to_numpy(dtype=np.int64)) if len(bp) else np.empty(0, np.int64)
    empty = pd.DataFrame({"avg_yearly": pd.Series([0.0], dtype="float64")})
    if not len(keys):
        return empty
    keys_ref = ray.put(keys)

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partial(t: pa.Table) -> pa.Table:
        ks = cached_get(keys_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        m = np.isin(pk, ks)
        qc = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)[m] * 100.0 + 0.5)
        return (
            pa.table(
                {"pkey": pa.array(pk[m], pa.int64()), "qc": pa.array(qc.astype(np.int64), pa.int64())}
            )
            .group_by("pkey")
            .aggregate([("qc", "sum"), ([], "count_all")])
        )

    parts = li.map_batches(qty_partial, batch_format="pyarrow").to_pandas()
    if "pkey" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("pkey", sort=False)[["qc_sum", "count_all"]].sum()
    stats_ref = ray.put(
        {
            int(k): (int(s), int(c))
            for k, s, c in zip(agg.index, agg["qc_sum"], agg["count_all"])
        }
    )

    def rev_partial(t: pa.Table) -> pa.Table:
        st = cached_get(stats_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        m = np.isin(pk, cached_get(keys_ref))
        if not m.any():
            return pa.table({"sp": pa.array([0], pa.int64())})
        qc = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)[m] * 100.0 + 0.5).astype(
            np.int64
        )
        ep = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100.0 + 0.5
        ).astype(np.int64)
        sums = np.array([st[int(k)][0] for k in pk[m]], dtype=np.int64)
        cnts = np.array([st[int(k)][1] for k in pk[m]], dtype=np.int64)
        keep = 5 * qc * cnts < sums
        return pa.table({"sp": pa.array([int(ep[keep].sum())], pa.int64())})

    sp = int(li.map_batches(rev_partial, batch_format="pyarrow").to_pandas()["sp"].sum())
    avg_yearly = np.floor(sp / 100.0 / 7.0 * 100.0 + 0.5) / 100.0
    return pd.DataFrame({"avg_yearly": pd.Series([avg_yearly], dtype="float64")})


def large_orders(
    sf_dir: str, min_qty: float = 300.0, num_buckets: int = 64
) -> pd.DataFrame:
    """TPC-H Q18-shaped large-volume-customer report: orders whose total
    line quantity exceeds ``min_qty``, with customer name, order header
    fields and the quantity total.

    Scale shape: lineitem folds to per-order quantity partials inside
    each batch (Arrow ``group_by`` combiner), the partials meet in
    ORDERKEY hash buckets (``groupby().map_groups`` — the one shuffle,
    carrying 2-int rows), and each bucket emits only orders above the
    threshold — a vanishing fraction by construction.  The qualifying
    keyset broadcasts; orders and customer attach as streaming filtered
    scans (no dimension shuffle)."""
    from kgray.functions.broadcast import cached_get

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(b: pd.DataFrame) -> pd.DataFrame:
        qc = np.floor(b["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        out = (
            pd.DataFrame({"okey": b["l_orderkey"].to_numpy(dtype=np.int64), "qc": qc})
            .groupby("okey", sort=False)["qc"]
            .sum()
            .reset_index()
        )
        out["bucket"] = (out["okey"] % num_buckets).astype("int32")
        return out

    thresh_cents = int(np.floor(min_qty * 100.0 + 0.5))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("okey", sort=False)["qc"].sum()
        tot = tot[tot > thresh_cents]
        return pd.DataFrame(
            {"okey": tot.index.to_numpy(dtype=np.int64), "qc": tot.to_numpy(dtype=np.int64)}
        )

    hot = (
        li.map_batches(qty_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "c_custkey": pd.Series(dtype="int64"),
            "c_name": pd.Series(dtype=object),
            "o_orderkey": pd.Series(dtype="int64"),
            "o_totalprice": pd.Series(dtype="float64"),
            "sum_qty": pd.Series(dtype="float64"),
        }
    )
    if "okey" not in hot.columns or not len(hot):
        return empty
    okeys_ref = ray.put(np.sort(hot["okey"].to_numpy(dtype=np.int64)))

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(b["o_orderkey"].to_numpy(dtype=np.int64), cached_get(okeys_ref))
        return b.loc[m, ["o_orderkey", "o_custkey", "o_totalprice"]]

    orders = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(order_rows, batch_format="pandas")
        .to_pandas()
    )
    if "o_orderkey" not in orders.columns or not len(orders):
        return empty
    ckeys_ref = ray.put(np.unique(orders["o_custkey"].to_numpy(dtype=np.int64)))

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(b["c_custkey"].to_numpy(dtype=np.int64), cached_get(ckeys_ref))
        return b.loc[m, ["c_custkey", "c_name"]]

    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(cust_rows, batch_format="pandas")
        .to_pandas()
    )
    out = orders.merge(hot, left_on="o_orderkey", right_on="okey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    out["sum_qty"] = out["qc"].to_numpy(dtype=np.float64) / 100.0
    out = out[["c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty"]]
    return out.sort_values("o_orderkey").reset_index(drop=True)


def top_supplier(
    sf_dir: str, since: str = "1996-01-01", until: str = "1996-04-01"
) -> pd.DataFrame:
    """TPC-H Q15-shaped argmax report: the supplier(s) with the highest
    discounted revenue over one quarter (ties all kept — the reference
    Q15 semantics via the max-subquery, not LIMIT 1).

    Exactness: per-row revenue quantizes to cents AFTER the double
    product ``l_extendedprice·(1−l_discount)`` — the twin spells the same
    expression — so per-supplier totals are exact integer sums.

    Scale shape: one pruned fact scan folding each batch to per-supplier
    int partials (supplier dimension is ~1/7000 of lineitem); the driver
    reduce is blocks × suppliers; the argmax + name attach touch only the
    supplier dimension (streaming filtered scan, no shuffle)."""
    from kgray.functions.broadcast import cached_get

    lo, hi = pd.Timestamp(since), pd.Timestamp(until)

    def rev_partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
        if not m.any():
            return pd.DataFrame({"skey": pd.Series(dtype="int64"), "rc": pd.Series(dtype="int64")})
        rc = np.floor(
            b.loc[m, "l_extendedprice"].to_numpy()
            * (1.0 - b.loc[m, "l_discount"].to_numpy())
            * 100.0
            + 0.5
        ).astype(np.int64)
        out = (
            pd.DataFrame({"skey": b.loc[m, "l_suppkey"].to_numpy(dtype=np.int64), "rc": rc})
            .groupby("skey", sort=False)["rc"]
            .sum()
            .reset_index()
        )
        return out

    parts = (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(rev_partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "s_suppkey": pd.Series(dtype="int64"),
            "s_name": pd.Series(dtype=object),
            "total_revenue": pd.Series(dtype="float64"),
        }
    )
    if "skey" not in parts.columns or not len(parts):
        return empty
    tot = parts.groupby("skey", sort=False)["rc"].sum()
    best = int(tot.max())
    winners = np.sort(tot[tot == best].index.to_numpy(dtype=np.int64))
    win_ref = ray.put(winners)

    def name_rows(b: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(b["s_suppkey"].to_numpy(dtype=np.int64), cached_get(win_ref))
        return b.loc[m, ["s_suppkey", "s_name"]]

    names = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(name_rows, batch_format="pandas")
        .to_pandas()
    )
    out = names.sort_values("s_suppkey").reset_index(drop=True)
    out["total_revenue"] = best / 100.0
    return out


_Q19_BRANCHES = (
    ("Brand#11", 1, 10, 1.0, 20.0),
    ("Brand#21", 11, 20, 10.0, 30.0),
    ("Brand#31", 21, 40, 20.0, 40.0),
)


def brand_disjunction_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: three OR-ed
    (brand, size-window, quantity-window) branches — the shape that
    stresses predicate evaluation rather than joins.

    Scale shape: the part dimension prunes to the union of branch-
    eligible parts and broadcasts a partkey → quantity-window map (a
    part matches at most one brand, so one (lo, hi) per key); the fact
    scan is a single streaming pass emitting one integer cent-sum row
    per batch.  Revenue quantizes per row after the same double product
    as the twin."""
    from kgray.functions.broadcast import cached_get

    def part_map(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for brand, slo, shi, qlo, qhi in _Q19_BRANCHES:
            m = (b["p_brand"] == brand) & (b["p_size"] >= slo) & (b["p_size"] <= shi)
            if m.any():
                rows.append(
                    pd.DataFrame(
                        {
                            "pkey": b.loc[m, "p_partkey"].to_numpy(dtype=np.int64),
                            "qlo": int(np.floor(qlo * 100.0 + 0.5)),
                            "qhi": int(np.floor(qhi * 100.0 + 0.5)),
                        }
                    )
                )
        if not rows:
            return pd.DataFrame(
                {
                    "pkey": pd.Series(dtype="int64"),
                    "qlo": pd.Series(dtype="int64"),
                    "qhi": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(rows, ignore_index=True)

    pm = (
        _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
        .map_batches(part_map, batch_format="pandas")
        .to_pandas()
    )
    if "pkey" not in pm.columns or not len(pm):
        return pd.DataFrame({"revenue": pd.Series([0.0], dtype="float64")})
    win_ref = ray.put(
        {int(k): (int(a), int(b)) for k, a, b in zip(pm["pkey"], pm["qlo"], pm["qhi"])}
    )

    def rev_partial(t: pa.Table) -> pa.Table:
        win = cached_get(win_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        m = np.isin(pk, np.fromiter(win.keys(), dtype=np.int64, count=len(win)))
        if not m.any():
            return pa.table({"rc": pa.array([0], pa.int64())})
        qc = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)[m] * 100.0 + 0.5).astype(
            np.int64
        )
        lo = np.array([win[int(k)][0] for k in pk[m]], dtype=np.int64)
        hi = np.array([win[int(k)][1] for k in pk[m]], dtype=np.int64)
        keep = (qc >= lo) & (qc <= hi)
        rc = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[m][keep]
            * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)[m][keep])
            * 100.0
            + 0.5
        ).astype(np.int64)
        return pa.table({"rc": pa.array([int(rc.sum())], pa.int64())})

    rc = int(
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(rev_partial, batch_format="pyarrow")
        .to_pandas()["rc"]
        .sum()
    )
    return pd.DataFrame({"revenue": pd.Series([rc / 100.0], dtype="float64")})


def events_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUPING-SETS rollup in one pass: per (event_type, day) counts and
    value sums PLUS per-type subtotals PLUS the grand total — the OLAP
    rollup shape, computed from ONE partial stream (no re-scan per level).

    Scale shape: the same (type, day, count, cent-sum) Arrow partials as
    ``events_daily``; the driver derives all three aggregation levels
    from the combined (types × days)-bounded table — subtotals are free
    once the finest level is partial-aggregated.  'ALL' is the rollup
    label on both engines."""

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return (
            pa.table({"event_type": t["event_type"], "day": day, "c": cents})
            .group_by(["event_type", "day"])
            .aggregate([("c", "sum"), ([], "count_all")])
        )

    parts = (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if "event_type" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype=object),
                "day": pd.Series(dtype=object),
                "n_events": pd.Series(dtype="int64"),
                "sum_value": pd.Series(dtype="float64"),
            }
        )
    fine = (
        parts.groupby(["event_type", "day"], sort=False)[["c_sum", "count_all"]]
        .sum()
        .reset_index()
    )
    by_type = fine.groupby("event_type", sort=False)[["c_sum", "count_all"]].sum().reset_index()
    by_type["day"] = "ALL"
    total = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "day": ["ALL"],
            "c_sum": [fine["c_sum"].sum()],
            "count_all": [fine["count_all"].sum()],
        }
    )
    out = pd.concat([fine, by_type, total], ignore_index=True)
    out["n_events"] = out["count_all"].astype("int64")
    out["sum_value"] = out["c_sum"].to_numpy(dtype=np.float64) / 100.0
    out = out[["event_type", "day", "n_events", "sum_value"]]
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def order_fulfillment_latency(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Order-to-first-shipment latency histogram: per order, days between
    ``o_orderdate`` and the EARLIEST ``l_shipdate``; output is the count
    of orders per whole-day latency — the fact×fact temporal-join +
    domain-bounded histogram shape.

    Scale shape: lineitem folds to per-order min-shipdate partials inside
    each batch; both partials and the (pruned) orders stream meet in
    ORDERKEY hash buckets (one shuffle); each bucket joins vectorized and
    emits (latency_day, count) partials — the driver reduce is bounded by
    the latency DOMAIN, not the order count."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def ship_partial(t: pa.Table) -> pa.Table:
        out = (
            pa.table(
                {
                    "okey": t["l_orderkey"],
                    "ship_us": t["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                }
            )
            .group_by("okey")
            .aggregate([("ship_us", "min")])
        )
        return out.append_column(
            "side", pa.array(np.zeros(len(out), dtype=np.int8), pa.int8())
        )

    def order_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": t["o_orderkey"],
                "ship_us_min": t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                "side": pa.array(np.ones(len(t), dtype=np.int8), pa.int8()),
            }
        )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (b["okey"] % num_buckets).astype("int32")
        return b

    tagged = (
        li.map_batches(ship_partial, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
                order_rows, batch_format="pyarrow"
            )
        )
        .map_batches(add_bucket, batch_format="pandas")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ships = g[g["side"] == 0].groupby("okey", sort=False)["ship_us_min"].min()
        orders = g[g["side"] == 1].set_index("okey")["ship_us_min"]
        joined = ships.to_frame("ship").join(orders.to_frame("odate"), how="inner")
        days = ((joined["ship"] - joined["odate"]) // 86_400_000_000).astype("int64")
        out = days.value_counts().reset_index()
        out.columns = ["latency_days", "n_orders"]
        return out

    parts = (
        tagged.groupby("bucket").map_groups(per_bucket, batch_format="pandas").to_pandas()
    )
    if "latency_days" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {"latency_days": pd.Series(dtype="int64"), "n_orders": pd.Series(dtype="int64")}
        )
    out = parts.groupby("latency_days", sort=True)["n_orders"].sum().reset_index()
    out["latency_days"] = out["latency_days"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def customer_ltv_quantiles(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Customer-lifetime-value decile profile: per-customer order-total
    sums (int cents), then exact discrete deciles over the per-customer
    distribution — the aggregate→quantile two-stage composition every
    LTV/segmentation report needs.

    Scale shape: orders fold to per-customer cent partials inside each
    batch; one CUSTKEY hash-bucket shuffle totals them; the per-customer
    LTV stream then feeds the shared histogram-quantile kernel
    (kgray.ops.stats.grouped_quantiles) whose exchange is bounded by the
    distinct LTV value domain, never the customer count."""
    from kgray.ops.stats import grouped_quantiles

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(b["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        out = (
            pd.DataFrame({"ckey": b["o_custkey"].to_numpy(dtype=np.int64), "c": c})
            .groupby("ckey", sort=False)["c"]
            .sum()
            .reset_index()
        )
        out["bucket"] = (out["ckey"] % num_buckets).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("ckey", sort=False)["c"].sum()
        return pd.DataFrame(
            {"grp": "all", "ltv_cents": tot.to_numpy(dtype=np.int64)}
        )

    ltv = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    out = grouped_quantiles(ltv, group_col="grp", value_col="ltv_cents")
    for c in out.columns:
        if c != "grp":
            out[c] = out[c].astype("int64")
    return out


def part_skyline(sf_dir: str) -> pd.DataFrame:
    """Pareto-frontier (SKYLINE) query over the part dimension: parts not
    dominated on (cheaper-or-equal price, larger-or-equal size, strictly
    better in one) — the multi-criteria shortlist shape missing from
    plain SQL aggregates.  Identical (price, size) points do not dominate
    each other (both kept).

    Exactness: price quantizes to int cents; dominance is pure integer
    comparison; the vectorized kernel is sort (price asc, size desc) +
    one prefix-max — no pairwise loop.

    Scale shape: each batch reduces to its LOCAL skyline (the global
    skyline is a subset of every partition's skyline union — the textbook
    distributed-skyline property), so the driver merge sees only frontier
    candidates, never the dimension."""

    def local_skyline(b: pd.DataFrame) -> pd.DataFrame:
        pc_ = np.floor(b["p_retailprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        sz = b["p_size"].to_numpy(dtype=np.int64)
        key = b["p_partkey"].to_numpy(dtype=np.int64)
        order = np.lexsort((key, -sz, pc_))  # price asc, size desc
        pc_, sz, key = pc_[order], sz[order], key[order]
        # max size among STRICTLY cheaper points, per position: the prefix
        # max as of the row before each price group starts, repeated over
        # the group (all vectorized — no per-group loop)
        grp_start = np.concatenate(([True], pc_[1:] != pc_[:-1]))
        run_max = np.maximum.accumulate(sz)
        idx = np.flatnonzero(grp_start)
        lengths = np.diff(np.append(idx, len(sz)))
        sentinel = np.iinfo(np.int64).min
        starts_before = np.where(idx > 0, run_max[np.maximum(idx - 1, 0)], sentinel)
        before = np.repeat(starts_before, lengths)
        # group max size = the group's first element (size desc within price)
        gmax = np.repeat(sz[idx], lengths)
        dominated = (before >= sz) | (gmax > sz)
        keep = ~dominated
        return pd.DataFrame(
            {"p_partkey": key[keep], "price_cents": pc_[keep], "p_size": sz[keep]}
        )

    cand = (
        _read(sf_dir, "part", ["p_partkey", "p_retailprice", "p_size"])
        .map_batches(local_skyline, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    if "p_partkey" not in cand.columns or not len(cand):
        return pd.DataFrame(
            {
                "p_partkey": pd.Series(dtype="int64"),
                "price_cents": pd.Series(dtype="int64"),
                "p_size": pd.Series(dtype="int64"),
            }
        )
    out = local_skyline(
        cand.rename(columns={"price_cents": "p_retailprice", "p_size": "p_size"}).assign(
            p_retailprice=cand["price_cents"] / 100.0
        )
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("p_partkey").reset_index(drop=True)


def orders_backlog_daily(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Open-order backlog over time: for every day, how many orders have
    been placed but not yet first-shipped — the interval-stabbing /
    sweep-line shape (a capacity dashboard no plain groupby expresses).

    Scale shape: per-order first-ship minima and the pruned orders
    stream meet in ORDERKEY hash buckets (the fulfillment-latency
    shuffle); each bucket emits (day, ±1) DELTA partials — the sweep
    line — so the driver reduce is bounded by the date domain; the
    cumulative sum over sorted days is a vectorized driver pass on that
    domain-sized table.  Days with no delta are omitted (the twin
    builds days from the same delta stream)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def ship_partial(t: pa.Table) -> pa.Table:
        out = (
            pa.table(
                {
                    "okey": t["l_orderkey"],
                    "us": t["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                }
            )
            .group_by("okey")
            .aggregate([("us", "min")])
        )
        return out.append_column("side", pa.array(np.zeros(len(out), dtype=np.int8), pa.int8()))

    def order_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": t["o_orderkey"],
                "us_min": t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
                "side": pa.array(np.ones(len(t), dtype=np.int8), pa.int8()),
            }
        )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (b["okey"] % num_buckets).astype("int32")
        return b

    tagged = (
        li.map_batches(ship_partial, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
                order_rows, batch_format="pyarrow"
            )
        )
        .map_batches(add_bucket, batch_format="pandas")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ships = g[g["side"] == 0].groupby("okey", sort=False)["us_min"].min()
        orders = g[g["side"] == 1].set_index("okey")["us_min"]
        j = orders.to_frame("start").join(ships.to_frame("end"), how="inner")
        start_day = pd.to_datetime(j["start"], unit="us").dt.strftime("%Y-%m-%d")
        end_day = pd.to_datetime(j["end"], unit="us").dt.strftime("%Y-%m-%d")
        deltas = pd.concat(
            [
                pd.DataFrame({"day": start_day, "delta": 1}),
                pd.DataFrame({"day": end_day, "delta": -1}),
            ]
        )
        return deltas.groupby("day", sort=False)["delta"].sum().reset_index()

    parts = tagged.groupby("bucket").map_groups(per_bucket, batch_format="pandas").to_pandas()
    if "day" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {"day": pd.Series(dtype=object), "n_open": pd.Series(dtype="int64")}
        )
    days = parts.groupby("day", sort=True)["delta"].sum()
    return pd.DataFrame(
        {"day": days.index.to_numpy(), "n_open": np.cumsum(days.to_numpy()).astype("int64")}
    )


def customer_rfm_segments(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """RFM segmentation: per customer, Recency (whole days since their
    last order vs the corpus watermark), Frequency (order count) and
    Monetary (total cents) each tercile-bucket 1–3 under the shared
    cume-dist convention (min v with cdf ≥ 1/3 resp. 2/3 — the
    winsorized_mean quantile rule), then the 27-cell segment census —
    the classic marketing rollup as one composite pipeline.

    Scale shape: orders fold to per-customer (n, cents, last_us)
    partials → ONE custkey-bucket shuffle totals them; per-metric
    HISTOGRAM partials (value-domain bounded) give the driver the two
    tercile bounds per metric; the final assign pass emits ≤27-row
    partials per block.  The customer stream itself never reaches the
    driver."""
    from kgray.functions.broadcast import cached_get

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        us = b["o_orderdate"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        out = (
            pd.DataFrame(
                {"ckey": b["o_custkey"].to_numpy(dtype=np.int64), "c": cents, "us": us}
            )
            .groupby("ckey", sort=False)
            .agg(n=("c", "size"), c=("c", "sum"), us=("us", "max"))
            .reset_index()
        )
        out["bucket"] = (out["ckey"] % num_buckets).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("ckey", sort=False).agg(
            n=("n", "sum"), c=("c", "sum"), us=("us", "max")
        )
        return tot.reset_index()

    per_cust = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    empty = pd.DataFrame(
        {"segment": pd.Series(dtype=object), "n_customers": pd.Series(dtype="int64")}
    )

    def max_us_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"m": [b["us"].max()]})

    mx = per_cust.map_batches(max_us_partial, batch_format="pandas").to_pandas()
    if "m" not in mx.columns or not len(mx):
        return empty
    wm_us = int(mx["m"].max())

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        r = (wm_us - b["us"].to_numpy(dtype=np.int64)) // 86_400_000_000
        frames = []
        for name, v in (("r", r), ("f", b["n"].to_numpy(np.int64)), ("m", b["c"].to_numpy(np.int64))):
            u, cnt = np.unique(v, return_counts=True)
            frames.append(pd.DataFrame({"metric": name, "v": u, "cnt": cnt}))
        return pd.concat(frames, ignore_index=True)

    hist = per_cust.map_batches(hist_partial, batch_format="pandas").to_pandas()
    if "metric" not in hist.columns or not len(hist):
        return empty
    bounds: dict[str, tuple[int, int]] = {}
    for name, grp in hist.groupby("metric"):
        g = grp.groupby("v", sort=True)["cnt"].sum()
        vals = g.index.to_numpy(dtype=np.int64)
        cdf = np.cumsum(g.to_numpy(dtype=np.int64)) / g.sum()
        bounds[name] = (
            int(vals[np.searchsorted(cdf, 1.0 / 3.0, side="left")]),
            int(vals[np.searchsorted(cdf, 2.0 / 3.0, side="left")]),
        )
    b_ref = ray.put(bounds)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        bd = cached_get(b_ref)
        r = (wm_us - b["us"].to_numpy(dtype=np.int64)) // 86_400_000_000
        f = b["n"].to_numpy(np.int64)
        mv = b["c"].to_numpy(np.int64)

        def bucket3(v, key):
            lo, hi = bd[key]
            return 1 + (v >= lo).astype(np.int64) + (v >= hi).astype(np.int64)

        seg = (
            pd.Series(bucket3(r, "r")).astype(str)
            + pd.Series(bucket3(f, "f")).astype(str)
            + pd.Series(bucket3(mv, "m")).astype(str)
        )
        return pd.DataFrame({"segment": seg}).groupby("segment").size().reset_index(name="n")

    parts = per_cust.map_batches(assign, batch_format="pandas").to_pandas()
    out = parts.groupby("segment", sort=True)["n"].sum().reset_index(name="n_customers")
    out["n_customers"] = out["n_customers"].astype("int64")
    return out


def forecast_revenue_change(
    sf_dir: str, since: str = "1996-01-01", until: str = "1997-01-01"
) -> pd.DataFrame:
    """TPC-H Q6-shaped what-if: revenue gained by dropping discounts of
    5–7 % on small orders (qty < 24) in one year — the pure filter+sum
    probe of scan/predicate throughput (no join, no shuffle at all).

    Exactness: per-row ``l_extendedprice·l_discount`` quantizes to cents
    after the same double product as the twin; one integer row per
    batch."""
    lo, hi = pd.Timestamp(since), pd.Timestamp(until)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            (b["l_shipdate"] >= lo)
            & (b["l_shipdate"] < hi)
            & (b["l_discount"] >= 0.05)
            & (b["l_discount"] <= 0.07)
            & (b["l_quantity"] < 24.0)
        )
        rc = np.floor(
            b.loc[m, "l_extendedprice"].to_numpy() * b.loc[m, "l_discount"].to_numpy() * 100.0
            + 0.5
        ).astype(np.int64)
        return pd.DataFrame({"rc": [int(rc.sum())]})

    rc = int(
        _read(sf_dir, "lineitem", ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()["rc"]
        .sum()
    )
    return pd.DataFrame({"revenue": pd.Series([rc / 100.0], dtype="float64")})


def promo_revenue_share(
    sf_dir: str, since: str = "1996-03-01", until: str = "1996-04-01"
) -> pd.DataFrame:
    """TPC-H Q14-shaped ratio report: the percentage of one month's
    discounted revenue that came from PROMO parts.

    Scale shape: the part dimension collapses to a broadcast promo
    partkey set (below the documented broadcast ceiling — the dimension
    ladder applies above it); the fact scan keeps TWO integer
    accumulators per batch; the single division micro-quantizes."""
    from kgray.functions.broadcast import cached_get

    lo, hi = pd.Timestamp(since), pd.Timestamp(until)

    def promo_keys(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pkey": b.loc[b["p_type"] == "PROMO", "p_partkey"].to_numpy(dtype=np.int64)}
        )

    pk = (
        _read(sf_dir, "part", ["p_partkey", "p_type"])
        .map_batches(promo_keys, batch_format="pandas")
        .to_pandas()
    )
    keys = np.sort(pk["pkey"].to_numpy(dtype=np.int64)) if len(pk) else np.empty(0, np.int64)
    keys_ref = ray.put(keys)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
        rc = np.floor(
            b.loc[m, "l_extendedprice"].to_numpy()
            * (1.0 - b.loc[m, "l_discount"].to_numpy())
            * 100.0
            + 0.5
        ).astype(np.int64)
        promo = np.isin(b.loc[m, "l_partkey"].to_numpy(dtype=np.int64), cached_get(keys_ref))
        return pd.DataFrame({"p": [int(rc[promo].sum())], "t": [int(rc.sum())]})

    parts = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    p, t = int(parts["p"].sum()), int(parts["t"].sum())
    share = 0.0 if t == 0 else np.floor(100.0 * p / t * 1e4 + 0.5) / 1e4
    return pd.DataFrame({"promo_share_pct": pd.Series([share], dtype="float64")})


def bilateral_trade(
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q7-shaped bilateral shipping volume: discounted revenue
    flowing between two nations (supplier nation ≠ customer nation) per
    ship year — the fact×fact join with two dimension attaches.

    Scale shape: supplier and the FILTERED customer nation maps broadcast
    (two of 25 nations; the dimension ladder applies above the ceiling);
    orders pre-shrink to (orderkey, cust_nation) for mapped customers
    only, then lineitem rows (supplier-mapped, date-filtered) and the
    order rows meet in ORDERKEY hash buckets — one shuffle of pruned
    streams; each bucket emits (supp, cust, year, cents) partials."""
    from kgray.functions.broadcast import cached_get

    nations = {nation_a, nation_b}
    ndf = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_name = dict(zip(ndf["n_nationkey"].astype(int), ndf["n_name"]))
    wanted_keys = {k for k, v in n_name.items() if v in nations}

    def _sorted_map(df, key_col, nat_col):
        # broadcast (sorted keys, names) arrays once: per-batch lookups are
        # one searchsorted, not a Python dict loop + per-batch key rebuild
        sel = df[df[nat_col].isin(wanted_keys)]
        order = np.argsort(sel[key_col].to_numpy(dtype=np.int64), kind="mergesort")
        return ray.put(
            (
                sel[key_col].to_numpy(dtype=np.int64)[order],
                sel[nat_col].map(n_name).to_numpy(dtype=object)[order],
            )
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    cmap_ref = _sorted_map(cust, "c_custkey", "c_nationkey")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    smap_ref = _sorted_map(supp, "s_suppkey", "s_nationkey")
    lo, hi = pd.Timestamp("1995-01-01"), pd.Timestamp("1997-01-01")

    def _lookup(keys: np.ndarray, ref):
        """(hit mask, names array, positions) — one searchsorted pass;
        callers slice names as ``mv[pos[final_mask]]`` so a narrower final
        mask (e.g. after a date filter) needs no second scan."""
        mk, mv = cached_get(ref)
        if not len(mk):
            return np.zeros(len(keys), dtype=bool), mv, np.zeros(len(keys), np.int64)
        pos = np.minimum(np.searchsorted(mk, keys), len(mk) - 1)
        return mk[pos] == keys, mv, pos

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        keys = b["o_custkey"].to_numpy(dtype=np.int64)
        m, mv, pos = _lookup(keys, cmap_ref)
        out = pd.DataFrame(
            {
                "okey": b.loc[m, "o_orderkey"].to_numpy(dtype=np.int64),
                "cust_nation": mv[pos[m]],
            }
        )
        out["side"] = np.int8(1)
        out["supp_nation"] = ""
        out["l_year"] = ""
        out["rc"] = np.int64(0)
        return out

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        keys = b["l_suppkey"].to_numpy(dtype=np.int64)
        mk_hit, smv, spos = _lookup(keys, smap_ref)
        m = (
            mk_hit
            & (b["l_shipdate"] >= lo).to_numpy()
            & (b["l_shipdate"] < hi).to_numpy()
        )
        rc = np.floor(
            b.loc[m, "l_extendedprice"].to_numpy()
            * (1.0 - b.loc[m, "l_discount"].to_numpy())
            * 100.0
            + 0.5
        ).astype(np.int64)
        snames = smv[spos[m]]
        out = pd.DataFrame(
            {
                "okey": b.loc[m, "l_orderkey"].to_numpy(dtype=np.int64),
                "cust_nation": "",
                "supp_nation": snames,
                "l_year": b.loc[m, "l_shipdate"].dt.strftime("%Y").to_numpy(dtype=object),
                "rc": rc,
            }
        )
        out["side"] = np.int8(0)
        return out[["okey", "cust_nation", "side", "supp_nation", "l_year", "rc"]]

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (b["okey"] % num_buckets).astype("int32")
        return b

    tagged = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(line_rows, batch_format="pandas", batch_size=262144)
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
                order_rows, batch_format="pandas"
            )
        )
        .map_batches(add_bucket, batch_format="pandas")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0]
        od = g[g["side"] == 1][["okey", "cust_nation"]]
        j = li.merge(od, on="okey", suffixes=("_x", ""))
        j = j[j["supp_nation"] != j["cust_nation"]]
        if not len(j):
            return pd.DataFrame(
                {
                    "supp_nation": pd.Series(dtype=object),
                    "cust_nation": pd.Series(dtype=object),
                    "l_year": pd.Series(dtype=object),
                    "rc": pd.Series(dtype="int64"),
                }
            )
        return (
            j.groupby(["supp_nation", "cust_nation", "l_year"], sort=False)["rc"]
            .sum()
            .reset_index()
        )

    parts = tagged.groupby("bucket").map_groups(per_bucket, batch_format="pandas").to_pandas()
    if "supp_nation" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {
                "supp_nation": pd.Series(dtype=object),
                "cust_nation": pd.Series(dtype=object),
                "l_year": pd.Series(dtype=object),
                "revenue": pd.Series(dtype="float64"),
            }
        )
    out = (
        parts.groupby(["supp_nation", "cust_nation", "l_year"], sort=True)["rc"]
        .sum()
        .reset_index()
    )
    out["revenue"] = out["rc"].to_numpy(dtype=np.float64) / 100.0
    return out.drop(columns=["rc"]).reset_index(drop=True)


def price_qty_correlation(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation between quantity and extended price per
    return flag — the cross-variable moment rollup (pricing sanity:
    price should track quantity; a flag where it doesn't is suspect).

    Exactness: quantity quantizes to cents, price to WHOLE DOLLARS
    (keeps Σy² within int64 through sf100 fact counts); the driver
    combines in arbitrary-precision Python ints and the twin promotes
    to HUGEINT, so the r formula's products never overflow; the single
    division + sqrt micro-quantizes identically.

    Scale shape: one streaming pass folding each batch to per-flag
    moment partials (flags × 6 ints); driver combine + the r formula."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        qc = np.floor(b["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        pc_ = np.floor(b["l_extendedprice"].to_numpy() + 0.5).astype(np.int64)
        d = pd.DataFrame(
            {
                "flag": b["l_returnflag"].to_numpy(dtype=object),
                "n": 1,
                "sx": qc,
                "sy": pc_,
                "sxx": qc * qc,
                "syy": pc_ * pc_,
                "sxy": qc * pc_,
            }
        )
        return d.groupby("flag", sort=False).sum().reset_index()

    parts = (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "l_returnflag": pd.Series(dtype=object),
            "n": pd.Series(dtype="int64"),
            "r": pd.Series(dtype="float64"),
        }
    )
    if "flag" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("flag", sort=True)[["n", "sx", "sy", "sxx", "syy", "sxy"]].sum()
    rows = []
    for flag, m in agg.iterrows():
        n, sx, sy, sxx, syy, sxy = (int(m[c]) for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
        den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
        if den2 <= 0:
            continue
        r = float(n * sxy - sx * sy) / np.sqrt(np.float64(den2))
        rows.append((flag, n, np.floor(r * 1e6 + 0.5) / 1e6))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["l_returnflag", "n", "r"])


def customer_order_dist(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """TPC-H Q13-shaped customer distribution: how many customers placed
    exactly k orders, INCLUDING the zero bin (customers with no orders) —
    the left-join + double-groupby shape.

    Scale shape: the orders fact stream pre-aggregates per-custkey counts
    inside ``map_batches`` (combiner), meets itself in custkey hash
    buckets, and each bucket emits a HISTOGRAM partial (order-count →
    n_customers) — the driver merges ≤ buckets × distinct-count rows.
    The zero bin needs only two scalars: total customers (count pass on
    the pruned customer stream) minus customers seen ordering (Σ
    histogram), so the left join never materializes.
    """
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b.groupby("o_custkey", sort=False).size().reset_index(name="n")
        return pd.DataFrame(
            {
                "bucket": (c["o_custkey"] % num_buckets).astype("int32"),
                "ckey": c["o_custkey"].astype("int64"),
                "n": c["n"].astype("int64"),
            }
        )

    def per_bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g.groupby("ckey", sort=False)["n"].sum()
        h = per_cust.value_counts()
        return pd.DataFrame(
            {"c_count": h.index.astype("int64"), "custdist": h.to_numpy(dtype=np.int64)}
        )

    hist = (
        orders.map_batches(count_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket_hist, batch_format="pandas")
        .to_pandas()  # ≤ buckets × |count domain| rows
    )
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    if "c_count" not in hist.columns or not len(hist):
        hist = pd.DataFrame({"c_count": [], "custdist": []})
    out = hist.groupby("c_count", sort=True)["custdist"].sum().reset_index()
    n_zero = n_customers - int(out["custdist"].sum())
    if n_zero > 0:
        out = pd.concat(
            [pd.DataFrame({"c_count": [0], "custdist": [n_zero]}), out], ignore_index=True
        )
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return out.sort_values("c_count").reset_index(drop=True)


def nation_market_share(
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_2",
    part_type: str = "STANDARD",
    since: str = "1995-01-01",
    until: str = "1997-01-01",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q8-shaped market share: per order year, the fraction of
    discounted revenue (orders from customers in ``region``, parts of
    ``part_type``) supplied by ``nation``.

    Scale shape (the 6-table star):
    - nation/region and the target-nation suppkey set always broadcast
      (tiny); the region custkey set broadcasts below the documented
      dimension ceiling (the custkey bucket-join ladder of
      ``revenue_by_nation`` applies above it);
    - the typed partkey set broadcasts (a type selects ~1/|types| of
      part);
    - orders pre-shrink to (orderkey, year) for in-range in-region rows;
      lineitem pre-aggregates per orderkey into TWO integer-cent
      accumulators (total, target-nation) inside ``map_batches``;
    - both partial streams meet once in ORDERKEY hash buckets; each
      bucket emits per-year integer partials, the driver reduces ≤
      buckets × years rows and performs the single micro-quantized
      division per year.
    """
    from kgray.functions.broadcast import cached_get

    lo, hi = pd.Timestamp(since), pd.Timestamp(until)
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    region_keys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    region_nations = set(nat.loc[nat["n_regionkey"].isin(region_keys), "n_nationkey"])
    target_nkey = set(nat.loc[nat["n_name"] == nation, "n_nationkey"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pd.DataFrame(
            {"ckey": b.loc[b["c_nationkey"].isin(region_nations), "c_custkey"]}
        ),
        batch_format="pandas",
        batch_size=262144,
    ).to_pandas()
    region_cust_ref = ray.put(np.sort(cust["ckey"].to_numpy(dtype=np.int64)))

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    target_supp_ref = ray.put(
        np.sort(supp.loc[supp["s_nationkey"].isin(target_nkey), "s_suppkey"].to_numpy(np.int64))
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    typed_part_ref = ray.put(
        np.sort(part.loc[part["p_type"] == part_type, "p_partkey"].to_numpy(np.int64))
    )

    def orders_side(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)
        m &= np.isin(b["o_custkey"].to_numpy(dtype=np.int64), cached_get(region_cust_ref))
        b = b.loc[m]
        return pd.DataFrame(
            {
                "bucket": (b["o_orderkey"] % num_buckets).astype("int32"),
                "okey": b["o_orderkey"].astype("int64"),
                "side": np.int8(0),
                "o_year": b["o_orderdate"].dt.strftime("%Y"),
                "rc_total": np.int64(0),
                "rc_target": np.int64(0),
            }
        )

    def line_side(b: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(b["l_partkey"].to_numpy(dtype=np.int64), cached_get(typed_part_ref))
        b = b.loc[m]
        rc = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 100.0 + 0.5
        ).astype(np.int64)
        tgt = np.where(
            np.isin(b["l_suppkey"].to_numpy(dtype=np.int64), cached_get(target_supp_ref)), rc, 0
        )
        out = (
            pd.DataFrame({"okey": b["l_orderkey"].to_numpy(np.int64), "t": rc, "g": tgt})
            .groupby("okey", sort=False)
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {
                "bucket": (out["okey"] % num_buckets).astype("int32"),
                "okey": out["okey"].astype("int64"),
                "side": np.int8(1),
                "o_year": "",
                "rc_total": out["t"].astype("int64"),
                "rc_target": out["g"].astype("int64"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["okey", "o_year"]]
        l = g[g["side"] == 1].groupby("okey", sort=False)[["rc_total", "rc_target"]].sum()
        m = o.merge(l.reset_index(), on="okey")
        return m.groupby("o_year", sort=False)[["rc_total", "rc_target"]].sum().reset_index()

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_side, batch_format="pandas", batch_size=262144
    )
    line = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(line_side, batch_format="pandas", batch_size=262144)

    parts = (
        orders.union(line)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ buckets × years rows
    )
    empty = pd.DataFrame(
        {"o_year": pd.Series(dtype=object), "mkt_share": pd.Series(dtype="float64")}
    )
    if "o_year" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("o_year", sort=True)[["rc_total", "rc_target"]].sum()
    agg = agg[agg["rc_total"] > 0]
    if not len(agg):
        return empty
    share = np.floor(
        agg["rc_target"].to_numpy(dtype=np.float64)
        / agg["rc_total"].to_numpy(dtype=np.float64)
        * 1e6
        + 0.5
    ) / 1e6
    return pd.DataFrame({"o_year": agg.index.astype(str), "mkt_share": share}).reset_index(
        drop=True
    )


def supplier_part_coverage(
    sf_dir: str,
    exclude_brand: str = "Brand#13",
    exclude_type: str = "PROMO",
    max_size: int = 25,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q16-shaped supplier coverage: distinct suppliers per part
    (brand, type, size) group, with the classic brand/type/size exclusion
    filters — the COUNT(DISTINCT) over a fact⋈dimension join.

    Scale shape: the filtered part attribute map broadcasts once (the
    dimension ladder applies above the ceiling); the lineitem stream
    pre-shrinks to DISTINCT (partkey, suppkey) pairs per batch (the
    distinct combiner — supplier×part is vastly smaller than lineitem),
    pairs meet once in group-hash buckets, and each bucket counts
    distinct suppliers per attribute triple exactly.
    """
    from kgray.functions.broadcast import cached_get

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    part = part.loc[
        (part["p_brand"] != exclude_brand)
        & (part["p_type"] != exclude_type)
        & (part["p_size"] <= max_size)
    ]
    attrs_ref = ray.put(
        {
            int(k): (b, t, int(s))
            for k, b, t, s in zip(
                part["p_partkey"], part["p_brand"], part["p_type"], part["p_size"]
            )
        }
    )

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        attrs = cached_get(attrs_ref)
        p = b.drop_duplicates(["l_partkey", "l_suppkey"])
        keep = p["l_partkey"].isin(attrs.keys())
        p = p.loc[keep]
        trip = p["l_partkey"].map(attrs)
        out = pd.DataFrame(
            {
                "p_brand": trip.str[0].astype(str),
                "p_type": trip.str[1].astype(str),
                "p_size": trip.str[2].astype("int64"),
                "skey": p["l_suppkey"].astype("int64"),
            }
        )
        key = out["p_brand"] + "|" + out["p_type"] + "|" + out["p_size"].astype(str)
        out["bucket"] = (
            pd.util.hash_array(key.to_numpy(dtype=object)) % num_buckets
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["p_brand", "p_type", "p_size", "skey"])
        out = (
            d.groupby(["p_brand", "p_type", "p_size"], sort=False)["skey"]
            .nunique()
            .reset_index(name="supplier_cnt")
        )
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        return out

    out = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pair_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ |part triples| rows
    )
    empty = pd.DataFrame(
        {
            "p_brand": pd.Series(dtype=object),
            "p_type": pd.Series(dtype=object),
            "p_size": pd.Series(dtype="int64"),
            "supplier_cnt": pd.Series(dtype="int64"),
        }
    )
    if "p_brand" not in out.columns or not len(out):
        return empty
    out = out.drop(columns=[c for c in ("bucket",) if c in out.columns])
    return (
        out.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"], ascending=[False, True, True, True])
        .reset_index(drop=True)
    )


def orders_cohort_retention(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Monthly repeat-purchase cohort retention: customers grouped by
    FIRST-order month, counted as retained in every later month they
    ordered again (offset in months) — the orders-side twin of the
    events cohort matrix.

    Scale shape: the orders stream pre-shrinks to DISTINCT (custkey,
    month) pairs per batch; one custkey-hash shuffle co-locates each
    customer's months; each bucket computes the cohort month (min) and
    emits (cohort, offset) COUNT partials — the driver merges ≤ buckets ×
    months² rows.
    """
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            b["o_orderdate"].dt.year.to_numpy(dtype=np.int64) * 12
            + b["o_orderdate"].dt.month.to_numpy(dtype=np.int64)
            - 1
        )
        out = pd.DataFrame(
            {"ckey": b["o_custkey"].to_numpy(np.int64), "m": m}
        ).drop_duplicates()
        out["bucket"] = (out["ckey"] % num_buckets).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["ckey", "m"])
        fm = g.groupby("ckey", sort=False)["m"].transform("min")
        out = (
            pd.DataFrame({"fm": fm, "off": g["m"] - fm})
            .groupby(["fm", "off"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        return out

    parts = (
        orders.map_batches(pair_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ buckets × months² rows
    )
    empty = pd.DataFrame(
        {
            "cohort_month": pd.Series(dtype=object),
            "month_offset": pd.Series(dtype="int64"),
            "n_customers": pd.Series(dtype="int64"),
        }
    )
    if "fm" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby(["fm", "off"], sort=True)["n"].sum().reset_index()
    return pd.DataFrame(
        {
            "cohort_month": [
                f"{int(v) // 12:04d}-{int(v) % 12 + 1:02d}" for v in agg["fm"]
            ],
            "month_offset": agg["off"].astype("int64"),
            "n_customers": agg["n"].astype("int64"),
        }
    )


def customer_lorenz_curve(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Lorenz curve of customer spend: at each customer decile (sorted by
    total order value ascending), the cumulative share of total revenue —
    the concentration curve behind the Gini number.

    Scale shape: per-batch (custkey, integer-cent) sum partials, one
    custkey-hash shuffle to per-customer totals; the curve evaluation
    sorts the KEY-VOCABULARY-bounded totals vector (the documented
    driver-reduce budget; ties broken by custkey).  Cent sums stay exact
    ints; each share micro-quantizes once.
    """
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(dtype=np.float64) * 100.0 + 0.5).astype(
            np.int64
        )
        c = (
            pd.DataFrame({"ckey": b["o_custkey"].to_numpy(np.int64), "x": cents})
            .groupby("ckey", sort=False)["x"]
            .sum()
            .reset_index()
        )
        c["bucket"] = (c["ckey"] % num_buckets).astype("int32")
        return c

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("ckey", sort=False)["x"].sum().reset_index()
        c["x"] = c["x"].astype("int64")
        return c[["ckey", "x"]]

    totals = (
        orders.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # one row per ordering customer (vocabulary-bounded)
    )
    empty = pd.DataFrame(
        {
            "decile": pd.Series(dtype="int64"),
            "n_customers": pd.Series(dtype="int64"),
            "cum_share": pd.Series(dtype="float64"),
        }
    )
    if "ckey" not in totals.columns or not len(totals):
        return empty
    totals = totals.sort_values(["x", "ckey"], kind="mergesort").reset_index(drop=True)
    x = totals["x"].to_numpy(dtype=np.int64)
    n = len(x)
    tot = int(x.sum())
    if tot == 0:
        return empty
    cum = np.cumsum(x)
    rows = []
    for d in range(1, 11):
        i = n * d // 10  # customers covered by decile d
        share = 0.0 if i == 0 else np.floor(float(int(cum[i - 1])) / float(tot) * 1e6 + 0.5) / 1e6
        rows.append((np.int64(d), np.int64(i), share))
    return pd.DataFrame(rows, columns=["decile", "n_customers", "cum_share"])


def market_basket_lift(
    sf_dir: str, min_support: int = 3, num_buckets: int = 64
) -> pd.DataFrame:
    """Market-basket association mining over lineitem: part pairs
    co-ordered in the same order, with support and lift
    (lift = P(ab)/(P(a)·P(b)) over order baskets) — the classic
    co-purchase affinity report.

    Scale shape: baskets pre-shrink to DISTINCT (orderkey, partkey) pairs
    per batch; one ORDERKEY-hash shuffle co-locates baskets and emits the
    pair stream (quadratic only in basket size, which the order schema
    bounds); a second PAIR-hash shuffle sums support exactly; per-part
    order frequencies are a (|parts|-bounded) driver merge broadcast into
    the final lift computation.  Exact integers until one micro-quantized
    division per surviving pair.
    """
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def op_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b.drop_duplicates(["l_orderkey", "l_partkey"])
        return pd.DataFrame(
            {
                "bucket": (d["l_orderkey"] % num_buckets).astype("int32"),
                "o": d["l_orderkey"].astype("int64"),
                "p": d["l_partkey"].astype("int64"),
            }
        )

    op = line.map_batches(op_partial, batch_format="pandas", batch_size=262144)

    def per_order_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["o", "p"]).sort_values(["o", "p"], kind="mergesort")
        o = g["o"].to_numpy(dtype=np.int64)
        p = g["p"].to_numpy(dtype=np.int64)
        # vectorized pair emission: basket size is schema-bounded, so loop
        # over WITHIN-BASKET offsets (≤ max_size² steps), not over orders —
        # row r with in-basket position i pairs with row r+(j−i) of the
        # same sorted basket
        sizes = pd.Series(o).groupby(o, sort=False).transform("size").to_numpy()
        pos = pd.Series(o).groupby(o, sort=False).cumcount().to_numpy()
        max_sz = int(sizes.max()) if len(sizes) else 0
        rows_a: list[np.ndarray] = []
        rows_b: list[np.ndarray] = []
        for d in range(1, max_sz):
            idx = np.flatnonzero(pos + d < sizes)
            if len(idx):
                rows_a.append(p[idx])
                rows_b.append(p[idx + d])
        # side stats ride the SAME pass: per-part basket counts
        # (part_b = -1) and the bucket's order count (part_a = -2) — one
        # read, one basket shuffle, one pair shuffle for everything
        pc_ = pd.Series(p).groupby(p, sort=False).size()
        side = pd.DataFrame(
            {
                "part_a": np.concatenate([pc_.index.to_numpy(np.int64), [-2]]),
                "part_b": np.int64(-1),
                "n": np.concatenate(
                    [pc_.to_numpy(np.int64), [np.int64(len(np.unique(o)))]]
                ),
            }
        )
        if rows_a:
            a, bb = np.concatenate(rows_a), np.concatenate(rows_b)
            pair = (
                pd.DataFrame({"part_a": a, "part_b": bb})
                .groupby(["part_a", "part_b"], sort=False)
                .size()
                .reset_index(name="n")
            )
            out = pd.concat([pair, side], ignore_index=True)
        else:
            out = side
        out["n"] = out["n"].astype("int64")
        out["pbucket"] = ((out["part_a"] * 1_000_003 + out["part_b"]) % num_buckets).astype(
            "int32"
        )
        return out

    def per_pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["part_a", "part_b"], sort=False)["n"].sum().reset_index(
            name="support"
        )
        out = out.loc[(out["part_b"] == -1) | (out["support"] >= min_support)]
        out["support"] = out["support"].astype("int64")
        return out[["part_a", "part_b", "support"]]

    rows = (
        op.groupby("bucket")
        .map_groups(per_order_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(per_pair_bucket, batch_format="pandas")
        .to_pandas()  # support-filtered pairs + per-part/order-count side rows
    )
    empty = pd.DataFrame(
        {
            "part_a": pd.Series(dtype="int64"),
            "part_b": pd.Series(dtype="int64"),
            "support": pd.Series(dtype="int64"),
            "lift": pd.Series(dtype="float64"),
        }
    )
    if "part_a" not in rows.columns or not len(rows):
        return empty
    side = rows.loc[rows["part_b"] == -1]
    pairs = rows.loc[rows["part_b"] != -1].copy()
    if not len(pairs):
        return empty
    n_orders = int(side.loc[side["part_a"] == -2, "support"].sum())
    pf = side.loc[side["part_a"] >= 0].groupby("part_a", sort=False)["support"].sum()
    na = pairs["part_a"].map(pf).to_numpy(dtype=np.int64)
    nb = pairs["part_b"].map(pf).to_numpy(dtype=np.int64)
    sup = pairs["support"].to_numpy(dtype=np.int64)
    lift = np.floor(
        (sup.astype(np.float64) * float(n_orders)) / (na.astype(np.float64) * nb) * 1e6
        + 0.5
    ) / 1e6
    out = pairs.copy()
    out["lift"] = lift
    return out.sort_values(["part_a", "part_b"]).reset_index(drop=True)


def session_bounce_rate(
    sf_dir: str, gap_minutes: int = 30, num_buckets: int = 64
) -> pd.DataFrame:
    """Per-day session bounce rate: sessions (the >gap idle split of
    user_sessions) starting that day that contain exactly ONE event,
    over all sessions starting that day — the engagement-quality rollup
    on top of sessionization.

    Scale shape: one user-hash bucket shuffle; inside a bucket sessions
    assemble vectorized (cumsum of session starts) and collapse to
    (start-day, n_sessions, n_bounces) partials — the driver merges ≤
    buckets × days rows and performs one micro-quantized division per
    day.
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
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
        sid = np.cumsum(new_session)
        s = pd.DataFrame({"sid": sid, "ts": ts})
        agg = s.groupby("sid", sort=False).agg(start=("ts", "min"), size=("ts", "size"))
        day = agg["start"].dt.strftime("%Y-%m-%d")
        out = (
            pd.DataFrame({"day": day, "one": (agg["size"] == 1).astype(np.int64)})
            .groupby("day", sort=False)["one"]
            .agg(n_sessions="size", n_bounces="sum")
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_bounces"] = out["n_bounces"].astype("int64")
        return out

    parts = (
        _read(sf_dir, "events", ["user_id", "event_id", "ts"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ buckets × days rows
    )
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype=object),
            "n_sessions": pd.Series(dtype="int64"),
            "n_bounces": pd.Series(dtype="int64"),
            "bounce_rate": pd.Series(dtype="float64"),
        }
    )
    if "day" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("day", sort=True)[["n_sessions", "n_bounces"]].sum().reset_index()
    agg["bounce_rate"] = (
        np.floor(
            agg["n_bounces"].to_numpy(dtype=np.float64)
            / agg["n_sessions"].to_numpy(dtype=np.float64)
            * 1e6
            + 0.5
        )
        / 1e6
    )
    agg["n_sessions"] = agg["n_sessions"].astype("int64")
    agg["n_bounces"] = agg["n_bounces"].astype("int64")
    return agg.reset_index(drop=True)


def fk_integrity_audit(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Referential-integrity audit across every foreign-key edge of the
    schema: orphan fact rows whose key has no match in the referenced
    table — the ingest-health report run before anything joins.

    Scale ladder per edge: DIMENSION-referenced keys (part, supplier,
    customer, nation, region) broadcast as sorted arrays and orphans
    count per batch with ``np.isin`` (no shuffle); the one FACT→FACT
    edge (lineitem→orders) pre-shrinks both sides to distinct keys per
    batch and anti-joins in ORDERKEY hash buckets.
    """
    from kgray.functions.broadcast import cached_get

    def count_orphans_broadcast(
        fact: ray.data.Dataset, col: str, keys: np.ndarray
    ) -> int:
        ref = ray.put(np.sort(keys.astype(np.int64)))

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            v = b[col].to_numpy(dtype=np.int64)
            return pd.DataFrame({"n": [int((~np.isin(v, cached_get(ref))).sum())]})

        return int(
            fact.map_batches(partial, batch_format="pandas", batch_size=262144)
            .to_pandas()["n"]
            .sum()
        )

    part = _read(sf_dir, "part", ["p_partkey"]).to_pandas()["p_partkey"].to_numpy()
    supp = _read(sf_dir, "supplier", ["s_suppkey"]).to_pandas()["s_suppkey"].to_numpy()
    cust = _read(sf_dir, "customer", ["c_custkey"]).to_pandas()["c_custkey"].to_numpy()
    nat = _read(sf_dir, "nation", ["n_nationkey"]).to_pandas()["n_nationkey"].to_numpy()
    reg = _read(sf_dir, "region", ["r_regionkey"]).to_pandas()["r_regionkey"].to_numpy()

    line_part = count_orphans_broadcast(
        _read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey", part
    )
    line_supp = count_orphans_broadcast(
        _read(sf_dir, "lineitem", ["l_suppkey"]), "l_suppkey", supp
    )
    orders_cust = count_orphans_broadcast(
        _read(sf_dir, "orders", ["o_custkey"]), "o_custkey", cust
    )
    cust_nat = count_orphans_broadcast(
        _read(sf_dir, "customer", ["c_nationkey"]), "c_nationkey", nat
    )
    supp_nat = count_orphans_broadcast(
        _read(sf_dir, "supplier", ["s_nationkey"]), "s_nationkey", nat
    )
    nat_reg = count_orphans_broadcast(
        _read(sf_dir, "nation", ["n_regionkey"]), "n_regionkey", reg
    )

    # lineitem → orders: fact×fact, bucketed anti-join on orderkey
    def line_keys(b: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(b["l_orderkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "bucket": (u % num_buckets).astype(np.int32),
                "k": u,
                "side": np.int8(0),
                "n": np.int64(1),
            }
        )

    def order_keys(b: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(b["o_orderkey"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "bucket": (u % num_buckets).astype(np.int32),
                "k": u,
                "side": np.int8(1),
                "n": np.int64(1),
            }
        )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["side"] == 1, "k"].unique()
        l = g.loc[g["side"] == 0, "k"].unique()
        return pd.DataFrame({"n": [int((~np.isin(l, have)).sum())]})

    # counts DISTINCT orphan orderkeys (each key lands in exactly one bucket)
    line_orders = int(
        _read(sf_dir, "lineitem", ["l_orderkey"])
        .map_batches(line_keys, batch_format="pandas", batch_size=262144)
        .union(
            _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
                order_keys, batch_format="pandas", batch_size=262144
            )
        )
        .groupby("bucket")
        .map_groups(anti, batch_format="pandas")
        .to_pandas()["n"]
        .sum()
    )

    return pd.DataFrame(
        {
            "fk_edge": [
                "customer->nation",
                "lineitem->orders",
                "lineitem->part",
                "lineitem->supplier",
                "nation->region",
                "orders->customer",
                "supplier->nation",
            ],
            "n_orphans": pd.Series(
                [
                    cust_nat,
                    line_orders,
                    line_part,
                    line_supp,
                    nat_reg,
                    orders_cust,
                    supp_nat,
                ],
                dtype="int64",
            ),
        }
    )


def discount_elasticity(sf_dir: str) -> pd.DataFrame:
    """Discount-band elasticity profile: per discount percentage point,
    item count, average quantity and average discounted revenue — does a
    deeper discount actually move volume?

    Scale shape: one pruned lineitem pass with per-batch (band, n, Σqty,
    Σrev) integer-cent partials — a |bands| driver merge (discount is a
    bounded-domain column) with one micro-quantized division per band.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        band = np.floor(b["l_discount"].to_numpy(dtype=np.float64) * 100.0 + 0.5).astype(
            np.int64
        )
        qty_c = np.floor(b["l_quantity"].to_numpy(dtype=np.float64) * 100.0 + 0.5).astype(
            np.int64
        )
        rev_c = np.floor(
            b["l_extendedprice"].to_numpy(dtype=np.float64)
            * (1.0 - b["l_discount"].to_numpy(dtype=np.float64))
            * 100.0
            + 0.5
        ).astype(np.int64)
        out = (
            pd.DataFrame({"band": band, "n": np.int64(1), "q": qty_c, "r": rev_c})
            .groupby("band", sort=False)
            .sum()
            .reset_index()
        )
        for c in ("n", "q", "r"):
            out[c] = out[c].astype("int64")
        return out

    parts = (
        _read(sf_dir, "lineitem", ["l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "disc_pct": pd.Series(dtype="int64"),
            "n_items": pd.Series(dtype="int64"),
            "avg_qty": pd.Series(dtype="float64"),
            "avg_revenue": pd.Series(dtype="float64"),
        }
    )
    if "band" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("band", sort=True)[["n", "q", "r"]].sum()
    n = agg["n"].to_numpy(dtype=np.float64)
    return pd.DataFrame(
        {
            "disc_pct": agg.index.to_numpy(dtype=np.int64),
            "n_items": agg["n"].astype("int64").to_numpy(),
            "avg_qty": np.floor(agg["q"].to_numpy(np.float64) / 100.0 / n * 1e6 + 0.5) / 1e6,
            "avg_revenue": np.floor(agg["r"].to_numpy(np.float64) / 100.0 / n * 1e6 + 0.5)
            / 1e6,
        }
    )


def basket_size_dist(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Order basket-size distribution: how many orders carry exactly k
    line items — the order-granularity census (customer_order_dist's
    twin one level down the hierarchy).

    Scale shape: per-orderkey count combiner, orderkey buckets emit
    HISTOGRAM partials, driver merges ≤ buckets × |size domain| rows.
    """
    line = _read(sf_dir, "lineitem", ["l_orderkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b.groupby("l_orderkey", sort=False).size().reset_index(name="n")
        return pd.DataFrame(
            {
                "bucket": (c["l_orderkey"] % num_buckets).astype("int32"),
                "okey": c["l_orderkey"].astype("int64"),
                "n": c["n"].astype("int64"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("okey", sort=False)["n"].sum()
        h = per.value_counts()
        return pd.DataFrame(
            {"basket_size": h.index.astype("int64"), "n_orders": h.to_numpy(dtype=np.int64)}
        )

    hist = (
        line.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "basket_size" not in hist.columns or not len(hist):
        return pd.DataFrame(
            {"basket_size": pd.Series(dtype="int64"), "n_orders": pd.Series(dtype="int64")}
        )
    out = hist.groupby("basket_size", sort=True)["n_orders"].sum().reset_index()
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def product_profit(
    sf_dir: str, name_like: str = "red", num_buckets: int = 64
) -> pd.DataFrame:
    """TPC-H Q9-shaped product-type profit: per (supplier nation, order
    year), discounted revenue minus retail-cost-of-goods
    (p_retailprice × quantity stands in for ps_supplycost — this corpus
    has no partsupp table) over parts whose name contains ``name_like``.

    Exactness: revenue quantizes to cents with the proven
    floor(ep·(1−d)·100+0.5) kernel; cost is the exact integer
    retail_cents × quantity; everything sums as int64.

    Scale shape: part (filtered) and supplier→nation maps broadcast via
    ``ray.put`` (dimension sides); lineitem rows shrink to
    (orderkey, nation, profit_cents) and meet the (orderkey, year) order
    stream in ORDERKEY hash buckets — one shuffle of pruned streams."""
    from kgray.functions.broadcast import cached_get

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).to_pandas()
    m = part["p_name"].str.contains(name_like, regex=False)
    fp = part.loc[m].sort_values("p_partkey")
    # sorted key/value ARRAYS (not dicts): lookups inside the hot batch fn
    # are one vectorized searchsorted, no per-row python and no per-batch
    # key-array rebuild
    pmap_ref = ray.put(
        (
            fp["p_partkey"].to_numpy(dtype=np.int64),
            np.floor(fp["p_retailprice"].to_numpy() * 100.0 + 0.5).astype(np.int64),
        )
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    supp = supp.sort_values("s_suppkey")
    smap_ref = ray.put(
        (
            supp["s_suppkey"].to_numpy(dtype=np.int64),
            supp["s_nationkey"].map(n_name).to_numpy(dtype=object),
        )
    )

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        pkeys, rcst = cached_get(pmap_ref)
        skeys, snat = cached_get(smap_ref)
        keys = b["l_partkey"].to_numpy(dtype=np.int64)
        if len(pkeys):
            pos_c = np.minimum(np.searchsorted(pkeys, keys), len(pkeys) - 1)
            sel = pkeys[pos_c] == keys
        else:
            pos_c = np.zeros(len(keys), dtype=np.int64)
            sel = np.zeros(len(keys), dtype=bool)
        b = b.loc[sel]
        rev_c = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 100.0
            + 0.5
        ).astype(np.int64)
        cost_c = rcst[pos_c[sel]] * b["l_quantity"].to_numpy().astype(np.int64)
        lsup = b["l_suppkey"].to_numpy(dtype=np.int64)
        if len(skeys):
            spos = np.minimum(np.searchsorted(skeys, lsup), len(skeys) - 1)
            keep = skeys[spos] == lsup
            nation = snat[spos[keep]]
        else:  # empty supplier dimension: every l_suppkey dangles
            keep = np.zeros(len(lsup), dtype=bool)
            nation = snat[:0]
        # dangling l_suppkey: drop rather than mis-attribute
        out = pd.DataFrame(
            {
                "okey": b["l_orderkey"].to_numpy(dtype=np.int64)[keep],
                "nation": nation,
                "pc": (rev_c - cost_c)[keep],
            }
        )
        out["side"] = np.int8(0)
        out["o_year"] = ""
        return out

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "okey": b["o_orderkey"].to_numpy(dtype=np.int64),
                "nation": "",
                "pc": np.int64(0),
                "side": np.int8(1),
                "o_year": b["o_orderdate"].dt.strftime("%Y").to_numpy(dtype=object),
            }
        )
        return out

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (b["okey"] % num_buckets).astype("int32")
        return b

    tagged = (
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(line_rows, batch_format="pandas", batch_size=262144)
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
                order_rows, batch_format="pandas"
            )
        )
        .map_batches(add_bucket, batch_format="pandas")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0]
        od = g[g["side"] == 1][["okey", "o_year"]]
        j = li[["okey", "nation", "pc"]].merge(od, on="okey")
        if not len(j):
            return pd.DataFrame(
                {
                    "nation": pd.Series(dtype=object),
                    "o_year": pd.Series(dtype=object),
                    "pc": pd.Series(dtype="int64"),
                }
            )
        return j.groupby(["nation", "o_year"], sort=False)["pc"].sum().reset_index()

    parts = tagged.groupby("bucket").map_groups(per_bucket, batch_format="pandas").to_pandas()
    if "nation" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {
                "nation": pd.Series(dtype=object),
                "o_year": pd.Series(dtype=object),
                "sum_profit": pd.Series(dtype="float64"),
            }
        )
    out = parts.groupby(["nation", "o_year"], sort=True)["pc"].sum().reset_index()
    out["sum_profit"] = out["pc"].to_numpy(dtype=np.float64) / 100.0
    return out.drop(columns=["pc"]).reset_index(drop=True)


def important_parts(
    sf_dir: str, nation: str = "NATION_3", ppm_threshold: int = 1000, num_buckets: int = 64
) -> pd.DataFrame:
    """TPC-H Q11-shaped important stock: parts whose shipped discounted
    revenue from ONE nation's suppliers exceeds 1/``ppm_threshold`` of
    that nation's total — the HAVING-against-a-global-scalar shape
    (lineitem revenue stands in for ps_supplycost·ps_availqty).

    Exactness: cents int64 everywhere; the threshold compares
    value·threshold > total as exact ints (no division).

    Scale shape: the nation's supplier set broadcasts; per-batch
    combiner pre-sums (partkey → cents) so the PARTKEY-bucket shuffle
    moves ≤ |part| rows per batch; the driver sees ≤ |part| rows."""
    from kgray.functions.broadcast import cached_get

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk = set(nat.loc[nat["n_name"] == nation, "n_nationkey"].astype(int))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    skeys_ref = ray.put(
        np.sort(supp.loc[supp["s_nationkey"].isin(nk), "s_suppkey"].to_numpy(np.int64))
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        sk = cached_get(skeys_ref)
        m = np.isin(b["l_suppkey"].to_numpy(dtype=np.int64), sk)
        b = b.loc[m]
        rc = np.floor(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy()) * 100.0
            + 0.5
        ).astype(np.int64)
        d = (
            pd.DataFrame({"pkey": b["l_partkey"].to_numpy(dtype=np.int64), "rc": rc})
            .groupby("pkey", sort=False)["rc"]
            .sum()
            .reset_index()
        )
        d["bucket"] = (d["pkey"] % num_buckets).astype("int32")
        return d

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("pkey", sort=False)["rc"].sum().reset_index()

    vals = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {"p_partkey": pd.Series(dtype="int64"), "value": pd.Series(dtype="float64")}
    )
    if "pkey" not in vals.columns or not len(vals):
        return empty
    total = int(vals["rc"].sum())
    keep = vals.loc[vals["rc"].to_numpy() * ppm_threshold > total]
    if not len(keep):
        return empty
    return pd.DataFrame(
        {
            "p_partkey": keep["pkey"].astype("int64").to_numpy(),
            "value": keep["rc"].to_numpy(dtype=np.float64) / 100.0,
        }
    ).sort_values("p_partkey").reset_index(drop=True)


def dominant_suppliers(
    sf_dir: str,
    name_like: str = "blue",
    since: str = "1996-01-01",
    until: str = "1998-01-01",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q20-shaped dominant suppliers: suppliers who shipped MORE
    THAN HALF of a part's total quantity (parts matching ``name_like``,
    ship dates in [since, until)) — the per-group-threshold semi-join
    (shipped share stands in for availqty vs half demand).

    Scale shape: filtered part keys broadcast; per-batch combiner
    pre-sums (partkey, suppkey) → qty; PARTKEY buckets hold every
    supplier of a part together, so dominance (2·sq > total) is decided
    inside the bucket; supplier/nation names attach from broadcast maps
    on the tiny winner set."""
    from kgray.functions.broadcast import cached_get

    part = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    pkeys_ref = ray.put(
        np.sort(
            part.loc[
                part["p_name"].str.contains(name_like, regex=False), "p_partkey"
            ].to_numpy(np.int64)
        )
    )
    lo, hi = pd.Timestamp(since), pd.Timestamp(until)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pk = cached_get(pkeys_ref)
        m = (
            np.isin(b["l_partkey"].to_numpy(dtype=np.int64), pk)
            & (b["l_shipdate"] >= lo).to_numpy()
            & (b["l_shipdate"] < hi).to_numpy()
        )
        b = b.loc[m]
        d = (
            pd.DataFrame(
                {
                    "pkey": b["l_partkey"].to_numpy(dtype=np.int64),
                    "skey": b["l_suppkey"].to_numpy(dtype=np.int64),
                    "q": b["l_quantity"].to_numpy().astype(np.int64),
                }
            )
            .groupby(["pkey", "skey"], sort=False)["q"]
            .sum()
            .reset_index()
        )
        d["bucket"] = (d["pkey"] % num_buckets).astype("int32")
        return d

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pq = g.groupby(["pkey", "skey"], sort=False)["q"].sum().reset_index()
        tot = pq.groupby("pkey", sort=False)["q"].transform("sum")
        win = pq.loc[2 * pq["q"].to_numpy() > tot.to_numpy()]
        return win[["skey", "pkey"]]

    wins = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "s_name": pd.Series(dtype=object),
            "n_name": pd.Series(dtype=object),
            "n_parts": pd.Series(dtype="int64"),
        }
    )
    if "skey" not in wins.columns or not len(wins):
        return empty
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    s_name = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    s_nat = dict(zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].map(n_name)))
    agg = wins.groupby("skey", sort=True).size().reset_index(name="n_parts")
    return pd.DataFrame(
        {
            "s_name": agg["skey"].map(lambda k: s_name[int(k)]),
            "n_name": agg["skey"].map(lambda k: s_nat[int(k)]),
            "n_parts": agg["n_parts"].astype("int64"),
        }
    ).sort_values("s_name").reset_index(drop=True)


def waiting_suppliers(
    sf_dir: str, late_days: int = 90, status: str = "F", num_buckets: int = 64
) -> pd.DataFrame:
    """TPC-H Q21-shaped suppliers who kept orders waiting: for finished
    ('F') orders with at least TWO distinct suppliers where EXACTLY ONE
    supplier shipped late (shipdate > orderdate + ``late_days``), count
    such orders per guilty supplier (ship-vs-order lag stands in for
    receipt-vs-commit — this corpus has no commit/receipt dates).

    Scale shape: the filtered (orderkey, orderdate) order stream and the
    (orderkey, suppkey, shipdate) lineitem stream meet in ORDERKEY hash
    buckets; the exists / not-exists pair collapses to vectorized
    per-order distinct counts inside the bucket; supplier names attach
    from a broadcast map on the tiny per-supplier counts."""

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["o_orderstatus"] == status]
        return pd.DataFrame(
            {
                "okey": b["o_orderkey"].to_numpy(dtype=np.int64),
                "skey": np.int64(-1),
                "us": b["o_orderdate"].astype("datetime64[us]").astype("int64"),
                "side": np.int8(1),
            }
        )

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": b["l_orderkey"].to_numpy(dtype=np.int64),
                "skey": b["l_suppkey"].to_numpy(dtype=np.int64),
                "us": b["l_shipdate"].astype("datetime64[us]").astype("int64"),
                "side": np.int8(0),
            }
        )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (b["okey"] % num_buckets).astype("int32")
        return b

    tagged = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(line_rows, batch_format="pandas", batch_size=262144)
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"]).map_batches(
                order_rows, batch_format="pandas"
            )
        )
        .map_batches(add_bucket, batch_format="pandas")
    )
    late_us = int(late_days) * 86_400_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0][["okey", "skey", "us"]]
        od = g[g["side"] == 1][["okey", "us"]].rename(columns={"us": "ous"})
        j = li.merge(od, on="okey")
        if not len(j):
            return pd.DataFrame(
                {"skey": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")}
            )
        j["late"] = (j["us"].to_numpy() > j["ous"].to_numpy() + late_us).astype(np.int8)
        per_pair = j.groupby(["okey", "skey"], sort=False)["late"].max().reset_index()
        per_order = per_pair.groupby("okey", sort=False).agg(
            ns=("skey", "size"), nl=("late", "sum")
        )
        hit = per_order.index[(per_order["ns"] >= 2) & (per_order["nl"] == 1)]
        guilty = per_pair.loc[
            per_pair["okey"].isin(hit) & (per_pair["late"] == 1), "skey"
        ]
        out = guilty.value_counts().reset_index()
        out.columns = ["skey", "n"]
        out["skey"] = out["skey"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out

    parts = tagged.groupby("bucket").map_groups(per_bucket, batch_format="pandas").to_pandas()
    empty = pd.DataFrame(
        {"s_name": pd.Series(dtype=object), "numwait": pd.Series(dtype="int64")}
    )
    if "skey" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("skey", sort=True)["n"].sum().reset_index()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    s_name = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    return pd.DataFrame(
        {
            "s_name": agg["skey"].map(lambda k: s_name[int(k)]),
            "numwait": agg["n"].astype("int64"),
        }
    ).sort_values("s_name").reset_index(drop=True)


def idle_customer_balance(
    sf_dir: str,
    nationkeys: tuple[int, ...] = (1, 2, 4),
    dormant_since: str = "2001-01-01",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q22-shaped global sales opportunity: per nation (standing in
    for the phone country code), the count and total balance of customers
    whose balance beats the positive-balance average of the nation set
    and who have placed no orders since ``dormant_since`` — the
    scalar-subquery + anti-join.

    Exactness: balances in cents; the above-average test is the exact
    integer cross-multiplication bal·n > Σbal.

    Scale shape: pass 1 folds (Σ positive cents, count) per batch —
    two scalars; pass 2 buckets filtered customers and the pre-shrunk
    distinct order custkeys by CUSTKEY hash, anti-joining inside the
    bucket; the driver merges per-nation partials."""
    nset = set(int(k) for k in nationkeys)

    def avg_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["c_nationkey"].isin(nset)]
        bal = np.floor(b["c_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        pos = bal[bal > 0]
        return pd.DataFrame({"s": [int(pos.sum())], "n": [int(len(pos))]})

    scal = (
        _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        .map_batches(avg_partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "cntrycode": pd.Series(dtype="int64"),
            "numcust": pd.Series(dtype="int64"),
            "totacctbal": pd.Series(dtype="float64"),
        }
    )
    tot_s, tot_n = int(scal["s"].sum()), int(scal["n"].sum())
    if tot_n == 0:
        return empty

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        b = b.loc[b["c_nationkey"].isin(nset)]
        bal = np.floor(b["c_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        m = bal * tot_n > tot_s
        return pd.DataFrame(
            {
                "ckey": b.loc[m, "c_custkey"].to_numpy(dtype=np.int64),
                "nk": b.loc[m, "c_nationkey"].to_numpy(dtype=np.int64),
                "bal": bal[m],
                "side": np.int8(1),
            }
        )

    cutoff = pd.Timestamp(dormant_since)

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        ck = np.unique(
            b.loc[(b["o_orderdate"] >= cutoff).to_numpy(), "o_custkey"].to_numpy(
                dtype=np.int64
            )
        )
        return pd.DataFrame(
            {"ckey": ck, "nk": np.int64(0), "bal": np.int64(0), "side": np.int8(0)}
        )

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["bucket"] = (b["ckey"] % num_buckets).astype("int32")
        return b

    tagged = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(cust_rows, batch_format="pandas", batch_size=262144)
        .union(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
                order_rows, batch_format="pandas", batch_size=262144
            )
        )
        .map_batches(add_bucket, batch_format="pandas")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["side"] == 0, "ckey"].unique()
        cand = g[g["side"] == 1]
        keep = cand.loc[~cand["ckey"].isin(have)]
        if not len(keep):
            return pd.DataFrame(
                {
                    "nk": pd.Series(dtype="int64"),
                    "numcust": pd.Series(dtype="int64"),
                    "bal": pd.Series(dtype="int64"),
                }
            )
        out = keep.groupby("nk", sort=False).agg(
            numcust=("ckey", "size"), bal=("bal", "sum")
        ).reset_index()
        return out

    parts = tagged.groupby("bucket").map_groups(per_bucket, batch_format="pandas").to_pandas()
    if "nk" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("nk", sort=True)[["numcust", "bal"]].sum().reset_index()
    return pd.DataFrame(
        {
            "cntrycode": agg["nk"].astype("int64"),
            "numcust": agg["numcust"].astype("int64"),
            "totacctbal": agg["bal"].to_numpy(dtype=np.float64) / 100.0,
        }
    )


def min_balance_supplier(
    sf_dir: str,
    region: str = "EUROPE",
    size: int = 15,
    ptype: str = "STANDARD",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier: for each part of the given
    size and type, the region's supplier(s) with the MINIMUM account
    balance among those who actually shipped it (acctbal stands in for
    ps_supplycost) — the correlated-min join-back shape.

    Scale shape: filtered part keys and the region's supplier attributes
    broadcast; lineitem shrinks to distinct (partkey, suppkey) pairs per
    batch, PARTKEY buckets decide the per-part argmin locally, names
    attach from the broadcast map on the winner set."""
    from kgray.functions.broadcast import cached_get

    part = _read(sf_dir, "part", ["p_partkey", "p_size", "p_type"]).to_pandas()
    pkeys_ref = ray.put(
        np.sort(
            part.loc[
                (part["p_size"] == size) & (part["p_type"] == ptype), "p_partkey"
            ].to_numpy(np.int64)
        )
    )
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"].astype(int))
    nat = nat.loc[nat["n_regionkey"].isin(rkeys)]
    n_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]).to_pandas()
    supp = supp.loc[supp["s_nationkey"].isin(n_name.keys())]
    bal_c = np.floor(supp["s_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    sbal_ref = ray.put(dict(zip(supp["s_suppkey"].astype(int), bal_c)))
    s_name = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    s_nat = dict(zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].map(n_name)))

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        pk = cached_get(pkeys_ref)
        sb = cached_get(sbal_ref)
        m = np.isin(b["l_partkey"].to_numpy(dtype=np.int64), pk) & np.isin(
            b["l_suppkey"].to_numpy(dtype=np.int64),
            np.fromiter(sb.keys(), dtype=np.int64, count=len(sb)),
        )
        d = pd.DataFrame(
            {
                "pkey": b.loc[m, "l_partkey"].to_numpy(dtype=np.int64),
                "skey": b.loc[m, "l_suppkey"].to_numpy(dtype=np.int64),
            }
        ).drop_duplicates()
        d["bal"] = d["skey"].map(lambda k: sb[int(k)]).astype("int64")
        d["bucket"] = (d["pkey"] % num_buckets).astype("int32")
        return d

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["pkey", "skey"])
        mn = g.groupby("pkey", sort=False)["bal"].transform("min")
        return g.loc[g["bal"].to_numpy() == mn.to_numpy(), ["pkey", "skey", "bal"]]

    wins = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(pairs, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "s_acctbal": pd.Series(dtype="float64"),
            "s_name": pd.Series(dtype=object),
            "n_name": pd.Series(dtype=object),
            "p_partkey": pd.Series(dtype="int64"),
        }
    )
    if "pkey" not in wins.columns or not len(wins):
        return empty
    return pd.DataFrame(
        {
            "s_acctbal": wins["bal"].to_numpy(dtype=np.float64) / 100.0,
            "s_name": wins["skey"].map(lambda k: s_name[int(k)]),
            "n_name": wins["skey"].map(lambda k: s_nat[int(k)]),
            "p_partkey": wins["pkey"].astype("int64"),
        }
    ).sort_values(["p_partkey", "s_name"]).reset_index(drop=True)


def qty_discount_spearman(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation between l_quantity and l_discount —
    the monotone-association audit (are bigger orders discounted
    deeper?) computed WITHOUT a global sort: both variables live on
    tiny bounded domains (integer quantities, cent discounts), so the
    exact joint histogram determines every midrank.

    Exactness: doubled midranks (2r = 2·cum_before + count + 1) are
    exact ints; the weighted Pearson moments accumulate as python
    bigints (n·Σr² passes int64 at bench scale — the HUGEINT twin
    mirrors); each (n·sxx−sx²) factor converts to double BEFORE the
    product (their product passes even HUGEINT), and the single
    division + sqrt micro-quantizes identically.

    Scale shape: per-batch joint-histogram combiner → ≤ |qty domain| ×
    |discount domain| partial rows per batch; driver merge is bounded
    regardless of corpus size."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = b["l_quantity"].to_numpy().astype(np.int64)
        d = np.floor(b["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return (
            pd.DataFrame({"q": q, "d": d})
            .groupby(["q", "d"], sort=False)
            .size()
            .reset_index(name="c")
        )

    parts = (
        _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    empty = pd.DataFrame(
        {"n": pd.Series(dtype="int64"), "rho": pd.Series(dtype="float64")}
    )
    if "q" not in parts.columns or not len(parts):
        return empty
    cells = parts.groupby(["q", "d"], sort=True)["c"].sum().reset_index()

    def doubled_ranks(col: str) -> dict[int, int]:
        marg = cells.groupby(col, sort=True)["c"].sum()
        out: dict[int, int] = {}
        before = 0
        for v, cnt in marg.items():
            out[int(v)] = 2 * before + int(cnt) + 1
            before += int(cnt)
        return out

    rq, rd = doubled_ranks("q"), doubled_ranks("d")
    n = sx = sy = sxx = syy = sxy = 0
    for q, d, c in cells.itertuples(index=False):
        x, y, c = rq[int(q)], rd[int(d)], int(c)
        n += c
        sx += c * x
        sy += c * y
        sxx += c * x * x
        syy += c * y * y
        sxy += c * x * y
    a, b_ = n * sxx - sx * sx, n * syy - sy * sy
    if a <= 0 or b_ <= 0:
        return empty
    rho = float(n * sxy - sx * sy) / np.sqrt(np.float64(float(a)) * np.float64(float(b_)))
    return pd.DataFrame(
        {"n": [np.int64(n)], "rho": [np.floor(rho * 1e6 + 0.5) / 1e6]}
    )


def nation_revenue_hhi(sf_dir: str) -> pd.DataFrame:
    """Herfindahl-Hirschman concentration of order revenue across
    customer nations: HHI = Σ shareᵢ² and the largest single share —
    is the business concentrated in one market?

    Exactness: HHI·total² = Σ rᵢ² in exact integer cents (python
    bigints / HUGEINT twin), so only the final two divisions are
    floating and micro-quantize identically.

    Scale shape: customer→nation broadcast; per-batch (nation, cents)
    partials; 25 driver rows."""
    from kgray.functions.broadcast import cached_get

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    cmap_ref = ray.put(
        (
            cust["c_custkey"].to_numpy(dtype=np.int64),
            cust["c_nationkey"].to_numpy(dtype=np.int64),
        )
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ckeys, cnat = cached_get(cmap_ref)
        rc = np.floor(b["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        ok = b["o_custkey"].to_numpy(dtype=np.int64)
        if len(ckeys):
            pos = np.minimum(np.searchsorted(ckeys, ok), len(ckeys) - 1)
            hit = ckeys[pos] == ok
            nk = cnat[pos][hit]
        else:  # empty dimension: no order attributes to any nation
            hit = np.zeros(len(ok), dtype=bool)
            nk = np.empty(0, dtype=np.int64)
        return (
            pd.DataFrame({"nk": nk, "rc": rc[hit]})
            .groupby("nk", sort=False)["rc"]
            .sum()
            .reset_index()
        )

    parts = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "n_nations": pd.Series(dtype="int64"),
            "hhi": pd.Series(dtype="float64"),
            "top_share": pd.Series(dtype="float64"),
        }
    )
    if "nk" not in parts.columns or not len(parts):
        return empty
    rev = {
        int(nk): sum(int(v) for v in grp["rc"]) for nk, grp in parts.groupby("nk")
    }
    total = sum(rev.values())
    if total <= 0:
        return empty
    sumsq = sum(r * r for r in rev.values())
    hhi = np.floor(float(sumsq) / float(total) / float(total) * 1e6 + 0.5) / 1e6
    top = np.floor(float(max(rev.values())) / float(total) * 1e6 + 0.5) / 1e6
    return pd.DataFrame(
        {"n_nations": [np.int64(len(rev))], "hhi": [hhi], "top_share": [top]}
    )


def engagement_revenue_link(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Cross-dataset federation: bucket users into engagement terciles by
    EVENT count (behavioral table), then roll their ORDER revenue up per
    tercile — does engagement actually monetize?  Customers with no
    events land in tercile −1 (the dark-traffic segment).

    Exactness: terciles come from the deterministic rank cut
    idx·3 // n over users sorted by (count, user_id); revenue in cents.

    Scale shape: per-user event counts via user-bucket combiner (driver
    sees ≤ |users| rows — dimension-bounded); the user→tercile map
    broadcasts; one streaming orders pass emits per-tercile partials."""
    from kgray.functions.broadcast import cached_get

    events = _read(sf_dir, "events", ["user_id"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b.groupby("user_id", sort=False).size().reset_index(name="n")
        return pd.DataFrame(
            {
                "bucket": (c["user_id"] % num_buckets).astype("int32"),
                "u": c["user_id"].astype("int64"),
                "n": c["n"].astype("int64"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("u", sort=False)["n"].sum().reset_index()

    counts = (
        events.map_batches(count_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "tercile": pd.Series(dtype="int64"),
            "n_users": pd.Series(dtype="int64"),
            "n_orders": pd.Series(dtype="int64"),
            "revenue": pd.Series(dtype="float64"),
        }
    )
    if "u" not in counts.columns or not len(counts):
        return empty
    counts = counts.sort_values(["n", "u"], kind="mergesort").reset_index(drop=True)
    nu = len(counts)
    terc = (np.arange(nu, dtype=np.int64) * 3) // nu
    tmap_ref = ray.put(dict(zip(counts["u"].astype(int), terc)))

    def order_partial(b: pd.DataFrame) -> pd.DataFrame:
        tm = cached_get(tmap_ref)
        rc = np.floor(b["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        t = np.array(
            [tm.get(int(k), -1) for k in b["o_custkey"].to_numpy(dtype=np.int64)],
            dtype=np.int64,
        )
        d = pd.DataFrame({"tercile": t, "n_orders": 1, "rc": rc})
        return d.groupby("tercile", sort=False).sum().reset_index()

    parts = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(order_partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    if "tercile" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("tercile", sort=True)[["n_orders", "rc"]].sum().reset_index()
    users_per = pd.Series(terc).value_counts().to_dict()
    # dark segment: customers with orders but no events counted from the
    # customer dimension (total customers − event users)
    n_customers = _read(sf_dir, "customer", ["c_custkey"]).count()
    users_per[-1] = n_customers - nu
    agg["n_users"] = agg["tercile"].map(lambda t: users_per.get(int(t), 0)).astype("int64")
    agg["revenue"] = agg["rc"].to_numpy(dtype=np.float64) / 100.0
    return agg[["tercile", "n_users", "n_orders", "revenue"]].astype(
        {"tercile": "int64", "n_orders": "int64"}
    )


def monthly_seasonal_index(sf_dir: str) -> pd.DataFrame:
    """Seasonal index per calendar month: month's average daily revenue
    over the all-months average daily revenue (index 1.0 = typical) —
    the classical-decomposition seasonal factor on the order series.

    Exactness: cents and day counts are exact ints; the index evaluates
    in ONE fixed-order float expression (rc·D)/(days·T) of exact-int
    operands, micro-quantized.

    Scale shape: per-batch (month → cents, distinct-day set is bounded
    by the calendar) partials; |months| driver rows."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rc = np.floor(b["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        mon = b["o_orderdate"].dt.strftime("%Y-%m")
        day = b["o_orderdate"].dt.strftime("%Y-%m-%d")
        d = pd.DataFrame({"mon": mon, "day": day, "rc": rc})
        out = d.groupby(["mon", "day"], sort=False)["rc"].sum().reset_index()
        return out

    parts = (
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pandas", batch_size=262144)
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "month": pd.Series(dtype=object),
            "n_days": pd.Series(dtype="int64"),
            "revenue": pd.Series(dtype="float64"),
            "seasonal_index": pd.Series(dtype="float64"),
        }
    )
    if "mon" not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby(["mon", "day"], sort=True)["rc"].sum().reset_index()
    per_mon = daily.groupby("mon", sort=True).agg(
        n_days=("day", "size"), rc=("rc", "sum")
    )
    total_c = int(per_mon["rc"].sum())
    total_days = int(per_mon["n_days"].sum())
    rows = []
    for mon, r in per_mon.iterrows():
        rc, nd = int(r["rc"]), int(r["n_days"])
        idx = (float(rc) * total_days) / (float(nd) * total_c)
        rows.append((mon, nd, rc / 100.0, np.floor(idx * 1e6 + 0.5) / 1e6))
    return pd.DataFrame(
        rows, columns=["month", "n_days", "revenue", "seasonal_index"]
    )
