"""Temporal operators Ray Data lacks natively: parametric tumbling-window
aggregation, keyed as-of joins, and non-equi range (interval) joins.

These are the stream-shaped operators a large training-data pipeline needs
beyond plain groupby/sort (event attribution, burst detection, time-bucket
rollups).  Each is expressed Ray-Data-first — ``map_batches`` partials plus
at most one bucketed ``groupby`` shuffle — with its partitioning assumption
documented on the function.  No stage materializes an input-sized stream on
the driver: what crosses the wire is per-window partials, per-key bucket
rows, or per-bin partial counts.

The reference engine has no temporal-join layer (its only temporal work is
per-fact date parsing, itext2kg/atom/models/schemas.py); these operators
extend the engine the same way ops/dedup.py extends it past the
reference's exact-match canonicalization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_US = 1_000_000


def windowed_aggregate(
    ds: ray.data.Dataset,
    window_seconds: int,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> pd.DataFrame:
    """Tumbling-window aggregate: per (keys…, window_start) row count and
    value sum, for an arbitrary window width (not just calendar units).

    Scale shape: the window id is int64 floor-division on the raw
    timestamp storage (no Python datetime objects), the per-batch partial
    is an Arrow ``group_by`` (zero-copy from the object store), and only
    the tiny (keys × windows) partial stream reaches the driver combine —
    the input never shuffles.  Assumes timestamps ≥ epoch (integer
    division == floor for non-negative values).
    """
    w_us = int(window_seconds) * _US
    keys = list(key_cols)

    def partial(t: pa.Table) -> pa.Table:
        # normalize the storage unit before viewing as int64 (parquet is
        # timestamp[us]; in-memory pandas blocks arrive as timestamp[ns])
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        win = pc.multiply(pc.divide(us, pa.scalar(w_us, pa.int64())), pa.scalar(w_us, pa.int64()))
        cols = {k: t[k] for k in keys}
        cols["win_us"] = win
        cols[value_col] = t[value_col]
        return (
            pa.table(cols)
            .group_by(keys + ["win_us"])
            .aggregate([(value_col, "sum"), (value_col, "count")])
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (
        partials.groupby(keys + ["win_us"], sort=False)[[f"{value_col}_sum", f"{value_col}_count"]]
        .sum()
        .reset_index()
    )
    out["window_start"] = pd.to_datetime(out["win_us"], unit="us").dt.strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    out = out.rename(columns={f"{value_col}_sum": "sum_value", f"{value_col}_count": "n_events"})
    out["sum_value"] = out["sum_value"].astype(float).round(4)
    out["n_events"] = out["n_events"].astype("int64")
    return (
        out[keys + ["window_start", "n_events", "sum_value"]]
        .sort_values(keys + ["window_start"], kind="mergesort")
        .reset_index(drop=True)
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str = "user_id",
    ts_col: str = "ts",
    left_id: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 64,
    direction: str = "backward",
) -> ray.data.Dataset:
    """Keyed as-of join: each left row picks the most recent right row of
    the same ``by`` key with ``right.ts <= left.ts`` (``direction=
    "backward"``, exact matches allowed), yielding ``prior_ts`` /
    ``prior_value`` columns; lefts with no prior right keep nulls.
    ``direction="forward"`` flips the predicate to the EARLIEST right row
    with ``right.ts >= left.ts`` (time-to-next-conversion shape) and
    names the columns ``next_ts`` / ``next_value``.

    Scale shape: both sides are tagged and hash-bucketed on ``by`` inside
    ``map_batches``; ONE ``groupby(bucket)`` shuffle co-locates every
    key's rows; each bucket runs a single vectorized
    ``pandas.merge_asof`` over its sorted rows.  Partitioning assumption:
    one key's rows land in one group — per-key volume is the skew bound,
    inherent to any keyed as-of join (raise ``num_buckets`` to spread
    distinct keys, not a hot key).  Right rows are deduped per (key, ts)
    keeping the max value so timestamp ties resolve deterministically on
    every backend.
    """

    def tag(side: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "bucket": (b[by] % num_buckets).astype("int32"),
                    by: b[by].astype("int64"),
                    ts_col: b[ts_col],
                    "side": np.int8(side),
                    left_id: (b[left_id] if side == 0 else 0 * b[by]).astype("int64"),
                    value_col: b[value_col].astype(float),
                }
            )

        return f

    tagged = left.map_batches(tag(0), batch_format="pandas").union(
        right.map_batches(tag(1), batch_format="pandas")
    )

    out_ts = "prior_ts" if direction == "backward" else "next_ts"
    out_val = "prior_value" if direction == "backward" else "next_value"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0].sort_values(ts_col, kind="mergesort")
        r = (
            g[g["side"] == 1]
            .groupby([by, ts_col], sort=False)[value_col]
            .max()
            .reset_index()
        )
        r[out_ts] = r[ts_col]
        r = r.rename(columns={value_col: out_val}).sort_values(ts_col, kind="mergesort")
        m = pd.merge_asof(
            l[[left_id, by, ts_col, value_col]],
            r,
            on=ts_col,
            by=by,
            direction=direction,
            allow_exact_matches=True,
        )
        return m[[left_id, by, ts_col, value_col, out_ts, out_val]]

    return tagged.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def range_join_count(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    window_seconds: int,
    left_id: str = "event_id",
    ts_col: str = "ts",
    out_col: str = "n_matches",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Non-equi range join (count flavor): for every left row, the number
    of right rows with ``ts`` in ``[left.ts, left.ts + window)``.  Lefts
    with zero matches are kept (left-join semantics).

    There is no equality key, so the all-to-all is bounded by BINNING
    time into window-sized buckets: a right row lands in exactly one bin,
    a left interval overlaps exactly two adjacent bins, and matching runs
    inside ``groupby(bin)`` as a sorted ``searchsorted`` — O(n log n) per
    bin, never a cross product.  Per-bin partial counts (≤ 2 rows per
    left) combine in a second bucketed groupby on the left id.
    Partitioning assumption: event time is roughly uniform at bin
    granularity; a bin holding a pathological share of the stream
    concentrates in one group (subdivide bins / salt if that arises).
    """
    w_us = int(window_seconds) * _US

    def left_bins(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t[left_id].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = us // w_us
        return pa.table(
            {
                "bin": np.concatenate([b0, b0 + 1]),
                left_id: np.concatenate([ids, ids]),
                "start_us": np.concatenate([us, us]),
                "side": np.zeros(2 * len(us), dtype=np.int8),
            }
        )

    def right_bins(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bin": us // w_us,
                left_id: np.zeros(len(us), dtype=np.int64),
                "start_us": us,
                "side": np.ones(len(us), dtype=np.int8),
            }
        )

    tagged = left.map_batches(left_bins, batch_format="pyarrow").union(
        right.map_batches(right_bins, batch_format="pyarrow")
    )

    def per_bin(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0]
        rs = np.sort(g.loc[g["side"] == 1, "start_us"].to_numpy())
        starts = l["start_us"].to_numpy()
        cnt = np.searchsorted(rs, starts + w_us, side="left") - np.searchsorted(
            rs, starts, side="left"
        )
        return pd.DataFrame(
            {
                "ebucket": (l[left_id] % num_buckets).astype("int32"),
                left_id: l[left_id].astype("int64"),
                out_col: cnt.astype("int64"),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(left_id, sort=False)[out_col].sum().reset_index()
        out[out_col] = out[out_col].astype("int64")
        return out

    return (
        tagged.groupby("bin")
        .map_groups(per_bin, batch_format="pandas")
        .groupby("ebucket")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .sort_values(left_id, kind="mergesort")
        .reset_index(drop=True)
    )


def funnel_counts(
    events: ray.data.Dataset,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Ordered-funnel analysis: for each prefix of ``steps``, how many
    users completed it in order (each step strictly AFTER the previous
    one's earliest completion — the standard earliest-completion greedy,
    which is optimal for funnels).

    Scale shape: rows are filtered to the step event types at the source,
    ONE user-hash bucket shuffle co-locates each user's events, each
    bucket resolves its users' funnels vectorized (one filter +
    groupby-min per step), and only ``buckets × len(steps)`` count rows
    reach the driver.
    """
    step_set = list(steps)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[type_col].isin(step_set)]
        return pd.DataFrame(
            {
                "bucket": (b[user_col] % num_buckets).astype("int32"),
                user_col: b[user_col].to_numpy(),
                type_col: b[type_col].to_numpy(),
                ts_col: b[ts_col].to_numpy(),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # step 0: earliest occurrence per user; step i: earliest strictly
        # after the user's step-(i-1) time
        reach = g[g[type_col] == step_set[0]].groupby(user_col)[ts_col].min()
        counts = [len(reach)]
        for s in step_set[1:]:
            ev = g[g[type_col] == s]
            prev = ev[user_col].map(reach)
            ev = ev[ev[ts_col] > prev]  # NaT prev -> comparison False -> dropped
            reach = ev.groupby(user_col)[ts_col].min()
            counts.append(len(reach))
        return pd.DataFrame(
            {"step_idx": np.arange(len(step_set), dtype=np.int64),
             "step": step_set, "n_users": np.asarray(counts, dtype=np.int64)}
        )

    parts = (
        events.map_batches(tag, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby(["step_idx", "step"], sort=True)["n_users"]
        .sum()
        .reset_index()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("step_idx").reset_index(drop=True)


def cohort_retention(
    events: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Cohort-retention matrix: users grouped by first-seen day; for each
    (cohort_day, age_days) cell, how many of that cohort were active
    ``age_days`` days after their first day.

    Scale shape: ONE user-hash bucket shuffle (pruned to two columns);
    each bucket derives its users' cohort day and distinct activity days
    in a single pass, emitting (cohort_day, age_days, n) partials; the
    driver merge is bounded by days × ages, not users.
    """

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": (b[user_col] % num_buckets).astype("int32"),
                user_col: b[user_col].to_numpy(),
                "day": b[ts_col].dt.floor("D"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cohort = g.groupby(user_col)["day"].min()
        act = g[[user_col, "day"]].drop_duplicates()
        age = (act["day"] - act[user_col].map(cohort)).dt.days
        cell = pd.DataFrame(
            {
                "cohort_day": act[user_col].map(cohort).dt.strftime("%Y-%m-%d"),
                "age_days": age.astype("int64"),
            }
        )
        out = cell.groupby(["cohort_day", "age_days"], sort=False).size().reset_index(name="n_users")
        out["n_users"] = out["n_users"].astype("int64")
        return out

    parts = (
        events.map_batches(tag, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby(["cohort_day", "age_days"], sort=True)["n_users"]
        .sum()
        .reset_index()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def valid_at(
    quintuples: "ray.data.Dataset",
    at: float,
    start_col: str = "t_start",
    end_col: str = "t_end",
) -> "ray.data.Dataset":
    """Temporal-KG snapshot filter: keep observations whose validity
    interval covers epoch-seconds ``at``.  ATOM quintuples carry at most
    one boundary per observation (a 'start' or 'end' date, reference
    prompts.py temporal slots); a missing/unparseable boundary is open —
    atemporal facts are valid at every ``at``.  Stateless vectorized
    filter; composes with extract_quintuples BEFORE the merge (the merged
    edge sorts its date lists and loses start/end pairing by design —
    PARITY.md; snapshots therefore run on the observation stream)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.types as pt

    def boundary(col) -> np.ndarray:
        """First element of a 0/1-element list column (NaN when empty), or
        the scalar column itself — quintuple rows carry their boundary as
        a list (the reference's quintuple shape, PARITY.md §2)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pt.is_list(col.type) or pt.is_large_list(col.type):
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            off = col.offsets.to_numpy()[: len(lens)]
            out = np.full(len(lens), np.nan)
            nz = lens > 0
            out[nz] = flat[off[nz]]
            return out
        return col.to_numpy(zero_copy_only=False).astype(np.float64)

    def keep(t: pa.Table) -> pa.Table:
        s = boundary(t[start_col])
        e = boundary(t[end_col])
        ok = (np.isnan(s) | (s <= at)) & (np.isnan(e) | (e >= at))
        return t.filter(pa.array(ok))

    return quintuples.map_batches(keep, batch_format="pyarrow")


def event_transitions(
    events: "ray.data.Dataset",
    num_buckets: int = 64,
) -> "pd.DataFrame":
    """Sequence mining: counts of consecutive event-type transitions per
    user (the Markov-chain / next-event-prediction feature).  Ordering is
    (ts, event_id) within each user — deterministic under timestamp ties.

    ONE user-hash bucket shuffle co-locates each user's history (the
    keyed_window partitioning assumption); per bucket the transition pairs
    collapse to (prev, next, count) PARTIALS, so the driver merges only
    buckets × |event_type|² rows, never the event stream.
    """
    import numpy as np
    import pandas as pd

    def add_bucket(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.copy()
        b["bucket"] = (b["user_id"] % num_buckets).astype("int32")
        return b

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = g["user_id"].to_numpy()[:-1] == g["user_id"].to_numpy()[1:]
        et = g["event_type"].to_numpy()
        pairs = pd.DataFrame(
            {"prev_type": et[:-1][same_user], "next_type": et[1:][same_user]}
        )
        out = pairs.groupby(["prev_type", "next_type"], sort=False).size()
        return out.rename("n").reset_index()

    partials = (
        events.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "prev_type" not in partials.columns or not len(partials):
        return pd.DataFrame(
            {
                "prev_type": pd.Series(dtype=object),
                "next_type": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64),
            }
        )
    out = (
        partials.groupby(["prev_type", "next_type"], sort=False)["n"]
        .sum()
        .astype("int64")
        .reset_index()
        .sort_values(["prev_type", "next_type"], kind="mergesort")
        .reset_index(drop=True)
    )
    return out


def sessionize(
    events: "ray.data.Dataset",
    gap_s: int = 1800,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Gap-based sessionization: split each user's event stream into
    sessions wherever consecutive events are more than ``gap_s`` seconds
    apart — the standard clickstream/agent-trace grouping primitive.
    Returns one row per session: (user_id, session_idx, n_events,
    start_s, end_s), timestamps as epoch seconds.

    Scale shape: ONE user-hash bucket shuffle co-locates each user's
    history (the keyed_window partitioning assumption); inside a bucket
    the session boundaries are a vectorized diff + cumsum and the
    per-session aggregate is final — the output stays a Dataset
    (session-count-sized, corpus-proportional) and never lands on the
    driver.  Ordering is (ts, event_id) within user — deterministic under
    timestamp ties, mirroring the SQL window twin.
    """
    import numpy as np
    import pandas as pd

    def add_bucket(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.copy()
        b["bucket"] = (b["user_id"] % num_buckets).astype("int32")
        return b

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        if not len(g):
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "session_idx": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                    "start_s": pd.Series(dtype="int64"),
                    "end_s": pd.Series(dtype="int64"),
                }
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(dtype=np.int64)
        # Arrow timestamps land in pandas as datetime64[us]; normalize to
        # ns before the int view or the gap threshold is off by 1000x.
        tns = g["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        t = tns // 10**9  # gaps compare at full precision; bounds floor to secs
        new_s = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            same = u[1:] == u[:-1]
            within = (tns[1:] - tns[:-1]) <= gap_s * 10**9
            new_s[1:] = ~(same & within)
        sid = np.cumsum(new_s) - 1  # unique per session within the bucket
        df = pd.DataFrame({"user_id": u, "t": t, "sid": sid})
        agg = (
            df.groupby("sid", sort=True)
            .agg(
                user_id=("user_id", "first"),
                n_events=("t", "size"),
                start_s=("t", "min"),
                end_s=("t", "max"),
            )
            .reset_index(drop=True)
        )
        agg["session_idx"] = agg.groupby("user_id", sort=False).cumcount()
        return agg[["user_id", "session_idx", "n_events", "start_s", "end_s"]].astype(
            "int64"
        )

    return (
        events.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def event_motifs(
    events: "ray.data.Dataset",
    k: int = 20,
    num_buckets: int = 64,
) -> "pd.DataFrame":
    """Top-k behavioral motifs: the most frequent CONSECUTIVE event-type
    trigrams within per-user streams (sequence mining lite — funnel
    discovery without pre-declaring the funnel).

    Scale shape: the same ONE user-bucket shuffle as :func:`sessionize`;
    inside a bucket the trigram extraction is three shifted array views
    and the counts collapse to per-bucket (e1, e2, e3, n) partials —
    bounded by the event-type-vocabulary cube, not by rows; the driver
    reduce sums partials and keeps the top-k (count desc, then
    lexicographic — the SQL twin's ORDER BY).
    """
    import numpy as np
    import pandas as pd

    def add_bucket(b: "pd.DataFrame") -> "pd.DataFrame":
        b = b.copy()
        b["bucket"] = (b["user_id"] % num_buckets).astype("int32")
        return b

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "e1": pd.Series(dtype=object),
                "e2": pd.Series(dtype=object),
                "e3": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
            }
        )
        if len(g) < 3:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        t = g["event_type"].to_numpy(dtype=object)
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        if not same.any():
            return empty
        df = pd.DataFrame(
            {"e1": t[:-2][same], "e2": t[1:-1][same], "e3": t[2:][same]}
        )
        out = df.groupby(["e1", "e2", "e3"], sort=False).size().rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    parts = (
        events.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # <= buckets x |types|^3 partial rows
    )
    if "e1" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {
                "e1": pd.Series(dtype=object),
                "e2": pd.Series(dtype=object),
                "e3": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
            }
        )
    out = parts.groupby(["e1", "e2", "e3"], sort=False)["n"].sum().reset_index()
    out["n"] = out["n"].astype("int64")
    return (
        out.sort_values(["n", "e1", "e2", "e3"], ascending=[False, True, True, True],
                        kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def late_events(
    events: "ray.data.Dataset",
    jitter_mod: int = 3601,
    allowed_lateness_s: int = 300,
    bucket_seconds: int = 86_400,
) -> "ray.data.Dataset":
    """Watermark-based late-data detection — the streaming-ingest
    primitive: events arrive out of event-time order (arrival time =
    event time + a deterministic per-event network delay of
    ``event_id * 40503 mod jitter_mod`` seconds), the watermark is the
    running max of EVENT time over arrival order, and an event is late
    iff its event time is more than ``allowed_lateness_s`` behind the
    watermark at its arrival.  Returns the late events only:
    (event_id, late_by_us) with late_by_us = watermark − event_time −
    allowance in integer microseconds (exact — no float epoch math).

    Scale shape: the global running max never sorts the stream globally.
    Arrival time range-partitions into ``bucket_seconds`` buckets; one
    tiny partial pass collects each bucket's max event time and the
    driver computes the EXCLUSIVE prefix max per bucket (bucket-count
    rows); the bucketed groupby then resolves within-bucket order
    (arrival, event_id ties) with a vectorized cummax, seeding each
    bucket from the broadcast prefix.  Exact because bucket boundaries
    respect arrival order."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from kgray.functions.broadcast import cached_get

    bucket_us = int(bucket_seconds) * _US

    def derive(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        eid = t["event_id"].cast(pa.int64()).to_numpy()
        ats_us = ts_us + (eid * 40503 % jitter_mod) * _US
        return pa.table(
            {
                "event_id": eid,
                "ts_us": ts_us,
                "ats_us": ats_us,
                "bucket": ats_us // bucket_us,
            }
        )

    derived = events.map_batches(derive, batch_format="pyarrow").materialize()

    def bucket_max(t: pa.Table) -> pa.Table:
        return (
            pa.table({"bucket": t["bucket"], "m": t["ts_us"]})
            .group_by("bucket")
            .aggregate([("m", "max")])
        )

    bm = derived.map_batches(bucket_max, batch_format="pyarrow").to_pandas()
    prefix: dict[int, int] = {}
    if "bucket" in bm.columns and len(bm):
        agg = bm.groupby("bucket", sort=True)["m_max"].max()
        run = np.maximum.accumulate(agg.to_numpy())
        # EXCLUSIVE prefix: bucket k sees the max of buckets < k
        prefix = dict(zip(agg.index[1:].astype(int), run[:-1].astype(int)))
    p_ref = ray.put(prefix)
    allow_us = int(allowed_lateness_s) * _US

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "late_by_us": pd.Series(dtype="int64"),
            }
        )
        if not len(g):
            return empty
        g = g.sort_values(["ats_us", "event_id"], kind="mergesort")
        ts = g["ts_us"].to_numpy(dtype=np.int64)
        seed = cached_get(p_ref).get(int(g["bucket"].iloc[0]), None)
        cm = np.maximum.accumulate(ts)
        wm = np.empty_like(ts)
        wm[1:] = cm[:-1]
        if seed is None:
            wm[0] = -(2**62)  # "no watermark yet"; far below any ts but
            # safe from int64 underflow when allow_us is subtracted
        else:
            wm[0] = seed
            np.maximum(wm, seed, out=wm)
        late = ts < wm - allow_us
        if not late.any():
            return empty
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(dtype=np.int64)[late],
                "late_by_us": (wm[late] - ts[late] - allow_us).astype(np.int64),
            }
        )

    return derived.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def cusum_alarms(
    events: ray.data.Dataset,
    target: float = 5.0,
    threshold: float = 50.0,
    num_buckets: int = 64,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> pd.DataFrame:
    """Per-key one-sided CUSUM drift detection (Page 1954): over the
    ts-ordered event stream, ``S_i = max(0, S_{i-1} + (v_i − target))``;
    report keys whose statistic ever exceeds ``threshold`` with the peak
    value and alarm count — the standard sequential change-point monitor
    (metric drift, abuse ramp-up).

    Exactness: values quantize to cents, so the recursion is pure int64 —
    and it VECTORIZES via the prefix identity ``S_i = P_i − min(0,
    min_{j≤i} P_j)`` with ``P`` the running sum of ``(v − target)``; the
    twin spells the same identity with window functions.

    Scale shape: one keyed shuffle (hash buckets on ``key_col``, the
    user_sessions pattern); inside a bucket the per-key streams sort once
    and the recursion is two grouped cumulative kernels — no Python loop,
    no global sort."""
    t_cents = int(np.floor(target * 100.0 + 0.5))
    h_cents = int(np.floor(threshold * 100.0 + 0.5))

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        d = np.floor(b[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64) - t_cents
        out = pd.DataFrame(
            {
                key_col: b[key_col].to_numpy(dtype=np.int64),
                ts_col: b[ts_col],
                id_col: b[id_col].to_numpy(dtype=np.int64),
                "d": d,
            }
        )
        out["bucket"] = (out[key_col] % num_buckets).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        grp = g.groupby(key_col, sort=False)
        prefix = grp["d"].cumsum()
        runmin = prefix.groupby(g[key_col], sort=False).cummin().clip(upper=0)
        s = (prefix - runmin).to_numpy(dtype=np.int64)
        out = (
            pd.DataFrame({key_col: g[key_col].to_numpy(), "s": s, "alarm": s > h_cents})
            .groupby(key_col, sort=False)
            .agg(max_cusum_cents=("s", "max"), n_alarms=("alarm", "sum"))
            .reset_index()
        )
        out = out[out["n_alarms"] > 0]
        out["max_cusum_cents"] = out["max_cusum_cents"].astype("int64")
        out["n_alarms"] = out["n_alarms"].astype("int64")
        return out

    out = (
        events.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if key_col not in out.columns or not len(out):
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype="int64"),
                "max_cusum_cents": pd.Series(dtype="int64"),
                "n_alarms": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values(key_col).reset_index(drop=True)


def rolling_window_sum(
    events: ray.data.Dataset,
    window_days: int = 7,
    num_buckets: int = 64,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-key SLIDING-window value sum attached to every event: for each
    event, the key's total value over ``[ts − window, ts]`` — the exact
    RANGE-window aggregate (spend velocity, rate limiting).  Peer rows
    (equal ``ts``) are all included, matching SQL ``RANGE BETWEEN ...
    AND CURRENT ROW`` semantics exactly.

    Exactness: values sum as int64 cents; the window bounds are two
    ``searchsorted`` probes into the key's sorted prefix-sum array —
    ``sum = P[hi(ts)] − P[lo(ts − w)]`` — so no float enters until the
    final /100.

    Scale shape: the user_sessions ladder — one hash-bucket shuffle on
    ``key_col``, per-bucket mergesort + grouped prefix sums, all
    vectorized.  Per-key volume is the (inherent) skew bound."""
    w = np.timedelta64(window_days * 86_400_000_000, "us")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: b[key_col].to_numpy(dtype=np.int64),
                ts_col: b[ts_col],
                id_col: b[id_col].to_numpy(dtype=np.int64),
                "vc": np.floor(b[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64),
                "bucket": (b[key_col].to_numpy(dtype=np.int64) % num_buckets).astype("int32"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        out_rows = []
        ts_all = g[ts_col].to_numpy(dtype="datetime64[us]")
        vc = g["vc"].to_numpy()
        ids = g[id_col].to_numpy()
        keys = g[key_col].to_numpy()
        # key segment boundaries (sorted, so segments are contiguous)
        seg = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
        ends = np.concatenate((seg[1:], [len(keys)]))
        sums = np.empty(len(keys), dtype=np.int64)
        for s, e in zip(seg, ends):
            ts = ts_all[s:e]
            p = np.concatenate(([0], np.cumsum(vc[s:e])))
            hi = np.searchsorted(ts, ts, side="right")
            lo = np.searchsorted(ts, ts - w, side="left")
            sums[s:e] = p[hi] - p[lo]
        return pd.DataFrame(
            {
                id_col: ids,
                key_col: keys,
                "window_sum": sums / 100.0,
            }
        )

    return (
        events.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def user_gap_stats(
    events: ray.data.Dataset,
    num_buckets: int = 64,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> pd.DataFrame:
    """Per-key inter-event gap statistics: event count, the longest gap
    between consecutive events (whole seconds), and idle time since the
    key's last event relative to the corpus watermark — the churn-feature
    trio.  Single-event keys report ``max_gap_s = -1`` (no gap exists).

    Exactness: all arithmetic is integer microseconds floored to seconds
    (``// 1_000_000``), mirrored by the twin's ``epoch_us`` division.

    Scale shape: one tiny max-ts pass (blocks × 1 partials), then the
    user_sessions hash-bucket ladder — per-bucket mergesort + ``np.diff``
    per key segment, all vectorized."""

    def max_partial(t: pa.Table) -> pa.Table:
        m = pc.max(t[ts_col].cast(pa.timestamp("us"))).cast(pa.int64())
        return pa.table({"m": pa.array([m.as_py()], pa.int64())})

    mx = events.map_batches(max_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            key_col: pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "max_gap_s": pd.Series(dtype="int64"),
            "idle_s": pd.Series(dtype="int64"),
        }
    )
    if "m" not in mx.columns or not len(mx) or mx["m"].isna().all():
        return empty
    wm_us = int(mx["m"].max())

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                key_col: b[key_col].to_numpy(dtype=np.int64),
                "us": us,
                id_col: b[id_col].to_numpy(dtype=np.int64),
                "bucket": (b[key_col].to_numpy(dtype=np.int64) % num_buckets).astype("int32"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "us", id_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        us = g["us"].to_numpy()
        # gap to the previous row, -1 at key boundaries (and for the first
        # row), so a grouped max yields the longest gap or the -1 sentinel
        gap = np.full(len(keys), np.int64(-1))
        if len(keys) > 1:
            same = keys[1:] == keys[:-1]
            gap[1:] = np.where(same, np.diff(us) // 1_000_000, np.int64(-1))
        agg = (
            pd.DataFrame({key_col: keys, "gap": gap, "us": us})
            .groupby(key_col, sort=False)
            .agg(n_events=("gap", "size"), max_gap_s=("gap", "max"), last_us=("us", "max"))
            .reset_index()
        )
        agg["idle_s"] = (wm_us - agg["last_us"].to_numpy()) // 1_000_000
        return agg[[key_col, "n_events", "max_gap_s", "idle_s"]]

    out = (
        events.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if key_col not in out.columns or not len(out):
        return empty
    for c in ("n_events", "max_gap_s", "idle_s"):
        out[c] = out[c].astype("int64")
    return out.sort_values(key_col).reset_index(drop=True)


def session_funnel(
    events: ray.data.Dataset,
    gap_minutes: int = 30,
    first_step: str = "click",
    second_step: str = "purchase",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """WITHIN-SESSION funnel conversion: sessionize per user (>gap idle
    splits), then per session ask whether a ``second_step`` event occurs
    at-or-after the session's first ``first_step`` event — the
    composition (sessionize → funnel) product analytics runs constantly,
    collapsed to one (n_sessions, n_with_first, n_converted) row.

    The conversion predicate is purely on timestamps (``last second_step
    ts ≥ first first_step ts``), so equal-timestamp events convert —
    mirrored in the twin.

    Scale shape: the user_sessions hash-bucket ladder; each bucket
    resolves its sessions fully vectorized (grouped cumsum for session
    ids, grouped min/max for the step timestamps) and emits ONE partial
    count row — driver traffic is ``num_buckets`` rows."""
    gap_us = gap_minutes * 60 * 1_000_000

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(dtype=np.int64),
                "us": b["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64),
                "event_id": b["event_id"].to_numpy(dtype=np.int64),
                "event_type": b["event_type"].to_numpy(dtype=object),
                "bucket": (b["user_id"].to_numpy(dtype=np.int64) % num_buckets).astype("int32"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        us = g["us"].to_numpy()
        ns = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            same = uid[1:] == uid[:-1]
            ns[1:] = (~same | (np.diff(us) > gap_us)).astype(np.int64)
        sess = np.cumsum(ns)  # globally unique within the bucket
        et = g["event_type"].to_numpy()
        first_us = np.where(et == first_step, us, np.iinfo(np.int64).max)
        second_us = np.where(et == second_step, us, np.iinfo(np.int64).min)
        agg = (
            pd.DataFrame({"sess": sess, "f": first_us, "s": second_us})
            .groupby("sess", sort=False)
            .agg(f=("f", "min"), s=("s", "max"))
        )
        has_first = agg["f"] < np.iinfo(np.int64).max
        converted = has_first & (agg["s"] >= agg["f"])
        return pd.DataFrame(
            {
                "n_sessions": [len(agg)],
                "n_with_first": [int(has_first.sum())],
                "n_converted": [int(converted.sum())],
            }
        )

    parts = (
        events.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "n_sessions" not in parts.columns or not len(parts):
        return pd.DataFrame({"n_sessions": [0], "n_with_first": [0], "n_converted": [0]}).astype(
            "int64"
        )
    out = parts.sum(axis=0).to_frame().T.astype("int64")
    return out.reset_index(drop=True)


def first_last_per_key(
    events: ray.data.Dataset,
    num_buckets: int = 64,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "event_type",
) -> pd.DataFrame:
    """Per-key argmin/argmax over the event stream: the FIRST and LAST
    ``value_col`` by ``(ts, id)`` order plus the event count — the
    acquisition-channel / latest-state rollup (an aggregate Ray Data has
    no built-in for).

    Scale shape: each batch folds to ≤ 2 rows per key touched (its local
    first and last — partials carry the composite order key, so the
    merge is associative); one KEY hash-bucket shuffle combines; driver
    sees key-vocabulary rows."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values([key_col, ts_col, id_col], kind="mergesort")
        grp = g.groupby(key_col, sort=False)
        sizes = grp.size()
        first = grp.head(1).copy()
        last = grp.tail(1).copy()
        # the batch's count rides on the 'first' copy only, so the bucket
        # combine can sum counts without double-counting
        first["n"] = sizes.loc[first[key_col]].to_numpy(dtype=np.int64)
        last["n"] = np.int64(0)
        out = pd.concat([first, last], ignore_index=True)
        out["bucket"] = (out[key_col].to_numpy(dtype=np.int64) % num_buckets).astype("int32")
        return out[["bucket", key_col, ts_col, id_col, value_col, "n"]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        grp = g.groupby(key_col, sort=False)
        first = grp.head(1).set_index(key_col)[value_col].rename("first_type")
        last = grp.tail(1).set_index(key_col)[value_col].rename("last_type")
        n = grp["n"].sum().rename("n_events")
        out = pd.concat([first, last, n], axis=1).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        return out

    out = (
        events.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if key_col not in out.columns or not len(out):
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype="int64"),
                "first_type": pd.Series(dtype=object),
                "last_type": pd.Series(dtype=object),
                "n_events": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values(key_col).reset_index(drop=True)


def burstiness_fano(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Per-key burstiness via the Fano factor of the DAILY count series:
    ``var/mean = (n·Σc² − (Σc)²) / (n·Σc)`` over the key's active days —
    ≈1 for Poisson-regular activity, ≫1 for bursty keys (bot/abuse
    signal).  Only ACTIVE days enter (the twin counts the same days).

    Exactness: the moments are exact int64 (daily counts are integers);
    the single final division micro-quantizes half-up on both engines.

    Scale shape: one (key, day, count) Arrow-partial pass (keys × days
    driver budget — the daily_anomalies shape); moments and the division
    run on that bounded table."""

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t[ts_col].cast(pa.timestamp("us")), format="%Y-%m-%d")
        return (
            pa.table({key_col: t[key_col], "day": day})
            .group_by([key_col, "day"])
            .aggregate([([], "count_all")])
        )

    parts = events.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            key_col: pd.Series(dtype="int64"),
            "n_days": pd.Series(dtype="int64"),
            "fano": pd.Series(dtype="float64"),
        }
    )
    if key_col not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby([key_col, "day"], sort=False)["count_all"].sum().reset_index(name="c")
    g = daily.groupby(key_col, sort=True)["c"]
    n = g.size().to_numpy(dtype=np.int64)
    s = g.sum().to_numpy(dtype=np.int64)
    ss = g.apply(lambda x: int((x.astype(np.int64) ** 2).sum())).to_numpy(dtype=np.int64)
    fano = (n * ss - s * s).astype(np.float64) / (n * s).astype(np.float64)
    return pd.DataFrame(
        {
            key_col: g.size().index.to_numpy(dtype=np.int64),
            "n_days": n,
            "fano": np.floor(fano * 1e6 + 0.5) / 1e6,
        }
    )


def interarrival_histogram(
    events: ray.data.Dataset,
    num_buckets: int = 64,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> pd.DataFrame:
    """Corpus-wide inter-arrival-time distribution: consecutive same-key
    gaps bucketed by log2 of the whole-second gap (``bin = bit_length(s)``,
    0 for sub-second) — the heavy-tail diagnostic behind session-gap and
    watermark tuning.

    Exactness: pure integer µs → seconds → bit_length; the twin uses
    ``length(bin(s))``.  Scale shape: the user_sessions bucket ladder;
    each bucket emits a ≤64-row histogram partial."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: b[key_col].to_numpy(dtype=np.int64),
                "us": b[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64),
                id_col: b[id_col].to_numpy(dtype=np.int64),
                "bucket": (b[key_col].to_numpy(dtype=np.int64) % num_buckets).astype("int32"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "us", id_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        us = g["us"].to_numpy()
        if len(keys) < 2:
            return pd.DataFrame({"log2_bin": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")})
        same = keys[1:] == keys[:-1]
        gaps_s = (np.diff(us) // 1_000_000)[same]
        bins = np.zeros(len(gaps_s), dtype=np.int64)
        pos = gaps_s > 0
        bins[pos] = np.floor(np.log2(gaps_s[pos].astype(np.float64))).astype(np.int64) + 1
        u, cnt = np.unique(bins, return_counts=True)
        return pd.DataFrame({"log2_bin": u, "n": cnt})

    parts = (
        events.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "log2_bin" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {"log2_bin": pd.Series(dtype="int64"), "n_gaps": pd.Series(dtype="int64")}
        )
    out = parts.groupby("log2_bin", sort=True)["n"].sum().reset_index(name="n_gaps")
    out["log2_bin"] = out["log2_bin"].astype("int64")
    out["n_gaps"] = out["n_gaps"].astype("int64")
    return out


def markov_stationary(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    iterations: int = 20,
    scale: int = 10**12,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Stationary distribution of the event-type Markov chain: power
    iteration x' = xP over the per-user transition matrix, starting
    uniform — where user behavior settles in the long run.

    Exactness: the iteration runs ENTIRELY in integer space — state
    components are ints scaled by ``scale`` and each step is
    x'_j = Σᵢ (qᵢ·cᵢⱼ) // rᵢ (floor division; cᵢⱼ transition counts,
    rᵢ row totals) — so the unrolled DuckDB twin reproduces every
    iteration bit-for-bit with no float drift.

    Scale shape: transitions come from one user-hash bucket shuffle
    (consecutive pairs per user, the events_transitions kernel); the
    |types|² matrix and the 20 integer iterations are driver work by
    construction.  Types with no outgoing transitions keep their mass
    (self-loop), the standard absorbing-state patch.
    """
    c = _transition_counts(ds, key_col, type_col, ts_col, num_buckets)
    empty = pd.DataFrame(
        {"event_type": pd.Series(dtype=object), "stationary": pd.Series(dtype="float64")}
    )
    if not len(c):
        return empty
    types, q = _stationary_from_counts(c, iterations, scale)
    return pd.DataFrame(
        {
            "event_type": types,
            "stationary": [float(v) / float(scale) for v in q],
        }
    )


def _transition_counts(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Shared kernel: aggregated per-user consecutive-event transition
    counts (prev, nxt, c) via ONE user-hash bucket shuffle — feeds
    markov_stationary AND markov_entropy_rate (the entropy op reuses
    the counts instead of re-shuffling the events table)."""

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": (b[key_col] % num_buckets).astype("int32"),
                "u": b[key_col].astype("int64"),
                "t": b[type_col].astype(str),
                "ts": b[ts_col],
                "eid": b["event_id"].astype("int64"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts", "eid"], kind="mergesort")
        prev = g["t"].to_numpy()
        same = g["u"].to_numpy()[1:] == g["u"].to_numpy()[:-1]
        a, bb = prev[:-1][same], prev[1:][same]
        out = (
            pd.DataFrame({"prev": a, "nxt": bb})
            .groupby(["prev", "nxt"], sort=False)
            .size()
            .reset_index(name="c")
        )
        out["c"] = out["c"].astype("int64")
        return out

    trans = (
        ds.map_batches(pair_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ |types|² × buckets rows
    )
    if "prev" not in trans.columns or not len(trans):
        return pd.DataFrame(
            {
                "prev": pd.Series(dtype=object),
                "nxt": pd.Series(dtype=object),
                "c": pd.Series(dtype="int64"),
            }
        )
    return trans.groupby(["prev", "nxt"], sort=True)["c"].sum().reset_index()


def _stationary_from_counts(
    c: pd.DataFrame, iterations: int, scale: int
) -> tuple[list, list]:
    """The all-integer power iteration x'_j = Σᵢ (qᵢ·cᵢⱼ) // rᵢ on the
    aggregated transition counts; returns (types, scale-denominated q)."""
    types = sorted(set(c["prev"]) | set(c["nxt"]))
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    cm = np.zeros((k, k), dtype=np.int64)
    for p, nx, cnt in zip(c["prev"], c["nxt"], c["c"]):
        cm[idx[p], idx[nx]] = cnt
    r = cm.sum(axis=1)
    for i in range(k):  # absorbing rows self-loop
        if r[i] == 0:
            cm[i, i] = 1
            r[i] = 1
    q = [scale // k] * k  # python ints
    for _ in range(iterations):
        q = [
            sum(q[i] * int(cm[i, j]) // int(r[i]) for i in range(k))
            for j in range(k)
        ]
    return types, q


def seasonal_naive_backtest(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
    lag_days: int = 7,
) -> pd.DataFrame:
    """Seasonal-naive forecast backtest per event type: predict each
    day's count with the count ``lag_days`` earlier (the classic
    baseline every real forecaster must beat) and report its MAE over
    all days whose lagged day was observed — the data-health /
    forecastability audit.

    Exactness: daily counts and absolute errors are exact integers; the
    one MAE division micro-quantizes.

    Scale shape: (type, day) Arrow count partials (the daily-rollup
    combiner); the lag join and MAE run on the types × days driver
    budget.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        return (
            pa.table({type_col: t[type_col], "day": pa.array(day, pa.int64())})
            .group_by([type_col, "day"])
            .aggregate([([], "count_all")])
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            type_col: pd.Series(dtype=object),
            "n_days": pd.Series(dtype="int64"),
            "mae": pd.Series(dtype="float64"),
        }
    )
    if type_col not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby([type_col, "day"], sort=True)["count_all"].sum().reset_index()
    lag = daily.copy()
    lag["day"] = lag["day"] + lag_days
    m = daily.merge(lag, on=[type_col, "day"], suffixes=("", "_pred"))
    if not len(m):
        return empty
    m["err"] = (m["count_all"] - m["count_all_pred"]).abs().astype("int64")
    rows = []
    for ty, grp in m.groupby(type_col, sort=True):
        n = len(grp)
        mae = np.floor(float(int(grp["err"].sum())) / float(n) * 1e6 + 0.5) / 1e6
        rows.append((ty, np.int64(n), mae))
    return pd.DataFrame(rows, columns=[type_col, "n_days", "mae"])


def trending_types(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 7,
    top_k: int = 3,
) -> pd.DataFrame:
    """Trending event types: for every observed day, the top-``top_k``
    types by TRAILING-``window_days`` count (count desc, type asc) — the
    sliding-window leaderboard shape.

    Scale shape: one (type, day) Arrow count-partial pass (the daily
    combiner); the window sums and ranking run on the types × days
    driver budget — exact integers throughout.
    """
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        return (
            pa.table({type_col: t[type_col], "day": pa.array(day, pa.int64())})
            .group_by([type_col, "day"])
            .aggregate([([], "count_all")])
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype="int64"),
            type_col: pd.Series(dtype=object),
            "trailing_cnt": pd.Series(dtype="int64"),
            "rnk": pd.Series(dtype="int64"),
        }
    )
    if type_col not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby([type_col, "day"], sort=True)["count_all"].sum().reset_index()
    days = np.sort(daily["day"].unique())
    rows = []
    for d in days:
        w = daily.loc[(daily["day"] >= d - window_days + 1) & (daily["day"] <= d)]
        agg = (
            w.groupby(type_col, sort=False)["count_all"]
            .sum()
            .reset_index(name="trailing_cnt")
            .sort_values(["trailing_cnt", type_col], ascending=[False, True], kind="mergesort")
            .head(top_k)
        )
        for r, (_, row) in enumerate(agg.iterrows(), start=1):
            rows.append((int(d), row[type_col], int(row["trailing_cnt"]), r))
    return pd.DataFrame(rows, columns=["day", type_col, "trailing_cnt", "rnk"]).astype(
        {"day": "int64", "trailing_cnt": "int64", "rnk": "int64"}
    )


def ltv_age_curve(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Average cumulative lifetime value by account age: for each age (in
    days since the user's FIRST event), the cumulative value accrued per
    user up to that age, averaged over ALL users — the LTV curve a
    retention team tracks.

    Scale shape: one user-hash bucket shuffle; each bucket computes its
    users' first days vectorized and emits (age, integer-cent) sum
    partials plus a user count — the driver cumsums ≤ buckets × ages
    rows.  Exact cents until one micro-quantized division per age row.
    """

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "bucket": (b[key_col] % num_buckets).astype("int32"),
                "u": b[key_col].astype("int64"),
                "day": (
                    b[ts_col].astype("datetime64[us]").astype("int64")
                    // 86_400_000_000
                ).astype("int64"),
                "cents": np.floor(
                    b[value_col].to_numpy(dtype=np.float64) * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("u", sort=False)["day"].transform("min")
        age = (g["day"] - first).astype("int64")
        out = (
            pd.DataFrame({"age": age, "cents": g["cents"]})
            .groupby("age", sort=False)["cents"]
            .sum()
            .reset_index(name="cents")
        )
        out["cents"] = out["cents"].astype("int64")
        out["n_users"] = np.int64(0)
        users = pd.DataFrame(
            {"age": [np.int64(-1)], "cents": [np.int64(0)], "n_users": [g["u"].nunique()]}
        )
        return pd.concat([out, users], ignore_index=True)

    parts = (
        ds.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ buckets × ages rows
    )
    empty = pd.DataFrame(
        {
            "age_day": pd.Series(dtype="int64"),
            "cum_value_per_user": pd.Series(dtype="float64"),
        }
    )
    if "age" not in parts.columns or not len(parts):
        return empty
    n_users = int(parts.loc[parts["age"] == -1, "n_users"].sum())
    if n_users == 0:
        return empty
    agg = (
        parts.loc[parts["age"] >= 0]
        .groupby("age", sort=True)["cents"]
        .sum()
        .astype("int64")
    )
    ages = agg.index.to_numpy(dtype=np.int64)
    cum = np.cumsum(agg.to_numpy(dtype=np.int64))
    val = np.floor(cum.astype(np.float64) / 100.0 / float(n_users) * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"age_day": ages, "cum_value_per_user": val})


def seasonal_residual_anomalies(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
    lag_days: int = 7,
    k_mad: int = 3,
) -> pd.DataFrame:
    """Forecast-residual anomaly detection: days whose seasonal-naive
    residual (actual − count ``lag_days`` earlier) deviates from the
    per-type residual MEDIAN by more than ``k_mad``×MAD — the robust
    alerting layer on top of :func:`seasonal_naive_backtest`.

    Exactness: residuals, medians and MADs are exact ints (order
    statistics at fixed lower-median ranks, no interpolation); the flag
    comparison |r − med| > k·MAD stays in integer space — no float
    anywhere.

    Scale shape: the same (type, day) count-partial pass; residual
    statistics run on the types × days driver budget.
    """
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        return (
            pa.table({type_col: t[type_col], "day": pa.array(day, pa.int64())})
            .group_by([type_col, "day"])
            .aggregate([([], "count_all")])
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            type_col: pd.Series(dtype=object),
            "day": pd.Series(dtype="int64"),
            "actual": pd.Series(dtype="int64"),
            "pred": pd.Series(dtype="int64"),
            "resid": pd.Series(dtype="int64"),
        }
    )
    if type_col not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby([type_col, "day"], sort=True)["count_all"].sum().reset_index()
    lag = daily.copy()
    lag["day"] = lag["day"] + lag_days
    m = daily.merge(lag, on=[type_col, "day"], suffixes=("", "_pred"))
    if not len(m):
        return empty
    m["resid"] = (m["count_all"] - m["count_all_pred"]).astype("int64")
    rows = []
    for ty, grp in m.groupby(type_col, sort=True):
        r = np.sort(grp["resid"].to_numpy(dtype=np.int64))
        n = len(r)
        med = int(r[(n + 1) // 2 - 1])  # lower median
        dev = np.sort(np.abs(grp["resid"].to_numpy(dtype=np.int64) - med))
        mad = int(dev[(n + 1) // 2 - 1])
        flag = np.abs(grp["resid"].to_numpy(dtype=np.int64) - med) > k_mad * mad
        for _, row in grp.loc[flag].iterrows():
            rows.append(
                (ty, int(row["day"]), int(row["count_all"]), int(row["count_all_pred"]), int(row["resid"]))
            )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=[type_col, "day", "actual", "pred", "resid"]).astype(
        {"day": "int64", "actual": "int64", "pred": "int64", "resid": "int64"}
    )


def retention_decay_fit(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    max_age: int = 28,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Retention-decay constant: OLS slope of ln(retention rate) on age
    for ages 1..``max_age`` (retention(a) = users active a days after
    their first day / cohort size) — the single number product teams
    quote ("we lose x%/day").

    Exactness: retained counts come from DISTINCT (user, age) pairs —
    exact ints; rate micro-quantizes at 1e9 BEFORE ln; the OLS moments
    run in exact python ints on ≤ max_age rows (the zipf_slope recipe).

    Scale shape: per-batch distinct (user, day) pre-shrink, one user-hash
    shuffle to compute ages, (age, count) partials — driver sees ≤
    buckets × max_age rows plus one cohort scalar.
    """

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (
            b[ts_col].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).astype("int64")
        out = pd.DataFrame({"u": b[key_col].astype("int64"), "day": day}).drop_duplicates()
        out["bucket"] = (out["u"] % num_buckets).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "day"])
        first = g.groupby("u", sort=False)["day"].transform("min")
        age = (g["day"] - first).astype("int64")
        keep = (age >= 1) & (age <= max_age)
        cnt = (
            pd.DataFrame({"age": age[keep]})
            .groupby("age", sort=False)
            .size()
            .reset_index(name="n")
        )
        cnt["n"] = cnt["n"].astype("int64")
        users = pd.DataFrame({"age": [np.int64(-1)], "n": [np.int64(g["u"].nunique())]})
        return pd.concat([cnt, users], ignore_index=True)

    parts = (
        ds.map_batches(pair_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "n_ages": pd.Series(dtype="int64"),
            "cohort": pd.Series(dtype="int64"),
            "decay_per_day": pd.Series(dtype="float64"),
        }
    )
    if "age" not in parts.columns or not len(parts):
        return empty
    cohort = int(parts.loc[parts["age"] == -1, "n"].sum())
    agg = parts.loc[parts["age"] >= 1].groupby("age", sort=True)["n"].sum()
    agg = agg[agg > 0]
    if cohort == 0 or len(agg) < 2:
        return empty
    ages = agg.index.to_numpy(dtype=np.int64)
    # rate quantized at 1e9, then ln quantized at 1e6 (both mirrored in SQL)
    rate_q = np.floor(agg.to_numpy(np.float64) / float(cohort) * 1e9 + 0.5) / 1e9
    x = ages
    y = np.floor(np.log(rate_q) * 1e6 + 0.5).astype(np.int64)
    n = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    den = n * sxx - sx * sx
    if den == 0:
        return empty
    num = n * sxy - sx * sy
    # slope is in micro-ln units per day; /1e6 converts back
    slope = np.floor(float(num) / float(den) + 0.5) / 1e6
    return pd.DataFrame(
        {
            "n_ages": [np.int64(n)],
            "cohort": [np.int64(cohort)],
            "decay_per_day": [slope],
        }
    )


def hash_split_assign(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    pct_train: int = 80,
    pct_val: int = 10,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Leakage-free train/val/test split assignment: every event of a
    user lands in the split chosen by md5(user) % 100 — the deterministic
    entity-level split that keeps a user's data out of two splits (the
    cardinal eval-hygiene rule).

    Returns per-split totals PLUS a leakage audit (distinct users seen in
    >1 split — zero by construction, the audit proves it).

    Scale shape: per-batch (split, events, user-set) partials pre-shrink
    to distinct users before one user-hash shuffle; the report is a
    3-row driver merge.
    """
    from kgray.ops.dedup import _md5_u64_np

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        u = b[key_col].to_numpy(dtype=np.int64)
        h = _md5_u64_np([str(v) for v in u]) % np.uint64(100)
        split = np.where(
            h < pct_train, "train", np.where(h < pct_train + pct_val, "val", "test")
        )
        ev = (
            pd.DataFrame({"split": split})
            .groupby("split", sort=False)
            .size()
            .reset_index(name="n_events")
        )
        users = pd.DataFrame({"split": split, "u": u}).drop_duplicates()
        users["bucket"] = (users["u"] % num_buckets).astype("int32")
        ev["n_events"] = ev["n_events"].astype("int64")
        return pd.concat(
            [
                ev.assign(kind=np.int8(0), u=np.int64(-1), bucket=np.int32(0)),
                users.assign(kind=np.int8(1), n_events=np.int64(0)),
            ],
            ignore_index=True,
        )[["kind", "split", "u", "n_events", "bucket"]]

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ev = g.loc[g["kind"] == 0]
        ev_out = ev.groupby("split", sort=False)["n_events"].sum().reset_index()
        ev_out["n_users"] = np.int64(0)
        ev_out["n_leaked"] = np.int64(0)
        us = g.loc[g["kind"] == 1].drop_duplicates(["split", "u"])
        per_user = us.groupby("u", sort=False)["split"].nunique()
        leaked = int((per_user > 1).sum())
        us_out = us.groupby("split", sort=False)["u"].nunique().reset_index(name="n_users")
        us_out["n_events"] = np.int64(0)
        us_out["n_leaked"] = np.int64(0)
        rows = pd.concat([ev_out, us_out], ignore_index=True)
        if leaked:
            rows = pd.concat(
                [
                    rows,
                    pd.DataFrame(
                        {
                            "split": ["__leak__"],
                            "n_events": [np.int64(0)],
                            "n_users": [np.int64(0)],
                            "n_leaked": [np.int64(leaked)],
                        }
                    ),
                ],
                ignore_index=True,
            )
        return rows[["split", "n_events", "n_users", "n_leaked"]]

    parts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "split": pd.Series(dtype=object),
            "n_events": pd.Series(dtype="int64"),
            "n_users": pd.Series(dtype="int64"),
        }
    )
    if "split" not in parts.columns or not len(parts):
        return empty
    agg = (
        parts.loc[parts["split"] != "__leak__"]
        .groupby("split", sort=True)[["n_events", "n_users"]]
        .sum()
        .reset_index()
    )
    agg["n_events"] = agg["n_events"].astype("int64")
    agg["n_users"] = agg["n_users"].astype("int64")
    return agg


def linear_attribution(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    touch_type: str = "click",
    convert_type: str = "purchase",
    window_days: int = 7,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """LINEAR multi-touch attribution: each conversion splits one unit of
    credit equally across the user's touch events in the trailing
    ``window_days`` window — the fairness-spread twin of the as-of
    (last-touch) join.

    Exactness: per-conversion credit is the integer floor 1e6 // k
    micro-units (k = touches in window) — identical floor division on
    both engines, summed as exact ints.

    Scale shape: one user-hash bucket shuffle; per user the
    touch↔conversion window match is two searchsorted calls per
    conversion (no quadratic expansion — the window bounds index
    ranges); (day, credit) partials merge on the days-bounded driver.
    """

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        m = b[type_col].isin([touch_type, convert_type])
        b = b.loc[m]
        return pd.DataFrame(
            {
                "bucket": (b[key_col] % num_buckets).astype("int32"),
                "u": b[key_col].astype("int64"),
                "t": b[type_col].astype(str),
                "us": b[ts_col].astype("datetime64[us]").astype("int64"),
            }
        )

    win_us = window_days * 86_400_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out: dict[int, int] = {}
        for _, grp in g.groupby("u", sort=False):
            touches = np.sort(grp.loc[grp["t"] == touch_type, "us"].to_numpy(np.int64))
            convs = grp.loc[grp["t"] == convert_type, "us"].to_numpy(np.int64)
            if not len(touches) or not len(convs):
                continue
            lo = np.searchsorted(touches, convs - win_us, side="left")
            hi = np.searchsorted(touches, convs, side="right")
            for l, h in zip(lo, hi):
                k = h - l
                if k <= 0:
                    continue
                credit = 1_000_000 // int(k)
                for ts in touches[l:h]:
                    day = int(ts // 86_400_000_000)
                    out[day] = out.get(day, 0) + credit
        return pd.DataFrame(
            {
                "day": pd.Series(list(out.keys()), dtype="int64"),
                "credit_micro": pd.Series(list(out.values()), dtype="int64"),
            }
        )

    parts = (
        ds.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ buckets × days rows
    )
    empty = pd.DataFrame(
        {"day": pd.Series(dtype="int64"), "credit": pd.Series(dtype="float64")}
    )
    if "day" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("day", sort=True)["credit_micro"].sum()
    return pd.DataFrame(
        {
            "day": agg.index.to_numpy(dtype=np.int64),
            "credit": agg.to_numpy(dtype=np.int64) / 1e6,
        }
    )


def error_rate_control_chart(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
    error_type: str = "error",
    sigma: int = 3,
) -> pd.DataFrame:
    """p-chart (SPC control chart) on the daily error proportion: days
    whose error rate sits outside p̄ ± σ·√(p̄(1−p̄)/n) — the classic
    statistical-process-control alert on a Bernoulli stream.

    Exactness: daily (errors, totals) are exact ints; p̄ and the limits
    compute with the SAME double expression on both engines (identical
    IEEE op order), and the output ships the quantized rate + limits so
    the flag is reproducible.

    Scale shape: (day, errors, total) Arrow count partials — a
    days-bounded driver merge.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        err = pc.equal(t[type_col], error_type).to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame({"day": day, "e": err, "n": np.int64(1)})
            .groupby("day", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "day": pa.array(g["day"].astype(np.int64), pa.int64()),
                "e": pa.array(g["e"].astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "n_errors": pd.Series(dtype="int64"),
            "rate": pd.Series(dtype="float64"),
            "flagged": pd.Series(dtype="int64"),
        }
    )
    if "day" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("day", sort=True)[["e", "n"]].sum()
    te, tn = int(agg["e"].sum()), int(agg["n"].sum())
    if tn == 0:
        return empty
    pbar = float(te) / float(tn)
    n = agg["n"].to_numpy(dtype=np.float64)
    rate = agg["e"].to_numpy(dtype=np.float64) / n
    halfwidth = sigma * np.sqrt(pbar * (1.0 - pbar) / n)
    flagged = (np.abs(rate - pbar) > halfwidth).astype(np.int64)
    return pd.DataFrame(
        {
            "day": agg.index.to_numpy(dtype=np.int64),
            "n_events": agg["n"].astype("int64").to_numpy(),
            "n_errors": agg["e"].astype("int64").to_numpy(),
            "rate": np.floor(rate * 1e6 + 0.5) / 1e6,
            "flagged": flagged,
        }
    )


def activity_streaks(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Longest consecutive-day activity streak per user (plus active-day
    count) — the gaps-and-islands shape (SQL's day − row_number() trick)
    behind every engagement-streak feature.

    Scale shape: per-batch DISTINCT (user, day) pre-shrink, one user-hash
    shuffle; inside a bucket streaks are pure vectorized diffs over each
    user's sorted unique days.  Exact integers throughout.
    """

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (
            b[ts_col].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).astype("int64")
        out = pd.DataFrame({"u": b[key_col].astype("int64"), "day": day}).drop_duplicates()
        out["bucket"] = (out["u"] % num_buckets).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "day"]).sort_values(["u", "day"], kind="mergesort")
        u = g["u"].to_numpy(dtype=np.int64)
        d = g["day"].to_numpy(dtype=np.int64)
        # island id: increments on user change or a gap > 1 day
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] > 1)
        isl = np.cumsum(new)
        runs = (
            pd.DataFrame({"u": u, "isl": isl})
            .groupby(["u", "isl"], sort=False)
            .size()
            .reset_index(name="run")
        )
        out = runs.groupby("u", sort=False)["run"].max().reset_index(name="longest_streak")
        days = pd.DataFrame({"u": u}).groupby("u", sort=False).size().reset_index(name="n_active_days")
        m = out.merge(days, on="u")
        m["u"] = m["u"].astype("int64")
        m["longest_streak"] = m["longest_streak"].astype("int64")
        m["n_active_days"] = m["n_active_days"].astype("int64")
        return m.rename(columns={"u": "user_id"})

    out = (
        ds.map_batches(pair_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # one row per user (vocabulary-bounded)
    )
    if "user_id" not in out.columns or not len(out):
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "longest_streak": pd.Series(dtype="int64"),
                "n_active_days": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values("user_id").reset_index(drop=True)


def two_proportion_ztest(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Two-proportion z-test per event type between the first and second
    half of the observed time range: is the type's SHARE of traffic
    different, and is the difference statistically significant (|z| >
    1.96)? — the A/B-comparison kernel pointed at temporal drift.

    Exactness: counts exact ints; z computes with the SAME double
    expression on both engines (pooled p, IEEE op order), ships quantized
    plus the integer flag.

    Scale shape: the type_drift (half, type) count-partial pass — a
    2 × |types| driver grid.
    """
    import pyarrow as pa

    lo = ds.min(ts_col)
    hi = ds.max(ts_col)
    empty = pd.DataFrame(
        {
            type_col: pd.Series(dtype=object),
            "share_a": pd.Series(dtype="float64"),
            "share_b": pd.Series(dtype="float64"),
            "z": pd.Series(dtype="float64"),
            "significant": pd.Series(dtype="int64"),
        }
    )
    if lo is None:
        return empty
    lo_us = int(pd.Timestamp(lo).value // 1000)
    hi_us = int(pd.Timestamp(hi).value // 1000)
    mid_us = (lo_us + hi_us) // 2

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        half = (us >= mid_us).astype(np.int8)
        return (
            pa.table({"half": pa.array(half, pa.int8()), type_col: t[type_col]})
            .group_by(["half", type_col])
            .aggregate([([], "count_all")])
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if type_col not in parts.columns or not len(parts):
        return empty
    grid = parts.groupby(["half", type_col], sort=True)["count_all"].sum().unstack(
        fill_value=0
    )
    grid = grid.reindex([0, 1], fill_value=0)
    n1, n2 = float(grid.iloc[0].sum()), float(grid.iloc[1].sum())
    if n1 == 0 or n2 == 0:
        return empty
    rows = []
    for ty in grid.columns:
        e1, e2 = float(grid.iloc[0][ty]), float(grid.iloc[1][ty])
        p1, p2 = e1 / n1, e2 / n2
        p = (e1 + e2) / (n1 + n2)
        den = np.sqrt(p * (1.0 - p) * (1.0 / n1 + 1.0 / n2))
        z = 0.0 if den == 0 else (p1 - p2) / den
        rows.append(
            (
                ty,
                np.floor(p1 * 1e6 + 0.5) / 1e6,
                np.floor(p2 * 1e6 + 0.5) / 1e6,
                np.floor(z * 1e6 + 0.5) / 1e6,
                np.int64(1) if abs(z) > 1.96 else np.int64(0),
            )
        )
    return pd.DataFrame(rows, columns=[type_col, "share_a", "share_b", "z", "significant"])


def top_session_paths(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    path_len: int = 3,
    top_n: int = 20,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Top session paths: the most common first-``path_len`` event-type
    sequences of gap-split sessions (count desc, path asc) — the
    product-analytics "how do sessions start" report (sequence mining on
    top of sessionization).

    Scale shape: one user-hash bucket shuffle; sessions assemble
    vectorized per bucket (cumsum of session starts), the per-session
    prefix joins without a python loop over sessions (position masks),
    and (path, count) partials merge on the driver top-n.
    """
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": (b[key_col] % num_buckets).astype("int32"),
                "u": b[key_col].astype("int64"),
                "t": b[type_col].astype(str),
                "ts": b[ts_col],
                "eid": b["event_id"].astype("int64"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts", "eid"], kind="mergesort")
        ts = g["ts"].to_numpy()
        uid = g["u"].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            same = uid[1:] == uid[:-1]
            new_session[1:] = ~same | ((ts[1:] - ts[:-1]) > gap)
        sid = np.cumsum(new_session)
        pos = np.arange(len(g)) - np.maximum.accumulate(
            np.where(new_session, np.arange(len(g)), 0)
        )
        keep = pos < path_len
        d = pd.DataFrame({"sid": sid[keep], "t": g["t"].to_numpy()[keep]})
        paths = d.groupby("sid", sort=False)["t"].agg(">".join)
        out = paths.value_counts().reset_index()
        out.columns = ["path", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    parts = (
        ds.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {"path": pd.Series(dtype=object), "n_sessions": pd.Series(dtype="int64")}
    )
    if "path" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("path", sort=False)["n"].sum().reset_index(name="n_sessions")
    agg["n_sessions"] = agg["n_sessions"].astype("int64")
    return (
        agg.sort_values(["n_sessions", "path"], ascending=[False, True], kind="mergesort")
        .head(top_n)
        .reset_index(drop=True)
    )


def holt_linear_smooth(
    ds: ray.data.Dataset, ts_col: str = "ts"
) -> pd.DataFrame:
    """Holt double-exponential smoothing of the daily event count with
    α = β = ½ run ENTIRELY in integer space: level sₜ = (xₜ + sₜ₋₁ +
    bₜ₋₁) // 2, trend bₜ = ((sₜ − sₜ₋₁) + bₜ₋₁) // 2 — the trend-aware
    smoother (and the stateful-streaming shape), with a recursive-CTE
    DuckDB twin that reproduces every step bit-for-bit (DuckDB-style
    truncating integer division, no float drift).

    Scale shape: one (day, count) Arrow partial pass; the recurrence is
    inherently sequential and runs on the observed-days driver budget.
    """
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        g = (
            pd.DataFrame({"day": day, "n": np.int64(1)})
            .groupby("day", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "day": pa.array(g["day"].astype(np.int64), pa.int64()),
                "n": pa.array(g["n"].astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype="int64"),
            "count": pd.Series(dtype="int64"),
            "level": pd.Series(dtype="int64"),
            "trend": pd.Series(dtype="int64"),
        }
    )
    if "day" not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby("day", sort=True)["n"].sum()
    days = daily.index.to_numpy(dtype=np.int64)
    xs = [int(v) for v in daily.to_numpy()]
    def tdiv2(v: int) -> int:
        # DuckDB's // truncates toward zero; Python's floors — mirror DuckDB
        return v // 2 if v >= 0 else -((-v) // 2)

    s, b = xs[0], 0
    levels, trends = [s], [b]
    for x in xs[1:]:
        s_new = tdiv2(x + s + b)
        b = tdiv2((s_new - s) + b)
        s = s_new
        levels.append(s)
        trends.append(b)
    return pd.DataFrame(
        {
            "day": days,
            "count": pd.Series(xs, dtype="int64"),
            "level": pd.Series(levels, dtype="int64"),
            "trend": pd.Series(trends, dtype="int64"),
        }
    )


def markov_entropy_rate(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    iterations: int = 20,
    scale: int = 10**12,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Entropy rate of the event-type Markov chain: H = −Σᵢ πᵢ Σⱼ pᵢⱼ·ln pᵢⱼ
    with π from the integer-exact stationary iteration — ONE number for
    how predictable the behavior stream is (0 = deterministic loops).

    Exactness: π comes from :func:`markov_stationary`'s all-integer
    iteration; each (i, j) term evaluates the SAME fixed-order double
    expression (πᵢ · (cᵢⱼ/rᵢ) · ln(rᵢ/cᵢⱼ)) on both engines, quantizes to
    nano-units, and sums as exact ints.

    Scale shape: ONE user-hash shuffle — the shared
    :func:`_transition_counts` kernel feeds both the integer stationary
    iteration and the entropy terms; everything after the shuffle is
    |types|²-bounded driver math.
    """
    empty = pd.DataFrame(
        {"n_types": pd.Series(dtype="int64"), "entropy_rate": pd.Series(dtype="float64")}
    )
    c = _transition_counts(ds, key_col, type_col, ts_col, num_buckets)
    if not len(c):
        return empty
    types, q = _stationary_from_counts(c, iterations, scale)
    q_by_type = dict(zip(types, q))  # exact scale-denominated ints
    r = c.groupby("prev", sort=False)["c"].transform("sum")
    qv = np.array([float(q_by_type[p]) for p in c["prev"]], dtype=np.float64)
    cc = c["c"].to_numpy(dtype=np.float64)
    rr = r.to_numpy(dtype=np.float64)
    term = (qv / float(scale)) * (cc / rr) * np.log(rr / cc)
    nano = int(np.floor(term * 1e9 + 0.5).astype(np.int64).sum())
    return pd.DataFrame(
        {"n_types": [np.int64(len(types))], "entropy_rate": [nano / 1e9]}
    )


def conversion_lag_hist(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    touch_type: str = "click",
    convert_type: str = "purchase",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Conversion-lag histogram: for every purchase with at least one
    PRIOR click by the same user, the time since the MOST RECENT click,
    bucketed by bit_length of whole seconds (the log₂ ladder) — how long
    intent takes to convert.

    Scale shape: one user-hash shuffle; per user the last-click lookup is
    one searchsorted per conversion; (bin, count) partials merge on the
    driver.  Exact integer microseconds throughout.
    """

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        m = b[type_col].isin([touch_type, convert_type])
        b = b.loc[m]
        return pd.DataFrame(
            {
                "bucket": (b[key_col] % num_buckets).astype("int32"),
                "u": b[key_col].astype("int64"),
                "t": b[type_col].astype(str),
                "us": b[ts_col].astype("datetime64[us]").astype("int64"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bins: dict[int, int] = {}
        for _, grp in g.groupby("u", sort=False):
            touches = np.sort(grp.loc[grp["t"] == touch_type, "us"].to_numpy(np.int64))
            convs = grp.loc[grp["t"] == convert_type, "us"].to_numpy(np.int64)
            if not len(touches) or not len(convs):
                continue
            idx = np.searchsorted(touches, convs, side="right") - 1
            ok = idx >= 0
            lags_s = (convs[ok] - touches[idx[ok]]) // 1_000_000
            for v in lags_s:
                b_ = int(v).bit_length()
                bins[b_] = bins.get(b_, 0) + 1
        return pd.DataFrame(
            {
                "bin": pd.Series(list(bins.keys()), dtype="int64"),
                "n": pd.Series(list(bins.values()), dtype="int64"),
            }
        )

    parts = (
        ds.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {"lag_bin": pd.Series(dtype="int64"), "n_conversions": pd.Series(dtype="int64")}
    )
    if "bin" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("bin", sort=True)["n"].sum().reset_index()
    return pd.DataFrame(
        {
            "lag_bin": agg["bin"].astype("int64"),
            "n_conversions": agg["n"].astype("int64"),
        }
    )


def daily_changepoint(
    ds: ray.data.Dataset,
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Single change-point in the daily event-count series via the
    integer CUSUM statistic: the split day k maximizing
    |prefix_sum·n_days − total·k| (the max deviation of the observed
    prefix from the homogeneous-rate line), earliest day on ties.

    Exactness: day counts, prefix sums and the statistic are all exact
    ints; the reported side means micro-quantize the two divisions the
    same way on both engines.

    Scale shape: per-batch (day → count) combiner partials; the driver
    folds ≤ |days| rows — bounded by the calendar, not the corpus."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[ts_col].dt.strftime("%Y-%m-%d")
        out = d.value_counts().reset_index()
        out.columns = ["day", "c"]
        out["c"] = out["c"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=262144).to_pandas()
    empty = pd.DataFrame(
        {
            "change_day": pd.Series(dtype=object),
            "d_stat": pd.Series(dtype="int64"),
            "mean_before": pd.Series(dtype="float64"),
            "mean_after": pd.Series(dtype="float64"),
        }
    )
    if "day" not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby("day", sort=True)["c"].sum()
    n = len(daily)
    if n < 2:
        return empty
    total = int(daily.sum())
    cnts = daily.to_numpy(dtype=np.int64)
    prefix = np.cumsum(cnts)
    k = np.arange(1, n + 1, dtype=np.int64)
    # splits after day k for k in 1..n-1
    dev = np.abs(prefix[:-1] * np.int64(n) - np.int64(total) * k[:-1])
    best = int(np.argmax(dev))  # argmax returns the FIRST max -> earliest day
    s1, n1 = int(prefix[best]), best + 1
    s2, n2 = total - s1, n - (best + 1)
    return pd.DataFrame(
        {
            "change_day": [daily.index[best]],
            "d_stat": [np.int64(dev[best])],
            "mean_before": [np.floor(s1 / n1 * 1e6 + 0.5) / 1e6],
            "mean_after": [np.floor(s2 / n2 * 1e6 + 0.5) / 1e6],
        }
    )


def burst_windows(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    k: int = 5,
    window_s: int = 60,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Bot-rate detector: per user, the number of events that begin a
    run of ≥ ``k`` events within ``window_s`` seconds (t[i+k−1] − t[i] ≤
    window) — the superhuman-rate filter a training-data pipeline runs
    before trusting behavioral signals.  Only flagged users return.

    Exactness: integer microsecond differences; the window test is a
    vectorized shifted-array compare on the per-user sorted times.

    Scale shape: one USER-hash shuffle; per bucket the check is one
    sort + one shifted subtraction per user group."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": (b[key_col] % num_buckets).astype("int32"),
                "u": b[key_col].astype("int64"),
                "us": b[ts_col].astype("datetime64[us]").astype("int64"),
            }
        )

    w_us = int(window_s) * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "us"], kind="mergesort")
        u = g["u"].to_numpy()
        t = g["us"].to_numpy()
        rows: list[tuple[int, int]] = []
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        ends = np.concatenate([starts[1:], [len(u)]])
        for s, e in zip(starts, ends):
            m = e - s
            if m < k:
                continue
            tt = t[s:e]
            nb = int(np.count_nonzero(tt[k - 1 :] - tt[: m - k + 1] <= w_us))
            if nb:
                rows.append((int(u[s]), nb))
        return pd.DataFrame(
            {
                "user_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "n_bursts": pd.Series([r[1] for r in rows], dtype="int64"),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "user_id" not in out.columns or not len(out):
        return pd.DataFrame(
            {"user_id": pd.Series(dtype="int64"), "n_bursts": pd.Series(dtype="int64")}
        )
    return out.sort_values("user_id").reset_index(drop=True)


def circadian_stats(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Circular (clock-face) statistics per event type: mean cos/sin of
    the time-of-day angle and the resultant length R ∈ [0,1] — R near 1
    means the type fires at one time of day, near 0 means uniformly
    (the circadian concentration a bot/burst audit reads first).

    Exactness: numpy's cos/sin match DuckDB's bit-for-bit on this
    platform (pinned by tests/test_circadian.py); each row's cos/sin
    nano-quantizes to ints, sums combine as PYTHON ints on the driver
    (n·1e9 outgrows int64 at corpus scale), and the final divisions
    micro-quantize in identical operation order on both engines.

    Scale shape: one streaming pass of per-batch (type, n, Σcos, Σsin)
    partials — |types| driver rows."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b[ts_col].astype("datetime64[us]").astype("int64") % 86_400_000_000
        s = us.to_numpy(np.int64) / 1e6
        x = (s / 86400.0) * (2 * np.pi)
        cq = np.floor(np.cos(x) * 1e9 + 0.5).astype(np.int64)
        sq = np.floor(np.sin(x) * 1e9 + 0.5).astype(np.int64)
        d = pd.DataFrame({"t": b[type_col].to_numpy(dtype=object), "n": 1, "c": cq, "s": sq})
        return d.groupby("t", sort=False).sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=262144).to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series(dtype=object),
            "n": pd.Series(dtype="int64"),
            "mean_cos": pd.Series(dtype="float64"),
            "mean_sin": pd.Series(dtype="float64"),
            "resultant": pd.Series(dtype="float64"),
        }
    )
    if "t" not in parts.columns or not len(parts):
        return empty
    rows = []
    for t, grp in parts.groupby("t", sort=True):
        n = int(grp["n"].sum())
        c = sum(int(v) for v in grp["c"])
        s = sum(int(v) for v in grp["s"])
        mean_cos = np.floor(float(c) / n / 1e9 * 1e6 + 0.5) / 1e6
        mean_sin = np.floor(float(s) / n / 1e9 * 1e6 + 0.5) / 1e6
        r = np.floor(np.sqrt(np.float64(float(c * c + s * s))) / n / 1e9 * 1e6 + 0.5) / 1e6
        rows.append((t, n, mean_cos, mean_sin, r))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "mean_cos", "mean_sin", "resultant"]
    )


def theil_sen_trend(
    ds: ray.data.Dataset,
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Theil-Sen robust trend of the daily event-count series: the MEDIAN
    of all pairwise slopes (c_j−c_i)/(j−i) — the outlier-proof answer to
    "is traffic growing?", immune to the single spike that wrecks OLS.

    Exactness: day counts are ints; slopes stay RATIONAL (num, den) and
    sort by (double value, num, den) — the double tie-broken by the exact
    integer pair so both engines pick the same median element(s); an even
    pair count averages two rationals in one fixed-order float expression.

    Scale shape: per-batch day-count combiner; the |days|² pair set is
    driver math bounded by the calendar."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[ts_col].dt.strftime("%Y-%m-%d")
        out = d.value_counts().reset_index()
        out.columns = ["day", "c"]
        out["c"] = out["c"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=262144).to_pandas()
    empty = pd.DataFrame(
        {
            "n_days": pd.Series(dtype="int64"),
            "n_pairs": pd.Series(dtype="int64"),
            "slope": pd.Series(dtype="float64"),
        }
    )
    if "day" not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby("day", sort=True)["c"].sum()
    n = len(daily)
    if n < 2:
        return empty
    c = daily.to_numpy(dtype=np.int64)
    i, j = np.triu_indices(n, k=1)
    num = c[j] - c[i]
    den = (j - i).astype(np.int64)
    order = np.lexsort((den, num, num / den))  # double first, exact ints tie-break
    num, den = num[order], den[order]
    m = len(num)
    if m % 2:
        mid = m // 2
        slope = num[mid] / den[mid]
    else:
        a, b_ = m // 2 - 1, m // 2
        slope = (num[a] / den[a] + num[b_] / den[b_]) / 2.0
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "n_pairs": [np.int64(m)],
            "slope": [np.floor(slope * 1e6 + 0.5) / 1e6],
        }
    )


def exposure_uplift(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    exposure_type: str = "error",
    outcome_type: str = "purchase",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Cohort rate ratio: split users into ABOVE-average vs at/below-
    average ``exposure_type`` count (the exact integer cut eᵢ·n_users >
    Σe — no float threshold), compare mean ``outcome_type`` events per
    user between the cohorts — the quasi-causal read (do error-heavy
    users purchase less?).

    Exactness: per-user counts are exact ints; the two rates and their
    ratio (Σo_e·cu)/(Σo_c·eu) are fixed-order float divisions of
    exact-int operands, micro-quantized.

    Scale shape: one USER-hash shuffle of per-batch (user, counts)
    combiner rows; the driver folds ≤ |users| rows (dimension-bounded).
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "u": b[key_col].astype("int64"),
                "e": (b[type_col] == exposure_type).astype("int64"),
                "o": (b[type_col] == outcome_type).astype("int64"),
            }
        )
        g = d.groupby("u", sort=False)[["e", "o"]].sum().reset_index()
        g["bucket"] = (g["u"] % num_buckets).astype("int32")
        return g

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("u", sort=False)[["e", "o"]].sum().reset_index()

    per_user = (
        ds.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "exp_users": pd.Series(dtype="int64"),
            "ctl_users": pd.Series(dtype="int64"),
            "rate_exposed": pd.Series(dtype="float64"),
            "rate_control": pd.Series(dtype="float64"),
            "rate_ratio": pd.Series(dtype="float64"),
        }
    )
    if "u" not in per_user.columns or not len(per_user):
        return empty
    nu = len(per_user)
    te = int(per_user["e"].sum())
    exposed = per_user["e"].to_numpy(dtype=np.int64) * nu > te
    eu, cu = int(exposed.sum()), int((~exposed).sum())
    eo = int(per_user.loc[exposed, "o"].sum())
    co = int(per_user.loc[~exposed, "o"].sum())
    if eu == 0 or cu == 0 or co == 0:
        return empty
    re_ = float(eo) / eu
    rc = float(co) / cu
    rr = (float(eo) * cu) / (float(co) * eu)  # exact-int products, one division
    return pd.DataFrame(
        {
            "exp_users": [np.int64(eu)],
            "ctl_users": [np.int64(cu)],
            "rate_exposed": [np.floor(re_ * 1e6 + 0.5) / 1e6],
            "rate_control": [np.floor(rc * 1e6 + 0.5) / 1e6],
            "rate_ratio": [np.floor(rr * 1e6 + 0.5) / 1e6],
        }
    )


def run_length_census(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Run-length census of per-user behavior streams: how often does a
    user repeat the SAME event type k times in a row?  Long view-runs vs
    purchase-singletons is the classic engagement signature; a spike of
    long identical runs is also a bot tell.

    Exactness: run boundaries come from a deterministic (ts, event_id)
    sort; output is the exact (type, run_len → n_runs) histogram.

    Scale shape: one USER-hash shuffle; per bucket one mergesort + two
    shifted compares; partials are |types|×|len domain| bounded."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": (b[key_col] % num_buckets).astype("int32"),
                "u": b[key_col].astype("int64"),
                "t": b[type_col].astype(str),
                "ts": b[ts_col],
                "eid": b[id_col].astype("int64"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts", "eid"], kind="mergesort")
        u = g["u"].to_numpy()
        t = g["t"].to_numpy()
        n = len(g)
        if not n:
            return pd.DataFrame(
                {
                    "t": pd.Series(dtype=object),
                    "run_len": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        brk = np.concatenate(
            [[True], (u[1:] != u[:-1]) | (t[1:] != t[:-1])]
        )
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]])
        lens = (ends - starts).astype(np.int64)
        d = pd.DataFrame({"t": t[starts], "run_len": lens})
        out = d.groupby(["t", "run_len"], sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = (
        ds.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "event_type": pd.Series(dtype=object),
            "run_len": pd.Series(dtype="int64"),
            "n_runs": pd.Series(dtype="int64"),
        }
    )
    if "t" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby(["t", "run_len"], sort=True)["n"].sum().reset_index()
    return pd.DataFrame(
        {
            "event_type": agg["t"],
            "run_len": agg["run_len"].astype("int64"),
            "n_runs": agg["n"].astype("int64"),
        }
    )


def frequency_cap_audit(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    ttl_s: int = 86_400,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Debounce / frequency-cap audit: per event type, how many events
    fall within ``ttl_s`` seconds of the user's PREVIOUS same-type event
    (lag semantics — the standard throttle rule) — what a once-per-day
    cap would suppress.

    Exactness: integer microsecond lags over the deterministic
    (ts, event_id) per-key order.

    Scale shape: one USER-hash shuffle; per bucket one mergesort + one
    shifted subtraction; |types| driver rows."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": (b[key_col] % num_buckets).astype("int32"),
                "u": b[key_col].astype("int64"),
                "t": b[type_col].astype(str),
                "us": b[ts_col].astype("datetime64[us]").astype("int64"),
                "eid": b[id_col].astype("int64"),
            }
        )

    ttl_us = int(ttl_s) * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "t", "us", "eid"], kind="mergesort")
        u = g["u"].to_numpy()
        t = g["t"].to_numpy()
        us = g["us"].to_numpy()
        same = np.concatenate([[False], (u[1:] == u[:-1]) & (t[1:] == t[:-1])])
        lag = np.concatenate([[0], us[1:] - us[:-1]])
        suppressed = same & (lag <= ttl_us)
        d = pd.DataFrame({"t": t, "s": suppressed.astype(np.int64)})
        out = d.groupby("t", sort=False)["s"].agg(["size", "sum"]).reset_index()
        out.columns = ["t", "n_events", "n_suppressed"]
        return out

    parts = (
        ds.map_batches(add_bucket, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "event_type": pd.Series(dtype=object),
            "n_events": pd.Series(dtype="int64"),
            "n_suppressed": pd.Series(dtype="int64"),
        }
    )
    if "t" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("t", sort=True)[["n_events", "n_suppressed"]].sum().reset_index()
    return pd.DataFrame(
        {
            "event_type": agg["t"],
            "n_events": agg["n_events"].astype("int64"),
            "n_suppressed": agg["n_suppressed"].astype("int64"),
        }
    )


def dominant_cycle(
    ds: ray.data.Dataset,
    ts_col: str = "ts",
    min_lag: int = 2,
    max_lag: int = 10,
) -> pd.DataFrame:
    """Dominant periodicity of the daily event-count series: the lag
    k ∈ [min_lag, max_lag] maximizing the mean-centered autocovariance
    — does traffic cycle weekly, bi-daily, …?

    Exactness: work in n-scaled space yᵢ = n·xᵢ − S (exact ints, no
    float mean), aₖ = Σ yᵢ·yᵢ₊ₖ; lags compare as exact rationals
    aₖ/(n−k) via cross-multiplication (smallest lag on ties); only the
    reported strength aₖ·n / ((n−k)·a₀) is floating, micro-quantized.

    Scale shape: per-batch day-count combiner; |days|·|lags| driver
    math bounded by the calendar."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b[ts_col].dt.strftime("%Y-%m-%d")
        out = d.value_counts().reset_index()
        out.columns = ["day", "c"]
        out["c"] = out["c"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=262144).to_pandas()
    empty = pd.DataFrame(
        {
            "n_days": pd.Series(dtype="int64"),
            "best_lag": pd.Series(dtype="int64"),
            "strength": pd.Series(dtype="float64"),
        }
    )
    if "day" not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby("day", sort=True)["c"].sum()
    n = len(daily)
    if n <= max(min_lag, 1) + 1:
        return empty
    x = daily.to_numpy(dtype=np.int64)
    s = int(x.sum())
    y = [int(v) * n - s for v in x]  # python ints: n·x can exceed int64 at corpus scale
    a0 = sum(v * v for v in y)
    if a0 == 0:
        return empty
    best_k, best_a = None, None
    for k in range(min_lag, min(max_lag, n - 1) + 1):
        ak = sum(y[i] * y[i + k] for i in range(n - k))
        if best_k is None or ak * (n - best_k) > best_a * (n - k):
            best_k, best_a = k, ak
    strength = (float(best_a) * n) / (float(n - best_k) * float(a0))
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "best_lag": [np.int64(best_k)],
            "strength": [np.floor(strength * 1e6 + 0.5) / 1e6],
        }
    )


def dau_overlap(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 64,
) -> pd.DataFrame:
    """Day-over-day active-set Jaccard: for every pair of CONSECUTIVE
    calendar days both having activity, |A∩B| / |A∪B| over the distinct
    active-key sets — the retention-style churn pulse a training-data
    service watches on its user (or source-domain) dimension.

    Exactness: intersection and per-day distinct counts are exact int64;
    the one Jaccard division micro-quantizes identically on both engines.

    Scale shape: per-batch distinct (key, day) pre-shrink → ONE key-hash
    bucket shuffle; each bucket re-distincts its keys and emits per-day
    count partials plus per-(day, day+1) intersection partials (a key
    active on consecutive days is counted where it lives, so no second
    shuffle) — the driver folds rows bounded by buckets × days."""

    def distinct_partial(b: pd.DataFrame) -> pd.DataFrame:
        from kgray.ops.dedup import _md5_u64_np

        out = pd.DataFrame(
            {
                "k": b[key_col],
                "day": b[ts_col].dt.strftime("%Y-%m-%d"),
            }
        ).drop_duplicates()
        # md5 bucketing works for any key type (string source domains as
        # well as integer user ids); the bucket only partitions work, so
        # the hash choice never affects results
        out["bucket"] = (
            _md5_u64_np([str(x) for x in out["k"]]) % np.uint64(n_buckets)
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["k", "day"]).sort_values(["k", "day"])
        days = g["day"].to_numpy()
        keys = g["k"].to_numpy()
        frames = [
            g.groupby("day", sort=False).size().reset_index(name="cnt").assign(kind="n")
        ]
        if len(g) > 1:
            d = pd.to_datetime(pd.Series(days))
            nxt = (keys[:-1] == keys[1:]) & (
                (d.values[1:] - d.values[:-1]) == np.timedelta64(1, "D")
            )
            if nxt.any():
                inter = (
                    pd.DataFrame({"day": days[:-1][nxt]})
                    .groupby("day", sort=False)
                    .size()
                    .reset_index(name="cnt")
                    .assign(kind="i")
                )
                frames.append(inter)
        return pd.concat(frames, ignore_index=True)[["day", "kind", "cnt"]]

    parts = (
        events.map_batches(distinct_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype=object),
            "n_today": pd.Series(dtype="int64"),
            "n_next": pd.Series(dtype="int64"),
            "n_both": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    agg = parts.groupby(["day", "kind"], sort=True)["cnt"].sum().unstack(fill_value=0)
    n = agg["n"] if "n" in agg.columns else pd.Series(dtype="int64")
    i = agg["i"] if "i" in agg.columns else pd.Series(0, index=agg.index, dtype="int64")
    days = sorted(n.index)
    rows = []
    for d in days:
        nd = pd.Timestamp(d) + pd.Timedelta(days=1)
        nd_s = nd.strftime("%Y-%m-%d")
        if nd_s not in n.index:
            continue
        n1, n2 = int(n[d]), int(n[nd_s])
        both = int(i.get(d, 0))
        union = n1 + n2 - both
        rows.append(
            (d, n1, n2, both, np.floor(both / union * 1e6 + 0.5) / 1e6)
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["day", "n_today", "n_next", "n_both", "jaccard"])


def validity_timeline(
    quintuples: "ray.data.Dataset",
    grid: "list[tuple[str, float]]",
    start_col: str = "t_start",
    end_col: str = "t_end",
) -> "pd.DataFrame":
    """Temporal-KG validity TIMELINE: the :func:`valid_at` snapshot swept
    over a date grid in ONE streaming pass — per grid date, how many
    observations are valid (edges-over-time, the growth/decay curve of
    an evolving KG).  ``grid`` is [(label, epoch_seconds), ...].

    Per batch the two boundary arrays sort once and every grid point is
    two searchsorted lookups (valid = N − #starts_after − #ends_before;
    a quintuple carries at most ONE boundary, so the two counts never
    overlap) — O(B log B + G log B) per batch, additive grid-vector
    partials, NO shuffle; the driver folds a G-sized vector.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.types as pt

    labels = [g[0] for g in grid]
    points = np.array([g[1] for g in grid], dtype=np.float64)

    def boundary(col) -> "np.ndarray":
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pt.is_list(col.type) or pt.is_large_list(col.type):
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            off = col.offsets.to_numpy()[: len(lens)]
            out = np.full(len(lens), np.nan)
            nz = lens > 0
            out[nz] = flat[off[nz]]
            return out
        return col.to_numpy(zero_copy_only=False).astype(np.float64)

    def partial(t: pa.Table) -> pa.Table:
        n = len(t)
        s = boundary(t[start_col])
        e = boundary(t[end_col])
        s = np.sort(s[~np.isnan(s)])
        e = np.sort(e[~np.isnan(e)])
        starts_after = len(s) - np.searchsorted(s, points, side="right")
        ends_before = np.searchsorted(e, points, side="left")
        valid = n - starts_after - ends_before
        return pa.table(
            {
                "gi": pa.array(np.arange(len(points), dtype=np.int64)),
                "n_valid": pa.array(valid.astype(np.int64)),
            }
        )

    parts = quintuples.select_columns([start_col, end_col]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    if not len(parts):
        counts = np.zeros(len(points), dtype=np.int64)
    else:
        counts = (
            parts.groupby("gi")["n_valid"].sum().reindex(range(len(points)), fill_value=0)
        ).to_numpy(dtype="int64")
    return pd.DataFrame({"snap_date": labels, "n_valid": counts})
