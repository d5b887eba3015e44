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


HLL_B = 8  # 2^8 = 256 registers


def _hll_estimate(reg_vec: np.ndarray) -> float:
    """HLL estimate from a 256-register vector, with the linear-counting
    small-range correction, micro-quantized half-away (== DuckDB round)."""
    s = np.power(2.0, -reg_vec).sum()
    v = int((reg_vec == 0).sum())
    est = (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 / s
    if est <= 2.5 * 256 and v > 0:
        est = 256.0 * np.log(256.0 / v)  # linear-counting small-range correction
    return float(np.floor(est * 1e6 + 0.5) / 1e6)


def hll_distinct_tokens(
    ds: ray.data.Dataset, text_col: str = "text", num_buckets: int = 64
) -> pd.DataFrame:
    """Approximate distinct-token count via a mergeable HyperLogLog sketch
    (m=256 registers), plus the exact count for calibration.

    Scale shape: every batch collapses to ≤256 (bucket, max-rho) register
    rows — the sketch merge is a 256-row groupby-max no matter how many
    tokens stream through, which is the whole point of HLL at 100 TB.  The
    exact twin is a distinct-per-batch partial + hash-bucket shuffle whose
    cost is bounded by vocabulary, not corpus.

    Hashing is md5-lower-64 (== DuckDB ``md5_number_lower``) so the
    register contents — not just the estimate — are reproducible in SQL:
    bucket = top 8 bits, rho = 33 − bit_length(low 32 bits) (33 when 0).
    """
    from kgray.ops.dedup import _md5_u64_np
    from kgray.ops.ranking import _flat_tokens

    m = 1 << HLL_B

    def registers(t: pa.Table) -> pa.Table:
        flat, _, _ = _flat_tokens(t[text_col])
        uniq = pd.unique(flat)
        h = _md5_u64_np(uniq)
        bucket = (h >> np.uint64(64 - HLL_B)).astype(np.int64)
        w = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        bl = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
        rho = 33 - bl
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, bucket, rho)
        hit = np.nonzero(reg)[0]
        exact_bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "kind": np.concatenate(
                    [np.zeros(len(hit), dtype=np.int64), np.ones(len(uniq), dtype=np.int64)]
                ),
                "bucket": np.concatenate([hit, exact_bucket]),
                "val": np.concatenate([reg[hit], h.astype(np.int64)]),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        if g["kind"].iloc[0] == 0:  # HLL registers: max-merge
            out = g.groupby("bucket", sort=True)["val"].max().reset_index()
            out["kind"] = 0
            return out[["kind", "bucket", "val"]]
        # exact: count distinct token hashes in this bucket
        return pd.DataFrame({"kind": [1], "bucket": [g["bucket"].iloc[0]], "val": [g["val"].nunique()]})

    parts = (
        ds.map_batches(registers, batch_format="pyarrow")
        .groupby(["kind", "bucket"])
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    regs = parts[parts["kind"] == 0].set_index("bucket")["val"]
    n_exact = int(parts[parts["kind"] == 1]["val"].sum())
    reg_vec = np.zeros(m)
    reg_vec[regs.index.to_numpy()] = regs.to_numpy(dtype=np.float64)
    est = _hll_estimate(reg_vec)
    return pd.DataFrame({"est_distinct": [est], "n_exact": [n_exact]})


CMS_D, CMS_W = 4, 1024


def cms_token_counts(
    ds: ray.data.Dataset,
    query_tokens: tuple[str, ...],
    text_col: str = "text",
    d: int = CMS_D,
    w: int = CMS_W,
) -> pd.DataFrame:
    """Count-Min-Sketch token-frequency estimates for a fixed query set —
    the mergeable frequency sketch for heavy-hitter detection at corpus
    scale (Cormode & Muthukrishnan 2005).

    Scale shape mirrors :func:`hll_distinct_tokens`: each batch collapses
    to ONE d×w integer sketch row (32 KB at the defaults) regardless of
    how many tokens stream through, the driver folds block sketches by
    plain addition, and point queries read d cells.  Hashing is
    md5-lower-64 of ``"{row}:{token}"`` (== DuckDB ``md5_number_lower``)
    so the full register table — not just the estimates — has an exact
    SQL twin.  Estimates overestimate (never underestimate) by design.
    """
    from kgray.ops.dedup import _md5_u64_np
    from kgray.ops.ranking import _flat_tokens

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = _flat_tokens(t[text_col])
        uniq, cnt = np.unique(flat, return_counts=True)
        sk = np.zeros(d * w, dtype=np.int64)
        for i in range(d):
            idx = (_md5_u64_np([f"{i}:{s}" for s in uniq]) % np.uint64(w)).astype(np.int64)
            np.add.at(sk, i * w + idx, cnt)
        return pa.table({"sketch": pa.array([sk.tolist()], type=pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts):
        sketch = np.sum(np.stack(parts["sketch"].to_numpy()), axis=0).astype(np.int64)
    else:
        sketch = np.zeros(d * w, dtype=np.int64)
    rows = []
    for tok in query_tokens:
        cells = [
            int(sketch[i * w + int(_md5_u64_np([f"{i}:{tok}"])[0] % np.uint64(w))])
            for i in range(d)
        ]
        rows.append((tok, min(cells)))
    return (
        pd.DataFrame(rows, columns=["token", "est_cnt"])
        .astype({"est_cnt": "int64"})
        .sort_values("token")
        .reset_index(drop=True)
    )


def zscore_outliers(
    ds: ray.data.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    z: float = 3.0,
) -> ray.data.Dataset:
    """Per-group z-score outlier flagging — the streaming anomaly filter.

    Pass 1 collapses each batch to (group, n, sum, sumsq) moment partials
    (rows bounded by groups × blocks, never events); the driver derives
    population mean/std and broadcasts the tiny per-group table; pass 2 is
    a stateless vectorized filter.  The inclusion test runs on the ROUNDED
    z so the SQL oracle's boundary set matches bit-for-bit."""
    from kgray.functions.broadcast import cached_get

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(group_col, sort=False)[value_col]
        out = g.agg(n="size", s="sum")
        out["ss"] = g.apply(lambda v: float(np.square(v.to_numpy(dtype=np.float64)).sum()))
        return out.reset_index()

    parts = ds.map_batches(moments, batch_format="pandas").to_pandas()
    agg = parts.groupby(group_col, sort=False)[["n", "s", "ss"]].sum()
    mu = agg["s"] / agg["n"]
    var = agg["ss"] / agg["n"] - mu * mu
    sd = np.sqrt(np.maximum(var.to_numpy(dtype=np.float64), 0.0))
    stats_ref = ray.put(
        {
            k: (float(m), float(s))
            for k, m, s in zip(agg.index, mu.to_numpy(dtype=np.float64), sd)
        }
    )

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        st = cached_get(stats_ref)
        ms = b[group_col].map(st)
        mu_v = np.array([x[0] for x in ms], dtype=np.float64)
        sd_v = np.array([x[1] for x in ms], dtype=np.float64)
        sd_v[sd_v == 0] = np.inf  # constant group: nothing is an outlier
        zs = (b[value_col].to_numpy(dtype=np.float64) - mu_v) / sd_v
        z6 = np.floor(np.abs(zs) * 1e6 + 0.5) / 1e6 * np.sign(zs)
        keep = np.abs(z6) > z
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy()[keep],
                group_col: b[group_col].to_numpy()[keep],
                "z": z6[keep],
            }
        )

    return ds.map_batches(flag, batch_format="pandas")


def percentile_transform(
    events: ray.data.Dataset,
    value_col: str = "value",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Global rank/CDF normalization (the quantile-transform feature prep):
    every row gets ``pct = P(X <= x)`` under the corpus's own empirical
    distribution of the CENT-quantized value — scale-free scores for
    downstream thresholds that must be stable across data drift.

    Two streaming passes, no shuffle: pass 1 folds each batch to a
    (cents, count) histogram partial — driver traffic bounded by the VALUE
    DOMAIN (quantization is what bounds it; a raw continuous double would
    make the histogram row-sized), the same premise as
    :func:`grouped_quantiles`.  The sorted (values, cumcounts) table
    broadcasts once; pass 2 is a vectorized ``searchsorted`` gather.
    ``pct`` equals DuckDB ``cume_dist()`` over the quantized value exactly
    (same integer division) — no rounding epsilon.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from kgray.functions.broadcast import cached_get

    def cents_of(col) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(v * 100.0 + 0.5).astype(np.int64)

    def hist_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"cents": pa.array(cents_of(t[value_col]), pa.int64())})
            .group_by("cents")
            .aggregate([([], "count_all")])
        )

    hist_df = events.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    if "cents" not in hist_df.columns or not len(hist_df):
        return events.map_batches(
            lambda t: pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "pct": pa.array([], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
    hist = hist_df.groupby("cents", sort=True)["count_all"].sum()
    values = hist.index.to_numpy(dtype=np.int64)
    cum = np.cumsum(hist.to_numpy(dtype=np.int64))
    n = int(cum[-1])
    table_ref = ray.put((values, cum, n))

    def attach(t: pa.Table) -> pa.Table:
        vals, cm, total = cached_get(table_ref)
        c = cents_of(t[value_col])
        pct = cm[np.searchsorted(vals, c)] / total
        return pa.table(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                "cents": pa.array(c, pa.int64()),
                "pct": pa.array(pct, pa.float64()),
            }
        )

    return events.map_batches(attach, batch_format="pyarrow")


def exact_distinct_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    unit_col: str,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT unit) per group — the precise twin of the
    :func:`hll_distinct_tokens` sketch (use this when exactness matters
    and the distinct domain fits a shuffle; the sketch when it doesn't).

    Per-batch distinct (group, unit) pre-shrink BEFORE the one group-hash
    bucket shuffle — only batch-distinct pairs cross the wire, the wire
    cost exact distinct counting fundamentally requires; the final
    distinct + count runs per bucket.  Returns (group_col, n_distinct).
    """

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[group_col, unit_col]].drop_duplicates()
        out = out.copy()
        out["bucket"] = (
            pd.util.hash_array(out[group_col].to_numpy(dtype=object)) % num_buckets
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        n = (
            g[[group_col, unit_col]]
            .drop_duplicates()
            .groupby(group_col, sort=False)
            .size()
        )
        return pd.DataFrame(
            {group_col: n.index, "n_distinct": n.to_numpy(dtype=np.int64)}
        )

    return (
        ds.map_batches(pair_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def rolling_distinct_per_day(
    ds: ray.data.Dataset,
    day_col: str = "day",
    unit_col: str = "user_id",
    window_days: int = 7,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Exact SLIDING-window distinct count: for every observed day d, the
    number of distinct units active in the trailing ``window_days`` window
    [d-window+1, d] — rolling weekly active users and friends.  The shape
    tumbling-window DAU can't express: windows overlap, so a naive
    per-window recount re-reads every event window_days times.

    Scale shape: ONE unit-hash bucket shuffle.  Batches pre-shrink to
    distinct (unit, day) pairs; each bucket (owning its units wholly)
    explodes every pair to the ≤window_days target days it contributes
    to, dedupes (unit, target-day) vectorized, and emits per-day COUNT
    partials plus its locally-observed day set — bucket-local distinct
    counts sum exactly because a unit never spans buckets.  The final
    combine is days x buckets sized (tiny); target days never observed in
    the data are dropped there (the `observed` flag partial, no extra
    pass over the stream).  Returns (day_col, n_rolling).
    """

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[unit_col, day_col]].drop_duplicates().copy()
        out["bucket"] = (
            pd.util.hash_array(out[unit_col].to_numpy()) % num_buckets
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[unit_col, day_col]].drop_duplicates()
        d = g[day_col].to_numpy(dtype="datetime64[D]").astype("int64")
        u = g[unit_col].to_numpy()
        k = window_days
        wd = np.repeat(d, k) + np.tile(np.arange(k, dtype=np.int64), len(d))
        uu = np.repeat(u, k)
        pairs = pd.DataFrame({"u": uu, "wd": wd}).drop_duplicates()
        cnt = pairs.groupby("wd", sort=False).size()
        out = pd.DataFrame(
            {
                "wd": np.concatenate([cnt.index.to_numpy(), np.unique(d)]),
                "n": np.concatenate(
                    [cnt.to_numpy(dtype=np.int64), np.zeros(len(np.unique(d)), dtype=np.int64)]
                ),
                "observed": np.concatenate(
                    [np.zeros(len(cnt), dtype=np.int8), np.ones(len(np.unique(d)), dtype=np.int8)]
                ),
            }
        )
        out["dbucket"] = (out["wd"] % num_buckets).astype("int32")
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("wd", sort=False)
            .agg(n=("n", "sum"), observed=("observed", "max"))
            .reset_index()
        )
        out = out[out["observed"] > 0]
        return pd.DataFrame(
            {
                day_col: out["wd"].to_numpy(dtype="datetime64[D]").astype(str),
                "n_rolling": out["n"].to_numpy(dtype=np.int64),
            }
        )

    return (
        ds.map_batches(pair_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(combine, batch_format="pandas")
    )


def winsorized_mean(
    events: ray.data.Dataset,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    key_col: str = "event_type",
    value_col: str = "value",
) -> pd.DataFrame:
    """Per-key winsorized mean — robust aggregation for value columns with
    heavy tails: values clip to the key's own [q_lo, q_hi] empirical
    quantiles before averaging (the standard outlier-resistant KPI).

    Quantile convention (shared verbatim with the SQL twin): on the
    CENT-quantized value, lo = min v with cdf(v) ≥ q_lo, hi = min v with
    cdf(v) ≥ q_hi — i.e. cume_dist thresholds, no interpolation, so both
    engines pick identical integer bounds and the clipped SUM is exact
    integer arithmetic (order-independent up to 2^53; the single final
    division is the only float op).

    Scale shape (the percentile_transform premise): pass 1 folds batches
    to (key, cents, count) histogram partials — driver traffic bounded by
    keys × value DOMAIN, not rows; the per-key bounds broadcast; pass 2
    folds clipped integer sums per key.  No shuffle in either pass."""
    import pyarrow as pa

    from kgray.functions.broadcast import cached_get

    def cents_of(col) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(v * 100.0 + 0.5).astype(np.int64)

    def hist_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({key_col: t[key_col], "cents": pa.array(cents_of(t[value_col]), pa.int64())})
            .group_by([key_col, "cents"])
            .aggregate([([], "count_all")])
        )

    hist = events.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            key_col: pd.Series(dtype=object),
            "lo_cents": pd.Series(dtype="int64"),
            "hi_cents": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "wmean": pd.Series(dtype="float64"),
        }
    )
    if key_col not in hist.columns or not len(hist):
        return empty
    bounds: dict[str, tuple[int, int]] = {}
    for k, grp in hist.groupby(key_col, sort=True):
        g = grp.groupby("cents", sort=True)["count_all"].sum()
        vals = g.index.to_numpy(dtype=np.int64)
        cdf = np.cumsum(g.to_numpy(dtype=np.int64)) / g.sum()
        bounds[k] = (
            int(vals[np.searchsorted(cdf, q_lo, side="left")]),
            int(vals[np.searchsorted(cdf, q_hi, side="left")]),
        )
    b_ref = ray.put(bounds)

    def clip_partial(t: pa.Table) -> pa.Table:
        bd = cached_get(b_ref)
        keys = t[key_col].to_pylist()
        c = cents_of(t[value_col])
        lo = np.array([bd[k][0] for k in keys], dtype=np.int64)
        hi = np.array([bd[k][1] for k in keys], dtype=np.int64)
        clipped = np.clip(c, lo, hi)
        return (
            pa.table({key_col: t[key_col], "s": pa.array(clipped, pa.int64())})
            .group_by(key_col)
            .aggregate([("s", "sum"), ([], "count_all")])
        )

    parts = events.map_batches(clip_partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(key_col, sort=True)[["s_sum", "count_all"]].sum().reset_index()
    out = pd.DataFrame(
        {
            key_col: agg[key_col],
            "lo_cents": [bounds[k][0] for k in agg[key_col]],
            "hi_cents": [bounds[k][1] for k in agg[key_col]],
            "n": agg["count_all"].astype("int64"),
            "wmean": (
                agg["s_sum"].to_numpy(dtype=np.float64)
                / 100.0
                / agg["count_all"].to_numpy(dtype=np.float64)
            ),
        }
    )
    out["wmean"] = np.floor(out["wmean"] * 1e4 + 0.5) / 1e4
    out["lo_cents"] = out["lo_cents"].astype("int64")
    out["hi_cents"] = out["hi_cents"].astype("int64")
    return out.reset_index(drop=True)


def decay_engagement(
    events: ray.data.Dataset,
    half_window_days: float = 7.0,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Per-key exponentially time-decayed engagement score — the standard
    recency-weighted KPI (recommendation freshness, churn features):
    ``score = Σ value·exp(−Δ/τ)`` with Δ the age of each event relative to
    the corpus watermark (global max ``ts``) and τ = ``half_window_days``.

    Exactness convention (the DSIR trick, kgray.ops.curation.dsir_weights):
    value quantizes to integer CENTS and the decay factor to integer
    MICRO-units (``floor(exp(−Δus/τus)·1e6 + 0.5)``) computed from the
    exact integer microsecond age, so each event contributes an exact
    int64 weight and per-key sums are order-independent — the SQL twin
    mirrors the double expression verbatim before quantizing.  int64 is
    safe up to ~9·10^6 max-value events per key (documented bound).

    Scale shape: pass 0 folds batches to one max-ts row each (driver sees
    blocks × 1); pass 1 folds batches to per-key integer partials via
    Arrow ``group_by`` — the only shuffle-free reduce traffic is keys ×
    blocks; the final per-key sum is a driver groupby over those partials
    (bounded by the key vocabulary, the events_dau budget).
    """
    tau_us = float(half_window_days) * 86_400_000_000.0

    def max_partial(t: pa.Table) -> pa.Table:
        m = pc.max(t[ts_col].cast(pa.timestamp("us"))).cast(pa.int64())
        return pa.table({"m": pa.array([m.as_py()], pa.int64())})

    mx = events.map_batches(max_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            key_col: pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "decay_score": pd.Series(dtype="float64"),
        }
    )
    if "m" not in mx.columns or not len(mx) or mx["m"].isna().all():
        return empty
    t_max_us = int(mx["m"].max())

    def partial(t: pa.Table) -> pa.Table:
        ts_us = (
            t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        age = (t_max_us - ts_us).astype(np.float64)
        micro = np.floor(np.exp(-age / tau_us) * 1e6 + 0.5).astype(np.int64)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return (
            pa.table({key_col: t[key_col], "w": pa.array(cents * micro, pa.int64())})
            .group_by(key_col)
            .aggregate([("w", "sum"), ([], "count_all")])
        )

    parts = events.map_batches(partial, batch_format="pyarrow").to_pandas()
    if key_col not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby(key_col, sort=True)[["w_sum", "count_all"]].sum().reset_index()
    score = agg["w_sum"].to_numpy(dtype=np.float64) / 1e8
    return pd.DataFrame(
        {
            key_col: agg[key_col].astype("int64"),
            "n": agg["count_all"].astype("int64"),
            "decay_score": np.floor(score * 1e4 + 0.5) / 1e4,
        }
    )


def mad_outliers(
    events: ray.data.Dataset,
    k: int = 3,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-key ROBUST outliers: flag events with ``|v − median| > k·MAD``
    where MAD is the median absolute deviation — unlike the z-score twin
    (kgray.ops.stats.zscore_outliers) this survives the heavy tails it is
    meant to detect, because both location and scale are medians.

    Quantile convention shared verbatim with the SQL twin (and with
    ``winsorized_mean``): on CENT-quantized values, median = min c with
    cume_dist(c) ≥ 0.5 within the key; MAD = the same statistic over
    ``|c − median|``.  The flag predicate is pure int64 arithmetic — no
    float enters, so engine and twin agree bit-for-bit.

    Scale shape: two shuffle-free histogram passes (batches fold to (key,
    cents, count) partials bounded by keys × value DOMAIN; the per-key
    median then MAD broadcast via ``ray.put``), then a streaming flag
    filter — the winsorized_mean ladder with an absolute-deviation second
    pass.  Returns the flagged events as a Dataset.
    """
    from kgray.functions.broadcast import cached_get

    def cents_of(col) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(v * 100.0 + 0.5).astype(np.int64)

    def hist_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({key_col: t[key_col], "cents": pa.array(cents_of(t[value_col]), pa.int64())})
            .group_by([key_col, "cents"])
            .aggregate([([], "count_all")])
        )

    def median_of(hist: pd.DataFrame) -> dict:
        out: dict = {}
        for key, grp in hist.groupby(key_col, sort=True):
            g = grp.groupby("cents", sort=True)["count_all"].sum()
            vals = g.index.to_numpy(dtype=np.int64)
            cdf = np.cumsum(g.to_numpy(dtype=np.int64)) / g.sum()
            out[key] = int(vals[np.searchsorted(cdf, 0.5, side="left")])
        return out

    hist = events.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    schema = pa.schema(
        [(id_col, pa.int64()), (key_col, pa.string()), ("dev_cents", pa.int64()), ("mad_cents", pa.int64())]
    )
    if key_col not in hist.columns or not len(hist):
        return ray.data.from_arrow(schema.empty_table())
    med = median_of(hist)
    med_ref = ray.put(med)

    def dev_partial(t: pa.Table) -> pa.Table:
        m = cached_get(med_ref)
        c = cents_of(t[value_col])
        mc = np.array([m[key] for key in t[key_col].to_pylist()], dtype=np.int64)
        return (
            pa.table({key_col: t[key_col], "cents": pa.array(np.abs(c - mc), pa.int64())})
            .group_by([key_col, "cents"])
            .aggregate([([], "count_all")])
        )

    dev_hist = events.map_batches(dev_partial, batch_format="pyarrow").to_pandas()
    mad = median_of(dev_hist)
    bounds_ref = ray.put({key: (med[key], mad[key]) for key in med})

    def flag(t: pa.Table) -> pa.Table:
        bd = cached_get(bounds_ref)
        c = cents_of(t[value_col])
        keys = t[key_col].to_pylist()
        mc = np.array([bd[key][0] for key in keys], dtype=np.int64)
        sc = np.array([bd[key][1] for key in keys], dtype=np.int64)
        dev = np.abs(c - mc)
        keep = dev > k * sc
        return pa.table(
            {
                id_col: t[id_col].filter(pa.array(keep)),
                key_col: t[key_col].filter(pa.array(keep)),
                "dev_cents": pa.array(dev[keep], pa.int64()),
                "mad_cents": pa.array(sc[keep], pa.int64()),
            }
        ).cast(schema)

    return events.map_batches(flag, batch_format="pyarrow")


def bigram_frequencies(
    ds: ray.data.Dataset,
    top_n: int = 30,
    text_col: str = "text",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Global top-n BIGRAM frequencies (count desc, bigram asc tie-break)
    — the second rung of tokenizer-vocabulary induction (BPE-merge
    candidates).  Bigrams pair adjacent raw split positions within a row
    and drop pairs with an empty side — the doc_repetition convention, so
    the twin's ``l[i] || ' ' || l[i+1]`` replays it exactly.

    Scale shape: identical to ``token_frequencies`` — per-batch Arrow
    pre-count, bucket-hash shuffle of (bigram, count) partials, per-bucket
    top-n, ``buckets × n`` driver merge."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lst = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        flat = np.asarray(pc.list_flatten(lst).to_pandas(), dtype=object)
        lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(lens)), lens)
        if len(flat) < 2:
            return pa.table(
                {
                    "bigram": pa.array([], pa.large_string()),
                    "count_all": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        adj = parent[1:] == parent[:-1]
        a, b = flat[:-1][adj], flat[1:][adj]
        ok = (a != "") & (b != "")
        grams = pd.Series(a[ok]).str.cat(pd.Series(b[ok]), sep=" ").to_numpy(dtype=object)
        counted = (
            pa.table({"bigram": pa.array(grams, pa.large_string())})
            .group_by("bigram")
            .aggregate([([], "count_all")])
        )
        bucket = pd.util.hash_array(
            np.asarray(counted["bigram"].to_pandas(), dtype=object)
        ) % num_buckets
        return counted.append_column("bucket", pa.array(bucket.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("bigram", sort=False)["count_all"].sum().reset_index(name="cnt")
        return c.sort_values(["cnt", "bigram"], ascending=[False, True], kind="mergesort").head(
            top_n
        )

    candidates = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "bigram" not in candidates.columns or not len(candidates):
        return pd.DataFrame({"bigram": pd.Series(dtype=object), "cnt": pd.Series(dtype="int64")})
    out = candidates.sort_values(["cnt", "bigram"], ascending=[False, True], kind="mergesort")
    out["cnt"] = out["cnt"].astype("int64")
    return out.head(top_n).reset_index(drop=True)


def grouped_mode(
    events: ray.data.Dataset,
    key_col: str = "event_type",
    value_col: str = "value",
) -> pd.DataFrame:
    """Per-key MODE of a quantized value column (most frequent cent value,
    smallest value on ties) with its count — the discrete-distribution
    summary mean/median miss.

    Scale shape: the winsorized_mean histogram budget — batches fold to
    (key, cents, count) partials via Arrow ``group_by``; the driver
    argmax is over keys × value DOMAIN rows, never the stream."""

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return (
            pa.table({key_col: t[key_col], "cents": pa.array(cents, pa.int64())})
            .group_by([key_col, "cents"])
            .aggregate([([], "count_all")])
        )

    hist = events.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    if key_col not in hist.columns or not len(hist):
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype=object),
                "mode_cents": pd.Series(dtype="int64"),
                "n_mode": pd.Series(dtype="int64"),
            }
        )
    agg = hist.groupby([key_col, "cents"], sort=True)["count_all"].sum().reset_index()
    # (count desc, cents asc) per key: sort then take first
    agg = agg.sort_values([key_col, "count_all", "cents"], ascending=[True, False, True],
                          kind="mergesort")
    top = agg.groupby(key_col, sort=True).head(1)
    return pd.DataFrame(
        {
            key_col: top[key_col].to_numpy(),
            "mode_cents": top["cents"].astype("int64").to_numpy(),
            "n_mode": top["count_all"].astype("int64").to_numpy(),
        }
    ).reset_index(drop=True)


def weekly_heatmap(
    events: ray.data.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Per-type (day-of-week × hour) activity heatmap — the calendar
    seasonality rollup.  Day-of-week is pure integer arithmetic on the
    epoch (``(days + 4) % 7``, Sunday = 0 — 1970-01-01 was a Thursday),
    hour likewise, so no locale/strftime dependency exists on either
    engine.

    Scale shape: batches fold to (key, dow, hour, count) Arrow partials —
    driver reduce bounded by keys × 168 cells."""

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000) + 4) % 7
        hour = (us // 3_600_000_000) % 24
        return (
            pa.table(
                {
                    key_col: t[key_col],
                    "dow": pa.array(dow, pa.int64()),
                    "hour": pa.array(hour, pa.int64()),
                }
            )
            .group_by([key_col, "dow", "hour"])
            .aggregate([([], "count_all")])
        )

    parts = events.map_batches(partial, batch_format="pyarrow").to_pandas()
    if key_col not in parts.columns or not len(parts):
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype=object),
                "dow": pd.Series(dtype="int64"),
                "hour": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
            }
        )
    out = (
        parts.groupby([key_col, "dow", "hour"], sort=True)["count_all"]
        .sum()
        .reset_index(name="n_events")
    )
    for c in ("dow", "hour", "n_events"):
        out[c] = out[c].astype("int64")
    return out


def daily_anomalies(
    events: ray.data.Dataset,
    k_sigma: int = 3,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Daily-rate anomaly detection: flag (key, day) cells whose event
    count exceeds the key's own mean daily count by ``k_sigma`` population
    standard deviations — the aggregate-of-aggregate monitoring shape
    (error spikes, abuse bursts).

    Exactness: counts are integers; the flag compares in SQUARED integer
    space — ``n·(c·n − s)² > k²·n·(n·ss − s²)`` with s = Σcounts,
    ss = Σcounts², n = #days — so no float mean/σ is ever materialized
    and both engines agree bit-for-bit (int64-safe while Σcounts² · days
    < 2^63; BIGINT throughout on the twin).

    Scale shape: one (key, day, count) Arrow-partial pass (keys × days
    driver budget — the events_daily shape); the per-key moments and the
    flag predicate run on that bounded table."""

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
            key_col: pd.Series(dtype=object),
            "day": pd.Series(dtype=object),
            "n_events": pd.Series(dtype="int64"),
        }
    )
    if key_col not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby([key_col, "day"], sort=True)["count_all"].sum().reset_index(name="c")
    g = daily.groupby(key_col, sort=False)["c"]
    n = g.transform("size").to_numpy(dtype=np.int64)
    s = g.transform("sum").to_numpy(dtype=np.int64)
    ss = g.transform(lambda x: (x.astype(np.int64) ** 2).sum()).to_numpy(dtype=np.int64)
    c = daily["c"].to_numpy(dtype=np.int64)
    lhs = n * (c * n - s) ** 2
    rhs = k_sigma * k_sigma * n * (n * ss - s * s)
    keep = (c * n > s) & (lhs > rhs)
    out = daily.loc[keep, [key_col, "day"]].copy()
    out["n_events"] = c[keep]
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values([key_col, "day"]).reset_index(drop=True)


def hll_distinct_with_store(
    ds: ray.data.Dataset,
    store_dir: str,
    run_id: str,
    text_col: str = "text",
) -> pd.DataFrame:
    """Incremental distinct-count via a PERSISTED HyperLogLog register
    store — the sketch twin of the MinHash/vector stores (ST4 evolving
    state): each ingest run writes its 256 max-registers as one Parquet
    file; the estimate is computed over the max-merge of ALL runs' files.
    HLL registers are a commutative-idempotent merge, so N incremental
    runs equal the one-shot sketch bit-for-bit — re-running a run is
    harmless (idempotent resume).

    Scale shape: the run's batches fold to ≤256-row register partials
    (the hll_distinct_tokens budget); the store read is ≤256 rows per
    PRIOR RUN — never corpus-proportional."""
    import os

    from kgray.ops.dedup import _md5_u64_np
    from kgray.ops.ranking import _flat_tokens

    m = 1 << HLL_B

    def registers(t: pa.Table) -> pa.Table:
        flat, _, _ = _flat_tokens(t[text_col])
        uniq = pd.unique(flat)
        h = _md5_u64_np(uniq)
        bucket = (h >> np.uint64(64 - HLL_B)).astype(np.int64)
        w = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        bl = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
        rho = 33 - bl
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, bucket, rho)
        hit = np.nonzero(reg)[0]
        return pa.table(
            {"bucket": pa.array(hit, pa.int64()), "val": pa.array(reg[hit], pa.int64())}
        )

    parts = ds.map_batches(registers, batch_format="pyarrow").to_pandas()
    run_regs = (
        parts.groupby("bucket", sort=True)["val"].max()
        if "bucket" in parts.columns and len(parts)
        else pd.Series(dtype="int64")
    )
    os.makedirs(store_dir, exist_ok=True)
    tbl = pa.table(
        {
            "bucket": pa.array(run_regs.index.to_numpy(dtype=np.int64), pa.int64()),
            "val": pa.array(run_regs.to_numpy(dtype=np.int64), pa.int64()),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, os.path.join(store_dir, f"regs_{run_id}.parquet"))

    merged = ray.data.read_parquet(store_dir).to_pandas()
    reg_vec = np.zeros(m)
    if "bucket" in merged.columns and len(merged):
        mx = merged.groupby("bucket", sort=True)["val"].max()
        reg_vec[mx.index.to_numpy()] = mx.to_numpy(dtype=np.float64)
    return pd.DataFrame({"est_distinct": [_hll_estimate(reg_vec)]})


def percentile_by_key(
    events: ray.data.Dataset,
    key_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Attach each event's percentile WITHIN its key (grouped cume_dist:
    share of the key's rows with value ≤ this row's) — the per-segment
    normalization the global percentile_transform can't express.

    Exactness: pct = cum/total on CENT-quantized values, micro-quantized
    half-up — both engines compute the identical rational then round.

    Scale shape: the winsorized histogram budget — (key, cents, count)
    partials, per-key CDF tables broadcast once, streaming searchsorted
    attach."""
    from kgray.functions.broadcast import cached_get

    def cents_of(col) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(v * 100.0 + 0.5).astype(np.int64)

    def hist_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({key_col: t[key_col], "cents": pa.array(cents_of(t[value_col]), pa.int64())})
            .group_by([key_col, "cents"])
            .aggregate([([], "count_all")])
        )

    hist = events.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    schema = pa.schema(
        [(id_col, pa.int64()), (key_col, pa.string()), ("pct", pa.float64())]
    )
    if key_col not in hist.columns or not len(hist):
        return ray.data.from_arrow(schema.empty_table())
    tables: dict = {}
    for key, grp in hist.groupby(key_col, sort=True):
        g = grp.groupby("cents", sort=True)["count_all"].sum()
        vals = g.index.to_numpy(dtype=np.int64)
        cum = np.cumsum(g.to_numpy(dtype=np.int64))
        tables[key] = (vals, cum, int(cum[-1]))
    ref = ray.put(tables)

    def attach(t: pa.Table) -> pa.Table:
        tb = cached_get(ref)
        keys = t[key_col].to_pylist()
        keys_arr = np.asarray(keys, dtype=object)
        c = cents_of(t[value_col])
        pct = np.empty(len(c), dtype=np.float64)
        for key in pd.unique(keys_arr):  # one searchsorted per DISTINCT key
            m = keys_arr == key
            vals, cum, total = tb[key]
            pct[m] = cum[np.searchsorted(vals, c[m], side="left")] / total
        pct = np.floor(pct * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                key_col: pa.array(keys, pa.string()),
                "pct": pa.array(pct, pa.float64()),
            }
        ).cast(schema)

    return events.map_batches(attach, batch_format="pyarrow")


def type_combo_census(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Exact behavioral-segment census: for every DISTINCT set of event
    types a key has ever emitted, how many keys share exactly that set —
    the set-algebra rollup (did A and B but never C) without one query
    per combination.

    Scale shape: batches pre-shrink to distinct (key, type) pairs; one
    key-hash bucket shuffle assembles each key's full set; the combo
    label is the sorted '+'-joined type list, so the driver reduce is
    bounded by the type power set, not keys."""

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[key_col, type_col]].drop_duplicates()
        out = out.copy()
        out["bucket"] = (out[key_col].to_numpy(dtype=np.int64) % 64).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key_col, type_col]).sort_values(
            [key_col, type_col], kind="mergesort"
        )
        combos = g.groupby(key_col, sort=False)[type_col].agg("+".join)
        c = combos.value_counts()
        return pd.DataFrame({"combo": c.index.to_numpy(dtype=object), "n": c.to_numpy()})

    parts = (
        events.map_batches(pair_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "combo" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {"combo": pd.Series(dtype=object), "n_users": pd.Series(dtype="int64")}
        )
    out = parts.groupby("combo", sort=True)["n"].sum().reset_index(name="n_users")
    out["n_users"] = out["n_users"].astype("int64")
    return out


def daily_delta(
    events: ray.data.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> pd.DataFrame:
    """Day-over-day revenue differencing per key: each ACTIVE day's cent
    sum minus the key's PREVIOUS active day's — the time-series
    first-difference report (trend/regression input).

    Exactness: int64 cent sums; the delta is integer subtraction (first
    active day has no predecessor and reports the sentinel delta = its
    own sum, i.e. lag default 0 — mirrored in the twin).

    Scale shape: the events_daily partial budget (keys × days); the
    lag runs on that bounded table."""

    def partial(t: pa.Table) -> pa.Table:
        day = pc.strftime(t[ts_col].cast(pa.timestamp("us")), format="%Y-%m-%d")
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t[value_col], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return (
            pa.table({key_col: t[key_col], "day": day, "c": cents})
            .group_by([key_col, "day"])
            .aggregate([("c", "sum")])
        )

    parts = events.map_batches(partial, batch_format="pyarrow").to_pandas()
    if key_col not in parts.columns or not len(parts):
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype=object),
                "day": pd.Series(dtype=object),
                "sum_cents": pd.Series(dtype="int64"),
                "delta_cents": pd.Series(dtype="int64"),
            }
        )
    daily = parts.groupby([key_col, "day"], sort=True)["c_sum"].sum().reset_index(name="sum_cents")
    prev = daily.groupby(key_col, sort=False)["sum_cents"].shift(1).fillna(0).astype("int64")
    daily["delta_cents"] = daily["sum_cents"].astype("int64") - prev
    daily["sum_cents"] = daily["sum_cents"].astype("int64")
    return daily.reset_index(drop=True)


def daily_autocorr(
    events: ray.data.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Lag-1 autocorrelation of each key's daily count series (Pearson
    between consecutive CALENDAR-ADJACENT active days is ill-posed on
    sparse series, so this pairs consecutive ACTIVE days — the twin pairs
    the same rows) — the trend-persistence diagnostic.

    Exactness: all moments over the (c_t, c_{t+1}) pairs are exact int64;
    the single r division + sqrt micro-quantizes on both engines.  Keys
    with < 3 active days or zero variance report no row."""

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
            key_col: pd.Series(dtype=object),
            "n_pairs": pd.Series(dtype="int64"),
            "r1": pd.Series(dtype="float64"),
        }
    )
    if key_col not in parts.columns or not len(parts):
        return empty
    daily = parts.groupby([key_col, "day"], sort=True)["count_all"].sum().reset_index(name="c")
    rows = []
    for key, grp in daily.groupby(key_col, sort=True):
        c = grp["c"].to_numpy(dtype=np.int64)  # day-sorted
        if len(c) < 3:
            continue
        x, y = c[:-1], c[1:]
        n = np.int64(len(x))
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
        if den2 <= 0:
            continue
        r = (n * sxy - sx * sy).astype(np.float64) / np.sqrt(np.float64(den2))
        rows.append((key, int(n), np.floor(r * 1e6 + 0.5) / 1e6))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=[key_col, "n_pairs", "r1"])


def type_phi_correlation(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> pd.DataFrame:
    """Phi coefficient between event-type PAIRS over user presence sets —
    which behaviors co-occur beyond chance (the association-mining
    rollup).  Pairs with a degenerate margin (a type everyone or no one
    has) are excluded, as is division by zero.

    Exactness: n, n11 and the margins are exact int64 from distinct-pair
    counting; phi's one division + sqrt micro-quantizes identically on
    both engines.

    Scale shape: distinct (key, type) pre-shrink per batch; ONE key-hash
    bucket shuffle; each bucket emits its types² co-occurrence partial
    plus per-type margins — driver reduce bounded by types²."""

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[key_col, type_col]].drop_duplicates().copy()
        out["bucket"] = (out[key_col].to_numpy(dtype=np.int64) % 64).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key_col, type_col])
        frames = []
        nkeys = g[key_col].nunique()
        singles = g.groupby(type_col, sort=False).size().reset_index(name="cnt")
        singles["other"] = ""
        frames.append(singles.rename(columns={type_col: "ta", "other": "tb"}))
        j = g.merge(g, on=key_col, suffixes=("_a", "_b"))
        j = j[j[f"{type_col}_a"] < j[f"{type_col}_b"]]
        if len(j):
            co = (
                j.groupby([f"{type_col}_a", f"{type_col}_b"], sort=False)
                .size()
                .reset_index(name="cnt")
            )
            co.columns = ["ta", "tb", "cnt"]
            frames.append(co[["ta", "cnt", "tb"]])
        frames.append(pd.DataFrame({"ta": ["\x00n"], "cnt": [nkeys], "tb": [""]}))
        return pd.concat(frames, ignore_index=True)[["ta", "tb", "cnt"]]

    parts = (
        events.map_batches(pair_partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "ta": pd.Series(dtype=object),
            "tb": pd.Series(dtype=object),
            "n11": pd.Series(dtype="int64"),
            "phi": pd.Series(dtype="float64"),
        }
    )
    if "ta" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby(["ta", "tb"], sort=True)["cnt"].sum()
    n = int(agg.get(("\x00n", ""), 0))
    singles = {k[0]: int(v) for k, v in agg.items() if k[1] == "" and k[0] != "\x00n"}
    co = {k: int(v) for k, v in agg.items() if k[1] != ""}
    rows = []
    # complete the type-pair grid: a pair that NEVER co-occurs (n11 = 0)
    # is the strongest negative association — it must not vanish
    types = sorted(singles)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            n11 = co.get((ta, tb), 0)
            na, nb = singles[ta], singles[tb]
            den2 = na * nb * (n - na) * (n - nb)
            if den2 <= 0:
                continue
            phi = float(n * n11 - na * nb) / np.sqrt(np.float64(den2))
            rows.append((ta, tb, n11, np.floor(phi * 1e6 + 0.5) / 1e6))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["ta", "tb", "n11", "phi"])


def duplicate_row_audit(
    events: ray.data.Dataset,
    key_cols: tuple[str, ...] = ("user_id", "event_type", "ts", "value"),
) -> pd.DataFrame:
    """Data-quality audit: exact duplicate FACT rows (identical on
    ``key_cols``, ignoring the surrogate id) — double-ingest detection.
    Reports the number of duplicated groups and the surplus rows a
    dedup would remove.

    Scale shape: batches fold to (row-hash, count) partials (md5 over
    the canonical string of the key tuple — the stratified_sample hash,
    SQL-replayable); one hash-bucket shuffle; each bucket emits a 2-int
    partial."""
    from kgray.ops.dedup import _md5_u64_np

    cols = list(key_cols)

    def col_str(s: pd.Series) -> pd.Series:
        if str(s.dtype).startswith("datetime"):
            return s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        if str(s.dtype).startswith("float"):
            # cents, NOT the float repr — decimal formatting differs
            # between engines; the integer string never does
            return pd.Series(
                np.floor(s.to_numpy() * 100.0 + 0.5).astype(np.int64).astype(str),
                index=s.index,
            )
        return s.astype(str)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        key = col_str(b[cols[0]])
        for c in cols[1:]:
            key = key + "\x1f" + col_str(b[c])
        h = _md5_u64_np(list(key)).astype(np.int64)
        out = pd.DataFrame({"h": h}).groupby("h").size().reset_index(name="cnt")
        out["bucket"] = (out["h"] % 64).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("h", sort=False)["cnt"].sum()
        dup = tot[tot > 1]
        return pd.DataFrame(
            {"n_dup_groups": [int(len(dup))], "n_extra_rows": [int((dup - 1).sum())]}
        )

    parts = (
        events.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "n_dup_groups" not in parts.columns or not len(parts):
        return pd.DataFrame({"n_dup_groups": [0], "n_extra_rows": [0]}).astype("int64")
    return parts.sum(axis=0).to_frame().T.astype("int64").reset_index(drop=True)


def weekday_chi2(
    events: ray.data.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Chi-square statistic against a UNIFORM weekday distribution per
    key — the goodness-of-fit seasonality test (χ² ≫ 12.6 ⇒ the weekly
    cycle is real, not noise).  Day-of-week is the epoch integer formula
    (weekly_heatmap's (days+4) % 7).

    Exactness: with e = n/7, χ² = (7·Σo² − n²)/n — exact integers until
    the one micro-quantized division.

    Scale shape: (key, dow, count) Arrow partials — keys × 7 driver
    budget."""

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000) + 4) % 7
        return (
            pa.table({key_col: t[key_col], "dow": pa.array(dow, pa.int64())})
            .group_by([key_col, "dow"])
            .aggregate([([], "count_all")])
        )

    parts = events.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            key_col: pd.Series(dtype=object),
            "n": pd.Series(dtype="int64"),
            "chi2": pd.Series(dtype="float64"),
        }
    )
    if key_col not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby([key_col, "dow"], sort=True)["count_all"].sum()
    rows = []
    for key, grp in agg.groupby(level=0, sort=True):
        o = np.zeros(7, dtype=np.int64)
        o[grp.index.get_level_values(1).to_numpy(dtype=np.int64)] = grp.to_numpy(np.int64)
        n = int(o.sum())
        if n == 0:
            continue
        chi2 = float(7 * int((o * o).sum()) - n * n) / n
        rows.append((key, n, np.floor(chi2 * 1e6 + 0.5) / 1e6))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=[key_col, "n", "chi2"])


def zipf_slope(
    ds: ray.data.Dataset, top_n: int = 64, text_col: str = "text"
) -> pd.DataFrame:
    """Zipf's-law fit over the corpus unigram distribution: OLS slope of
    ln(count) on ln(rank) for the exact global top-``top_n`` tokens
    (count-desc, token-asc tie-break) — the tokenizer/corpus-health
    diagnostic (slope ≈ −1 for natural language).

    Scale shape: reuses ``token_frequencies`` (per-batch Arrow count
    partials, one token-hash shuffle, buckets×n driver merge); the fit
    itself touches ``top_n`` rows.  Both ln() inputs micro-quantize to
    1e6 BEFORE the moment sums so every product stays int64-exact and the
    DuckDB twin reproduces the slope bit-for-bit (the DSIR ln trick).
    """
    freqs = token_frequencies(ds, top_n=top_n, text_col=text_col)
    n = len(freqs)
    empty = pd.DataFrame(
        {"n_ranks": pd.Series(dtype="int64"), "slope": pd.Series(dtype="float64")}
    )
    if n < 2:
        return empty
    rank = np.arange(1, n + 1, dtype=np.float64)
    x = np.floor(np.log(rank) * 1e6 + 0.5).astype(np.int64)
    y = np.floor(np.log(freqs["cnt"].to_numpy(dtype=np.float64)) * 1e6 + 0.5).astype(
        np.int64
    )
    # python ints: exact; magnitudes stay < 2^63 for top_n ≤ ~200
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    if den == 0:
        return empty
    slope = np.floor(float(num) / float(den) * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"n_ranks": [np.int64(n)], "slope": [slope]})


def heaps_curve(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth curve: at doc-id checkpoints 2^k (plus
    the corpus max), the distinct-token vocabulary and total token count
    over all docs with id ≤ checkpoint — the corpus-scaling diagnostic
    (vocab ~ tokens^β).

    Scale shape: one pass computes per-token min-doc-id partials
    (per-batch Arrow group-min combiner, one token-hash shuffle); each
    bucket emits a CHECKPOINT-BIN histogram (first checkpoint covering
    the token's first doc), total token counts bin per batch the same
    way — the driver cumulative-sums ≤ buckets × ~log2(max_id) rows.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    mx = ds.max(id_col)
    if mx is None:
        return pd.DataFrame(
            {
                "checkpoint": pd.Series(dtype="int64"),
                "vocab": pd.Series(dtype="int64"),
                "total_tokens": pd.Series(dtype="int64"),
            }
        )
    mx = int(mx)
    cps = sorted({1 << k for k in range(63) if (1 << k) <= mx} | {mx})
    cps_arr = np.asarray(cps, dtype=np.int64)

    def token_min_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docs = np.repeat(t[id_col].to_numpy(zero_copy_only=False), lens)
        flat = pa.table({"token": toks.flatten(), "fd": pa.array(docs, pa.int64())})
        g = flat.group_by("token").aggregate([("fd", "min")])
        bucket = pd.util.hash_array(
            np.asarray(g["token"].to_pandas(), dtype=object)
        ) % num_buckets
        return g.append_column("bucket", pa.array(bucket.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("token", sort=False)["fd_min"].min().to_numpy(dtype=np.int64)
        # first checkpoint index covering each token's first doc
        idx = np.searchsorted(cps_arr, fd, side="left")
        cnt = np.bincount(idx, minlength=len(cps_arr))
        return pd.DataFrame(
            {
                "cp_idx": np.arange(len(cps_arr), dtype=np.int64),
                "vocab_new": cnt.astype(np.int64),
                "tok_new": np.int64(0),
            }
        )

    vocab_parts = (
        ds.map_batches(token_min_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )

    def token_count_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lens = pc.list_value_length(
            pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        docs = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(cps_arr, docs, side="left")
        tot = np.bincount(idx, weights=lens.astype(np.float64), minlength=len(cps_arr))
        return pa.table(
            {
                "cp_idx": pa.array(np.arange(len(cps_arr)), pa.int64()),
                "vocab_new": pa.array(np.zeros(len(cps_arr), np.int64)),
                "tok_new": pa.array(tot.astype(np.int64), pa.int64()),
            }
        )

    tok_parts = ds.map_batches(token_count_partial, batch_format="pyarrow")
    parts = vocab_parts.union(tok_parts).to_pandas()  # ≤ (buckets+blocks) × |cps|
    agg = parts.groupby("cp_idx", sort=True)[["vocab_new", "tok_new"]].sum()
    agg = agg.reindex(np.arange(len(cps_arr)), fill_value=0)
    return pd.DataFrame(
        {
            "checkpoint": cps_arr,
            "vocab": agg["vocab_new"].cumsum().astype("int64").to_numpy(),
            "total_tokens": agg["tok_new"].cumsum().astype("int64").to_numpy(),
        }
    )


def user_type_entropy(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    type_col: str = "event_type",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity feature (0 = single-type user).

    Scale shape: per-batch (user, type) count partials (combiner), one
    user-hash bucket shuffle; each bucket finishes counts, computes the
    micro-quantized entropy terms (floor(p·ln(1/p)·1e9+0.5), the DSIR ln
    trick — summed in exact integer space so the DuckDB twin hashes
    identically) and emits one row per user.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b.groupby([key_col, type_col], sort=False).size().reset_index(name="cnt")
        c["bucket"] = (c[key_col] % num_buckets).astype("int32")
        c["cnt"] = c["cnt"].astype("int64")
        return c

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby([key_col, type_col], sort=False)["cnt"].sum().reset_index()
        tot = c.groupby(key_col, sort=False)["cnt"].transform("sum")
        p = c["cnt"].to_numpy(dtype=np.float64) / tot.to_numpy(dtype=np.float64)
        inv = tot.to_numpy(dtype=np.float64) / c["cnt"].to_numpy(dtype=np.float64)
        term = np.floor(p * np.log(inv) * 1e9 + 0.5).astype(np.int64)
        out = pd.DataFrame({key_col: c[key_col], "n": tot, "t": term})
        agg = out.groupby(key_col, sort=False).agg(n_events=("n", "max"), tsum=("t", "sum"))
        return pd.DataFrame(
            {
                key_col: agg.index.astype("int64"),
                "n_events": agg["n_events"].astype("int64").to_numpy(),
                "entropy": agg["tsum"].to_numpy(dtype=np.float64) / 1e9,
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # one row per user (vocabulary-bounded)
    )
    if key_col not in out.columns or not len(out):
        return pd.DataFrame(
            {
                key_col: pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
                "entropy": pd.Series(dtype="float64"),
            }
        )
    return out.sort_values(key_col).reset_index(drop=True)


def value_gini(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    value_col: str = "value",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Gini coefficient of per-user total value — the concentration /
    inequality audit over the event stream (0 = uniform, →1 = one whale).

    Scale shape: per-batch (user, integer-cent) sum partials, one
    user-hash shuffle to per-user totals; the rank-weighted Gini formula
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) runs on the per-user totals —
    a KEY-VOCABULARY-bounded vector (the documented driver-reduce budget;
    ties broken by user id so the rank assignment is deterministic).
    All moments are exact python ints; only the final division is float,
    micro-quantized to 1e6.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b[value_col].to_numpy(dtype=np.float64) * 100.0 + 0.5).astype(
            np.int64
        )
        c = (
            pd.DataFrame({key_col: b[key_col].to_numpy(np.int64), "x": cents})
            .groupby(key_col, sort=False)["x"]
            .sum()
            .reset_index()
        )
        c["bucket"] = (c[key_col] % num_buckets).astype("int32")
        return c

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(key_col, sort=False)["x"].sum().reset_index()
        c["x"] = c["x"].astype("int64")
        return c[[key_col, "x"]]

    totals = (
        ds.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # one row per user (vocabulary-bounded)
    )
    empty = pd.DataFrame(
        {"n_users": pd.Series(dtype="int64"), "gini": pd.Series(dtype="float64")}
    )
    if key_col not in totals.columns or not len(totals):
        return empty
    totals = totals.sort_values(["x", key_col], kind="mergesort").reset_index(drop=True)
    x = totals["x"].to_numpy(dtype=np.int64)
    n = len(x)
    sx = int(x.sum())
    if sx == 0:
        return empty
    six = int((np.arange(1, n + 1, dtype=np.int64) * x).sum())
    gini = np.floor(float(2 * six - (n + 1) * sx) / float(n * sx) * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"n_users": [np.int64(n)], "gini": [gini]})


def contingency_chi2(
    ds: ray.data.Dataset, row_col: str, col_col: str
) -> pd.DataFrame:
    """Chi-square test of independence over a two-way categorical
    contingency table (e.g. nation × market segment) — the
    association-strength audit between two dimension columns.

    Exactness: per-cell terms use the identity (o−e)²/e =
    (o·N − r·c)² / (N·r·c) — exact python-int numerators/denominators,
    ONE float division per cell, micro-quantized to 1e6 and summed in
    integer space so the DuckDB twin hashes identically.  Zero cells of
    the full row×col grid contribute r·c/N, so the grid completes before
    the sum.

    Scale shape: per-batch (row, col, count) partials; the driver merges
    a |rows|×|cols| grid (dimension-vocabulary-bounded by definition).
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b.groupby([row_col, col_col], sort=False).size().reset_index(name="o")
        c["o"] = c["o"].astype("int64")
        return c

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=262144).to_pandas()
    empty = pd.DataFrame(
        {
            "n": pd.Series(dtype="int64"),
            "dof": pd.Series(dtype="int64"),
            "chi2": pd.Series(dtype="float64"),
        }
    )
    if row_col not in parts.columns or not len(parts):
        return empty
    grid = parts.groupby([row_col, col_col], sort=True)["o"].sum()
    obs = grid.unstack(fill_value=0).to_numpy(dtype=np.int64)
    n = int(obs.sum())
    if n == 0:
        return empty
    rn = obs.sum(axis=1)
    cn = obs.sum(axis=0)
    tsum = 0
    for i in range(obs.shape[0]):
        for j in range(obs.shape[1]):
            num = (int(obs[i, j]) * n - int(rn[i]) * int(cn[j])) ** 2
            den = n * int(rn[i]) * int(cn[j])
            if den > 0:
                tsum += int(np.floor(float(num) / float(den) * 1e6 + 0.5))
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    return pd.DataFrame(
        {"n": [np.int64(n)], "dof": [np.int64(dof)], "chi2": [tsum / 1e6]}
    )


def stickiness_ratio(
    days: ray.data.Dataset,
    day_col: str = "day",
    unit_col: str = "user_id",
    window_days: int = 7,
) -> pd.DataFrame:
    """DAU/WAU stickiness per observed day: exact daily distinct over the
    exact trailing-7-day distinct — the product-engagement ratio that
    needs BOTH distinct shapes (tumbling + sliding) at once.

    Scale shape: composes :func:`exact_distinct_per_group` (one day-hash
    shuffle of batch-distinct pairs) and :func:`rolling_distinct_per_day`
    (one unit-bucket shuffle with bounded ×window explode); the join +
    micro-quantized ratio runs on the observed-day-bounded results.
    """
    dau = exact_distinct_per_group(days, group_col=day_col, unit_col=unit_col).to_pandas()
    wau = rolling_distinct_per_day(
        days, day_col=day_col, unit_col=unit_col, window_days=window_days
    ).to_pandas()
    empty = pd.DataFrame(
        {
            "day": pd.Series(dtype=object),
            "dau": pd.Series(dtype="int64"),
            "wau": pd.Series(dtype="int64"),
            "stickiness": pd.Series(dtype="float64"),
        }
    )
    if day_col not in dau.columns or not len(dau) or day_col not in wau.columns:
        return empty
    m = dau.rename(columns={"n_distinct": "dau"}).merge(
        wau.rename(columns={"n_rolling": "wau"}), on=day_col
    )
    m["stickiness"] = (
        np.floor(
            m["dau"].to_numpy(dtype=np.float64) / m["wau"].to_numpy(dtype=np.float64) * 1e6
            + 0.5
        )
        / 1e6
    )
    m["dau"] = m["dau"].astype("int64")
    m["wau"] = m["wau"].astype("int64")
    return (
        m[[day_col, "dau", "wau", "stickiness"]]
        .sort_values(day_col)
        .reset_index(drop=True)
    )


def hapax_ratio(
    ds: ray.data.Dataset, text_col: str = "text", num_buckets: int = 16
) -> pd.DataFrame:
    """Hapax legomena ratio: the fraction of the corpus VOCABULARY that
    occurs exactly once — the classic corpus-maturity / OCR-noise
    diagnostic (noisy corpora skew hapax-heavy).

    Scale shape: per-batch Arrow token-count partials, one token-hash
    shuffle; each bucket emits (V, hapax, tokens) scalars — a
    buckets-row driver merge and one micro-quantized division.
    """

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
        c = g.groupby("token", sort=False)["count_all"].sum()
        return pd.DataFrame(
            {
                "v": [np.int64(len(c))],
                "hapax": [np.int64(int((c == 1).sum()))],
                "toks": [np.int64(int(c.sum()))],
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "vocab": pd.Series(dtype="int64"),
            "hapax": pd.Series(dtype="int64"),
            "total_tokens": pd.Series(dtype="int64"),
            "hapax_ratio": pd.Series(dtype="float64"),
        }
    )
    if "v" not in parts.columns or not len(parts):
        return empty
    v, h, t = int(parts["v"].sum()), int(parts["hapax"].sum()), int(parts["toks"].sum())
    if v == 0:
        return empty
    ratio = np.floor(float(h) / float(v) * 1e6 + 0.5) / 1e6
    return pd.DataFrame(
        {
            "vocab": [np.int64(v)],
            "hapax": [np.int64(h)],
            "total_tokens": [np.int64(t)],
            "hapax_ratio": [ratio],
        }
    )


def type_drift(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Distribution drift of the event-type mix between the FIRST and
    SECOND half of the observed time range: symmetric KL pair plus total
    variation distance — the stream-health drift monitor (doc_length_psi's
    twin on the categorical axis).

    Exactness: counts are exact ints; add-one smoothing over the union
    type set; each KL term quantizes to nano-units before the sum, TVD
    is |p−q|/2 summed in quantized space.

    Scale shape: one epoch min/max scalar pass, then (half, type) Arrow
    count partials — a 2 × |types| driver grid.
    """
    import pyarrow as pa

    lo = ds.min(ts_col)
    hi = ds.max(ts_col)
    if lo is None:
        return pd.DataFrame(
            {
                "kl_ab": pd.Series(dtype="float64"),
                "kl_ba": pd.Series(dtype="float64"),
                "tvd": pd.Series(dtype="float64"),
            }
        )
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
    grid = parts.groupby(["half", type_col], sort=True)["count_all"].sum().unstack(
        fill_value=0
    )
    grid = grid.reindex([0, 1], fill_value=0)
    k = grid.shape[1]
    c = grid.to_numpy(dtype=np.float64)
    n = c.sum(axis=1, keepdims=True)
    p = (c + 1.0) / (n + k)
    kl_ab = int(np.floor(p[0] * np.log(p[0] / p[1]) * 1e9 + 0.5).astype(np.int64).sum())
    kl_ba = int(np.floor(p[1] * np.log(p[1] / p[0]) * 1e9 + 0.5).astype(np.int64).sum())
    tvd = int(np.floor(np.abs(p[0] - p[1]) / 2.0 * 1e9 + 0.5).astype(np.int64).sum())
    return pd.DataFrame(
        {"kl_ab": [kl_ab / 1e9], "kl_ba": [kl_ba / 1e9], "tvd": [tvd / 1e9]}
    )


def kmv_distinct_tokens(
    ds: ray.data.Dataset, k: int = 256, text_col: str = "text"
) -> pd.DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct-token sketch: keep the k
    smallest md5 hashes ever seen; estimate distinct = (k−1)/û where û is
    the k-th smallest hash normalized to (0,1] — HLL's mergeable cousin
    with an EXACTLY reproducible twin (the sketch content is a pure
    function of the data, no register probabilities).

    Scale shape: per-batch partials keep ≤ k distinct hashes (bottom-k is
    a combiner); the driver merges blocks × k candidates and takes the
    global bottom-k.  Falls back to the exact count when fewer than k
    distinct hashes exist.
    """
    from kgray.ops.dedup import _md5_u64_np

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(pc.cast(texts, pa.large_string()), " ").flatten()
        uniq = pc.unique(toks).to_pylist()
        h = np.unique(_md5_u64_np(uniq))
        return pa.table({"h": pa.array(h[:k], pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "k": pd.Series(dtype="int64"),
            "kth_hash": pd.Series(dtype=object),
            "estimate": pd.Series(dtype="float64"),
        }
    )
    if "h" not in parts.columns or not len(parts):
        return empty
    hs = np.unique(parts["h"].to_numpy(dtype=np.uint64))
    if len(hs) < k:
        return pd.DataFrame(
            {"k": [np.int64(len(hs))], "kth_hash": [""], "estimate": [float(len(hs))]}
        )
    kth = int(hs[k - 1])
    est = (
        np.floor((k - 1) / (float(kth) / 18446744073709551616.0) * 1e6 + 0.5) / 1e6
    )
    return pd.DataFrame({"k": [np.int64(k)], "kth_hash": [str(kth)], "estimate": [est]})


def lang_mixing_weights(
    ds: ray.data.Dataset,
    group_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.3,
) -> pd.DataFrame:
    """Temperature-based multilingual mixing weights (the mT5/XLM-R rule
    w_l ∝ n_l^α, α<1 upsamples tail languages) plus per-language
    tokenizer fertility (chars per whitespace token).

    Exactness: n^α = exp(α·ln n) with BOTH transcendentals micro-quantized
    (the DSIR trick — np.exp/np.log match DuckDB bit-for-bit on quantized
    inputs); the weight normalization sums exact ints.

    Scale shape: one (lang, docs, tokens, chars) Arrow-partial pass —
    a |langs|-bounded driver grid.
    """

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lst = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        ntok = pc.list_value_length(lst).to_numpy(zero_copy_only=False).astype(np.int64)
        nchars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame(
            {
                "lang": np.asarray(t[group_col].to_pandas(), dtype=object),
                "docs": np.int64(1),
                "toks": ntok,
                "chars": nchars,
            }
        )
        out = g.groupby("lang", sort=False).sum().reset_index()
        return pa.table(
            {
                "lang": pa.array(out["lang"], pa.large_string()),
                "docs": pa.array(out["docs"].astype(np.int64), pa.int64()),
                "toks": pa.array(out["toks"].astype(np.int64), pa.int64()),
                "chars": pa.array(out["chars"].astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "lang": pd.Series(dtype=object),
            "n_docs": pd.Series(dtype="int64"),
            "n_tokens": pd.Series(dtype="int64"),
            "chars_per_token": pd.Series(dtype="float64"),
            "weight": pd.Series(dtype="float64"),
        }
    )
    if "lang" not in parts.columns or not len(parts):
        return empty
    agg = parts.groupby("lang", sort=True)[["docs", "toks", "chars"]].sum()
    n = agg["docs"].to_numpy(dtype=np.float64)
    # n^alpha in micro-quantized steps: lnq = floor(ln(n)·1e6+0.5)/1e6,
    # t = floor(exp(alpha·lnq)·1e6+0.5) — exact ints after this point
    lnq = np.floor(np.log(n) * 1e6 + 0.5) / 1e6
    t = np.floor(np.exp(alpha * lnq) * 1e6 + 0.5).astype(np.int64)
    tsum = int(t.sum())
    weight = np.floor(t.astype(np.float64) / float(tsum) * 1e6 + 0.5) / 1e6
    cpt = np.floor(
        agg["chars"].to_numpy(dtype=np.float64)
        / np.maximum(agg["toks"].to_numpy(dtype=np.float64), 1.0)
        * 1e6
        + 0.5
    ) / 1e6
    return pd.DataFrame(
        {
            "lang": agg.index.to_numpy(dtype=object),
            "n_docs": agg["docs"].astype("int64").to_numpy(),
            "n_tokens": agg["toks"].astype("int64").to_numpy(),
            "chars_per_token": cpt,
            "weight": weight,
        }
    )


def activity_powerlaw_slope(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    top_n: int = 64,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Heavy-tail exponent of user activity: OLS slope of ln(event count)
    on ln(rank) over the top-``top_n`` most active users — how whale-
    dominated the traffic is (steeper = heavier tail).

    Exactness and recipe are zipf_slope's: per-batch count partials, one
    key-hash shuffle, per-bucket top-n (count desc, key asc), int64-exact
    micro-quantized ln moments on ≤ top_n rows.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b.groupby(key_col, sort=False).size().reset_index(name="cnt")
        c["bucket"] = (c[key_col] % num_buckets).astype("int32")
        c["cnt"] = c["cnt"].astype("int64")
        return c

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(key_col, sort=False)["cnt"].sum().reset_index()
        return c.sort_values(["cnt", key_col], ascending=[False, True], kind="mergesort").head(
            top_n
        )

    cand = (
        ds.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {"n_ranks": pd.Series(dtype="int64"), "slope": pd.Series(dtype="float64")}
    )
    if key_col not in cand.columns or not len(cand):
        return empty
    top = cand.sort_values(["cnt", key_col], ascending=[False, True], kind="mergesort").head(
        top_n
    )
    n = len(top)
    if n < 2:
        return empty
    rank = np.arange(1, n + 1, dtype=np.float64)
    x = np.floor(np.log(rank) * 1e6 + 0.5).astype(np.int64)
    y = np.floor(np.log(top["cnt"].to_numpy(dtype=np.float64)) * 1e6 + 0.5).astype(np.int64)
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    den = n * sxx - sx * sx
    if den == 0:
        return empty
    slope = np.floor(float(n * sxy - sx * sy) / float(den) * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"n_ranks": [np.int64(n)], "slope": [slope]})


def weekday_profile_cosine(
    events: ray.data.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Pairwise cosine similarity of the 7-dim WEEKDAY count profiles of
    event types (unordered pairs) — do two behaviors follow the same
    weekly rhythm?  Complements weekday_chi2 (is there a rhythm) with
    which rhythms MATCH.

    Exactness: profiles are exact integer count vectors (the epoch
    day-of-week formula); Σab/√(Σa²·Σb²) runs in python ints with one
    micro-quantized division per pair.

    Scale shape: (key, dow, count) Arrow partials — keys × 7 driver grid.
    """

    def partial(t: pa.Table) -> pa.Table:
        us = t[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000) + 4) % 7
        return (
            pa.table({key_col: t[key_col], "dow": pa.array(dow, pa.int64())})
            .group_by([key_col, "dow"])
            .aggregate([([], "count_all")])
        )

    parts = events.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "type_a": pd.Series(dtype=object),
            "type_b": pd.Series(dtype=object),
            "cosine": pd.Series(dtype="float64"),
        }
    )
    if key_col not in parts.columns or not len(parts):
        return empty
    grid = parts.groupby([key_col, "dow"], sort=True)["count_all"].sum().unstack(
        fill_value=0
    )
    keys = list(grid.index)
    mat = grid.to_numpy(dtype=np.int64)
    rows = []
    for i in range(len(keys)):
        a = [int(v) for v in mat[i]]
        saa = sum(v * v for v in a)
        for j in range(i + 1, len(keys)):
            b = [int(v) for v in mat[j]]
            sab = sum(x * y for x, y in zip(a, b))
            sbb = sum(v * v for v in b)
            den = float(saa) * float(sbb)
            cos = 0.0 if den <= 0 else np.floor(
                float(sab) / np.sqrt(np.float64(den)) * 1e6 + 0.5
            ) / 1e6
            rows.append((keys[i], keys[j], cos))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["type_a", "type_b", "cosine"])


def _two_sample_value_hist(
    ds: ray.data.Dataset,
    type_col: str,
    value_col: str,
    type_a: str,
    type_b: str,
    quant: float,
    num_buckets: int,
) -> pd.DataFrame:
    """Shared kernel for the two-sample rank tests: the exact
    (value_cents → count_a, count_b) histogram.  The value domain is
    bounded (cents of a capped metric), so per-batch combiners plus a
    VALUE-hash bucket merge keep every moving row pre-aggregated; the
    driver sees ≤ |domain| rows no matter the corpus size."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b[type_col].isin([type_a, type_b])
        b = b.loc[m]
        v = np.floor(b[value_col].to_numpy(dtype=np.float64) * quant + 0.5).astype(
            np.int64
        )
        ia = (b[type_col] == type_a).to_numpy()
        d = pd.DataFrame({"v": v, "ca": ia.astype(np.int64), "cb": (~ia).astype(np.int64)})
        out = d.groupby("v", sort=False)[["ca", "cb"]].sum().reset_index()
        out["bucket"] = (out["v"] % num_buckets).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", sort=False)[["ca", "cb"]].sum().reset_index()

    h = (
        ds.map_batches(partial, batch_format="pandas", batch_size=262144)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "v" not in h.columns or not len(h):
        return pd.DataFrame(
            {
                "v": pd.Series(dtype="int64"),
                "ca": pd.Series(dtype="int64"),
                "cb": pd.Series(dtype="int64"),
            }
        )
    return h.sort_values("v").reset_index(drop=True)


def ks_two_sample(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    value_col: str = "value",
    type_a: str = "purchase",
    type_b: str = "view",
    quant: float = 100.0,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of two event types — the distribution-drift test that
    needs no binning choice (D = sup |F_a − F_b|).

    Exactness: values quantize to cents; D's numerator is the exact
    integer max|cumA·nB − cumB·nA| over the sorted distinct values; only
    the final D division is floating (nano-quantized on both engines).
    """
    h = _two_sample_value_hist(ds, type_col, value_col, type_a, type_b, quant, num_buckets)
    empty = pd.DataFrame(
        {
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "d_num": pd.Series(dtype="int64"),
            "ks_d": pd.Series(dtype="float64"),
        }
    )
    na, nb = int(h["ca"].sum()), int(h["cb"].sum())
    if na == 0 or nb == 0:
        return empty
    cca = np.cumsum(h["ca"].to_numpy(dtype=np.int64))
    ccb = np.cumsum(h["cb"].to_numpy(dtype=np.int64))
    d_num = int(np.max(np.abs(cca * nb - ccb * na)))
    ks_d = np.floor(float(d_num) / (float(na) * nb) * 1e9 + 0.5) / 1e9
    return pd.DataFrame(
        {
            "n_a": [np.int64(na)],
            "n_b": [np.int64(nb)],
            "d_num": [np.int64(d_num)],
            "ks_d": [ks_d],
        }
    )


def mannwhitney_auc(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    value_col: str = "value",
    type_a: str = "purchase",
    type_b: str = "view",
    quant: float = 100.0,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Mann-Whitney U between two event types' values, reported as 2·U_a
    (exact int, midrank tie handling) and the AUC U_a/(n_a·n_b) — does
    type A stochastically dominate type B?

    Exactness: from the exact cents histogram, 2·R_a = Σ ca·(2·cum_before
    + c + 1) with INTEGER midranks doubled; 2U = 2R − n_a(n_a+1); the one
    AUC division nano-quantizes identically on both engines."""
    h = _two_sample_value_hist(ds, type_col, value_col, type_a, type_b, quant, num_buckets)
    empty = pd.DataFrame(
        {
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "u2": pd.Series(dtype="int64"),
            "auc": pd.Series(dtype="float64"),
        }
    )
    na, nb = int(h["ca"].sum()), int(h["cb"].sum())
    if na == 0 or nb == 0:
        return empty
    ct = (h["ca"] + h["cb"]).to_numpy(dtype=np.int64)
    cum_before = np.concatenate([[0], np.cumsum(ct)[:-1]])
    r2 = int((h["ca"].to_numpy(dtype=np.int64) * (2 * cum_before + ct + 1)).sum())
    u2 = r2 - na * (na + 1)
    auc = np.floor(float(u2) / (2.0 * na * nb) * 1e9 + 0.5) / 1e9
    return pd.DataFrame(
        {
            "n_a": [np.int64(na)],
            "n_b": [np.int64(nb)],
            "u2": [np.int64(u2)],
            "auc": [auc],
        }
    )


def heavy_hitters(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    denom: int = 200,
    capacity: int = 1024,
) -> pd.DataFrame:
    """Exact φ-heavy hitters (count > n/``denom``) via the two-pass
    sketch-then-verify pattern: per-batch Misra-Gries summaries merge on
    the driver into a candidate SUPERSET (mergeable-summaries guarantee,
    Agarwal et al. 2012: merged MG undercounts by ≤ n/(capacity+1) and
    the driver-side re-cut removes ≤ another n/(capacity+1), so with
    capacity ≥ 2·denom every key with count > n/denom survives), then
    one broadcast recount pass makes the final counts exact.

    Scale shape: pass 1 moves ≤ capacity rows per batch; pass 2 moves
    ≤ capacity partial rows per batch; no shuffle at all."""
    from kgray.functions.broadcast import cached_get

    assert capacity >= 2 * denom, "capacity must be ≥ 2·denom for the superset guarantee"

    def mg_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b[key_col].value_counts()
        keys = vc.index.to_numpy(dtype=np.int64)
        cnts = vc.to_numpy(dtype=np.int64)
        if len(keys) > capacity:
            # Misra-Gries decrement: keep top-(capacity), subtract the
            # (capacity+1)-th count from the survivors (batch is already
            # exact-counted, so one decrement step suffices)
            cut = cnts[capacity]
            keys, cnts = keys[:capacity], cnts[:capacity] - cut
            keep = cnts > 0
            keys, cnts = keys[keep], cnts[keep]
        return pd.DataFrame({"k": keys, "c": cnts})

    parts = ds.map_batches(mg_partial, batch_format="pandas", batch_size=262144).to_pandas()
    empty = pd.DataFrame(
        {"user_id": pd.Series(dtype="int64"), "n_events": pd.Series(dtype="int64")}
    )
    if "k" not in parts.columns or not len(parts):
        return empty
    merged = parts.groupby("k", sort=False)["c"].sum()
    if len(merged) > capacity:
        cut = np.sort(merged.to_numpy())[::-1][capacity]
        merged = merged[merged > cut]
    cand_ref = ray.put(np.sort(merged.index.to_numpy(dtype=np.int64)))

    def recount(b: pd.DataFrame) -> pd.DataFrame:
        cand = cached_get(cand_ref)
        keys = b[key_col].to_numpy(dtype=np.int64)
        m = np.isin(keys, cand)
        vc = pd.Series(keys[m]).value_counts()
        return pd.DataFrame(
            {"k": vc.index.to_numpy(dtype=np.int64), "c": vc.to_numpy(dtype=np.int64)}
        )

    ex = ds.map_batches(recount, batch_format="pandas", batch_size=262144).to_pandas()
    if "k" not in ex.columns or not len(ex):
        return empty
    n_total = ds.count()
    cnt = ex.groupby("k", sort=True)["c"].sum()
    keep = cnt[cnt.to_numpy() * denom > n_total]
    return pd.DataFrame(
        {
            "user_id": keep.index.to_numpy(dtype=np.int64),
            "n_events": keep.to_numpy(dtype=np.int64),
        }
    )


def welch_ttest(
    ds: ray.data.Dataset,
    type_col: str = "event_type",
    value_col: str = "value",
    type_a: str = "purchase",
    type_b: str = "view",
    quant: float = 100.0,
) -> pd.DataFrame:
    """Welch's unequal-variance t statistic between two event types'
    values — the parametric member of the two-sample family (KS =
    distributional, Mann-Whitney = rank, Welch = mean difference).

    Exactness: cents moments accumulate as exact ints (python bigints on
    the driver, HUGEINT in the twin); the t formula runs in ONE fixed
    operation order — aᵢ = nᵢ·ssᵢ − sᵢ², termᵢ = aᵢ/nᵢ/(nᵢ−1)/nᵢ,
    t = (s₁/n₁ − s₂/n₂)/√(term₁+term₂) — and micro-quantizes.

    Scale shape: one streaming pass of (type, n, Σ, Σ²) partials."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b[type_col].isin([type_a, type_b])
        b = b.loc[m]
        v = np.floor(b[value_col].to_numpy(dtype=np.float64) * quant + 0.5).astype(np.int64)
        d = pd.DataFrame(
            {"t": b[type_col].to_numpy(dtype=object), "n": 1, "s": v, "ss": v * v}
        )
        return d.groupby("t", sort=False).sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=262144).to_pandas()
    empty = pd.DataFrame(
        {
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "mean_a": pd.Series(dtype="float64"),
            "mean_b": pd.Series(dtype="float64"),
            "t_stat": pd.Series(dtype="float64"),
        }
    )
    if "t" not in parts.columns or not len(parts):
        return empty

    def fold(t: str) -> tuple[int, int, int]:
        g = parts.loc[parts["t"] == t]
        return (
            int(g["n"].sum()),
            sum(int(v) for v in g["s"]),
            sum(int(v) for v in g["ss"]),
        )

    n1, s1, ss1 = fold(type_a)
    n2, s2, ss2 = fold(type_b)
    if n1 < 2 or n2 < 2:
        return empty
    a1, a2 = n1 * ss1 - s1 * s1, n2 * ss2 - s2 * s2
    term1 = float(a1) / n1 / (n1 - 1) / n1
    term2 = float(a2) / n2 / (n2 - 1) / n2
    if term1 + term2 <= 0:
        return empty
    m1, m2 = float(s1) / n1, float(s2) / n2
    t = (m1 - m2) / np.sqrt(np.float64(term1 + term2))
    return pd.DataFrame(
        {
            "n_a": [np.int64(n1)],
            "n_b": [np.int64(n2)],
            "mean_a": [np.floor(m1 / quant * 1e6 + 0.5) / 1e6],
            "mean_b": [np.floor(m2 / quant * 1e6 + 0.5) / 1e6],
            "t_stat": [np.floor(t * 1e6 + 0.5) / 1e6],
        }
    )


def shard_skew(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    n_shards: int = 64,
) -> pd.DataFrame:
    """Hash-shard balance audit: rows per ``md5(key) % n_shards`` shard
    plus each shard's load factor vs perfect balance — the check a
    pipeline runs BEFORE picking a partitioning key (a skewed key turns
    every downstream shuffle into a straggler).

    Exactness: shard assignment is the engine-wide md5 convention
    (``_md5_u64_np(str(key))`` ≡ DuckDB ``md5_number_lower(CAST(key AS
    VARCHAR))``); counts are exact int64; ``load`` = floor(n·shards·10⁶ /
    total)/10⁶ — one integer division, bit-equal on both engines.

    Scale shape: each batch collapses to ≤ n_shards partial counts
    (Arrow group_by combiner); the driver folds blocks × n_shards rows.
    No shuffle — the audit never moves the row stream."""
    from kgray.ops.dedup import _md5_u64_np

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = _md5_u64_np([str(x) for x in b[key_col]]) % np.uint64(n_shards)
        u, c = np.unique(h.astype(np.int64), return_counts=True)
        return pd.DataFrame({"shard": u, "n": c.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=262144).to_pandas()
    empty = pd.DataFrame(
        {
            "shard": pd.Series(dtype="int64"),
            "n_rows": pd.Series(dtype="int64"),
            "load": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    agg = parts.groupby("shard", sort=True)["n"].sum().reset_index(name="n_rows")
    total = int(agg["n_rows"].sum())
    agg["load"] = (
        agg["n_rows"].to_numpy(dtype=np.int64) * np.int64(n_shards) * np.int64(10**6)
        // np.int64(total)
    ).astype("float64") / 1e6
    return agg


def cohen_kappa(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
) -> pd.DataFrame:
    """Cohen's kappa between two categorical label columns — the
    chance-corrected agreement score a curation stack uses to decide
    whether two cheap labelers (or a labeler and a gold rule) measure
    the same thing.

    kappa = (n·Σnᵢᵢ − Σrᵢcᵢ) / (n² − Σrᵢcᵢ) over the confusion matrix —
    every term exact int64 (Python ints on the driver fold, so no
    overflow at any corpus size); the single division micro-quantizes
    identically on both engines.  Degenerate tables (pe = 1, i.e. both
    raters constant) report no row.

    Scale shape: each batch collapses to its (a, b) confusion partial
    (bounded by label-vocabulary², not rows); the driver folds
    blocks × cells rows.  No shuffle."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby([col_a, col_b], sort=False).size().reset_index(name="n")
        return out.rename(columns={col_a: "a", col_b: "b"})

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=262144).to_pandas()
    empty = pd.DataFrame(
        {
            "n": pd.Series(dtype="int64"),
            "agree": pd.Series(dtype="float64"),
            "kappa": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    cm = parts.groupby(["a", "b"], sort=False)["n"].sum()
    n = int(cm.sum())
    diag = int(cm[[i for i in cm.index if i[0] == i[1]]].sum()) if n else 0
    rows = cm.groupby(level=0).sum()
    cols = cm.groupby(level=1).sum()
    s = sum(int(rows[k]) * int(cols[k]) for k in rows.index if k in cols.index)
    den = n * n - s
    if den == 0:
        return empty
    agree = float(diag * 10**6 // n) / 1e6
    kappa = np.floor((n * diag - s) / den * 1e6 + 0.5) / 1e6
    return pd.DataFrame({"n": [np.int64(n)], "agree": [agree], "kappa": [float(kappa)]})


def daily_crosscorr(
    events: ray.data.Dataset,
    type_a: str = "view",
    type_b: str = "purchase",
    max_lag: int = 7,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Lagged cross-correlation between two event types' daily count
    series — does behavior A lead behavior B, and by how many days?
    Pearson r between x_t (type_a) and y_{t+k} (type_b) for each lag
    k ∈ [0, max_lag], over the ZERO-FILLED calendar spanning both
    series (sparse-day gaps count as 0 activity, so lags are true
    calendar days; the twin builds the same calendar with
    generate_series).

    Exactness: all moments are exact int64 over the paired counts; the
    one division + sqrt micro-quantizes identically.  Lags with zero
    variance on either side report no row.

    Scale shape: per-batch (type, day) count partials (combiner) →
    driver fold bounded by the calendar length, never the row stream."""

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t[type_col], value_set=pa.array([type_a, type_b]))
        t = t.filter(keep)
        day = pc.strftime(t[ts_col].cast(pa.timestamp("us")), format="%Y-%m-%d")
        return (
            pa.table({"t": t[type_col], "day": day})
            .group_by(["t", "day"])
            .aggregate([([], "count_all")])
        )

    parts = events.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "lag": pd.Series(dtype="int64"),
            "n_pairs": pd.Series(dtype="int64"),
            "r": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    daily = parts.groupby(["t", "day"], sort=True)["count_all"].sum().reset_index(name="c")
    cal = pd.date_range(daily["day"].min(), daily["day"].max(), freq="D").strftime(
        "%Y-%m-%d"
    )
    idx = pd.Index(cal)

    def series(ty: str) -> np.ndarray:
        g = daily.loc[daily["t"] == ty].set_index("day")["c"]
        return g.reindex(idx, fill_value=0).to_numpy(dtype=np.int64)

    x, y = series(type_a), series(type_b)
    rows = []
    for k in range(0, max_lag + 1):
        if len(x) - k < 2:
            break
        xs, ys = x[: len(x) - k], y[k:]
        # python ints: the variance product wraps int64 at realistic
        # corpus-wide daily counts (the graph/relational folds use the
        # same guard)
        n = len(xs)
        sx, sy = int(xs.sum()), int(ys.sum())
        sxx, syy = int((xs * xs).sum()), int((ys * ys).sum())
        sxy = int((xs * ys).sum())
        den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
        if den2 <= 0:
            continue
        r = float(n * sxy - sx * sy) / np.sqrt(np.float64(den2))
        rows.append((int(k), int(n), np.floor(r * 1e6 + 0.5) / 1e6))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "r"])


def token_coverage_curve(
    ds: ray.data.Dataset,
    ks: tuple[int, ...] = (10, 100, 1000),
    text_col: str = "text",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Vocabulary coverage curve: what fraction of all token OCCURRENCES
    the top-k token TYPES cover, for each k — the first question a
    tokenizer/vocabulary design asks of a corpus (Zipf corpora saturate
    fast; flat ones don't).

    Ranking is (count desc, token asc); share = covered·10⁶ // total —
    exact integer division, bit-equal on both engines.

    Scale shape: per-batch Arrow ``group_by`` token-count partials →
    ONE token-hash bucket shuffle; each bucket emits its top-max(ks)
    rows (any global top-k member is in its own bucket's top-k) plus a
    (total, n_distinct) scalar — the driver merges buckets × max(ks)
    candidate rows, never the vocabulary."""
    maxk = max(ks)

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(pc.cast(texts, pa.large_string()), " ").flatten()
        tt = pa.table({"token": toks})
        tt = tt.filter(pc.not_equal(tt["token"], ""))
        counted = tt.group_by("token").aggregate([([], "count_all")])
        bucket = pd.util.hash_array(
            np.asarray(counted["token"].to_pandas(), dtype=object)
        ) % num_buckets
        return counted.append_column("bucket", pa.array(bucket.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("token", sort=False)["count_all"].sum().reset_index(name="cnt")
        top = c.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort").head(maxk)
        top = top.assign(kind="t")
        scalars = pd.DataFrame(
            {"token": ["", ""], "cnt": [int(c["cnt"].sum()), len(c)], "kind": ["s", "d"]}
        )
        return pd.concat([top, scalars], ignore_index=True)[["token", "cnt", "kind"]]

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "k": pd.Series(dtype="int64"),
            "covered": pd.Series(dtype="int64"),
            "total": pd.Series(dtype="int64"),
            "n_vocab": pd.Series(dtype="int64"),
            "share": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    total = int(parts.loc[parts["kind"] == "s", "cnt"].sum())
    n_vocab = int(parts.loc[parts["kind"] == "d", "cnt"].sum())
    if total == 0:
        return empty
    cand = (
        parts.loc[parts["kind"] == "t"]
        .sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        .head(maxk)
    )
    counts = cand["cnt"].to_numpy(dtype=np.int64)
    csum = np.cumsum(counts)
    rows = []
    for k in ks:
        covered = int(csum[min(k, len(csum)) - 1]) if len(csum) else 0
        rows.append(
            (int(k), covered, total, n_vocab, (covered * 10**6 // total) / 1e6)
        )
    return pd.DataFrame(rows, columns=["k", "covered", "total", "n_vocab", "share"])


def quantile_sketch_audit(
    events: ray.data.Dataset,
    value_col: str = "cents",
    bucket_width: int = 1000,
    quantiles: tuple[tuple[str, int, int], ...] = (
        ("p50", 1, 2),
        ("p90", 9, 10),
        ("p99", 99, 100),
    ),
) -> pd.DataFrame:
    """Sketch-QA for histogram quantile estimation: the exact discrete
    quantile (``ceil(q·n) − 1`` index, DuckDB ``quantile_disc``) vs the
    estimate a fixed-width streaming histogram would report (the upper
    bound of the first bucket whose cumulative count reaches the index) —
    the audit that tells an ops dashboard how coarse its cheap sketch is.

    All arithmetic integer-exact: quantile indices via
    ``(num·n + den − 1) // den − 1``, bucket bounds via floor division.

    Scale shape: ONE pass of per-batch (value, count) Arrow partials
    (domain-bounded, same as grouped_quantiles); both the exact and the
    sketch answer fold from the same histogram on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"v": t[value_col]})
            .group_by("v")
            .aggregate([([], "count_all")])
        )

    parts = events.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "pct": pd.Series(dtype=object),
            "exact": pd.Series(dtype="int64"),
            "estimate": pd.Series(dtype="int64"),
            "abs_err": pd.Series(dtype="int64"),
        }
    )
    if not len(parts):
        return empty
    hist = parts.groupby("v", sort=True)["count_all"].sum()
    vals = hist.index.to_numpy(dtype=np.int64)
    cnts = hist.to_numpy(dtype=np.int64)
    n = int(cnts.sum())
    if n == 0:
        return empty
    csum = np.cumsum(cnts)
    # bucketized histogram (the sketch): value // width -> count
    b = pd.DataFrame({"b": vals // np.int64(bucket_width), "c": cnts})
    bh = b.groupby("b", sort=True)["c"].sum()
    bvals = bh.index.to_numpy(dtype=np.int64)
    bcsum = np.cumsum(bh.to_numpy(dtype=np.int64))
    rows = []
    for name, num, den in quantiles:
        idx = (num * n + den - 1) // den - 1  # 0-based rank of the quantile
        exact = int(vals[np.searchsorted(csum, idx + 1)])
        bi = int(np.searchsorted(bcsum, idx + 1))
        estimate = int((bvals[bi] + 1) * bucket_width - 1)  # bucket upper bound
        rows.append((name, exact, estimate, abs(estimate - exact)))
    return pd.DataFrame(rows, columns=["pct", "exact", "estimate", "abs_err"])


def kendall_tau_daily(
    events: ray.data.Dataset,
    type_a: str = "view",
    type_b: str = "purchase",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Kendall tau-b rank concordance between two event types' daily count
    series — the rank-based complement to ``daily_crosscorr``'s Pearson r
    and ``histogram_spearman``: robust to any monotone transform of
    either series, with the standard tie correction.

    Same calendar convention as :func:`daily_crosscorr` (zero-filled
    span of both series).  All pair census counts are exact integers
    (concordant / discordant / ties_x / ties_y over the O(days²) pair
    grid — days-sized, a driver fold like every daily op); tau-b's one
    division + sqrt micro-quantizes with the crosscorr convention
    (``floor(x·1e6 + 0.5) / 1e6``).  Zero variance on either side (all
    pairs tied) reports no row.

    Scale shape: per-batch (type, day) Arrow count partials → driver
    fold bounded by the calendar length, never the event stream."""

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t[type_col], value_set=pa.array([type_a, type_b]))
        t = t.filter(keep)
        day = pc.strftime(t[ts_col].cast(pa.timestamp("us")), format="%Y-%m-%d")
        return (
            pa.table({"t": t[type_col], "day": day})
            .group_by(["t", "day"])
            .aggregate([([], "count_all")])
        )

    parts = events.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "n_days": pd.Series(dtype="int64"),
            "n_pairs": pd.Series(dtype="int64"),
            "concordant": pd.Series(dtype="int64"),
            "discordant": pd.Series(dtype="int64"),
            "ties_x": pd.Series(dtype="int64"),
            "ties_y": pd.Series(dtype="int64"),
            "tau": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    daily = parts.groupby(["t", "day"], sort=True)["count_all"].sum().reset_index(name="c")
    cal = pd.date_range(daily["day"].min(), daily["day"].max(), freq="D").strftime(
        "%Y-%m-%d"
    )
    idx = pd.Index(cal)

    def series(ty: str) -> np.ndarray:
        g = daily.loc[daily["t"] == ty].set_index("day")["c"]
        return g.reindex(idx, fill_value=0).to_numpy(dtype=np.int64)

    x, y = series(type_a), series(type_b)
    n = len(x)
    if n < 2:
        return empty
    dx = np.sign(x[:, None] - x[None, :])
    dy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(n, k=1)
    sx, sy = dx[iu], dy[iu]
    conc = int(np.count_nonzero(sx * sy > 0))
    disc = int(np.count_nonzero(sx * sy < 0))
    ties_x = int(np.count_nonzero(sx == 0))
    ties_y = int(np.count_nonzero(sy == 0))
    n_pairs = len(sx)
    den2 = (n_pairs - ties_x) * (n_pairs - ties_y)
    if den2 <= 0:
        return empty
    tau = float(conc - disc) / np.sqrt(np.float64(den2))
    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "n_pairs": [np.int64(n_pairs)],
            "concordant": [np.int64(conc)],
            "discordant": [np.int64(disc)],
            "ties_x": [np.int64(ties_x)],
            "ties_y": [np.int64(ties_y)],
            "tau": [np.floor(tau * 1e6 + 0.5) / 1e6],
        }
    )
