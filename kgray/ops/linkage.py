"""Blocked fuzzy record linkage (entity resolution over tabular names).

The KG side of the engine resolves entity SURFACES (canonicalize.py:
normalize → embed → cosine match); this is the classic tabular
counterpart — find record pairs whose names are within a small edit
distance, with a blocking key to kill the corpus² pair blowup.  The
reference has no tabular linkage; this extends the engine the way
ops/dedup.py extends its exact-match canonicalization.

Scale shape: records shuffle ONCE into their block (one bucketed groupby
on the blocking key — nation, zip, sorted-neighborhood window, …) and the
quadratic work happens inside each block where its rows already live, as
a batched numpy edit-distance DP (O(|block|² · len²) vector ops, no
Python-level string loop).  Blocks are assumed worker-sized — the
documented blocking contract every production linkage pipeline makes; add
a second blocking component upstream if one block outgrows a worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _encode_strings(strs) -> tuple[np.ndarray, np.ndarray]:
    """Encode N strings once into a padded uint32 char matrix + lengths.
    Callers gather pair rows from this matrix instead of re-encoding per
    pair — the encode loop is O(records), not O(pairs)."""
    lens = np.array([len(s) for s in strs], dtype=np.int64)
    m = int(lens.max()) if len(lens) else 0
    M = np.zeros((len(strs), m), dtype=np.uint32)
    for i, s in enumerate(strs):
        M[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return M, lens


def _lev_encoded(
    A: np.ndarray,
    la: np.ndarray,
    B: np.ndarray,
    lb: np.ndarray,
    prune_above: int | None = None,
) -> np.ndarray:
    """Batched Levenshtein DP over pre-encoded pair rows (see
    levenshtein_pairs for semantics and the prune_above contract)."""
    P = len(la)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    ma = int(la.max())
    mb = int(lb.max())
    A = A[:, :ma]
    B = B[:, :mb]

    if prune_above is not None:
        return _lev_banded(A, la, B, lb, prune_above)

    # D[p, j] = distance between a[p][:i] and b[p][:j], rolled over i
    prev = np.broadcast_to(np.arange(mb + 1, dtype=np.int64), (P, mb + 1)).copy()
    out = np.where(la == 0, lb, 0).astype(np.int64)
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]  # (P, 1)
        sub = prev[:, :-1] + (B != ai)  # substitute
        for j in range(1, mb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub[:, j - 1]
            )
        done = la == i  # rows whose a-side ends here read their answer
        if done.any():
            out[done] = cur[done, lb[done]]
        prev = cur
    return out


def _lev_banded(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray, k: int
) -> np.ndarray:
    """Ukkonen BANDED Levenshtein: compute only the |i−j| ≤ k diagonal
    band, all values clamped at k+1.  Exact for every pair whose true
    distance is ≤ k (an alignment with ≤ k edits never leaves the band);
    pairs beyond k uniformly report k+1.  Work per DP step is 2k+1 band
    cells instead of max_len columns — the right kernel when the caller
    thresholds at a small k."""
    P = len(la)
    INF = k + 1
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    ma = int(la.max())
    W = 2 * k + 1
    prev = np.full((P, W), INF, dtype=np.int64)
    for o in range(0, k + 1):
        prev[:, k + o] = np.where(o <= lb, o, INF)  # D[0][j] = j
    out = np.where(la == 0, np.minimum(lb, INF), INF).astype(np.int64)
    inf_col = np.full(P, INF, dtype=np.int64)
    for i in range(1, ma + 1):
        cur = np.full((P, W), INF, dtype=np.int64)
        for o in range(-k, k + 1):
            j = i + o
            if j < 0:
                continue
            if j == 0:
                cur[:, o + k] = min(i, INF)
                continue
            if j - 1 >= B.shape[1]:
                continue  # no row's b-side reaches this column
            dele = prev[:, o + k + 1] + 1 if o + 1 <= k else inf_col
            ins = cur[:, o + k - 1] + 1 if o - 1 >= -k else inf_col
            sub = prev[:, o + k] + (B[:, j - 1] != A[:, i - 1])
            cur[:, o + k] = np.minimum(np.minimum(np.minimum(dele, ins), sub), INF)
        done = la == i
        if done.any():
            o_fin = lb - i
            inb = done & (np.abs(o_fin) <= k)
            if inb.any():
                out[inb] = cur[np.flatnonzero(inb), (o_fin + k)[inb]]
        prev = cur
    return out


def levenshtein_pairs(
    a: list[str], b: list[str], prune_above: int | None = None
) -> np.ndarray:
    """Unit-cost Levenshtein distance for P string pairs as one batched
    DP: encode both sides into padded uint32 char matrices and run the
    (len_a × len_b) recurrence with vector ops over the pair axis —
    324 vector steps for 18-char names instead of P Python DPs.
    Matches DuckDB's ``levenshtein()`` exactly (insert/delete/substitute,
    all cost 1).

    ``prune_above``: when the caller only consumes distances ≤ k the
    kernel switches to the BANDED DP (:func:`_lev_banded`) — exact for
    every pair within k edits, uniform ``k + 1`` beyond, at 2k+1 band
    cells per step instead of max_len columns."""
    A, la = _encode_strings(a)
    B, lb = _encode_strings(b)
    return _lev_encoded(A, la, B, lb, prune_above=prune_above)


def blocked_name_linkage(
    ds: ray.data.Dataset,
    key_col: str,
    name_col: str,
    block_col: str,
    max_dist: int = 2,
) -> ray.data.Dataset:
    """All record pairs within one block whose names are within
    ``max_dist`` edits: (a_<key>, b_<key>, dist) with a_key < b_key.

    One shuffle (groupby the blocking key); each block emits its
    ``np.triu_indices`` pair set and runs the batched DP.  Exact within
    the block — the SQL twin is a blocked self-join on
    ``levenshtein() <= max_dist``."""
    a_out, b_out = f"a_{key_col}", f"b_{key_col}"

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                a_out: pd.Series(dtype="int64"),
                b_out: pd.Series(dtype="int64"),
                "dist": pd.Series(dtype="int64"),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(key_col, kind="mergesort")
        keys = g[key_col].to_numpy(dtype=np.int64)
        names = g[name_col].to_numpy(dtype=object)
        iu, iv = np.triu_indices(len(g), k=1)
        enc, lens = _encode_strings(list(names))
        d = _lev_encoded(enc[iu], lens[iu], enc[iv], lens[iv], prune_above=max_dist)
        hit = d <= max_dist
        if not hit.any():
            return empty
        return pd.DataFrame(
            {
                a_out: keys[iu[hit]],
                b_out: keys[iv[hit]],
                "dist": d[hit].astype(np.int64),
            }
        )

    return (
        ds.select_columns([key_col, name_col, block_col])
        .groupby(block_col)
        .map_groups(per_block, batch_format="pandas")
    )


def sorted_neighborhood_linkage(
    ds: ray.data.Dataset,
    key_col: str,
    name_col: str,
    window: int = 5,
    max_dist: int = 2,
    bin_size: int = 4096,
) -> ray.data.Dataset:
    """Sorted-neighborhood record linkage — the OTHER classic ER blocking
    strategy: sort all records by name and compare only rows within
    ``window`` positions of each other (catches near-dups that straddle a
    hard blocking key, at O(n·w) pairs instead of Σ|block|²).

    Exact global ranks WITHOUT a driver-resident sort — the two-pass
    range pattern: (1) one pass counts records per coarse sort-key range
    (name prefix; only range-count rows reach the driver, which takes
    the exclusive prefix offsets); (2) each range sorts locally and adds
    its offset — global rank done.  Ranked rows then land in
    ``bin_size`` rank bins, with each bin's LAST ``window`` rows also
    copied into the next bin (the range_join_count adjacency trick), so
    every within-``window`` pair co-locates in exactly one bin: the pair
    (r1 < r2, r2 − r1 ≤ window ≤ bin_size) lives in r2's home bin.
    Inside a bin the batched Levenshtein DP scores the O(|bin|·w)
    candidate pairs.  Stream cost: n·(1 + window/bin_size) rows, one
    shuffle per pass.

    Returns (a_<key>, b_<key>, dist) with a_key < b_key — NOTE: unlike
    :func:`blocked_name_linkage` the pair ordering key is the record KEY,
    while candidate generation is by name rank; the SQL twin is a
    row_number self-join.  ``window ≤ bin_size`` is asserted (one-bin
    adjacency assumption)."""
    assert window <= bin_size
    import ray

    from kgray.functions.broadcast import cached_get

    a_out, b_out = f"a_{key_col}", f"b_{key_col}"

    # pass 1: per-range counts (range = first 8 chars of the name — only
    # COUNTS cross the wire, skew in a range means more rows sort locally
    # in pass 2, not more driver state)
    def range_counts(b: pd.DataFrame) -> pd.DataFrame:
        r = b[name_col].astype(str).str[:8]
        return r.value_counts().rename_axis("rng").rename("n").reset_index()

    rc = ds.map_batches(range_counts, batch_format="pandas").to_pandas()
    if "rng" not in rc.columns or not len(rc):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    a_out: pd.Series(dtype="int64"),
                    b_out: pd.Series(dtype="int64"),
                    "dist": pd.Series(dtype="int64"),
                }
            )
        )
    agg = rc.groupby("rng", sort=True)["n"].sum()
    offsets = dict(zip(agg.index, np.r_[0, agg.to_numpy()[:-1].cumsum()]))
    off_ref = ray.put(offsets)

    # pass 2: per-range local sort + offset = exact global rank; emit each
    # row into its home rank-bin and the NEXT bin
    def ranked_rows(g: pd.DataFrame) -> pd.DataFrame:
        off = cached_get(off_ref)[g["rng"].iloc[0]]
        g = g.sort_values([name_col, key_col], kind="mergesort")
        rank = off + np.arange(len(g), dtype=np.int64)
        b0 = rank // bin_size
        # only a bin's last `window` ranks are visible from the next bin
        tail = rank % bin_size >= bin_size - window
        return pd.DataFrame(
            {
                "bin": np.concatenate([b0, b0[tail] + 1]),
                "rank": np.concatenate([rank, rank[tail]]),
                key_col: np.concatenate(
                    [g[key_col].to_numpy(dtype=np.int64),
                     g[key_col].to_numpy(dtype=np.int64)[tail]]
                ),
                name_col: np.concatenate(
                    [g[name_col].to_numpy(dtype=object),
                     g[name_col].to_numpy(dtype=object)[tail]]
                ),
                "home": np.concatenate(
                    [np.ones(len(g), dtype=bool), np.zeros(int(tail.sum()), dtype=bool)]
                ),
            }
        )

    def tag_range(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[key_col, name_col]].copy()
        b["rng"] = b[name_col].astype(str).str[:8]
        return b

    ranked = (
        ds.map_batches(tag_range, batch_format="pandas")
        .groupby("rng")
        .map_groups(ranked_rows, batch_format="pandas")
    )

    def pairs_in_bin(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                a_out: pd.Series(dtype="int64"),
                b_out: pd.Series(dtype="int64"),
                "dist": pd.Series(dtype="int64"),
            }
        )
        g = g.sort_values("rank", kind="mergesort")
        rank = g["rank"].to_numpy(dtype=np.int64)
        keys = g[key_col].to_numpy(dtype=np.int64)
        names = g[name_col].to_numpy(dtype=object)
        home = g["home"].to_numpy(dtype=bool)
        ii, jj = [], []
        for w in range(1, window + 1):
            # rows are rank-dense within the copied span; pair r with r+w
            # when the HIGHER rank is home in this bin (uniqueness rule)
            i = np.arange(len(g) - w)
            j = i + w
            ok = (rank[j] - rank[i] == w) & home[j]
            ii.append(i[ok])
            jj.append(j[ok])
        i = np.concatenate(ii)
        j = np.concatenate(jj)
        if not len(i):
            return empty
        enc, lens = _encode_strings(list(names))
        d = _lev_encoded(enc[i], lens[i], enc[j], lens[j], prune_above=max_dist)
        hit = d <= max_dist
        if not hit.any():
            return empty
        a = keys[i[hit]]
        b = keys[j[hit]]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pd.DataFrame({a_out: lo, b_out: hi, "dist": d[hit].astype(np.int64)})

    return ranked.groupby("bin").map_groups(pairs_in_bin, batch_format="pandas")
