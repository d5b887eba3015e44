"""Triple merge: partial per-block aggregation + bucketed groupby
(subj_id, pred, obj_id) list-concat.

Reference semantics (matcher.py:155-173 + relationship.py:38-76): once
entities and predicates are canonical, relationships equal on
``(name, startEntity, endEntity)`` — equality ignores timestamps
(relationship.py:78-96) — merge by extending ``t_obs/t_start/t_end/
atomic_facts``.  ``t_obs`` is stamped once per observation batch
(atom.py:193-194), so the merged edge carries one ``t_obs`` entry per
observation date that saw the triple (duplicate dates collapse; see
PARITY.md §1).

Scale shape: rows are PRE-AGGREGATED inside ``map_batches`` — one partial
row per triple per block — then the groupby shuffles only the collapsed
partials, bucketed so the final combine dispatches one UDF per bucket, not
per triple.  Both the partial and the final combine run the same
zero-copy Arrow kernel: group codes from a dictionary-encode, scalars via
``np.add.reduceat``, and every list column concatenated by OFFSET
ARITHMETIC on the flattened values buffer — no per-cell Python list ever
exists (the pandas/object-list version of this file spent ~80% of merge
wall time materializing those cells).  Output lists are canonically
ordered (times ascending, provenance lexicographic, ``t_obs``
unique-ascending): bit-identical at any parallelism; the reference's list
order is thread-schedule-dependent, so parity compares multisets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DEFAULT_NUM_BUCKETS = 64

_GROUP_COLS = ["subj_id", "pred", "obj_id"]
_CARRY_COLS = ["subj_name", "subj_label", "obj_name", "obj_label"]
_LIST_COLS = ["t_obs", "t_start", "t_end", "atomic_facts"]
_OUT_COLS = [
    "subj_id", "subj_name", "subj_label", "pred", "obj_id", "obj_name",
    "obj_label", "t_obs", "t_start", "t_end", "atomic_facts", "n_obs", "first_seen",
]


def _codes(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    enc = pc.dictionary_encode(arr)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return enc.indices.to_numpy(zero_copy_only=False)


_SEP = pa.scalar("\x1f", type=pa.large_string())


def _concat_key(t: pa.Table, cols: list[str]) -> pa.ChunkedArray:
    return pc.binary_join_element_wise(
        *[pc.cast(t[c], pa.large_string()) for c in cols], _SEP
    )


def _group_concat(t: pa.Table, obs_dedup: bool) -> pa.Table:
    """One output row per (subj_id, pred, obj_id): scalars reduced, list
    columns concatenated in stable row order — all via C kernels.

    ``obs_dedup``: keep each row's ``t_obs`` stamp only for the FIRST row
    of its (triple, obs_date) — the once-per-observation-batch stamping of
    atom.py:193-194 (cross-block duplicates collapse in the final unique
    pass, since equal dates parse to equal floats)."""
    n = len(t)
    if n == 0:
        cols0: dict = {}
        for c in _GROUP_COLS + _CARRY_COLS:
            cols0[c] = pa.array([], type=pa.large_string())
        for c in _LIST_COLS:
            cols0[c] = pa.array([], type=t[c].type if c in t.column_names else pa.list_(pa.float64()))
        cols0["n_obs"] = pa.array([], type=pa.int64())
        cols0["first_seen"] = pa.array([], type=pa.large_string())
        return pa.table({c: cols0[c] for c in _OUT_COLS})
    key3 = _concat_key(t, _GROUP_COLS)

    lists: dict[str, pa.Array] = {
        c: t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
        for c in _LIST_COLS
    }
    if obs_dedup and "obs_date" in t.column_names:
        codes4 = _codes(
            pc.binary_join_element_wise(
                key3, pc.cast(t["obs_date"], pa.large_string()), _SEP
            )
        )
        keep = ~pd.Series(codes4).duplicated().to_numpy()
        la = lists["t_obs"]
        flat_kept = pc.list_flatten(la.filter(pa.array(keep)))
        sizes = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64) * keep
        offs = np.concatenate([[0], np.cumsum(sizes)])
        lists["t_obs"] = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), flat_kept
        )

    codes = _codes(key3)
    order = np.argsort(codes, kind="stable")
    codes_sorted = codes[order]
    starts = np.flatnonzero(np.diff(codes_sorted, prepend=-1))
    order_pa = pa.array(order)
    take_firsts = pa.array(order[starts])

    cols: dict[str, pa.Array | list] = {}
    for c in _GROUP_COLS + _CARRY_COLS:
        col = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
        cols[c] = col.take(take_firsts)

    for c in _LIST_COLS:
        la_sorted = lists[c].take(order_pa)
        flat = pc.list_flatten(la_sorted)
        sizes = pc.list_value_length(la_sorted).to_numpy(zero_copy_only=False).astype(np.int64)
        bounds = np.concatenate([[0], np.cumsum(sizes)])
        group_offs = np.append(bounds[starts], bounds[n])
        cols[c] = pa.ListArray.from_arrays(pa.array(group_offs, type=pa.int32()), flat)

    if "n_obs" in t.column_names:
        n_obs = t["n_obs"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        n_obs = np.ones(n, dtype=np.int64)
    cols["n_obs"] = pa.array(np.add.reduceat(n_obs[order], starts), type=pa.int64())

    # per-group min first_seen via the Arrow hash_min C kernel (a pandas
    # object-string groupby.min here measured ~48µs/group — 8.8 s/block);
    # dictionary codes are dense 0..k-1 and codes_sorted[starts] == arange(k),
    # so scattering by group code aligns with the starts order exactly
    fs_col = "first_seen" if "first_seen" in t.column_names else "sort_key"
    g = (
        pa.table({"code": pa.array(codes), "fs": pc.cast(t[fs_col], pa.large_string())})
        .group_by("code")
        .aggregate([("fs", "min")])
    )
    mins = np.empty(len(starts), dtype=object)
    mins[g["code"].to_numpy()] = g["fs_min"].to_pandas().to_numpy(dtype=object)
    cols["first_seen"] = pa.array(mins, type=pa.large_string())
    return pa.table({c: cols[c] for c in _OUT_COLS})


def _passthrough(t: pa.Table) -> pa.Table:
    """Schema-normalizing no-op partial: emitted when a block's collapse
    ratio is poor (vocab-heavy profiles: ~180k-row blocks over a 290k-triple
    vocabulary collapse <2x), where the group-concat kernel costs real CPU
    but barely shrinks the shuffle.  Skipping the within-block
    (triple, obs_date) stamp dedup is semantics-preserving: equal obs dates
    parse to equal floats and the final combine's unique pass collapses
    them (PARITY.md §1)."""
    n = len(t)
    cols: dict = {c: t[c] for c in _GROUP_COLS + _CARRY_COLS}
    for c in _LIST_COLS:
        # match the group-concat output type exactly (list<value>, int32
        # offsets) so pass-through and collapsed blocks union cleanly
        cols[c] = pc.cast(t[c], pa.list_(t[c].type.value_type))
    if "n_obs" in t.column_names:
        cols["n_obs"] = pc.cast(t["n_obs"], pa.int64())
    else:
        cols["n_obs"] = pa.array(np.ones(n, dtype=np.int64))
    fs_col = "first_seen" if "first_seen" in t.column_names else "sort_key"
    cols["first_seen"] = pc.cast(t[fs_col], pa.large_string())
    return pa.table({c: cols[c] for c in _OUT_COLS})


def _partial(t: pa.Table, skip_ratio: float = 0.5) -> pa.Table:
    """Adaptive per-block pre-aggregation: collapse when it pays, pass
    through when it doesn't.  The decision costs one dictionary-encode of
    the group key (needed by the collapse path anyway)."""
    n = len(t)
    if n and skip_ratio < 1.0:
        codes = _codes(_concat_key(t, _GROUP_COLS))
        n_groups = int(codes.max()) + 1
        if n_groups > skip_ratio * n:
            return _passthrough(t)
    return _group_concat(t, obs_dedup=True)


def _sorted_lists(la: pa.Array, unique: bool = False, as_float: bool = False) -> pa.Array:
    """Sort (optionally dedupe) every list in a ListArray — vectorized:
    one lexsort of (row, value) over the flattened values buffer."""
    flat = pc.list_flatten(la)
    sizes = pc.list_value_length(la).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(la)
    if as_float and not pa.types.is_floating(flat.type):
        flat = pc.cast(flat, pa.float64())
    row_ids = np.repeat(np.arange(n), sizes)
    vals = flat.to_numpy(zero_copy_only=False)
    order = np.lexsort((vals, row_ids))
    vals_sorted = vals[order]
    if unique and len(vals_sorted):
        rows_sorted = row_ids[order]
        keep = np.ones(len(vals_sorted), dtype=bool)
        keep[1:] = (vals_sorted[1:] != vals_sorted[:-1]) | (rows_sorted[1:] != rows_sorted[:-1])
        vals_sorted = vals_sorted[keep]
        sizes = np.bincount(rows_sorted[keep], minlength=n)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    return pa.ListArray.from_arrays(
        pa.array(offs, type=pa.int32()), pa.array(vals_sorted, type=flat.type)
    )


def _final_bucket(group: pa.Table) -> pa.Table:
    out = _group_concat(group.drop_columns(["bucket"]), obs_dedup=False)
    cols = {c: out[c] for c in _OUT_COLS}
    cols["t_obs"] = _sorted_lists(out["t_obs"].combine_chunks(), unique=True, as_float=True)
    cols["t_start"] = _sorted_lists(out["t_start"].combine_chunks(), as_float=True)
    cols["t_end"] = _sorted_lists(out["t_end"].combine_chunks(), as_float=True)
    cols["atomic_facts"] = _sorted_lists(out["atomic_facts"].combine_chunks())
    return pa.table({c: cols[c] for c in _OUT_COLS})


def merge_triples(
    canon: ray.data.Dataset,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    partial_skip_ratio: float = 0.5,
) -> ray.data.Dataset:
    """canonical quintuple rows → one edge row per (subj_id, pred, obj_id).

    ``partial_skip_ratio``: blocks whose distinct-triple count exceeds this
    fraction of their rows skip the pre-aggregation kernel and ship as-is
    (0 → never pre-aggregate, >=1 → always; equivalence pinned by
    tests/test_merge_kernel.py)."""

    def partial_fn(t: pa.Table) -> pa.Table:
        return _partial(t, skip_ratio=partial_skip_ratio)

    partials = canon.map_batches(partial_fn, batch_format="pyarrow", batch_size=None)

    def add_bucket(t: pa.Table) -> pa.Table:
        key = pd.Series(_concat_key(t, _GROUP_COLS).to_pandas())
        bucket = (pd.util.hash_array(key.to_numpy(dtype=object)) % num_buckets).astype("int32")
        return t.append_column("bucket", pa.array(bucket))

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(_final_bucket, batch_format="pyarrow")
    )
