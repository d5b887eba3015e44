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
row per triple per block, combined with vectorized pandas C aggregations
(`first`/`sum`/`min`) plus a chain-concat per list column — then the
groupby shuffles only vocabulary-sized partials, bucketed so the final
combine dispatches one UDF per bucket, not per triple.  Output lists are
canonically ordered (times ascending, provenance lexicographic, ``t_obs``
unique-ascending): bit-identical at any parallelism; the reference's list
order is thread-schedule-dependent, so parity compares multisets.
"""

from __future__ import annotations

from itertools import chain

import pandas as pd
import ray.data

DEFAULT_NUM_BUCKETS = 64

_GROUP_COLS = ["subj_id", "pred", "obj_id"]
_CARRY_COLS = ["subj_name", "subj_label", "obj_name", "obj_label"]
_LIST_COLS = ["t_obs", "t_start", "t_end", "atomic_facts"]
_OUT_COLS = [
    "subj_id", "subj_name", "subj_label", "pred", "obj_id", "obj_name",
    "obj_label", "t_obs", "t_start", "t_end", "atomic_facts", "n_obs", "first_seen",
]


def _combine_frame(b: pd.DataFrame) -> pd.DataFrame:
    """Per-group combine without per-group UDF dispatch: rows are stably
    ordered by group code, scalars reduce with reduceat/boundary takes, and
    each list column is flattened ONCE with the per-group result sliced out
    of the flat array — cost is O(rows + list elements), independent of the
    number of groups (vocabulary-sized batches were quadratic-ish in the
    per-group-lambda version)."""
    import numpy as np

    key = b["subj_id"].str.cat([b["pred"], b["obj_id"]], sep="\x1f")
    codes, _ = pd.factorize(key, sort=False)
    order = np.argsort(codes, kind="stable")
    b2 = b.iloc[order]
    codes_sorted = codes[order]
    starts = np.flatnonzero(np.diff(codes_sorted, prepend=-1))  # first row of each group

    out = b2.iloc[starts][_GROUP_COLS + _CARRY_COLS].reset_index(drop=True)
    out["n_obs"] = np.add.reduceat(b2["n_obs"].to_numpy(dtype=np.int64), starts)
    # per-group min of the (string) first_seen keys
    fs = b2["first_seen"].to_numpy(dtype=object)
    out["first_seen"] = [min(fs[a:z]) for a, z in zip(starts, np.append(starts[1:], len(fs)))]

    row_ends = np.append(starts[1:], len(b2))
    for col in _LIST_COLS:
        cells = b2[col].to_numpy(dtype=object)
        lens = np.fromiter((len(c) for c in cells), dtype=np.int64, count=len(cells))
        elem_bounds = np.concatenate([[0], np.cumsum(lens)])
        flat = list(chain.from_iterable(cells))
        out[col] = [
            flat[elem_bounds[a] : elem_bounds[z]] for a, z in zip(starts, row_ends)
        ]
    return out


def _partial(batch: pd.DataFrame) -> pd.DataFrame:
    if "n_obs" not in batch:
        batch = batch.assign(n_obs=1)
    if "first_seen" not in batch:
        batch = batch.assign(first_seen=batch["sort_key"])
    # one t_obs stamp per (triple, obs_date) within this block; cross-block
    # duplicates collapse in the final unique pass (equal dates parse to
    # equal floats)
    if "obs_date" in batch:
        keep = ~batch.duplicated(subset=_GROUP_COLS + ["obs_date"])
        batch = batch.assign(
            t_obs=[list(v) if k else [] for v, k in zip(batch["t_obs"], keep)]
        )
    return _combine_frame(batch)


def _final_bucket(group: pd.DataFrame) -> pd.DataFrame:
    out = _combine_frame(group.drop(columns=["bucket"]))
    out["t_obs"] = out["t_obs"].map(lambda v: sorted(set(float(x) for x in v)))
    out["t_start"] = out["t_start"].map(lambda v: sorted(float(x) for x in v))
    out["t_end"] = out["t_end"].map(lambda v: sorted(float(x) for x in v))
    out["atomic_facts"] = out["atomic_facts"].map(lambda v: sorted(str(x) for x in v))
    out["n_obs"] = out["n_obs"].astype("int64")
    return out[_OUT_COLS]


def merge_triples(
    canon: ray.data.Dataset, num_buckets: int = DEFAULT_NUM_BUCKETS
) -> ray.data.Dataset:
    """canonical quintuple rows → one edge row per (subj_id, pred, obj_id)."""
    partials = canon.map_batches(_partial, batch_format="pandas", batch_size=262144)

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        key = b["subj_id"].str.cat([b["pred"], b["obj_id"]], sep="|")
        b["bucket"] = (pd.util.hash_array(key.to_numpy(dtype=object)) % num_buckets).astype(
            "int32"
        )
        return b

    return (
        partials.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(_final_bucket, batch_format="pandas")
    )
