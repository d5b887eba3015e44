"""Triple merge: partial per-block aggregation + groupby (subj_id, pred,
obj_id) list-concat.

Reference semantics (matcher.py:155-173 + relationship.py:38-76): once
entities and predicates are canonical, relationships equal on
``(name, startEntity, endEntity)`` — equality ignores timestamps
(relationship.py:78-96) — merge by extending ``t_obs/t_start/t_end/
atomic_facts``.  ``t_obs`` is stamped once per observation batch
(atom.py:193-194), so the merged edge carries one ``t_obs`` entry per
observation date that saw the triple (duplicate dates collapse; see
PARITY.md §1 — the reference can double-stamp through its merge-order
artifact).

Scale shape: rows are PRE-AGGREGATED inside ``map_batches`` — one partial
row per triple per block — before the groupby, so the all-to-all sort runs
over ~#triples x #blocks rows instead of the full quintuple stream (the
payload bytes still move; the sort/scheduling cost collapses).  Output
lists are canonically ordered (times ascending, provenance lexicographic,
``t_obs`` unique-ascending), which makes results bit-identical at any
parallelism; the reference's list order is thread-schedule-dependent, so
parity compares multisets either way.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

_GROUP_COLS = ["subj_id", "pred", "obj_id"]
_CARRY_COLS = ["subj_name", "subj_label", "obj_name", "obj_label"]


def _combine(g: pd.DataFrame) -> dict:
    first = g.iloc[0]
    row = {c: first[c] for c in _GROUP_COLS + _CARRY_COLS}
    row["t_obs"] = [float(x) for vals in g["t_obs"] for x in vals]
    row["t_start"] = [float(x) for vals in g["t_start"] for x in vals]
    row["t_end"] = [float(x) for vals in g["t_end"] for x in vals]
    row["atomic_facts"] = [str(x) for vals in g["atomic_facts"] for x in vals]
    row["n_obs"] = int(g["n_obs"].sum()) if "n_obs" in g else len(g)
    key = g["first_seen"] if "first_seen" in g else g["sort_key"]
    row["first_seen"] = key.min()
    return row


def _partial(batch: pd.DataFrame) -> pd.DataFrame:
    # one t_obs stamp per (triple, obs_date) within this block; cross-block
    # duplicates collapse in the final unique pass (values are equal floats
    # for equal dates)
    keep = ~batch.duplicated(subset=_GROUP_COLS + ["obs_date"])
    batch = batch.assign(t_obs=[v if k else [] for v, k in zip(batch["t_obs"], keep)])
    rows = [
        _combine(g) for _, g in batch.groupby(_GROUP_COLS, sort=False)
    ]
    return pd.DataFrame(rows)


def _final(group: pd.DataFrame) -> pd.DataFrame:
    row = _combine(group)
    row["t_obs"] = sorted(set(row["t_obs"]))
    row["t_start"] = sorted(row["t_start"])
    row["t_end"] = sorted(row["t_end"])
    row["atomic_facts"] = sorted(row["atomic_facts"])
    out = pd.DataFrame([row])
    out["n_obs"] = out["n_obs"].astype("int64")
    return out[
        ["subj_id", "subj_name", "subj_label", "pred", "obj_id", "obj_name",
         "obj_label", "t_obs", "t_start", "t_end", "atomic_facts", "n_obs", "first_seen"]
    ]


def merge_triples(canon: ray.data.Dataset) -> ray.data.Dataset:
    """canonical quintuple rows → one edge row per (subj_id, pred, obj_id)."""
    partials = canon.map_batches(_partial, batch_format="pandas", batch_size=65536)
    return partials.groupby(_GROUP_COLS).map_groups(_final, batch_format="pandas")
