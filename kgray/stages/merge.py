"""Triple merge: groupby (subj_id, pred, obj_id) + list-concat aggregate.

Reference semantics (matcher.py:155-173 + relationship.py:38-76): once
entities and predicates are canonical, relationships equal on
``(name, startEntity, endEntity)`` — equality ignores timestamps
(relationship.py:78-96) — merge by extending ``t_obs/t_start/t_end/
atomic_facts``.  ``t_obs`` is stamped once per observation batch
(atom.py:193-194), so the merged edge carries one ``t_obs`` entry per
observation date that saw the triple.

This is the north-star triple dedup: one shuffle keyed on the canonical
triple.  Rows within a group are ordered by the deterministic ``sort_key``
(obs_date, conv_id, chunk, fact) so output lists are reproducible at any
parallelism; the reference's lists are merge-tree-ordered, so parity tests
compare them as multisets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def merge_triples(canon: ray.data.Dataset) -> ray.data.Dataset:
    """canonical quintuple rows → one edge row per (subj_id, pred, obj_id)."""

    def per_triple(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("sort_key", kind="mergesort")
        first = group.iloc[0]
        # one t_obs entry per observation date (atom.py:193-194): within a
        # date the duplicate facts merged *before* stamping.
        seen = set()
        t_obs: list[float] = []
        for date, vals in zip(group["obs_date"], group["t_obs"]):
            if date not in seen:
                seen.add(date)
                t_obs.extend(list(vals))
        concat = lambda col: [x for vals in group[col] for x in vals]
        return pd.DataFrame(
            {
                "subj_id": [first["subj_id"]],
                "subj_name": [first["subj_name"]],
                "subj_label": [first["subj_label"]],
                "pred": [first["pred"]],
                "obj_id": [first["obj_id"]],
                "obj_name": [first["obj_name"]],
                "obj_label": [first["obj_label"]],
                "t_obs": [[float(x) for x in t_obs]],
                "t_start": [[float(x) for x in concat("t_start")]],
                "t_end": [[float(x) for x in concat("t_end")]],
                "atomic_facts": [[str(x) for x in group["atomic_fact"]]],
                "n_obs": np.array([len(group)], dtype="int64"),
                "first_seen": [first["sort_key"]],
            }
        )

    return canon.groupby(["subj_id", "pred", "obj_id"]).map_groups(
        per_triple, batch_format="pandas"
    )
