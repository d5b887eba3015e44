"""Triple merge: bucketed groupby (subj_id, pred, obj_id) + list-concat.

Reference semantics (matcher.py:155-173 + relationship.py:38-76): once
entities and predicates are canonical, relationships equal on
``(name, startEntity, endEntity)`` — equality ignores timestamps
(relationship.py:78-96) — merge by extending ``t_obs/t_start/t_end/
atomic_facts``.  ``t_obs`` is stamped once per observation batch
(atom.py:193-194), so the merged edge carries one ``t_obs`` entry per
observation date that saw the triple.

This is the north-star triple dedup: one shuffle keyed on a hash bucket of
the canonical triple (one UDF dispatch per bucket, not per triple; hot
triples bound a bucket, never the whole exchange).  Rows within a group
are ordered by the deterministic ``sort_key`` (obs_date, conv_id, chunk,
fact) so output lists are reproducible at any parallelism; the reference's
lists are merge-tree-ordered, so parity tests compare them as multisets.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa
import ray.data

DEFAULT_NUM_BUCKETS = 64


def merge_triples(
    canon: ray.data.Dataset, num_buckets: int = DEFAULT_NUM_BUCKETS
) -> ray.data.Dataset:
    """canonical quintuple rows → one edge row per (subj_id, pred, obj_id)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        buckets = pa.array(
            [
                zlib.crc32(f"{s}|{p}|{o}".encode("utf-8")) % num_buckets
                for s, p, o in zip(
                    t["subj_id"].to_pylist(), t["pred"].to_pylist(), t["obj_id"].to_pylist()
                )
            ],
            type=pa.int32(),
        )
        return t.append_column("bucket", buckets)

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values("sort_key", kind="mergesort")
        rows = []
        for (subj_id, pred, obj_id), g in b.groupby(["subj_id", "pred", "obj_id"], sort=False):
            first = g.iloc[0]
            seen: set = set()
            t_obs: list[float] = []
            for date, vals in zip(g["obs_date"], g["t_obs"]):
                if date not in seen:  # one stamp per observation date
                    seen.add(date)
                    t_obs.extend(float(x) for x in vals)
            rows.append(
                {
                    "subj_id": subj_id,
                    "subj_name": first["subj_name"],
                    "subj_label": first["subj_label"],
                    "pred": pred,
                    "obj_id": obj_id,
                    "obj_name": first["obj_name"],
                    "obj_label": first["obj_label"],
                    "t_obs": t_obs,
                    "t_start": [float(x) for vals in g["t_start"] for x in vals],
                    "t_end": [float(x) for vals in g["t_end"] for x in vals],
                    "atomic_facts": [str(x) for vals in g["atomic_facts"] for x in vals],
                    "n_obs": len(g),
                    "first_seen": first["sort_key"],
                }
            )
        if not rows:
            return pd.DataFrame(
                columns=["subj_id", "subj_name", "subj_label", "pred", "obj_id", "obj_name",
                         "obj_label", "t_obs", "t_start", "t_end", "atomic_facts", "n_obs",
                         "first_seen"]
            )
        out = pd.DataFrame(rows)
        out["n_obs"] = out["n_obs"].astype("int64")
        return out

    return (
        canon.map_batches(add_bucket, batch_format="pyarrow", batch_size=16384)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
