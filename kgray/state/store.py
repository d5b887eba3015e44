"""Canonical KG store: the persisted evolving state between incremental
runs (the reference's ST4 — ``existing_knowledge_graph`` threaded run to
run, atom.py:196-208; eval harness pickles the whole KG per batch,
evaluation/latency/testing_atom.py:479-494).

Layout under ``store_dir``:
- ``edges/``       merged edge rows (full lists + first_seen) — Parquet
- ``entity_state/`` canonical (name, label, first_seen) — Parquet
- ``pred_state/``  canonical (pred, first_seen) — Parquet

A new run loads entity/predicate state into the resolution candidate set
(ranked before all new data so existing canonicals survive), unions the
stored edges into the triple merge, and saves the grown store.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa
import ray.data


@dataclass
class KGStore:
    entities: list[tuple[str, str, str]]  # (name, label, first_seen)
    predicates: list[tuple[str, str]]  # (pred, first_seen)
    edges: ray.data.Dataset | None


def save_store(edges: ray.data.Dataset, store_dir: str) -> None:
    """Persist the canonical state of a finished build.

    Entity/predicate state is derived from the edges with groupby-min
    aggregations (scales with the distinct vocabulary, not the corpus).
    """
    import pandas as pd

    edges = edges.materialize()
    edges.write_parquet(os.path.join(store_dir, "edges"))

    # per-batch pre-agg → bucketed shuffle → pandas combine (Ray's builtin
    # Min aggregate reduces per row in Python; see canonicalize's
    # _bucketed_distinct for the measurement)
    def ent_partial(b: pd.DataFrame) -> pd.DataFrame:
        subj = b[["subj_name", "subj_label", "first_seen"]].rename(
            columns={"subj_name": "name", "subj_label": "label"}
        )
        obj = b[["obj_name", "obj_label", "first_seen"]].rename(
            columns={"obj_name": "name", "obj_label": "label"}
        )
        both = pd.concat([subj, obj], ignore_index=True)
        return (
            both.groupby(["name", "label"], sort=False)["first_seen"].min().reset_index()
        )

    def bucket(cols):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            key = b[cols[0]].astype(str)
            for c in cols[1:]:
                key = key.str.cat(b[c].astype(str), sep="\x1f")
            b["bucket"] = (
                pd.util.hash_array(key.to_numpy(dtype=object)) % 64
            ).astype("int32")
            return b

        return fn

    def combine(cols):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(cols, sort=False)["first_seen"].min().reset_index()

        return fn

    (
        edges.map_batches(ent_partial, batch_format="pandas")
        .map_batches(bucket(["name", "label"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(combine(["name", "label"]), batch_format="pandas")
        .write_parquet(os.path.join(store_dir, "entity_state"))
    )

    def pred_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("pred", sort=False)["first_seen"].min().reset_index()

    (
        edges.map_batches(pred_partial, batch_format="pandas")
        .map_batches(bucket(["pred"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(combine(["pred"]), batch_format="pandas")
        .write_parquet(os.path.join(store_dir, "pred_state"))
    )


def load_store(store_dir: str) -> KGStore:
    from kgray.functions.broadcast import rows_of

    ents = rows_of(ray.data.read_parquet(os.path.join(store_dir, "entity_state")))
    preds = rows_of(ray.data.read_parquet(os.path.join(store_dir, "pred_state")))
    edges = ray.data.read_parquet(os.path.join(store_dir, "edges"))
    return KGStore(
        entities=[(r["name"], r["label"], r["first_seen"]) for r in ents],
        predicates=[(r["pred"], r["first_seen"]) for r in preds],
        edges=edges,
    )


def edges_as_canon_rows(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Stored edges → canon-format quintuple rows so they re-enter the
    triple merge: obs_date='' (their t_obs lists are already final units;
    the merge's per-date stamp dedup keys on obs_date, and '' appears at
    most once per triple since the store holds unique triples),
    sort_key=first_seen (preserves global first-seen ordering)."""

    target = pa.schema(
        [
            ("subj_name", pa.large_string()),
            ("subj_label", pa.large_string()),
            ("pred", pa.large_string()),
            ("obj_name", pa.large_string()),
            ("obj_label", pa.large_string()),
            ("t_obs", pa.list_(pa.float64())),
            ("t_start", pa.list_(pa.float64())),
            ("t_end", pa.list_(pa.float64())),
            ("atomic_facts", pa.list_(pa.large_string())),
        ]
    )

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(t)
        # parquet round-trips strings as string/list<string>; cast back to
        # the live stream's large_string layout so union block concat works
        out = t.select(target.names).cast(target)
        out = out.append_column("obs_date", pa.array([""] * n, type=pa.large_string()))
        out = out.append_column("sort_key", t["first_seen"].cast(pa.large_string()))
        # observation counts are evolving state: without this the merge
        # would reset every stored triple to n_obs=1 on re-entry
        return out.append_column("n_obs", pc.cast(t["n_obs"], pa.int64()))

    return edges.map_batches(prep, batch_format="pyarrow")
