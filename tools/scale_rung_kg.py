"""KG-construction scale rung beyond the bench scaling input.

Pushes a vocab-heavy synthetic transcript corpus (default 1.2M
conversations ~= 16.8M turns, ~8k persons / 2.4k orgs -> ~31k entity
surfaces, ~0.5M distinct triples) through the FULL KG pipeline
(chunk -> extract -> normalize -> fused-distinct -> embed -> LSH match
-> distributed min-label propagation -> merge -> node derivation) with
every driver-resident-vocabulary rung DISABLED:

    driver_match_max_entities = 0      (no driver argmax)
    broadcast_match_max_entities = 0   (no broadcast candidate matrix)
    driver_edge_max = 0                (no driver union-find)
    identity_map_max_entities = 0      (no driver identity map; nodes
                                        derive from the edge stream)

i.e. the exact configuration a 10^12-turn corpus would run — the driver
never holds the vocabulary, its ranks, or its vectors (pinned by
tests/test_lsh_path.py::test_compact_map_never_pulls_vocabulary).
Object-store usage is sampled during the run; a driver==compact parity
spot-check runs first on a deterministic subsample (same generator,
small n).  Results go to stdout as one JSON line; record in BASELINE.md.

Usage: python tools/scale_rung_kg.py [n_conversations]  (default 1_200_000)

``--incremental``: the evolving-KG (ST4) rung — split the corpus into two
conversation halves, build half A (all driver-vocabulary rungs disabled),
persist the canonical store, build half B INCREMENTALLY against it
(existing canonicals seed resolution, stored edges re-enter the merge),
then verify the two-run result equals the one-shot full-corpus build
edge for edge (set equality over (subj_id, pred, obj_id, n_obs) — the
diagnostic pull to the driver is edge-table-sized, tool-only).  Reports
per-phase walls, store-directory size, and object-store peak.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import threading
import time

import ray
import ray.data


class StoreMonitor:
    """Samples object-store usage every 0.5 s via available_resources."""

    def __init__(self) -> None:
        self.total = ray.cluster_resources().get("object_store_memory", 0.0)
        self.peak = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            avail = ray.available_resources().get("object_store_memory", self.total)
            self.peak = max(self.peak, self.total - avail)
            self._stop.wait(0.5)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=2)


def _cfg(num_cpus: int, compact_rungs: bool):
    from kgray.config import PipelineConfig

    kw = dict(extract_concurrency=max(2, num_cpus // 2))
    if compact_rungs:
        kw.update(
            driver_match_max_entities=0,
            broadcast_match_max_entities=0,
            driver_edge_max=0,
            identity_map_max_entities=0,
        )
    return PipelineConfig(**kw)


def _build(path: str, concepts: dict, cfg):
    from kgray.pipelines.kg import build_kg
    from kgray.sources.transcripts import read_transcripts
    from kgray.stages.embed import HashEmbedder

    return build_kg(
        read_transcripts(path),
        cfg=cfg,
        embedder_factory=lambda: HashEmbedder(dim=cfg.embed_dim, concepts=concepts),
    )


def _half(path: str, keep_even: bool):
    """Stream-filter the cached transcript parquet to one conversation
    half by conv_id hash parity — no second corpus is written."""
    import pandas as pd

    from kgray.sources.transcripts import read_transcripts

    def f(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(b["conv_id"].to_numpy(dtype=object)) % 2
        return b[(h == 0) if keep_even else (h == 1)]

    return read_transcripts(path).map_batches(f, batch_format="pandas")


def _incremental_rung(path: str, concepts: dict, cfg, out: dict) -> None:
    import shutil

    from kgray.pipelines.kg import build_kg, save_kg_store
    from kgray.stages.embed import HashEmbedder

    emb = lambda: HashEmbedder(dim=cfg.embed_dim, concepts=concepts)
    store_dir = "/tmp/kg_rung_store"
    shutil.rmtree(store_dir, ignore_errors=True)

    with StoreMonitor() as mon:
        t0 = time.time()
        run_a = build_kg(_half(path, True), cfg=cfg, embedder_factory=emb)
        save_kg_store(run_a, store_dir)
        t1 = time.time()
        run_b = build_kg(
            _half(path, False), cfg=cfg, embedder_factory=emb,
            existing_store=store_dir,
        )
        df_inc = run_b.edges.to_pandas()
        t2 = time.time()
        one = build_kg(
            __import__("kgray.sources.transcripts", fromlist=["read_transcripts"])
            .read_transcripts(path),
            cfg=cfg,
            embedder_factory=emb,
        )
        df_one = one.edges.to_pandas()
        t3 = time.time()

    # The incremental run's representatives are half-A-first-seen while the
    # one-shot run's are global-first-seen — same CLUSTERS, possibly
    # different canonical labels.  The invariant to check is therefore the
    # edge multiset AFTER remapping both sides through the ONE-SHOT
    # resolution maps (every canonical name is itself a corpus surface, so
    # the one-shot map resolves it); n_obs must survive exactly.
    one_ent = dict(one.ent_map)  # compact: non-identity entries only
    one_pred = dict(one.pred_map)

    cmap = {
        f"{n}\x1f{l}": f"{c0}\x1f{c1}" for (n, l), (c0, c1, _) in one_ent.items()
    }

    def remap(df):
        import pandas as pd

        def side(names, labels):
            k = names.str.cat(labels, sep="\x1f")
            return k.map(cmap).fillna(k)

        s = side(df.subj_name, df.subj_label)
        o = side(df.obj_name, df.obj_label)
        p = df.pred.map(one_pred).fillna(df.pred)
        out = pd.DataFrame(
            {"k": s + "\x1e" + p + "\x1e" + o, "n_obs": df["n_obs"].to_numpy()}
        )
        return out.groupby("k", sort=True)["n_obs"].sum()

    a, b = remap(df_inc), remap(df_one)
    equal = a.sort_index().equals(b.sort_index())
    du = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(store_dir)
        for f in fs
    )
    out["incremental"] = {
        "wall_half_a_plus_store_sec": round(t1 - t0, 1),
        "wall_half_b_incremental_sec": round(t2 - t1, 1),
        "wall_one_shot_sec": round(t3 - t2, 1),
        "n_edges_incremental": int(len(df_inc)),
        "n_edges_one_shot": int(len(df_one)),
        "edge_sets_equal_incl_n_obs": bool(equal),
        "store_dir_bytes": int(du),
        "object_store_peak_gb": round(mon.peak / 2**30, 2),
    }
    assert equal, "incremental != one-shot edge set"


def main() -> None:
    incremental = "--incremental" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_convs = int(args[0]) if args else 1_200_000
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kgray.sources.testdata import (
        embedder_concepts,
        transcripts_cache_path,
        world_for,
    )

    out: dict = {"metric": "kg_scale_rung", "n_conversations": n_convs,
                 "num_cpus": num_cpus}

    # ---- parity spot-check first (small, deterministic): the default
    # driver rung and the forced fully-distributed rung must emit the
    # identical graph (same (subj_id,subj_name,pred,obj_id,obj_name)
    # edge set, same node set).
    sub_path = transcripts_cache_path(3_000)
    sub_concepts = embedder_concepts(world_for(3_000))
    g_driver = _build(sub_path, sub_concepts, _cfg(num_cpus, False))
    g_dist = _build(sub_path, sub_concepts, _cfg(num_cpus, True))
    ekey = lambda df: set(
        zip(df.subj_id, df.subj_name, df.pred, df.obj_id, df.obj_name)
    )
    e_drv, e_dst = ekey(g_driver.edges.to_pandas()), ekey(g_dist.edges.to_pandas())
    n_drv = g_driver.nodes.to_pandas()
    n_dst = g_dist.nodes.to_pandas()
    nkey = lambda df: set(zip(df.entity_id, df.name, df.label))
    assert e_drv == e_dst, "edge parity failed"
    assert nkey(n_drv) == nkey(n_dst), "node parity failed"
    out["parity_subsample"] = {
        "n_conversations": 3_000,
        "n_edges": len(e_drv),
        "n_nodes": len(n_drv),
        "equal": True,
    }

    # ---- the full rung, vocab-heavy, every driver-vocabulary rung off.
    path = transcripts_cache_path(n_convs)  # generated+cached, untimed
    world = world_for(n_convs)
    concepts = embedder_concepts(world)
    n_turns = ray.data.read_parquet(path).count()
    out["n_turns"] = int(n_turns)
    out["world"] = {"n_persons": world.n_persons, "n_orgs": world.n_orgs}

    # warm up worker processes + page cache so the rung times compute,
    # not process spawn (same protocol as bench.py)
    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        lambda b: b, batch_size=1
    ).materialize()

    if incremental:
        out["metric"] = "kg_scale_rung_incremental"
        _incremental_rung(path, concepts, _cfg(num_cpus, True), out)
        print(json.dumps(out))
        ray.shutdown()
        return

    with StoreMonitor() as mon:
        t0 = time.time()
        res = _build(path, concepts, _cfg(num_cpus, True))
        n_edges = res.edges.count()
        n_nodes = res.nodes.count()
        wall = time.time() - t0
    out["wall_sec"] = round(wall, 1)
    out["turns_per_sec"] = int(n_turns / wall)
    out["n_edges"] = int(n_edges)
    out["n_nodes"] = int(n_nodes)
    out["object_store_total_gb"] = round(mon.total / 2**30, 1)
    out["object_store_peak_gb"] = round(mon.peak / 2**30, 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
