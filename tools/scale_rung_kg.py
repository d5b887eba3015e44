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


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
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
