"""Scale rung for the round-5 graph/ontology analytics.

Builds a vocab-heavy KG (default 300k conversations, the scale_rung_kg
generator/world) and drives every session-5 operator over its canonical
edge table — the BFS-family and peeling ops with their driver rungs
DISABLED (driver_edge_max=0), i.e. the fully-bucketed no-driver-state
paths a 10^12-turn corpus would run:

    betweenness_sampled(sample_mod, hops=4, driver_edge_max=0)
    harmonic_sampled(sample_mod, hops=4, driver_edge_max=0)
    ktruss(k=3, driver_edge_max=0)
    meta_path_census / path_features / neighbor_jaccard /
    degree_spectrum / transitive_audit / label_pair_census /
    reciprocity / functional_violations / predicate_redundancy /
    nobs_spectrum / entity_activity_decay / negative_samples

Per-op wall seconds + result sizes + object-store peak go to stdout as
one JSON line; record in BASELINE.md.

Usage: python tools/scale_rung_graph_ops.py [n_conversations] (default 300_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bfs_only = "--bfs-only" in sys.argv
    skip_truss = "--skip-truss" in sys.argv
    n_convs = int(args[0]) if args else 300_000
    sample_mod = int(args[1]) if len(args) > 1 else 512

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kgray.config import PipelineConfig
    from kgray.pipelines.kg import build_kg
    from kgray.sources.testdata import (
        embedder_concepts,
        transcripts_cache_path,
        world_for,
    )
    from kgray.sources.transcripts import read_transcripts
    from kgray.stages.embed import HashEmbedder

    from tools.scale_rung_kg import StoreMonitor  # reuse the 0.5s sampler

    path = transcripts_cache_path(n_convs)  # generated+cached, untimed
    concepts = embedder_concepts(world_for(n_convs))
    cfg = PipelineConfig(extract_concurrency=16)

    mon = StoreMonitor()
    mon.__enter__()

    t0 = time.perf_counter()
    res = build_kg(
        read_transcripts(path),
        cfg=cfg,
        embedder_factory=lambda: HashEmbedder(dim=cfg.embed_dim, concepts=concepts),
    )
    edges = res.edges.materialize()
    n_edges = edges.count()
    n_nodes = res.nodes.count()
    build_s = time.perf_counter() - t0

    from kgray.functions import graph as G

    timings: dict[str, float] = {}
    sizes: dict[str, int] = {}

    def timed(name, fn):
        t = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t, 2)
        sizes[name] = int(len(out))
        return out

    if bfs_only:
        timed(
            "harmonic_distributed",
            lambda: G.harmonic_sampled(
                edges, sample_mod=sample_mod, hops=4, driver_edge_max=0
            ),
        )
        timed(
            "betweenness_distributed",
            lambda: G.betweenness_sampled(
                edges, sample_mod=sample_mod, hops=4, driver_edge_max=0
            ),
        )
        mon.__exit__()
        print(json.dumps({
            "n_conversations": n_convs, "n_edges": int(n_edges),
            "n_nodes": int(n_nodes), "sample_mod": sample_mod,
            "kg_build_sec": round(build_s, 2), "ops_sec": timings,
            "ops_rows": sizes,
            "object_store_peak_gib": round(mon.peak / (1 << 30), 2),
        }))
        ray.shutdown()
        return

    timed("label_pair_census", lambda: G.label_pair_census(edges))
    timed("nobs_spectrum", lambda: G.nobs_spectrum(edges))
    timed("meta_path_census", lambda: G.meta_path_census(edges))
    timed("degree_spectrum", lambda: G.degree_spectrum(edges))
    timed("reciprocity", lambda: G.reciprocity(edges))
    timed("functional_violations", lambda: G.functional_violations(edges))
    timed("predicate_redundancy", lambda: G.predicate_redundancy(edges))
    timed("transitive_audit", lambda: G.transitive_audit(edges))
    timed("neighbor_jaccard", lambda: G.neighbor_jaccard(edges))
    timed("path_features", lambda: G.path_features(edges))
    timed("activity_decay", lambda: G.entity_activity_decay(edges))
    timed("negative_samples", lambda: G.negative_samples(edges, k=2))
    if not skip_truss:
        timed(
            "ktruss_distributed",
            lambda: G.ktruss(edges, k=3, driver_edge_max=0),
        )
    timed(
        "harmonic_distributed",
        lambda: G.harmonic_sampled(
            edges, sample_mod=sample_mod, hops=4, driver_edge_max=0
        ),
    )
    timed(
        "betweenness_distributed",
        lambda: G.betweenness_sampled(
            edges, sample_mod=sample_mod, hops=4, driver_edge_max=0
        ),
    )

    mon.__exit__()
    print(
        json.dumps(
            {
                "n_conversations": n_convs,
                "n_edges": int(n_edges),
                "n_nodes": int(n_nodes),
                "kg_build_sec": round(build_s, 2),
                "ops_sec": timings,
                "ops_rows": sizes,
                "object_store_peak_gib": round(mon.peak / (1 << 30), 2),
                "object_store_total_gib": round(mon.total / (1 << 30), 2),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
