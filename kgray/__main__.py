"""Job entrypoint: ``python -m kgray`` — the ``ray job submit`` surface.

On a real cluster the flagship pipeline launches as

    ray job submit --working-dir . -- python -m kgray \
        --input s3://bucket/transcripts/ --out s3://bucket/kg/ \
        --checkpoint-dir s3://bucket/ckpt/ --store s3://bucket/store/

The module never owns the Ray session when one already exists (``ray job
submit`` / the driver harness initialize it); standalone it starts a
local session and shuts it down on exit.

Stages (all optional except input→out):
  extraction    direct, or per-partition checkpointed (``--checkpoint-dir``:
                resumable, lineage + metrics in manifest.json)
  resolution    fresh, or incremental against ``--store`` (previous run's
                canonical state; pass ``--save-store`` to update it)
  materialize   nodes/edges Parquet under ``--out``
  export        ``--export-neo4j-csv`` / ``--export-cypher`` directories

Prints one JSON line of run metrics (turns, nodes, edges, wall seconds)
to stdout — the per-run metrics record the north star asks to sit next to
the per-partition lineage.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import ray


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m kgray", description="Ray-Data KG construction over transcript Parquet"
    )
    p.add_argument("--input", required=True, nargs="+", help="transcript Parquet file(s)/dir(s)")
    p.add_argument("--out", required=True, help="output dir for nodes/ + edges/ Parquet")
    p.add_argument("--checkpoint-dir", help="per-partition extraction checkpoint dir (resumable)")
    p.add_argument("--num-partitions", type=int, default=16, help="checkpoint partition count")
    p.add_argument("--store", help="existing canonical store dir (incremental build)")
    p.add_argument("--save-store", help="write/update the canonical store at this dir")
    p.add_argument("--export-neo4j-csv", help="also export neo4j-admin bulk-import CSVs here")
    p.add_argument("--export-cypher", help="also export Cypher MERGE statement shards here")
    p.add_argument("--ent-threshold", type=float, default=None)
    p.add_argument("--rel-threshold", type=float, default=None)
    p.add_argument("--max-chunk-chars", type=int, default=None)
    p.add_argument("--extract-concurrency", type=int, default=None)
    p.add_argument("--embed-dim", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> dict:
    args = _build_parser().parse_args(argv)

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        return _run(args)
    finally:
        if owns_ray:
            ray.shutdown()


def _run(args) -> dict:
    import ray.data

    from kgray.config import PipelineConfig
    from kgray.pipelines.kg import build_kg, save_kg_store, write_kg

    t0 = time.perf_counter()
    cfg_kwargs = {
        k: v
        for k, v in {
            "ent_threshold": args.ent_threshold,
            "rel_threshold": args.rel_threshold,
            "max_chunk_chars": args.max_chunk_chars,
            "extract_concurrency": args.extract_concurrency,
            "embed_dim": args.embed_dim,
        }.items()
        if v is not None
    }
    cfg = PipelineConfig(**cfg_kwargs)

    transcripts = None
    chunks = None
    quintuples = None
    if args.checkpoint_dir:
        from kgray.state.checkpoint import extract_with_checkpoints

        quintuples = extract_with_checkpoints(
            args.input, args.checkpoint_dir, cfg=cfg, num_partitions=args.num_partitions
        )
    else:
        transcripts = ray.data.read_parquet(args.input)

    result = build_kg(
        transcripts,
        cfg=cfg,
        existing_store=args.store,
        chunks=chunks,
        quintuples=quintuples,
    )

    write_kg(result, args.out)
    if args.save_store:
        save_kg_store(result, args.save_store)
    if args.export_neo4j_csv or args.export_cypher:
        from kgray.sinks import neo4j as neo4j_sink

        nodes = ray.data.read_parquet(f"{args.out}/nodes")
        edges = ray.data.read_parquet(f"{args.out}/edges")
        if args.export_neo4j_csv:
            neo4j_sink.export_admin_csv(nodes, edges, args.export_neo4j_csv)
        if args.export_cypher:
            neo4j_sink.export_cypher(nodes, edges, args.export_cypher)

    n_nodes = result.nodes.count()
    n_edges = result.edges.count()
    wall = round(time.perf_counter() - t0, 3)
    metrics = {
        "nodes": int(n_nodes),
        "edges": int(n_edges),
        "wall_sec": wall,
        "out": args.out,
        "checkpointed": bool(args.checkpoint_dir),
        "incremental": bool(args.store),
    }
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
