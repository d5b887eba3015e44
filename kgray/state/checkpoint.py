"""Per-partition checkpointing with lineage for the extraction stage.

The reference checkpoints its (expensive, LLM-bound) pipeline per ingest
batch — pickling the accumulated KG and resuming from the last completed
batch (evaluation/latency/testing_atom.py:65-114,479-491).  The Ray-native
equivalent: conversations hash into ``num_partitions`` partitions; each
run processes ONLY partitions absent from the manifest, appends their
quintuples under ``out_dir/quintuples/partition_id=<k>/``, and records
per-partition lineage (row count, input fingerprint) in an atomically
written ``manifest.json``.  A crashed run leaves unfinished partition
directories that are wiped and redone on resume — writes are idempotent at
partition granularity.

Downstream (canonicalization + merge) is re-derivable from the checkpoint
and cheap relative to extraction, which is exactly the reference's split:
merge is 13% of wall time, the rest is LLM calls (README.md:117-120).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import zlib

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from kgray.config import PipelineConfig
from kgray.pipelines.kg import extract_quintuples
from kgray.stages.extract import RuleExtractor

MANIFEST = "manifest.json"


def fingerprint_input(paths: list[str]) -> str:
    h = hashlib.md5()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def _load_manifest(work_dir: str) -> dict:
    path = os.path.join(work_dir, MANIFEST)
    if os.path.exists(path):
        with open(path) as f:
            m = json.load(f)
        m.setdefault("runs", [])
        return m
    return {"input_fingerprint": None, "partitions": {}, "runs": []}


def _save_manifest(work_dir: str, manifest: dict) -> None:
    path = os.path.join(work_dir, MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def partition_of(conv_id: str, num_partitions: int) -> int:
    return zlib.crc32(conv_id.encode("utf-8")) % num_partitions


def extract_with_checkpoints(
    transcript_paths: list[str] | str,
    work_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    extractor_cls=RuleExtractor,
    extractor_kwargs: dict | None = None,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Run (or resume) checkpointed extraction; returns the full quintuple
    Dataset read back from the checkpoint directory."""
    if isinstance(transcript_paths, str):
        transcript_paths = [transcript_paths]
    os.makedirs(work_dir, exist_ok=True)
    out_dir = os.path.join(work_dir, "quintuples")

    fp = fingerprint_input(transcript_paths)
    manifest = _load_manifest(work_dir)
    if manifest["input_fingerprint"] != fp:
        # input changed → previous checkpoints are void
        manifest = {"input_fingerprint": fp, "partitions": {}, "runs": []}
        shutil.rmtree(out_dir, ignore_errors=True)

    done = {int(k) for k in manifest["partitions"]}
    todo = sorted(set(range(num_partitions)) - done)

    if todo:
        import time

        run_t0 = time.perf_counter()
        # wipe partial leftovers of unfinished partitions (idempotent redo)
        for pid in todo:
            shutil.rmtree(os.path.join(out_dir, f"partition_id={pid}"), ignore_errors=True)

        todo_set = frozenset(todo)

        def keep_todo(t: pa.Table) -> pa.Table:
            mask = [
                partition_of(c, num_partitions) in todo_set for c in t["conv_id"].to_pylist()
            ]
            return t.filter(pa.array(mask))

        transcripts = ray.data.read_parquet(transcript_paths).map_batches(
            keep_todo, batch_format="pyarrow"
        )
        quintuples = extract_quintuples(transcripts, cfg, extractor_cls, extractor_kwargs)

        def add_partition(t: pa.Table) -> pa.Table:
            pids = pa.array(
                [partition_of(c, num_partitions) for c in t["conv_id"].to_pylist()],
                type=pa.int32(),
            )
            return t.append_column("partition_id", pids)

        quintuples.map_batches(add_partition, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["partition_id"]
        )

        # record lineage from the files actually on disk
        for pid in todo:
            pdir = os.path.join(out_dir, f"partition_id={pid}")
            rows = 0
            if os.path.isdir(pdir):
                for f in os.listdir(pdir):
                    if f.endswith(".parquet"):
                        rows += pq.read_metadata(os.path.join(pdir, f)).num_rows
            else:
                os.makedirs(pdir, exist_ok=True)  # empty partition is a valid result
            manifest["partitions"][str(pid)] = {
                "rows": rows,
                "input_fingerprint": fp,
                "stage": "extract",
            }
        # per-run metrics next to the per-partition lineage
        manifest["runs"].append(
            {
                "partitions_completed": todo,
                "rows": sum(manifest["partitions"][str(p)]["rows"] for p in todo),
                "wall_sec": round(time.perf_counter() - run_t0, 3),
            }
        )
        _save_manifest(work_dir, manifest)

    return ray.data.read_parquet(out_dir)


def completed_partitions(work_dir: str) -> dict:
    return _load_manifest(work_dir)["partitions"]
