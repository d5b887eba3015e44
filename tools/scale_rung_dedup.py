"""Scale rung beyond sf0.1 for the dedup family (VERDICT r4 #8).

Synthesizes a ~3M-document corpus deterministically (no external data),
then pushes it through ``minhash_lsh_dedup`` with ``driver_pair_max=0``
and ``driver_edge_max=0`` — i.e. the fully-distributed verify +
clustering rungs that production would use at 100 TB — while sampling
object-store usage.  A driver==distributed parity spot-check runs on a
deterministic subsample.  Results go to stdout as one JSON line; record
them in BASELINE.md.

Corpus shape: each doc is ~40 tokens drawn from a 4k-word vocabulary by
a splitmix64-seeded per-doc generator.  Docs with ``doc_id % 10 ∈ {8,9}``
are near-dups of the decade base doc (2 tokens perturbed → shingle
Jaccard ≈ 0.85), planting ~600k true near-dup members in ~300k clusters
so the verify stage carries real load.

Usage: python tools/scale_rung_dedup.py [n_docs]   (default 3_000_000)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import threading
import time

import numpy as np
import pandas as pd
import ray
import ray.data

VOCAB_N = 4096
TOKENS_PER_DOC = 40
PERTURB = 2  # tokens replaced in a planted near-dup


def _mix64(a: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — counter-based deterministic hash,
    so any pipeline that re-executes generation reproduces the corpus."""
    a = np.asarray(a, dtype=np.uint64)
    with np.errstate(over="ignore"):
        a = (a ^ (a >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        a = (a ^ (a >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return a ^ (a >> np.uint64(33))


def gen_batch(b: pd.DataFrame) -> pd.DataFrame:
    ids = b["id"].to_numpy(dtype=np.int64)
    n = len(ids)
    rem = ids % 10
    base = np.where(rem >= 8, ids - rem, ids).astype(np.uint64)
    # tokens[i, j] = mix(base_i * 64 + j) % VOCAB — one vectorized pass
    ctr = base[:, None] * np.uint64(64) + np.arange(TOKENS_PER_DOC, dtype=np.uint64)
    toks = (_mix64(ctr.ravel()) % np.uint64(VOCAB_N)).reshape(n, TOKENS_PER_DOC)
    # planted near-dups: perturb PERTURB deterministic positions
    dup = rem >= 8
    if dup.any():
        dupids = ids[dup].astype(np.uint64)
        for k in range(PERTURB):
            pos = (
                _mix64(dupids * np.uint64(8) + np.uint64(k))
                % np.uint64(TOKENS_PER_DOC)
            ).astype(np.int64)
            val = _mix64(dupids * np.uint64(8) + np.uint64(4 + k)) % np.uint64(VOCAB_N)
            rows = np.flatnonzero(dup)
            toks[rows, pos] = val
    flat = toks.ravel()
    words = np.char.add("w", flat.astype("U4"))
    texts = [" ".join(row) for row in words.reshape(n, TOKENS_PER_DOC)]
    return pd.DataFrame({"doc_id": ids, "text": texts})


def corpus(n_docs: int, blocks: int) -> ray.data.Dataset:
    return ray.data.range(n_docs, override_num_blocks=blocks).map_batches(
        gen_batch, batch_format="pandas", batch_size=50_000
    )


class StoreMonitor:
    """Samples object-store usage every 0.5 s via available_resources."""

    def __init__(self) -> None:
        total = ray.cluster_resources().get("object_store_memory", 0.0)
        self.total = total
        self.peak = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            avail = ray.available_resources().get("object_store_memory", self.total)
            used = self.total - avail
            if used > self.peak:
                self.peak = used
            self._stop.wait(0.5)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=2)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from kgray.ops.dedup import minhash_lsh_dedup

    blocks = 128
    out: dict = {"metric": "dedup_scale_rung", "n_docs": n_docs}

    # ---- parity spot-check first (small, deterministic): driver rung vs
    # the forced fully-distributed rung must agree bit-for-bit.
    sub = corpus(30_000, 8).materialize()
    m_driver = (
        minhash_lsh_dedup(sub)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    m_dist = (
        minhash_lsh_dedup(sub, driver_pair_max=0, driver_edge_max=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(m_driver, m_dist)
    n_merged_sub = int((m_driver["doc_id"] != m_driver["canonical_id"]).sum())
    out["parity_subsample"] = {"n_docs": 30_000, "n_merged": n_merged_sub, "equal": True}

    # ---- the full rung, fully distributed, consumed as an aggregate
    # (never materialized to the driver).
    ds = corpus(n_docs, blocks)
    with StoreMonitor() as mon:
        t0 = time.time()
        mapping = minhash_lsh_dedup(ds, driver_pair_max=0, driver_edge_max=0)
        import pyarrow.compute as pc

        def count_merged(t):
            import pyarrow as pa

            k = pc.sum(
                pc.cast(pc.not_equal(t["doc_id"], t["canonical_id"]), pa.int64())
            ).as_py()
            return pa.table({"merged": [k or 0], "rows": [t.num_rows]})

        agg = (
            mapping.map_batches(count_merged, batch_format="pyarrow")
            .to_pandas()
            .sum()
        )
        wall = time.time() - t0
    out["wall_sec"] = round(wall, 1)
    out["docs_per_sec"] = int(n_docs / wall)
    out["n_rows_out"] = int(agg["rows"])
    out["n_merged"] = int(agg["merged"])
    out["planted_dup_members"] = int(sum(1 for r in (8, 9) if r < 10) * (n_docs // 10))
    out["object_store_total_gb"] = round(mon.total / 2**30, 1)
    out["object_store_peak_gb"] = round(mon.peak / 2**30, 2)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
