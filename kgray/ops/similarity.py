"""Similarity search over an embedding column (list<float>).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is tiny and
  broadcast once (``ray.put``); every corpus block does one float64 matmul
  against it inside ``map_batches``; per-block top-k partials are reduced
  driver-side (k × #queries rows, trivially small).  This is the baseline
  and the oracle-checkable path.
- :func:`knn_lsh` — scale path: random-hyperplane bucketing of the corpus;
  each query probes only its bucket (and optionally neighbor buckets).
  Approximate; recall measured against the brute-force baseline in tests.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray
import ray.data


def _unit(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


class _BlockKnn:
    """Per-block exact top-k against the broadcast query matrix (fetched
    once per actor, zero-copy)."""

    def __init__(self, queries_ref, k: int):
        self.qids, qmat = ray.get(queries_ref)
        self.qunit = _unit(qmat)
        self.k = k

    def __call__(self, batch: dict) -> pd.DataFrame:
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        unit = _unit(mat)
        sims = self.qunit @ unit.T  # (Q, B)
        k = min(self.k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        # per-query block-local top-k (partial; reduced on the driver)
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        for qi, qid in enumerate(self.qids):
            for j in top[qi]:
                out_q.append(qid)
                out_n.append(ids[j])
                out_s.append(sims[qi, j])
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
        )


def knn_bruteforce(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k for each query over the full corpus.

    Returns (query_id, neighbor_id, cosine, rank) with rank 1..k, ties
    broken by neighbor_id (deterministic, matches the SQL oracle's
    ORDER BY cosine DESC, neighbor_id)."""
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), query_mat))
    partials = embeddings.map_batches(
        _BlockKnn,
        fn_constructor_kwargs={"queries_ref": ref, "k": k + (1 if exclude_self else 0)},
        batch_format="numpy",
        batch_size=8192,
        concurrency=2,
    ).to_pandas()

    rows = []
    for qid, g in partials.groupby("query_id"):
        if exclude_self:
            g = g[g["neighbor_id"] != qid]
        best = heapq.nsmallest(k, g.itertuples(), key=lambda r: (-r.cosine, r.neighbor_id))
        for rank, r in enumerate(best, 1):
            rows.append((qid, r.neighbor_id, round(r.cosine, 6), rank))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine", "rank"]).sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def knn_lsh(
    embeddings: ray.data.Dataset,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 17,
) -> pd.DataFrame:
    """Approximate top-k: sign-bucket the corpus with random hyperplanes;
    each query searches only matching buckets (multi-probe: exact bucket +
    1-bit flips).  IVF-style candidate bounding for the 100 TB regime."""
    dim = query_mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    def bucketize(batch: dict) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        codes = (mat @ pl > 0).astype(np.uint8)
        bucket = (codes * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.DataFrame(
            {
                "vec_id": np.asarray(batch["vec_id"], dtype=np.int64),
                "bucket": bucket.astype("int64"),
                "embedding": list(mat),
            }
        )

    corpus = embeddings.map_batches(bucketize, batch_format="numpy").to_pandas()
    by_bucket = dict(tuple(corpus.groupby("bucket")))

    qunit = _unit(query_mat)
    qcodes = (query_mat.astype(np.float64) @ planes > 0).astype(np.uint8)
    qbuckets = (qcodes * (1 << np.arange(n_planes))).sum(axis=1)

    rows = []
    for qi, qid in enumerate(np.asarray(query_ids, dtype=np.int64)):
        probes = [int(qbuckets[qi])] + [int(qbuckets[qi]) ^ (1 << b) for b in range(n_planes)]
        cand = pd.concat([by_bucket[b] for b in probes if b in by_bucket], ignore_index=True)
        cand = cand[cand["vec_id"] != qid]
        if cand.empty:
            continue
        unit = _unit(np.stack(cand["embedding"].to_numpy()))
        sims = unit @ qunit[qi]
        order = np.lexsort((cand["vec_id"].to_numpy(), -sims))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((int(qid), int(cand["vec_id"].iloc[j]), round(float(sims[j]), 6), rank))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine", "rank"])
