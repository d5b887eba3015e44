"""Exact set-similarity self-join (AllPairs/PPJoin-style prefix filter).

The MinHash path (ops/dedup.py) is probabilistic — banding can miss a
true pair and the verify score is an estimate.  This operator is the
EXACT counterpart: every document pair whose distinct-shingle-set
Jaccard clears the threshold, with full recall, via the prefix-filter
lemma (Bayardo et al., "Scaling Up All Pairs Similarity Search",
WWW'07): under ANY consistent global token order, two sets with
J(A,B) ≥ t share their first common token within the first
|X| − ceil(t·|X|) + 1 tokens of BOTH sets — so indexing only those
prefixes loses no qualifying pair.

Token order here is the shingle HASH ascending: a uniform random-but-
consistent order that needs NO global state (a document-frequency
rarity order — the classic candidate-count optimization — would need a
vocabulary-sized broadcast; shingle df is near-1 for prose corpora, so
hash order buys the same behavior for free.  Plug a df-rank order
upstream if the token universe is skewed, e.g. unigram bags).

Scale shape:
- one actor-pool pass shingles + hashes each doc (md5-lower-64, the
  DuckDB-reproducible convention) and emits (doc, sorted hash array,
  size) signature rows plus prefix (hash, doc, size) index rows;
- candidates form inside hash super-buckets (ONE shuffle): per shingle
  hash, all doc pairs passing the min ≥ t·max size filter;
- verification never lands pairs on the driver past
  ``driver_pair_max``: the same two reduce-side attach rounds as
  ops/dedup.py's distributed verify ship each pair through hash(a) /
  hash(b) buckets alongside the signature stream and compute the exact
  sorted-array intersection where the pair lands.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kgray.ops.dedup import MinHasher, _md5_u64_np, _mix64


def _prefix_len(size: int, threshold: float) -> int:
    return size - math.ceil(threshold * size) + 1


def set_similarity_join(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    shingle_n: int = 3,
    driver_pair_max: int = 2_000_000,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """All (a, b, jaccard) doc pairs with distinct-``shingle_n``-shingle
    Jaccard ≥ ``threshold`` (a < b), exact — no LSH recall bound."""
    mh = MinHasher(shingle_n=shingle_n)

    def sig_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype=np.int64)
        texts = b["text"].tolist()
        sigs, sizes = [], np.empty(len(b), dtype=np.int64)
        for i, t in enumerate(texts):
            h = np.unique(_md5_u64_np(sorted(mh._shingles(t))))
            sigs.append(h.tobytes())
            sizes[i] = len(h)
        return pd.DataFrame({"doc_id": ids, "payload": sigs, "size": sizes})

    sigs = docs.map_batches(sig_rows, batch_format="pandas").materialize()

    def prefix_rows(b: pd.DataFrame) -> pd.DataFrame:
        hs, ds, ss = [], [], []
        for doc, payload, size in zip(b["doc_id"], b["payload"], b["size"]):
            h = np.frombuffer(payload, dtype=np.uint64)
            p = _prefix_len(int(size), threshold)
            hs.append(h[:p])
            ds.append(np.full(p, doc, dtype=np.int64))
            ss.append(np.full(p, size, dtype=np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        return pd.DataFrame(
            {
                "sb": (h % np.uint64(num_buckets)).astype("int32"),
                "h": h,
                "doc_id": np.concatenate(ds) if ds else np.empty(0, np.int64),
                "size": np.concatenate(ss) if ss else np.empty(0, np.int64),
            }
        )

    def pairs_in_super(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
        )
        counts = g["h"].value_counts()
        g = g[g["h"].isin(counts.index[counts >= 2])]
        if g.empty:
            return empty
        frames = []
        for _, grp in g.groupby("h", sort=False):
            grp = grp.sort_values("doc_id", kind="mergesort")
            ids = grp["doc_id"].to_numpy()
            sz = grp["size"].to_numpy(dtype=np.float64)
            ai, bi = np.triu_indices(len(ids), k=1)
            lo = np.minimum(sz[ai], sz[bi])
            hi = np.maximum(sz[ai], sz[bi])
            # prune only when min/max < t is CERTAIN (epsilon guards the
            # float compare — a kept false positive dies in verify, a
            # dropped true pair would break exactness)
            keep = lo / hi >= threshold - 1e-12
            frames.append(pd.DataFrame({"a": ids[ai[keep]], "b": ids[bi[keep]]}))
        out = pd.concat(frames, ignore_index=True).drop_duplicates()
        return out if len(out) else empty

    pairs_ds = (
        sigs.map_batches(prefix_rows, batch_format="pandas")
        .groupby("sb")
        .map_groups(pairs_in_super, batch_format="pandas")
        .materialize()
    )
    n_pairs = pairs_ds.count()
    empty_out = pd.DataFrame(
        {
            "a": pd.Series(dtype="int64"),
            "b": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64"),
        }
    )
    if n_pairs == 0:
        return empty_out

    if n_pairs <= driver_pair_max:
        pairs = pairs_ds.to_pandas().drop_duplicates(subset=["a", "b"])
        cand_ids = set(pairs["a"].tolist()) | set(pairs["b"].tolist())
        ids_ref = ray.put(cand_ids)

        def filt(b: pd.DataFrame) -> pd.DataFrame:
            from kgray.functions.broadcast import cached_get

            return b[b["doc_id"].isin(cached_get(ids_ref))]

        cand = sigs.map_batches(filt, batch_format="pandas").to_pandas()
        set_of = {
            int(d): np.frombuffer(p, dtype=np.uint64)
            for d, p in zip(cand["doc_id"], cand["payload"])
        }
        a = pairs["a"].to_numpy(dtype=np.int64)
        b = pairs["b"].to_numpy(dtype=np.int64)
        jac = np.empty(len(pairs))
        for i in range(len(pairs)):
            sa, sb = set_of[int(a[i])], set_of[int(b[i])]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            jac[i] = inter / (len(sa) + len(sb) - inter)
        keep = jac >= threshold
        out = pd.DataFrame(
            {
                "a": a[keep],
                "b": b[keep],
                "jaccard": np.floor(jac[keep] * 1e6 + 0.5) / 1e6,
            }
        )
    else:
        out = _verify_exact_distributed(
            pairs_ds, sigs, threshold, num_buckets=num_buckets
        ).to_pandas()
        if "a" not in out.columns:
            return empty_out
    return out.sort_values(["a", "b"], kind="mergesort").reset_index(drop=True)


def _verify_exact_distributed(
    pairs: ray.data.Dataset,
    sigs: ray.data.Dataset,
    threshold: float,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Exact-intersection verification without a driver-resident pair
    set: round 1 co-locates pairs with endpoint ``a``'s sorted hash
    array in hash(a) buckets; round 2 re-buckets on hash(b), attaches
    the second array, intersects, and filters.  The sibling of
    ops/dedup.py::_verify_pairs_distributed with exact sets instead of
    minhash signatures."""

    def sig_side(b: pd.DataFrame) -> pd.DataFrame:
        doc = b["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "bucket": (_mix64(doc.astype(np.uint64)) % np.uint64(num_buckets)).astype("int32"),
                "kind": np.zeros(len(b), dtype=np.int8),
                "a": doc,
                "b": np.full(len(b), -1, dtype=np.int64),
                "payload": b["payload"].tolist(),
            }
        )

    def pair_side(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "bucket": (_mix64(a.astype(np.uint64)) % np.uint64(num_buckets)).astype("int32"),
                "kind": np.ones(len(b), dtype=np.int8),
                "a": a,
                "b": b["b"].to_numpy(dtype=np.int64),
                "payload": [b""] * len(b),
            }
        )

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "bucket": pd.Series(dtype="int32"),
                "kind": pd.Series(dtype="int8"),
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "payload": pd.Series(dtype=object),
            }
        )
        p = g[g["kind"] == 1].drop_duplicates(subset=["a", "b"])
        if not len(p):
            return empty
        sig_of = dict(zip(g.loc[g["kind"] == 0, "a"], g.loc[g["kind"] == 0, "payload"]))
        bv = p["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "bucket": (_mix64(bv.astype(np.uint64)) % np.uint64(num_buckets)).astype("int32"),
                "kind": np.full(len(p), 2, dtype=np.int8),
                "a": p["a"].to_numpy(dtype=np.int64),
                "b": bv,
                "payload": [sig_of[int(a)] for a in p["a"]],
            }
        )

    def attach_b(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
        p = g[g["kind"] == 2]
        if not len(p):
            return empty
        sig_of = dict(zip(g.loc[g["kind"] == 0, "a"], g.loc[g["kind"] == 0, "payload"]))
        a = p["a"].to_numpy(dtype=np.int64)
        b = p["b"].to_numpy(dtype=np.int64)
        jac = np.empty(len(p))
        for i, (pa_, bb) in enumerate(zip(p["payload"], b)):
            sa = np.frombuffer(pa_, dtype=np.uint64)
            sb = np.frombuffer(sig_of[int(bb)], dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            jac[i] = inter / (len(sa) + len(sb) - inter)
        keep = jac >= threshold
        return pd.DataFrame(
            {
                "a": a[keep],
                "b": b[keep],
                "jaccard": np.floor(jac[keep] * 1e6 + 0.5) / 1e6,
            }
        )

    tagged = sigs.map_batches(sig_side, batch_format="pandas").union(
        pairs.map_batches(pair_side, batch_format="pandas")
    )
    round1 = tagged.groupby("bucket").map_groups(attach_a, batch_format="pandas")
    # sig_side buckets on hash(doc) == hash(b) for round 2's attach
    tagged2 = sigs.map_batches(sig_side, batch_format="pandas").union(round1)
    return tagged2.groupby("bucket").map_groups(attach_b, batch_format="pandas")
