"""Entity & predicate canonicalization — the distributed core.

Reference semantics reproduced (itext2kg/atom/graph_matching/matcher.py):
1. exact `(name,label)` equality first (:41-63) — here that is simply the
   distinct-entity groupby: all exact duplicates collapse before any
   embedding work (the dedup-before-embed of knowledge_graph.py:26-27);
2. embedding match: best cosine against the candidate set, accepted iff
   ``score >= threshold`` (:65-94, θ_E=0.8); predicates likewise renamed at
   ``>= θ_R=0.7`` (:105-153);
3. transitive closure of matches → canonical representative (the
   reference reaches this fixed point through its pairwise merge tree,
   atom.py:55-84; we compute it directly with union-find over match edges,
   ranking representatives by first-seen order so the earlier surface form
   survives, as in merge_two_kgs where the accumulated side wins).

Scale design:
- The expensive O(N·M·D) cosine matching runs *only on the distinct
  entity set* (a groupby collapses the raw mention stream first), and is
  parallelized as ``map_batches`` blocks against a **broadcast** candidate
  matrix (``ray.put`` once, read per actor — never re-shipped per batch).
- Above ``broadcast_match_max_entities`` the candidate set no longer fits a
  broadcast; the LSH path buckets embeddings by random-hyperplane band
  signatures and matches within buckets (bounded candidate sets, hot
  buckets split by salt).  See ``match_edges_lsh``.
- The match-edge list is ≤ #distinct entities, so union-find runs on the
  driver; min-label propagation via iterative groupby is the documented
  escape hatch beyond that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from kgray.config import PipelineConfig
from kgray.functions.broadcast import auto_concurrency, rows_of
from kgray.functions.normalize import entity_id_py
from kgray.stages.embed import EntityEmbedderStage
from kgray.state.unionfind import cluster_representatives


def _bucketed_distinct(
    partial_fn, key_cols: list[str], num_buckets: int = 64, arrow: bool = False
):
    """partial per-BLOCK pre-agg → hash-bucketed shuffle → vectorized
    pandas combine per bucket.  Ray's built-in Sum/Min aggregate combines
    rows one-by-one in Python (measured 318s on a 1.4M-row partial stream);
    this pattern keeps every reduction a C-speed kernel.

    ``arrow=True``: the partial is a zero-copy ``pa.Table → pa.Table``
    kernel (``batch_size=None`` = one whole block per call, no slicing or
    pandas conversion of untouched columns — measured 8.5x faster than the
    pandas partial on quintuple blocks, whose list columns dominated the
    conversion).  The bucket/combine stages run on the ALREADY-collapsed
    partial rows (vocabulary-sized), where pandas is cheap."""

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        key = b[key_cols[0]].astype(str)
        for c in key_cols[1:]:
            key = key.str.cat(b[c].astype(str), sep="\x1f")
        b["bucket"] = (pd.util.hash_array(key.to_numpy(dtype=object)) % num_buckets).astype("int32")
        return b

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(key_cols, sort=False)
            .agg(n_mentions=("n_mentions", "sum"), first_seen=("first_seen", "min"))
            .reset_index()
        )
        out["n_mentions"] = out["n_mentions"].astype("int64")
        return out

    def run(ds: ray.data.Dataset) -> ray.data.Dataset:
        if arrow:
            partials = ds.map_batches(partial_fn, batch_format="pyarrow", batch_size=None)
        else:
            partials = ds.map_batches(partial_fn, batch_format="pandas", batch_size=262144)
        return (
            partials.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket")
            .map_groups(combine, batch_format="pandas")
        )

    return run


def _vocab_partial_arrow(t: "pa.Table") -> "pa.Table":
    """Fused entity+predicate vocabulary partial, zero-copy Arrow:
    group_by over (name, label) for both entity slots plus the predicate
    surface, one (kind, name, label, n_mentions, first_seen) row per key
    per block."""
    import pyarrow as pa  # worker-local

    ents = pa.concat_tables(
        [
            pa.table(
                {"name": t["subj_name"], "label": t["subj_label"], "sort_key": t["sort_key"]}
            ),
            pa.table(
                {"name": t["obj_name"], "label": t["obj_label"], "sort_key": t["sort_key"]}
            ),
        ]
    )
    ge = ents.group_by(["name", "label"]).aggregate(
        [("sort_key", "min"), ("sort_key", "count")]
    )
    gp = (
        pa.table({"name": t["pred"], "sort_key": t["sort_key"]})
        .group_by(["name"])
        .aggregate([("sort_key", "min"), ("sort_key", "count")])
    )
    ge2 = pa.table(
        {
            "kind": pa.array(["e"] * len(ge), type=pa.large_string()),
            "name": ge["name"],
            "label": ge["label"],
            "first_seen": ge["sort_key_min"],
            "n_mentions": ge["sort_key_count"],
        }
    )
    gp2 = pa.table(
        {
            "kind": pa.array(["p"] * len(gp), type=pa.large_string()),
            "name": gp["name"],
            "label": pa.array([""] * len(gp), type=ge2["label"].type),
            "first_seen": gp["sort_key_min"],
            "n_mentions": gp["sort_key_count"],
        }
    )
    return pa.concat_tables([ge2, gp2])


def distinct_entities(raw: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (name,label) with mention count and first-seen sort key.

    Pre-aggregated inside ``map_batches`` (one partial row per key per
    block, zero-copy Arrow group_by) before the bucketed shuffle, so the
    all-to-all exchange moves the vocabulary, not the mention stream — the
    reference's exact-match pass (matcher.py:41-63) and set-dedup
    (knowledge_graph.py:26-27) in one (small) shuffle.
    """

    def partial(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa  # worker-local

        ents = pa.concat_tables(
            [
                pa.table(
                    {"name": t["subj_name"], "label": t["subj_label"], "sort_key": t["sort_key"]}
                ),
                pa.table(
                    {"name": t["obj_name"], "label": t["obj_label"], "sort_key": t["sort_key"]}
                ),
            ]
        )
        g = ents.group_by(["name", "label"]).aggregate(
            [("sort_key", "min"), ("sort_key", "count")]
        )
        # select by NAME: pyarrow's key-vs-aggregate column ordering has
        # differed across release lines; positional renames would silently
        # swap min/count there
        return pa.table(
            {
                "name": g["name"],
                "label": g["label"],
                "first_seen": g["sort_key_min"],
                "n_mentions": g["sort_key_count"],
            }
        )

    return _bucketed_distinct(partial, ["name", "label"], arrow=True)(raw)


def distinct_predicates(raw: ray.data.Dataset) -> ray.data.Dataset:
    def partial(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa  # worker-local

        g = (
            t.select(["pred", "sort_key"])
            .group_by(["pred"])
            .aggregate([("sort_key", "min"), ("sort_key", "count")])
        )
        return pa.table(
            {
                "pred": g["pred"],
                "first_seen": g["sort_key_min"],
                "n_mentions": g["sort_key_count"],
            }
        )

    return _bucketed_distinct(partial, ["pred"], arrow=True)(raw)


class _BlockMatcher:
    """map_batches actor: match each block row against the broadcast
    candidate matrix; emit (key_a, key_b) for best-cosine >= threshold.

    The candidate matrix is fetched from the object store once per actor
    (zero-copy numpy view), not per batch.
    """

    def __init__(self, candidates_ref, threshold: float):
        keys, mat = ray.get(candidates_ref)
        self.keys = keys
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        self.mat_unit = (mat / norms[:, None]).astype(np.float32)
        self.key_to_idx = {k: i for i, k in enumerate(keys)}
        self.threshold = threshold

    def __call__(self, batch: dict) -> dict:
        vecs = np.asarray(batch["vec"], dtype=np.float32)
        if vecs.ndim == 1:  # single row edge case
            vecs = vecs[None, :]
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        q = vecs / norms[:, None]
        sims = q @ self.mat_unit.T  # (B, M)
        out_a, out_b = [], []
        if "label" in batch:
            keys_a = list(zip(batch["name"].tolist(), batch["label"].tolist()))
        else:
            keys_a = [(p,) for p in batch["name"].tolist()]
        for i, key in enumerate(keys_a):
            row = sims[i]
            self_idx = self.key_to_idx.get(key)
            if self_idx is not None:
                row = row.copy()
                row[self_idx] = -np.inf
            j = int(np.argmax(row))
            if row[j] >= self.threshold:
                out_a.append("\x1f".join(key))
                out_b.append("\x1f".join(self.keys[j]))
        return {"a": np.array(out_a, dtype=object), "b": np.array(out_b, dtype=object)}


def _match_edges_broadcast(
    distinct_embedded: ray.data.Dataset,
    keys: list[tuple],
    mat: np.ndarray,
    threshold: float,
    concurrency: int | None = None,
) -> list[tuple[tuple, tuple]]:
    if concurrency is None:
        # the matcher runs as its own execution (nothing else competes),
        # so size the pool to the cluster minus headroom for the feed
        concurrency = max(2, min(16, int(ray.cluster_resources().get("CPU", 8)) - 2))
    ref = ray.put((keys, mat))
    pairs_ds = distinct_embedded.map_batches(
        _BlockMatcher,
        fn_constructor_kwargs={"candidates_ref": ref, "threshold": threshold},
        batch_format="numpy",
        batch_size=4096,
        concurrency=concurrency,
    )
    pairs = rows_of(pairs_ds)
    return [
        (tuple(p["a"].split("\x1f")), tuple(p["b"].split("\x1f"))) for p in pairs
    ]


def _lsh_planes(dim: int, n_bands: int, bits: int) -> list[np.ndarray]:
    """Deterministic seeded hyperplanes — identical on every worker."""
    import hashlib as _h

    planes = []
    for band in range(n_bands):
        seed = int.from_bytes(_h.md5(f"kgray-lsh|{band}".encode()).digest()[:8], "little")
        planes.append(np.random.default_rng(seed).standard_normal((dim, bits)))
    return planes


# worker-local plane cache: dim comes from the ACTUAL vectors (an injected
# embedder may not match cfg.embed_dim), so planes are built lazily on
# first touch per (dim, bands, bits) and reused across batches
_PLANES_CACHE: dict = {}


def _lsh_planes_cached(dim: int, n_bands: int, bits: int) -> list[np.ndarray]:
    key = (dim, n_bands, bits)
    p = _PLANES_CACHE.get(key)
    if p is None:
        p = _PLANES_CACHE[key] = _lsh_planes(dim, n_bands, bits)
    return p


def match_edges_lsh_ds(
    distinct_embedded: ray.data.Dataset,
    threshold: float,
    cfg: PipelineConfig,
    max_bucket: int = 512,
) -> ray.data.Dataset:
    """Scale path: random-hyperplane band LSH bucketing, then within-bucket
    cosine matching — bounds the candidate set so no broadcast of the full
    matrix is needed, and the match-edge stream STAYS a Dataset (the caller
    chooses driver union-find or distributed label propagation).

    Each entity is routed to ``lsh_n_bands`` buckets (one per band of
    ``lsh_band_bits`` hyperplane sign bits, deterministic seeded planes); a
    within-bucket pair with cosine >= threshold yields a match edge, and
    union-find / label propagation closes the clusters.  Recall for cos>=0.8
    with 16 bands x 8 bits is ~0.94 per pair (≈1.0 for the ~0.94-cosine
    surface variants the thresholds were calibrated on).  Buckets larger
    than ``max_bucket`` are deterministically truncated (sorted by
    first_seen) — the skew guard for degenerate embedding spaces; truncation
    counts are carried in the ``truncated`` column for observability.
    """
    n_bands, bits = cfg.lsh_n_bands, cfg.lsh_band_bits
    pow2 = 1 << np.arange(bits)

    def bucketize(batch: dict) -> pd.DataFrame:
        vecs = np.asarray(batch["vec"], dtype=np.float32)
        n = len(vecs)
        planes = _lsh_planes_cached(vecs.shape[1], n_bands, bits)
        buckets = np.empty((n_bands, n), dtype=object)
        for band in range(n_bands):
            packed = ((vecs @ planes[band] > 0) * pow2).sum(axis=1)
            buckets[band] = np.char.add(f"{band}:", packed.astype("U8")).astype(object)
        return pd.DataFrame(
            {
                "bucket": buckets.reshape(-1),
                "name": np.tile(np.asarray(batch["name"], dtype=object), n_bands),
                "label": np.tile(np.asarray(batch["label"], dtype=object), n_bands),
                "first_seen": np.tile(np.asarray(batch["first_seen"], dtype=object), n_bands),
                "vec": list(vecs) * n_bands,
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("first_seen", kind="mergesort")
        truncated = max(0, len(g) - max_bucket)
        g = g.head(max_bucket)
        mat = np.stack(g["vec"].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        ai, bi = np.triu_indices(len(g), k=1)
        keep = sims[ai, bi] >= threshold
        names = g["name"].to_numpy()
        labels = g["label"].to_numpy()
        return pd.DataFrame(
            {
                "a": [f"{names[i]}\x1f{labels[i]}" for i in ai[keep]],
                "b": [f"{names[j]}\x1f{labels[j]}" for j in bi[keep]],
                "truncated": truncated,
            }
        )

    return (
        distinct_embedded.map_batches(bucketize, batch_format="numpy")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def _warn_lsh_truncation(pairs_ds: ray.data.Dataset, max_bucket: int = 512) -> None:
    """Observability for the skew guard: surface how many candidate rows
    the per-bucket truncation dropped (a distributed partial sum — the
    pair set may be large on the label-propagation path)."""

    def partial_sum(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"t": [int(b["truncated"].sum())]})

    total = int(
        pairs_ds.select_columns(["truncated"])
        .map_batches(partial_sum, batch_format="pandas")
        .to_pandas()["t"]
        .sum()
    )
    if total > 0:
        import logging

        logging.getLogger(__name__).warning(
            "LSH buckets truncated %d candidate rows (max_bucket=%d)", total, max_bucket
        )


def _match_edges_driver(keys: list[tuple], mat: np.ndarray, threshold: float,
                        block: int = 1024, n_query: int | None = None) -> list[tuple[tuple, tuple]]:
    """Driver-side twin of the broadcast matcher for small distinct sets:
    same >= threshold argmax semantics, blockwise so memory stays bounded.

    ``n_query``: only the first n_query keys act as queries (incremental
    runs match NEW surfaces against the full candidate set but never remap
    existing canonicals, mirroring matcher.py where only entities_1 is
    matched)."""
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = (mat / norms[:, None]).astype(np.float32)
    edges = []
    n = len(keys) if n_query is None else n_query
    for start in range(0, n, block):
        stop = min(start + block, n)
        sims = unit[start:stop] @ unit.T
        for i in range(sims.shape[0]):
            sims[i, start + i] = -np.inf
        best = np.argmax(sims, axis=1)
        scores = sims[np.arange(sims.shape[0]), best]
        for i in np.nonzero(scores >= threshold)[0]:
            edges.append((keys[start + i], keys[int(best[i])]))
    return edges


def _resolve_entities_driver(
    rows: list[dict],
    cfg: PipelineConfig,
    embedder_factory,
    existing_ranked: list[tuple[tuple, str]],
) -> dict:
    """Driver-side entity resolution over a small distinct vocabulary:
    embed, blockwise >= threshold argmax match, union-find, id assignment."""
    keys = [(r["name"], r["label"]) for r in rows]
    n_query = len(keys)
    ranks = {k: r["first_seen"] for k, r in zip(keys, rows)}
    seen = set(keys)
    for k, rank in existing_ranked:
        if k not in ranks or rank < ranks[k]:
            ranks[k] = rank
        if k not in seen:
            seen.add(k)
            keys.append(k)
    if not keys:
        return {}
    embedder = embedder_factory()
    from kgray.stages.embed import combine_entity_embeddings

    nv = embedder.embed_texts([k[0] for k in keys])
    lv = embedder.embed_texts([k[1] for k in keys])
    mat = combine_entity_embeddings(nv, lv, cfg.entity_name_weight, cfg.entity_label_weight)
    edges = _match_edges_driver(keys, mat, cfg.ent_threshold, n_query=n_query)
    rep_map = cluster_representatives(edges, ranks)
    mapping: dict = {}
    id_cache: dict = {}
    for k in keys:
        canon = rep_map.get(k, k)
        cid = id_cache.get(canon)
        if cid is None:
            cid = entity_id_py(canon[0], canon[1])
            id_cache[canon] = cid
        mapping[k] = (canon[0], canon[1], cid)
    return mapping


def _resolve_predicates_driver(
    rows: list[dict],
    cfg: PipelineConfig,
    embedder_factory,
    existing: list[tuple[str, str]] | None,
) -> dict:
    keys = [(r["pred"],) for r in rows]
    n_query = len(keys)
    ranks = {k: r["first_seen"] for k, r in zip(keys, rows)}
    seen = set(keys)
    for pred, fs in existing or []:
        k = (pred,)
        rank = "0|" + fs
        if k not in ranks or rank < ranks[k]:
            ranks[k] = rank
        if k not in seen:
            seen.add(k)
            keys.append(k)
    if not keys:
        return {}
    embedder = embedder_factory()
    mat = embedder.embed_texts([k[0] for k in keys])
    edges = _match_edges_driver(keys, mat, cfg.rel_threshold, n_query=n_query)
    rep_map = cluster_representatives(edges, ranks)
    return {k[0]: rep_map.get(k, k)[0] for k in keys}


def _pairs_df_to_edges(pairs: pd.DataFrame) -> list[tuple[tuple, tuple]]:
    seen = set()
    edges = []
    for a, b in zip(pairs.get("a", []), pairs.get("b", [])):
        if (a, b) not in seen:
            seen.add((a, b))
            edges.append((tuple(a.split("\x1f")), tuple(b.split("\x1f"))))
    return edges


def _rep_map_label_propagation(
    embedded: ray.data.Dataset,
    pairs_ds: ray.data.Dataset,
    rank_overrides: dict | None = None,
) -> dict:
    """Distributed representative computation for match-edge sets beyond
    driver RAM (VERDICT r1: wire the tested label-propagation fallback):
    ranks stay a Dataset built from the embedded vocabulary; only the
    (small) non-identity representative rows return to the driver.

    ``rank_overrides``: keys whose effective rank differs from their row in
    ``embedded`` (existing canonicals colliding with new vocabulary) — the
    min-label propagation absorbs the duplicate rank rows naturally."""
    from kgray.state.unionfind import label_propagation_representatives

    def to_ranks(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": b["name"].str.cat(b["label"], sep="\x1f"), "rank": b["first_seen"]}
        )

    ranks_ds = embedded.drop_columns(["vec"]).map_batches(to_ranks, batch_format="pandas")
    if rank_overrides:
        extra = pd.DataFrame(
            {
                "key": ["\x1f".join(k) for k in rank_overrides],
                "rank": list(rank_overrides.values()),
            }
        )
        ranks_ds = ranks_ds.union(ray.data.from_pandas(extra))
    pairs = pairs_ds.select_columns(["a", "b"])
    rep_rows = rows_of(label_propagation_representatives(pairs, ranks_ds))
    return {
        tuple(r["key"].split("\x1f")): tuple(r["rep"].split("\x1f")) for r in rep_rows
    }


class ResolutionMap(dict):
    """Entity-resolution mapping ``(name,label) → (canon_name, canon_label,
    entity_id)``.  When ``identity_omitted`` is True the dict holds ONLY the
    non-identity entries (surfaces that merged onto a different canonical);
    every absent key resolves to itself, with its id recomputed by the
    vectorized fallback in :func:`_apply_resolution_table`.  This keeps
    driver state proportional to the duplicate rate instead of the
    vocabulary — the compact / 10^8-entity contract."""

    identity_omitted: bool = False


def _resolve_entities_compact(
    distinct: ray.data.Dataset,
    cfg: PipelineConfig,
    embedder_factory,
    existing_ranked: list[tuple[tuple, str]],
) -> ResolutionMap:
    """Fully-distributed entity resolution for vocabularies beyond driver
    RAM: the driver never sees the vocabulary — not its keys, not its ranks,
    not its vectors.  embed (actor pool) → LSH bucket match → min-label
    propagation; only the (small) non-identity representative rows return.

    Existing canonicals (incremental runs) are store-sized driver state
    already, so embedding them driver-side and unioning the rows into the
    candidate Dataset is sound; duplicate (name,label) rows are absorbed by
    the min-rank semantics of the label propagation (self match edges are
    no-ops, the '0|'-prefixed existing rank wins any tie)."""
    embedded = distinct.map_batches(
        EntityEmbedderStage,
        fn_constructor_kwargs={
            "embedder_factory": embedder_factory,
            "name_weight": cfg.entity_name_weight,
            "label_weight": cfg.entity_label_weight,
        },
        batch_format="numpy",
        batch_size=cfg.embed_batch_size,
        concurrency=auto_concurrency(),
    ).materialize()

    rank_overrides: dict = {}
    if existing_ranked:
        embedder = embedder_factory()
        from kgray.stages.embed import combine_entity_embeddings

        ks = [k for k, _ in existing_ranked]
        nv = embedder.embed_texts([k[0] for k in ks])
        lv = embedder.embed_texts([k[1] for k in ks])
        mat = combine_entity_embeddings(
            nv, lv, cfg.entity_name_weight, cfg.entity_label_weight
        )
        extra = pd.DataFrame(
            {
                "name": [k[0] for k in ks],
                "label": [k[1] for k in ks],
                "n_mentions": 0,
                "first_seen": [rank for _, rank in existing_ranked],
                "vec": list(mat),
            }
        )
        embedded = embedded.union(ray.data.from_pandas(extra)).materialize()
        rank_overrides = dict(existing_ranked)

    pairs_ds = match_edges_lsh_ds(embedded, cfg.ent_threshold, cfg).materialize()
    _warn_lsh_truncation(pairs_ds)
    rep_map = _rep_map_label_propagation(embedded, pairs_ds, rank_overrides)

    mapping = ResolutionMap()
    mapping.identity_omitted = True
    id_cache: dict = {}
    for k, canon in rep_map.items():
        cid = id_cache.get(canon)
        if cid is None:
            cid = id_cache[canon] = entity_id_py(canon[0], canon[1])
        mapping[k] = (canon[0], canon[1], cid)
    return mapping


def _resolve_entities_distributed(
    distinct: ray.data.Dataset,
    cfg: PipelineConfig,
    embedder_factory,
    existing_ranked: list[tuple[tuple, str]],
) -> dict:
    """Distributed entity resolution over a large distinct vocabulary.

    Scale contract (VERDICT r1 #4): the driver sees only
    (name, label, first_seen) — the embedding matrix is built driver-side
    ONLY on the broadcast branch (where it fits by definition); the LSH
    branch streams vectors through the bucket shuffle and never pulls them.
    Existing canonicals (incremental runs) are unioned into the candidate
    Dataset BEFORE the branch, so broadcast AND LSH paths both match new
    surfaces onto them (ADVICE r1, high).  Above ``cfg.driver_edge_max``
    match edges, representatives come from distributed min-label
    propagation instead of driver union-find."""
    embedded = distinct.map_batches(
        EntityEmbedderStage,
        fn_constructor_kwargs={
            "embedder_factory": embedder_factory,
            "name_weight": cfg.entity_name_weight,
            "label_weight": cfg.entity_label_weight,
        },
        batch_format="numpy",
        batch_size=cfg.embed_batch_size,
        concurrency=auto_concurrency(),
    ).materialize()

    # ranks: names + first-seen sort keys only — never the vectors
    meta = rows_of(embedded.drop_columns(["vec"]))
    keys = [(r["name"], r["label"]) for r in meta]
    ranks = {k: r["first_seen"] for k, r in zip(keys, meta)}
    rank_overrides: dict = {}
    if existing_ranked:
        seen = set(keys)
        new_existing = []
        for k, rank in existing_ranked:
            if k not in ranks or rank < ranks[k]:
                ranks[k] = rank
                if k in seen:
                    rank_overrides[k] = rank
            if k not in seen:
                seen.add(k)
                keys.append(k)
                new_existing.append(k)
        if new_existing:
            # embed the (store-sized) existing canonicals and fold them into
            # the candidate Dataset; the dedupe above keeps each key unique
            # so a duplicate row can never steal the argmax slot
            embedder = embedder_factory()
            from kgray.stages.embed import combine_entity_embeddings

            nv = embedder.embed_texts([k[0] for k in new_existing])
            lv = embedder.embed_texts([k[1] for k in new_existing])
            extra_mat = combine_entity_embeddings(
                nv, lv, cfg.entity_name_weight, cfg.entity_label_weight
            )
            extra = pd.DataFrame(
                {
                    "name": [k[0] for k in new_existing],
                    "label": [k[1] for k in new_existing],
                    "n_mentions": 0,
                    "first_seen": [ranks[k] for k in new_existing],
                    "vec": list(extra_mat),
                }
            )
            embedded = embedded.union(ray.data.from_pandas(extra)).materialize()

    if len(keys) <= cfg.broadcast_match_max_entities:
        # broadcast branch: the candidate matrix fits by definition — build
        # it here (and only here) from the embedded Dataset
        rows = rows_of(embedded)
        bkeys = [(r["name"], r["label"]) for r in rows]
        mat = np.stack([np.asarray(r["vec"], dtype=np.float32) for r in rows])
        edges = _match_edges_broadcast(embedded, bkeys, mat, cfg.ent_threshold)
        rep_map = cluster_representatives(edges, ranks)
    else:
        pairs_ds = match_edges_lsh_ds(embedded, cfg.ent_threshold, cfg).materialize()
        _warn_lsh_truncation(pairs_ds)
        if pairs_ds.count() > cfg.driver_edge_max:
            rep_map = _rep_map_label_propagation(embedded, pairs_ds, rank_overrides)
        else:
            rep_map = cluster_representatives(
                _pairs_df_to_edges(pairs_ds.select_columns(["a", "b"]).to_pandas()), ranks
            )

    mapping: dict = {}
    id_cache: dict = {}
    for k in keys:
        canon = rep_map.get(k, k)
        cid = id_cache.get(canon)
        if cid is None:
            cid = entity_id_py(canon[0], canon[1])
            id_cache[canon] = cid
        mapping[k] = (canon[0], canon[1], cid)
    return mapping


def resolve_vocabulary(
    raw: ray.data.Dataset,
    cfg: PipelineConfig,
    embedder_factory,
    existing_entities: list[tuple[str, str, str]] | None = None,
    existing_predicates: list[tuple[str, str]] | None = None,
) -> tuple[dict, dict]:
    """Entity + predicate resolution with ONE fused distinct shuffle.

    The per-batch partial emits (kind, name, label) rows for entity
    surfaces ('e') and predicate surfaces ('p') together, so a single small
    groupby collapses the whole vocabulary in one execution.  Falls back to
    the separate distributed ladder when the entity vocabulary exceeds the
    driver threshold, and to the fully-compact path (driver never pulls the
    vocabulary at all; mapping holds non-identity entries only) above
    ``cfg.identity_map_max_entities``."""

    vocab_ds = _bucketed_distinct(
        _vocab_partial_arrow, ["kind", "name", "label"], arrow=True
    )(raw).materialize()
    existing_ranked = [
        ((name, label), "0|" + fs) for name, label, fs in (existing_entities or [])
    ]

    if vocab_ds.count() > cfg.identity_map_max_entities:
        # compact path: only the (tiny) predicate vocabulary reaches the
        # driver; the entity vocabulary stays a Dataset end to end
        def _keep(kind: str):
            def f(t: "pa.Table") -> "pa.Table":
                import pyarrow.compute as pc  # noqa: PLC0415 (worker-local)

                return t.filter(pc.equal(t["kind"], kind))

            return f

        pred_rows = [
            {"pred": r["name"], "first_seen": r["first_seen"]}
            for r in rows_of(
                vocab_ds.map_batches(_keep("p"), batch_format="pyarrow").select_columns(
                    ["name", "first_seen"]
                )
            )
        ]
        ent_ds = vocab_ds.map_batches(_keep("e"), batch_format="pyarrow").select_columns(
            ["name", "label", "n_mentions", "first_seen"]
        )
        ent_map = _resolve_entities_compact(ent_ds, cfg, embedder_factory, existing_ranked)
        pred_map = _resolve_predicates_driver(pred_rows, cfg, embedder_factory, existing_predicates)
        return ent_map, pred_map

    vocab = rows_of(vocab_ds)
    ent_rows = [r for r in vocab if r["kind"] == "e"]
    pred_rows = [
        {"pred": r["name"], "first_seen": r["first_seen"]} for r in vocab if r["kind"] == "p"
    ]

    if len(ent_rows) > cfg.driver_match_max_entities:
        # distributed matching over the ALREADY-computed vocabulary (no
        # second distinct pass); the helper owns the broadcast/LSH/label-
        # propagation ladder and the incremental fold (ADVICE r1, high)
        import pandas as pd_

        distinct = ray.data.from_pandas(
            pd_.DataFrame(ent_rows)[["name", "label", "n_mentions", "first_seen"]]
        ).materialize()
        ent_map = _resolve_entities_distributed(distinct, cfg, embedder_factory, existing_ranked)
    else:
        ent_map = _resolve_entities_driver(ent_rows, cfg, embedder_factory, existing_ranked)
    pred_map = _resolve_predicates_driver(pred_rows, cfg, embedder_factory, existing_predicates)
    return ent_map, pred_map


def resolve_entities(
    raw: ray.data.Dataset,
    cfg: PipelineConfig,
    embedder_factory,
    existing: list[tuple[str, str, str]] | None = None,
) -> dict:
    """Full entity resolution → mapping dict
    ``(name,label) → (canon_name, canon_label, entity_id)`` for EVERY
    distinct entity (identity entries included so downstream lookup is a
    single dict hit, with ids precomputed once on the distinct set).

    ``existing`` (incremental runs, the reference's ST4 evolving-KG state,
    atom.py:196-208): canonical entities from a previous run as
    ``(name, label, first_seen)``.  They join the candidate set with ranks
    that sort before any new sort key ('0|' prefix), so new surface forms
    merge ONTO existing canonicals — mirroring the reference where the
    accumulated KG is the surviving entities_2 side of the merge.
    """
    distinct = distinct_entities(raw).materialize()
    n = distinct.count()
    if n == 0 and not existing:
        return {}

    existing_ranked = [((name, label), "0|" + fs) for name, label, fs in (existing or [])]

    if n > cfg.identity_map_max_entities:
        return _resolve_entities_compact(distinct, cfg, embedder_factory, existing_ranked)

    if n <= cfg.driver_match_max_entities:
        # small vocabulary: embed + match driver-side (no actor pools)
        rows = rows_of(distinct)
        keys = [(r["name"], r["label"]) for r in rows]
        n_query = len(keys)
        ranks = {k: r["first_seen"] for k, r in zip(keys, rows)}
        seen = set(keys)
        for k, rank in existing_ranked:
            if k not in ranks or rank < ranks[k]:
                ranks[k] = rank
            if k not in seen:
                seen.add(k)
                keys.append(k)
        embedder = embedder_factory()
        from kgray.stages.embed import combine_entity_embeddings

        nv = embedder.embed_texts([k[0] for k in keys])
        lv = embedder.embed_texts([k[1] for k in keys])
        mat = combine_entity_embeddings(nv, lv, cfg.entity_name_weight, cfg.entity_label_weight)
        edges = _match_edges_driver(keys, mat, cfg.ent_threshold, n_query=n_query)
    else:
        return _resolve_entities_distributed(distinct, cfg, embedder_factory, existing_ranked)

    rep_map = cluster_representatives(edges, ranks)
    mapping: dict = {}
    id_cache: dict = {}
    for k in keys:
        canon = rep_map.get(k, k)
        cid = id_cache.get(canon)
        if cid is None:
            cid = entity_id_py(canon[0], canon[1])
            id_cache[canon] = cid
        mapping[k] = (canon[0], canon[1], cid)
    return mapping


def resolve_predicates(
    raw: ray.data.Dataset,
    cfg: PipelineConfig,
    embedder_factory,
    existing: list[tuple[str, str]] | None = None,
) -> dict:
    """Predicate resolution → ``pred → canon_pred`` (identity included).

    Mirrors matcher.py:105-153: rename iff best cosine >= rel_threshold;
    endpoints untouched.  The predicate vocabulary is tiny by construction
    (it collapses in the distinct groupby), so embedding + matching run
    driver-side.  ``existing``: (pred, first_seen) from a previous run's
    canonical store; new surfaces rename onto existing canonicals.
    """
    rows = rows_of(distinct_predicates(raw))
    if not rows and not existing:
        return {}
    keys = [(r["pred"],) for r in rows]
    n_query = len(keys)
    ranks = {k: r["first_seen"] for k, r in zip(keys, rows)}
    seen = set(keys)
    for pred, fs in existing or []:
        k = (pred,)
        rank = "0|" + fs
        if k not in ranks or rank < ranks[k]:
            ranks[k] = rank
        if k not in seen:
            seen.add(k)
            keys.append(k)
    embedder = embedder_factory()
    mat = embedder.embed_texts([k[0] for k in keys])
    edges = _match_edges_driver(keys, mat, cfg.rel_threshold, n_query=n_query)
    rep_map = cluster_representatives(edges, ranks)
    return {k[0]: rep_map.get(k, k)[0] for k in keys}


# worker-local broadcast cache shared across stages
from kgray.functions.broadcast import cached_get as _cached_get  # noqa: E402


# per-worker cache: ent_map (one deserialized object per broadcast) →
# flat string-keyed column dicts for C-speed Series.map lookups
_RESOLUTION_COLS_CACHE: dict = {}


def _resolution_columns(ent_map: dict) -> tuple[dict, dict, dict]:
    cached = _RESOLUTION_COLS_CACHE.get(id(ent_map))
    if cached is not None and cached[0] is ent_map:
        return cached[1]
    cn: dict = {}
    cl: dict = {}
    cid: dict = {}
    for (n, l), (canon_n, canon_l, canon_id) in ent_map.items():
        k = f"{n}\x1f{l}"
        cn[k] = canon_n
        cl[k] = canon_l
        cid[k] = canon_id
    if len(_RESOLUTION_COLS_CACHE) > 4:
        _RESOLUTION_COLS_CACHE.clear()
    _RESOLUTION_COLS_CACHE[id(ent_map)] = (ent_map, (cn, cl, cid))
    return cn, cl, cid


def _apply_resolution_table(batch: pa.Table, ent_map: dict, pred_map: dict) -> pa.Table:
    """Rewrite endpoints/predicates to canonical forms and attach entity
    ids.  Arrow in / Arrow out, so the quintuple stream's list<double> time
    columns keep their types through the downstream shuffle.  Lookups are
    vectorized: one C-speed ``Series.map`` per output column against flat
    string-keyed dicts (the tuple-keyed per-row loop was the hottest line
    of the canonicalization rewrite at 2.9M rows)."""
    import numpy as np  # noqa: PLC0415 (worker-local)
    import pyarrow as pa  # noqa: F811 (worker-local)
    import pyarrow.compute as pc  # noqa: PLC0415

    cn, cl, cid = _resolution_columns(ent_map)
    for side in ("subj", "obj"):
        names = batch[f"{side}_name"].to_pandas()
        labels = batch[f"{side}_label"].to_pandas()
        key = names.str.cat(labels, sep="\x1f")
        m_n = key.map(cn)
        m_l = key.map(cl)
        m_id = key.map(cid)
        missing = m_id.isna()
        if missing.any():
            # keys absent from the map resolve to themselves (identity).
            # Under a compact map (ResolutionMap.identity_omitted) this is
            # the COMMON path, so it is vectorized: ids via the Arrow
            # md5 kernel, names/labels via mask assignment.
            from kgray.functions.normalize import entity_ids

            mask = missing.to_numpy()
            m_n = m_n.mask(missing, names)
            m_l = m_l.mask(missing, labels)
            # fillna("None") preserves the scalar path's f-string semantics
            # for (never-expected) null surfaces
            ids = entity_ids(
                pa.array(names[mask].fillna("None"), type=pa.string()),
                pa.array(labels[mask].fillna("None"), type=pa.string()),
            )
            m_id = m_id.copy()
            m_id[mask] = ids.to_numpy(zero_copy_only=False)
        idx_n = batch.schema.get_field_index(f"{side}_name")
        idx_l = batch.schema.get_field_index(f"{side}_label")
        batch = batch.set_column(idx_n, f"{side}_name", pa.array(m_n, type=pa.large_string()))
        batch = batch.set_column(idx_l, f"{side}_label", pa.array(m_l, type=pa.large_string()))
        batch = batch.append_column(f"{side}_id", pa.array(m_id, type=pa.large_string()))
    preds = batch["pred"].to_pandas()
    preds = preds.map(pred_map).fillna(preds)
    batch = batch.set_column(
        batch.schema.get_field_index("pred"), "pred", pa.array(preds, type=pa.large_string())
    )
    if "atomic_fact" in batch.schema.names:
        # normalize provenance to a list column (incremental runs feed
        # already-merged edges whose provenance is a list): wrap each
        # non-null scalar as a 1-element list via offset arithmetic
        fa = batch["atomic_fact"].combine_chunks()
        sizes = pc.cast(pc.is_valid(fa), pa.int32()).to_numpy(zero_copy_only=False)
        offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
        facts = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pc.cast(fa.drop_null(), pa.large_string()),
        )
        batch = batch.drop_columns(["atomic_fact"]).append_column("atomic_facts", facts)
    return batch


def apply_resolution(
    timeparsed: ray.data.Dataset,
    ent_map: dict,
    pred_map: dict,
) -> ray.data.Dataset:
    """Stateless-task stage (no actor-pool spin-up): the mapping dicts are
    broadcast once via ``ray.put`` and deserialized at most once per worker
    process through the worker-local cache."""
    ent_ref = ray.put(ent_map)
    pred_ref = ray.put(pred_map)

    def fn(batch: pa.Table) -> pa.Table:
        return _apply_resolution_table(batch, _cached_get(ent_ref), _cached_get(pred_ref))

    # batch_size=None → one zero-copy Arrow block per call (no slicing);
    # the vectorized kernel costs O(rows) with tiny constants
    return timeparsed.map_batches(fn, batch_format="pyarrow", batch_size=None)


def resolution_cluster_histogram(
    ent_map: dict, raw: "ray.data.Dataset | None" = None
) -> "pd.DataFrame":
    """Entity-resolution QA readout: how aggressively did resolution merge —
    for each canonical entity, the number of distinct surface ``(name,
    label)`` variants mapped onto it, returned as the histogram
    ``(n_variants, n_entities)`` sorted by ``n_variants``.  An operator
    reads this before trusting a KG build: a spike at large cluster sizes
    means over-merging (threshold too low / embedder collapse), everything
    at 1 means resolution did nothing.

    Rungs mirror the node-table ladder (pipelines/kg.py):

    - full mapping dict (identity entries included): vocabulary-sized
      driver groupby — the exact ``_nodes_from_mapping`` budget, valid
      while the vocabulary fits the driver;
    - compact map (``identity_omitted``, vocabulary beyond driver RAM):
      pass the normalized quintuple stream as ``raw`` — the histogram is
      computed distributed: :func:`distinct_entities` vocabulary stream →
      broadcast non-identity lookup (the compact map is small by
      construction) with identity fallback via the Arrow md5 id kernel →
      one vocabulary-sized eid groupby → value-domain-bounded histogram
      partials.  The driver sees only (n_variants, count) rows.

    Forced-rung parity is pinned in tests (dict == distributed on the same
    input, the nodes_from_edges pattern)."""
    import pandas as pd  # noqa: PLC0415

    compact = getattr(ent_map, "identity_omitted", False)
    if not compact:
        sizes: dict = {}
        for _, (_, _, eid) in ent_map.items():
            sizes[eid] = sizes.get(eid, 0) + 1
        counts = pd.Series(list(sizes.values()), dtype="int64")
        hist = counts.value_counts().sort_index()
        return pd.DataFrame(
            {
                "n_variants": hist.index.to_numpy(dtype="int64"),
                "n_entities": hist.to_numpy(dtype="int64"),
            }
        )

    if raw is None:
        raise ValueError(
            "compact resolution map omits identity entries; pass the "
            "normalized quintuple stream as `raw` for the distributed rung"
        )
    ent_ref = ray.put(ent_map)

    def to_eid(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa  # noqa: PLC0415 (worker-local)

        from kgray.functions.normalize import entity_ids  # noqa: PLC0415

        _, _, cid = _resolution_columns(_cached_get(ent_ref))
        names = t["name"].to_pandas()
        labels = t["label"].to_pandas()
        ids = names.str.cat(labels, sep="\x1f").map(cid)
        missing = ids.isna()
        if missing.any():
            mask = missing.to_numpy()
            ids = ids.copy()
            ids[mask] = entity_ids(
                pa.array(names[mask].fillna("None"), type=pa.string()),
                pa.array(labels[mask].fillna("None"), type=pa.string()),
            ).to_numpy(zero_copy_only=False)
        return pa.table({"eid": pa.array(ids, type=pa.large_string())})

    def hist_partial(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa  # noqa: PLC0415 (worker-local)

        return (
            pa.table({"n_variants": t["count()"]})
            .group_by("n_variants")
            .aggregate([([], "count_all")])
        )

    parts = (
        distinct_entities(raw)
        .map_batches(to_eid, batch_format="pyarrow")
        .groupby("eid")
        .count()
        .map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
    )
    hist = parts.groupby("n_variants", sort=True)["count_all"].sum()
    return pd.DataFrame(
        {
            "n_variants": hist.index.to_numpy(dtype="int64"),
            "n_entities": hist.to_numpy(dtype="int64"),
        }
    )
