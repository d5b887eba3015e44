"""Lexical retrieval over the corpus: BM25 ranking and inverted-index
construction.

Scale shapes
------------
* ``bm25_rank`` is two streaming passes. Pass 1 collapses every batch to a
  ONE-ROW partial (doc count, total token count, per-query-term document
  frequency) — the driver reduces ``num_blocks`` rows, never the corpus.
  Pass 2 scores each batch vectorized (numpy ``bincount`` over the
  flattened token stream) and keeps a per-batch top-k partial, so the
  driver merges only ``num_blocks × k`` candidate rows — the same shape as
  ``knn_bruteforce``.
* ``inverted_index`` emits distinct ``(token, doc_id, tf)`` pairs per
  batch (each document lives in exactly one batch, so pairs are globally
  distinct by construction), hash-buckets on token, and builds postings
  per bucket.  Stopword tokens make postings unbounded at corpus scale —
  ``max_postings`` caps the materialized list (df/cnt stay exact), which
  is the knob a 100-TB build must set.

The reference engine has no retrieval layer; these run over ``documents``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _flat_tokens(texts) -> tuple[np.ndarray, np.ndarray, int]:
    """Whitespace-tokenize a string column; returns (flat_tokens, parent
    row index per token, n_rows) with empty tokens dropped."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lst = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
    flat = pc.list_flatten(lst)
    lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(len(lens)), lens)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return (
        np.asarray(flat.to_pandas(), dtype=object)[mask],
        parent[mask],
        len(lens),
    )


def _round6(x: np.ndarray) -> np.ndarray:
    # half-AWAY-from-zero to match DuckDB round(); numpy .round is half-even
    return np.floor(x * 1e6 + 0.5) / 1e6


def _bm25_stats(ds, terms, t_index, text_col):
    """ONE corpus-stats pass shared by every BM25-family op: per-batch
    one-row partials -> (n_docs, avgdl, idf) or None for an empty/
    schema-less stream."""

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, parent, n = _flat_tokens(t[text_col])
        dl = np.bincount(parent, minlength=n)
        cols: dict = {"n_docs": [n], "sum_dl": [int(dl.sum())]}
        for term in terms:
            has = np.bincount(parent[flat == term], minlength=n) > 0
            cols[f"df_{t_index[term]}"] = [int(has.sum())]
        return pa.table(cols)

    stats_df = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    if not len(stats_df) or "n_docs" not in stats_df.columns:
        return None
    stats = stats_df.sum(axis=0)
    n_docs = int(stats["n_docs"])
    if n_docs == 0:
        return None
    avgdl = float(stats["sum_dl"]) / n_docs
    idf = np.array(
        [
            np.log((n_docs - stats[f"df_{i}"] + 0.5) / (stats[f"df_{i}"] + 0.5) + 1.0)
            for i in range(len(terms))
        ]
    )
    return n_docs, avgdl, idf


def _bm25_batch_scores(t, t_index, idf, avgdl, k1, b, id_col, text_col):
    """Vectorized per-batch BM25 kernel shared by rank/fuse/ndcg: returns
    (ids, round6 BM25 score, dl, query-term frequency, distinct-terms
    relevance) so each caller derives its own ranking signal from ONE
    token pass."""
    flat, parent, n = _flat_tokens(t[text_col])
    dl = np.bincount(parent, minlength=n).astype(np.float64)
    score = np.zeros(n)
    qtf = np.zeros(n)
    rel = np.zeros(n, dtype=np.int64)
    denom_dl = k1 * (1.0 - b + b * dl / avgdl)
    for term, i in t_index.items():
        tf = np.bincount(parent[flat == term], minlength=n).astype(np.float64)
        score += idf[i] * tf * (k1 + 1.0) / (tf + denom_dl)
        qtf += tf
        rel += (tf > 0).astype(np.int64)
    ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
    return ids, _round6(score), dl, qtf, rel



def bm25_rank(
    ds: ray.data.Dataset,
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Top-k documents for a bag-of-words query under BM25
    (Robertson/Sparck-Jones idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``).
    Returns (doc_id, score) with score rounded half-away to 1e-6 and ties
    broken by doc_id."""
    terms = list(dict.fromkeys(query_terms))
    t_index = {t: i for i, t in enumerate(terms)}

    st = _bm25_stats(ds, terms, t_index, text_col)
    if st is None:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")})
    _, avgdl, idf = st

    def score_partial(t: pa.Table) -> pa.Table:
        ids, score, _, _, _ = _bm25_batch_scores(
            t, t_index, idf, avgdl, k1, b, id_col, text_col
        )
        # per-batch top-k partial: rank by (-score, doc_id)
        order = np.lexsort((ids, -score))[:top_k]
        return pa.table({id_col: ids[order], "score": score[order]})

    cand = ds.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
    return out.head(top_k).reset_index(drop=True)


def inverted_index(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    max_postings: int | None = None,
) -> ray.data.Dataset:
    """token → (df, total count, comma-joined sorted posting list).  df
    and cnt are always exact; ``max_postings`` truncates the materialized
    posting string to the first K doc ids (ascending) so stopword rows
    stay bounded at corpus scale."""

    def pairs_partial(t: pa.Table) -> pa.Table:
        flat, parent, _ = _flat_tokens(t[text_col])
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)[parent]
        counted = (
            pa.table({"token": pa.array(flat, type=pa.large_string()), id_col: ids})
            .group_by(["token", id_col])
            .aggregate([([], "count_all")])
        )
        bucket = pd.util.hash_array(
            np.asarray(counted["token"].to_pandas(), dtype=object)
        ) % num_buckets
        return counted.append_column("bucket", pa.array(bucket.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", id_col], kind="mergesort")
        agg = g.groupby("token", sort=False).agg(
            df=(id_col, "size"), cnt=("count_all", "sum")
        )
        ids_str = g[id_col].astype(str)
        if max_postings is None:
            postings = ids_str.groupby(g["token"].values, sort=False).agg(",".join)
        else:
            postings = (
                ids_str.groupby(g["token"].values, sort=False)
                .agg(lambda s: ",".join(s.iloc[:max_postings]))
            )
        agg["postings"] = postings
        agg["df"] = agg["df"].astype("int64")
        agg["cnt"] = agg["cnt"].astype("int64")
        return agg.reset_index()

    return (
        ds.map_batches(pairs_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def token_cooccurrence_pmi(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Document-level token co-occurrence graph with pointwise mutual
    information: for every unordered token pair (a < b) appearing together
    in ≥ ``min_count`` documents, emit (tok_a, tok_b, n_ab, pmi) where
    ``pmi = ln(N · n_ab / (n_a · n_b))`` over document frequencies.

    Scale shape: pairs are generated per batch by a vectorized self-merge
    of the batch's distinct (doc, token) pairs (a document lives in
    exactly one batch, so batch-local pair counts are globally correct
    partials), pre-counted before the pair-hash bucket shuffle, and the
    vocabulary-sized document-frequency table rides along as a broadcast.
    The t·(t−1)/2 blowup is bounded by distinct tokens per document — cap
    upstream (e.g. top-k TF tokens per doc) for pathological documents;
    ``min_count`` prunes the long tail after the count.
    """
    from kgray.functions.broadcast import cached_get
    from kgray.ops.dedup import _md5_u64_np

    # pass 1: document frequency per token + N docs (vocab-sized driver
    # reduce, broadcast back)
    def df_partial(t: pa.Table) -> pa.Table:
        flat, parent, n = _flat_tokens(t[text_col])
        dt = pd.DataFrame({"token": flat, "d": parent}).drop_duplicates()
        c = dt.groupby("token", sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "token": pd.concat([pd.Series(["\x00docs"]), c["token"]]).to_numpy(dtype=object),
                "n": np.concatenate([[n], c["n"].to_numpy()]).astype(np.int64),
            }
        )

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("token")["n"]
        .sum()
    )
    n_docs = int(df_tbl.pop("\x00docs"))
    df_ref = ray.put(df_tbl.to_dict())

    def pair_partial(t: pa.Table) -> pa.Table:
        flat, parent, _ = _flat_tokens(t[text_col])
        dt = pd.DataFrame({"d": parent, "token": flat}).drop_duplicates()
        m = dt.merge(dt, on="d")
        m = m[m["token_x"] < m["token_y"]]
        c = m.groupby(["token_x", "token_y"], sort=False).size().reset_index(name="n_ab")
        bucket = (
            (_md5_u64_np(c["token_x"].to_numpy(dtype=object))
             ^ _md5_u64_np(c["token_y"].to_numpy(dtype=object)))
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "tok_a": c["token_x"].to_numpy(dtype=object),
                "tok_b": c["token_y"].to_numpy(dtype=object),
                "n_ab": c["n_ab"].to_numpy(dtype=np.int64),
                "bucket": bucket,
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df_map = cached_get(df_ref)
        c = g.groupby(["tok_a", "tok_b"], sort=False)["n_ab"].sum().reset_index()
        c = c[c["n_ab"] >= min_count]
        if len(c) == 0:
            return pd.DataFrame(
                {"tok_a": pd.Series(dtype=object), "tok_b": pd.Series(dtype=object),
                 "n_ab": pd.Series(dtype="int64"), "pmi": pd.Series(dtype="float64")}
            )
        n_a = c["tok_a"].map(df_map).to_numpy(dtype=np.float64)
        n_b = c["tok_b"].map(df_map).to_numpy(dtype=np.float64)
        pmi = np.log(n_docs * c["n_ab"].to_numpy(dtype=np.float64) / (n_a * n_b))
        c["pmi"] = np.floor(pmi * 1e6 + 0.5) / 1e6  # half-away == DuckDB round()
        c["n_ab"] = c["n_ab"].astype("int64")
        return c

    return (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


class HashedLinearClassifier:
    """Actor-pool quality classifier: a fasttext-shaped linear model over
    hashed bag-of-tokens features.  The weight table (``n_features``
    integer milli-weights derived from md5 so the SQL oracle rebuilds them
    bit-for-bit) is built ONCE per actor in ``__init__`` — the stateful
    model-inference pattern every learned quality filter (fasttext, KenLM,
    a distilled scorer) plugs into; swap ``self.w`` for real trained
    weights and nothing else changes.

    Scoring is all-integer (milli-weight sums in int64), so results are
    exactly reproducible across batch splits, cluster sizes and the DuckDB
    twin — no float-order epsilon.  Per batch: distinct-first token
    hashing (``np.unique`` inverse gather) + one ``bincount`` per doc sum;
    no Python loop over tokens beyond the md5 of the batch's VOCABULARY.
    """

    N_FEATURES = 256

    def __init__(self) -> None:
        from kgray.ops.dedup import _md5_u64_np

        self._md5 = _md5_u64_np
        self.w = (
            _md5_u64_np([f"w:{j}" for j in range(self.N_FEATURES)]) % 2001
        ).astype(np.int64) - 1000

    def __call__(self, t: pa.Table) -> pa.Table:
        toks, parent, n_rows = _flat_tokens(t["text"])
        vocab, inv = np.unique(toks, return_inverse=True)
        idx = (self._md5(list(vocab)) % self.N_FEATURES).astype(np.int64)
        tok_w = self.w[idx[inv]]
        score_milli = np.bincount(parent, weights=tok_w, minlength=n_rows).astype(
            np.int64
        )
        n_tokens = np.bincount(parent, minlength=n_rows).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "score_milli": pa.array(score_milli, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "keep": pa.array(score_milli > 0, pa.bool_()),
            }
        )


def tfidf_topk(
    docs: ray.data.Dataset,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-document top-``k`` TF-IDF terms — the classic keyword-extraction
    / sparse-retrieval primitive (tf · ln((N+1)/(df+1)), the smoothed idf).

    Exactness: idf quantizes to integer MICRO-units (the DSIR convention,
    kgray.ops.curation.dsir_weights) so per-term scores are exact int64
    products ``tf · idf_micro`` and the per-doc top-k order (score desc,
    token asc) is integer/lexicographic — engine and twin cannot disagree
    on ties.

    Scale shape: pass 1 folds each batch to per-token document-frequency
    partials (documents are one row each, so a row's UNIQUE tokens count
    df directly); the driver reduce and the broadcast idf table are
    vocabulary-bounded — the doc_unigram_lm budget; above ~10^8 terms the
    hashed-bucket variant (dsir_weights) is the stated upgrade path.
    Pass 2 is a streaming per-batch score + per-doc head(k).
    """
    import ray

    from kgray.functions.broadcast import cached_get

    def df_partial(t: pa.Table) -> pa.Table:
        toks, parent, _ = _flat_tokens(t[text_col])
        if not len(toks):
            return pa.table({"token": pa.array([], pa.large_string()), "n": pa.array([], pa.int64())})
        # unique (row, token) pairs -> each row counts a token's df once
        uniq = pd.DataFrame({"row": parent, "token": toks}).drop_duplicates()
        u, cnt = np.unique(uniq["token"].to_numpy(dtype=object), return_counts=True)
        return pa.table(
            {"token": pa.array(u, pa.large_string()), "n": pa.array(cnt, pa.int64())}
        )

    n_docs = docs.count()
    parts = docs.map_batches(df_partial, batch_format="pyarrow").to_pandas()
    schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("token", pa.large_string()),
            ("tf", pa.int64()),
            ("tfidf", pa.float64()),
        ]
    )
    if "token" not in parts.columns or not len(parts):
        return ray.data.from_arrow(schema.empty_table())
    df_tbl = parts.groupby("token", sort=False)["n"].sum()
    idf_micro = np.floor(
        np.log((n_docs + 1.0) / (df_tbl.to_numpy(dtype=np.float64) + 1.0)) * 1e6 + 0.5
    ).astype(np.int64)
    idf_ref = ray.put(dict(zip(df_tbl.index, idf_micro)))

    def score(t: pa.Table) -> pa.Table:
        idf = cached_get(idf_ref)
        toks, parent, _ = _flat_tokens(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if not len(toks):
            return schema.empty_table()
        b = (
            pd.DataFrame({"row": parent, "token": toks})
            .groupby(["row", "token"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        micro = b["tf"].to_numpy(dtype=np.int64) * np.array(
            [idf[tok] for tok in b["token"]], dtype=np.int64
        )
        b["micro"] = micro
        b = b.sort_values(["row", "micro", "token"], ascending=[True, False, True], kind="mergesort")
        top = b.groupby("row", sort=False).head(k)
        return pa.table(
            {
                id_col: pa.array(ids[top["row"].to_numpy()], pa.int64()),
                "token": pa.array(top["token"].to_numpy(dtype=object), pa.large_string()),
                "tf": pa.array(top["tf"].to_numpy(dtype=np.int64), pa.int64()),
                "tfidf": pa.array(top["micro"].to_numpy(dtype=np.float64) / 1e6, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def boolean_search(
    docs: ray.data.Dataset,
    must_all: tuple[str, ...] = ("hash", "join"),
    any_of: tuple[str, ...] = ("slow",),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Boolean retrieval over the token stream: documents matching
    ``(AND over must_all) OR (any of any_of)`` — the conjunctive/
    disjunctive filter every corpus-slicing pipeline needs before
    expensive scoring.

    Scale shape: one streaming pass; each batch tokenizes once
    (``_flat_tokens``) and builds one boolean membership vector per query
    term via a vectorized token-equality scatter — no per-row Python, no
    shuffle, no index build (the inverted_index op is the amortized
    alternative when many queries share a corpus)."""

    def match(t: pa.Table) -> pa.Table:
        toks, parent, n = _flat_tokens(t[text_col])
        flags: dict[str, np.ndarray] = {}
        for term in set(must_all) | set(any_of):
            v = np.zeros(n, dtype=bool)
            if len(toks):
                v[parent[toks == term]] = True
            flags[term] = v
        m_and = np.ones(n, dtype=bool)
        for term in must_all:
            m_and &= flags[term]
        m_or = np.zeros(n, dtype=bool)
        for term in any_of:
            m_or |= flags[term]
        keep = m_and | m_or
        return pa.table(
            {
                id_col: t[id_col].filter(pa.array(keep)),
                "match_all": pa.array(m_and[keep].astype(np.int64), pa.int64()),
                "match_any": pa.array(m_or[keep].astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(match, batch_format="pyarrow")


def rrf_fuse_rank(
    ds: ray.data.Dataset,
    query_terms: tuple[str, ...],
    k0: int = 60,
    pool: int = 100,
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Reciprocal-rank fusion of two retrieval scorers for one query —
    BM25 and a plain query-term-density scorer (Σtf / dl) — the standard
    hybrid-retrieval merge (fused = Σ 1/(k0 + rank), Cormack et al.).
    Each scorer contributes its top-``pool`` list; documents absent from
    a list contribute nothing from it (their rank column reports 0).

    Exactness: both scores micro-round half-away (DuckDB ``round(x,6)``)
    before ranking; ranks break ties by doc_id; the fused sum of ≤2
    double reciprocals micro-quantizes identically on both engines.

    Scale shape: ONE corpus-stats pass (one row per batch) + ONE scoring
    pass emitting per-batch top-``pool`` partials per scorer — the
    driver merges blocks × pool × 2 candidate rows, never the corpus."""
    terms = list(dict.fromkeys(query_terms))
    t_index = {t: i for i, t in enumerate(terms)}

    empty = pd.DataFrame(
        {
            id_col: pd.Series(dtype="int64"),
            "rrf": pd.Series(dtype="float64"),
            "rank_bm25": pd.Series(dtype="int64"),
            "rank_tf": pd.Series(dtype="int64"),
        }
    )
    st = _bm25_stats(ds, terms, t_index, text_col)
    if st is None:
        return empty
    _, avgdl, idf = st

    def score_partial(t: pa.Table) -> pa.Table:
        ids, bm, dl, qtf, _ = _bm25_batch_scores(
            t, t_index, idf, avgdl, k1, b, id_col, text_col
        )
        tfr = _round6(np.where(dl > 0, qtf / np.where(dl > 0, dl, 1.0), 0.0))
        ob = np.lexsort((ids, -bm))[:pool]
        ot = np.lexsort((ids, -tfr))[:pool]
        return pa.table(
            {
                id_col: pa.array(np.concatenate([ids[ob], ids[ot]]), pa.int64()),
                "score": pa.array(np.concatenate([bm[ob], tfr[ot]]), pa.float64()),
                "which": pa.array(
                    np.repeat(np.array([0, 1], dtype=np.int8), [len(ob), len(ot)])
                ),
            }
        )

    cand = ds.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    ranks: dict[int, dict[int, int]] = {}
    for which in (0, 1):
        g = (
            cand.loc[cand["which"] == which]
            .sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
            .head(pool)
        )
        ranks[which] = {int(d): r + 1 for r, d in enumerate(g[id_col])}
    fused: dict[int, float] = {}
    for which in (0, 1):
        for d, r in ranks[which].items():
            fused[d] = fused.get(d, 0.0) + 1.0 / (k0 + r)
    out = pd.DataFrame(
        {
            id_col: np.array(list(fused.keys()), dtype=np.int64),
            "rrf": _round6(np.array(list(fused.values()))),
        }
    )
    out["rank_bm25"] = out[id_col].map(lambda d: ranks[0].get(int(d), 0)).astype("int64")
    out["rank_tf"] = out[id_col].map(lambda d: ranks[1].get(int(d), 0)).astype("int64")
    out = out.sort_values(["rrf", id_col], ascending=[False, True], kind="mergesort")
    return out.head(top_k).reset_index(drop=True)


class ClassifierCalibration:
    """Reliability-diagram partials for the hashed-linear quality
    classifier: per fixed-width score bin, document count and the rate at
    which an INDEPENDENT gold label column agrees (default: the corpus's
    ``lang == 'en'`` tag) — the calibration audit run before trusting a
    learned filter's threshold.

    Actor-pool stage: the weight table builds once per actor; each batch
    collapses to ≤ bins (bin, n, n_gold) partial rows.  All counts exact
    int64; ``finish_calibration`` folds partials and quantizes the one
    rate division."""

    BIN_WIDTH = 20_000

    def __init__(self, gold_col: str = "lang", gold_value: str = "en") -> None:
        # the audited scorer IS the classifier: reuse its weight table and
        # kernel so the two can never drift apart
        self._clf = HashedLinearClassifier()
        self.gold_col = gold_col
        self.gold_value = gold_value

    def __call__(self, t: pa.Table) -> pa.Table:
        score_milli = (
            self._clf(t)["score_milli"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        bins = np.floor_divide(score_milli, np.int64(self.BIN_WIDTH))
        gold = pc.equal(
            pc.fill_null(t[self.gold_col], ""), self.gold_value
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"bin": bins, "g": gold})
        agg = df.groupby("bin", sort=False).agg(n=("g", "size"), n_gold=("g", "sum"))
        agg = agg.reset_index()
        return pa.table(
            {
                "bin": pa.array(agg["bin"].to_numpy(dtype=np.int64), pa.int64()),
                "n": pa.array(agg["n"].to_numpy(dtype=np.int64), pa.int64()),
                "n_gold": pa.array(agg["n_gold"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )


def finish_calibration(parts: pd.DataFrame) -> pd.DataFrame:
    """Fold ClassifierCalibration partials into the reliability table."""
    empty = pd.DataFrame(
        {
            "bin": pd.Series(dtype="int64"),
            "n_docs": pd.Series(dtype="int64"),
            "n_gold": pd.Series(dtype="int64"),
            "gold_rate": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    agg = (
        parts.groupby("bin", sort=True)
        .agg(n_docs=("n", "sum"), n_gold=("n_gold", "sum"))
        .reset_index()
    )
    agg["gold_rate"] = (
        agg["n_gold"].to_numpy(dtype=np.int64) * np.int64(10**6)
        // agg["n_docs"].to_numpy(dtype=np.int64)
    ).astype("float64") / 1e6
    return agg


def bm25_ndcg(
    ds: ray.data.Dataset,
    query_terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """NDCG@k of the BM25 ranking against a rule relevance label
    (rel(doc) = number of DISTINCT query terms present, 0..|q|) — the
    standard ranking-quality eval, runnable without human judgments.

    Exactness: each DCG term micro-quantizes independently
    (floor(rel·10⁶ / log₂(rank+1) + 0.5)) so the sum is an
    order-independent int64 on both engines; the final NDCG division
    micro-quantizes.  Reports no row when IDCG = 0 (no relevant doc).

    Scale shape: one corpus-stats pass + ONE scoring pass per batch
    emitting (top-k candidates with their rel) AND a rel-histogram
    partial (≤ |q|+1 rows); the driver merges blocks × (k + |q|+1)."""
    terms = list(dict.fromkeys(query_terms))
    t_index = {t: i for i, t in enumerate(terms)}

    empty = pd.DataFrame(
        {
            "dcg_micro": pd.Series(dtype="int64"),
            "idcg_micro": pd.Series(dtype="int64"),
            "ndcg": pd.Series(dtype="float64"),
        }
    )
    st = _bm25_stats(ds, terms, t_index, text_col)
    if st is None:
        return empty
    _, avgdl, idf = st

    def score_partial(t: pa.Table) -> pa.Table:
        ids, score, _, _, rel = _bm25_batch_scores(
            t, t_index, idf, avgdl, k1, b, id_col, text_col
        )
        order = np.lexsort((ids, -score))[:k]
        ru, rc = np.unique(rel, return_counts=True)
        return pa.table(
            {
                id_col: pa.array(
                    np.concatenate([ids[order], np.zeros(len(ru), dtype=np.int64)])
                ),
                "score": pa.array(
                    np.concatenate([score[order], np.zeros(len(ru))]), pa.float64()
                ),
                "rel": pa.array(
                    np.concatenate([rel[order], ru]).astype(np.int64), pa.int64()
                ),
                "cnt": pa.array(
                    np.concatenate(
                        [np.full(len(order), -1, dtype=np.int64), rc.astype(np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    parts = ds.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    cand = parts.loc[parts["cnt"] == -1]
    hist = (
        parts.loc[parts["cnt"] >= 0].groupby("rel", sort=False)["cnt"].sum().sort_index()
    )
    top = cand.sort_values(["score", id_col], ascending=[False, True], kind="mergesort").head(k)
    discounts = np.log2(np.arange(1, k + 1, dtype=np.float64) + 1.0)
    rels = top["rel"].to_numpy(dtype=np.float64)
    dcg = int(np.floor(rels * 1e6 / discounts[: len(rels)] + 0.5).astype(np.int64).sum())
    # ideal: rel values sorted desc, first k, same per-term quantization
    ideal: list[float] = []
    for rv in sorted(hist.index, reverse=True):
        take = min(int(hist[rv]), k - len(ideal))
        ideal.extend([float(rv)] * take)
        if len(ideal) >= k:
            break
    iarr = np.array(ideal, dtype=np.float64)
    idcg = int(np.floor(iarr * 1e6 / discounts[: len(iarr)] + 0.5).astype(np.int64).sum())
    if idcg == 0:
        return empty
    return pd.DataFrame(
        {
            "dcg_micro": [np.int64(dcg)],
            "idcg_micro": [np.int64(idcg)],
            "ndcg": [np.floor(dcg / idcg * 1e6 + 0.5) / 1e6],
        }
    )
