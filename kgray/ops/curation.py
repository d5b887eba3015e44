"""Corpus-curation operators for training-data pipelines: benchmark
decontamination (n-gram overlap), deterministic stratified sampling, and
Gopher-style repetition statistics.

Scale shapes
------------
* ``ngram_contamination`` is a BROADCAST join: the benchmark side (eval
  sets — MBs) is reduced to a sorted uint64 gram-hash array, ``ray.put``
  once, and probed per corpus batch with ``searchsorted``; the corpus (the
  TB side) streams through ``map_batches`` untouched by any shuffle.
* ``stratified_sample`` is embarrassingly parallel — a pure per-batch
  filter on a deterministic content hash, so the sample is reproducible
  across runs/cluster sizes and needs no coordination or shuffle.
* ``repetition_stats`` is per-document local math: Arrow ``split_pattern``
  flatten + offset arithmetic builds every bigram without a Python loop
  over rows; counting is one lexsort + run-length encode per batch.

The reference engine has no curation layer (SURVEY.md §2.8 is scalar
string work only); these run over the ``documents`` table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from kgray.functions.broadcast import cached_get
from kgray.ops.dedup import _md5_u64_np


def _flat_grams(texts: pa.ChunkedArray | pa.Array, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, gram_hash) for every token n-gram of every document —
    zero Python loops over rows.  Tokens come from one Arrow
    ``split_pattern`` flatten; grams are built by joining ``n`` shifted
    slices of the flat token array (``binary_join_element_wise`` needs
    all-large_string inputs, including the separator); starts that would
    cross a document boundary are masked out with offset arithmetic.
    Hashes are vectorized siphash (engine-internal only — the SQL oracle
    compares gram STRINGS; a 64-bit collision is the documented epsilon)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
    offsets = toks.offsets.to_numpy()           # int64, len = ndocs+1
    flat = toks.flatten()
    total = len(flat)
    n_starts = total - n + 1
    if n_starts <= 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    lens = np.diff(offsets)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)[:n_starts]
    # a start at position p is valid iff p+n-1 stays inside p's document
    valid = (np.arange(n_starts, dtype=np.int64) + n) <= offsets[doc_of + 1]
    parts = []
    for j in range(n):
        parts.append(flat.slice(j, n_starts))
    grams = pc.binary_join_element_wise(*parts, pa.scalar(" ", pa.large_string()))
    h = pd.util.hash_array(np.asarray(grams.to_pandas(), dtype=object))
    return doc_of[valid], h[valid]


def _per_doc_distinct(doc_of: np.ndarray, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    order = np.lexsort((h, doc_of))
    d, g = doc_of[order], h[order]
    keep = np.empty(len(d), dtype=bool)
    if len(d):
        keep[0] = True
        keep[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
    return d[keep], g[keep]


def benchmark_gram_set(
    benchmark: ray.data.Dataset, n: int = 5, text_col: str = "text"
) -> "ray.ObjectRef":
    """Distill the benchmark side to a sorted uint64 gram-hash array and
    ``ray.put`` it once.  Per-batch ``np.unique`` pre-shrinks before the
    driver union, so the driver sees deduped hashes, not raw grams; the
    result is benchmark-sized (small by assumption), never corpus-sized."""

    def partial(t: pa.Table) -> pa.Table:
        _, h = _flat_grams(t[text_col], n)
        return pa.table({"g": np.unique(h)})

    hashes = (
        benchmark.map_batches(partial, batch_format="pyarrow")
        .to_pandas()["g"]
        .to_numpy(dtype=np.uint64)
    )
    return ray.put(np.unique(hashes))


def ngram_contamination(
    corpus: ray.data.Dataset,
    bench_ref: "ray.ObjectRef",
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per corpus document: distinct token n-grams, how many also occur in
    the benchmark set, and a contaminated flag (≥1 hit) — the standard
    eval-decontamination primitive.  Documents shorter than ``n`` tokens
    have no grams and emit no row (matching the SQL formulation)."""

    def score(t: pa.Table) -> pa.Table:
        bench = cached_get(bench_ref)
        doc_of, h = _per_doc_distinct(*_flat_grams(t[text_col], n))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ndocs = len(ids)
        n_grams = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        if len(bench):
            pos = np.searchsorted(bench, h)
            hit = (pos < len(bench)) & (bench[np.minimum(pos, len(bench) - 1)] == h)
        else:
            hit = np.zeros(len(h), dtype=bool)
        n_hit = np.bincount(doc_of, weights=hit, minlength=ndocs).astype(np.int64)
        mask = n_grams > 0
        return pa.table(
            {
                id_col: ids[mask],
                "n_grams": n_grams[mask],
                "n_hit": n_hit[mask],
                "contaminated": n_hit[mask] > 0,
            }
        )

    return corpus.map_batches(score, batch_format="pyarrow")


def stratified_sample(
    ds: ray.data.Dataset,
    rates: dict[str, int],
    default_pct: int = 10,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic per-stratum downsampling: keep a row iff
    ``md5_u64(str(id)) % 100 < rates[stratum]`` — reproducible across runs
    and cluster sizes, no shuffle, no RNG state.  The md5-lower-64 hash
    equals DuckDB's ``md5_number_lower`` so the sample is SQL-verifiable
    (kgray/ops/dedup.py:36); the per-row md5 cost parallelizes with the
    stream like the minhash/simhash stages."""

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        h = _md5_u64_np([str(x) for x in b[id_col]]) % 100
        pct = (
            b[strata_col].map(lambda s: rates.get(s, default_pct)).to_numpy(dtype=np.uint64)
        )
        return b[h < pct]

    return ds.map_batches(keep, batch_format="pandas")


_PII_PATTERNS = (
    # applied in order on the progressively scrubbed text; both engines
    # (pyarrow and DuckDB) run RE2, so behavior is identical by construction
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d{1,3}[-. ]?\(?\d{2,4}\)?[-. ]?\d{3,4}[-. ]?\d{3,4}", "<PHONE>"),
)


def scrub_pii(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """PII redaction: emails, IPv4 addresses and phone numbers replaced by
    typed tokens, plus a per-document redaction count.  Stateless
    zero-copy Arrow RE2 kernels — the corpus streams, nothing shuffles."""

    def scrub(t: pa.Table) -> pa.Table:
        text = t[text_col]
        for pat, token in _PII_PATTERNS:
            text = pc.replace_substring_regex(text, pat, token)
        n = pc.count_substring_regex(text, "<EMAIL>|<IP>|<PHONE>")
        return pa.table(
            {
                id_col: t[id_col],
                "text_scrubbed": text,
                "n_pii": pc.cast(n, pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


def repetition_stats(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Gopher-style repetition features per document: total bigrams, the
    most frequent bigram's count, and its share of all bigrams (high share
    = degenerate repeated text).  Documents with <2 tokens emit no row.
    Rounding is half-away-from-zero to match DuckDB ``round()``."""

    def score(t: pa.Table) -> pa.Table:
        doc_of, h = _flat_grams(t[text_col], 2)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ndocs = len(ids)
        order = np.lexsort((h, doc_of))
        d, g = doc_of[order], h[order]
        # run-length encode (doc, gram) pairs → per-pair counts
        if len(d):
            new = np.empty(len(d), dtype=bool)
            new[0] = True
            new[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
            starts = np.flatnonzero(new)
            counts = np.diff(np.append(starts, len(d)))
            pair_doc = d[starts]
            n_bigrams = np.bincount(pair_doc, weights=counts, minlength=ndocs).astype(np.int64)
            max_bigram = np.zeros(ndocs, dtype=np.int64)
            np.maximum.at(max_bigram, pair_doc, counts)
        else:
            n_bigrams = np.zeros(ndocs, dtype=np.int64)
            max_bigram = np.zeros(ndocs, dtype=np.int64)
        mask = n_bigrams > 0
        share = np.floor(max_bigram[mask] / n_bigrams[mask] * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                id_col: ids[mask],
                "n_bigrams": n_bigrams[mask],
                "max_bigram": max_bigram[mask],
                "top_bigram_share": share,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def normalize_text(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Canonical text cleanup for training corpora: lowercase, collapse
    whitespace runs, strip edges.  Stateless zero-copy Arrow kernels (RE2
    on both engines); the corpus streams, nothing shuffles."""

    def clean(t: pa.Table) -> pa.Table:
        text = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(t[text_col]), r"\s+", " ")
        )
        return pa.table(
            {
                id_col: t[id_col],
                "text_clean": text,
                "n_chars_clean": pc.cast(pc.utf8_length(text), pa.int64()),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow")


def decontaminate(
    corpus: ray.data.Dataset,
    bench_ref: "ray.ObjectRef",
    n: int = 5,
    text_col: str = "text",
) -> ray.data.Dataset:
    """In-stream decontamination filter: drop every document sharing ≥1
    distinct token n-gram with the broadcast benchmark set; documents
    shorter than ``n`` tokens have no grams and are kept.  All columns
    pass through; the corpus never shuffles (same broadcast shape as
    :func:`ngram_contamination`, but as a filter for pipeline
    composition)."""

    def keep(t: pa.Table) -> pa.Table:
        bench = cached_get(bench_ref)
        doc_of, h = _flat_grams(t[text_col], n)
        ndocs = len(t)
        if len(bench) and len(h):
            pos = np.searchsorted(bench, h)
            hit = (pos < len(bench)) & (bench[np.minimum(pos, len(bench) - 1)] == h)
            n_hit = np.bincount(doc_of, weights=hit, minlength=ndocs)
        else:
            n_hit = np.zeros(ndocs)
        return t.filter(pa.array(n_hit == 0))

    return corpus.map_batches(keep, batch_format="pyarrow")


def novelty_stats(
    corpus: ray.data.Dataset,
    n: int = 4,
    min_docs: int = 2,
    num_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Inter-document duplication score (the memorization-risk proxy of
    exact-substring dedup, Lee et al. 2022): per document, the fraction of
    its DISTINCT token ``n``-grams that also occur in ≥ ``min_docs``
    distinct documents corpus-wide.  ``dup_frac`` ≈ 0 means novel text;
    ≈ 1 means boilerplate shared across the corpus.  Complements
    ``repetition_stats`` (intra-doc) and ``ngram_contamination`` (vs a
    broadcast benchmark): this one measures the corpus against itself.

    Same two-pass shape as ``segment_dedup``: batch-distinct (gram-hash,
    n_docs) partials → one hash-bucket groupby → the small ≥ ``min_docs``
    common set broadcasts via ``ray.put`` → stateless scoring pass.
    Gram hashing is vectorized siphash (collisions are the documented
    64-bit epsilon; the SQL oracle compares gram strings).  Documents
    shorter than ``n`` tokens emit no row."""

    def count_partial(t: pa.Table) -> pa.Table:
        doc_of, h = _per_doc_distinct(*_flat_grams(t[text_col], n))
        hh, nd = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(hh, pa.uint64()),
                "nd": pa.array(nd.astype(np.int64), pa.int64()),
                "bucket": pa.array((hh % num_buckets).astype(np.int32), pa.int32()),
            }
        )

    def common_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h", sort=False)["nd"].sum()
        return pd.DataFrame({"h": nd[nd >= min_docs].index.to_numpy(dtype=np.uint64)})

    common_df = (
        corpus.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(common_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    common = (
        common_df["h"].to_numpy(dtype=np.uint64)
        if "h" in common_df.columns
        else np.empty(0, dtype=np.uint64)
    )
    common_ref = ray.put(np.sort(common))

    def score(t: pa.Table) -> pa.Table:
        cm = cached_get(common_ref)
        doc_of, h = _per_doc_distinct(*_flat_grams(t[text_col], n))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ndocs = len(ids)
        n_grams = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        if len(cm) and len(h):
            pos = np.searchsorted(cm, h)
            hit = (pos < len(cm)) & (cm[np.minimum(pos, len(cm) - 1)] == h)
        else:
            hit = np.zeros(len(h), dtype=bool)
        n_dup = np.bincount(doc_of, weights=hit, minlength=ndocs).astype(np.int64)
        mask = n_grams > 0
        frac = np.floor(n_dup[mask] / n_grams[mask] * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                id_col: ids[mask],
                "n_grams": n_grams[mask],
                "n_dup": n_dup[mask],
                "dup_frac": frac,
            }
        )

    return corpus.map_batches(score, batch_format="pyarrow")


def mix_to_proportions(
    ds: ray.data.Dataset,
    weights: dict[str, int],
    strata_col: str = "source",
    id_col: str = "doc_id",
    hist_bits: int = 16,
) -> ray.data.Dataset:
    """Deterministic EXACT data mixing: keep the largest corpus whose
    per-source row counts sit in the integer ratio ``weights`` (the
    training-mixture primitive — e.g. web:code:books = 5:3:1).  With
    ``unit = min_s(count_s // w_s)``, exactly ``unit·w_s`` rows survive
    per source: the ones with the smallest ``(md5(id), id)`` — a
    reproducible, order-free sample (same rows on any cluster size), and
    SQL-verifiable since the hash is DuckDB's ``md5_number_lower``.

    The per-source k-th order statistic over the hash space is found
    WITHOUT a global sort (selection, not sorting):
      A. ONE pass builds the per-source histogram over the hash's top
         ``hist_bits`` bits — partials bounded by sources × 2^hist_bits,
         never rows; per-source COUNTS are its bin marginals (no separate
         counting pass);
      B. enumerate ONLY each source's boundary bin (≈ rows/2^hist_bits)
         to pin the exact threshold pair;
      C. stateless broadcast filter ``(hash, id) <= threshold``.
    Sources missing from ``weights`` are dropped.  All three passes
    stream; driver traffic is bounded by sources × bins + boundary bins.
    """
    shift = np.uint64(64 - hist_bits)
    srcs = sorted(weights)

    def hashes(b: pd.DataFrame) -> np.ndarray:
        return _md5_u64_np([str(x) for x in b[id_col]])

    # --- A: per-source histogram over hash top bits; counts = marginals -
    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[strata_col].isin(srcs)]
        if not len(b):
            return pd.DataFrame(
                {
                    strata_col: pd.Series(dtype=object),
                    "bin": pd.Series(dtype=np.int64),
                    "n": pd.Series(dtype=np.int64),
                }
            )
        h = hashes(b) >> shift
        out = (
            pd.DataFrame({strata_col: b[strata_col].to_numpy(), "bin": h.astype(np.int64)})
            .groupby([strata_col, "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return out

    hist_df = ds.map_batches(hist_partial, batch_format="pandas").to_pandas()
    hist = (
        hist_df.groupby([strata_col, "bin"])["n"].sum()
        if strata_col in hist_df.columns and len(hist_df)
        else pd.Series(dtype=np.int64)
    )
    counts = (
        hist.groupby(level=0).sum() if len(hist) else pd.Series(dtype=np.int64)
    )
    missing = [s for s in srcs if s not in counts.index]
    unit = 0 if missing else min(int(counts[s]) // weights[s] for s in srcs)
    need = {s: unit * weights[s] for s in srcs}

    # boundary bin + within-bin rank per source
    boundary: dict[str, tuple[int, int]] = {}
    for s in srcs:
        k = need[s]
        if k <= 0:
            continue
        if k >= int(counts[s]):
            boundary[s] = (-1, 0)  # keep everything from this source
            continue
        bins = hist.loc[s].sort_index()
        cum = bins.cumsum()
        b_star = int(cum.index[np.searchsorted(cum.to_numpy(), k)])
        before = int(cum.loc[:b_star].iloc[-2]) if np.searchsorted(cum.to_numpy(), k) > 0 else 0
        boundary[s] = (b_star, k - before)

    # --- C: enumerate boundary bins to pin exact thresholds -------------
    probe = {s: bb for s, (bb, _) in boundary.items() if bb >= 0}

    probe_s = pd.Series(probe, dtype=np.int64)

    def in_boundary(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[strata_col].isin(probe)]
        if not len(b):
            return pd.DataFrame(
                {
                    strata_col: pd.Series(dtype=object),
                    "h": pd.Series(dtype=np.uint64),
                    id_col: pd.Series(dtype=np.int64),
                }
            )
        h = hashes(b)
        bb = b[strata_col].map(probe_s).to_numpy(dtype=np.int64)
        mask = (h >> shift).astype(np.int64) == bb
        return pd.DataFrame(
            {strata_col: b[strata_col].to_numpy()[mask], "h": h[mask], id_col: b[id_col].to_numpy()[mask]}
        )

    thresholds: dict[str, tuple[int, int]] = {}
    if probe:
        bnd = ds.map_batches(in_boundary, batch_format="pandas").to_pandas()
        for s, (bb, rank) in boundary.items():
            if bb < 0:
                thresholds[s] = (int(np.iinfo(np.uint64).max), np.iinfo(np.int64).max)
                continue
            g = bnd[bnd[strata_col] == s].sort_values(["h", id_col], kind="mergesort")
            row = g.iloc[rank - 1]
            thresholds[s] = (int(row["h"]), int(row[id_col]))
    else:
        for s, (bb, _) in boundary.items():
            thresholds[s] = (int(np.iinfo(np.uint64).max), np.iinfo(np.int64).max)
    thr_ref = ray.put(thresholds)

    # --- D: stateless broadcast filter ----------------------------------
    def keep(b: pd.DataFrame) -> pd.DataFrame:
        thr = cached_get(thr_ref)
        known = b[strata_col].isin(thr).to_numpy()
        if not known.any():
            return b.iloc[0:0]
        b = b[known]
        h = hashes(b)
        th_s = pd.Series({s: v[0] for s, v in thr.items()}, dtype=np.uint64)
        td_s = pd.Series({s: v[1] for s, v in thr.items()}, dtype=np.int64)
        th = b[strata_col].map(th_s).to_numpy(dtype=np.uint64)
        td = b[strata_col].map(td_s).to_numpy(dtype=np.int64)
        ids = b[id_col].to_numpy(dtype=np.int64)
        return b[(h < th) | ((h == th) & (ids <= td))]

    return ds.map_batches(keep, batch_format="pandas")


def dsir_weights(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 5,
    n_buckets: int = 4096,
) -> ray.data.Dataset:
    """DSIR-style importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling): per-document log-likelihood ratio between a
    hashed-unigram LM of a TARGET exemplar subset and one of the raw
    corpus, the standard "select web data that looks like the target"
    primitive.  Target here is the deterministic ``doc_id % target_mod ==
    0`` subset (a stand-in for "looks like Wikipedia"); swap the predicate
    in a real pipeline.

    Scale shape: pass 1 folds every batch to ONE row carrying two
    ``n_buckets``-sized hashed count vectors (domain-bounded, never token
    rows — the CMS/HLL partial budget); the driver sums blocks × 2·4096
    ints and broadcasts the per-bucket log-ratio table; pass 2 scores each
    doc as a flattened hash-gather + ``reduceat``.  Per-token ratios are
    quantized to integer MICRO-units before summing (floor(x·1e6 + 0.5),
    mirrored in the SQL twin), so per-doc sums are exact integers —
    distributed summation order cannot flip the value hash.

    Returns (doc_id, n_tokens, dsir_weight) with weight = micro-sum/1e6.
    """

    def count_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = lists.flatten().to_pylist()
        h = (_md5_u64_np(flat) % np.uint64(n_buckets)).astype(np.int64)
        ids = t[id_col].to_numpy()
        tok_tgt = np.repeat(ids % target_mod == 0, lens)
        raw_cnt = np.bincount(h, minlength=n_buckets).astype(np.int64)
        tgt_cnt = np.bincount(h[tok_tgt], minlength=n_buckets).astype(np.int64)
        return pa.table({"raw": [raw_cnt], "tgt": [tgt_cnt]})

    parts = ds.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    if not len(parts) or "raw" not in parts.columns:
        raw = np.zeros(n_buckets, dtype=np.int64)
        tgt = np.zeros(n_buckets, dtype=np.int64)
    else:
        raw = np.sum(np.stack(parts["raw"].to_numpy()), axis=0).astype(np.int64)
        tgt = np.sum(np.stack(parts["tgt"].to_numpy()), axis=0).astype(np.int64)
    nr, nt = int(raw.sum()), int(tgt.sum())
    # left-associative a - b - c + d, mirrored verbatim in the SQL twin so
    # the doubles are bit-identical before quantization
    lr = (
        np.log(tgt.astype(np.float64) + 1.0)
        - np.log(float(nt + n_buckets))
        - np.log(raw.astype(np.float64) + 1.0)
        + np.log(float(nr + n_buckets))
    )
    lr_micro = np.floor(lr * 1e6 + 0.5).astype(np.int64)
    lr_ref = ray.put(lr_micro)

    def score(t: pa.Table) -> pa.Table:
        lrm = cached_get(lr_ref)
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = lists.flatten().to_pylist()
        h = (_md5_u64_np(flat) % np.uint64(n_buckets)).astype(np.int64)
        tok_w = lrm[h]
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sums = np.add.reduceat(tok_w, offsets) if len(tok_w) else np.zeros(0, dtype=np.int64)
        sums = np.where(lens > 0, sums, 0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(lens, type=pa.int64()),
                "dsir_weight": pa.array(sums.astype(np.float64) / 1e6, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _flat_gram_strings(
    texts: pa.ChunkedArray | pa.Array, n: int
) -> tuple[np.ndarray, pa.Array]:
    """(doc_index, gram_string) for every token n-gram — the string-level
    sibling of :func:`_flat_grams` for ops whose hash must be
    SQL-reproducible (md5) rather than engine-internal (siphash)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
    offsets = toks.offsets.to_numpy()
    flat = toks.flatten()
    total = len(flat)
    n_starts = total - n + 1
    if n_starts <= 0:
        return np.empty(0, np.int64), pa.array([], pa.large_string())
    lens = np.diff(offsets)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)[:n_starts]
    valid = (np.arange(n_starts, dtype=np.int64) + n) <= offsets[doc_of + 1]
    parts = [flat.slice(j, n_starts) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, pa.scalar(" ", pa.large_string()))
    return doc_of[valid], grams.filter(pa.array(valid))


def _bloom_positions(g: np.ndarray, m: int, k: int) -> np.ndarray:
    """(k, len(g)) bit positions via double hashing from the md5-lower-64
    gram hash: pos_i = (g % m + i·((g >> 32) | 1)) % m — pure uint64
    arithmetic reproducible in SQL."""
    h1 = g % np.uint64(m)
    h2 = (g >> np.uint64(32)) | np.uint64(1)
    return np.stack([(h1 + np.uint64(i) * h2) % np.uint64(m) for i in range(k)])


def bloom_bits(
    benchmark: ray.data.Dataset,
    n: int = 5,
    m: int = 1 << 20,
    k: int = 3,
    text_col: str = "text",
) -> "ray.ObjectRef":
    """Build a Bloom filter over the benchmark's token n-grams — the
    memory-bounded scale path for decontamination when the exact gram set
    (:func:`benchmark_gram_set`) outgrows a broadcast: the probe side
    ships m/8 bytes (128 KiB at the default 2^20 bits) regardless of
    benchmark size.  Per-batch partials are already m/8-byte bit arrays;
    the driver reduce is a vector OR.  Gram hashing is md5-lower-64, so
    the SQL oracle rebuilds the identical bit set."""
    nbytes = m // 8

    def partial(t: pa.Table) -> pa.Table:
        _, grams = _flat_gram_strings(t[text_col], n)
        g = np.unique(_md5_u64_np(grams.to_pylist()))
        bits = np.zeros(nbytes, dtype=np.uint8)
        if len(g):
            pos = _bloom_positions(g, m, k).reshape(-1)
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bits": [bits]})

    parts = benchmark.map_batches(partial, batch_format="pyarrow").to_pandas()
    bits = np.zeros(nbytes, dtype=np.uint8)
    if len(parts) and "bits" in parts.columns:
        for b in parts["bits"]:
            bits |= np.asarray(b, dtype=np.uint8)
    return ray.put(bits)


def bloom_contamination(
    corpus: ray.data.Dataset,
    bits_ref: "ray.ObjectRef",
    n: int = 5,
    m: int = 1 << 20,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Approximate decontamination probe against a broadcast Bloom filter:
    a gram counts as a hit iff ALL k of its bit positions are set (one-
    sided error — every true benchmark gram hits; false-positive rate
    ≈ (set_bits/m)^k).  Same output contract as
    :func:`ngram_contamination` (doc_id, n_grams, n_hit, contaminated);
    documents shorter than ``n`` tokens emit no row."""

    def score(t: pa.Table) -> pa.Table:
        bits = cached_get(bits_ref)
        doc_of_all, grams = _flat_gram_strings(t[text_col], n)
        h_all = _md5_u64_np(grams.to_pylist())
        doc_of, h = _per_doc_distinct(doc_of_all, h_all)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        ndocs = len(ids)
        n_grams = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        if len(h):
            pos = _bloom_positions(h, m, k)
            set_ = (
                bits[(pos >> np.uint64(3)).astype(np.int64)]
                & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
            ) != 0
            hit = set_.all(axis=0)
        else:
            hit = np.zeros(0, dtype=bool)
        n_hit = np.bincount(doc_of, weights=hit, minlength=ndocs).astype(np.int64)
        mask = n_grams > 0
        return pa.table(
            {
                id_col: ids[mask],
                "n_grams": n_grams[mask],
                "n_hit": n_hit[mask],
                "contaminated": n_hit[mask] > 0,
            }
        )

    return corpus.map_batches(score, batch_format="pyarrow")


def sample_to_token_budget(
    ds: ray.data.Dataset,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hist_bits: int = 16,
) -> ray.data.Dataset:
    """Deterministic EXACT token-budget sampling: keep the maximal set of
    documents whose total whitespace-token count fits ``budget_tokens``,
    taking documents in ``(md5(id), id)`` hash order — the dataset-sizing
    primitive ("give me a reproducible ~10B-token slice of this corpus").
    Order-free and cluster-size-independent like :func:`mix_to_proportions`;
    token counts use ``count(' ')+1`` (DuckDB ``len(string_split(text,' '))``
    semantics) so the running-sum SQL twin matches exactly.

    Same selection-not-sorting shape as mix_to_proportions, with WEIGHTED
    bin marginals:
      A. ONE pass histograms token counts over the hash's top
         ``hist_bits`` bits (per-bin token sums — partials bounded by
         2^hist_bits, never rows); the driver prefix-sums ~65k bins to
         find the boundary bin and the budget remaining at its start;
      B. ONLY the boundary bin's rows (≈ rows/2^hist_bits) stream to the
         driver to pin the exact (hash, id) threshold;
      C. stateless broadcast filter keeps rows strictly below the
         boundary bin plus the boundary rows under the threshold.
    Returns (id_col, n_tokens) of the kept rows.
    """
    shift = np.uint64(64 - hist_bits)

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        h = _md5_u64_np([str(x) for x in b[id_col]])
        tok = np.fromiter(
            (t.count(" ") + 1 for t in b[text_col]), dtype=np.int64, count=len(b)
        )
        return pd.DataFrame({id_col: b[id_col].to_numpy(), "h": h, "tok": tok})

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = derive(b)
        g = d.assign(bin=(d["h"] >> shift).astype(np.int64)).groupby("bin", sort=False)[
            "tok"
        ].sum()
        return pd.DataFrame({"bin": g.index.to_numpy(), "tok": g.to_numpy()})

    bins = (
        ds.map_batches(hist_partial, batch_format="pandas", batch_size=65536)
        .to_pandas()  # <= 2^hist_bits rows per block partial
        .groupby("bin", sort=True)["tok"]
        .sum()
    )
    if not len(bins):
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()), "n_tokens": pa.array([], pa.int64())}
            )
        )
    cum = bins.cumsum()
    if int(cum.iloc[-1]) <= budget_tokens:
        bound_bin, remaining = None, 0  # everything fits
    else:
        pos = int(np.searchsorted(cum.to_numpy(), budget_tokens, side="right"))
        bound_bin = int(cum.index[pos])
        before = int(cum.iloc[pos - 1]) if pos else 0
        remaining = budget_tokens - before

    if bound_bin is None:
        thresh = (np.uint64(0xFFFFFFFFFFFFFFFF), None)  # keep all
    else:
        def boundary_rows(b: pd.DataFrame) -> pd.DataFrame:
            d = derive(b)
            return d[(d["h"] >> shift).astype(np.int64) == bound_bin]

        brows = (
            ds.map_batches(boundary_rows, batch_format="pandas", batch_size=65536)
            .to_pandas()  # ~rows / 2^hist_bits — the documented budget
            .sort_values(["h", id_col], kind="mergesort")
            .reset_index(drop=True)
        )
        run = brows["tok"].cumsum()
        kept = brows[run <= remaining]
        if len(kept):
            thresh = (np.uint64(kept["h"].iloc[-1]), int(kept[id_col].iloc[-1]))
        else:
            # nothing in the boundary bin fits: threshold is the bin floor
            thresh = (np.uint64(bound_bin) << shift, -1)

    t_h, t_id = thresh
    bb = bound_bin

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        d = derive(b)
        if bb is None:
            m = np.ones(len(d), dtype=bool)
        else:
            below = (d["h"] >> shift).astype(np.int64) < bb
            ids = d[id_col].to_numpy()
            at = ((d["h"] >> shift).astype(np.int64) == bb) & (
                (d["h"] < t_h) | ((d["h"] == t_h) & (ids <= (t_id if t_id is not None else -1)))
            )
            m = (below | at).to_numpy()
        out = d[m]
        return pd.DataFrame(
            {
                id_col: out[id_col].to_numpy(dtype=np.int64),
                "n_tokens": out["tok"].to_numpy(dtype=np.int64),
            }
        )

    return ds.map_batches(keep, batch_format="pandas", batch_size=65536)


def dedup_cluster_weights(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Cluster-size-aware sampling weights over the MinHash-LSH near-dup
    clustering: every document gets ``weight = 1/|cluster|`` (micro-
    quantized) so a training sampler sees each CONTENT once in
    expectation instead of once per copy — the soft alternative to
    dropping duplicates (Lee et al. 2022 keep-one ≡ hard 0/1 weights).

    Scale shape: reuses the full minhash_lsh_dedup ladder for the
    mapping; cluster sizes come from counting only NON-SELF mapping rows
    (dup-universe bounded — singletons never cross the wire), broadcast
    as a dict; the weight attach is one streaming pass."""
    import ray

    from kgray.functions.broadcast import cached_get
    from kgray.ops.dedup import minhash_lsh_dedup

    mapping = minhash_lsh_dedup(docs)

    def member_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        canon = t["canonical_id"].to_numpy(zero_copy_only=False)
        nonself = canon[ids != canon]
        u, cnt = np.unique(nonself, return_counts=True)
        return pa.table({"c": pa.array(u, pa.int64()), "n": pa.array(cnt, pa.int64())})

    parts = mapping.map_batches(member_partial, batch_format="pyarrow").to_pandas()
    sizes: dict[int, int] = {}
    if "c" in parts.columns and len(parts):
        agg = parts.groupby("c", sort=False)["n"].sum()
        sizes = {int(k): int(v) + 1 for k, v in agg.items()}
    ref = ray.put(sizes)

    def attach(t: pa.Table) -> pa.Table:
        sz = cached_get(ref)
        canon = t["canonical_id"].to_numpy(zero_copy_only=False)
        size = np.array([sz.get(int(c), 1) for c in canon], dtype=np.int64)
        w = np.floor(1.0 / size * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                id_col: t[id_col],
                "canonical_id": t["canonical_id"],
                "cluster_size": pa.array(size, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )

    return mapping.map_batches(attach, batch_format="pyarrow")


def weighted_sample_topn(
    docs: ray.data.Dataset,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each document draws priority ``ln(u)/w`` with ``u``
    a reproducible md5-derived uniform and ``w`` its token count; the
    top-``n`` priorities are exactly a w-weighted sample — the standard
    reproducible "sample long documents more" primitive.

    Exactness: u = (md5_lower64 >> 11) / 2^53 is an exact double; the
    priority quantizes to integer MICRO-units (the DSIR ln convention),
    ties break by id.  Scale shape: one streaming pass with per-batch
    top-n partials — the driver merges blocks × n rows (the bm25_rank
    budget)."""
    from kgray.ops.dedup import _md5_u64_np
    from kgray.ops.ranking import _flat_tokens

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        _, parent, n_rows = _flat_tokens(t[text_col])
        w = np.bincount(parent, minlength=n_rows).astype(np.float64)
        h = _md5_u64_np([str(i) for i in ids])
        u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        with np.errstate(divide="ignore"):
            pr = np.where(w > 0, np.log(u) / np.maximum(w, 1.0), -np.inf)
        keep = np.isfinite(pr)
        micro = np.floor(pr[keep] * 1e6 + 0.5).astype(np.int64)
        ids = ids[keep]
        w = w[keep].astype(np.int64)
        order = np.lexsort((ids, -micro))[:n]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "n_tokens": pa.array(w[order], pa.int64()),
                "priority_micro": pa.array(micro[order], pa.int64()),
            }
        )

    cand = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if id_col not in cand.columns or not len(cand):
        return pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "n_tokens": pd.Series(dtype="int64"),
                "priority_micro": pd.Series(dtype="int64"),
            }
        )
    out = cand.sort_values(["priority_micro", id_col], ascending=[False, True], kind="mergesort")
    return out.head(n).reset_index(drop=True)


def length_psi(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Population Stability Index between two corpus halves (even vs odd
    ids) over the document-LENGTH distribution — the standard
    distribution-drift monitor a production pipeline runs between
    ingests.  Bins are the REFERENCE half's deciles (cume-dist
    convention: bound k = min L with cdf ≥ k/10); PSI = Σ (p_c − p_r)·
    ln(p_c/p_r) with add-one smoothing so empty bins stay finite.

    Exactness: lengths are ints, bin assignment is integer comparison,
    the smoothed proportions are exact rationals — the per-bin term
    quantizes to NANO-units identically on both engines (ln parity, the
    DSIR convention).

    Scale shape: ONE (half, length, count) histogram-partial pass —
    driver traffic bounded by the length DOMAIN × 2; binning, counting
    and the PSI sum run on that bounded table."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ln_ = pc.utf8_length(t[text_col]).to_numpy(zero_copy_only=False).astype(np.int64)
        return (
            pa.table(
                {
                    "half": pa.array((ids & 1).astype(np.int64), pa.int64()),
                    "len": pa.array(ln_, pa.int64()),
                }
            )
            .group_by(["half", "len"])
            .aggregate([([], "count_all")])
        )

    hist = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "bin": pd.Series(dtype="int64"),
            "n_ref": pd.Series(dtype="int64"),
            "n_cur": pd.Series(dtype="int64"),
            "term_nano": pd.Series(dtype="int64"),
        }
    )
    if "half" not in hist.columns or not len(hist):
        return empty
    agg = hist.groupby(["half", "len"], sort=True)["count_all"].sum()
    ref = agg.xs(0, level="half") if 0 in agg.index.get_level_values(0) else pd.Series(dtype="int64")
    cur = agg.xs(1, level="half") if 1 in agg.index.get_level_values(0) else pd.Series(dtype="int64")
    if not len(ref) or not len(cur):
        return empty
    vals = ref.index.to_numpy(dtype=np.int64)
    cdf = np.cumsum(ref.to_numpy(dtype=np.int64)) / ref.sum()
    bounds = np.array(
        [vals[np.searchsorted(cdf, k / 10.0, side="left")] for k in range(1, 10)],
        dtype=np.int64,
    )

    def bin_counts(series: pd.Series) -> np.ndarray:
        lens = series.index.to_numpy(dtype=np.int64)
        cnts = series.to_numpy(dtype=np.int64)
        bins = (lens[:, None] >= bounds[None, :]).sum(axis=1)
        return np.bincount(bins, weights=cnts, minlength=10).astype(np.int64)

    cr, cc = bin_counts(ref), bin_counts(cur)
    nr, nc = int(cr.sum()), int(cc.sum())
    pr = (cr + 1.0) / (nr + 10.0)
    pcur = (cc + 1.0) / (nc + 10.0)
    term = (pcur - pr) * np.log(pcur / pr)
    return pd.DataFrame(
        {
            "bin": np.arange(10, dtype=np.int64),
            "n_ref": cr,
            "n_cur": cc,
            "term_nano": np.floor(term * 1e9 + 0.5).astype(np.int64),
        }
    )


def source_token_overlap(
    ds: ray.data.Dataset,
    source_col: str = "source",
    text_col: str = "text",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Cross-source vocabulary overlap matrix: for every unordered source
    pair, the Jaccard of the two sources' distinct-token sets — the
    leakage/shared-boilerplate screen run before treating corpus sources
    as independent (a pair sharing most of its vocabulary will defeat any
    per-source split).  The grid is COMPLETE: never-overlapping pairs
    report 0.

    Exactness: intersections and per-source distinct counts are exact
    int64; the one Jaccard division micro-quantizes identically.

    Scale shape: per-batch distinct (source, token) pre-shrink → ONE
    token-hash bucket shuffle; each bucket re-distincts and emits
    per-source counts plus per-token source-pair intersections (sources²
    bounded, sources is small by construction) — driver fold bounded by
    buckets × sources²."""

    def distinct_partial(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa_  # noqa: PLC0415 (worker-local)
        import pyarrow.compute as pc_  # noqa: PLC0415

        texts = pc_.fill_null(t[text_col], "")
        if isinstance(texts, pa_.ChunkedArray):
            texts = texts.combine_chunks()
        lst = pc_.split_pattern(pc_.cast(texts, pa_.large_string()), " ")
        flat = pc_.list_flatten(lst)
        lens = pc_.list_value_length(lst).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(lens)), lens)
        src = np.asarray(t[source_col].to_pandas(), dtype=object)[parent]
        tt = pa_.table(
            {
                "source": pa_.array(src, pa_.large_string()),
                "token": pc_.cast(flat, pa_.large_string()),
            }
        )
        tt = tt.filter(pc_.not_equal(tt["token"], ""))
        dd = tt.group_by(["source", "token"]).aggregate([])
        h = _md5_u64_np(dd["token"].to_pylist()) % np.uint64(num_buckets)
        return dd.append_column("bucket", pa_.array(h.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["source", "token"])
        frames = [
            g.groupby("source", sort=False)
            .size()
            .reset_index(name="cnt")
            .rename(columns={"source": "sa"})
            .assign(sb="")
        ]
        j = g.merge(g, on="token", suffixes=("_a", "_b"))
        j = j[j["source_a"] < j["source_b"]]
        if len(j):
            co = (
                j.groupby(["source_a", "source_b"], sort=False)
                .size()
                .reset_index(name="cnt")
            )
            co.columns = ["sa", "sb", "cnt"]
            frames.append(co)
        return pd.concat(frames, ignore_index=True)[["sa", "sb", "cnt"]]

    parts = (
        ds.map_batches(distinct_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "src_a": pd.Series(dtype=object),
            "src_b": pd.Series(dtype=object),
            "n_a": pd.Series(dtype="int64"),
            "n_b": pd.Series(dtype="int64"),
            "n_common": pd.Series(dtype="int64"),
            "jaccard": pd.Series(dtype="float64"),
        }
    )
    if not len(parts):
        return empty
    agg = parts.groupby(["sa", "sb"], sort=True)["cnt"].sum()
    singles = {k[0]: int(v) for k, v in agg.items() if k[1] == ""}
    inter = {(k[0], k[1]): int(v) for k, v in agg.items() if k[1] != ""}
    srcs = sorted(singles)
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = inter.get((a, b), 0)
            union = singles[a] + singles[b] - common
            rows.append(
                (
                    a,
                    b,
                    singles[a],
                    singles[b],
                    common,
                    np.floor(common / union * 1e6 + 0.5) / 1e6 if union else 0.0,
                )
            )
    if not rows:
        return empty
    return pd.DataFrame(
        rows, columns=["src_a", "src_b", "n_a", "n_b", "n_common", "jaccard"]
    )
