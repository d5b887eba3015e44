"""Text-analysis operators for large-scale training-data pipelines.

All stateless vectorized ``map_batches`` transforms (pyarrow.compute /
pandas string kernels) except language-ID, which is an actor-pool stage
holding compiled token sets.  These extend the engine beyond the
reference's own operator set (SURVEY.md §2.8 covers its scalar string
work); they run over the ``documents`` table.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def token_stats(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens (whitespace fields), n_chars — zero-copy Arrow.

    n_tokens = #separators + 1 (DuckDB's len(string_split(text,' '))
    semantics, so the oracle matches exactly)."""
    text = batch["text"]
    n_tokens = pc.add(pc.count_substring(text, " "), 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        }
    )


def fingerprint(batch: pa.Table) -> pa.Table:
    """Stable document fingerprint: first 16 hex chars of md5(text) —
    mirrors DuckDB's md5() for the oracle."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest()[:16] for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(fps, type=pa.string())})


# BPE-ish token counting: words, numbers, punctuation runs — a cheap proxy
# for subword tokenizers when sizing LLM batches (reference counts tokens
# with tiktoken, langchain_output_parser.py:157-166).
_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(batch: pa.Table) -> pa.Table:
    counts = pc.count_substring_regex(batch["text"], _BPE_ISH)
    return pa.table(
        {"doc_id": batch["doc_id"], "n_bpe_tokens": pc.cast(counts, pa.int64())}
    )


_STOPWORDS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "that", "it", "for", "on", "with", "as", "was"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "en", "du", "dans", "pour"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von", "mit", "auf", "nicht"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "que", "en", "del", "por", "con"},
}


class LangId:
    """Actor-pool language-ID stage: stopword-hit ratio per language plus a
    CJK codepoint check; state (token sets, compiled regex) built once per
    actor."""

    def __init__(self) -> None:
        import re

        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.stops = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def _predict(self, text: str) -> str:
        if any("一" <= ch <= "鿿" for ch in text[:400]):
            return "zh"
        toks = [t.lower() for t in self.word.findall(text[:2000])]
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lang, stop in self.stops.items():
            hits = sum(1 for t in toks if t in stop)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits >= 1 else "und"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "pred_lang": [self._predict(t) for t in batch["text"]]}
        )


def _round6(s):
    """Round half AWAY from zero at 6 dp (DuckDB round() semantics, so the
    SQL oracle matches bit-for-bit; numpy/pandas .round is half-even).
    Valid for the non-negative values produced here."""
    return np.floor(np.asarray(s, dtype=np.float64) * 1e6 + 0.5) / 1e6


def quality_score(batch: pd.DataFrame) -> pd.DataFrame:
    """Heuristic document-quality features + composite score: length band,
    alpha ratio, punctuation ratio, mean token length, repetition ratio.
    Vectorized pandas string kernels."""
    text = batch["text"].fillna("")
    n_chars = text.str.len()
    n_alpha = text.str.count(r"[A-Za-z]")
    # explicit ASCII class (not \w): Python's \w is Unicode-aware while the
    # SQL oracle's RE2 \w is ASCII-only — the explicit class keeps both
    # engines counting the same punctuation set on non-ASCII text
    n_punct = text.str.count(r"[^A-Za-z0-9_\s]")
    tokens = text.str.split()
    n_tokens = tokens.map(len).clip(lower=1)
    n_unique = tokens.map(lambda t: len(set(t)))
    alpha_ratio = _round6(n_alpha / n_chars.clip(lower=1))
    punct_ratio = _round6(n_punct / n_chars.clip(lower=1))
    mean_tok_len = _round6(n_chars / n_tokens)
    rep_ratio = _round6(1.0 - n_unique / n_tokens)
    length_ok = ((n_chars >= 100) & (n_chars <= 20000)).astype(float)
    score = _round6(
        0.3 * length_ok
        + 0.3 * alpha_ratio
        + 0.2 * (1.0 - punct_ratio)
        + 0.2 * (1.0 - rep_ratio)
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "alpha_ratio": alpha_ratio,
            "punct_ratio": punct_ratio,
            "mean_tok_len": mean_tok_len,
            "rep_ratio": rep_ratio,
            "quality": score,
        }
    )


def rolling_fingerprint(batch: pd.DataFrame, window: int = 64, base: int = 257, mod: int = (1 << 61) - 1) -> pd.DataFrame:
    """Rolling-hash document fingerprint: min rolling hash over byte windows
    (a Rabin-Karp content-defined fingerprint, robust to prefix edits)."""
    out = []
    pows = pow(base, window - 1, mod)
    for t in batch["text"]:
        b = t.encode("utf-8")
        if len(b) < window:
            h = 0
            for ch in b:
                h = (h * base + ch) % mod
            out.append(h)
            continue
        h = 0
        for ch in b[:window]:
            h = (h * base + ch) % mod
        mn = h
        for i in range(window, len(b)):
            h = ((h - b[i - window] * pows) * base + b[i]) % mod
            if h < mn:
                mn = h
        out.append(mn)
    return pd.DataFrame({"doc_id": batch["doc_id"], "rolling_fp": np.array(out, dtype="uint64")})


def split_documents(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> ray.data.Dataset:
    """Sliding-window document splitter (the LangChain-style pre-LLM
    chunker): fixed-width windows advancing by ``chunk_chars − overlap``,
    stopping with the first window that reaches the end of the document.

    1→N row expansion inside ``map_batches`` — same scale shape as frame
    sampling: output block size grows by the expansion factor, so batch
    sizes must shrink as documents grow; the stream never shuffles.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap

    def split(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        lens = np.fromiter((len(s) for s in texts), dtype=np.int64, count=len(texts))
        # windows: emit i while the PREVIOUS window hasn't reached the end
        # -> n = 1 + ceil(max(len - chunk_chars, 0) / step)
        extra = np.maximum(lens - chunk_chars, 0)
        n = 1 + -(-extra // step)
        doc_idx = np.repeat(np.arange(len(texts)), n)
        chunk_idx = np.arange(len(doc_idx)) - np.repeat(np.cumsum(n) - n, n)
        chunks = [
            texts[d][i * step : i * step + chunk_chars]
            for d, i in zip(doc_idx, chunk_idx)
        ]
        return pa.table(
            {
                id_col: pa.array(ids[doc_idx], type=pa.int64()),
                "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
                "chunk_text": pa.array(chunks, type=pa.large_string()),
                "n_chars": pa.array([len(c) for c in chunks], type=pa.int64()),
            }
        )

    return ds.map_batches(split, batch_format="pyarrow")


def length_quantile_stats(
    ds: ray.data.Dataset,
    value_col: str = "n_chars",
    q: tuple[int, int] = (1, 4),
) -> tuple[int, "pd.Series"]:
    """One streaming histogram pass over ``value_col`` → (q-quantile
    threshold, full value→count histogram).  The discrete quantile is the
    ``ceil(q·n)−1`` index — DuckDB ``quantile_disc`` semantics.  Each
    batch collapses to a (value, count) partial bounded by the value
    domain, never the row count; callers that also need corpus-level
    counts (total rows, rows ≥ threshold) read them off the returned
    histogram without another pass."""

    def hist_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({value_col: t[value_col]})
            .group_by(value_col)
            .aggregate([([], "count_all")])
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        # keep the null-value group (dropna=False): callers reading row
        # counts off the histogram must see ALL input rows, null values
        # included — the quantile itself is over non-null values only
        .groupby(value_col, sort=True, dropna=False)["count_all"]
        .sum()
    )
    valid = hist[hist.index.notna()]
    counts = valid.to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    num, den = q
    idx = max(0, -(-(num * n) // den) - 1)  # ceil(num*n/den) - 1
    threshold = valid.index.to_numpy()[np.searchsorted(cum, idx + 1)]
    return int(threshold), hist


def filter_by_length_quantile(
    ds: ray.data.Dataset,
    value_col: str = "n_chars",
    q: tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """Corpus-derived threshold filter: keep rows whose ``value_col`` is at
    least the corpus q-quantile (discrete quantile, ``ceil(q·n)−1`` index —
    DuckDB ``quantile_disc`` semantics).

    Two streaming passes: pass 1 is the :func:`length_quantile_stats`
    histogram (bounded by the value domain, never the row count); the
    driver derives the threshold and broadcasts it into a stateless
    pass-2 Arrow filter.
    """
    threshold, _ = length_quantile_stats(ds, value_col=value_col, q=q)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t[value_col], int(threshold)))

    return ds.map_batches(keep, batch_format="pyarrow")


def unigram_lm_score(
    ds: ray.data.Dataset,
    text_col: str = "text",
) -> ray.data.Dataset:
    """CCNet-style language-model quality score: per-document cross-entropy
    (bits/token) under the corpus's own unigram distribution — low bits ==
    repetitive/templated text, high bits == rare-token noise; the standard
    perplexity-bucket filter for web-scale corpora (Wenzek et al. 2020).

    Pass 1 builds global unigram counts from per-batch Arrow ``group_by``
    partials combined on the driver — driver traffic is blocks × vocab
    PARTIAL rows, never the corpus token stream (the pagerank-partial
    budget; past ~10^6-token vocabularies, swap in the token-hash bucket
    shuffle :func:`kgray.ops.stats.token_frequencies` uses — at bench
    scale that all-to-all costs more than the whole score pass).  The
    log-probability table broadcasts once via ``ray.put``; pass 2 scores
    each doc vectorized — flattened token gather + ``np.add.reduceat`` over
    list offsets, no per-row Python loop.
    """
    from kgray.functions.broadcast import cached_get

    def count_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(pc.cast(texts, pa.large_string()), " ").flatten()
        return pa.table({"token": toks}).group_by("token").aggregate([([], "count_all")])

    parts = ds.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    # an empty corpus produces a column-less frame; the model is empty
    freq = (
        parts.groupby("token", sort=False)["count_all"].sum()
        if "token" in parts.columns
        else pd.Series(dtype=np.int64)
    )
    total = int(freq.sum())
    logp = pd.Series(
        np.log2(freq.to_numpy(dtype=np.float64) / total) if total else [],
        index=freq.index,
    )
    logp_ref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        lp = cached_get(logp_ref)
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = lists.flatten().to_pandas()
        tok_lp = flat.map(lp).to_numpy(dtype=np.float64)
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sums = np.add.reduceat(tok_lp, offsets) if len(tok_lp) else np.zeros(0)
        bits = _round6(-sums / lens)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(lens, type=pa.int64()),
                "bits_per_token": pa.array(bits, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_lm_score(
    ds: ray.data.Dataset,
    alpha: float = 0.7,
    text_col: str = "text",
) -> ray.data.Dataset:
    """KenLM-shaped quality score: per-document cross-entropy (bits/token)
    under an interpolated bigram model trained on the corpus itself —
    ``p(w|v) = α·c(v,w)/c(v) + (1−α)·c(w)/total`` with the first token
    scored by the unigram term alone.  The bigram refinement separates
    scrambled-but-common-vocabulary text from fluent text, which the
    unigram score (:func:`unigram_lm_score`) cannot.

    Same two-pass, driver-reduced shape as ``unigram_lm_score``: pass 1
    emits per-batch Arrow ``group_by`` count partials for unigrams AND
    bigrams in one mixed stream (driver traffic is blocks × model-size
    rows, bounded by the bigram vocabulary, never the corpus); the count
    tables broadcast once via ``ray.put``; pass 2 scores vectorized —
    shifted-slice bigram join, pandas table gathers, one ``reduceat`` per
    batch.  Past ~10^6-entry models, swap pass 1 for the token-hash
    bucket shuffle (the documented ``token_frequencies`` rung).
    """
    import ray as _ray

    from kgray.functions.broadcast import cached_get

    def count_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        off = lists.offsets.to_numpy()
        flat = lists.flatten()
        total = len(flat)
        uni = (
            pa.table({"key": flat})
            .group_by("key")
            .aggregate([([], "count_all")])
        )
        parts = [
            pa.table(
                {
                    "key": uni["key"],
                    "is_bigram": pa.array(
                        np.zeros(len(uni), dtype=bool), pa.bool_()
                    ),
                    "cnt": pc.cast(uni["count_all"], pa.int64()),
                }
            )
        ]
        if total >= 2:
            lens = np.diff(off)
            doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            valid = doc_of[:-1] == doc_of[1:]
            bigs = pc.binary_join_element_wise(
                flat.slice(0, total - 1),
                flat.slice(1, total - 1),
                pa.scalar(" ", pa.large_string()),
            ).filter(pa.array(valid))
            bg = (
                pa.table({"key": bigs})
                .group_by("key")
                .aggregate([([], "count_all")])
            )
            parts.append(
                pa.table(
                    {
                        "key": bg["key"],
                        "is_bigram": pa.array(
                            np.ones(len(bg), dtype=bool), pa.bool_()
                        ),
                        "cnt": pc.cast(bg["count_all"], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    counts = ds.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    if "key" in counts.columns and len(counts):
        agg = counts.groupby(["is_bigram", "key"], sort=False)["cnt"].sum()
        uni_c = agg.loc[False].astype(np.float64)
        big_c = (
            agg.loc[True].astype(np.float64)
            if True in agg.index.get_level_values(0)
            else pd.Series(dtype=np.float64)
        )
    else:  # empty corpus: empty model
        uni_c = pd.Series(dtype=np.float64)
        big_c = pd.Series(dtype=np.float64)
    total = float(uni_c.sum())
    model_ref = _ray.put((uni_c, big_c, total))

    def score(t: pa.Table) -> pa.Table:
        uc, bc, tot = cached_get(model_ref)
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        off = lists.offsets.to_numpy()
        flat = lists.flatten().to_pandas()
        lens = np.diff(off)
        n = len(flat)
        c_w = flat.map(uc).to_numpy(dtype=np.float64)
        contrib = np.empty(n, dtype=np.float64)
        starts = off[:-1]
        contrib[starts] = np.log2(c_w[starts] / tot)
        if n >= 2:
            doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
            valid = doc_of[:-1] == doc_of[1:]
            prev = pd.Series(flat.to_numpy()[:-1])
            cur = pd.Series(flat.to_numpy()[1:])
            c_vw = (prev + " " + cur).map(bc).fillna(0.0).to_numpy(dtype=np.float64)
            c_v = c_w[:-1]
            p_bi = alpha * c_vw / c_v + (1.0 - alpha) * c_w[1:] / tot
            idx = np.flatnonzero(valid) + 1
            contrib[idx] = np.log2(p_bi[valid])
        sums = np.add.reduceat(contrib, starts) if n else np.zeros(0)
        bits = _round6(-sums / lens)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(lens, pa.int64()),
                "bits_per_token": pa.array(bits, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


class HashedDocEmbedder:
    """Actor-pool document embedder (the HashingVectorizer bridge from the
    text world to the engine's vector ops — knn / kmeans / semdedup run
    unchanged on its output).  Each token's ``DIM`` integer milli-weights
    derive from md5, so the SQL twin rebuilds them exactly; a per-ACTOR
    token→vector cache makes the md5 cost amortize across batches — the
    canonical stateful-embedding-client shape (swap ``_vec`` for a real
    model call and nothing else changes).

    Doc vector = mean of token vectors (integer sums, exact), then
    L2-normalized; output is long-format (doc_id, dim, val) rounded at
    6 dp so values hash-compare across engines.
    """

    DIM = 16
    # cap the per-actor cache so a web-scale vocabulary cannot grow an
    # actor's heap unboundedly; eviction is wholesale (the cache is a pure
    # memo — correctness never depends on it)
    CACHE_MAX = 1_000_000

    def __init__(self) -> None:
        from kgray.ops.dedup import _md5_u64_np

        self._md5 = _md5_u64_np
        self._cache: dict[str, np.ndarray] = {}

    def _vec(self, tok: str) -> np.ndarray:
        v = self._cache.get(tok)
        if v is None:
            if len(self._cache) >= self.CACHE_MAX:
                self._cache.clear()
            v = (
                self._md5([f"e:{tok}:{d}" for d in range(self.DIM)]) % 2001
            ).astype(np.int64) - 1000
            self._cache[tok] = v
        return v

    def __call__(self, t: pa.Table) -> pa.Table:
        from kgray.ops.ranking import _flat_tokens

        toks, parent, n_rows = _flat_tokens(t["text"])
        vocab, inv = np.unique(toks, return_inverse=True)
        if len(vocab):
            mat = np.stack([self._vec(x) for x in vocab])[inv]
        else:
            mat = np.zeros((0, self.DIM), dtype=np.int64)
        sums = np.vstack(
            [
                np.bincount(parent, weights=mat[:, d], minlength=n_rows)
                for d in range(self.DIM)
            ]
        ).T
        cnt = np.bincount(parent, minlength=n_rows).astype(np.float64)
        cnt_safe = np.where(cnt == 0, 1.0, cnt)
        val = sums / 1000.0 / cnt_safe[:, None]
        norm = np.sqrt((val * val).sum(axis=1))
        unit = np.where(norm[:, None] == 0, 0.0, val / np.where(norm == 0, 1.0, norm)[:, None])
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = cnt > 0
        doc_idx = np.repeat(np.arange(n_rows)[keep], self.DIM)
        dims = np.tile(np.arange(self.DIM, dtype=np.int64), int(keep.sum()))
        vals = _round6(unit[keep].ravel())
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx], pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "val": pa.array(vals, pa.float64()),
            }
        )


def perplexity_buckets(
    ds: ray.data.Dataset,
    text_col: str = "text",
) -> ray.data.Dataset:
    """CCNet's head/middle/tail split: bucket documents by corpus-wide
    TERCILES of the unigram-LM cross-entropy (Wenzek et al. 2020 — 'head'
    = lowest perplexity third, the cleanest text; 'tail' = the noisiest).

    Composition over :func:`unigram_lm_score`; the scored stream is
    materialized ONCE (three narrow columns per doc — doc_id, n_tokens,
    bits — not the corpus text) so the tercile histogram and the final
    bucket pass don't re-run the two LM passes.  Thresholds come from a
    (value, count) histogram partial — driver traffic bounded by distinct
    6-dp score values — using the same ``ceil(q·n)−1`` discrete-quantile
    index as ops/stats.py, so DuckDB ``quantile_disc`` reproduces them.
    """
    scored = unigram_lm_score(ds, text_col=text_col).materialize()

    def hist_partial(t: pa.Table) -> pa.Table:
        return (
            pa.table({"bits_per_token": t["bits_per_token"]})
            .group_by("bits_per_token")
            .aggregate([([], "count_all")])
        )

    hist_df = scored.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    if "bits_per_token" not in hist_df.columns or not len(hist_df):
        return scored  # empty corpus: nothing to bucket
    hist = hist_df.groupby("bits_per_token", sort=True)["count_all"].sum()
    values = hist.index.to_numpy(dtype=np.float64)
    cum = np.cumsum(hist.to_numpy(dtype=np.int64))
    n = int(cum[-1])

    def thr(num: int, den: int) -> float:
        idx = max(0, -(-(num * n) // den) - 1)  # ceil(num*n/den) - 1
        return float(values[np.searchsorted(cum, idx + 1)])

    t1, t2 = thr(1, 3), thr(2, 3)

    def bucketize(t: pa.Table) -> pa.Table:
        bits = t["bits_per_token"].to_numpy(zero_copy_only=False)
        bucket = np.where(bits <= t1, "head", np.where(bits <= t2, "middle", "tail"))
        return t.append_column("ppl_bucket", pa.array(bucket, pa.string()))

    return scored.map_batches(bucketize, batch_format="pyarrow")


def token_entropy(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Per-document token-distribution Shannon entropy (bits) — the
    quality signal that separates natural prose (high entropy) from
    templated/repeated boilerplate (low): H = -Σ p(tok)·log2 p(tok) over
    the doc's own token frequencies.

    Stateless single pass, no shuffle (each doc is self-contained):
    flattened Arrow token split, per-(doc, token) counts via one pandas
    groupby per batch, vectorized term computation.  Per-term values
    quantize to integer micro-units (floor(x·1e6 + 0.5), mirrored in the
    SQL twin) before the per-doc sum, so summation order cannot flip the
    value hash.  Returns (doc_id, n_tokens, n_distinct, entropy).
    """

    def score(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = lists.flatten().to_pandas()
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        cnt = (
            pd.DataFrame({"d": doc_of, "tok": flat.to_numpy()})
            .groupby(["d", "tok"], sort=False)
            .size()
            .reset_index(name="c")
        )
        d = cnt["d"].to_numpy(dtype=np.int64)
        c = cnt["c"].to_numpy(dtype=np.float64)
        n = lens[d].astype(np.float64)
        p = c / n
        term = -(p * np.log2(p))
        micro = np.floor(term * 1e6 + 0.5).astype(np.int64)
        ent_micro = np.bincount(d, weights=micro, minlength=len(lens)).astype(np.int64)
        n_distinct = np.bincount(d, minlength=len(lens)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(lens, type=pa.int64()),
                "n_distinct": pa.array(n_distinct, type=pa.int64()),
                "entropy": pa.array(ent_micro.astype(np.float64) / 1e6, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def unigram_lm_score_grouped(
    ds: ray.data.Dataset,
    group_col: str = "lang",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Per-GROUP unigram-LM cross-entropy — the faithful CCNet setup
    (Wenzek et al. 2020 train one LM per language): each document is
    scored under the model of ITS OWN group, so "rare for English" and
    "rare for French" use different distributions.

    Same two-pass driver-partial shape as :func:`unigram_lm_score`; the
    count partials carry (group, token) keys, the broadcast table is one
    log-prob Series keyed group\\x1ftoken, scoring stays a flattened
    gather + ``reduceat``.  Returns (doc_id, group, n_tokens,
    bits_per_token)."""
    from kgray.functions.broadcast import cached_get

    SEP = "\x1f"

    def count_partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = lists.flatten().to_pandas().astype(str)
        grp = pd.Series(t[group_col].to_pylist()).astype(str)
        key = pd.Series(np.repeat(grp.to_numpy(dtype=object), lens)).str.cat(flat, sep=SEP)
        cnt = key.value_counts()
        return pa.table(
            {"key": cnt.index.to_numpy(dtype=object), "c": cnt.to_numpy(np.int64)}
        )

    parts = ds.map_batches(count_partial, batch_format="pyarrow").to_pandas()
    if "key" in parts.columns and len(parts):
        freq = parts.groupby("key", sort=False)["c"].sum()
        grp_of = freq.index.to_series().str.split(SEP, n=1).str[0]
        totals = freq.groupby(grp_of.to_numpy()).transform("sum")
        logp = pd.Series(
            np.log2(freq.to_numpy(dtype=np.float64) / totals.to_numpy(dtype=np.float64)),
            index=freq.index,
        )
    else:
        logp = pd.Series(dtype=np.float64)
    logp_ref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        lp = cached_get(logp_ref)
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = lists.flatten().to_pandas().astype(str)
        grp = pd.Series(t[group_col].to_pylist()).astype(str)
        key = pd.Series(np.repeat(grp.to_numpy(dtype=object), lens)).str.cat(flat, sep=SEP)
        tok_lp = key.map(lp).to_numpy(dtype=np.float64)
        offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sums = np.add.reduceat(tok_lp, offsets) if len(tok_lp) else np.zeros(0)
        bits = _round6(-sums / lens)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                group_col: t[group_col],
                "n_tokens": pa.array(lens, type=pa.int64()),
                "bits_per_token": pa.array(bits, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def lang_kl_matrix(
    docs: ray.data.Dataset,
    lang_col: str = "lang",
    text_col: str = "text",
) -> pd.DataFrame:
    """Pairwise KL divergence between per-language unigram LMs —
    KL(P_a‖P_b) over add-one-smoothed distributions on the SHARED union
    vocabulary — the corpus-comparison rollup (which language slices are
    interchangeable for mixing, which need their own model).

    Exactness: counts are exact ints; each token's contribution
    ``p_a·ln(p_a/p_b)`` quantizes to NANO-units before the sum (the DSIR
    ln convention), so distributed float order cannot flip the hash.

    Scale shape: ONE (lang, token, count) Arrow-partial pass — driver
    traffic bounded by langs × vocabulary (the doc_unigram_lm budget,
    hashed-bucket variant documented for 10^8-token vocabularies); the
    langs² KL matrix is driver math on that bounded table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lst = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        flat = lst.flatten()
        langs = np.repeat(
            np.asarray(t[lang_col].to_pandas(), dtype=object), lens
        )
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "lang": pa.array(langs[mask], pa.large_string()),
                    "tok": pa.array(
                        np.asarray(flat.to_pandas(), dtype=object)[mask], pa.large_string()
                    ),
                }
            )
            .group_by(["lang", "tok"])
            .aggregate([([], "count_all")])
        )

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "lang_a": pd.Series(dtype=object),
            "lang_b": pd.Series(dtype=object),
            "kl": pd.Series(dtype="float64"),
        }
    )
    if "lang" not in parts.columns or not len(parts):
        return empty
    cnt = parts.groupby(["lang", "tok"], sort=True)["count_all"].sum()
    piv = cnt.unstack(fill_value=0)  # langs × union vocab
    langs = piv.index.to_numpy(dtype=object)
    V = piv.shape[1]
    c = piv.to_numpy(dtype=np.float64)
    n = c.sum(axis=1, keepdims=True)
    p = (c + 1.0) / (n + V)
    rows = []
    for i, la in enumerate(langs):
        for j, lb in enumerate(langs):
            if i == j:
                continue
            term = p[i] * np.log(p[i] / p[j])
            nano = np.floor(term * 1e9 + 0.5).astype(np.int64).sum()
            rows.append((la, lb, nano / 1e9))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["lang_a", "lang_b", "kl"]).sort_values(
        ["lang_a", "lang_b"]
    ).reset_index(drop=True)


def flesch_readability(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Flesch reading-ease per document from three RE2 run-counts (words,
    sentence enders, vowel-group syllable proxy) — the classic
    quality-filter feature (reference has no counterpart; standard
    training-data curation op).

    Stateless Arrow kernel: three ``count_substring_regex`` passes per
    batch, zero-copy from the object store; the score micro-quantizes
    (floor(x·1e6+0.5)/1e6) so the DuckDB twin hashes identically.
    """
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.count_substring_regex(texts, r"\S+").to_numpy(zero_copy_only=False)
    sents = pc.count_substring_regex(texts, r"[.!?]+").to_numpy(zero_copy_only=False)
    syls = pc.count_substring_regex(texts, r"[aeiouyAEIOUY]+").to_numpy(
        zero_copy_only=False
    )
    w = np.maximum(words.astype(np.int64), 1)
    s = np.maximum(sents.astype(np.int64), 1)
    syl = syls.astype(np.int64)
    fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
    fre = np.floor(fre * 1e6 + 0.5) / 1e6
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(w, pa.int64()),
            "n_sentences": pa.array(s, pa.int64()),
            "n_syllables": pa.array(syl, pa.int64()),
            "fre": pa.array(fre, pa.float64()),
        }
    )


class LangConfusion(LangId):
    """Actor-pool langid-vs-label confusion partials: per batch, counts of
    (labeled lang, predicted lang) pairs — the language-ID accuracy audit
    over a labeled corpus.  Inherits the per-actor compiled state of
    :class:`LangId`; emits ≤ |langs|² rows per batch."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:  # type: ignore[override]
        pred = [self._predict(t) for t in batch["text"]]
        out = (
            pd.DataFrame({"lang": batch["lang"].astype(str), "pred_lang": pred})
            .groupby(["lang", "pred_lang"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        return out


def langid_confusion(ds: ray.data.Dataset) -> pd.DataFrame:
    """Language-ID confusion matrix (labeled × predicted, with counts):
    actor-pool prediction partials, |langs|²-bounded driver merge."""
    from kgray.functions.broadcast import auto_concurrency

    parts = ds.map_batches(
        LangConfusion, batch_format="pandas", concurrency=auto_concurrency()
    ).to_pandas()
    if "lang" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {
                "lang": pd.Series(dtype=object),
                "pred_lang": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
            }
        )
    out = parts.groupby(["lang", "pred_lang"], sort=True)["n"].sum().reset_index()
    out["n"] = out["n"].astype("int64")
    return out


def token_length_hist(ds: ray.data.Dataset, text_col: str = "text") -> pd.DataFrame:
    """Corpus histogram of token lengths (in code points, empty tokens
    excluded) — the subword-budget / tokenizer-fit diagnostic.

    Scale shape: per-batch Arrow split + ``utf8_length`` + bincount
    partials; the driver merges ≤ blocks × |length domain| rows (token
    length is value-bounded)."""

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(pc.cast(texts, pa.large_string()), " ").flatten()
        lens = pc.utf8_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = lens[lens > 0]
        cnt = np.bincount(lens)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "tok_len": pa.array(nz.astype(np.int64), pa.int64()),
                "n_tokens": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if "tok_len" not in parts.columns or not len(parts):
        return pd.DataFrame(
            {"tok_len": pd.Series(dtype="int64"), "n_tokens": pd.Series(dtype="int64")}
        )
    out = parts.groupby("tok_len", sort=True)["n_tokens"].sum().reset_index()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out


def bpe_top_pairs(
    ds: ray.data.Dataset, top_n: int = 30, text_col: str = "text", num_buckets: int = 16
) -> pd.DataFrame:
    """The BPE-induction counting step: global top-``top_n`` adjacent
    CHARACTER pairs inside whitespace words (count desc, pair asc) — the
    pair a byte-pair-encoding tokenizer would merge next.

    Scale shape: per-batch pairs come from one UTF-32 reinterpret of the
    word stream (a vectorized shift-and-mask, no per-char python loop);
    int-coded pair partials take one pair-hash shuffle; per-bucket top-n
    merges on the driver (the token_frequencies ladder).
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        words: list[str] = []
        for t in b[text_col].fillna(""):
            words.extend(t.split(" "))
        s = "\x00".join(words)
        if len(s) < 2:
            return pd.DataFrame(
                {
                    "code": pd.Series(dtype="int64"),
                    "cnt": pd.Series(dtype="int64"),
                    "bucket": pd.Series(dtype="int32"),
                }
            )
        codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        a, bb = codes[:-1], codes[1:]
        mask = (a != 0) & (bb != 0)
        combined = (a[mask] << 32) | bb[mask]
        u, c = np.unique(combined, return_counts=True)
        return pd.DataFrame(
            {
                "code": u,
                "cnt": c.astype(np.int64),
                "bucket": (u % num_buckets).astype(np.int32),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("code", sort=False)["cnt"].sum().reset_index()
        c["pair"] = [chr(v >> 32) + chr(v & 0xFFFFFFFF) for v in c["code"]]
        c = c.sort_values(["cnt", "pair"], ascending=[False, True], kind="mergesort")
        return c[["pair", "cnt"]].head(top_n)

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if "pair" not in cand.columns or not len(cand):
        return pd.DataFrame(
            {"pair": pd.Series(dtype=object), "cnt": pd.Series(dtype="int64")}
        )
    out = cand.sort_values(["cnt", "pair"], ascending=[False, True], kind="mergesort")
    out["cnt"] = out["cnt"].astype("int64")
    return out.head(top_n).reset_index(drop=True)


def group_jsd_matrix(
    docs: ray.data.Dataset,
    group_col: str = "source",
    text_col: str = "text",
) -> pd.DataFrame:
    """Pairwise Jensen-Shannon divergence between per-group unigram LMs
    (add-one smoothing on the shared union vocabulary, unordered pairs) —
    the SYMMETRIC corpus-slice comparison (lang_kl_matrix's KL is
    directional; JSD is the mixing-decision metric).

    Exactness and scale shape are lang_kl_matrix's: one (group, token,
    count) Arrow-partial pass bounded by groups × vocabulary; per-token
    contributions ``½·p·ln(p/m) + ½·q·ln(q/m)`` quantize to nano-units
    before the sum."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lst = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        lens = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        flat = lst.flatten()
        grp = np.repeat(np.asarray(t[group_col].to_pandas(), dtype=object), lens)
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return (
            pa.table(
                {
                    "grp": pa.array(grp[mask], pa.large_string()),
                    "tok": pa.array(
                        np.asarray(flat.to_pandas(), dtype=object)[mask], pa.large_string()
                    ),
                }
            )
            .group_by(["grp", "tok"])
            .aggregate([([], "count_all")])
        )

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "group_a": pd.Series(dtype=object),
            "group_b": pd.Series(dtype=object),
            "jsd": pd.Series(dtype="float64"),
        }
    )
    if "grp" not in parts.columns or not len(parts):
        return empty
    cnt = parts.groupby(["grp", "tok"], sort=True)["count_all"].sum()
    piv = cnt.unstack(fill_value=0)
    groups = piv.index.to_numpy(dtype=object)
    V = piv.shape[1]
    c = piv.to_numpy(dtype=np.float64)
    n = c.sum(axis=1, keepdims=True)
    p = (c + 1.0) / (n + V)
    rows = []
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            m = (p[i] + p[j]) / 2.0
            term = 0.5 * p[i] * np.log(p[i] / m) + 0.5 * p[j] * np.log(p[j] / m)
            nano = np.floor(term * 1e9 + 0.5).astype(np.int64).sum()
            rows.append((groups[i], groups[j], nano / 1e9))
    if not rows:
        return empty
    return (
        pd.DataFrame(rows, columns=["group_a", "group_b", "jsd"])
        .sort_values(["group_a", "group_b"])
        .reset_index(drop=True)
    )


def sentence_length_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document sentence-length dispersion: sentence count, mean and
    POPULATION variance of sentence lengths (chars, split on [.!?]+ runs)
    — uniform robotic sentences versus natural variation.

    Exactness: lengths are ints; variance uses (n·Σx² − (Σx)²)/n² — exact
    integers until two micro-quantized divisions.  Stateless zero-copy
    Arrow kernel (one regex split per batch)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    sents = pc.split_pattern_regex(pc.cast(texts, pa.large_string()), "[.!?]+")
    lens = pc.list_value_length(sents).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_len = pc.utf8_length(sents.flatten()).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    # per-doc sums via reduceat on the flattened sentence lengths
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    starts = offsets[:-1].copy()
    # reduceat needs indices < len(flat); guard all-empty docs
    sx = np.zeros(len(lens), dtype=np.int64)
    sxx = np.zeros(len(lens), dtype=np.int64)
    nz = lens > 0
    if flat_len.size:
        red = np.add.reduceat(flat_len, np.minimum(starts, flat_len.size - 1))
        red2 = np.add.reduceat(flat_len * flat_len, np.minimum(starts, flat_len.size - 1))
        sx[nz] = red[nz]
        sxx[nz] = red2[nz]
    n = np.maximum(lens, 1).astype(np.float64)
    mean = np.floor(sx / n * 1e6 + 0.5) / 1e6
    var = np.floor((n * sxx - sx.astype(np.float64) ** 2) / (n * n) * 1e6 + 0.5) / 1e6
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_sentences": pa.array(lens, pa.int64()),
            "mean_len": pa.array(mean, pa.float64()),
            "var_len": pa.array(var, pa.float64()),
        }
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_STOPSET = frozenset(GOPHER_STOPWORDS)


def gopher_word_rules(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style word-level quality rules (Rae et al. 2021 §A1.1,
    restricted to the word rules — this corpus is single-line text):
    word count in [50, 100000], mean word length in [3, 10], ≥ 2
    distinct stop words.  The mean-word-length bounds evaluate as the
    EXACT integer cross-multiplication 3·n ≤ Σlen ≤ 10·n (Σlen =
    chars − spaces for single-space text), so no float ever decides a
    keep flag."""
    text = batch["text"].fillna("")
    tokens = text.str.split(" ")
    n_words = tokens.map(len).astype("int64")
    sum_len = (text.str.len() - (n_words - 1)).astype("int64")
    n_stop = tokens.map(lambda t: len(_GOPHER_STOPSET.intersection(t))).astype("int64")
    words_ok = (n_words >= 50) & (n_words <= 100_000)
    len_ok = (3 * n_words <= sum_len) & (sum_len <= 10 * n_words)
    stop_ok = n_stop >= 2
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_words": n_words,
            "sum_word_len": sum_len,
            "n_stopwords": n_stop,
            "keep": (words_ok & len_ok & stop_ok).astype("int64"),
        }
    )


def compression_ratio(batch: pd.DataFrame, level: int = 6) -> pd.DataFrame:
    """zlib compression ratio per document — the classic redundancy
    filter (boilerplate and generated spam compress far below prose).
    zlib at a fixed level is deterministic, but no SQL engine exposes
    it, so this op ships without an oracle twin (rows-only driver
    check).  Ratio micro-quantizes as compressed·10⁶ // raw."""
    import zlib

    text = batch["text"].fillna("")
    raw = text.str.encode("utf-8")
    comp = raw.map(lambda b: len(zlib.compress(b, level)))
    rawlen = raw.map(len).astype("int64")
    # empty documents get ratio 0.0 (mirrors encoding_audit's empty
    # handling) instead of the nonsense compressed_bytes/1 value
    ratio = (comp.astype("int64") * 1_000_000 // rawlen.clip(lower=1)).astype(
        "int64"
    ).astype("float64") / 1e6
    ratio[rawlen == 0] = 0.0
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "raw_bytes": rawlen,  # true byte count; only the divisor clips
            "compressed_bytes": comp.astype("int64"),
            "ratio": ratio,
        }
    )


def encoding_audit(batch: pd.DataFrame) -> pd.DataFrame:
    """Byte-vs-codepoint encoding audit: UTF-8 byte count, code-point
    count, exact integer-micro multibyte ratio, and a replacement-char
    flag (U+FFFD marks upstream decode damage) — the cheap screen a
    multilingual corpus runs before any byte-budgeted packing.

    Exactness: ratio = (bytes − chars)·10⁶ // chars on non-negative ints
    (truncating and flooring division agree), so the twin is bit-exact."""
    text = batch["text"].fillna("")
    n_chars = text.str.len().astype("int64")
    n_bytes = text.str.encode("utf-8").map(len).astype("int64")
    # clip ONLY the divisor: an empty doc has bytes == chars == 0 and must
    # report ratio 0.0, not (0-1)//1 = -1
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_bytes": n_bytes,
            "multibyte_ratio": (
                (n_bytes - n_chars) * 1_000_000 // n_chars.clip(lower=1)
            ).astype("float64")
            / 1e6,
            "has_replacement": text.str.contains("�", regex=False).astype("int64"),
        }
    )


def rake_keywords(
    docs: ray.data.Dataset,
    text_col: str = "text",
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    max_phrase_len: int = 4,
    k: int = 50,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal runs of non-stopword tokens (phrases
    longer than ``max_phrase_len`` are discarded as candidates AND from
    the word statistics); per word, ``freq`` = occurrences in candidate
    phrases and ``deg`` = sum of the lengths of the phrases containing it
    (self included); ``word_score = deg·1e6 // freq`` (integer
    micro-units) and a phrase scores the sum of its words' scores with
    multiplicity.  Returns the global top-``k`` phrases by
    (score desc, phrase asc) with occurrence counts — score stays in
    integer micro-units (``score_micro``) so the SQL twin is bit-exact.

    Scale shape: two streaming passes over the corpus (the cheap phrase
    split re-executes rather than materializing, the capstone trade).
    Pass 1 folds per-batch Arrow (word, freq, deg) partials on the driver
    — vocabulary-sized, the documented unigram-LM budget — and broadcasts
    the score table once via ``ray.put``.  Pass 2 scores phrase
    occurrences vectorized (contiguous-run ListArray + ``binary_join``,
    segment sums via ``np.add.reduceat``), pre-aggregates per batch, then
    ONE phrase-hash bucket shuffle; each bucket ships its top-``k`` (any
    global top-k member wins its bucket) so the driver merges
    buckets × k candidate rows, never the phrase table."""
    import ray

    from kgray.functions.broadcast import cached_get

    stop_arr = np.array(sorted(set(stopwords) | {""}), dtype=object)

    def _runs(t: pa.Table):
        """(phrase_strings, run_len_per_kept_token, kept_words,
        run_id_per_kept_token) for one batch — all vectorized."""
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(pc.cast(texts, pa.large_string()), " ")
        off = toks.offsets.to_numpy()
        flat = toks.flatten()
        words = flat.to_numpy(zero_copy_only=False)
        if not len(words):
            return None
        stop = np.isin(words, stop_arr)
        doc_of = np.repeat(np.arange(len(t), dtype=np.int64), np.diff(off))
        keep = ~stop
        # a run starts at a kept token preceded by a boundary or a doc edge
        prev_kept = np.r_[False, keep[:-1]]
        prev_doc = np.r_[-1, doc_of[:-1]]
        starts = keep & (~prev_kept | (prev_doc != doc_of))
        run_id = np.cumsum(starts)[keep] - 1
        if not len(run_id):
            return None
        kept_words = words[keep]
        lens = np.bincount(run_id).astype(np.int64)
        # kept tokens are in order and each run is contiguous -> ListArray
        bounds = np.r_[0, np.cumsum(lens)]
        seg = pa.LargeListArray.from_arrays(
            pa.array(bounds, pa.int64()), pa.array(kept_words, pa.large_string())
        )
        phrases = pc.binary_join(seg, pa.scalar(" ", pa.large_string()))
        return phrases, lens, kept_words, run_id

    def word_partial(t: pa.Table) -> pa.Table:
        r = _runs(t)
        if r is None:
            return pa.table(
                {"w": pa.array([], pa.large_string()),
                 "deg": pa.array([], pa.int64()),
                 "freq": pa.array([], pa.int64())}
            )
        _, lens, kept_words, run_id = r
        tok_len = lens[run_id]
        ok = tok_len <= max_phrase_len
        agg = (
            pa.table(
                {"w": pa.array(kept_words[ok], pa.large_string()),
                 "deg": pa.array(tok_len[ok], pa.int64())}
            )
            .group_by("w")
            .aggregate([("deg", "sum"), ([], "count_all")])
        )
        # select by NAME: pyarrow's key-vs-aggregate ordering has differed
        # across release lines (same guard as distinct_entities)
        return pa.table(
            {"w": agg["w"], "deg": agg["deg_sum"], "freq": agg["count_all"]}
        )

    parts = docs.map_batches(word_partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {"phrase": pd.Series(dtype=object),
             "n_occurrences": pd.Series(dtype="int64"),
             "score_micro": pd.Series(dtype="int64")}
        )
    ws = parts.groupby("w", sort=False)[["deg", "freq"]].sum()
    score = (ws["deg"].to_numpy(dtype=np.int64) * 1_000_000) // ws[
        "freq"
    ].to_numpy(dtype=np.int64)
    score_ref = ray.put(dict(zip(ws.index.to_numpy(dtype=object), score)))

    def phrase_partial(t: pa.Table) -> pa.Table:
        r = _runs(t)
        # schema-identical to the non-empty path (incl. bucket) so the
        # downstream groupby never sees heterogeneous block schemas
        empty = pa.table(
            {"phrase": pa.array([], pa.large_string()),
             "score_micro": pa.array([], pa.int64()),
             "n_occ": pa.array([], pa.int64()),
             "bucket": pa.array([], pa.int32())}
        )
        if r is None:
            return empty
        phrases, lens, kept_words, _ = r
        sc = cached_get(score_ref)
        wsc = pd.Series(kept_words).map(sc).fillna(0).to_numpy(dtype=np.int64)
        bounds = np.r_[0, np.cumsum(lens)][:-1]
        psc = np.add.reduceat(wsc, bounds) if len(wsc) else np.zeros(0, np.int64)
        ok = lens <= max_phrase_len
        if not ok.any():
            return empty
        agg = (
            pa.table(
                {"phrase": phrases.filter(pa.array(ok)),
                 "score_micro": pa.array(psc[ok], pa.int64())}
            )
            .group_by(["phrase", "score_micro"])
            .aggregate([([], "count_all")])
        )
        out = pa.table(
            {"phrase": agg["phrase"], "score_micro": agg["score_micro"],
             "n_occ": agg["count_all"]}
        )
        b = pd.util.hash_array(
            np.asarray(out["phrase"].to_pandas(), dtype=object)
        ) % num_buckets
        return out.append_column("bucket", pa.array(b.astype(np.int32)))

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["phrase", "score_micro"], sort=False, as_index=False)[
            "n_occ"
        ].sum()
        return agg.sort_values(
            ["score_micro", "phrase"], ascending=[False, True], kind="mergesort"
        ).head(k)

    cand = (
        docs.map_batches(phrase_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    top = cand.sort_values(
        ["score_micro", "phrase"], ascending=[False, True], kind="mergesort"
    ).head(k)
    return pd.DataFrame(
        {
            "phrase": top["phrase"].to_numpy(dtype=object),
            "n_occurrences": top["n_occ"].astype("int64").to_numpy(),
            "score_micro": top["score_micro"].astype("int64").to_numpy(),
        }
    ).reset_index(drop=True)
