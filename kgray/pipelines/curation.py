"""End-to-end corpus-curation pipeline — the training-data preparation
chain composed from the individual curation operators, all streaming:

    normalize → length filter → exact dedup → decontaminate → split

No stage materializes the corpus on the driver: the quantile filter's
driver state is a value-domain histogram, the dedup is one content-hash
bucket shuffle, decontamination is a broadcast filter, and the splitter is
a stream-only 1→N expansion.  The only corpus-wide shuffle in the whole
chain is the dedup — everything else pipelines block by block, so the
streaming executor overlaps all five stages.

The reference engine curates nothing (it ingests pre-cleaned facts); this
is the corpus-side feeder a 100-TB KG build needs in front of it.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kgray.ops.curation import benchmark_gram_set, decontaminate
from kgray.ops.dedup import dedup_keep_first
from kgray.ops.text import filter_by_length_quantile, split_documents


def curate_corpus(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_quantile: tuple[int, int] = (1, 4),
    ngram_n: int = 5,
    chunk_chars: int = 512,
    overlap: int = 64,
) -> ray.data.Dataset:
    """documents → curated training chunks.  ``benchmark`` is the held-out
    eval set to decontaminate against (its gram hashes are broadcast once,
    benchmark-sized by assumption)."""
    from kgray.ops.curation import normalize_text

    clean = normalize_text(docs, id_col=id_col, text_col=text_col)
    kept = filter_by_length_quantile(clean, value_col="n_chars_clean", q=length_quantile)
    deduped = dedup_keep_first(kept, text_col="text_clean", id_col=id_col)
    bench_ref = benchmark_gram_set(benchmark, n=ngram_n, text_col=text_col)
    safe = decontaminate(deduped, bench_ref, n=ngram_n, text_col="text_clean")
    return split_documents(
        safe, id_col=id_col, text_col="text_clean",
        chunk_chars=chunk_chars, overlap=overlap,
    )


def curate_corpus_fuzzy(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_quantile: tuple[int, int] = (1, 4),
    ngram_n: int = 5,
    chunk_chars: int = 512,
    overlap: int = 64,
    threshold: float = 0.5,
) -> ray.data.Dataset:
    """:func:`curate_corpus` with NEAR-duplicate removal in the dedup
    slot: MinHash-LSH clustering (star-linked skew guard, shared
    verify/clustering ladders) keeps each near-dup cluster's min-id row —
    the fuzzy chain a web-scale corpus actually needs (exact dedup misses
    boilerplate-with-one-edit).  Same streaming shape; the fuzzy stage
    adds the band shuffle and re-executes the cheap normalize+filter
    prefix for its filter pass instead of materializing it."""
    from kgray.ops.curation import normalize_text
    from kgray.ops.dedup import minhash_keep_canonical

    clean = normalize_text(docs, id_col=id_col, text_col=text_col)
    kept = filter_by_length_quantile(clean, value_col="n_chars_clean", q=length_quantile)
    deduped = minhash_keep_canonical(
        kept, text_col="text_clean", id_col=id_col, threshold=threshold
    )
    bench_ref = benchmark_gram_set(benchmark, n=ngram_n, text_col=text_col)
    safe = decontaminate(deduped, bench_ref, n=ngram_n, text_col="text_clean")
    return split_documents(
        safe, id_col=id_col, text_col="text_clean",
        chunk_chars=chunk_chars, overlap=overlap,
    )


def curate_corpus_budget(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_quantile: tuple[int, int] = (1, 4),
    ngram_n: int = 5,
) -> ray.data.Dataset:
    """:func:`curate_corpus`'s cleaning chain capped to an exact token
    budget: normalize → length filter → exact dedup → decontaminate →
    :func:`~kgray.ops.curation.sample_to_token_budget` — "clean the
    corpus, then give me a reproducible N-token training slice".  The
    budget stage adds one histogram pass + a boundary-bin resolution; the
    chain stays streaming (the one corpus shuffle is still the dedup).
    Returns (id_col, n_tokens) of the selected documents."""
    from kgray.ops.curation import normalize_text, sample_to_token_budget

    clean = normalize_text(docs, id_col=id_col, text_col=text_col)
    kept = filter_by_length_quantile(clean, value_col="n_chars_clean", q=length_quantile)
    deduped = dedup_keep_first(kept, text_col="text_clean", id_col=id_col)
    bench_ref = benchmark_gram_set(benchmark, n=ngram_n, text_col=text_col)
    safe = decontaminate(deduped, bench_ref, n=ngram_n, text_col="text_clean")
    return sample_to_token_budget(
        safe, budget_tokens=budget_tokens, id_col=id_col, text_col="text_clean"
    )


def curation_funnel(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_quantile: tuple[int, int] = (1, 4),
    ngram_n: int = 5,
    chunk_chars: int = 512,
    overlap: int = 64,
) -> "pd.DataFrame":
    """Per-stage survival funnel of the curation chain — the pipeline-
    observability readout (how many documents each stage dropped) an
    operator reads before trusting the curated output.  One row:
    n_raw → n_filtered → n_deduped → n_decontaminated → n_chunks.

    Single-pass shape (was: one chain re-execution per count, i.e. the
    dedup shuffle ran three times): the length-quantile histogram pass
    already carries ``n_raw`` (histogram total) and ``n_filtered`` (mass
    at/above the threshold) driver-side for free; the main stream then
    runs ONCE through the one corpus shuffle (dedup keep-first), and a
    fused tail partial computes the decontamination verdict AND the
    arithmetic chunk count (``1 + ceil(max(len−chunk_chars,0)/step)`` —
    exactly :func:`~kgray.ops.text.split_documents`'s window count, so no
    1→N expansion is ever emitted) per survivor, collapsing each block to
    one counter row.  Driver traffic: histogram (value-domain-bounded) +
    one row per block."""
    import numpy as np
    import pandas as pd

    from kgray.functions.broadcast import cached_get
    from kgray.ops.curation import _flat_grams, normalize_text
    from kgray.ops.text import length_quantile_stats

    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap

    clean = normalize_text(docs, id_col=id_col, text_col=text_col)
    threshold, hist = length_quantile_stats(
        clean, value_col="n_chars_clean", q=length_quantile
    )
    # n_raw counts EVERY input row (null-text docs ride the histogram's
    # null group); the filtered count compares non-null values only
    n_raw = int(hist.to_numpy(dtype=np.int64).sum())
    valid = hist[hist.index.notna()]
    n_filtered = int(
        valid.to_numpy(dtype=np.int64)[valid.index.to_numpy() >= threshold].sum()
    )

    def keep_len(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["n_chars_clean"], threshold))

    kept = clean.map_batches(keep_len, batch_format="pyarrow")
    deduped = dedup_keep_first(kept, text_col="text_clean", id_col=id_col)
    bench_ref = benchmark_gram_set(benchmark, n=ngram_n, text_col=text_col)

    def tail_partial(t: pa.Table) -> pa.Table:
        bench = cached_get(bench_ref)
        doc_of, h = _flat_grams(t["text_clean"], ngram_n)
        ndocs = len(t)
        if len(bench) and len(h):
            pos = np.searchsorted(bench, h)
            hit = (pos < len(bench)) & (bench[np.minimum(pos, len(bench) - 1)] == h)
            n_hit = np.bincount(doc_of, weights=hit, minlength=ndocs)
        else:
            n_hit = np.zeros(ndocs)
        safe = n_hit == 0
        lens = t["n_chars_clean"].to_numpy(zero_copy_only=False)[safe]
        extra = np.maximum(lens - chunk_chars, 0)
        nchunks = 1 + -(-extra // step)
        return pa.table(
            {
                "n_deduped": pa.array([ndocs], pa.int64()),
                "n_decontaminated": pa.array([int(safe.sum())], pa.int64()),
                "n_chunks": pa.array([int(nchunks.sum())], pa.int64()),
            }
        )

    tail = (
        deduped.map_batches(tail_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    return pd.DataFrame(
        {
            "n_raw": [np.int64(n_raw)],
            "n_filtered": [np.int64(n_filtered)],
            "n_deduped": [np.int64(tail["n_deduped"])],
            "n_decontaminated": [np.int64(tail["n_decontaminated"])],
            "n_chunks": [np.int64(tail["n_chunks"])],
        }
    )
