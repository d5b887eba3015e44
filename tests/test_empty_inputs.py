"""Empty-input robustness: every corpus operator must stream a zero-row
(but correctly-typed) Dataset without crashing — at 100 TB empty blocks
and empty partitions are routine, and two bugs of exactly this class were
caught during development (untyped empty pandas frames)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _empty_docs():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    )


def _count(out):
    if isinstance(out, ray.data.Dataset):
        return out.count()
    return len(out)


def _run(name):
    docs = _empty_docs()
    if name == "normalize_text":
        from kgray.ops.curation import normalize_text

        return normalize_text(docs)
    if name == "scrub_pii":
        from kgray.ops.curation import scrub_pii

        return scrub_pii(docs)
    if name == "repetition_stats":
        from kgray.ops.curation import repetition_stats

        return repetition_stats(docs)
    if name == "novelty_stats":
        from kgray.ops.curation import novelty_stats

        return novelty_stats(docs)
    if name == "mix_to_proportions":
        from kgray.ops.curation import mix_to_proportions

        return mix_to_proportions(docs, {"a": 1})
    if name == "segment_dedup":
        from kgray.ops.dedup import segment_dedup

        return segment_dedup(docs)
    if name == "exact_dedup":
        from kgray.ops.dedup import exact_dedup

        return exact_dedup(docs)
    if name == "pack_sequences":
        from kgray.ops.packing import pack_sequences

        return pack_sequences(docs)
    if name == "token_stats":
        from kgray.ops.text import token_stats

        return docs.map_batches(token_stats, batch_format="pyarrow")
    if name == "bigram_lm_score":
        from kgray.ops.text import bigram_lm_score

        return bigram_lm_score(docs)
    if name == "unigram_lm_score":
        from kgray.ops.text import unigram_lm_score

        return unigram_lm_score(docs)
    if name == "classifier":
        from kgray.ops.ranking import HashedLinearClassifier

        return docs.map_batches(
            HashedLinearClassifier, batch_format="pyarrow", concurrency=1
        )
    if name == "hash_embed":
        from kgray.ops.text import HashedDocEmbedder

        return docs.map_batches(
            HashedDocEmbedder, batch_format="pyarrow", concurrency=1
        )
    if name == "split_documents":
        from kgray.ops.text import split_documents

        return split_documents(docs)
    raise AssertionError(name)


@pytest.mark.parametrize(
    "name",
    [
        "normalize_text",
        "scrub_pii",
        "repetition_stats",
        "novelty_stats",
        "mix_to_proportions",
        "segment_dedup",
        "exact_dedup",
        "pack_sequences",
        "token_stats",
        "bigram_lm_score",
        "unigram_lm_score",
        "classifier",
        "hash_embed",
        "split_documents",
    ],
)
def test_empty_corpus_yields_empty_result(ray_session, name):
    assert _count(_run(name)) == 0


def test_knn_join_empty_queries(ray_session):
    """ADVICE r3: an empty query Dataset returns an empty
    (query_id, neighbor_id, cosine, rank) result instead of IndexError."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.ops.similarity import knn_join

    corpus = ray.data.from_items(
        [{"vec_id": i, "embedding": np.ones(4) * (i + 1)} for i in range(3)]
    )
    queries = ray.data.from_pandas(
        pd.DataFrame({"query_id": pd.Series(dtype="int64"), "embedding": pd.Series(dtype=object)})
    )
    out = knn_join(queries, corpus, k=2)
    # zero-row to_pandas drops columns (Ray quirk), so assert on the
    # Dataset schema — what a downstream stage actually sees
    assert out.schema().names == ["query_id", "neighbor_id", "cosine", "rank"]
    assert out.count() == 0
