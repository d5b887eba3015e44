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


def test_round4_ops_empty_inputs(ray_session):
    """Round-4 ops on zero-row (typed) inputs: stream through, no crash."""
    import numpy as np

    from kgray.functions.graph import adamic_adar
    from kgray.ops.dedup import dup_ngram_fraction
    from kgray.ops.stats import rolling_distinct_per_day
    from kgray.ops.temporal import sessionize
    from kgray.ops.transcripts import conversation_stats

    docs = _empty_docs()
    assert _count(dup_ngram_fraction(docs)) == 0

    events = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "event_id": pa.array([], pa.int64()),
            }
        )
    )
    assert _count(sessionize(events)) == 0

    days = ray.data.from_arrow(
        pa.table(
            {"day": pa.array([], pa.string()), "user_id": pa.array([], pa.int64())}
        )
    )
    assert _count(rolling_distinct_per_day(days)) == 0

    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    )
    assert _count(adamic_adar(edges)) == 0

    transcripts = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "role": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "tool": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        )
    )
    assert _count(conversation_stats(transcripts)) == 0


def test_hash_join_empty_sides(ray_session):
    """hash_join streams zero-row typed sides (parquet-backed empties are
    routine at scale); an empty PANDAS-block side without Arrow schema is
    the documented unsupported case and raises."""
    from kgray.ops.join import hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "lv": pa.array([], pa.string())})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([], pa.int64()), "rv": pa.array([], pa.float64())})
    )
    assert _count(hash_join(left, right, "k", "rk")) == 0

    nonempty = ray.data.from_pandas(pd.DataFrame({"rk": [1], "rv": [2.0]}))
    assert _count(hash_join(left, nonempty, "k", "rk")) == 0

    empty_pandas = ray.data.from_pandas(pd.DataFrame({"k": [], "lv": []}))
    with pytest.raises(ValueError, match="empty non-Arrow"):
        hash_join(empty_pandas, nonempty, "k", "rk")
