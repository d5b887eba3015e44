"""knn_against_store (kgray.ops.similarity): the persisted vector store
must answer exactly like a direct knn_join against the same corpus, the
result must be as-of the call (the append can't leak into it), and an
empty store yields a typed empty result."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.similarity import knn_against_store, knn_join, vector_store_append


def _emb_frame(ids, seed=3, dim=16):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "vec_id": np.asarray(ids, dtype=np.int64),
            "embedding": [rng.standard_normal(dim).astype(np.float32) for _ in ids],
        }
    )


def test_store_matches_direct_join(ray_session, tmp_path):
    base = _emb_frame(range(0, 40, 2), seed=3)
    news = _emb_frame(range(1, 41, 2), seed=4)
    store = str(tmp_path / "vs")
    vector_store_append(ray.data.from_pandas(base), store)
    got = (
        knn_against_store(ray.data.from_pandas(news), store, k=3)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    queries = ray.data.from_pandas(news.rename(columns={"vec_id": "query_id"}))
    want = (
        knn_join(queries, ray.data.from_pandas(base), k=3)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0

    # as-of semantics: the first call's result contained NO odd neighbor
    # even though the odd vectors were appended by that same call …
    assert (got["neighbor_id"] % 2 == 0).all()
    # … and a second run sees them (store grew)
    probe = _emb_frame([1000], seed=5)
    got2 = knn_against_store(ray.data.from_pandas(probe), store, k=40, append=False).to_pandas()
    assert (got2["neighbor_id"] % 2 == 1).any()


def test_store_empty_init(ray_session, tmp_path):
    store = str(tmp_path / "vs-empty")
    news = _emb_frame([7, 9], seed=6)
    out = knn_against_store(ray.data.from_pandas(news), store, k=3)
    assert out.schema().names == ["query_id", "neighbor_id", "cosine", "rank"]
    assert out.count() == 0
    # the call still seeded the store: a second call answers exactly like
    # a direct knn_join against those vectors (multiprobe LSH on both
    # sides — candidate sets identical by construction)
    probe = _emb_frame(range(100, 140), seed=7)
    again = (
        knn_against_store(ray.data.from_pandas(probe), store, k=3, append=False)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    direct = (
        knn_join(
            ray.data.from_pandas(probe.rename(columns={"vec_id": "query_id"})),
            ray.data.from_pandas(news),
            k=3,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    if len(direct):
        pd.testing.assert_frame_equal(again, direct)
        assert set(again["neighbor_id"]) <= {7, 9}
    else:
        assert len(again) == 0


def test_quantize_embeddings_bounds(ray_session):
    """Reconstruction error is bounded by scale/2 per dim; constant dims
    reconstruct exactly; partition invariance holds (global min/max)."""
    from kgray.ops.similarity import quantize_embeddings

    rng = np.random.default_rng(12)
    mat = rng.standard_normal((80, 8))
    mat[:, 3] = 2.5  # constant dim
    df = pd.DataFrame(
        {"vec_id": range(80), "embedding": [r.astype(np.float32) for r in mat]}
    )
    out = (
        quantize_embeddings(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    spans = mat.astype(np.float64).max(0) - mat.astype(np.float64).min(0)
    max_half_step = (spans / 255.0).max() / 2
    assert (out["max_abs_err"] <= max_half_step + 1e-9).all()
    assert (out["mean_abs_err"] <= out["max_abs_err"]).all()

    out7 = (
        quantize_embeddings(ray.data.from_pandas(df).repartition(7))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out7)
