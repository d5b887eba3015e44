"""Training-data operator tests: dedup, similarity, text analysis,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.ops import dedup as dd
from kgray.ops import text as tx
from kgray.ops.multimodal import extract_features
from kgray.ops.similarity import knn_bruteforce, knn_lsh


@pytest.fixture(scope="module")
def docs():
    base = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "pack my box with five dozen liquor jugs before the morning train leaves",
        "how vexingly quick daft zebras jump over the sleeping guard dog",
        "sphinx of black quartz judge my vow said the old librarian quietly",
    ]
    rows = []
    # exact duplicates of doc 0, near-duplicate of doc 1 (one word changed),
    # and unrelated docs
    rows.append((0, base[0]))
    rows.append((1, base[0]))  # exact dup
    rows.append((2, base[1]))
    rows.append((3, base[1].replace("morning", "evening")))  # near dup
    rows.append((4, base[2]))
    rows.append((5, base[3]))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    return ray.data.from_pandas(df)


def test_exact_dedup(docs):
    out = dd.exact_dedup(docs).to_pandas()
    assert len(out) == 5  # 6 docs, one exact-dup pair
    dup = out[out["n_dups"] == 2]
    assert len(dup) == 1 and dup["doc_id"].iloc[0] == 0  # min doc_id survives


def test_minhash_lsh_dedup(docs):
    out = dd.minhash_lsh_dedup(docs, threshold=0.4).to_pandas()
    m = dict(zip(out["doc_id"], out["canonical_id"]))
    assert m[1] == 0  # exact dup clustered
    assert m[3] == 2  # near dup clustered
    assert m[4] == 4 and m[5] == 5  # unrelated untouched


def test_simhash_pairs(docs):
    out = dd.simhash_near_dup_pairs(docs, max_hamming=8).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 1) in pairs  # exact dup → hamming 0
    assert out[(out.a == 0) & (out.b == 1)]["hamming"].iloc[0] == 0
    assert (out["starred"] == 0).all()  # no bucket exceeded max_bucket
    assert (3, 5) not in pairs and (2, 5) not in pairs


def test_simhash_giant_bucket_star_links_no_member_lost():
    """A 500-member exact-duplicate bucket (mass boilerplate) must keep
    every member reachable from the representative — star-linked, never
    silently truncated (VERDICT r2 #1)."""
    n = 500
    df = pd.DataFrame({"doc_id": np.arange(n), "text": ["copy paste boilerplate"] * n})
    ds = ray.data.from_pandas(df)
    out = dd.simhash_near_dup_pairs(ds, max_hamming=8, max_bucket=200).to_pandas()
    # every non-min doc is linked to doc 0 (identical signature → one
    # bucket per band, all four over-sized → starred everywhere)
    assert set(out["a"]) == {0}
    assert set(out["b"]) == set(range(1, n))
    assert (out["hamming"] == 0).all()
    assert (out["starred"] == 1).all()
    # and the components built on the pairs recover the full cluster
    from kgray.functions.graph import connected_components

    comp = connected_components(ray.data.from_pandas(out[["a", "b"]]))
    assert len(comp) == n and (comp["component"] == 0).all()


def test_simhash_pairs_empty_corpus_keeps_schema():
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", "zz qq ww ee rr tt yy uu"]})
    )
    out = dd.simhash_near_dup_pairs(ds).to_pandas()
    assert len(out) == 0 or set(out.columns) >= {"a", "b", "hamming", "starred"}


def test_ngram_jaccard(docs):
    out = dd.ngram_jaccard_pairs(docs, threshold=0.5)
    pairs = set(zip(out["a"], out["b"]))
    assert (0, 1) in pairs
    got = out[(out.a == 0) & (out.b == 1)]["jaccard"].iloc[0]
    assert got == 1.0


def test_embedding_near_dup():
    rng = np.random.default_rng(3)
    base = rng.standard_normal((4, 8))
    rows = []
    vid = 0
    for label in (0, 1):
        for i in range(4):
            rows.append((vid, list(base[i] + 0.01 * rng.standard_normal(8) + 5 * label), label))
            vid += 1
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    ds = ray.data.from_pandas(df)
    out = dd.embedding_near_dup_pairs(ds, threshold=0.99).to_pandas()
    # label-1 vectors are base+5 → all mutually similar; label 0 not
    assert ((out["a"] >= 4) & (out["b"] >= 4)).any()
    assert not out.empty
    assert (out["cosine"] >= 0.99).all()


def test_knn_bruteforce_and_lsh_recall():
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((300, 16))
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(mat)})
    ds = ray.data.from_pandas(df)
    qids, qmat = np.arange(3), mat[:3]
    exact = knn_bruteforce(ds, qids, qmat, k=5)
    assert len(exact) == 15
    assert (exact.groupby("query_id")["rank"].max() == 5).all()
    # self excluded
    assert not ((exact["query_id"] == exact["neighbor_id"]).any())
    # rank 1 = nearest: verify directly for q0
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit[0] @ unit.T
    sims[0] = -9
    assert exact[exact.query_id == 0].iloc[0]["neighbor_id"] == int(np.argmax(sims))

    approx = knn_lsh(ds, qids, qmat, k=5, n_planes=4)
    hits = len(
        set(zip(exact["query_id"], exact["neighbor_id"]))
        & set(zip(approx["query_id"], approx["neighbor_id"]))
    )
    assert hits / len(exact) >= 0.5  # multi-probe recall on random data

    from kgray.ops.similarity import knn_ivf

    ivf = knn_ivf(ds, qids, qmat, k=5, n_centroids=8, nprobe=4)
    ivf_hits = len(
        set(zip(exact["query_id"], exact["neighbor_id"]))
        & set(zip(ivf["query_id"], ivf["neighbor_id"]))
    )
    assert ivf_hits / len(exact) >= 0.5  # nprobe=half the lists on random data


def test_token_stats_and_fingerprint(docs):
    out = docs.map_batches(tx.token_stats, batch_format="pyarrow").to_pandas()
    row = out[out.doc_id == 0].iloc[0]
    assert row["n_tokens"] == 13 and row["n_chars"] == len(
        "the quick brown fox jumps over the lazy dog again and again today"
    )
    fp = docs.map_batches(tx.fingerprint, batch_format="pyarrow").to_pandas()
    assert fp["fp"].str.len().eq(16).all()
    assert fp[fp.doc_id == 0]["fp"].iloc[0] == fp[fp.doc_id == 1]["fp"].iloc[0]


def test_langid():
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                "the cat sat on the mat and it was happy with the sun",
                "le chat est dans la maison et il regarde les oiseaux dans le jardin",
                "der Hund ist in dem Haus und die Katze ist nicht da",
                "el perro es grande y la casa es blanca con un jardín",
                "这是一个中文文档的例子",
            ],
        }
    )
    ds = ray.data.from_pandas(df)
    out = ds.map_batches(tx.LangId, batch_format="pandas", concurrency=1).to_pandas()
    assert out.sort_values("doc_id")["pred_lang"].tolist() == ["en", "fr", "de", "es", "zh"]


def test_quality_score(docs):
    out = docs.map_batches(tx.quality_score, batch_format="pandas").to_pandas()
    assert (out["quality"] > 0).all() and (out["quality"] <= 1.0).all()
    assert (out["rep_ratio"] >= 0).all()


def test_multimodal_plumbing(docs):
    out = extract_features(docs, dim=8).to_pandas()
    assert len(out) == 6
    assert (out["payload_bytes"] > 0).all()
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (6, 8)
    # deterministic: same payload → same features (docs 0 and 1 identical)
    f = out.set_index("doc_id")["features"]
    assert np.allclose(np.asarray(f[0]), np.asarray(f[1]))
    # stub gate: real decoder path clearly marked unavailable
    from kgray.ops.multimodal import FeatureExtractor

    with pytest.raises(NotImplementedError):
        FeatureExtractor(use_real_decoder=True)


def test_frame_sampling(ray_session):
    import hashlib

    from kgray.ops.multimodal import FrameSampler, sample_frames

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a" * 600, "xy"]})
    out = (
        sample_frames(ray.data.from_pandas(df), frame_size=256)
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    # doc 1: 600 bytes -> frames of 256, 256, 88; doc 2: one 2-byte frame
    assert out["frame_len"].tolist() == [256, 256, 88, 2]
    assert out["frame_idx"].tolist() == [0, 1, 2, 0]
    assert bytes(out.loc[3, "frame"]) == b"xy"
    assert out.loc[3, "frame_md5"] == hashlib.md5(b"xy").hexdigest()

    capped = sample_frames(
        ray.data.from_pandas(df), frame_size=256, max_frames=2
    ).to_pandas()
    assert len(capped[capped["doc_id"] == 1]) == 2

    with pytest.raises(NotImplementedError):
        FrameSampler(use_real_decoder=True)


def test_kmeans_assign_and_semdedup(ray_session):
    from kgray.ops.similarity import kmeans_assign, semantic_dedup

    rng = np.random.default_rng(5)
    base = rng.standard_normal((4, 16))
    rows = []
    vid = 0
    for b in base:
        for _ in range(10):  # 10 tight copies per seed vector
            rows.append((vid, b + rng.standard_normal(16) * 0.01))
            vid += 1
    df = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ds = ray.data.from_pandas(df)

    out = kmeans_assign(ds, n_centroids=4).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(out) == 40
    assert out["cluster"].between(0, 3).all()
    assert (out["cos_centroid"] <= 1.0 + 1e-9).all()
    # random init may split or merge tight groups across centroids, but a
    # group's members always co-locate with SOME of their own group (no
    # member strays to a cluster with none of its siblings)
    out["g"] = out["vec_id"] // 10
    assert (out.groupby(["g", "cluster"]).size() >= 2).all()

    # within a cluster, same-group pairs have cos ~0.9998 (dups) while
    # cross-group pairs are near-orthogonal — so the canonical classes are
    # exactly the (cluster, group) cells, each keeping its min vec_id
    dedup = semantic_dedup(ds, threshold=0.99, n_centroids=4).to_pandas()
    assert len(dedup) == 40
    canon = dedup.set_index("vec_id")["canonical_id"]
    cell_min = out.groupby(["cluster", "g"])["vec_id"].transform("min").to_numpy()
    assert (canon.loc[out["vec_id"]].to_numpy() == cell_min).all()


def test_unigram_lm_score(ray_session):
    from kgray.ops.text import unigram_lm_score

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "spam spam spam spam spam spam spam spam",
                "quick brown fox jumps over lazy dog spam",
                "spam spam spam spam quick brown fox dog",
            ],
        }
    )
    out = (
        unigram_lm_score(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out["n_tokens"].tolist() == [8, 8, 8]
    # all-repetition doc carries the fewest bits/token; the all-distinct
    # doc (of corpus-rare tokens) the most
    assert out.loc[1, "bits_per_token"] < out.loc[3, "bits_per_token"]
    assert out.loc[3, "bits_per_token"] < out.loc[2, "bits_per_token"]
    # exact value: p(spam)=13/24 for doc 1
    import math

    assert out.loc[1, "bits_per_token"] == pytest.approx(-math.log2(13 / 24), abs=1e-6)


def test_image_resize(ray_session):
    import hashlib

    from kgray.ops.multimodal import ImageResizer, resize_images

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a" * 2000, "xy"]})
    out = (
        resize_images(ray.data.from_pandas(df), width=32, height=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1: 2000 bytes truncated to 32*32=1024; doc 2: short payload kept
    assert out["n_bytes"].tolist() == [1024, 2]
    assert out["width"].tolist() == [32, 32] and out["height"].tolist() == [32, 32]
    assert bytes(out.loc[0, "resized"]) == b"a" * 1024
    assert out.loc[1, "content_md5"] == hashlib.md5(b"xy").hexdigest()

    # real decode is now supported for BMP/PPM (kgray/functions/codecs.py);
    # exotic codecs still fail loudly at decode time — NotImplementedError
    # without PIL (this sandbox), PIL's own error where it is installed
    from kgray.ops.multimodal import _HAVE_IMAGE_LIBS

    expected = Exception if _HAVE_IMAGE_LIBS else NotImplementedError
    with pytest.raises(expected):
        ImageResizer(use_real_decoder=True)._decode(b"\x89PNG....")


def test_audio_windowing(ray_session):
    import hashlib

    from kgray.ops.multimodal import AudioWindower, window_audio

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a" * 300, "xy"]})
    out = (
        window_audio(ray.data.from_pandas(df), window=256, hop=128)
        .to_pandas()
        .sort_values(["doc_id", "win_idx"])
        .reset_index(drop=True)
    )
    # doc 1 (300 bytes): starts 0/128/256 → lens 256, 172, 44; doc 2: one 2-byte window
    assert out["win_len"].tolist() == [256, 172, 44, 2]
    assert out["win_idx"].tolist() == [0, 1, 2, 0]
    # overlap: window 1 starts at byte 128 while window 0 runs to 255
    assert bytes(out.loc[1, "window"]) == b"a" * 172
    assert out.loc[3, "win_md5"] == hashlib.md5(b"xy").hexdigest()

    capped = window_audio(
        ray.data.from_pandas(df), window=256, hop=128, max_windows=2
    ).to_pandas()
    assert len(capped[capped["doc_id"] == 1]) == 2

    # real WAV decode is now supported (kgray/functions/codecs.py); a
    # non-RIFF payload fails loudly at decode time
    import pyarrow as pa

    with pytest.raises(ValueError):
        AudioWindower(use_real_decoder=True)(
            pa.table({"doc_id": [1], "payload": pa.array([b"mp3junk"], pa.large_binary())})
        )


def test_split_documents_windows(ray_session):
    from kgray.ops.text import split_documents

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["abcdefghij", "abc", "abcdefgh"],  # chunk 6, overlap 2
        }
    )
    out = (
        split_documents(ray.data.from_pandas(df), chunk_chars=6, overlap=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out["doc_id"] == 1]
    # step 4: windows [0:6]="abcdef", [4:10]="efghij" (reaches end -> stop)
    assert d1["chunk_text"].tolist() == ["abcdef", "efghij"]
    assert out[out["doc_id"] == 2]["chunk_text"].tolist() == ["abc"]
    # len 8: [0:6]="abcdef" doesn't reach end, [4:8]="efgh" does
    assert out[out["doc_id"] == 3]["chunk_text"].tolist() == ["abcdef", "efgh"]
    with pytest.raises(ValueError):
        split_documents(ray.data.from_pandas(df), chunk_chars=4, overlap=4)


def test_filter_by_length_quantile(ray_session):
    from kgray.ops.text import filter_by_length_quantile

    df = pd.DataFrame({"doc_id": range(8), "n_chars": [1, 2, 3, 4, 5, 6, 7, 8]})
    # p25 of 8 values -> index ceil(0.25*8)-1 = 1 -> threshold 2
    out = (
        filter_by_length_quantile(ray.data.from_pandas(df).repartition(3), q=(1, 4))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["n_chars"].tolist() == [2, 3, 4, 5, 6, 7, 8]


def test_knn_join_matches_bruteforce_candidates_and_recall():
    """knn_join (both sides Datasets) must equal knn_bruteforce restricted
    to its probe-bucket candidate set, and hold reasonable recall."""
    from kgray.ops.similarity import knn_bruteforce, knn_join

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((400, 16))
    corpus = ray.data.from_pandas(
        pd.DataFrame({"vec_id": np.arange(400), "embedding": list(mat)})
    )
    queries = ray.data.from_pandas(
        pd.DataFrame({"query_id": np.arange(400), "embedding": list(mat)})
    )
    joined = knn_join(queries, corpus, k=5, n_planes=4).to_pandas()
    assert set(joined["query_id"]) == set(range(400))  # every query answered
    assert (joined.groupby("query_id")["rank"].max() <= 5).all()
    # recall@5 vs exact brute force
    exact = knn_bruteforce(corpus, np.arange(400), mat, k=5)
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    j = set(zip(joined["query_id"], joined["neighbor_id"]))
    recall = len(e & j) / len(e)
    assert recall >= 0.5, recall
    # within the candidate set the ranking is exact: top-1 cosine of the
    # join never exceeds the exact top-1
    top_j = joined[joined["rank"] == 1].set_index("query_id")["cosine"]
    top_e = exact[exact["rank"] == 1].set_index("query_id")["cosine"]
    assert (top_j <= top_e.loc[top_j.index] + 1e-9).all()


def test_token_entropy_orders_boilerplate_below_prose():
    from kgray.ops.text import token_entropy

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "spam spam spam spam spam spam spam spam",
                "the quick brown fox jumps over the lazy dog",
                "aa bb aa bb aa bb aa bb",
            ],
        }
    )
    out = token_entropy(ray.data.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[0, "entropy"] == 0.0 and out.loc[0, "n_distinct"] == 1
    assert out.loc[2, "entropy"] == 1.0  # two equiprobable tokens = 1 bit
    assert out.loc[1, "entropy"] > out.loc[2, "entropy"] > out.loc[0, "entropy"]


def test_knn_bruteforce_dims_truncation():
    """dims=d must equal full brute force over vectors pre-truncated to d."""
    rng = np.random.default_rng(23)
    mat = rng.standard_normal((200, 16))
    df = pd.DataFrame({"vec_id": np.arange(200), "embedding": list(mat)})
    ds = ray.data.from_pandas(df)
    qids, qmat = np.arange(4), mat[:4]
    trunc = knn_bruteforce(ds, qids, qmat, k=5, dims=8)

    dft = pd.DataFrame({"vec_id": np.arange(200), "embedding": list(mat[:, :8])})
    manual = knn_bruteforce(ray.data.from_pandas(dft), qids, qmat[:, :8], k=5)
    pd.testing.assert_frame_equal(
        trunc.reset_index(drop=True), manual.reset_index(drop=True)
    )
    # truncation changes the ranking (sanity: this corpus isn't degenerate)
    full = knn_bruteforce(ds, qids, qmat, k=5)
    assert set(zip(trunc["query_id"], trunc["neighbor_id"])) != set(
        zip(full["query_id"], full["neighbor_id"])
    )
