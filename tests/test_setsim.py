"""Exact set-similarity join (kgray/ops/setsim.py): full-recall check
against a brute-force all-pairs reference, on both the driver-verify
rung and the distributed double-attach rung."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.dedup import MinHasher, _md5_u64_np
from kgray.ops.setsim import set_similarity_join


def _brute(df: pd.DataFrame, t: float) -> pd.DataFrame:
    mh = MinHasher()
    sets = {
        int(r.doc_id): set(np.unique(_md5_u64_np(sorted(mh._shingles(r.text)))).tolist())
        for r in df.itertuples()
    }
    rows = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= t:
                rows.append((a, b, np.floor(j * 1e6 + 0.5) / 1e6))
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"]).reset_index(drop=True)


def _corpus(n=60, seed=2):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)]
    texts, rows = [], []
    for d in range(n):
        if d >= 10 and rng.random() < 0.4:
            # near-duplicate of an earlier doc: perturb a few tokens
            base = texts[rng.integers(0, len(texts))].split()
            for _ in range(rng.integers(0, 3)):
                base[rng.integers(0, len(base))] = rng.choice(vocab)
            t = " ".join(base)
        else:
            t = " ".join(rng.choice(vocab, rng.integers(6, 30)))
        texts.append(t)
        rows.append((d, t))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_exact_join_matches_bruteforce_driver_rung():
    df = _corpus()
    want = _brute(df, 0.5)
    assert len(want) >= 3  # scenario has real near-dups
    got = set_similarity_join(ray.data.from_pandas(df), threshold=0.5)
    pd.testing.assert_frame_equal(got, want.astype({"a": "int64", "b": "int64"}))


def test_exact_join_matches_bruteforce_distributed_rung():
    df = _corpus(seed=9)
    want = _brute(df, 0.5)
    got = set_similarity_join(
        ray.data.from_pandas(df), threshold=0.5, driver_pair_max=0
    )
    pd.testing.assert_frame_equal(got, want.astype({"a": "int64", "b": "int64"}))


def test_exact_join_threshold_sweep():
    df = _corpus(seed=4)
    for t in (0.3, 0.7, 0.9):
        want = _brute(df, t)
        got = set_similarity_join(ray.data.from_pandas(df), threshold=t)
        if len(want):
            pd.testing.assert_frame_equal(got, want.astype({"a": "int64", "b": "int64"}))
        else:
            assert len(got) == 0


def test_exact_join_identical_and_empty_docs():
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["alpha beta gamma delta", "alpha beta gamma delta", "", ""],
        }
    )
    got = set_similarity_join(ray.data.from_pandas(df), threshold=0.5)
    assert got.to_dict("list") == {"a": [0, 2], "b": [1, 3], "jaccard": [1.0, 1.0]}
