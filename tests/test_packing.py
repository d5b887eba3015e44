"""Sequence packing (kgray/ops/packing.py): the next-fit kernel math and
the distributed assignment's invariants."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.ops.packing import _next_fit, pack_sequences


def _spec_next_fit(lens, budget):
    """Row-by-row reference: the scalar next-fit transition."""
    bins, offs = [], []
    b, fill = 0, 0
    for i, L in enumerate(lens):
        if i == 0:
            bins.append(0)
            offs.append(0)
            fill = L
            continue
        if fill + L <= budget:
            bins.append(b)
            offs.append(fill)
            fill += L
        else:
            b += 1
            bins.append(b)
            offs.append(0)
            fill = L
    return np.array(bins), np.array(offs)


@pytest.mark.parametrize(
    "lens,budget",
    [
        ([5, 5, 5], 10),          # exact-fit boundary: 5+5 == 10 stays
        ([10, 1], 10),            # full first bin
        ([3, 20, 3], 10),         # oversized doc mid-stream gets own bin
        ([20], 10),               # oversized first doc
        ([1] * 25, 7),
        ([7, 7, 7, 7], 7),        # every doc exactly fills a bin
    ],
)
def test_next_fit_matches_scalar_spec(lens, budget):
    lens = np.asarray(lens, dtype=np.int64)
    bins, offs = _next_fit(lens, budget)
    sb, so = _spec_next_fit(lens, budget)
    np.testing.assert_array_equal(bins, sb)
    np.testing.assert_array_equal(offs, so)


def test_next_fit_random_vs_spec():
    rng = np.random.default_rng(7)
    for _ in range(20):
        lens = rng.integers(1, 40, size=rng.integers(1, 200)).astype(np.int64)
        budget = int(rng.integers(10, 120))
        bins, offs = _next_fit(lens, budget)
        sb, so = _spec_next_fit(lens, budget)
        np.testing.assert_array_equal(bins, sb)
        np.testing.assert_array_equal(offs, so)


def test_next_fit_empty():
    bins, offs = _next_fit(np.zeros(0, dtype=np.int64), 10)
    assert len(bins) == 0 and len(offs) == 0


def test_pack_sequences_invariants(ray_session):
    docs = ray.data.from_items(
        [{"doc_id": i, "text": " ".join(["tok"] * (3 + i % 11))} for i in range(200)]
    )
    out = pack_sequences(docs, budget=20, num_buckets=4).to_pandas()
    assert len(out) == 200
    assert set(out["doc_id"]) == set(range(200))
    # every non-singleton bin respects the budget; oversized docs would sit
    # alone (none here since max len 13 < 20)
    fills = out.groupby(["bucket", "bin_id"])["n_tokens"].sum()
    assert (fills <= 20).all()
    # offsets are the running prefix inside each bin in doc_id order
    for (_, _), g in out.sort_values("doc_id").groupby(["bucket", "bin_id"]):
        expect = np.concatenate(([0], np.cumsum(g["n_tokens"].to_numpy())[:-1]))
        np.testing.assert_array_equal(g["offset_tokens"].to_numpy(), expect)
    # bins are dense per bucket starting at 0
    for _, g in out.groupby("bucket"):
        ids = np.sort(g["bin_id"].unique())
        np.testing.assert_array_equal(ids, np.arange(len(ids)))


def test_pack_sequences_oversized_doc_isolated(ray_session):
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": " ".join(["a"] * 5)},
            {"doc_id": 1, "text": " ".join(["b"] * 50)},  # oversized
            {"doc_id": 2, "text": " ".join(["c"] * 5)},
        ]
    )
    out = (
        pack_sequences(docs, budget=10, num_buckets=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["bin_id"].tolist() == [0, 1, 2]
    assert out["offset_tokens"].tolist() == [0, 0, 0]
