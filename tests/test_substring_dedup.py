"""Pins for the exact-substring (window/stride) duplication audit."""

import pandas as pd
import ray.data

from kgray.ops.dedup import substring_dedup


def test_substring_dedup_flags_shared_passage(ray_session):
    shared = "x" * 25 + "THE SHARED BOILERPLATE PASSAGE " + "y" * 30
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [shared + " unique tail one", shared + " other tail", "z" * 90],
        }
    )
    out = substring_dedup(ray.data.from_pandas(docs), window=40, stride=20).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 2, 3]
    # docs 1 and 2 share their first windows; doc 3 shares nothing
    assert out.loc[0, "dup_windows"] > 0
    assert out.loc[1, "dup_windows"] > 0
    assert out.loc[2, "dup_windows"] == 0
    assert 0.0 < out.loc[0, "dup_fraction"] <= 1.0


def test_substring_dedup_short_docs_zero_windows(ray_session):
    docs = pd.DataFrame({"doc_id": [10, 11], "text": ["tiny", "also small"]})
    out = substring_dedup(ray.data.from_pandas(docs), window=40, stride=20).to_pandas()
    assert (out["n_windows"] == 0).all()
    assert (out["dup_fraction"] == 0.0).all()
    assert len(out) == 2


def test_substring_dedup_within_doc_repeat_not_flagged(ray_session):
    # a window repeated INSIDE one doc is not cross-doc duplication
    rep = ("abcdefghij" * 4) + ("abcdefghij" * 4)
    docs = pd.DataFrame({"doc_id": [1], "text": [rep]})
    out = substring_dedup(ray.data.from_pandas(docs), window=40, stride=20).to_pandas()
    assert out.loc[0, "dup_windows"] == 0
