"""Pins for winnowing (MOSS) fingerprint matching and langid confusion."""

import pandas as pd
import ray.data

from kgray.ops.dedup import winnowing_pairs
from kgray.ops.text import langid_confusion, token_length_hist


def test_winnowing_finds_moved_passage(ray_session):
    passage = "this exact shared passage survives being moved around in the document"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "intro words before. " + passage + " trailing one",
                passage + " completely different remainder of text here",
                "no overlap with the others at all, a separate subject entirely",
            ],
        }
    )
    out = winnowing_pairs(ray.data.from_pandas(docs)).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnowing_short_docs_no_crash(ray_session):
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["tiny", "texts"]})
    out = winnowing_pairs(ray.data.from_pandas(docs)).to_pandas()
    assert len(out) == 0


def test_langid_confusion_diagonal(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "the cat is on the mat and it is warm",
                "el gato es un animal y la casa es grande",
            ],
            "lang": ["en", "es"],
        }
    )
    out = langid_confusion(ray.data.from_pandas(docs))
    m = {(r["lang"], r["pred_lang"]): r["n"] for _, r in out.iterrows()}
    assert m.get(("en", "en")) == 1
    assert m.get(("es", "es")) == 1


def test_token_length_hist(ray_session):
    docs = pd.DataFrame({"text": ["a bb  ccc", "bb"]})
    out = token_length_hist(ray.data.from_pandas(docs))
    m = dict(zip(out["tok_len"], out["n_tokens"]))
    # the double space yields an empty token which is excluded
    assert m == {1: 1, 2: 2, 3: 1}
