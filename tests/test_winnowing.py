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


def test_winnowing_md5_mode_finds_moved_passage(ray_session):
    passage = "this exact shared passage survives being moved around in the document"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "intro words before. " + passage + " trailing one",
                passage + " completely different remainder of text here",
            ],
        }
    )
    out = winnowing_pairs(ray.data.from_pandas(docs), hash_mode="md5").to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(1, 2)}


def test_winnowing_poly_duckdb_parity_multibyte(ray_session):
    """The vectorized UTF-32 poly-hash kernel must reproduce the DuckDB
    twin bit-for-bit, including on multibyte (code-point ≠ byte) text."""
    import duckdb

    import __ray_entry__ as entry

    passage = "this exact shared passage survives being moved around in the document"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "intro words before. " + passage + " trailing one",
                passage + " completely different remainder of text here",
                "no overlap with the others at all, a separate subject entirely",
                "短い中文テキスト with mixed 多字节 content long enough to matter " + passage,
            ],
        }
    )
    out = (
        winnowing_pairs(ray.data.from_pandas(docs))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.register("documents", docs)
    oracle = (
        con.execute(entry._winnowing_oracle_sql())
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(out, oracle)


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
