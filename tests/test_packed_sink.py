"""Packed-corpus training-shard sink (kgray/ops/packing.py
write_packed_corpus): partitioned output, exact resume semantics."""

import os
import shutil

import duckdb
import pandas as pd
import ray.data

from kgray.ops.packing import pack_sequences, write_packed_corpus

ROWS = [{"doc_id": i, "text": " ".join([f"t{j}" for j in range(3 + i % 9)])} for i in range(120)]


def _readback(out_dir: str) -> pd.DataFrame:
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{out_dir}/bucket=*/data.parquet')"
    ).df()


def test_fresh_write_matches_assignment(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    summary = write_packed_corpus(
        ray.data.from_items(ROWS), out, budget=20, num_buckets=4
    )
    assert summary["bucket"].tolist() == [0, 1, 2, 3]
    assert summary["n_docs"].sum() == 120
    back = _readback(out).sort_values("doc_id").reset_index(drop=True)
    assert len(back) == 120
    # the shard's (bin_id, offset, n_tokens) equals the assignment-only op
    assign = (
        pack_sequences(ray.data.from_items(ROWS), budget=20, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for col in ("bin_id", "offset_tokens", "n_tokens"):
        assert back[col].tolist() == assign[col].tolist(), col
    # texts survive the shuffle intact
    assert back["text"].tolist() == [r["text"] for r in ROWS]


def test_resume_rewrites_only_missing_buckets(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    fresh = write_packed_corpus(ray.data.from_items(ROWS), out, budget=20, num_buckets=4)
    kept_mtime = os.path.getmtime(os.path.join(out, "bucket=0", "data.parquet"))
    shutil.rmtree(os.path.join(out, "bucket=2"))
    resumed = write_packed_corpus(ray.data.from_items(ROWS), out, budget=20, num_buckets=4)
    pd.testing.assert_frame_equal(fresh, resumed)
    # untouched bucket was not rewritten
    assert os.path.getmtime(os.path.join(out, "bucket=0", "data.parquet")) == kept_mtime
    assert os.path.exists(os.path.join(out, "bucket=2", "_DONE"))


def test_fully_done_run_is_a_noop(ray_session, tmp_path):
    out = str(tmp_path / "shards")
    fresh = write_packed_corpus(ray.data.from_items(ROWS), out, budget=20, num_buckets=4)
    mtimes = {
        k: os.path.getmtime(os.path.join(out, f"bucket={k}", "data.parquet"))
        for k in range(4)
    }
    again = write_packed_corpus(ray.data.from_items(ROWS), out, budget=20, num_buckets=4)
    pd.testing.assert_frame_equal(fresh, again)
    for k in range(4):
        assert os.path.getmtime(os.path.join(out, f"bucket={k}", "data.parquet")) == mtimes[k]
