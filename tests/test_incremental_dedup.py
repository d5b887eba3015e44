"""Incremental dedup vs a persisted hash store (kgray/ops/dedup.py
dedup_against_store)."""

import pandas as pd
import ray.data

from kgray.ops.dedup import dedup_against_store


def _docs(rows):
    return ray.data.from_items(rows)


def test_three_batch_evolution(ray_session, tmp_path):
    store = str(tmp_path / "hashes")
    # batch 1: two distinct texts, one internal dup -> keep-first
    b1 = dedup_against_store(
        _docs(
            [
                {"doc_id": 3, "text": "alpha"},
                {"doc_id": 1, "text": "alpha"},
                {"doc_id": 2, "text": "beta"},
            ]
        ),
        store,
    ).to_pandas()
    assert sorted(b1["doc_id"]) == [1, 2]  # keep min id of 'alpha'
    # batch 2: one seen text, one new
    b2 = dedup_against_store(
        _docs([{"doc_id": 10, "text": "alpha"}, {"doc_id": 11, "text": "gamma"}]),
        store,
    ).to_pandas()
    assert b2["doc_id"].tolist() == [11]
    # batch 3: everything seen -> empty
    b3 = dedup_against_store(
        _docs([{"doc_id": 20, "text": "beta"}, {"doc_id": 21, "text": "gamma"}]),
        store,
    ).to_pandas()
    assert len(b3) == 0


def test_two_batch_equals_oneshot_keep_first(ray_session, tmp_path):
    rows = [{"doc_id": i, "text": f"t{i % 7}"} for i in range(30)]
    store = str(tmp_path / "hashes")
    a = dedup_against_store(_docs(rows[:15]), store).to_pandas()
    b = dedup_against_store(_docs(rows[15:]), store).to_pandas()
    both = pd.concat([a, b]).sort_values("doc_id").reset_index(drop=True)
    oneshot = dedup_against_store(
        _docs(rows), str(tmp_path / "hashes2")
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(both, oneshot)


def test_empty_batch_against_store(ray_session, tmp_path):
    import pyarrow as pa

    store = str(tmp_path / "hashes")
    dedup_against_store(_docs([{"doc_id": 0, "text": "x"}]), store).materialize()
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert dedup_against_store(empty, store).count() == 0
