"""Inter-document novelty score (kgray/ops/curation.py novelty_stats)."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.curation import novelty_stats


def _run(rows, **kw):
    return (
        novelty_stats(ray.data.from_items(rows), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_shared_gram_counts_as_duplicated(ray_session):
    rows = [
        {"doc_id": 0, "text": "a b c d x"},   # grams: 'a b c d', 'b c d x'
        {"doc_id": 1, "text": "a b c d y"},   # shares 'a b c d'
        {"doc_id": 2, "text": "p q r s t"},   # all novel
    ]
    out = _run(rows, n=4, min_docs=2)
    assert out["n_grams"].tolist() == [2, 2, 2]
    assert out["n_dup"].tolist() == [1, 1, 0]
    assert out.loc[0, "dup_frac"] == 0.5
    assert out.loc[2, "dup_frac"] == 0.0


def test_short_docs_emit_no_row(ray_session):
    rows = [
        {"doc_id": 0, "text": "a b c"},        # 3 tokens < n=4 -> no grams
        {"doc_id": 1, "text": "a b c d"},
    ]
    out = _run(rows, n=4, min_docs=2)
    assert out["doc_id"].tolist() == [1]
    assert out.loc[0, "n_dup"] == 0


def test_within_doc_repeat_is_not_duplication(ray_session):
    # the same gram twice in ONE doc: distinct-per-doc collapses it, so
    # the distinct-doc count stays 1 -> not common
    rows = [
        {"doc_id": 0, "text": "a b c d a b c d"},
        {"doc_id": 1, "text": "x y z w v u t s"},
    ]
    out = _run(rows, n=4, min_docs=2)
    assert out.loc[0, "n_dup"] == 0


def test_partition_invariance(ray_session):
    rows = [{"doc_id": i, "text": f"shared lead gram here u{i} v{i} w{i}"} for i in range(30)]
    a = _run(rows, n=4, min_docs=2)
    b = (
        novelty_stats(ray.data.from_items(rows).repartition(11), n=4, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_dup"] >= 1).all()


def test_weighted_sample_prefers_long_docs(ray_session):
    """Efraimidis-Spirakis: ln(u)/w with larger w pulls priorities toward
    0, so heavy docs are overrepresented; the sample is deterministic and
    partition-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data

    from kgray.ops.curation import weighted_sample_topn

    rng = np.random.default_rng(11)
    rows = []
    for i in range(400):
        # even ids: 200-token docs; odd ids: 2-token docs
        n = 200 if i % 2 == 0 else 2
        rows.append((i, " ".join(rng.choice(["a", "b", "c", "d"], size=n))))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = weighted_sample_topn(ray.data.from_pandas(df), n=40)
    assert len(out) == 40
    long_share = (out["doc_id"] % 2 == 0).mean()
    assert long_share > 0.8  # 100x weight ratio dominates the sample
    out2 = weighted_sample_topn(ray.data.from_pandas(df).repartition(7), n=40)
    assert out2.equals(out)
