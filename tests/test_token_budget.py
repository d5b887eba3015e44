"""sample_to_token_budget (kgray.ops.curation): the kept set must be the
exact maximal (md5(id), id)-ordered prefix fitting the budget, invariant
to partitioning, with sane all-fit / nothing-fits edges."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.curation import sample_to_token_budget
from kgray.ops.dedup import _md5_u64_np


def _docs(n=60, seed=2):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [" ".join(["w"] * int(rng.integers(3, 40))) for _ in range(n)],
        }
    )


def _expected(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    d = df.copy()
    d["h"] = _md5_u64_np([str(x) for x in d["doc_id"]])
    d["n_tokens"] = [t.count(" ") + 1 for t in d["text"]]
    d = d.sort_values(["h", "doc_id"], kind="mergesort")
    d = d[d["n_tokens"].cumsum() <= budget]
    return (
        d[["doc_id", "n_tokens"]]
        .astype("int64")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _run(df, budget, parts=1):
    ds = ray.data.from_pandas(df)
    if parts > 1:
        ds = ds.repartition(parts)
    out = sample_to_token_budget(ds, budget_tokens=budget).to_pandas()
    if "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_tokens": pd.Series(dtype="int64")})
    return out.astype("int64").sort_values("doc_id").reset_index(drop=True)


def test_budget_exact_boundary(ray_session):
    df = _docs()
    total = sum(t.count(" ") + 1 for t in df["text"])
    budget = total // 2
    got = _run(df, budget)
    want = _expected(df, budget)
    pd.testing.assert_frame_equal(got, want)
    assert 0 < len(got) < len(df)
    assert got["n_tokens"].sum() <= budget


def test_budget_partition_invariance_and_edges(ray_session):
    df = _docs(40, seed=9)
    total = int(sum(t.count(" ") + 1 for t in df["text"]))
    budget = total // 3
    pd.testing.assert_frame_equal(_run(df, budget, parts=7), _expected(df, budget))
    # everything fits
    assert len(_run(df, total)) == len(df)
    assert len(_run(df, total + 10)) == len(df)
    # nothing fits (budget below the smallest first document)
    assert len(_run(df, 0)) == 0
