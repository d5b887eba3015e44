"""Property-based pinning of the vectorized Arrow merge kernel
(kgray/stages/merge.py) against a straightforward pandas reference: the
offset-arithmetic list concat, reduceat scalars and per-(triple,obs_date)
t_obs stamping must agree with the obvious row-by-row implementation on
arbitrary inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kgray.stages.merge import _OUT_COLS, _group_concat, _sorted_lists

_ids = st.sampled_from(["e_a", "e_b", "e_c", "e_d"])
_preds = st.sampled_from(["p1", "p2"])
_dates = st.sampled_from(["2021-01-01", "2021-02-02", "2021-03-03"])
_floats = st.floats(min_value=0.0, max_value=10.0, allow_nan=False)


@st.composite
def quintuple_rows(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            {
                "subj_id": draw(_ids),
                "pred": draw(_preds),
                "obj_id": draw(_ids),
                "subj_name": "sn",
                "subj_label": "sl",
                "obj_name": "on",
                "obj_label": "ol",
                "obs_date": draw(_dates),
                "sort_key": f"{draw(_dates)}|c|{i:05d}",
                "t_obs": draw(st.lists(_floats, max_size=3)),
                "t_start": draw(st.lists(_floats, max_size=3)),
                "t_end": draw(st.lists(_floats, max_size=3)),
                "atomic_facts": draw(
                    st.lists(st.sampled_from(["f1", "f2", "f3"]), max_size=3)
                ),
            }
        )
    return rows


def _to_table(rows) -> pa.Table:
    cols = {
        k: [r[k] for r in rows]
        for k in [
            "subj_id", "pred", "obj_id", "subj_name", "subj_label", "obj_name",
            "obj_label", "obs_date", "sort_key", "t_obs", "t_start", "t_end",
            "atomic_facts",
        ]
    }
    return pa.table(
        {
            **{k: pa.array(cols[k], type=pa.large_string())
               for k in ["subj_id", "pred", "obj_id", "subj_name", "subj_label",
                          "obj_name", "obj_label", "obs_date", "sort_key"]},
            **{k: pa.array(cols[k], type=pa.list_(pa.float64()))
               for k in ["t_obs", "t_start", "t_end"]},
            "atomic_facts": pa.array(cols["atomic_facts"], type=pa.list_(pa.large_string())),
        }
    )


def _reference_group_concat(rows, obs_dedup: bool):
    """Row-by-row spec: first row per (triple, obs_date) keeps its t_obs;
    groups keyed by triple concat lists in row order, sum n_obs, min
    first_seen, carry first row's names."""
    seen_dates = set()
    groups: dict = {}
    order: list = []
    for r in rows:
        key = (r["subj_id"], r["pred"], r["obj_id"])
        t_obs = r["t_obs"]
        if obs_dedup:
            dkey = key + (r["obs_date"],)
            if dkey in seen_dates:
                t_obs = []
            else:
                seen_dates.add(dkey)
        g = groups.get(key)
        if g is None:
            g = groups[key] = {
                "subj_name": r["subj_name"], "subj_label": r["subj_label"],
                "obj_name": r["obj_name"], "obj_label": r["obj_label"],
                "t_obs": [], "t_start": [], "t_end": [], "atomic_facts": [],
                "n_obs": 0, "first_seen": r["sort_key"],
            }
            order.append(key)
        g["t_obs"] += list(t_obs)
        g["t_start"] += list(r["t_start"])
        g["t_end"] += list(r["t_end"])
        g["atomic_facts"] += list(r["atomic_facts"])
        g["n_obs"] += 1
        g["first_seen"] = min(g["first_seen"], r["sort_key"])
    return {k: groups[k] for k in order}


@settings(max_examples=60, deadline=None)
@given(quintuple_rows(), st.booleans())
def test_group_concat_matches_reference(rows, obs_dedup):
    t = _to_table(rows)
    got = _group_concat(t, obs_dedup=obs_dedup)
    assert got.column_names == _OUT_COLS
    expected = _reference_group_concat(rows, obs_dedup)
    got_rows = {
        (r["subj_id"], r["pred"], r["obj_id"]): r for r in got.to_pylist()
    }
    assert set(got_rows) == set(expected)
    for key, exp in expected.items():
        g = got_rows[key]
        for c in ["t_obs", "t_start", "t_end", "atomic_facts"]:
            assert list(g[c]) == exp[c], (key, c)
        assert g["n_obs"] == exp["n_obs"]
        assert g["first_seen"] == exp["first_seen"]
        for c in ["subj_name", "subj_label", "obj_name", "obj_label"]:
            assert g[c] == exp[c]


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(_floats, max_size=5), max_size=20))
def test_sorted_lists_float(lists):
    la = pa.array(lists, type=pa.list_(pa.float64()))
    plain = _sorted_lists(la)
    assert [list(x) for x in plain.to_pylist()] == [sorted(l) for l in lists]
    uniq = _sorted_lists(la, unique=True)
    assert [list(x) for x in uniq.to_pylist()] == [sorted(set(l)) for l in lists]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["b", "a", "cc", ""]), max_size=5), max_size=15))
def test_sorted_lists_strings(lists):
    la = pa.array(lists, type=pa.list_(pa.large_string()))
    out = _sorted_lists(la)
    assert [list(x) for x in out.to_pylist()] == [sorted(l) for l in lists]


def _stamped(rows):
    """Pipeline invariant for the adaptive-partial equivalence: t_obs is the
    per-observation-date stamp (one float per row, determined by obs_date),
    exactly how kgray/stages/merge.py receives it from t_obs stamping."""
    date_ts = {"2021-01-01": 1.0, "2021-02-02": 2.0, "2021-03-03": 3.0}
    return [{**r, "t_obs": [date_ts[r["obs_date"]]]} for r in rows]


@settings(max_examples=60, deadline=None)
@given(quintuple_rows())
def test_partial_passthrough_equivalence(rows):
    """A pass-through partial (skip_ratio=0) must finalize to the exact
    same edges as the collapsing partial (skip_ratio=1): the within-block
    (triple, obs_date) stamp dedup is subsumed by the final unique pass."""
    from kgray.stages.merge import _final_bucket, _partial

    t = _to_table(_stamped(rows))
    collapsed = _partial(t, skip_ratio=1.0)
    passed = _partial(t, skip_ratio=0.0)
    assert passed.schema == collapsed.schema
    assert len(passed) == len(t)  # pass-through really passed through

    def finalize(p: pa.Table):
        if len(p) == 0:
            return {}
        withb = p.append_column("bucket", pa.array(np.zeros(len(p), dtype=np.int32)))
        out = _final_bucket(withb)
        return {(r["subj_id"], r["pred"], r["obj_id"]): r for r in out.to_pylist()}

    fa, fb = finalize(collapsed), finalize(passed)
    assert set(fa) == set(fb)
    for k in fa:
        for c in _OUT_COLS:
            assert fa[k][c] == fb[k][c], (k, c)
