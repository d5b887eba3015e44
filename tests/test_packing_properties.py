"""Property tests (hypothesis) for the packing kernel and the Arrow
segmenter — the two vectorized kernels new ops build on."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kgray.ops.dedup import _segments
from kgray.ops.packing import _next_fit


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=200), max_size=300),
    st.integers(min_value=1, max_value=100),
)
def test_next_fit_invariants(lens, budget):
    lens = np.asarray(lens, dtype=np.int64)
    bins, offs = _next_fit(lens, budget)
    if not len(lens):
        assert len(bins) == 0
        return
    # bins are non-decreasing, dense, start at 0
    assert bins[0] == 0
    d = np.diff(bins)
    assert ((d == 0) | (d == 1)).all()
    # every multi-doc bin's fill respects the budget; a lone doc may exceed
    for b in np.unique(bins):
        m = bins == b
        if m.sum() > 1:
            assert lens[m].sum() <= budget
    # offsets are the within-bin running prefix
    fill = 0
    for i in range(len(lens)):
        if i > 0 and bins[i] == bins[i - 1]:
            assert offs[i] == fill
        else:
            assert offs[i] == 0
            fill = 0
        fill += lens[i]
    # an oversized doc always sits alone
    for i in np.flatnonzero(lens > budget):
        assert (bins == bins[i]).sum() == 1


_token = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.lists(_token, min_size=1, max_size=30).map(" ".join), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=7),
)
def test_segments_roundtrip(texts, seg_tokens):
    arr = pa.array(texts, type=pa.large_string())
    doc_of, segs, nseg = _segments(arr, seg_tokens)
    segs = segs.to_pylist()
    # joining a doc's segments with ' ' reconstructs the doc exactly
    for d, text in enumerate(texts):
        mine = [segs[i] for i in np.flatnonzero(doc_of == d)]
        assert " ".join(mine) == text
        # ceil(len/seg_tokens) segments, each of <= seg_tokens tokens
        n_tok = len(text.split(" "))
        assert nseg[d] == -(-n_tok // seg_tokens)
        assert all(len(s.split(" ")) <= seg_tokens for s in mine)
