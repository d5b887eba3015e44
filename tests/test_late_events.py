"""Watermark late-data detection (kgray/ops/temporal.py::late_events):
verified against a driver-side reference over the same deterministic
arrival jitter, including tiny buckets so the cross-bucket exclusive
prefix max path is exercised."""

import numpy as np
import pandas as pd
import ray.data

from kgray.ops.temporal import late_events

_US = 1_000_000


def _ref(df: pd.DataFrame, jitter_mod: int, allow_s: int) -> pd.DataFrame:
    ts = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    eid = df["event_id"].to_numpy(dtype=np.int64)
    ats = ts + (eid * 40503 % jitter_mod) * _US
    order = np.lexsort((eid, ats))
    ts, eid = ts[order], eid[order]
    wm = np.empty_like(ts)
    wm[0] = -(2**62)
    np.maximum.accumulate(ts[:-1], out=wm[1:]) if len(ts) > 1 else None
    late = ts < wm - allow_s * _US
    return (
        pd.DataFrame(
            {"event_id": eid[late], "late_by_us": wm[late] - ts[late] - allow_s * _US}
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _mk(n=400, seed=3):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01").value // 1000
    gaps = rng.integers(1, 120, n).cumsum() * _US
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(base + gaps, unit="us"),
        }
    )


def test_late_events_matches_reference_small_buckets():
    df = _mk()
    out = (
        late_events(
            ray.data.from_pandas(df),
            jitter_mod=301,
            allowed_lateness_s=30,
            bucket_seconds=600,  # many buckets -> prefix path matters
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = _ref(df, jitter_mod=301, allow_s=30)
    assert len(want) > 5  # the scenario actually produces late events
    pd.testing.assert_frame_equal(out.astype("int64"), want.astype("int64"))


def test_late_events_bucket_size_invariance():
    df = _mk(seed=11)
    a = (
        late_events(ray.data.from_pandas(df), jitter_mod=301, allowed_lateness_s=10,
                    bucket_seconds=86_400)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    b = (
        late_events(ray.data.from_pandas(df), jitter_mod=301, allowed_lateness_s=10,
                    bucket_seconds=120)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))


def test_late_events_in_order_stream_has_none():
    # zero jitter -> arrival order == event-time order -> nothing late
    df = _mk(seed=5)
    out = late_events(ray.data.from_pandas(df), jitter_mod=1).to_pandas()
    assert len(out) == 0
