"""Pins for circadian_stats: the numpy-vs-DuckDB trig bit-parity this op
relies on, plus semantic extremes (concentrated vs spread times)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data


def test_trig_bit_parity_with_duckdb():
    # circadian_stats assumes np.cos/np.sin == DuckDB cos/sin bit-for-bit
    rng = np.random.default_rng(11)
    us = rng.integers(0, 86_400_000_000, size=50_000)
    s = us / 1e6
    x = (s / 86400.0) * (2 * np.pi)
    df = pd.DataFrame({"us": us})
    con = duckdb.connect()
    con.register("t", df)
    q = con.sql(
        "SELECT cos((CAST(us AS DOUBLE)/1e6/86400.0)*(2*pi())) c, "
        "sin((CAST(us AS DOUBLE)/1e6/86400.0)*(2*pi())) s FROM t"
    ).df()
    assert np.array_equal(np.cos(x), q["c"].to_numpy())
    assert np.array_equal(np.sin(x), q["s"].to_numpy())


def test_circadian_concentrated_vs_uniform(ray_session):
    from kgray.ops.temporal import circadian_stats

    rows = (
        # 'noon' always at 12:00 -> resultant 1, mean_cos = cos(pi) = -1
        [{"event_type": "noon", "ts": pd.Timestamp(f"2024-01-{d:02d} 12:00:00")}
         for d in range(1, 11)]
        # 'spread' at 0h and 12h alternating -> vectors cancel -> R = 0
        + [{"event_type": "spread", "ts": pd.Timestamp(f"2024-01-{d:02d} 00:00:00")}
           for d in range(1, 6)]
        + [{"event_type": "spread", "ts": pd.Timestamp(f"2024-01-{d:02d} 12:00:00")}
           for d in range(1, 6)]
    )
    out = circadian_stats(ray.data.from_pandas(pd.DataFrame(rows)))
    m = out.set_index("event_type")
    assert m.loc["noon", "resultant"] == 1.0
    assert m.loc["noon", "mean_cos"] == -1.0
    assert abs(m.loc["spread", "resultant"]) < 1e-6
