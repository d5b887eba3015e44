"""VERDICT r2 #2: the sf-proportional customer dimension must have a
bucketed-join rung — forcing broadcast_dim_max=0 routes customer through
custkey hash-bucket partial joins and must reproduce the broadcast-rung
result exactly."""

import pandas as pd
import pytest

from kgray.pipelines.relational import (
    returned_items,
    revenue_by_nation,
    shipping_priority,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "fn", [revenue_by_nation, shipping_priority, returned_items]
)
def test_bucketed_dim_rung_matches_broadcast(ray_session, fn):
    broadcast = fn(SF)
    bucketed = fn(SF, broadcast_dim_max=0)
    pd.testing.assert_frame_equal(
        broadcast.reset_index(drop=True), bucketed.reset_index(drop=True)
    )
    assert len(broadcast) > 0


def test_anti_join_bucketed_rung_matches_broadcast(ray_session):
    """The Q22-shaped NOT-EXISTS: forcing broadcast_keys_max=0 routes the
    recent-order key set through custkey hash-bucket anti-joins and must
    reproduce the broadcast-rung result exactly."""
    from kgray.pipelines.relational import dormant_customers

    broadcast = dormant_customers(SF)
    bucketed = dormant_customers(SF, broadcast_keys_max=0)
    pd.testing.assert_frame_equal(
        broadcast.reset_index(drop=True), bucketed.reset_index(drop=True)
    )
    assert len(broadcast) > 0
    assert broadcast["numcust"].sum() > 0


def test_order_priority_returns_rungs_agree():
    from kgray.pipelines.relational import order_priority_returns

    sf = "/root/testdata/sf0.001"
    a = order_priority_returns(sf)
    b = order_priority_returns(sf, broadcast_keys_max=0)  # semi hash_join rung
    pd.testing.assert_frame_equal(a, b)
    assert a["n_orders"].sum() > 0


def test_priority_shipmonths_counts_are_complete():
    from kgray.pipelines.relational import priority_shipmonths

    sf = "/root/testdata/sf0.001"
    out = priority_shipmonths(sf)
    import duckdb

    n = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    assert int((out["high_count"] + out["low_count"]).sum()) == n


def test_part_skyline_dominance(ray_session, tmp_path):
    """Skyline semantics incl. the identical-point rule: equal (price,
    size) points keep each other; strictly-cheaper equal-size dominates."""
    import pandas as pd
    import ray  # noqa: F401

    from kgray.pipelines.relational import part_skyline

    df = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4, 5],
            "p_retailprice": [10.0, 10.0, 12.0, 9.0, 12.0],
            "p_size": [5, 5, 5, 3, 6],
        }
    )
    df.to_parquet(tmp_path / "part.parquet")
    out = part_skyline(str(tmp_path))
    # part 3 dominated by 1/2 (cheaper, same size); part 4 on frontier
    # (cheapest); parts 1,2 identical -> both kept; part 5 biggest size
    assert out["p_partkey"].tolist() == [1, 2, 4, 5]
