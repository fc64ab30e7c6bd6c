

def test_revenue_cube_grouping_sets(ray_session):
    import duckdb

    from dane_visual_feature_extraction_worker_ray.pipelines.relational_queries import (
        ORACLE_SQL,
        q_revenue_cube,
    )

    sf = "/root/testdata/sf0.001"
    out = q_revenue_cube(sf).to_pandas()
    # 4 grouping sets present: both dims, flag-only, status-only, grand
    both = out[out.l_returnflag.notna() & out.l_linestatus.notna()]
    grand = out[out.l_returnflag.isna() & out.l_linestatus.isna()]
    assert len(grand) == 1
    assert grand["sum_qty"].iloc[0] == both["sum_qty"].sum()
    assert grand["n"].iloc[0] == both["n"].sum()
    # rollup consistency per flag
    fl = out[out.l_returnflag.notna() & out.l_linestatus.isna()]
    agg = both.groupby("l_returnflag")["sum_qty"].sum()
    for _, r in fl.iterrows():
        assert r["sum_qty"] == agg[r["l_returnflag"]]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    oracle = con.execute(ORACLE_SQL["revenue_cube"]).df()
    assert len(oracle) == len(out)


def test_pareto_orders_ties_and_duplicates(ray_session, tmp_path):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.relational_queries import (
        ORACLE_SQL,
        q_pareto_orders,
    )

    # (key, price, date): 1 dominates 2 (higher price, earlier date);
    # 3/4 are exact duplicates (neither dominates -> both survive);
    # 5 ties 1 on price but is later (dominated); 6 ties 1 on date but
    # cheaper (dominated); 7 is the cheap-but-earliest frontier point
    rows = [
        (1, 100.0, 50), (2, 90.0, 60), (3, 80.0, 40), (4, 80.0, 40),
        (5, 100.0, 55), (6, 70.0, 50), (7, 10.0, 10),
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([0] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows)),
            "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                np.array([r[2] for r in rows], np.int64)
            ).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(["x"] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    got = set(
        q_pareto_orders(str(tmp_path)).to_pandas()["o_orderkey"]
    )
    assert got == {1, 3, 4, 7}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    exp = set(con.execute(ORACLE_SQL["pareto_orders"]).df()["o_orderkey"])
    assert got == exp


def test_percentile_bridge_driver_bytes_bounded(ray_session):
    """percentile_bridge's driver state is the per-value cent
    histogram — bounded by DISTINCT cents, never rows (VERDICT r4
    item 2)."""
    import duckdb

    from dane_visual_feature_extraction_worker_ray.pipelines.relational_queries import (  # noqa: E501
        q_percentile_bridge,
    )
    from dane_visual_feature_extraction_worker_ray.state import counters

    sf = "/root/testdata/sf0.001"
    counters.reset()
    got = q_percentile_bridge(sf).to_pandas()
    assert len(got) > 0
    con = duckdb.connect()
    n_rows, n_distinct = con.execute(
        "SELECT count(*), count(DISTINCT CAST(floor(l_extendedprice"
        f"*100+0.5) AS BIGINT)) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()
    snap = counters.snapshot()
    held = snap["pctbridge_driver_bytes_max"]
    # 16 B per DISTINCT value (int64 value + int64 cum count): bounded
    # by the cent domain, which saturates with scale while rows grow —
    # at this tiny tier distinct ≈ rows, so assert the exact shape, not
    # a rows ratio
    assert held == n_distinct * 16
    assert n_rows == 6000  # sanity: the tier we think we're testing
