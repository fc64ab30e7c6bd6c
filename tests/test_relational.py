

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
