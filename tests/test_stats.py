"""Mergeable-moment statistics: overflow-free driver combine,
block-split determinism, rollup additivity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.stats import (
    corr_ols_from_moments,
    fixed_width_histogram,
    grouped_moment_partials,
    grouped_zscore,
    rollup_counts,
)


def _tbl(n=1000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "g": pa.array(rng.choice(["a", "b", "c"], n)),
            "x": pa.array(rng.integers(1, 50, n), pa.int64()),
            "y": pa.array(rng.integers(1, 10**5, n), pa.int64()),
        }
    )


def test_moments_exact_and_split_invariant():
    t = _tbl()
    xy = lambda b: (b.column("x").to_numpy(), b.column("y").to_numpy())
    m3 = grouped_moment_partials(rd.from_arrow(t).repartition(3), ["g"], xy)
    m7 = grouped_moment_partials(rd.from_arrow(t).repartition(7), ["g"], xy)
    assert m3 == m7  # integer sums: bit-identical across block splits
    x = t.column("x").to_numpy()
    y = t.column("y").to_numpy()
    g = t.column("g").to_numpy(zero_copy_only=False)
    for key in ("a", "b", "c"):
        mask = g == key
        assert m3[(key,)] == [
            int(mask.sum()),
            int(x[mask].sum()),
            int(y[mask].sum()),
            int((x[mask] ** 2).sum()),
            int((y[mask] ** 2).sum()),
            int((x[mask] * y[mask]).sum()),
        ]


def test_driver_combine_is_arbitrary_precision():
    # per-batch int64 sums would overflow when combined: 3 batches each
    # contributing close to 2**62 to syy must merge exactly
    big = int(np.sqrt(2**62 // 2))
    t = pa.table(
        {
            "g": pa.array(["k"] * 6),
            "x": pa.array([1] * 6, pa.int64()),
            "y": pa.array([big] * 6, pa.int64()),
        }
    )
    m = grouped_moment_partials(
        rd.from_arrow(t).repartition(3),
        ["g"],
        lambda b: (b.column("x").to_numpy(), b.column("y").to_numpy()),
    )
    assert m[("k",)][4] == 6 * big * big  # > 2**63: python-int exact


def test_corr_perfect_line():
    t = pa.table(
        {
            "g": pa.array(["a"] * 5),
            "x": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "y": pa.array([12, 14, 16, 18, 20], pa.int64()),
        }
    )
    m = grouped_moment_partials(
        rd.from_arrow(t),
        ["g"],
        lambda b: (b.column("x").to_numpy(), b.column("y").to_numpy()),
    )
    out = corr_ols_from_moments(m, ["g"]).to_pandas()
    # sqrt(vx)*sqrt(vy) vs exact product: 1 ulp — the bit-exactness
    # that matters (vs the identically-shaped SQL) is test_oracle_parity
    assert abs(out["r"].iloc[0] - 1.0) < 1e-12
    assert out["slope"].iloc[0] == 2.0
    assert abs(out["intercept"].iloc[0] - 10.0) < 1e-9


def test_zscore_mean_zero_unit_var():
    t = _tbl()
    z = (
        grouped_zscore(
            rd.from_arrow(t).repartition(4),
            ["g"],
            ["id"],
            lambda b: b.column("x").to_numpy(),
        )
        .to_pandas()
        .sort_values("id")
    )
    for _, grp in z.groupby("g"):
        assert abs(grp["z"].mean()) < 1e-12
        assert abs(grp["z"].std(ddof=0) - 1.0) < 1e-9


def test_histogram_counts_total():
    t = _tbl()
    h = fixed_width_histogram(
        rd.from_arrow(t).repartition(5),
        lambda b: b.column("y").to_numpy() // 1000,
    ).to_pandas()
    assert h["n"].sum() == t.num_rows
    assert h["bin"].is_unique


def test_rollup_levels_additive():
    t = _tbl()
    out = rollup_counts(
        rd.from_arrow(t).repartition(4),
        ["g"],
        lambda b: b.column("x").to_numpy(),
    ).to_pandas()
    total = out[out["g"] == "ALL"]
    leaves = out[out["g"] != "ALL"]
    assert len(total) == 1
    assert total["n"].iloc[0] == leaves["n"].sum() == t.num_rows
    assert total["sx"].iloc[0] == leaves["sx"].sum()


def test_quantile_cont_interpolation_matches_duckdb(ray_session, tmp_path):
    """Continuous quantiles from the bounded-domain histogram must hit
    DuckDB's quantile_cont bit-for-bit, including on duplicate-heavy
    multisets where the two neighbouring order statistics straddle a
    histogram bucket boundary."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.relational_queries import (
        ORACLE_SQL,
        q_price_quantiles_cont,
    )

    rng = np.random.default_rng(21)
    # few distinct cent values -> massive duplication
    cents = rng.choice([100, 105, 99999, 100000, 5], size=5001,
                       p=[0.4, 0.3, 0.15, 0.1, 0.05])
    flags = rng.choice(["A", "N", "R"], size=5001)
    tbl = pa.table(
        {
            "l_returnflag": pa.array(flags),
            "l_extendedprice": pa.array(cents / 100.0),
        }
    )
    pq.write_table(tbl, tmp_path / "lineitem.parquet")
    got = (
        q_price_quantiles_cont(str(tmp_path))
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet')"
    )
    exp = (
        con.execute(ORACLE_SQL["price_quantiles_cont"])
        .df()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    for c in ("p50", "p90", "p99"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
