"""Unit tests for stages/scan.py — distributed prefix scans vs a
pandas single-process oracle on adversarial small inputs (single-row
groups, descending order keys, nulls in the summed column, many tiny
groups split across input blocks)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.scan import (
    global_lag,
    global_scan,
    grouped_scan,
    grouped_string_agg,
)


def _rng_frame(n=500, n_groups=60, seed=7):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, n_groups, n).astype(np.int64),
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.integers(-50, 50, n).astype(np.int64),
        }
    )
    # a few single-row groups beyond the random ones
    extra = pd.DataFrame(
        {"g": [1000, 1001], "o": [0, 0], "v": [7, -3]}
    )
    return pd.concat([df, extra], ignore_index=True)


def _ds_of(df, blocks=5):
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    return rd.from_arrow(tbl).repartition(blocks)


def test_grouped_scan_matches_pandas(ray_session):
    df = _rng_frame()
    out = (
        grouped_scan(
            _ds_of(df),
            "g",
            [("o", "ascending")],
            [
                ("rownum", "rn"),
                ("count", "cnt"),
                ("cumsum", "v", "run_v"),
            ],
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["g", "rn"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["g", "o"]).reset_index(drop=True)
    exp["rn"] = exp.groupby("g").cumcount() + 1
    exp["cnt"] = exp.groupby("g")["g"].transform("size")
    exp["run_v"] = exp.groupby("g")["v"].cumsum()
    exp = exp.sort_values(["g", "rn"]).reset_index(drop=True)
    assert (out["rn"] == exp["rn"]).all()
    assert (out["cnt"] == exp["cnt"]).all()
    assert (out["run_v"] == exp["run_v"]).all()


def test_grouped_scan_descending_and_nulls(ray_session):
    df = _rng_frame(n=200, n_groups=10, seed=11)
    vals = df["v"].astype("float64")
    vals.iloc[::7] = np.nan  # nulls add 0 to the running sum
    tbl = pa.table(
        {
            "g": pa.array(df["g"]),
            "o": pa.array(df["o"]),
            "v": pa.array(vals),
        }
    )
    out = (
        grouped_scan(
            rd.from_arrow(tbl).repartition(3),
            "g",
            [("o", "descending")],
            [("rownum", "rn"), ("cumsum", "v", "run_v")],
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["g", "rn"])
        .reset_index(drop=True)
    )
    exp = df.assign(v=vals.fillna(0).astype(np.int64)).sort_values(
        ["g", "o"], ascending=[True, False]
    )
    exp["rn"] = exp.groupby("g").cumcount() + 1
    exp["run_v"] = exp.groupby("g")["v"].cumsum()
    exp = exp.sort_values(["g", "rn"]).reset_index(drop=True)
    assert (out["run_v"] == exp["run_v"]).all()


def test_global_scan_matches_pandas(ray_session):
    df = _rng_frame(n=400, n_groups=40, seed=3)
    out = (
        global_scan(
            _ds_of(df),
            [("o", "ascending"), ("g", "ascending")],
            [("v", "run_v")],
            rank_col="rn",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("rn")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["o", "g"]).reset_index(drop=True)
    assert (out["run_v"].to_numpy() == exp["v"].cumsum().to_numpy()).all()
    assert (out["rn"].to_numpy() == np.arange(1, len(exp) + 1)).all()
    # global order is consistent with the sort keys
    assert (out["o"].to_numpy() == exp["o"].to_numpy()).all()


def test_grouped_string_agg_matches_pandas(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 12, 150).astype(np.int64),
            "o": rng.permutation(150).astype(np.int64),
            "s": [f"w{int(x)}" for x in rng.integers(0, 9, 150)],
        }
    )
    out = (
        grouped_string_agg(
            _ds_of(df, blocks=4),
            "g",
            [("o", "ascending")],
            value_col="s",
            sep="|",
            out="seq",
            count_col="n",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["g", "o"])
        .groupby("g")["s"]
        .agg(["|".join, "size"])
        .reset_index()
        .rename(columns={"join": "seq", "size": "n"})
    )
    exp.columns = ["g", "seq", "n"]
    assert (out["g"] == exp["g"]).all()
    assert (out["seq"] == exp["seq"]).all()
    assert (out["n"].to_numpy() == exp["n"].to_numpy()).all()


def test_grouped_scan_bad_spec(ray_session):
    with pytest.raises(ValueError):
        grouped_scan(
            _ds_of(_rng_frame(50)), "g", [("o", "ascending")],
            [("median", "v", "m")],
        )


def test_global_lag_matches_pandas(ray_session):
    df = _rng_frame(n=300, n_groups=30, seed=17)
    out = (
        global_lag(
            _ds_of(df, blocks=6),
            [("o", "ascending"), ("g", "ascending")],
            [("v", "prev_v"), ("o", "prev_o")],
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["o", "g"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["o", "g"]).reset_index(drop=True)
    exp["prev_v"] = exp["v"].shift(1)
    exp["prev_o"] = exp["o"].shift(1)
    assert out["prev_v"].isna().sum() == 1  # global first row only
    pd.testing.assert_series_equal(
        out["prev_v"].astype("float64"),
        exp["prev_v"],
        check_names=False,
    )
    pd.testing.assert_series_equal(
        out["prev_o"].astype("float64"),
        exp["prev_o"],
        check_names=False,
    )


def test_global_scan_nullable_int_column(ray_session):
    """Nulls in a cum column add 0 (SQL SUM semantics) — the
    int-with-null float64 round-trip must not inject INT64_MIN."""
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.scan import (
        global_scan,
    )

    tbl = pa.table(
        {
            "o": pa.array(list(range(10)), pa.int64()),
            "v": pa.array(
                [5, None, 3, None, 1, 2, None, 4, 6, None], pa.int64()
            ),
        }
    )
    out = (
        global_scan(
            rd.from_arrow(tbl).repartition(3),
            [("o", "ascending")],
            [("v", "cum_v")],
            num_partitions=3,
        )
        .to_pandas()
        .sort_values("o")
    )
    expected = np.cumsum([5, 0, 3, 0, 1, 2, 0, 4, 6, 0])
    np.testing.assert_array_equal(out["cum_v"].to_numpy(), expected)


def test_read_parquet_tuned_schema_evolution(ray_session, tmp_path):
    """A column added partway through a dataset's lifetime: older files
    read as typed NULLs (grouped-by-schema reads + aligned union), with
    column pruning preserved per group."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.sources.parquet import (
        read_parquet_tuned,
    )

    pq.write_table(
        pa.table(
            {"k": pa.array([1, 2], pa.int64()),
             "v": pa.array([10.0, 20.0])}
        ),
        str(tmp_path / "a.parquet"),
    )
    pq.write_table(
        pa.table(
            {"k": pa.array([3], pa.int64()), "v": pa.array([30.0]),
             "extra": pa.array(["x"])}
        ),
        str(tmp_path / "b.parquet"),
    )
    got = (
        read_parquet_tuned(str(tmp_path), columns=["k", "extra"])
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 2, 3]
    assert got["extra"].tolist()[:2] == [None, None]
    assert got["extra"].tolist()[2] == "x"
    full = (
        read_parquet_tuned(str(tmp_path))
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert full["v"].tolist() == [10.0, 20.0, 30.0]
    assert sorted(full.columns) == ["extra", "k", "v"]


def test_zonemap_pruned_scan_actually_prunes(ray_session):
    """The year-range read must open strictly fewer files than the
    layout holds, and the pruned aggregate must equal the direct one."""
    import duckdb

    from dane_visual_feature_extraction_worker_ray.pipelines.relational_queries import (
        ORACLE_SQL,
        q_pruned_scan_roundtrip,
    )
    from dane_visual_feature_extraction_worker_ray.state import counters

    before = counters.snapshot()
    got = q_pruned_scan_roundtrip("/root/testdata/sf0.001")
    after = counters.snapshot()
    total = after.get("zonemap_files_total", 0) - before.get(
        "zonemap_files_total", 0
    )
    read = after.get("zonemap_files_read", 0) - before.get(
        "zonemap_files_read", 0
    )
    assert total >= 4 and 0 < read < total, (total, read)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW lineitem AS SELECT * FROM "
        "'/root/testdata/sf0.001/lineitem.parquet'"
    )
    exp = con.sql(ORACLE_SQL["pruned_scan_roundtrip"]).df()
    assert int(got["n_rows"][0]) == int(exp["n_rows"][0])
    assert int(got["sum_cents"][0]) == int(exp["sum_cents"][0])
