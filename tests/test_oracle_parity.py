"""Emulates the driver's correctness gate: every transcript query's Ray
result must match its DuckDB oracle SQL value-for-value (order- and
row-order-insensitive, exact on ints/strings, bit-exact on the floats
we engineered for IEEE parity)."""

from __future__ import annotations

import os
import numpy as np
import pandas as pd
import pytest
import duckdb

from dane_visual_feature_extraction_worker_ray.pipelines import registry

QUERIES = registry.queries()
ORACLE_SQL = registry.oracle_sql()

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.sql(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = list(df.columns)
    df = df.sort_values(
        by=sort_cols, kind="mergesort", na_position="last"
    ).reset_index(drop=True)
    return df


def compare(got: pd.DataFrame, exp: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(exp.columns), (
        name,
        sorted(got.columns),
        sorted(exp.columns),
    )
    got, exp = canonicalize(got), canonicalize(exp)
    assert len(got) == len(exp), (name, len(got), len(exp))
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ga = g.to_numpy(dtype=np.float64)
            ea = e.to_numpy(dtype=np.float64)
            both_nan = np.isnan(ga) & np.isnan(ea)
            assert (both_nan | (ga == ea)).all(), (
                name,
                c,
                np.flatnonzero(~(both_nan | (ga == ea)))[:5],
            )
        else:
            ga = g.to_numpy(dtype=object)
            ea = e.to_numpy(dtype=object)
            same = np.array(
                [
                    (pd.isna(a) and pd.isna(b)) or a == b
                    for a, b in zip(ga, ea)
                ]
            )
            assert same.all(), (name, c, np.flatnonzero(~same)[:5])


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name):
    if name not in ORACLE_SQL:
        pytest.skip("rows-only query")
    got = QUERIES[name](SF_DIR)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    exp = run_oracle(ORACLE_SQL[name])
    compare(got, exp, name)
