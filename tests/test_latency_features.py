"""Adversarial edge-case gate for the round-5 windowed latency-feature
family: the sf-tier parity suite exercises realistic data; this fixture
plants the degenerate shapes a generator rarely emits — single-turn
conversations, exact timestamp ties (event_id tie-break), zero deltas,
constant latency (autocorr/IQR denominators hit 0 → NULL), all-null and
single-value tool windows, and a conversation longer than the window.
Each query is compared against ITS OWN registry oracle SQL run by
DuckDB over the same adversarial parquet — the identical machinery the
driver gate uses, pointed at nastier data."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dane_visual_feature_extraction_worker_ray.pipelines import registry

from test_oracle_parity import compare

QUERY_NAMES = [
    "ewma_latency",
    "conv_latency_trend",
    "latency_autocorr",
    "latency_changepoint",
    "w_median_latency",
    "w_distinct_tools",
    "latency_bucket_profile",
    "latency_robust_features",
    "role_onehot",
    "role_dwell_time",
    "role_transition_latency",
    "snaps_since_prev_turn",
    "w_latency_slope",
    "conv_duration_percentile",
    "conv_time_of_day_profile",
    "session_length_median",
    "inter_session_gaps",
    "tool_concentration",
    "snapshot_value_trend",
    "asof_value_delta",
    "asof_staleness_histogram",
    "snapshot_max_drawdown",
    # pre-existing flagship family — free adversarial coverage
    "conv_latency_quantiles",
    "conv_peak_latency",
    "lag_lead",
    "sessionize",
    "ffill",
    "asof_join",
]


@pytest.fixture(scope="module")
def adversarial_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("latsf")
    base = 1_700_000_000_000_000  # µs epoch

    rows = []  # (event_id, user_id, dt_us, event_type, tool_key)

    def conv(user_id, specs):
        for i, (dt, etype, tkey) in enumerate(specs):
            rows.append((user_id * 1000 + i, user_id, dt, etype, tkey))

    MIN = 60_000_000
    HOUR = 3_600_000_000
    DAY = 86_400_000_000
    # u1: single turn (drops out of every delta query)
    conv(1, [(0, "view", None)])
    # u2: two turns at the SAME ts — event_id breaks the tie, delta 0
    conv(2, [(0, "view", None), (0, "click", 7)])
    # u3: constant latency (autocorr + IQR denominators are 0 → NULL)
    conv(3, [(i * HOUR, "view", None) for i in range(6)])
    # u4: 12 turns (longer than the 8-turn window), mixed deltas and a
    # giant 10-day gap; tools cycle over 3 values with nulls
    specs4 = []
    t = 0
    gaps = [MIN, MIN, 5 * MIN, HOUR, 10 * DAY, MIN, 2 * HOUR, DAY,
            30 * MIN, MIN, 3 * DAY]
    tools = [1, None, 2, 1, None, 3, 3, None, 1, 2, None, 1]
    for i in range(12):
        specs4.append((t, "click" if tools[i] else "error", tools[i]))
        if i < len(gaps):
            t += gaps[i]
    conv(4, specs4)
    # u5: strictly shrinking gaps (negative OLS slope, clean CUSUM)
    t = 0
    specs5 = []
    for i, g in enumerate([DAY, HOUR, 10 * MIN, MIN, MIN // 2]):
        specs5.append((t, "purchase", 9))
        t += g
    specs5.append((t, "purchase", 9))
    conv(5, specs5)
    # u6: a signup row (must be filtered) plus one turn
    conv(6, [(0, "signup", None), (HOUR, "view", None)])
    # u7: snapshot stream — two co-timestamped signups (tie), a third
    # later, interleaved with turns (as-of + snapshot-trend fodder)
    conv(
        7,
        [
            (0, "signup", None),
            (0, "signup", None),
            (MIN, "view", 2),
            (2 * HOUR, "signup", None),
            (3 * HOUR, "click", 2),
            (DAY, "view", None),
        ],
    )

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + r[2] for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array(
                [float(i % 7) + 0.5 for i in range(len(rows))],
                pa.float64(),
            ),
            "props": pa.array(
                [
                    None if r[4] is None else '{"k": %d}' % r[4]
                    for r in rows
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "events.parquet"))
    return str(d)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{sf_dir}/events.parquet'"
    )
    return con.sql(sql).df()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_latency_query_on_adversarial_data(
    ray_session, adversarial_sf_dir, name
):
    queries = registry.queries()
    oracles = registry.oracle_sql()
    got = queries[name](adversarial_sf_dir)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    exp = _oracle(adversarial_sf_dir, oracles[name])
    assert len(exp) > 0, f"{name}: vacuous adversarial oracle"
    compare(got, exp, name)
