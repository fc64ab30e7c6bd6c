"""Event analytics kernels: funnel strictness/null edges, pivot
completeness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
    EVENT_TYPES,
    q_user_event_pivot,
    q_view_purchase_funnel,
)


def _write(tmp_path, rows):
    import pyarrow.parquet as pq

    uid, et, ts = zip(*rows)
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                np.array(ts, np.int64), pa.int64()
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(np.zeros(len(rows))),
            "props": pa.array([""] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_funnel_strictly_after_and_nulls(tmp_path):
    sf = _write(
        tmp_path,
        [
            (1, "view", 100), (1, "purchase", 100),  # equal ts: no match
            (1, "purchase", 250),                    # strictly after: match
            (2, "view", 50),                         # no purchase
            (3, "purchase", 10),                     # purchase, never viewed
            (4, "purchase", 5), (4, "view", 20), (4, "purchase", 30),
        ],
    )
    out = (
        q_view_purchase_funnel(sf)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2, 4]  # user 3 never viewed
    assert out["converted"].tolist() == [True, False, True]
    assert out["latency_us"].tolist()[0] == 150  # 250-100, not 100-100
    assert out["latency_us"].isna().tolist() == [False, True, False]
    assert out["first_purchase_ts"].isna().tolist() == [False, True, False]
    assert out["latency_us"].tolist()[2] == 10  # pre-view purchase ignored


def test_pivot_counts_complete(tmp_path):
    rows = []
    rng = np.random.default_rng(8)
    for i in range(200):
        rows.append(
            (int(rng.integers(0, 9)), EVENT_TYPES[rng.integers(0, 5)], i)
        )
    sf = _write(tmp_path, rows)
    out = q_user_event_pivot(sf).to_pandas()
    assert out[[f"n_{e}" for e in EVENT_TYPES]].to_numpy().sum() == 200
    # spot-check one cell against brute force
    import collections

    c = collections.Counter((u, e) for u, e, _ in rows)
    u0 = int(out["user_id"].iloc[0])
    for e in EVENT_TYPES:
        assert out.set_index("user_id").loc[u0, f"n_{e}"] == c[(u0, e)]


def test_props_key_stats_all_null_group_matches_sql(ray_session, tmp_path):
    """A group with zero parseable k: SQL sum/avg over all-NULL is
    NULL — the engine must emit nulls, not 0/NaN values."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        ORACLE_SQL,
        q_props_key_stats,
    )

    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "ts": pa.array(np.zeros(4, np.int64)).cast(pa.timestamp("us")),
            "user_id": pa.array([1, 1, 2, 2], pa.int64()),
            "event_type": pa.array(
                ["click", "click", "view", "view"], pa.string()
            ),
            "value": pa.array(np.zeros(4)),
            "props": pa.array(
                ['{"k": 3}', '{"k": 7}', '{"x": 1}', "{}"], pa.string()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = (
        q_props_key_stats(str(tmp_path))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    exp = (
        con.execute(ORACLE_SQL["props_key_stats"])
        .fetchdf()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    view_row = got[got.event_type == "view"].iloc[0]
    assert pd.isna(view_row["sum_k"]) and pd.isna(view_row["mean_k"])
    for c in ["n_events", "n_with_k", "sum_k", "mean_k"]:
        ga, ea = got[c].astype("float64"), exp[c].astype("float64")
        assert ((ga == ea) | (ga.isna() & ea.isna())).all(), c


def test_asof_nearest_tie_goes_backward(ray_session, tmp_path):
    """Equidistant prev/next snapshots resolve to the backward
    (leakage-safe) side; a turn with only future snapshots takes them."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.transcript_queries import (
        q_asof_join_nearest,
    )

    us = 1_000_000
    rows = [
        # user 1: turn at 125s; snapshots (signup value) at 100s and
        # 150s — both 25s away → tie → backward val 5.0
        (1, "signup", 100 * us, 5.0),
        (1, "signup", 150 * us, 7.0),
        (1, "click", 125 * us, 0.0),
        # user 2: turn at 10s; only a FUTURE snapshot at 90s
        (2, "signup", 90 * us, 9.0),
        (2, "click", 10 * us, 0.0),
    ]
    uid, et, ts, val = zip(*rows)
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(np.array(ts, np.int64)).cast(pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array([""] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        q_asof_join_nearest(str(tmp_path))
        .to_pandas()
        .set_index("conv_id")
    )
    assert out.loc["1", "nearest_val"] == 5.0  # tie → backward
    assert out.loc["1", "nearest_dist_s"] == 25.0
    assert out.loc["2", "nearest_val"] == 9.0  # forward-only
    assert out.loc["2", "nearest_dist_s"] == 80.0


def test_hourly_anomalies_flatline_spike_and_empty(ray_session, tmp_path):
    """A spike after a constant (zero-variance) window must flag; an
    empty events table yields a typed empty result, not a crash.
    Engine output is cross-checked against the registered oracle SQL
    on the same fixture."""
    import duckdb
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        ORACLE_SQL,
        q_hourly_event_anomalies,
    )

    hour = 3_600_000_000
    rows = []
    eid = 0
    for h in range(14):  # 14 flat hours of exactly 5 events
        for j in range(5):
            rows.append((eid, h * hour + j, 1, "click")); eid += 1
    for j in range(100):  # then a 100-event spike hour
        rows.append((eid, 14 * hour + j, 1, "click")); eid += 1
    ids, ts, uid, et = zip(*rows)
    t = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(np.array(ts, np.int64)).cast(pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(np.zeros(len(rows))),
            "props": pa.array([""] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = q_hourly_event_anomalies(str(tmp_path)).to_pandas()
    spike = got[got.n == 100].iloc[0]
    assert bool(spike["is_anomaly"]), "flatline-then-spike must flag"
    assert not got[got.n == 5]["is_anomaly"].any()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    exp = con.execute(ORACLE_SQL["hourly_event_anomalies"]).fetchdf()
    g = got.sort_values("hour").reset_index(drop=True)
    e = exp.sort_values("hour").reset_index(drop=True)
    assert (g["is_anomaly"] == e["is_anomaly"]).all()

    # empty input: typed empty result
    empty_dir = tmp_path / "empty"
    empty_dir.mkdir()
    pq.write_table(t.slice(0, 0), str(empty_dir / "events.parquet"))
    out = q_hourly_event_anomalies(str(empty_dir))
    assert out.num_rows == 0
    assert out.column_names == ["hour", "n", "w", "is_anomaly"]


def test_asof_nearest_null_snap_value_still_wins_on_distance(
    ray_session, tmp_path
):
    """A matched snapshot whose VALUE is null must still win on
    distance (engine dispatches on match existence; the oracle must
    not fall through to the farther non-null side)."""
    import duckdb
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.transcript_queries import (
        ORACLE_SQL,
        q_asof_join_nearest,
    )

    us = 1_000_000
    # backward snap at 10s distance with NULL value; forward snap at
    # 50s distance with value 7.0 → nearest is the NULL-valued one
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array(
                np.array([90 * us, 150 * us, 100 * us], np.int64)
            ).cast(pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(
                ["signup", "signup", "click"], pa.string()
            ),
            "value": pa.array([None, 7.0, 0.0], pa.float64()),
            "props": pa.array([""] * 3),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = q_asof_join_nearest(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert np.isnan(got["nearest_val"].iloc[0])
    assert got["nearest_dist_s"].iloc[0] == 10.0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    exp = con.execute(ORACLE_SQL["asof_join_nearest"]).fetchdf()
    assert len(exp) == 1
    assert pd.isna(exp["nearest_val"].iloc[0])
    assert exp["nearest_dist_s"].iloc[0] == 10.0


def test_hourly_dense_counts_gap_fill(ray_session, tmp_path):
    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        q_hourly_dense_counts,
    )

    H = 3_600_000_000
    rows = [
        # click: hours 0 and 3 observed; hours 1, 2 are gaps
        (1, "click", 10),
        (1, "click", 20),
        (1, "click", 3 * H + 5),
        # view: only hour 1 observed — zero-filled over the GLOBAL span
        (2, "view", H + 7),
    ]
    sf = _write(tmp_path, rows)
    got = (
        q_hourly_dense_counts(sf)
        .to_pandas()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    # global span = hours 0..3 → 4 hours × 2 types = 8 dense rows
    assert len(got) == 8
    assert (got.groupby("event_type").size() == 4).all()
    click = got[got.event_type == "click"].n.tolist()
    view = got[got.event_type == "view"].n.tolist()
    assert click == [2, 0, 0, 1]
    assert view == [0, 1, 0, 0]
    hours = got[got.event_type == "click"].hour.astype("int64").tolist()
    assert hours == [0, H, 2 * H, 3 * H]


def test_scd2_intervals_chains_and_ties(ray_session, tmp_path):
    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        q_scd2_intervals,
    )

    rows = [
        # user 1 click chain: 10 -> 30 -> 30 (tie broken by event_id)
        (1, "click", 10),
        (1, "click", 30),
        (1, "click", 30),
        # user 1 view: singleton -> open interval
        (1, "view", 20),
        # user 2 click: independent chain
        (2, "click", 15),
    ]
    sf = _write(tmp_path, rows)
    out = (
        q_scd2_intervals(sf)
        .to_pandas()
        .sort_values(["user_id", "event_type", "valid_from"], kind="stable")
        .reset_index(drop=True)
    )
    assert len(out) == 5
    c1 = out[(out.user_id == 1) & (out.event_type == "click")]
    vf = c1["valid_from"].astype("int64").tolist()
    assert vf == [10, 30, 30]
    vt = c1["valid_to"].tolist()
    assert vt[0].value == 30_000 and vt[1].value == 30_000  # ns
    assert pd.isna(vt[2])
    assert c1["is_current"].tolist() == [False, False, True]
    v1 = out[(out.user_id == 1) & (out.event_type == "view")]
    assert v1["is_current"].tolist() == [True]
    # exactly one current row per (user, type)
    cur = out.groupby(["user_id", "event_type"])["is_current"].sum()
    assert (cur == 1).all()


def test_longest_daily_streak_islands(ray_session, tmp_path):
    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        q_longest_daily_streak,
    )

    D = 86_400_000_000
    rows = [
        # user 1: days 0,1,2 then 5,6 -> max streak 3; dup events/day
        (1, "click", 0), (1, "view", 10), (1, "click", D + 5),
        (1, "click", 2 * D), (1, "click", 5 * D), (1, "click", 6 * D),
        # user 2: single day -> 1
        (2, "view", 3 * D + 99),
        # user 3: alternating days -> 1
        (3, "click", 0), (3, "click", 2 * D), (3, "click", 4 * D),
    ]
    sf = _write(tmp_path, rows)
    got = (
        q_longest_daily_streak(sf)
        .to_pandas().set_index("user_id")["max_streak"]
    )
    assert got[1] == 3 and got[2] == 1 and got[3] == 1


def test_asof_interpolate_blend_and_edges(ray_session, tmp_path):
    """Exact midpoint blend; pure-backward/forward at the stream edges;
    exact-hit snapshot returns its own value; no-snapshot conv is NULL."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.transcript_queries import (
        q_asof_interpolate,
    )

    us = 1_000_000
    rows = [
        # user 1: snaps (signup) at 100s->4.0 and 200s->8.0
        (1, "signup", 100 * us, 4.0),
        (1, "signup", 200 * us, 8.0),
        (1, "click", 125 * us, 0.0),   # 25% -> 5.0
        (1, "click", 200 * us, 0.0),   # exact hit -> 8.0
        (1, "click", 250 * us, 0.0),   # after last -> backward 8.0
        (1, "click", 50 * us, 0.0),    # before first -> forward 4.0
        # user 2: no snapshots at all
        (2, "click", 10 * us, 0.0),
    ]
    uid, et, ts, val = zip(*rows)
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(np.array(ts, np.int64)).cast(pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(et, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array([""] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        q_asof_interpolate(str(tmp_path))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    u1 = out[out.conv_id == "1"].sort_values("turn_idx")
    # turns are clicks ordered by ts: 50s, 125s, 200s, 250s
    vals = u1["interp_val"].tolist()
    kinds = u1["kind"].tolist()
    assert vals == [4.0, 5.0, 8.0, 8.0]
    # exact hit (span 0) dispatches to the backward branch, not interp
    assert kinds == ["forward", "interp", "backward", "backward"]
    u2 = out[out.conv_id == "2"]
    assert pd.isna(u2["interp_val"]).all() and pd.isna(u2["kind"]).all()


def test_funnel_steps_ordering_and_prefix_nulls(ray_session, tmp_path):
    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        q_funnel_steps,
    )

    rows = [
        # user 1: full ladder in order
        (1, "signup", 10), (1, "view", 20), (1, "click", 30),
        (1, "purchase", 40),
        # user 2: view BEFORE signup doesn't count; no later view
        (2, "view", 5), (2, "signup", 10), (2, "click", 20),
        # user 3: never signed up -> excluded entirely
        (3, "view", 1), (3, "purchase", 2),
        # user 4: signup and view at the SAME ts -> strictness blocks
        (4, "signup", 10), (4, "view", 10),
    ]
    sf = _write(tmp_path, rows)
    out = (
        q_funnel_steps(sf).to_pandas().set_index("user_id").sort_index()
    )
    assert set(out.index) == {1, 2, 4}
    assert out.loc[1, "steps_completed"] == 4
    assert out.loc[1, "t4_purchase"].value == 40_000  # ns
    # user 2: click at 20 exists but view never happened after signup,
    # so the ladder stops at step 1 (click can't skip the view step)
    assert out.loc[2, "steps_completed"] == 1
    assert pd.isna(out.loc[2, "t2_view"]) and pd.isna(out.loc[2, "t3_click"])
    assert out.loc[4, "steps_completed"] == 1
    assert pd.isna(out.loc[4, "t2_view"])


def test_hourly_dense_and_scd2_empty_events(ray_session, tmp_path):
    """Empty events: the row-generating resample and the SCD2 build
    must both return typed empty results, not crash."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        q_hourly_dense_counts,
        q_scd2_intervals,
    )

    t = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    dense = q_hourly_dense_counts(str(tmp_path))
    dense = dense.to_pandas() if hasattr(dense, "to_pandas") else dense
    assert len(dense) == 0
    scd = q_scd2_intervals(str(tmp_path)).to_pandas()
    assert len(scd) == 0


def test_late_events_watermark_semantics(ray_session, tmp_path):
    """Out-of-order arrivals (by event_id) flag against the prior max
    event-time; the first arrival has no watermark (NULL)."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        LATE_ALLOWED_US,
        q_late_events,
    )

    H = 3_600_000_000
    # arrival order = event_id; event 2 arrives 2h behind the watermark
    ts = [5 * H, 6 * H, 4 * H, 6 * H + 1, 6 * H - 10]
    t = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array(np.array(ts, np.int64)).cast(pa.timestamp("us")),
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "event_type": pa.array(["click"] * len(ts)),
            "value": pa.array(np.zeros(len(ts))),
            "props": pa.array([""] * len(ts)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        q_late_events(str(tmp_path))
        .to_pandas().set_index("event_id").sort_index()
    )
    assert pd.isna(out.loc[0, "watermark"]) and pd.isna(out.loc[0, "is_late"])
    assert out.loc[1, "late_by_us"] == 0 and not out.loc[1, "is_late"]
    assert out.loc[2, "late_by_us"] == 2 * H  # 6h watermark - 4h event
    assert bool(out.loc[2, "is_late"])        # 2h > 1h allowed
    assert out.loc[3, "late_by_us"] == 0      # new high-water mark
    assert out.loc[4, "late_by_us"] == 11     # 10+1 behind, not late
    assert not out.loc[4, "is_late"]


def test_event_trigrams_user_boundaries(ray_session, tmp_path):
    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        q_event_trigrams,
    )

    rows = [
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        (1, "view", 4),
        # user 2's stream must not chain into user 1's
        (2, "signup", 5), (2, "view", 6),
    ]
    sf = _write(tmp_path, rows)
    got = q_event_trigrams(sf).to_pandas()
    trip = {
        (a, b, c): n
        for a, b, c, n in zip(got.t1, got.t2, got.t3, got.n)
    }
    assert trip == {
        ("view", "click", "purchase"): 1,
        ("click", "purchase", "view"): 1,
    }


def test_key_skew_profile_planted_hot_key(ray_session, tmp_path):
    """One key holding 90% of rows dominates its bit-length bucket and
    the basis-point share is exact integer math."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.events_queries import (
        q_key_skew_profile,
    )

    n_hot, n_cold_keys = 900, 50  # 900 + 100 rows
    uid = np.r_[
        np.zeros(n_hot, np.int64),
        np.repeat(np.arange(1, n_cold_keys + 1, dtype=np.int64), 2),
    ]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(uid), dtype=np.int64)),
            "ts": pa.array(
                np.arange(len(uid), dtype=np.int64).astype(
                    "datetime64[us]"
                )
            ),
            "user_id": pa.array(uid),
            "event_type": pa.array(["view"] * len(uid)),
            "value": pa.array(np.zeros(len(uid))),
            "props": pa.array(["{}"] * len(uid)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_key_skew_profile(str(tmp_path)).to_pandas()
    assert (out["hot_share_bp"] == 9000).all()
    hot_row = out[out["max_key_rows"] == n_hot]
    assert len(hot_row) == 1
    # 900 needs 10 bits
    assert hot_row["bucket_bits"].iloc[0] == 10
    cold = out[out["bucket_bits"] == 2]  # count 2 → 2 bits
    assert cold["n_keys"].iloc[0] == n_cold_keys
    assert out["n_rows"].sum() == len(uid)
