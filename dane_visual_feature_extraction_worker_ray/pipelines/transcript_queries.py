"""Driver-facing transcript queries + their DuckDB oracle SQL.

Each entry pairs a Ray pipeline (callable ``sf_dir -> Dataset``) with
an ANSI-SQL string computing the identical result over the same
parquet tables — the correctness gate (CORRECTNESS_r{N}.json). Column
names and types are kept in lockstep between both sides; float
expressions are written so both engines perform the *same* IEEE
operations on exact integers (see functions/segkernels.py docstring).
"""

from __future__ import annotations

import os

from ..config import FeatureConfig, PartitionConfig, US_PER_S
from ..sources.events_adapter import (
    SQL_SNAPS_CTE,
    SQL_TURNS_CTE,
    events_to_snapshots,
    events_to_turns,
)
from ..stages.aggregates import session_stats, tumbling_aggregate
from ..stages.transcript_features import compute_features

CFG = FeatureConfig()
PCFG = PartitionConfig(num_buckets=32)

_GAP = CFG.session_gap_us
_W = CFG.row_window
_TW_H = CFG.time_window_us // (3600 * US_PER_S)
_TUMBLE_US = CFG.tumble_us

FLAGSHIP_COLS = [
    "conv_id",
    "turn_idx",
    "role",
    "text",
    "tool",
    "ts",
    "lag_ts_delta_s",
    "prev_role",
    "next_role",
    "session_id",
    "turn_in_session",
    "w_turn_count",
    "w_tool_rate",
    "w_latency_mean_s",
    "tw_turn_count",
    "snap_val_asof",
    "snap_tag_asof",
    "snap_age_s",
    "ffill_tool",
]

SQL_PREAMBLE = f"""
WITH {SQL_TURNS_CTE},
{SQL_SNAPS_CTE},
base AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us,
         lag(role) OVER w AS prev_role,
         lead(role) OVER w AS next_role,
         CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END AS tool_i
  FROM turns
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
sess AS (
  SELECT *, CAST(SUM(CASE WHEN delta_us IS NULL OR delta_us > {_GAP} THEN 1 ELSE 0 END)
      OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS BIGINT) AS session_id
  FROM base
),
feats AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
    CAST(delta_us AS DOUBLE)/1000000 AS lag_ts_delta_s,
    prev_role, next_role, session_id,
    CAST(row_number() OVER (PARTITION BY conv_id, session_id ORDER BY turn_idx) - 1 AS BIGINT) AS turn_in_session,
    CAST(count(*) OVER wr AS BIGINT) AS w_turn_count,
    CAST(SUM(tool_i) OVER wr AS DOUBLE) / count(*) OVER wr AS w_tool_rate,
    CAST(SUM(delta_us) OVER wr AS DOUBLE) / NULLIF(count(delta_us) OVER wr, 0) / 1000000 AS w_latency_mean_s,
    CAST(count(*) OVER wt AS BIGINT) AS tw_turn_count,
    last_value(tool IGNORE NULLS) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS ffill_tool,
    tool_i
  FROM sess
  WINDOW wr AS (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN {_W - 1} PRECEDING AND CURRENT ROW),
         wt AS (PARTITION BY conv_id ORDER BY ts RANGE BETWEEN INTERVAL {_TW_H} HOURS PRECEDING AND CURRENT ROW)
),
asofj AS (
  SELECT f.*, s.snap_val AS snap_val_asof, s.snap_tag AS snap_tag_asof,
         CAST(epoch_us(f.ts) - epoch_us(s.ts) AS DOUBLE)/1000000 AS snap_age_s
  FROM feats f ASOF LEFT JOIN snaps s ON f.conv_id = s.conv_id AND f.ts >= s.ts
)
""".strip()


def _events(sf_dir: str):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(os.path.join(sf_dir, "events.parquet"))


def _features(sf_dir: str):
    ev = _events(sf_dir)
    return compute_features(
        events_to_turns(ev),
        events_to_snapshots(ev),
        cfg=CFG,
        pcfg=PCFG,
        assign_turn_idx=True,
    )


# --- queries ----------------------------------------------------------------


def q_transcripts_ingest(sf_dir: str):
    return _features(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def q_lag_lead(sf_dir: str):
    return _features(sf_dir).select_columns(
        ["conv_id", "turn_idx", "lag_ts_delta_s", "prev_role", "next_role"]
    )


def q_sessionize(sf_dir: str):
    return _features(sf_dir).select_columns(
        ["conv_id", "turn_idx", "session_id", "turn_in_session"]
    )


def q_window_sliding(sf_dir: str):
    return _features(sf_dir).select_columns(
        [
            "conv_id",
            "turn_idx",
            "w_turn_count",
            "w_tool_rate",
            "w_latency_mean_s",
            "tw_turn_count",
        ]
    )


def q_asof_join(sf_dir: str):
    return _features(sf_dir).select_columns(
        ["conv_id", "turn_idx", "ts", "snap_val_asof", "snap_tag_asof", "snap_age_s"]
    )


def q_ffill(sf_dir: str):
    return _features(sf_dir).select_columns(
        ["conv_id", "turn_idx", "tool", "ffill_tool"]
    )


def q_flagship(sf_dir: str):
    return _features(sf_dir).select_columns(FLAGSHIP_COLS)


def q_session_stats(sf_dir: str):
    ev = _events(sf_dir)
    return session_stats(
        events_to_turns(ev), cfg=CFG, pcfg=PCFG, assign_turn_idx=True
    )


def q_window_tumbling(sf_dir: str):
    ev = _events(sf_dir)
    return tumbling_aggregate(events_to_turns(ev), cfg=CFG)


def q_asof_join_strict(sf_dir: str):
    """Strict-inequality as-of variant (snap.ts < turn.ts — an exactly
    co-timestamped snapshot must NOT match): the leakage-adjacent rule
    a backtest pipeline needs, driver-verified against DuckDB's strict
    ASOF JOIN."""
    ev = _events(sf_dir)
    cfg_strict = FeatureConfig(asof_allow_exact=False)
    feats = compute_features(
        events_to_turns(ev),
        events_to_snapshots(ev),
        cfg=cfg_strict,
        pcfg=PCFG,
        assign_turn_idx=True,
    )
    return feats.select_columns(
        ["conv_id", "turn_idx", "ts", "snap_val_asof", "snap_tag_asof", "snap_age_s"]
    )


def q_flagship_salted(sf_dir: str):
    """The flagship feature set computed through the SKEW-SALTED path
    (salt_threshold below the median conversation size, so most
    conversations are chunked and exactly stitched) — shares the
    flagship oracle, proving salted == unsalted in the driver gate, not
    just in pytest.

    turn_idx is pre-assigned per conversation with the same
    (ts, order_key) ordering the kernel uses (dense rank via a grouped
    map), because turn-range salting chunks on it."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..config import PartitionConfig
    from ..stages.exchange import hash_grouped_map
    from ..stages.salting import compute_features_auto

    ev = _events(sf_dir)
    turns = events_to_turns(ev)
    idx_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
            ("order_key", pa.int64()),
            ("turn_idx", pa.int32()),
        ]
    )

    def _rank(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        ok = g.column("order_key").to_numpy(zero_copy_only=False)
        ok = np.where(pd.isna(ok), 0, ok).astype(np.int64)
        order = np.lexsort((ok, ts))
        inv = np.empty(len(order), dtype=np.int64)
        inv[order] = np.arange(len(order))
        return g.append_column(
            "turn_idx", pa.array(inv.astype(np.int32))
        ).cast(idx_schema)

    turns_idx = hash_grouped_map(
        turns, "conv_id", _rank, num_partitions=16, empty_schema=idx_schema
    )
    pcfg_salt = PartitionConfig(
        num_buckets=PCFG.num_buckets, salt_threshold=50, salt_chunk=16
    )
    feats = compute_features_auto(
        turns_idx, events_to_snapshots(ev), CFG, pcfg_salt
    )
    return feats.select_columns(FLAGSHIP_COLS)


SQL_PREAMBLE_STRICT = SQL_PREAMBLE.replace(
    "ON f.conv_id = s.conv_id AND f.ts >= s.ts",
    "ON f.conv_id = s.conv_id AND f.ts > s.ts",
)
assert SQL_PREAMBLE_STRICT != SQL_PREAMBLE

QUERIES = {
    "transcripts_ingest": q_transcripts_ingest,
    "flagship_salted": q_flagship_salted,
    "asof_join_strict": q_asof_join_strict,
    "lag_lead": q_lag_lead,
    "sessionize": q_sessionize,
    "window_sliding": q_window_sliding,
    "asof_join": q_asof_join,
    "ffill": q_ffill,
    "flagship_features": q_flagship,
    "session_stats": q_session_stats,
    "window_tumbling": q_window_tumbling,
}

ORACLE_SQL = {
    "transcripts_ingest": (
        f"WITH {SQL_TURNS_CTE} "
        "SELECT conv_id, turn_idx, role, text, tool, ts FROM turns"
    ),
    "lag_lead": (
        SQL_PREAMBLE
        + " SELECT conv_id, turn_idx, lag_ts_delta_s, prev_role, next_role FROM feats"
    ),
    "sessionize": (
        SQL_PREAMBLE
        + " SELECT conv_id, turn_idx, session_id, turn_in_session FROM feats"
    ),
    "window_sliding": (
        SQL_PREAMBLE
        + " SELECT conv_id, turn_idx, w_turn_count, w_tool_rate,"
        " w_latency_mean_s, tw_turn_count FROM feats"
    ),
    "asof_join": (
        SQL_PREAMBLE
        + " SELECT conv_id, turn_idx, ts, snap_val_asof, snap_tag_asof,"
        " snap_age_s FROM asofj"
    ),
    "asof_join_strict": (
        SQL_PREAMBLE_STRICT
        + " SELECT conv_id, turn_idx, ts, snap_val_asof, snap_tag_asof,"
        " snap_age_s FROM asofj"
    ),
    "ffill": (
        SQL_PREAMBLE + " SELECT conv_id, turn_idx, tool, ffill_tool FROM feats"
    ),
    "flagship_features": (
        SQL_PREAMBLE + " SELECT " + ", ".join(FLAGSHIP_COLS) + " FROM asofj"
    ),
    # salted path must be bit-identical to the unsalted flagship
    "flagship_salted": (
        SQL_PREAMBLE + " SELECT " + ", ".join(FLAGSHIP_COLS) + " FROM asofj"
    ),
    "session_stats": (
        SQL_PREAMBLE
        + """
 SELECT conv_id, session_id,
        CAST(count(*) AS BIGINT) AS n_turns,
        CAST(SUM(tool_i) AS BIGINT) AS n_tool,
        min(ts) AS session_start,
        max(ts) AS session_end,
        CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE)/1000000 AS duration_s,
        CAST(SUM(tool_i) AS DOUBLE) / count(*) AS tool_rate
 FROM feats GROUP BY conv_id, session_id"""
    ),
    "window_tumbling": (
        f"WITH {SQL_TURNS_CTE} "
        f"""SELECT conv_id,
        make_timestamp((epoch_us(ts) // {_TUMBLE_US}) * {_TUMBLE_US}) AS w_start,
        CAST(count(*) AS BIGINT) AS turn_cnt,
        CAST(count(tool) AS BIGINT) AS tool_cnt,
        CAST(count(tool) AS DOUBLE) / count(*) AS tool_rate
 FROM turns GROUP BY conv_id, w_start"""
    ),
}


# --------------------------------------------------------------------------
# per-conversation argmax (rank-1 per group): the turn with the longest
# inter-turn latency. Mergeable argmax partials (best row per conv per
# batch) → bucketed final reduction — no full-row shuffle.


def _best_per_conv(tbl, value_col="lag_ts_delta_s"):
    import numpy as np
    import pyarrow as pa

    conv = tbl.column("conv_id").to_pandas()
    delta = tbl.column(value_col).to_numpy(zero_copy_only=False)
    tix = tbl.column("turn_idx").cast(pa.int64()).to_numpy()
    valid = ~np.isnan(np.asarray(delta, dtype=np.float64))
    if not valid.any():
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "peak_latency_s": pa.array([], pa.float64()),
            }
        )
    import pandas as pd

    codes, uniq = pd.factorize(conv[valid], sort=False)
    d = np.asarray(delta, dtype=np.float64)[valid]
    t = tix[valid]
    order = np.lexsort((t, -d, codes))
    c_sorted = codes[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = c_sorted[1:] != c_sorted[:-1]
    pick = order[first]
    return pa.table(
        {
            "conv_id": pa.array(uniq[codes[pick]], pa.string()),
            "turn_idx": pa.array(t[pick], pa.int64()),
            "peak_latency_s": pa.array(d[pick], pa.float64()),
        }
    )


def q_conv_peak_latency(sf_dir: str):
    feats = _features(sf_dir).select_columns(
        ["conv_id", "turn_idx", "lag_ts_delta_s"]
    )
    partials = feats.map_batches(
        _best_per_conv, batch_format="pyarrow", batch_size=None
    )

    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    def _final(p: int, table: pa.Table) -> pa.Table:
        return _best_per_conv(table, value_col="peak_latency_s")

    return hash_exchange(partials, "conv_id", 16, _final)


QUERIES["conv_peak_latency"] = q_conv_peak_latency
ORACLE_SQL["conv_peak_latency"] = (
    SQL_PREAMBLE
    + """
 SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
        lag_ts_delta_s AS peak_latency_s
 FROM (SELECT conv_id, turn_idx, lag_ts_delta_s,
              row_number() OVER (PARTITION BY conv_id
                  ORDER BY lag_ts_delta_s DESC, turn_idx) AS rn
       FROM feats WHERE lag_ts_delta_s IS NOT NULL)
 WHERE rn = 1"""
)


# --------------------------------------------------------------------------
# user-extension surface: registry feature ops (functions/feature_ops.py)


def q_feature_ops(sf_dir: str):
    ev = _events(sf_dir)
    from ..sources.events_adapter import events_to_snapshots, events_to_turns

    feats = compute_features(
        events_to_turns(ev),
        events_to_snapshots(ev),
        cfg=CFG,
        pcfg=PCFG,
        assign_turn_idx=True,
        extra_ops=["conv_turn_count", "is_session_start", "role_changed"],
    )
    return feats.select_columns(
        ["conv_id", "turn_idx", "conv_turn_count", "is_session_start",
         "role_changed"]
    )


QUERIES["feature_ops"] = q_feature_ops
ORACLE_SQL["feature_ops"] = (
    SQL_PREAMBLE
    + f"""
 SELECT conv_id, turn_idx,
        CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS conv_turn_count,
        (delta_us IS NULL OR delta_us > {_GAP}) AS is_session_start,
        COALESCE(role <> prev_role, FALSE) AS role_changed
 FROM sess"""
)


def _asof_aligned_union(sf_dir: str):
    """Shared left/right alignment for the direction-variant as-of
    queries (forward label, nearest): turns and snapshots projected to
    one tagged schema and unioned — the single conv_id exchange input."""
    import numpy as np
    import pyarrow as pa

    ev = _events(sf_dir)
    turns = events_to_turns(ev)
    snaps = events_to_snapshots(ev)

    def _al_t(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "ts": tbl.column("ts"),
                "order_key": tbl.column("order_key").cast(pa.int64()),
                "snap_val": pa.nulls(n, pa.float64()),
                "is_snap": pa.array(np.zeros(n, np.int8)),
            }
        )

    def _al_s(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "ts": tbl.column("ts"),
                "order_key": pa.array(np.zeros(n, np.int64)),
                "snap_val": tbl.column("snap_val").cast(pa.float64()),
                "is_snap": pa.array(np.ones(n, np.int8)),
            }
        )

    return turns.map_batches(
        _al_t, batch_format="pyarrow", batch_size=None
    ).union(snaps.map_batches(_al_s, batch_format="pyarrow", batch_size=None))


def _asof_partition_prologue(tbl):
    """Shared kernel prologue over one exchange partition of the
    aligned union: split turn/snapshot rows, sort turns by
    (conv, ts, order_key) deriving per-conversation turn_idx, sort
    snapshots by (conv, ts). Returns None when the partition holds no
    turns, else a dict of the sorted arrays every direction variant
    needs."""
    import numpy as np
    import pyarrow as pa

    is_snap = tbl.column("is_snap").to_numpy(zero_copy_only=False)
    conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
    _, codes = np.unique(conv, return_inverse=True)
    ts = tbl.column("ts").cast(pa.int64()).to_numpy()
    okey = tbl.column("order_key").to_numpy(zero_copy_only=False)
    t_rows = np.flatnonzero(is_snap == 0)
    s_rows = np.flatnonzero(is_snap == 1)
    t_order = np.lexsort((okey[t_rows], ts[t_rows], codes[t_rows]))
    t_sel = t_rows[t_order]
    n_t = len(t_sel)
    if n_t == 0:
        return None
    codes_t, ts_t = codes[t_sel], ts[t_sel]
    seg_new = np.r_[True, codes_t[1:] != codes_t[:-1]]
    starts = np.flatnonzero(seg_new)
    lens = np.diff(np.r_[starts, n_t])
    tix = (np.arange(n_t) - np.repeat(starts, lens)).astype(np.int32)
    s_order = np.lexsort((ts[s_rows], codes[s_rows]))
    s_sel = s_rows[s_order]
    sv_all = tbl.column("snap_val").to_numpy(zero_copy_only=False)
    return {
        "conv_t": conv[t_sel], "codes_t": codes_t, "ts_t": ts_t,
        "tix": tix, "codes_s": codes[s_sel], "ts_s": ts[s_sel],
        "sv_s": sv_all[s_sel] if len(s_sel) else sv_all[:0],
    }


def q_label_next_snapshot(sf_dir: str):
    """FORWARD as-of: each turn labelled with the earliest snapshot at
    or after it (``snap.ts >= turn.ts``) — the training-LABEL lookup
    that deliberately reads the future, mirror-image of the
    leakage-safe backward feature join. One hash exchange on conv_id
    over the aligned turns ∪ snaps union (shared
    :func:`_asof_aligned_union`), then a single vectorized forward
    searchsorted per partition
    (functions/segkernels.asof_indices_forward)."""
    import numpy as np
    import pyarrow as pa

    from ..functions import segkernels as sk
    from ..stages.exchange import hash_exchange

    unioned = _asof_aligned_union(sf_dir)

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("next_val", pa.float64()),
            ("next_lead_s", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        pr = _asof_partition_prologue(tbl)
        if pr is None:
            return out_schema.empty_table()
        a_idx, a_ok = sk.asof_indices_forward(
            pr["codes_t"], pr["ts_t"], pr["codes_s"], pr["ts_s"],
            allow_exact=True,
        )
        if len(pr["codes_s"]):
            nv = np.where(a_ok, pr["sv_s"][a_idx], 0.0)
            lead = (
                np.where(a_ok, pr["ts_s"][a_idx], 0)
                - np.where(a_ok, pr["ts_t"], 0)
            ).astype(np.float64) / 1e6
        else:
            nv = np.zeros(len(pr["ts_t"]))
            lead = np.zeros(len(pr["ts_t"]))
        return pa.table(
            {
                "conv_id": pa.array(pr["conv_t"], pa.string()),
                "turn_idx": pa.array(pr["tix"]),
                "next_val": pa.array(nv, mask=~a_ok),
                "next_lead_s": pa.array(lead, mask=~a_ok),
            }
        )

    return hash_exchange(
        unioned, "conv_id", PCFG.num_buckets, _kernel,
        empty_schema=out_schema,
    )


QUERIES["label_next_snapshot"] = q_label_next_snapshot
ORACLE_SQL["label_next_snapshot"] = f"""
WITH {SQL_TURNS_CTE},
{SQL_SNAPS_CTE},
fwd AS (
  SELECT t.conv_id, t.turn_idx, s.snap_val AS next_val,
    CAST(epoch_us(s.ts) - epoch_us(t.ts) AS DOUBLE)/1000000 AS next_lead_s
  FROM turns t ASOF LEFT JOIN snaps s
    ON t.conv_id = s.conv_id AND t.ts <= s.ts
)
SELECT conv_id, turn_idx, next_val, next_lead_s FROM fwd
""".strip()


def q_bfill_tool(sf_dir: str):
    """Backward fill of the sparse tool column: each turn takes the
    NEXT tool call at-or-after it within its conversation (the
    label-side mirror of the leakage-safe ffill feature) — one hash
    exchange on conv_id, then vectorized reversed prefix-min
    (functions/segkernels.bfill_indices)."""
    import numpy as np
    import pyarrow as pa

    from ..functions import segkernels as sk
    from ..stages.exchange import hash_exchange

    turns = events_to_turns(_events(sf_dir))

    def _project(tbl: pa.Table) -> pa.Table:
        return tbl.select(["conv_id", "ts", "order_key", "tool"])

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("bfill_tool", pa.string()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        _, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        okey = tbl.column("order_key").cast(pa.int64()).to_numpy()
        order = np.lexsort((okey, ts, codes))
        t = tbl.take(pa.array(order))
        codes = codes[order]
        n = len(codes)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, n])
        tix = (np.arange(n) - np.repeat(starts, lens)).astype(np.int32)
        valid = t.column("tool").is_valid().to_numpy(zero_copy_only=False)
        idx, ok = sk.bfill_indices(valid, codes)
        take_idx = pa.array(np.where(ok, idx, 0), mask=~ok)
        tool_arr = t.column("tool").combine_chunks()
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": pa.array(tix),
                "bfill_tool": tool_arr.take(take_idx),
            }
        )

    return hash_exchange(
        turns.map_batches(_project, batch_format="pyarrow", batch_size=None),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["bfill_tool"] = q_bfill_tool
ORACLE_SQL["bfill_tool"] = f"""
WITH {SQL_TURNS_CTE}
SELECT conv_id, turn_idx,
  first_value(tool IGNORE NULLS) OVER (
    PARTITION BY conv_id ORDER BY ts, event_id
    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill_tool
FROM turns
""".strip()


def q_purchase_within_hour(sf_dir: str):
    """Future-window conversion label: for each turn, how many
    purchase turns occur in the same conversation within [ts, ts+1h]
    (value-range frame — equal-ts peers count symmetrically on both
    engines). One conv_id exchange; per partition ONE composite-key
    searchsorted pair over the purchase subset — the windowed-label
    mirror of the time-window feature counts."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    H_US = 3600 * US_PER_S
    turns = events_to_turns(_events(sf_dir))

    def _project(tbl: pa.Table) -> pa.Table:
        return tbl.select(["conv_id", "ts", "order_key", "role"])

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("purchases_next_hour", pa.int64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        _, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        okey = tbl.column("order_key").cast(pa.int64()).to_numpy()
        order = np.lexsort((okey, ts, codes))
        t = tbl.take(pa.array(order))
        codes, ts = codes[order], ts[order]
        n = len(codes)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, n])
        tix = (np.arange(n) - np.repeat(starts, lens)).astype(np.int32)
        is_p = (
            t.column("role").to_numpy(zero_copy_only=False) == "purchase"
        )
        p_codes, p_ts = codes[is_p], ts[is_p]
        lo = int(ts.min())
        span = int(ts.max()) + H_US - lo + 2
        if (int(codes.max()) + 1) * span >= 2**63:
            raise OverflowError("composite window key overflows int64")
        gp = p_codes.astype(np.int64) * span + (p_ts - lo)
        g_lo = codes.astype(np.int64) * span + (ts - lo)
        g_hi = codes.astype(np.int64) * span + (ts + H_US - lo)
        cnt = np.searchsorted(gp, g_hi, side="right") - np.searchsorted(
            gp, g_lo, side="left"
        )
        return pa.table(
            {
                "conv_id": t.column("conv_id"),
                "turn_idx": pa.array(tix),
                "purchases_next_hour": pa.array(cnt.astype(np.int64)),
            }
        )

    return hash_exchange(
        turns.map_batches(_project, batch_format="pyarrow", batch_size=None),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["purchase_within_hour"] = q_purchase_within_hour
ORACLE_SQL["purchase_within_hour"] = f"""
WITH {SQL_TURNS_CTE}
SELECT conv_id, turn_idx,
  CAST(SUM(CASE WHEN role = 'purchase' THEN 1 ELSE 0 END) OVER (
    PARTITION BY conv_id ORDER BY ts
    RANGE BETWEEN CURRENT ROW AND INTERVAL 1 HOUR FOLLOWING)
    AS BIGINT) AS purchases_next_hour
FROM turns
""".strip()


def q_conv_latency_quantiles(sf_dir: str):
    """Per-conversation EXACT latency percentiles (entity-cardinality
    grouped quantiles — millions of groups belong on the exchange, not
    in driver-merged sketches): one conv_id exchange, then fully
    vectorized per partition — lexsort once for the deltas, a second
    lexsort of (conv, delta), and the quantile_disc index
    ceil(q·n)−1 picked per group run; single-turn conversations have
    no deltas and drop out exactly as in the SQL."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    turns = events_to_turns(_events(sf_dir))

    def _project(tbl: pa.Table) -> pa.Table:
        return tbl.select(["conv_id", "ts", "order_key"])

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("p50_us", pa.int64()),
            ("p90_us", pa.int64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        okey = tbl.column("order_key").cast(pa.int64()).to_numpy()
        order = np.lexsort((okey, ts, codes))
        codes, ts = codes[order], ts[order]
        n = len(codes)
        same = np.r_[False, codes[1:] == codes[:-1]]
        delta = np.empty(n, np.int64)
        delta[1:] = ts[1:] - ts[:-1]
        d_codes, d_vals = codes[same], delta[same]
        if not len(d_codes):
            return out_schema.empty_table()
        o2 = np.lexsort((d_vals, d_codes))
        d_codes, d_vals = d_codes[o2], d_vals[o2]
        starts = np.flatnonzero(
            np.r_[True, d_codes[1:] != d_codes[:-1]]
        )
        lens = np.diff(np.r_[starts, len(d_codes)])
        out = {"conv_id": pa.array(uniq[d_codes[starts]], pa.string())}
        for name, q in (("p50_us", 0.5), ("p90_us", 0.9)):
            k = np.ceil(q * lens).astype(np.int64) - 1
            out[name] = pa.array(d_vals[starts + k])
        return pa.table(out)

    return hash_exchange(
        turns.map_batches(_project, batch_format="pyarrow", batch_size=None),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["conv_latency_quantiles"] = q_conv_latency_quantiles
ORACLE_SQL["conv_latency_quantiles"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY ts, event_id) AS delta_us
  FROM turns)
SELECT conv_id,
  quantile_disc(delta_us, 0.5) AS p50_us,
  quantile_disc(delta_us, 0.9) AS p90_us
FROM d WHERE delta_us IS NOT NULL
GROUP BY conv_id
""".strip()


ASOF_TOL_S = 86400  # 24h


def q_asof_join_tolerance(sf_dir: str):
    """As-of join with a max-age TOLERANCE (pandas
    merge_asof(tolerance=...) semantics): a prior snapshot older than
    24h is treated as absent — a pure streaming mask over the as-of
    output, so tolerance costs nothing extra at scale. The age
    comparison is exact on both engines (identical double from
    identical integer microseconds)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    feats = _features(sf_dir).select_columns(
        ["conv_id", "turn_idx", "snap_val_asof", "snap_tag_asof",
         "snap_age_s"]
    )

    def _mask(tbl: pa.Table) -> pa.Table:
        ok = pc.and_kleene(
            pc.is_valid(tbl.column("snap_age_s")),
            pc.less_equal(
                tbl.column("snap_age_s"), pa.scalar(float(ASOF_TOL_S))
            ),
        )
        ok = pc.fill_null(ok, False)
        null_f = pa.scalar(None, pa.float64())
        null_s = pa.scalar(None, pa.string())
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "turn_idx": tbl.column("turn_idx"),
                "snap_val_tol": pc.if_else(
                    ok, tbl.column("snap_val_asof"), null_f
                ),
                "snap_tag_tol": pc.if_else(
                    ok, tbl.column("snap_tag_asof"), null_s
                ),
                "snap_age_tol_s": pc.if_else(
                    ok, tbl.column("snap_age_s"), null_f
                ),
            }
        )

    return feats.map_batches(_mask, batch_format="pyarrow")


QUERIES["asof_join_tolerance"] = q_asof_join_tolerance
ORACLE_SQL["asof_join_tolerance"] = (
    SQL_PREAMBLE
    + f"""
 SELECT conv_id, turn_idx,
   CASE WHEN snap_age_s <= {ASOF_TOL_S} THEN snap_val_asof END
     AS snap_val_tol,
   CASE WHEN snap_age_s <= {ASOF_TOL_S} THEN snap_tag_asof END
     AS snap_tag_tol,
   CASE WHEN snap_age_s <= {ASOF_TOL_S} THEN snap_age_s END
     AS snap_age_tol_s
 FROM asofj"""
)


def q_asof_join_nearest(sf_dir: str):
    """NEAREST-neighbor temporal join (the pandas
    ``merge_asof(direction='nearest')`` analog): each turn takes
    whichever same-conversation snapshot is closer in time — the
    latest at-or-before vs the earliest at-or-after — with exact ties
    resolved to the backward (leakage-safe) side. Completes the
    engine's as-of family: backward (feature), forward (label),
    tolerance-bounded, and now nearest. Same single conv_id exchange
    over the shared aligned union; the kernel runs BOTH composite-key
    searchsorted lookups and picks per-row by integer-µs distance —
    no extra shuffle over running one direction."""
    import numpy as np
    import pyarrow as pa

    from ..functions import segkernels as sk
    from ..stages.exchange import hash_exchange

    unioned = _asof_aligned_union(sf_dir)

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("nearest_val", pa.float64()),
            ("nearest_dist_s", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        pr = _asof_partition_prologue(tbl)
        if pr is None:
            return out_schema.empty_table()
        codes_t, ts_t = pr["codes_t"], pr["ts_t"]
        b_idx, b_ok = sk.asof_indices(
            codes_t, ts_t, pr["codes_s"], pr["ts_s"], allow_exact=True
        )
        f_idx, f_ok = sk.asof_indices_forward(
            codes_t, ts_t, pr["codes_s"], pr["ts_s"], allow_exact=True
        )
        any_ok = b_ok | f_ok
        if len(pr["codes_s"]):
            sv_s, ts_s = pr["sv_s"], pr["ts_s"]
            db = np.where(b_ok, ts_t - ts_s[b_idx], 0)
            df = np.where(f_ok, ts_s[f_idx] - ts_t, 0)
            # backward wins when it exists and is at least as close
            # (<=: exact ties go to the leakage-safe side)
            use_b = b_ok & (~f_ok | (db <= df))
            nv = np.where(
                use_b, sv_s[b_idx], np.where(f_ok, sv_s[f_idx], 0.0)
            )
            dist = np.where(use_b, db, df).astype(np.float64) / 1e6
        else:
            nv = np.zeros(len(ts_t))
            dist = np.zeros(len(ts_t))
        return pa.table(
            {
                "conv_id": pa.array(pr["conv_t"], pa.string()),
                "turn_idx": pa.array(pr["tix"]),
                "nearest_val": pa.array(nv, mask=~any_ok),
                "nearest_dist_s": pa.array(dist, mask=~any_ok),
            }
        )

    return hash_exchange(
        unioned, "conv_id", PCFG.num_buckets, _kernel,
        empty_schema=out_schema,
    )


QUERIES["asof_join_nearest"] = q_asof_join_nearest
ORACLE_SQL["asof_join_nearest"] = f"""
WITH {SQL_TURNS_CTE},
{SQL_SNAPS_CTE},
b AS (
  SELECT t.conv_id, t.turn_idx, t.ts, s.ts AS bts, s.snap_val AS bval
  FROM turns t ASOF LEFT JOIN snaps s
    ON t.conv_id = s.conv_id AND s.ts <= t.ts
),
f AS (
  SELECT t.conv_id, t.turn_idx, s.ts AS fts, s.snap_val AS fval
  FROM turns t ASOF LEFT JOIN snaps s
    ON t.conv_id = s.conv_id AND t.ts <= s.ts
)
SELECT b.conv_id, b.turn_idx,
  -- dispatch on MATCH EXISTENCE (the matched snapshot ts), never on
  -- the value: a matched snapshot whose snap_val is NULL must still
  -- win on distance, mirroring the engine's b_ok/f_ok logic
  CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
       WHEN fts IS NULL THEN bval
       WHEN bts IS NULL THEN fval
       WHEN (epoch_us(b.ts) - epoch_us(bts))
            <= (epoch_us(fts) - epoch_us(b.ts)) THEN bval
       ELSE fval END AS nearest_val,
  CAST(CASE WHEN bts IS NULL AND fts IS NULL THEN NULL
       WHEN fts IS NULL THEN epoch_us(b.ts) - epoch_us(bts)
       WHEN bts IS NULL THEN epoch_us(fts) - epoch_us(b.ts)
       WHEN (epoch_us(b.ts) - epoch_us(bts))
            <= (epoch_us(fts) - epoch_us(b.ts))
            THEN epoch_us(b.ts) - epoch_us(bts)
       ELSE epoch_us(fts) - epoch_us(b.ts) END AS DOUBLE) / 1000000
    AS nearest_dist_s
FROM b JOIN f ON b.conv_id = f.conv_id AND b.turn_idx = f.turn_idx
""".strip()


def q_asof_interpolate(sf_dir: str):
    """Linear time-interpolation between the two bracketing snapshots
    (the ``pandas``-style ``interpolate(method='time')`` at arbitrary
    query points): each turn takes
    ``(v0·(t1−t) + v1·(t−t0)) / (t1−t0)`` between the latest
    at-or-before (t0, v0) and earliest at-or-after (t1, v1) snapshot,
    degrading to the single available side at the stream edges. The
    missing-modality fill family's numeric completion (ffill/bfill
    carry values; this blends them).

    Parity: µs deltas are exact int64; the blend is ONE fixed-shape
    float expression (two multiplies, one add, one divide) written
    identically in SQL — deterministic IEEE, no accumulation. NULL
    snapshot values propagate to NULL exactly as SQL arithmetic does.
    Same single conv_id exchange as the rest of the as-of family."""
    import numpy as np
    import pyarrow as pa

    from ..functions import segkernels as sk
    from ..stages.exchange import hash_exchange

    unioned = _asof_aligned_union(sf_dir)

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("interp_val", pa.float64()),
            ("kind", pa.string()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        pr = _asof_partition_prologue(tbl)
        if pr is None:
            return out_schema.empty_table()
        codes_t, ts_t = pr["codes_t"], pr["ts_t"]
        b_idx, b_ok = sk.asof_indices(
            codes_t, ts_t, pr["codes_s"], pr["ts_s"], allow_exact=True
        )
        f_idx, f_ok = sk.asof_indices_forward(
            codes_t, ts_t, pr["codes_s"], pr["ts_s"], allow_exact=True
        )
        any_ok = b_ok | f_ok
        n = len(ts_t)
        if len(pr["codes_s"]):
            sv_s, ts_s = pr["sv_s"], pr["ts_s"]
            t0 = np.where(b_ok, ts_s[b_idx], 0)
            t1 = np.where(f_ok, ts_s[f_idx], 0)
            v0 = np.where(b_ok, sv_s[b_idx], np.nan)
            v1 = np.where(f_ok, sv_s[f_idx], np.nan)
            both = b_ok & f_ok
            span = t1 - t0
            interp_ok = both & (span > 0)
            den = np.where(interp_ok, span, 1).astype(np.float64)
            blend = (
                v0 * (t1 - ts_t).astype(np.float64)
                + v1 * (ts_t - t0).astype(np.float64)
            ) / den
            # edge/degenerate dispatch mirrors the SQL CASE exactly
            val = np.where(
                interp_ok, blend, np.where(b_ok, v0, v1)
            )
            kind = np.where(
                interp_ok, "interp",
                np.where(b_ok, "backward", "forward"),
            )
        else:
            val = np.zeros(n)
            kind = np.full(n, "", dtype=object)
        null_val = ~any_ok | np.isnan(val)
        return pa.table(
            {
                "conv_id": pa.array(pr["conv_t"], pa.string()),
                "turn_idx": pa.array(pr["tix"]),
                "interp_val": pa.array(val, mask=null_val),
                "kind": pa.array(
                    np.asarray(kind, dtype=object), pa.string(),
                    mask=~any_ok,
                ),
            }
        )

    return hash_exchange(
        unioned, ["conv_id"], PCFG.num_buckets, _kernel, out_schema
    )


QUERIES["asof_interpolate"] = q_asof_interpolate
ORACLE_SQL["asof_interpolate"] = f"""
WITH {SQL_TURNS_CTE},
{SQL_SNAPS_CTE},
b AS (
  SELECT t.conv_id, t.turn_idx, t.ts, s.ts AS bts, s.snap_val AS bval
  FROM turns t ASOF LEFT JOIN snaps s
    ON t.conv_id = s.conv_id AND s.ts <= t.ts
),
f AS (
  SELECT t.conv_id, t.turn_idx, s.ts AS fts, s.snap_val AS fval
  FROM turns t ASOF LEFT JOIN snaps s
    ON t.conv_id = s.conv_id AND t.ts <= s.ts
)
SELECT b.conv_id, b.turn_idx,
  CASE
    WHEN bts IS NOT NULL AND fts IS NOT NULL
         AND epoch_us(fts) > epoch_us(bts) THEN
      (bval * CAST(epoch_us(fts) - epoch_us(b.ts) AS DOUBLE)
       + fval * CAST(epoch_us(b.ts) - epoch_us(bts) AS DOUBLE))
      / CAST(epoch_us(fts) - epoch_us(bts) AS DOUBLE)
    WHEN bts IS NOT NULL THEN bval
    ELSE fval
  END AS interp_val,
  CASE
    WHEN bts IS NULL AND fts IS NULL THEN NULL
    WHEN bts IS NOT NULL AND fts IS NOT NULL
         AND epoch_us(fts) > epoch_us(bts) THEN 'interp'
    WHEN bts IS NOT NULL THEN 'backward'
    ELSE 'forward'
  END AS kind
FROM b JOIN f ON b.conv_id = f.conv_id AND b.turn_idx = f.turn_idx
""".strip()


# --------------------------------------------------------------------------
# SFT pair assembly: (prompt, completion) extraction from turn pairs

SFT_PROMPT_ROLE = "view"
SFT_COMPLETION_ROLE = "purchase"


def q_sft_pairs(sf_dir: str):
    """Training-pair assembly — the step that turns raw transcripts
    into supervised examples: every turn whose role is the completion
    role, paired with the immediately preceding turn when that turn
    has the prompt role, with byte-exact prompt/completion text and
    the response latency. The pair boundary is the same stable
    (conv_id, ts, order_key) turn order every transcript kernel uses.

    Scale shape: one conv_id hash exchange (pairs never cross a
    conversation), one lexsort + vectorized shift inside the kernel,
    latency in integer µs with a single final IEEE division."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.exchange import hash_exchange

    turns = events_to_turns(_events(sf_dir))

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("prompt", pa.string()),
            ("completion", pa.string()),
            ("latency_s", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        t = tbl.take(
            pc.sort_indices(
                tbl,
                sort_keys=[
                    ("conv_id", "ascending"),
                    ("ts", "ascending"),
                    ("order_key", "ascending"),
                ],
            )
        )
        conv = t.column("conv_id").to_numpy(zero_copy_only=False)
        role = t.column("role").to_numpy(zero_copy_only=False)
        text = t.column("text").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        n = len(conv)
        if n < 2:
            return out_schema.empty_table()
        same = conv[1:] == conv[:-1]
        hit = (
            same
            & (role[:-1] == SFT_PROMPT_ROLE)
            & (role[1:] == SFT_COMPLETION_ROLE)
        )
        i = np.flatnonzero(hit)
        lat = (ts[i + 1] - ts[i]).astype(np.float64) / 1000000.0
        return pa.table(
            {
                "conv_id": pa.array(conv[i], pa.string()),
                "prompt": pa.array(text[i], pa.string()),
                "completion": pa.array(text[i + 1], pa.string()),
                "latency_s": pa.array(lat),
            }
        )

    return hash_exchange(turns, ["conv_id"], 16, _kernel, out_schema)


SQL_SFT = f"""
WITH {SQL_TURNS_CTE},
seq AS (
  SELECT conv_id, role, text, ts,
    lag(role) OVER w AS prev_role,
    lag(text) OVER w AS prev_text,
    lag(epoch_us(ts)) OVER w AS prev_us
  FROM turns
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, prev_text AS prompt, text AS completion,
  CAST(epoch_us(ts) - prev_us AS DOUBLE) / 1000000 AS latency_s
FROM seq
WHERE prev_role = '{SFT_PROMPT_ROLE}' AND role = '{SFT_COMPLETION_ROLE}'
""".strip()


# --------------------------------------------------------------------------
# conversation-level exact dedup via ordered transcript fingerprints

def q_dedup_conversations(sf_dir: str):
    """Whole-conversation exact dedup: the transcript fingerprint is
    the ordered concatenation of turn texts (unit separator \\x1f,
    never present in text), survivors keep the MIN conv_id per
    distinct transcript. The clean events table has no duplicate
    conversations, so duplicates are PLANTED (user_id % 11 == 0 convs
    replayed under conv_id+1000000 — mirrored in the oracle).

    Scale shape: the ordered join is grouped_string_agg's C++
    binary_join on the conv_id exchange; the dedup group-by runs on
    the fingerprint itself at gate scale (production would key the
    exchange on hash64(transcript) and verify inside the group — the
    dedup_exact convention, stages/dedup.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.groupagg import hash_grouped_aggregate
    from ..stages.scan import grouped_string_agg

    turns = events_to_turns(_events(sf_dir))

    def _plant(tbl: pa.Table) -> pa.Table:
        import numpy as np

        uid = pc.cast(tbl.column("conv_id"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        dup = tbl.filter(pa.array(uid % 11 == 0))
        new_id = pc.cast(
            pc.add(pc.cast(dup.column("conv_id"), pa.int64()), 1000000),
            pa.string(),
        )
        dup = dup.set_column(
            dup.schema.get_field_index("conv_id"), "conv_id", new_id
        )
        return pa.concat_tables([tbl, dup])

    planted = turns.map_batches(
        _plant, batch_format="pyarrow", batch_size=None
    )

    fp = grouped_string_agg(
        planted,
        "conv_id",
        order_by=[("ts", "ascending"), ("order_key", "ascending")],
        value_col="text",
        sep="\x1f",
        out="transcript",
        count_col="n_turns",
        num_partitions=16,
    )

    def _one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "n_convs", pa.array([1] * t.num_rows, pa.int64())
        )

    agg = hash_grouped_aggregate(
        fp.map_batches(_one, batch_format="pyarrow", batch_size=None),
        ["transcript"],
        [("conv_id", "min"), ("n_convs", "sum"), ("n_turns", "min")],
        num_buckets=8,
    )
    return agg.map_batches(
        lambda t: t.rename_columns(
            ["transcript", "survivor_conv_id", "n_convs", "n_turns"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


SQL_DEDUP_CONV = f"""
WITH {SQL_TURNS_CTE},
planted AS (
  SELECT conv_id, text, ts, event_id FROM turns
  UNION ALL
  SELECT CAST(CAST(conv_id AS BIGINT) + 1000000 AS VARCHAR) AS conv_id,
         text, ts, event_id
  FROM turns WHERE CAST(conv_id AS BIGINT) % 11 = 0
),
fp AS (
  SELECT conv_id,
    string_agg(text, chr(31) ORDER BY ts, event_id) AS transcript,
    CAST(count(*) AS BIGINT) AS n_turns
  FROM planted GROUP BY conv_id
)
SELECT transcript, min(conv_id) AS survivor_conv_id,
  CAST(count(*) AS BIGINT) AS n_convs,
  CAST(min(n_turns) AS BIGINT) AS n_turns
FROM fp GROUP BY transcript
""".strip()


QUERIES["sft_pairs"] = q_sft_pairs
ORACLE_SQL["sft_pairs"] = SQL_SFT
QUERIES["dedup_conversations"] = q_dedup_conversations
ORACLE_SQL["dedup_conversations"] = SQL_DEDUP_CONV


# --------------------------------------------------------------------------
# LLM training-context assembly on the core transcript payload

_CTX_K = 2  # previous turns included (window = K+1 turns)


def q_context_window_assembly(sf_dir: str):
    """Per-turn training-context assembly: each turn's model input is
    the concatenation of its previous {k} turns' text plus its own
    (' | '-joined) — the context builder a conversational fine-tuning
    pipeline runs over every turn. One conv_id grouped exchange;
    inside the group the rolling concat is vectorized shifted-array
    string addition, no per-turn Python.""".format(k=_CTX_K)
    import numpy as np
    import pyarrow as pa

    from ..sources.events_adapter import events_to_turns
    from ..stages.exchange import hash_grouped_map

    turns = events_to_turns(_events(sf_dir))

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("context", pa.string()),
        ]
    )

    def _assemble(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy()
        ok = group.column("order_key").to_numpy()
        o = np.lexsort((ok, ts))
        txt = (
            group.column("text").to_pandas().fillna("").to_numpy()
        )[o].astype(str)
        n = len(txt)
        ctx = txt.copy()
        for k in range(1, _CTX_K + 1):
            prev = np.empty(n, dtype=object)
            prev[:k] = None
            prev[k:] = txt[:-k]
            has = np.arange(n) >= k
            ctx = np.where(
                has, np.char.add(np.char.add(prev.astype(str), " | "),
                                 ctx.astype(str)), ctx
            )
        cid = group.column("conv_id").to_pandas().to_numpy()[o]
        return pa.table(
            {
                "conv_id": pa.array(cid.astype(object), pa.string()),
                "turn_idx": pa.array(
                    np.arange(n, dtype=np.int32), pa.int32()
                ),
                "context": pa.array(ctx.astype(object), pa.string()),
            }
        )

    return hash_grouped_map(
        turns, "conv_id", _assemble, num_partitions=16,
        empty_schema=out_schema,
    )


QUERIES["context_window_assembly"] = q_context_window_assembly
ORACLE_SQL["context_window_assembly"] = f"""
WITH {SQL_TURNS_CTE}
SELECT conv_id, turn_idx,
  string_agg(coalesce(text, ''), ' | ') OVER (
    PARTITION BY conv_id ORDER BY turn_idx
    ROWS BETWEEN {_CTX_K} PRECEDING AND CURRENT ROW) AS context
FROM turns
""".strip()


_DRIFT_PREFIX = 48  # codepoints compared (bounds the DP like the
# edit-distance dedup; both sides truncate identically)


def q_turn_drift_features(sf_dir: str):
    """Per-turn conversational drift: Levenshtein distance between
    each turn's text prefix and the previous turn's (NULL on turn 0)
    — the repetition/template signal at turn granularity. Rides the
    conv_id exchange; inside each group the adjacent pairs go through
    the vectorized column-wise DP shared with the edit-distance dedup
    (stages/dedup.py:_levenshtein_pairs_vec), no per-pair Python."""
    import numpy as np
    import pyarrow as pa

    from ..sources.events_adapter import events_to_turns
    from ..stages.dedup import _codepoint_matrix, _levenshtein_pairs_vec
    from ..stages.exchange import hash_grouped_map

    turns = events_to_turns(_events(sf_dir))

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("drift", pa.int64()),
        ]
    )

    def _drift(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy()
        ok = group.column("order_key").to_numpy()
        o = np.lexsort((ok, ts))
        txt = (
            group.column("text").to_pandas().fillna("").to_numpy()
        )[o]
        n = len(txt)
        cp, lens = _codepoint_matrix(
            [t[:_DRIFT_PREFIX] for t in txt], _DRIFT_PREFIX
        )
        if n > 1:
            ia = np.arange(1, n)
            ib = np.arange(0, n - 1)
            d = _levenshtein_pairs_vec(cp, lens, ia, ib)
        else:
            d = np.empty(0, np.int64)
        drift = np.concatenate(([0], d)).astype(np.int64)
        cid = group.column("conv_id").to_pandas().to_numpy()[o]
        return pa.table(
            {
                "conv_id": pa.array(cid.astype(object), pa.string()),
                "turn_idx": pa.array(
                    np.arange(n, dtype=np.int32), pa.int32()
                ),
                "drift": pa.array(
                    drift, pa.int64(),
                    mask=np.r_[True, np.zeros(n - 1, bool)],
                ),
            }
        )

    return hash_grouped_map(
        turns, "conv_id", _drift, num_partitions=16,
        empty_schema=out_schema,
    )


QUERIES["turn_drift_features"] = q_turn_drift_features
ORACLE_SQL["turn_drift_features"] = f"""
WITH {SQL_TURNS_CTE}
SELECT conv_id, turn_idx,
  CAST(levenshtein(
    substr(coalesce(text, ''), 1, {_DRIFT_PREFIX}),
    substr(coalesce(lag(text) OVER w, ''), 1, {_DRIFT_PREFIX})
  ) AS BIGINT) AS drift
FROM turns
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
QUALIFY lag(text) OVER w IS NOT NULL OR turn_idx > 0
UNION ALL
SELECT conv_id, turn_idx, CAST(NULL AS BIGINT) AS drift
FROM turns WHERE turn_idx = 0
""".strip()


def q_role_rle(sf_dir: str):
    """Run-length-encoded role sequence per conversation
    ('view:3>click:1>...') plus run count and longest run — the
    compact conversation-shape signature (burst detection, template
    spotting). One conv exchange; runs found by one vectorized
    neighbor compare."""
    import numpy as np
    import pyarrow as pa

    from ..sources.events_adapter import events_to_turns
    from ..stages.exchange import hash_grouped_map

    turns = events_to_turns(_events(sf_dir))

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("rle", pa.string()),
            ("n_runs", pa.int64()),
            ("max_run", pa.int64()),
        ]
    )

    def _rle(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy()
        ok = group.column("order_key").to_numpy()
        o = np.lexsort((ok, ts))
        roles = group.column("role").to_pandas().to_numpy()[o]
        n = len(roles)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = roles[1:] != roles[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, n])
        parts = [
            f"{roles[s]}:{l}" for s, l in zip(starts, lens)
        ]
        cid = group.column("conv_id")[0].as_py()
        return pa.table(
            {
                "conv_id": pa.array([cid], pa.string()),
                "rle": pa.array([">".join(parts)], pa.string()),
                "n_runs": pa.array([len(starts)], pa.int64()),
                "max_run": pa.array([int(lens.max())], pa.int64()),
            }
        )

    return hash_grouped_map(
        turns, "conv_id", _rle, num_partitions=16,
        empty_schema=out_schema,
    )


QUERIES["role_rle"] = q_role_rle
ORACLE_SQL["role_rle"] = f"""
WITH {SQL_TURNS_CTE},
brk AS (
  SELECT conv_id, turn_idx, role,
    CASE WHEN lag(role) OVER w IS DISTINCT FROM role
         THEN 1 ELSE 0 END AS b
  FROM turns WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), isl AS (
  SELECT conv_id, turn_idx, role,
    sum(b) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run
  FROM brk
), runs AS (
  SELECT conv_id, run, min(turn_idx) AS s, role,
    CAST(count(*) AS BIGINT) AS len
  FROM isl GROUP BY conv_id, run, role
)
SELECT conv_id,
  string_agg(role || ':' || len, '>' ORDER BY s) AS rle,
  CAST(count(*) AS BIGINT) AS n_runs,
  CAST(max(len) AS BIGINT) AS max_run
FROM runs GROUP BY conv_id
""".strip()


_SAFE_TERMS = ["merge", "window"]  # synthetic-vocab stand-ins


def q_conv_safety_rate(sf_dir: str):
    """Conversation-level safety rollup on the core payload: per
    conversation, turns containing a blocked term and the flagged
    fraction (token-exact C++ value-set lookup per turn, exact
    division per conversation) — the triage view a moderation queue
    sorts by. Per-turn flags collapse in-batch; one conv-keyed count
    exchange."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.tokenize import ws_tokens
    from ..sources.events_adapter import events_to_turns
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    turns = events_to_turns(_events(sf_dir))
    vs = pa.array(sorted(set(_SAFE_TERMS)), pa.string())

    def _flags(tbl: pa.Table) -> pa.Table:
        row, flat = ws_tokens(tbl.column("text"))
        n = tbl.num_rows
        hit = pc.is_in(flat, value_set=vs).to_numpy(
            zero_copy_only=False
        )
        flagged = (
            np.bincount(row[hit], minlength=n) > 0
        ).astype(np.int64) if len(row) else np.zeros(n, np.int64)
        t = pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "n_turns": pa.array(np.ones(n, np.int64)),
                "n_flagged": pa.array(flagged),
            }
        )
        return group_aggregate_table(
            t, ["conv_id"],
            [("n_turns", "sum"), ("n_flagged", "sum")],
        )

    agg = hash_grouped_aggregate(
        turns.map_batches(_flags, batch_format="pyarrow",
                          batch_size=None),
        ["conv_id"],
        [("n_turns", "sum"), ("n_flagged", "sum")],
        num_buckets=8,
    ).to_pandas()
    agg["flag_rate"] = (
        agg["n_flagged"].astype("float64")
        / agg["n_turns"].astype("float64")
    )
    return agg.sort_values("conv_id").reset_index(drop=True)


_SAFE_SQL_LIST = ", ".join(f"'{t}'" for t in sorted(set(_SAFE_TERMS)))
QUERIES["conv_safety_rate"] = q_conv_safety_rate
ORACLE_SQL["conv_safety_rate"] = f"""
WITH {SQL_TURNS_CTE},
fl AS (
  SELECT conv_id,
    CASE WHEN len(list_filter(
      list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                  x -> x <> ''),
      x -> x IN ({_SAFE_SQL_LIST}))) > 0 THEN 1 ELSE 0 END AS f
  FROM turns
)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(f) AS BIGINT) AS n_flagged,
  CAST(sum(f) AS DOUBLE) / count(*) AS flag_rate
FROM fl GROUP BY conv_id
""".strip()


_BUDGET_TOKENS = 64


def q_context_budget_fit(sf_dir: str):
    """Dataloader truncation math: per turn, how many TRAILING turns
    (current included) fit a {b}-token context budget — the number of
    history turns a fixed-window collator would keep. Exact integers:
    per-turn whitespace token counts, a per-conversation prefix sum,
    and one searchsorted per turn inside the conv exchange; SQL
    verifies with the bounded per-conv self-join.""".format(
        b=_BUDGET_TOKENS
    )
    import numpy as np
    import pyarrow as pa

    from ..functions.tokenize import ws_tokens
    from ..sources.events_adapter import events_to_turns
    from ..stages.exchange import hash_grouped_map

    turns = events_to_turns(_events(sf_dir))

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("n_tokens", pa.int64()),
            ("n_turns_fit", pa.int64()),
        ]
    )

    def _fit(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy()
        ok = group.column("order_key").to_numpy()
        o = np.lexsort((ok, ts))
        row, _flat = ws_tokens(group.column("text").take(pa.array(o)))
        n = len(o)
        nt = np.bincount(row, minlength=n).astype(np.int64)
        c = np.concatenate(([0], np.cumsum(nt)))
        j = np.searchsorted(
            c, c[1:] - _BUDGET_TOKENS, side="left"
        )
        fit = np.arange(1, n + 1) - j
        cid = group.column("conv_id")[0].as_py()
        return pa.table(
            {
                "conv_id": pa.array([cid] * n, pa.string()),
                "turn_idx": pa.array(
                    np.arange(n, dtype=np.int32), pa.int32()
                ),
                "n_tokens": pa.array(nt),
                "n_turns_fit": pa.array(fit.astype(np.int64)),
            }
        )

    return hash_grouped_map(
        turns, "conv_id", _fit, num_partitions=16,
        empty_schema=out_schema,
    )


QUERIES["context_budget_fit"] = q_context_budget_fit
ORACLE_SQL["context_budget_fit"] = f"""
WITH {SQL_TURNS_CTE},
tt AS (
  SELECT conv_id, turn_idx,
    CAST(len(list_filter(
      string_split_regex(coalesce(text, ''), '\\s+'),
      x -> x <> '')) AS BIGINT) AS nt
  FROM turns
), cum AS (
  SELECT conv_id, turn_idx, nt,
    CAST(sum(nt) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS c
  FROM tt
)
SELECT a.conv_id, a.turn_idx, a.nt AS n_tokens,
  CAST(sum(CASE WHEN a.c - (b.c - b.nt) <= {_BUDGET_TOKENS}
           THEN 1 ELSE 0 END) AS BIGINT) AS n_turns_fit
FROM cum a JOIN cum b
  ON a.conv_id = b.conv_id AND b.turn_idx <= a.turn_idx
GROUP BY 1, 2, 3
""".strip()


# --------------------------------------------------------------------------
# windowed latency-feature family: EWMA, OLS trend, lag-1 autocorrelation.
# The reference's per-item feature loop (/root/reference/worker.py:192-266)
# emits one vector per media item; these are the transcript analogs of the
# derived temporal statistics a training pipeline attaches per turn/entity.
# Float parity discipline: all sums are exact int64 µs, both engines apply
# the SAME final IEEE expression shape (see module docstring).


def _sorted_conv_deltas(tbl):
    """Kernel prologue shared by the latency-feature family: sort one
    exchange partition by (conv_id, ts, order_key), derive the
    per-conversation turn position ``tix`` and the inter-turn
    ``delta_us`` array (masked at each conversation's first turn).
    Returns None when the partition is empty."""
    import numpy as np
    import pyarrow as pa

    if tbl.num_rows == 0:
        return None
    conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
    uniq, codes = np.unique(conv, return_inverse=True)
    ts = tbl.column("ts").cast(pa.int64()).to_numpy()
    okey = tbl.column("order_key").cast(pa.int64()).to_numpy()
    order = np.lexsort((okey, ts, codes))
    codes, ts = codes[order], ts[order]
    n = len(codes)
    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    lens = np.diff(np.r_[starts, n])
    tix = (np.arange(n) - np.repeat(starts, lens)).astype(np.int32)
    delta = np.empty(n, np.int64)
    delta[0] = 0
    if n > 1:
        delta[1:] = ts[1:] - ts[:-1]
    return {
        "uniq": uniq,
        "codes": codes,
        "tix": tix,
        "delta": delta,
        "has_delta": tix > 0,
    }


def _latency_turns(sf_dir: str):
    turns = events_to_turns(_events(sf_dir))

    def _project(tbl):
        return tbl.select(["conv_id", "ts", "order_key"])

    return turns.map_batches(_project, batch_format="pyarrow", batch_size=None)


_EWMA_WEIGHTS = (1.0, 0.5, 0.25, 0.125)  # lags 0..3; dyadic => exact floats


def q_ewma_latency(sf_dir: str):
    """Per-turn EWMA of inter-turn latency over the last 4 deltas
    (weights 1, 1/2, 1/4, 1/8 — dyadic so each scaled term is an EXACT
    float64), normalized over the lags actually present; the first turn
    of a conversation (no delta anywhere in the window) is NULL. One
    conv_id exchange, then fully vectorized lag-shift arithmetic; the
    numerator/denominator additions replicate the oracle's left-fold
    order bit for bit."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("ewma_latency_s", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        codes, tix, delta = st["codes"], st["tix"], st["delta"]
        n = len(codes)
        num = np.zeros(n, np.float64)
        den = np.zeros(n, np.float64)
        for j, w in enumerate(_EWMA_WEIGHTS):
            valid = tix >= (j + 1)
            dj = np.zeros(n, np.float64)
            idx = np.flatnonzero(valid)
            dj[idx] = delta[idx - j].astype(np.float64)
            if j == 0:
                num = dj
            else:
                num = num + dj * w
            den = den + np.where(valid, w, 0.0)
        present = den > 0.0
        safe_den = np.where(present, den, 1.0)
        ew = (num / safe_den) / 1000000.0
        return pa.table(
            {
                "conv_id": pa.array(st["uniq"][codes], pa.string()),
                "turn_idx": pa.array(tix, pa.int32()),
                "ewma_latency_s": pa.array(ew, mask=~present),
            }
        )

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["ewma_latency"] = q_ewma_latency
ORACLE_SQL["ewma_latency"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, turn_idx,
    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us
  FROM turns
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
lagd AS (
  SELECT conv_id, turn_idx, delta_us AS d0,
    lag(delta_us, 1) OVER w AS d1,
    lag(delta_us, 2) OVER w AS d2,
    lag(delta_us, 3) OVER w AS d3
  FROM d
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT conv_id, turn_idx,
  CASE WHEN d0 IS NULL AND d1 IS NULL AND d2 IS NULL AND d3 IS NULL
       THEN NULL
  ELSE (COALESCE(CAST(d0 AS DOUBLE), 0)
        + COALESCE(CAST(d1 AS DOUBLE), 0) * 0.5
        + COALESCE(CAST(d2 AS DOUBLE), 0) * 0.25
        + COALESCE(CAST(d3 AS DOUBLE), 0) * 0.125)
     / ((CASE WHEN d0 IS NOT NULL THEN 1.0 ELSE 0.0 END)
        + (CASE WHEN d1 IS NOT NULL THEN 0.5 ELSE 0.0 END)
        + (CASE WHEN d2 IS NOT NULL THEN 0.25 ELSE 0.0 END)
        + (CASE WHEN d3 IS NOT NULL THEN 0.125 ELSE 0.0 END))
     / 1000000 END AS ewma_latency_s
FROM lagd
""".strip()


def q_conv_latency_trend(sf_dir: str):
    """Per-conversation OLS slope of inter-turn latency vs turn
    position (is this conversation speeding up or slowing down?) —
    the classic trend feature. Exact int64 sums (Σx, Σy, Σxy, Σx²)
    per group via one reduceat pass, then the single closed-form
    (m·Σxy − Σx·Σy) / (m·Σx² − (Σx)²) with both engines casting the
    SAME exact integers to float64 first. Conversations with fewer
    than 2 deltas drop out (slope undefined)."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_deltas", pa.int64()),
            ("slope_us_per_turn", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        has = st["has_delta"]
        d_codes = st["codes"][has]
        y = st["delta"][has]
        if not len(d_codes):
            return out_schema.empty_table()
        starts = np.flatnonzero(np.r_[True, d_codes[1:] != d_codes[:-1]])
        lens = np.diff(np.r_[starts, len(d_codes)])
        x = (np.arange(len(d_codes)) - np.repeat(starts, lens) + 1).astype(
            np.int64
        )
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        sxy = np.add.reduceat(x * y, starts)
        sxx = np.add.reduceat(x * x, starts)
        m = lens.astype(np.int64)
        keep = m >= 2
        if not keep.any():
            return out_schema.empty_table()
        mf = m[keep].astype(np.float64)
        sxf = sx[keep].astype(np.float64)
        syf = sy[keep].astype(np.float64)
        sxyf = sxy[keep].astype(np.float64)
        sxxf = sxx[keep].astype(np.float64)
        slope = (mf * sxyf - sxf * syf) / (mf * sxxf - sxf * sxf)
        return pa.table(
            {
                "conv_id": pa.array(
                    st["uniq"][d_codes[starts]][keep], pa.string()
                ),
                "n_deltas": pa.array(m[keep]),
                "slope_us_per_turn": pa.array(slope),
            }
        )

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["conv_latency_trend"] = q_conv_latency_trend
ORACLE_SQL["conv_latency_trend"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, turn_idx,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS delta_us
  FROM turns),
nn AS (
  SELECT conv_id,
    CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
         AS BIGINT) AS x,
    delta_us AS y
  FROM d WHERE delta_us IS NOT NULL),
s AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS m,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM nn GROUP BY conv_id)
SELECT conv_id, m AS n_deltas,
  (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_us_per_turn
FROM s WHERE m >= 2
""".strip()


def q_latency_autocorr(sf_dir: str):
    """Per-conversation lag-1 autocorrelation of inter-turn latency
    (bursty vs evenly-paced conversations). Adjacent-delta pairs
    (a_i, a_i+1) within each conversation, with deltas floor-divided
    to whole SECONDS on both engines first — µs deltas can span months
    (1e13 µs) and their squared sums overflow int64 (DuckDB raises,
    numpy would silently wrap); at seconds a 30-year delta squares to
    1e15, leaving int64 headroom for ~9000-pair groups. Exact int64
    sums of a, b, a·b, a², b² per group, then one Pearson closed form
    with sqrt —
    sqrt is correctly rounded IEEE on both engines so identical inputs
    give identical bits. Zero-variance groups (constant latency) have
    denominator 0 → NULL on both sides via NULLIF / mask."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_pairs", pa.int64()),
            ("latency_autocorr", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        codes, delta, has = st["codes"], st["delta"], st["has_delta"]
        n = len(codes)
        # a pair lives at row i when row i has a delta AND row i+1 is
        # the next turn of the same conversation (its delta then exists
        # by construction).
        pair = has.copy()
        pair[-1:] = False
        if n > 1:
            pair[:-1] &= codes[1:] == codes[:-1]
        idx = np.flatnonzero(pair)
        if not len(idx):
            return out_schema.empty_table()
        p_codes = codes[idx]
        a = delta[idx] // 1000000
        b = delta[idx + 1] // 1000000
        starts = np.flatnonzero(np.r_[True, p_codes[1:] != p_codes[:-1]])
        lens = np.diff(np.r_[starts, len(p_codes)])
        sa = np.add.reduceat(a, starts)
        sb = np.add.reduceat(b, starts)
        sab = np.add.reduceat(a * b, starts)
        saa = np.add.reduceat(a * a, starts)
        sbb = np.add.reduceat(b * b, starts)
        m = lens.astype(np.int64)
        keep = m >= 2
        if not keep.any():
            return out_schema.empty_table()
        mf = m[keep].astype(np.float64)
        saf = sa[keep].astype(np.float64)
        sbf = sb[keep].astype(np.float64)
        sabf = sab[keep].astype(np.float64)
        saaf = saa[keep].astype(np.float64)
        sbbf = sbb[keep].astype(np.float64)
        va = np.maximum(mf * saaf - saf * saf, 0.0)
        vb = np.maximum(mf * sbbf - sbf * sbf, 0.0)
        den = np.sqrt(va * vb)
        ok = den != 0.0
        r = (mf * sabf - saf * sbf) / np.where(ok, den, 1.0)
        return pa.table(
            {
                "conv_id": pa.array(
                    st["uniq"][p_codes[starts]][keep], pa.string()
                ),
                "n_pairs": pa.array(m[keep]),
                "latency_autocorr": pa.array(r, mask=~ok),
            }
        )

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["latency_autocorr"] = q_latency_autocorr
ORACLE_SQL["latency_autocorr"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, turn_idx,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS delta_us
  FROM turns),
nn AS (
  SELECT conv_id, turn_idx, delta_us // 1000000 AS a,
    lead(delta_us // 1000000) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS b
  FROM d WHERE delta_us IS NOT NULL),
s AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS p,
    CAST(sum(a) AS BIGINT) AS sa, CAST(sum(b) AS BIGINT) AS sb,
    CAST(sum(a * b) AS BIGINT) AS sab,
    CAST(sum(a * a) AS BIGINT) AS saa,
    CAST(sum(b * b) AS BIGINT) AS sbb
  FROM nn WHERE b IS NOT NULL GROUP BY conv_id)
SELECT conv_id, p AS n_pairs,
  (CAST(p AS DOUBLE) * CAST(sab AS DOUBLE)
     - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
  / NULLIF(sqrt(
      GREATEST(CAST(p AS DOUBLE) * CAST(saa AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE), 0)
      * GREATEST(CAST(p AS DOUBLE) * CAST(sbb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE), 0)), 0)
    AS latency_autocorr
FROM s WHERE p >= 2
""".strip()


def q_latency_changepoint(sf_dir: str):
    """Per-conversation CUSUM change-point over inter-turn latency:
    the turn position where the cumulative deviation from the
    conversation mean peaks (Page's classic structural-break statistic
    — did this conversation's pacing shift?). Integer-exact by
    construction: with m deltas and Σy, the scaled deviation
    m·y_i − Σy is an INTEGER, so the running CUSUM and its argmax are
    exact int64 on both engines (deltas floor-divided to seconds first
    for headroom); the only float is the single final division
    |CUSUM*|/m. Tie-break: earliest peak. The last position (CUSUM
    identically 0) is excluded; conversations with fewer than 2 deltas
    drop out."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("cp_turn", pa.int64()),
            ("cp_scaled_abs", pa.int64()),
            ("cp_stat_s", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        has = st["has_delta"]
        d_codes = st["codes"][has]
        y = st["delta"][has] // 1000000
        if not len(d_codes):
            return out_schema.empty_table()
        starts = np.flatnonzero(np.r_[True, d_codes[1:] != d_codes[:-1]])
        lens = np.diff(np.r_[starts, len(d_codes)])
        seg = np.repeat(np.arange(len(starts)), lens)
        m = lens.astype(np.int64)
        sy = np.add.reduceat(y, starts)
        dev = m[seg] * y - sy[seg]
        cs = np.cumsum(dev)
        base = np.zeros(len(starts), np.int64)
        base[1:] = cs[starts[1:] - 1]
        cusum = cs - base[seg]
        a = np.abs(cusum)
        # exclude each group's final position (CUSUM there is 0 by
        # construction) and pick the earliest max among the rest
        last = np.zeros(len(a), bool)
        last[starts + lens - 1] = True
        a_m = np.where(last, np.int64(-1), a)
        gmax = np.maximum.reduceat(a_m, starts)
        keep = m >= 2
        idx = np.arange(len(a), dtype=np.int64)
        cand = np.where(a_m == gmax[seg], idx, np.int64(2**62))
        first = np.minimum.reduceat(cand, starts)
        k = first - starts + 1  # 1-based position within the group
        mf = m[keep].astype(np.float64)
        maxabs = gmax[keep]
        stat = maxabs.astype(np.float64) / mf
        return pa.table(
            {
                "conv_id": pa.array(
                    st["uniq"][d_codes[starts]][keep], pa.string()
                ),
                "cp_turn": pa.array(k[keep]),
                "cp_scaled_abs": pa.array(maxabs),
                "cp_stat_s": pa.array(stat),
            }
        )

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["latency_changepoint"] = q_latency_changepoint
ORACLE_SQL["latency_changepoint"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, turn_idx,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS delta_us
  FROM turns),
yy AS (
  SELECT conv_id,
    CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
         AS BIGINT) AS k,
    delta_us // 1000000 AS y
  FROM d WHERE delta_us IS NOT NULL),
g AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(y) AS BIGINT) AS sy
  FROM yy GROUP BY conv_id),
c AS (
  SELECT yy.conv_id, yy.k, g.m,
    CAST(sum(g.m * yy.y - g.sy) OVER (
      PARTITION BY yy.conv_id ORDER BY yy.k) AS BIGINT) AS cusum
  FROM yy JOIN g USING (conv_id)
  WHERE g.m >= 2),
r AS (
  SELECT conv_id, k, m, abs(cusum) AS acs,
    row_number() OVER (PARTITION BY conv_id
                       ORDER BY abs(cusum) DESC, k) AS rn
  FROM c WHERE k <= m - 1)
SELECT conv_id, k AS cp_turn, acs AS cp_scaled_abs,
  CAST(acs AS DOUBLE) / CAST(m AS DOUBLE) AS cp_stat_s
FROM r WHERE rn = 1
""".strip()


ROLE_VALUES = ("click", "error", "purchase", "view")


def q_role_onehot(sf_dir: str):
    """Stateless one-hot encoding of the turn role — the categorical
    encoder every feature matrix needs, as a pure streaming map (zero
    shuffle; event-keyed so no rank assignment is required). Columns
    is_<role> are BIGINT 0/1 on both engines."""
    import pyarrow as pa
    import pyarrow.compute as pc

    turns = events_to_turns(_events(sf_dir))

    def _onehot(tbl: pa.Table) -> pa.Table:
        role = tbl.column("role")
        cols = {
            "conv_id": tbl.column("conv_id"),
            "order_key": tbl.column("order_key").cast(pa.int64()),
            "role": role,
        }
        for rv in ROLE_VALUES:
            cols[f"is_{rv}"] = pc.cast(
                pc.equal(role, rv), pa.int64()
            )
        return pa.table(cols)

    return turns.map_batches(_onehot, batch_format="pyarrow")


QUERIES["role_onehot"] = q_role_onehot
ORACLE_SQL["role_onehot"] = (
    f"WITH {SQL_TURNS_CTE} SELECT conv_id, CAST(event_id AS BIGINT) AS"
    " order_key, role, "
    + ", ".join(
        f"CAST(role = '{rv}' AS BIGINT) AS is_{rv}" for rv in ROLE_VALUES
    )
    + " FROM turns"
)


_WDT_W = 8  # sliding window length (turns, current inclusive)


def q_w_distinct_tools(sf_dir: str):
    """Sliding-window DISTINCT count: how many distinct non-null tools
    did this conversation use over its last 8 turns? Windowed distinct
    has no ROWS-frame aggregate in either engine, so both sides expand
    the window into 8 lag columns and count first occurrences with
    null-safe pairwise comparisons (28 vectorized compares per batch —
    O(W²/2·n), fine for feature-sized W). One conv_id exchange for the
    in-conversation lags."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    turns = events_to_turns(_events(sf_dir))

    def _project(tbl):
        return tbl.select(["conv_id", "ts", "order_key", "tool"])

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("w_distinct_tools", pa.int64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        okey = tbl.column("order_key").cast(pa.int64()).to_numpy()
        order = np.lexsort((okey, ts, codes))
        codes, ts = codes[order], ts[order]
        tool = tbl.column("tool").to_numpy(zero_copy_only=False)[order]
        n = len(codes)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, n])
        tix = (np.arange(n) - np.repeat(starts, lens)).astype(np.int32)
        # integer-encode tools; -1 = null
        import pandas as pd

        isnull = pd.isna(tool)
        tvals = np.where(isnull, "", tool).astype(object)
        _, tcodes = np.unique(tvals.astype(str), return_inverse=True)
        tcodes = np.where(isnull, -1, tcodes).astype(np.int64)
        lagged = np.full((_WDT_W, n), -1, np.int64)
        for j in range(_WDT_W):
            valid = tix >= j
            idx = np.flatnonzero(valid)
            lagged[j, idx] = tcodes[idx - j]
        cnt = np.zeros(n, np.int64)
        for j in range(_WDT_W):
            new = lagged[j] >= 0
            for i in range(j):
                new &= lagged[j] != lagged[i]
            cnt += new
        return pa.table(
            {
                "conv_id": pa.array(uniq[codes], pa.string()),
                "turn_idx": pa.array(tix, pa.int32()),
                "w_distinct_tools": pa.array(cnt),
            }
        )

    return hash_exchange(
        turns.map_batches(_project, batch_format="pyarrow", batch_size=None),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


def _wdt_sql() -> str:
    lags = ",\n    ".join(
        f"lag(tool, {j}) OVER w AS t{j}" for j in range(_WDT_W)
    )
    terms = []
    for j in range(_WDT_W):
        conds = [f"t{j} IS NOT NULL"] + [
            f"t{j} IS DISTINCT FROM t{i}" for i in range(j)
        ]
        terms.append(
            "CASE WHEN " + " AND ".join(conds) + " THEN 1 ELSE 0 END"
        )
    expr = "\n      + ".join(terms)
    return f"""
WITH {SQL_TURNS_CTE},
lagd AS (
  SELECT conv_id, turn_idx,
    {lags}
  FROM turns
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT conv_id, turn_idx,
  CAST({expr} AS BIGINT) AS w_distinct_tools
FROM lagd
""".strip()


QUERIES["w_distinct_tools"] = q_w_distinct_tools
ORACLE_SQL["w_distinct_tools"] = _wdt_sql()


# (lower_bound_us_inclusive, name) — upper bound is the next entry
_LAT_BUCKETS = (
    (0, "lt_1m"),
    (60_000_000, "lt_1h"),
    (3_600_000_000, "lt_1d"),
    (86_400_000_000, "lt_7d"),
    (604_800_000_000, "ge_7d"),
)


def q_latency_bucket_profile(sf_dir: str):
    """Per-conversation bucketized latency profile (counts of
    inter-turn deltas in <1m / <1h / <1d / <7d / ≥7d) — the binned
    encoder form of the latency distribution, exact integer counts.
    One conv_id exchange, reduceat per bucket mask."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    names = [nm for _, nm in _LAT_BUCKETS]
    out_schema = pa.schema(
        [("conv_id", pa.string())]
        + [(f"n_{nm}", pa.int64()) for nm in names]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        has = st["has_delta"]
        d_codes = st["codes"][has]
        y = st["delta"][has]
        if not len(d_codes):
            return out_schema.empty_table()
        starts = np.flatnonzero(np.r_[True, d_codes[1:] != d_codes[:-1]])
        bounds = [lo for lo, _ in _LAT_BUCKETS] + [None]
        cols = {
            "conv_id": pa.array(
                st["uniq"][d_codes[starts]], pa.string()
            )
        }
        for bi, (lo, nm) in enumerate(_LAT_BUCKETS):
            hi = bounds[bi + 1]
            mask = y >= lo if hi is None else (y >= lo) & (y < hi)
            cols[f"n_{nm}"] = pa.array(
                np.add.reduceat(mask.astype(np.int64), starts)
            )
        return pa.table(cols)

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


def _latency_bucket_sql() -> str:
    bounds = [lo for lo, _ in _LAT_BUCKETS] + [None]
    terms = []
    for bi, (lo, nm) in enumerate(_LAT_BUCKETS):
        hi = bounds[bi + 1]
        cond = f"delta_us >= {lo}" + (
            "" if hi is None else f" AND delta_us < {hi}"
        )
        terms.append(
            f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{nm}"
        )
    sel = ",\n  ".join(terms)
    return f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS delta_us
  FROM turns)
SELECT conv_id,
  {sel}
FROM d WHERE delta_us IS NOT NULL
GROUP BY conv_id
""".strip()


QUERIES["latency_bucket_profile"] = q_latency_bucket_profile
ORACLE_SQL["latency_bucket_profile"] = _latency_bucket_sql()


def q_w_median_latency(sf_dir: str):
    """Sliding-window MEDIAN of inter-turn latency (last 8 turns,
    current inclusive) — the robust windowed aggregate (a single
    straggler delta can't drag it the way w_latency_mean_s moves).
    Pure int64: discrete median = sorted[ceil(k/2)−1] over the ≤8
    non-null window deltas, exactly DuckDB's windowed quantile_disc.
    Both engines expand the frame into 8 lags; the kernel sorts an
    (n×8) sentinel-padded matrix in one vectorized pass."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("w_median_latency_us", pa.int64()),
        ]
    )
    W = _WDT_W  # 8, shared with w_distinct_tools

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        codes, tix, delta = st["codes"], st["tix"], st["delta"]
        n = len(codes)
        SENT = np.int64(2**62)
        lagged = np.full((n, W), SENT, np.int64)
        for j in range(W):
            # lag-j delta exists when the lagged row is in the same
            # conversation and is not its first turn (tix - j >= 1)
            idx = np.flatnonzero(tix >= j + 1)
            lagged[idx, j] = delta[idx - j]
        k = (tix.astype(np.int64) + 0)  # non-null count = min(tix, W)
        k = np.minimum(k, W)
        lagged.sort(axis=1)
        has = k > 0
        pick = np.where(has, (k + 1) // 2 - 1, 0)
        med = lagged[np.arange(n), pick]
        return pa.table(
            {
                "conv_id": pa.array(st["uniq"][codes], pa.string()),
                "turn_idx": pa.array(tix, pa.int32()),
                "w_median_latency_us": pa.array(med, mask=~has),
            }
        )

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["w_median_latency"] = q_w_median_latency
ORACLE_SQL["w_median_latency"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, turn_idx,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS delta_us
  FROM turns)
SELECT conv_id, turn_idx,
  quantile_disc(delta_us, 0.5) OVER (
    PARTITION BY conv_id ORDER BY turn_idx
    ROWS BETWEEN {_WDT_W - 1} PRECEDING AND CURRENT ROW)
    AS w_median_latency_us
FROM d
""".strip()


def q_latency_robust_features(sf_dir: str):
    """Per-turn ROBUST encodings of inter-turn latency against the
    conversation's own distribution: RobustScaler value
    (x − median)/IQR and the Hampel outlier flag |x − median| > 3·MAD.
    Median, quartiles and MAD (median absolute deviation) are discrete
    quantiles of int64 µs — exact on both engines — so the flag is a
    pure INTEGER comparison and the scaled value is one final IEEE
    division; zero-IQR conversations scale to NULL (NULLIF both
    sides). One conv_id exchange, two in-kernel sorts (values, then
    absolute deviations)."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("robust_scaled", pa.float64()),
            ("is_outlier", pa.bool_()),
        ]
    )

    def _q_disc(vals, starts, lens, q):
        """quantile_disc per contiguous group: sorted[ceil(q·k)−1]."""
        k = np.ceil(q * lens).astype(np.int64) - 1
        return vals[starts + k]

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        codes, tix, delta, has = (
            st["codes"], st["tix"], st["delta"], st["has_delta"],
        )
        d_codes = codes[has]
        y = delta[has]
        if not len(d_codes):
            return out_schema.empty_table()
        o = np.lexsort((y, d_codes))
        sc, sv = d_codes[o], y[o]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        lens = np.diff(np.r_[starts, len(sc)])
        p25 = _q_disc(sv, starts, lens, 0.25)
        p50 = _q_disc(sv, starts, lens, 0.5)
        p75 = _q_disc(sv, starts, lens, 0.75)
        gid_sorted = sc[starts]
        # map group stats back to delta rows: groups appear in d_codes
        # order = gid_sorted order (both ascend in codes)
        ginv = np.searchsorted(gid_sorted, d_codes)
        adev = np.abs(y - p50[ginv])
        o2 = np.lexsort((adev, d_codes))
        sa = adev[o2]
        mad = _q_disc(sa, starts, lens, 0.5)
        iqr = p75 - p25
        row_iqr = iqr[ginv]
        row_med = p50[ginv]
        row_mad = mad[ginv]
        okd = row_iqr != 0
        scaled = (y - row_med).astype(np.float64) / np.where(
            okd, row_iqr, 1
        ).astype(np.float64)
        outl = adev > 3 * row_mad
        # emit one row per turn WITH a delta (first turns drop, as in
        # the SQL's WHERE delta_us IS NOT NULL)
        return pa.table(
            {
                "conv_id": pa.array(st["uniq"][d_codes], pa.string()),
                "turn_idx": pa.array(tix[has], pa.int32()),
                "robust_scaled": pa.array(scaled, mask=~okd),
                "is_outlier": pa.array(outl),
            }
        )

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["latency_robust_features"] = q_latency_robust_features
ORACLE_SQL["latency_robust_features"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, turn_idx,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS delta_us
  FROM turns),
dd AS (SELECT conv_id, turn_idx, delta_us FROM d
       WHERE delta_us IS NOT NULL),
g AS (
  SELECT conv_id,
    quantile_disc(delta_us, 0.25) AS p25,
    quantile_disc(delta_us, 0.5) AS p50,
    quantile_disc(delta_us, 0.75) AS p75
  FROM dd GROUP BY conv_id),
m AS (
  SELECT dd.conv_id,
    quantile_disc(abs(dd.delta_us - g.p50), 0.5) AS mad
  FROM dd JOIN g USING (conv_id) GROUP BY dd.conv_id)
SELECT dd.conv_id, dd.turn_idx,
  CAST(dd.delta_us - g.p50 AS DOUBLE)
    / NULLIF(CAST(g.p75 - g.p25 AS DOUBLE), 0) AS robust_scaled,
  abs(dd.delta_us - g.p50) > 3 * m.mad AS is_outlier
FROM dd JOIN g USING (conv_id) JOIN m USING (conv_id)
""".strip()


def q_role_dwell_time(sf_dir: str):
    """State-dwell accounting: wall-clock each conversation spends "in"
    each role — the forward gap to the next turn attributed to the turn
    that opened it (telemetry's time-in-state rollup; the last turn of
    a conversation has no forward gap and contributes nothing). Exact
    int64 µs sums per (conv_id, role); one conv_id exchange, forward
    deltas from the shared sorted prologue, per-(conv, role) reduceat."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    turns = events_to_turns(_events(sf_dir))

    def _project(tbl):
        return tbl.select(["conv_id", "ts", "order_key", "role"])

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("role", pa.string()),
            ("dwell_us", pa.int64()),
            ("n_dwells", pa.int64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        okey = tbl.column("order_key").cast(pa.int64()).to_numpy()
        order = np.lexsort((okey, ts, codes))
        codes, ts = codes[order], ts[order]
        role = tbl.column("role").to_numpy(zero_copy_only=False)[order]
        n = len(codes)
        # forward gap: next row's ts minus mine, valid when the next
        # row is the same conversation
        has_fwd = np.zeros(n, bool)
        fwd = np.zeros(n, np.int64)
        if n > 1:
            has_fwd[:-1] = codes[1:] == codes[:-1]
            fwd[:-1] = ts[1:] - ts[:-1]
        sel = np.flatnonzero(has_fwd)
        if not len(sel):
            return out_schema.empty_table()
        g_codes, g_fwd = codes[sel], fwd[sel]
        g_role = role[sel]
        _, rcodes = np.unique(g_role.astype(str), return_inverse=True)
        o2 = np.lexsort((rcodes, g_codes))
        g_codes, g_fwd = g_codes[o2], g_fwd[o2]
        g_role, rcodes = g_role[o2], rcodes[o2]
        newg = np.r_[
            True,
            (g_codes[1:] != g_codes[:-1]) | (rcodes[1:] != rcodes[:-1]),
        ]
        starts = np.flatnonzero(newg)
        lens = np.diff(np.r_[starts, len(g_codes)])
        return pa.table(
            {
                "conv_id": pa.array(uniq[g_codes[starts]], pa.string()),
                "role": pa.array(g_role[starts], pa.string()),
                "dwell_us": pa.array(np.add.reduceat(g_fwd, starts)),
                "n_dwells": pa.array(lens.astype(np.int64)),
            }
        )

    return hash_exchange(
        turns.map_batches(_project, batch_format="pyarrow", batch_size=None),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["role_dwell_time"] = q_role_dwell_time
ORACLE_SQL["role_dwell_time"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, role,
    lead(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) - epoch_us(ts) AS fwd_us
  FROM turns)
SELECT conv_id, role,
  CAST(sum(fwd_us) AS BIGINT) AS dwell_us,
  CAST(count(fwd_us) AS BIGINT) AS n_dwells
FROM d WHERE fwd_us IS NOT NULL
GROUP BY conv_id, role
""".strip()


def q_role_transition_latency(sf_dir: str):
    """Corpus-wide response-time matrix: for every (prev_role → role)
    transition, how many occurrences and the mean inter-turn latency —
    the transition-conditioned timing profile (assistant-after-user
    vs user-after-assistant asymmetry in a real transcript corpus).
    One conv_id exchange computes per-partition exact (pair, n, Σµs)
    partials — bounded by |roles|² rows each — then a tiny pair-keyed
    merge; the mean is the single final IEEE division."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange
    from ..stages.groupagg import hash_grouped_aggregate

    turns = events_to_turns(_events(sf_dir))

    def _project(tbl):
        return tbl.select(["conv_id", "ts", "order_key", "role"])

    part_schema = pa.schema(
        [
            ("prev_role", pa.string()),
            ("role", pa.string()),
            ("n_transitions", pa.int64()),
            ("sum_us", pa.int64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return part_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        _, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        okey = tbl.column("order_key").cast(pa.int64()).to_numpy()
        order = np.lexsort((okey, ts, codes))
        codes, ts = codes[order], ts[order]
        role = tbl.column("role").to_numpy(zero_copy_only=False)[order]
        n = len(codes)
        if n < 2:
            return part_schema.empty_table()
        same = codes[1:] == codes[:-1]
        idx = np.flatnonzero(same) + 1
        if not len(idx):
            return part_schema.empty_table()
        delta = ts[idx] - ts[idx - 1]
        rstr = role.astype(str)
        _, pcodes = np.unique(rstr[idx - 1], return_inverse=True)
        ruid, rcodes = np.unique(rstr[idx], return_inverse=True)
        puid = np.unique(rstr[idx - 1])
        pair = pcodes.astype(np.int64) * len(ruid) + rcodes
        o2 = np.argsort(pair, kind="stable")
        pair, delta = pair[o2], delta[o2]
        starts = np.flatnonzero(np.r_[True, pair[1:] != pair[:-1]])
        lens = np.diff(np.r_[starts, len(pair)])
        pk = pair[starts]
        return pa.table(
            {
                "prev_role": pa.array(
                    puid[pk // len(ruid)], pa.string()
                ),
                "role": pa.array(ruid[pk % len(ruid)], pa.string()),
                "n_transitions": pa.array(lens.astype(np.int64)),
                "sum_us": pa.array(np.add.reduceat(delta, starts)),
            }
        )

    partials = hash_exchange(
        turns.map_batches(_project, batch_format="pyarrow", batch_size=None),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=part_schema,
    )
    merged = hash_grouped_aggregate(
        partials,
        ["prev_role", "role"],
        [("n_transitions", "sum"), ("sum_us", "sum")],
        num_buckets=2,
    )

    def _final(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_transitions").to_numpy()
        s = tbl.column("sum_us").to_numpy()
        mean = s.astype(np.float64) / n.astype(np.float64) / 1000000.0
        return pa.table(
            {
                "prev_role": tbl.column("prev_role"),
                "role": tbl.column("role"),
                "n_transitions": pa.array(n.astype(np.int64)),
                "mean_latency_s": pa.array(mean),
            }
        )

    return merged.map_batches(_final, batch_format="pyarrow",
                              batch_size=None)


QUERIES["role_transition_latency"] = q_role_transition_latency
ORACLE_SQL["role_transition_latency"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, role,
    lag(role) OVER w AS prev_role,
    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us
  FROM turns
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT prev_role, role,
  CAST(count(*) AS BIGINT) AS n_transitions,
  CAST(CAST(sum(delta_us) AS BIGINT) AS DOUBLE)
    / CAST(CAST(count(*) AS BIGINT) AS DOUBLE) / 1000000
    AS mean_latency_s
FROM d WHERE prev_role IS NOT NULL
GROUP BY prev_role, role
""".strip()


def q_snaps_since_prev_turn(sf_dir: str):
    """Interval-COUNT join: for every turn, how many snapshots landed
    in (prev_turn.ts, turn.ts] — the join-density feature telling a
    backfill pipeline which turns absorbed multiple snapshot updates
    (as-of keeps only the latest; this counts what it skipped). One
    conv_id exchange over the aligned turns ∪ snaps union, then a
    single sorted merge per partition: sort (conv, ts, snaps-first-at-
    ties, order_key), running snapshot count, per-turn difference vs
    the previous turn — the "≤ ts" inclusive / "> prev_ts" exclusive
    boundary rule falls out of the tie ordering, bit-identically to
    the oracle's correlated range join."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    aligned = _asof_aligned_union(sf_dir)

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("n_snaps_since_prev", pa.int64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        is_snap = tbl.column("is_snap").to_numpy(zero_copy_only=False)
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        okey = tbl.column("order_key").to_numpy(zero_copy_only=False)
        okey = np.where(np.isnan(okey.astype(np.float64)), 0, okey).astype(
            np.int64
        ) if okey.dtype != np.int64 else okey
        is_turn = (is_snap == 0).astype(np.int8)
        # snaps sort BEFORE turns at an equal timestamp => a snapshot
        # at exactly turn.ts is counted (inclusive right boundary)
        order = np.lexsort((okey, is_turn, ts, codes))
        codes, is_turn = codes[order], is_turn[order]
        n = len(codes)
        cumsnap = np.cumsum(1 - is_turn)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, n])
        seg = np.repeat(np.arange(len(starts)), lens)
        base = np.zeros(len(starts), np.int64)
        base[1:] = cumsnap[starts[1:] - 1]
        t_rows = np.flatnonzero(is_turn == 1)
        if not len(t_rows):
            return out_schema.empty_table()
        t_codes = codes[t_rows]
        snaps_le = cumsnap[t_rows] - base[seg[t_rows]]
        t_starts = np.flatnonzero(
            np.r_[True, t_codes[1:] != t_codes[:-1]]
        )
        t_lens = np.diff(np.r_[t_starts, len(t_codes)])
        tix = (
            np.arange(len(t_codes)) - np.repeat(t_starts, t_lens)
        ).astype(np.int32)
        prev = np.empty(len(t_codes), np.int64)
        prev[0] = 0
        prev[1:] = snaps_le[:-1]
        prev[t_starts] = 0  # first turn counts every snap up to it
        return pa.table(
            {
                "conv_id": pa.array(uniq[t_codes], pa.string()),
                "turn_idx": pa.array(tix, pa.int32()),
                "n_snaps_since_prev": pa.array(snaps_le - prev),
            }
        )

    return hash_exchange(
        aligned, "conv_id", PCFG.num_buckets, _kernel,
        empty_schema=out_schema,
    )


QUERIES["snaps_since_prev_turn"] = q_snaps_since_prev_turn
ORACLE_SQL["snaps_since_prev_turn"] = f"""
WITH {SQL_TURNS_CTE},
{SQL_SNAPS_CTE},
tt AS (
  SELECT conv_id, turn_idx, ts,
    lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ts
  FROM turns)
SELECT tt.conv_id, tt.turn_idx,
  CAST(count(s.ts) AS BIGINT) AS n_snaps_since_prev
FROM tt LEFT JOIN snaps s
  ON s.conv_id = tt.conv_id AND s.ts <= tt.ts
     AND (tt.prev_ts IS NULL OR s.ts > tt.prev_ts)
GROUP BY tt.conv_id, tt.turn_idx
""".strip()


def q_w_latency_slope(sf_dir: str):
    """ROLLING OLS slope of inter-turn latency over the trailing
    8-turn frame — the windowed form of conv_latency_trend (is the
    conversation accelerating RIGHT NOW?). For each turn the frame's
    deltas pair with positions x = 1..k (oldest first, k = non-null
    deltas in frame); slope = (k·Σxy − Σx·Σy)/(k·Σx² − (Σx)²) with
    every sum an exact int64 built from the same 8 lag columns both
    engines expand (x-sums are closed-form in k; y-sums accumulate in
    identical lag order). Frames with k < 2 are NULL. Deltas
    floor-divided to seconds for the same int64 headroom argument as
    latency_autocorr."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    W = _WDT_W  # 8

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("w_slope_s_per_turn", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        codes, tix = st["codes"], st["tix"]
        delta_s = st["delta"] // 1000000
        n = len(codes)
        k = np.minimum(tix.astype(np.int64), W)
        # lag j = 0..W-1 holds the delta j turns back; within the
        # frame, its position is x = k - j (newest has the largest x)
        sy = np.zeros(n, np.int64)
        sxy = np.zeros(n, np.int64)
        for j in range(W):
            valid = tix >= (j + 1)
            idx = np.flatnonzero(valid)
            dj = np.zeros(n, np.int64)
            dj[idx] = delta_s[idx - j]
            sy = sy + dj
            sxy = sxy + dj * np.maximum(k - j, 0)
        sx = k * (k + 1) // 2
        sxx = k * (k + 1) * (2 * k + 1) // 6
        ok = k >= 2
        kf = k.astype(np.float64)
        den = kf * sxx.astype(np.float64) - sx.astype(np.float64) * sx.astype(
            np.float64
        )
        num = kf * sxy.astype(np.float64) - sx.astype(np.float64) * sy.astype(
            np.float64
        )
        slope = num / np.where(ok, den, 1.0)
        return pa.table(
            {
                "conv_id": pa.array(st["uniq"][codes], pa.string()),
                "turn_idx": pa.array(tix, pa.int32()),
                "w_slope_s_per_turn": pa.array(slope, mask=~ok),
            }
        )

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


def _w_slope_sql() -> str:
    W = _WDT_W
    lags = ",\n    ".join(
        f"lag(delta_us // 1000000, {j}) OVER w AS d{j}" for j in range(W)
    )
    k_expr = " + ".join(
        f"(CASE WHEN d{j} IS NOT NULL THEN 1 ELSE 0 END)" for j in range(W)
    )
    sy = " + ".join(f"COALESCE(d{j}, 0)" for j in range(W))
    sxy = " + ".join(
        f"COALESCE(d{j}, 0) * GREATEST(k - {j}, 0)" for j in range(W)
    )
    return f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, turn_idx,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS delta_us
  FROM turns),
lagd AS (
  SELECT conv_id, turn_idx,
    {lags}
  FROM d
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
kk AS (
  SELECT conv_id, turn_idx,
    CAST({k_expr} AS BIGINT) AS k,
    CAST({sy} AS BIGINT) AS sy,
    d0, d1, d2, d3, d4, d5, d6, d7
  FROM lagd),
ss AS (
  SELECT conv_id, turn_idx, k, sy,
    CAST({sxy} AS BIGINT) AS sxy,
    k * (k + 1) // 2 AS sx,
    k * (k + 1) * (2 * k + 1) // 6 AS sxx
  FROM kk)
SELECT conv_id, turn_idx,
  CASE WHEN k >= 2 THEN
    (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
  END AS w_slope_s_per_turn
FROM ss
""".strip()


QUERIES["w_latency_slope"] = q_w_latency_slope
ORACLE_SQL["w_latency_slope"] = _w_slope_sql()


def q_conv_duration_percentile(sf_dir: str):
    """Two-level cross-entity feature: each conversation's wall-clock
    duration (last ts − first ts, floor seconds) ranked against EVERY
    conversation's — cume_dist on a derived per-entity aggregate (the
    "how unusual is this conversation" normalizer). Level 1 is one
    conv_id exchange emitting (conv, dur_s); level 2 is the bounded
    duration histogram (mergeable (dur_s, count) partials, driver
    state O(distinct durations) — the price_cume_dist pattern,
    relational_queries._lineitem_cent_hist) broadcast into a streaming
    searchsorted score map. cume = count(dur ≤ mine)/total, one exact
    integer division per row."""
    import numpy as np
    import pyarrow as pa
    import ray as _ray

    from ..stages.exchange import hash_exchange
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    dur_schema = pa.schema(
        [("conv_id", pa.string()), ("dur_s", pa.int64())]
    )

    def _durs(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return dur_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        lo = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        hi = np.full(len(uniq), np.iinfo(np.int64).min, np.int64)
        np.minimum.at(lo, codes, ts)
        np.maximum.at(hi, codes, ts)
        return pa.table(
            {
                "conv_id": pa.array(uniq, pa.string()),
                "dur_s": pa.array((hi - lo) // 1000000),
            }
        )

    durs = hash_exchange(
        _latency_turns(sf_dir).map_batches(
            lambda t: t.select(["conv_id", "ts"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        "conv_id",
        PCFG.num_buckets,
        _durs,
        empty_schema=dur_schema,
    ).materialize()  # one row per conversation; reused for hist + score

    def _hist_partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "dur_s": tbl.column("dur_s"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["dur_s"], [("n", "sum")])

    hist_ds = hash_grouped_aggregate(
        durs.map_batches(
            _hist_partial, batch_format="pyarrow", batch_size=None
        ),
        ["dur_s"],
        [("n", "sum")],
        num_buckets=4,
    )
    parts = [_ray.get(r) for r in hist_ds.to_arrow_refs()]
    hist = pa.concat_tables([t for t in parts if t.num_rows])
    vals = hist.column("dur_s").to_numpy()
    cnt = hist.column("n").cast(pa.int64()).to_numpy()
    o = np.argsort(vals)
    vals, cnt = vals[o], cnt[o]
    cum = np.cumsum(cnt)
    total = int(cum[-1]) if len(cum) else 0
    vals_ref, cum_ref = _ray.put(vals), _ray.put(cum)

    def _score(tbl: pa.Table) -> pa.Table:
        v = _ray.get(vals_ref)
        c = _ray.get(cum_ref)
        x = tbl.column("dur_s").to_numpy()
        pos = np.searchsorted(v, x, side="right") - 1
        le = c[pos]  # every x exists in the histogram by construction
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "dur_s": tbl.column("dur_s"),
                "dur_cume": pa.array(
                    le.astype(np.float64) / np.float64(total)
                ),
            }
        )

    return durs.map_batches(_score, batch_format="pyarrow",
                            batch_size=None)


QUERIES["conv_duration_percentile"] = q_conv_duration_percentile
ORACLE_SQL["conv_duration_percentile"] = f"""
WITH {SQL_TURNS_CTE},
g AS (
  SELECT conv_id,
    (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS dur_s
  FROM turns GROUP BY conv_id)
SELECT conv_id, dur_s,
  cume_dist() OVER (ORDER BY dur_s) AS dur_cume
FROM g
""".strip()


# (start_hour_inclusive, end_hour_exclusive, name) over UTC hours
_TOD_BUCKETS = (
    (0, 6, "night"),
    (6, 12, "morning"),
    (12, 18, "afternoon"),
    (18, 24, "evening"),
)


def q_conv_time_of_day_profile(sf_dir: str):
    """Per-conversation circadian profile: turn counts by time-of-day
    quadrant (night/morning/afternoon/evening, UTC). Hour is the pure
    integer (epoch_us // 3600e6) % 24 on BOTH engines — no calendar
    functions, so no timezone/DST divergence can enter. One conv_id
    exchange, one reduceat per bucket mask."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    out_schema = pa.schema(
        [("conv_id", pa.string())]
        + [(f"n_{nm}", pa.int64()) for _, _, nm in _TOD_BUCKETS]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        hour = (ts // 3_600_000_000) % 24
        o = np.argsort(codes, kind="stable")
        codes, hour = codes[o], hour[o]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        cols = {"conv_id": pa.array(uniq[codes[starts]], pa.string())}
        for lo, hi, nm in _TOD_BUCKETS:
            mask = ((hour >= lo) & (hour < hi)).astype(np.int64)
            cols[f"n_{nm}"] = pa.array(np.add.reduceat(mask, starts))
        return pa.table(cols)

    return hash_exchange(
        _latency_turns(sf_dir).map_batches(
            lambda t: t.select(["conv_id", "ts"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


def _tod_sql() -> str:
    terms = ",\n  ".join(
        f"CAST(sum(CASE WHEN hh >= {lo} AND hh < {hi} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{nm}"
        for lo, hi, nm in _TOD_BUCKETS
    )
    return f"""
WITH {SQL_TURNS_CTE},
h AS (
  SELECT conv_id, (epoch_us(ts) // 3600000000) % 24 AS hh FROM turns)
SELECT conv_id,
  {terms}
FROM h GROUP BY conv_id
""".strip()


QUERIES["conv_time_of_day_profile"] = q_conv_time_of_day_profile
ORACLE_SQL["conv_time_of_day_profile"] = _tod_sql()


def q_session_length_median(sf_dir: str):
    """Composed feature: gap-based sessionization (the flagship's
    session rule, {gap} µs) then the per-conversation MEDIAN session
    length in turns — a two-level order statistic (sessions are
    derived entities, the median is discrete ⇒ exact int64). One
    conv_id exchange: session boundaries from the sorted deltas,
    session lengths from run arithmetic, per-conversation
    quantile_disc index pick."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_sessions", pa.int64()),
            ("median_session_turns", pa.int64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        codes, tix, delta = st["codes"], st["tix"], st["delta"]
        n = len(codes)
        # a session starts at each conversation's first turn and at
        # every gap > the flagship session threshold
        # conversation firsts (tix==0) are session starts too, so the
        # distance to the next start — or the global end — is exactly
        # the session length even across conversation boundaries
        sess_start = (tix == 0) | (delta > _GAP)
        bounds = np.flatnonzero(sess_start)
        slen = np.diff(np.r_[bounds, n])
        s_codes = codes[bounds]
        o = np.lexsort((slen, s_codes))
        s_codes, slen = s_codes[o], slen[o]
        starts = np.flatnonzero(np.r_[True, s_codes[1:] != s_codes[:-1]])
        lens = np.diff(np.r_[starts, len(s_codes)])
        k = np.ceil(0.5 * lens).astype(np.int64) - 1
        return pa.table(
            {
                "conv_id": pa.array(
                    st["uniq"][s_codes[starts]], pa.string()
                ),
                "n_sessions": pa.array(lens.astype(np.int64)),
                "median_session_turns": pa.array(
                    slen[starts + k].astype(np.int64)
                ),
            }
        )

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["session_length_median"] = q_session_length_median
ORACLE_SQL["session_length_median"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id, turn_idx,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS delta_us
  FROM turns),
sess AS (
  SELECT conv_id, turn_idx,
    CAST(SUM(CASE WHEN delta_us IS NULL OR delta_us > {_GAP}
             THEN 1 ELSE 0 END)
      OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT)
      AS session_id
  FROM d),
sl AS (
  SELECT conv_id, session_id, CAST(count(*) AS BIGINT) AS n_turns
  FROM sess GROUP BY conv_id, session_id)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_sessions,
  quantile_disc(n_turns, 0.5) AS median_session_turns
FROM sl GROUP BY conv_id
""".strip()


def q_tool_concentration(sf_dir: str):
    """Per-conversation tool-usage concentration (Herfindahl index
    over non-null tool counts): HHI = Σcᵢ²/m² — both sums exact int64,
    ONE final IEEE division; 1.0 = a single tool dominates, → 1/k for
    k uniformly-used tools. Conversations with no tool turns drop out
    (no denominator), matching the SQL's implicit group elimination."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    turns = events_to_turns(_events(sf_dir))

    def _project(tbl):
        return tbl.select(["conv_id", "tool"])

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_tool_turns", pa.int64()),
            ("n_distinct_tools", pa.int64()),
            ("tool_hhi", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        import pandas as pd

        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        tool = tbl.column("tool").to_numpy(zero_copy_only=False)
        keep = ~pd.isna(tool)
        if not keep.any():
            return out_schema.empty_table()
        conv, tool = conv[keep], tool[keep]
        uniq, codes = np.unique(conv, return_inverse=True)
        _, tcodes = np.unique(tool.astype(str), return_inverse=True)
        pair = codes.astype(np.int64) * (tcodes.max() + 1) + tcodes
        o = np.argsort(pair, kind="stable")
        pair_s, codes_s = pair[o], codes[o]
        pstarts = np.flatnonzero(np.r_[True, pair_s[1:] != pair_s[:-1]])
        pcount = np.diff(np.r_[pstarts, len(pair_s)]).astype(np.int64)
        pconv = codes_s[pstarts]
        cstarts = np.flatnonzero(np.r_[True, pconv[1:] != pconv[:-1]])
        m = np.add.reduceat(pcount, cstarts)
        ssq = np.add.reduceat(pcount * pcount, cstarts)
        k = np.diff(np.r_[cstarts, len(pconv)]).astype(np.int64)
        hhi = ssq.astype(np.float64) / (
            m.astype(np.float64) * m.astype(np.float64)
        )
        return pa.table(
            {
                "conv_id": pa.array(uniq[pconv[cstarts]], pa.string()),
                "n_tool_turns": pa.array(m),
                "n_distinct_tools": pa.array(k),
                "tool_hhi": pa.array(hhi),
            }
        )

    return hash_exchange(
        turns.map_batches(_project, batch_format="pyarrow", batch_size=None),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["tool_concentration"] = q_tool_concentration
ORACLE_SQL["tool_concentration"] = f"""
WITH {SQL_TURNS_CTE},
tc AS (
  SELECT conv_id, tool, CAST(count(*) AS BIGINT) AS c
  FROM turns WHERE tool IS NOT NULL
  GROUP BY conv_id, tool)
SELECT conv_id,
  CAST(sum(c) AS BIGINT) AS n_tool_turns,
  CAST(count(*) AS BIGINT) AS n_distinct_tools,
  CAST(CAST(sum(c * c) AS BIGINT) AS DOUBLE)
    / (CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)
       * CAST(CAST(sum(c) AS BIGINT) AS DOUBLE)) AS tool_hhi
FROM tc GROUP BY conv_id
""".strip()


def q_inter_session_gaps(sf_dir: str):
    """The complement of within-session latency: per conversation, the
    BREAKS between sessions (deltas over the {gap} µs threshold) —
    how many, and their median length in whole seconds (discrete ⇒
    exact int64). Conversations that never break drop out. Same
    exchange + sorted prologue as the rest of the latency family."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_breaks", pa.int64()),
            ("median_break_s", pa.int64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        st = _sorted_conv_deltas(tbl)
        if st is None:
            return out_schema.empty_table()
        has = st["has_delta"] & (st["delta"] > _GAP)
        d_codes = st["codes"][has]
        if not len(d_codes):
            return out_schema.empty_table()
        y = st["delta"][has] // 1000000
        o = np.lexsort((y, d_codes))
        d_codes, y = d_codes[o], y[o]
        starts = np.flatnonzero(np.r_[True, d_codes[1:] != d_codes[:-1]])
        lens = np.diff(np.r_[starts, len(d_codes)])
        k = np.ceil(0.5 * lens).astype(np.int64) - 1
        return pa.table(
            {
                "conv_id": pa.array(
                    st["uniq"][d_codes[starts]], pa.string()
                ),
                "n_breaks": pa.array(lens.astype(np.int64)),
                "median_break_s": pa.array(y[starts + k]),
            }
        )

    return hash_exchange(
        _latency_turns(sf_dir),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["inter_session_gaps"] = q_inter_session_gaps
ORACLE_SQL["inter_session_gaps"] = f"""
WITH {SQL_TURNS_CTE},
d AS (
  SELECT conv_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY conv_id ORDER BY turn_idx) AS delta_us
  FROM turns)
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_breaks,
  quantile_disc(delta_us // 1000000, 0.5) AS median_break_s
FROM d WHERE delta_us > {_GAP}
GROUP BY conv_id
""".strip()


def q_snapshot_value_trend(sf_dir: str):
    """Snapshot-SIDE temporal feature: per conversation, the OLS slope
    of the snapshot value over time (is the tracked quantity rising?)
    — the right-hand stream gets its own trend, not just lookups from
    the turn side. Exact integers throughout: value → cents
    (floor(v·100 + 0.5)), time → whole seconds REBASED to each
    conversation's first snapshot (keeps Σxy within int64 at epoch
    scale — rebasing is slope-invariant and both engines do it
    identically); slope from the same closed form as
    conv_latency_trend, cents per second. Conversations with fewer
    than 2 snapshots drop out."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    snaps = events_to_snapshots(_events(sf_dir))

    def _project(tbl):
        return tbl.select(["conv_id", "ts", "snap_val"])

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_snaps", pa.int64()),
            ("slope_cents_per_s", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        v = tbl.column("snap_val").to_numpy(zero_copy_only=False)
        y = np.floor(v * 100 + 0.5).astype(np.int64)
        o = np.lexsort((ts, codes))
        codes, ts, y = codes[o], ts[o], y[o]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, len(codes)])
        x = (ts - np.repeat(ts[starts], lens)) // 1000000
        m = lens.astype(np.int64)
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        sxy = np.add.reduceat(x * y, starts)
        sxx = np.add.reduceat(x * x, starts)
        keep = (m >= 2) & (m * sxx - sx * sx != 0)
        if not keep.any():
            return out_schema.empty_table()
        mf = m[keep].astype(np.float64)
        sxf = sx[keep].astype(np.float64)
        syf = sy[keep].astype(np.float64)
        sxyf = sxy[keep].astype(np.float64)
        sxxf = sxx[keep].astype(np.float64)
        slope = (mf * sxyf - sxf * syf) / (mf * sxxf - sxf * sxf)
        return pa.table(
            {
                "conv_id": pa.array(
                    uniq[codes[starts]][keep], pa.string()
                ),
                "n_snaps": pa.array(m[keep]),
                "slope_cents_per_s": pa.array(slope),
            }
        )

    return hash_exchange(
        snaps.map_batches(_project, batch_format="pyarrow", batch_size=None),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["snapshot_value_trend"] = q_snapshot_value_trend
ORACLE_SQL["snapshot_value_trend"] = f"""
WITH {SQL_SNAPS_CTE},
b AS (
  SELECT conv_id,
    (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY conv_id))
      // 1000000 AS x,
    CAST(floor(snap_val * 100 + 0.5) AS BIGINT) AS y
  FROM snaps),
s AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS m,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
  FROM b GROUP BY conv_id)
SELECT conv_id, m AS n_snaps,
  (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_cents_per_s
FROM s WHERE m >= 2 AND m * sxx - sx * sx <> 0
""".strip()


def q_asof_value_delta(sf_dir: str):
    """Composition: as-of join THEN lag — per turn, how much the
    leakage-safe snapshot value moved since the previous turn saw it
    (the feature-drift signal a training row carries about its own
    staleness). Input is the flagship feature set's snap_val_asof;
    one conv_id exchange adds the in-conversation lag; the delta is a
    single IEEE subtraction of identical doubles on both engines
    (NULL whenever either side is)."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    feats = _features(sf_dir).select_columns(
        ["conv_id", "turn_idx", "snap_val_asof"]
    )

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("snap_val_asof", pa.float64()),
            ("val_delta", pa.float64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(conv, return_inverse=True)
        tix = tbl.column("turn_idx").cast(pa.int32()).to_numpy()
        val = tbl.column("snap_val_asof").to_numpy(zero_copy_only=False)
        val = val.astype(np.float64)
        o = np.lexsort((tix, codes))
        codes, tix, val = codes[o], tix[o], val[o]
        n = len(codes)
        prev = np.full(n, np.nan)
        if n > 1:
            same = codes[1:] == codes[:-1]
            prev[1:][same] = val[:-1][same]
        isnan = np.isnan(val) | np.isnan(prev)
        delta = np.where(isnan, 0.0, val - prev)
        return pa.table(
            {
                "conv_id": pa.array(uniq[codes], pa.string()),
                "turn_idx": pa.array(tix, pa.int32()),
                "snap_val_asof": pa.array(
                    val, mask=np.isnan(val)
                ),
                "val_delta": pa.array(delta, mask=isnan),
            }
        )

    return hash_exchange(
        feats, "conv_id", PCFG.num_buckets, _kernel,
        empty_schema=out_schema,
    )


QUERIES["asof_value_delta"] = q_asof_value_delta
ORACLE_SQL["asof_value_delta"] = (
    SQL_PREAMBLE
    + """
 SELECT conv_id, turn_idx, snap_val_asof,
   snap_val_asof - lag(snap_val_asof) OVER (
     PARTITION BY conv_id ORDER BY turn_idx) AS val_delta
 FROM asofj"""
)


# (upper_bound_s_exclusive, name); None = no snapshot matched
_STALE_BUCKETS = ((3600, "lt_1h"), (86400, "lt_1d"),
                  (604800, "lt_7d"), (None, "ge_7d"))


def q_asof_staleness_histogram(sf_dir: str):
    """Data-quality summary OF the as-of join itself: corpus-wide
    histogram of snapshot staleness (snap_age at each turn —
    <1h/<1d/<7d/≥7d/no_snapshot). The monitoring view a feature-store
    operator watches to catch upstream snapshot pipelines falling
    behind. Per-batch bucket-count partials (5 ints per block), tiny
    merge — the age thresholds compare identical doubles on both
    engines so binning cannot diverge."""
    import numpy as np
    import pyarrow as pa

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    feats = _features(sf_dir).select_columns(["snap_age_s"])

    def _partial(tbl: pa.Table) -> pa.Table:
        age = tbl.column("snap_age_s").to_numpy(zero_copy_only=False)
        age = age.astype(np.float64)
        isna = np.isnan(age)
        names, counts = ["no_snapshot"], [int(isna.sum())]
        lo = -np.inf
        for hi, nm in _STALE_BUCKETS:
            if hi is None:
                m = ~isna & (age >= lo)
            else:
                m = ~isna & (age >= lo) & (age < hi)
                lo = hi
            names.append(nm)
            counts.append(int(m.sum()))
        return pa.table(
            {
                "staleness": pa.array(names, pa.string()),
                "n_turns": pa.array(counts, pa.int64()),
            }
        )

    import pyarrow.compute as _pc

    def _nonzero(tbl: pa.Table) -> pa.Table:
        return tbl.filter(_pc.greater(tbl.column("n_turns"), 0))

    return hash_grouped_aggregate(
        feats.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None),
        ["staleness"],
        [("n_turns", "sum")],
        num_buckets=2,
    ).map_batches(_nonzero, batch_format="pyarrow", batch_size=None)


def _stale_sql() -> str:
    cases, lo = [], None
    for hi, nm in _STALE_BUCKETS:
        if hi is None:
            cases.append(f"WHEN snap_age_s >= {lo} THEN 'ge_7d'")
        else:
            lower = "" if lo is None else f"snap_age_s >= {lo} AND "
            cases.append(f"WHEN {lower}snap_age_s < {hi} THEN '{nm}'")
            lo = hi
    case = "CASE WHEN snap_age_s IS NULL THEN 'no_snapshot' " + " ".join(
        cases
    ) + " END"
    return (
        SQL_PREAMBLE
        + f"""
 SELECT {case} AS staleness,
   CAST(count(*) AS BIGINT) AS n_turns
 FROM asofj GROUP BY 1"""
    )


QUERIES["asof_staleness_histogram"] = q_asof_staleness_histogram
ORACLE_SQL["asof_staleness_histogram"] = _stale_sql()


def q_snapshot_max_drawdown(sf_dir: str):
    """Per-conversation MAXIMUM DRAWDOWN of the snapshot value series
    (largest peak-to-trough decline of the tracked quantity — the
    running-max-minus-current reduction every risk/telemetry stack
    computes). Exact integer cents; the in-kernel grouped running max
    is one global np.maximum.accumulate over values lifted by a
    monotone per-segment offset (cents + seg·2⁴⁰ — segments can never
    bleed into each other, no Python per-group loop). Timestamp ties
    are ordered by (ts, value) on BOTH engines so the running max is
    deterministic under co-timestamped snapshots."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_exchange

    snaps = events_to_snapshots(_events(sf_dir))

    def _project(tbl):
        return tbl.select(["conv_id", "ts", "snap_val"])

    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("n_snaps", pa.int64()),
            ("max_drawdown_cents", pa.int64()),
        ]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(conv, return_inverse=True)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        v = tbl.column("snap_val").to_numpy(zero_copy_only=False)
        y = np.floor(v * 100 + 0.5).astype(np.int64)
        o = np.lexsort((y, ts, codes))
        codes, y = codes[o], y[o]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        lens = np.diff(np.r_[starts, len(codes)])
        seg = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        LIFT = np.int64(1) << 40  # cents ≪ 2^40, segments stay apart
        runmax = np.maximum.accumulate(y + seg * LIFT) - seg * LIFT
        dd = runmax - y
        return pa.table(
            {
                "conv_id": pa.array(uniq[codes[starts]], pa.string()),
                "n_snaps": pa.array(lens.astype(np.int64)),
                "max_drawdown_cents": pa.array(
                    np.maximum.reduceat(dd, starts)
                ),
            }
        )

    return hash_exchange(
        snaps.map_batches(_project, batch_format="pyarrow", batch_size=None),
        "conv_id",
        PCFG.num_buckets,
        _kernel,
        empty_schema=out_schema,
    )


QUERIES["snapshot_max_drawdown"] = q_snapshot_max_drawdown
ORACLE_SQL["snapshot_max_drawdown"] = f"""
WITH {SQL_SNAPS_CTE},
c AS (
  SELECT conv_id, ts,
    CAST(floor(snap_val * 100 + 0.5) AS BIGINT) AS y
  FROM snaps),
r AS (
  SELECT conv_id, y,
    max(y) OVER (PARTITION BY conv_id ORDER BY ts, y
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
  FROM c)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_snaps,
  CAST(max(runmax - y) AS BIGINT) AS max_drawdown_cents
FROM r GROUP BY conv_id
""".strip()
