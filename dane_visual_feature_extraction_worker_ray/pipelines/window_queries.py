"""Window-function queries: running totals, grouped ranks, ordered
string aggregation — the ``OVER (...)`` family SQL users expect,
expressed on the engine's scan primitives (stages/scan.py).

Exactness policy (same as relational_queries): money flows as integer
cents through every distributed addition; ordering keys use the SAME
cents expression on both sides so ties break identically; floats are
produced by one final IEEE division per row.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.events_adapter import SQL_TURNS_CTE, events_to_turns
from ..stages.scan import global_scan, grouped_scan, grouped_string_agg
from .relational_queries import _cents

QUERIES = {}
ORACLE_SQL = {}


def _read(sf_dir: str, name: str):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(os.path.join(sf_dir, f"{name}.parquet"))


# --- cumulative_revenue: GLOBAL running sum over the date order ------------


def q_cumulative_revenue(sf_dir: str):
    """Running order count + revenue in global (o_orderdate,
    o_orderkey) order — the distributed two-phase prefix scan
    (range-partitioned sort, per-block partials, driver prefix)."""

    def _project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "o_orderdate": tbl.column("o_orderdate"),
                "price_c": pa.array(_cents(tbl.column("o_totalprice"))),
            }
        )

    orders = _read(sf_dir, "orders").map_batches(
        _project, batch_format="pyarrow"
    )
    scanned = global_scan(
        orders,
        [("o_orderdate", "ascending"), ("o_orderkey", "ascending")],
        [("price_c", "cum_c")],
        rank_col="rn",
    )

    def _final(tbl: pa.Table) -> pa.Table:
        cum = tbl.column("cum_c").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "o_orderdate": tbl.column("o_orderdate"),
                "rn": tbl.column("rn"),
                "running_revenue": pa.array(
                    cum.astype(np.float64) / 100.0
                ),
            }
        )

    return scanned.map_batches(_final, batch_format="pyarrow")


QUERIES["cumulative_revenue"] = q_cumulative_revenue
ORACLE_SQL["cumulative_revenue"] = """
SELECT o_orderkey, o_orderdate,
  row_number() OVER w AS rn,
  CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) OVER w AS DOUBLE)/100
    AS running_revenue
FROM orders
WINDOW w AS (ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING)
""".strip()


# --- running_conv_totals: per-conversation running sums --------------------


def q_running_conv_totals(sf_dir: str):
    """Per-conversation running character and tool-call totals in turn
    order — segmented cumsum after one hash exchange on conv_id (no
    per-group Python; a million tiny conversations cost the same as
    one big one)."""

    def _project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "ts": tbl.column("ts"),
                "order_key": tbl.column("order_key"),
                "chars": pc.fill_null(
                    pc.utf8_length(tbl.column("text")), 0
                ).cast(pa.int64()),
                "tool_i": pc.cast(
                    pc.is_valid(tbl.column("tool")), pa.int64()
                ),
            }
        )

    turns = events_to_turns(_read(sf_dir, "events")).map_batches(
        _project, batch_format="pyarrow"
    )
    scanned = grouped_scan(
        turns,
        "conv_id",
        [("ts", "ascending"), ("order_key", "ascending")],
        [
            ("rownum", "rn"),
            ("cumsum", "chars", "running_chars"),
            ("cumsum", "tool_i", "running_tools"),
        ],
        keep_cols=["conv_id"],
    )

    def _final(tbl: pa.Table) -> pa.Table:
        rn = tbl.column("rn").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "turn_idx": pa.array((rn - 1).astype(np.int32)),
                "running_chars": tbl.column("running_chars"),
                "running_tools": tbl.column("running_tools"),
            }
        )

    return scanned.map_batches(_final, batch_format="pyarrow")


QUERIES["running_conv_totals"] = q_running_conv_totals
ORACLE_SQL["running_conv_totals"] = f"""
WITH {SQL_TURNS_CTE}
SELECT conv_id, turn_idx,
  CAST(SUM(coalesce(length(text), 0)) OVER w AS BIGINT) AS running_chars,
  CAST(SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) OVER w AS BIGINT)
    AS running_tools
FROM turns
WINDOW w AS (PARTITION BY conv_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
""".strip()


# --- customer_order_ranks: rank / percent_rank / ntile per customer --------


def q_customer_order_ranks(sf_dir: str):
    """row_number, percent_rank and ntile(4) of each customer's orders
    by price (cents-exact descending, orderkey tie-break). Rank
    machinery = the same grouped scan; percent_rank/ntile are pure
    per-row formulas over (rn, group count)."""

    def _project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": tbl.column("o_custkey"),
                "o_orderkey": tbl.column("o_orderkey"),
                "price_c": pa.array(_cents(tbl.column("o_totalprice"))),
            }
        )

    orders = _read(sf_dir, "orders").map_batches(
        _project, batch_format="pyarrow"
    )
    scanned = grouped_scan(
        orders,
        "o_custkey",
        [("price_c", "descending"), ("o_orderkey", "ascending")],
        [("rownum", "rn"), ("count", "cnt")],
        keep_cols=["o_custkey", "o_orderkey"],
    )

    def _final(tbl: pa.Table) -> pa.Table:
        rn = tbl.column("rn").to_numpy(zero_copy_only=False)
        cnt = tbl.column("cnt").to_numpy(zero_copy_only=False)
        # percent_rank: (rank-1)/(n-1), 0.0 for single-row groups —
        # one IEEE division, matching DuckDB's formula
        denom = np.maximum(cnt - 1, 1).astype(np.float64)
        pct = np.where(cnt > 1, (rn - 1).astype(np.float64) / denom, 0.0)
        # ntile(4): first n%4 buckets get ceil(n/4) rows (SQL spec)
        k = 4
        r0 = rn - 1
        big = cnt % k
        size_big = cnt // k + 1
        small = np.maximum(cnt // k, 1)
        cut = big * size_big
        quart = np.where(
            r0 < cut, r0 // size_big, big + (r0 - cut) // small
        ) + 1
        return pa.table(
            {
                "o_custkey": tbl.column("o_custkey"),
                "o_orderkey": tbl.column("o_orderkey"),
                "rn": tbl.column("rn"),
                "pct_rank": pa.array(pct),
                "quartile": pa.array(quart.astype(np.int64)),
            }
        )

    return scanned.map_batches(_final, batch_format="pyarrow")


QUERIES["customer_order_ranks"] = q_customer_order_ranks
ORACLE_SQL["customer_order_ranks"] = """
SELECT o_custkey, o_orderkey,
  row_number() OVER w AS rn,
  percent_rank() OVER w AS pct_rank,
  ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(round(o_totalprice*100,0) AS BIGINT) DESC,
                      o_orderkey)
""".strip()


# --- role_sequence: ordered string_agg per conversation --------------------


def q_role_sequence(sf_dir: str):
    """Conversation 'shape' strings: roles joined in turn order —
    C++ ListArray + binary_join over group offsets, no Python joins."""

    def _project(tbl: pa.Table) -> pa.Table:
        return tbl.select(["conv_id", "ts", "order_key", "role"])

    turns = events_to_turns(_read(sf_dir, "events")).map_batches(
        _project, batch_format="pyarrow"
    )
    return grouped_string_agg(
        turns,
        "conv_id",
        [("ts", "ascending"), ("order_key", "ascending")],
        value_col="role",
        sep=">",
        out="role_seq",
        count_col="n_turns",
    )


QUERIES["role_sequence"] = q_role_sequence
ORACLE_SQL["role_sequence"] = f"""
WITH {SQL_TURNS_CTE}
SELECT conv_id,
  string_agg(role, '>' ORDER BY ts, event_id) AS role_seq,
  CAST(count(*) AS BIGINT) AS n_turns
FROM turns
GROUP BY conv_id
""".strip()


# --- order_gap_days: GLOBAL lag across block boundaries --------------------


def q_order_gap_days(sf_dir: str):
    """Gap (days) between each order and the globally previous one in
    (o_orderdate, o_orderkey) order — global lag(1): the only
    cross-block state is one carry-in row per block, relayed by the
    driver as O(blocks) scalars. First order lags to null."""
    from ..stages.scan import global_lag

    orders = _read(sf_dir, "orders")

    def _project(tbl: pa.Table) -> pa.Table:
        return tbl.select(["o_orderkey", "o_orderdate"])

    lagged = global_lag(
        orders.map_batches(_project, batch_format="pyarrow"),
        [("o_orderdate", "ascending"), ("o_orderkey", "ascending")],
        [("o_orderdate", "prev_date")],
        num_partitions=16,
    )

    def _final(tbl: pa.Table) -> pa.Table:
        cur = tbl.column("o_orderdate").cast(pa.int64())
        prev = tbl.column("prev_date").cast(pa.int64())
        gap = pc.divide(
            pc.cast(pc.subtract(cur, prev), pa.float64()),
            pa.scalar(86400e6),
        )
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "o_orderdate": tbl.column("o_orderdate"),
                "gap_days": gap,
            }
        )

    return lagged.map_batches(_final, batch_format="pyarrow")


QUERIES["order_gap_days"] = q_order_gap_days
ORACLE_SQL["order_gap_days"] = """
SELECT o_orderkey, o_orderdate,
  CAST(epoch_us(o_orderdate) - lag(epoch_us(o_orderdate)) OVER w
       AS DOUBLE) / 86400000000 AS gap_days
FROM orders
WINDOW w AS (ORDER BY o_orderdate, o_orderkey)
""".strip()
