"""Adapter: the driver's ``events`` table → transcript-shaped tables.

The correctness gate runs over ``/root/testdata/sf*/events.parquet``
``(event_id, ts, user_id, event_type, value, props)``. We derive the
engine's canonical input shape (``BASELINE.json`` input_hint)
deterministically, with an *identical* SQL derivation used by the
DuckDB oracle so every downstream operator is value-checked:

- turns  = non-signup events: ``conv_id = CAST(user_id AS VARCHAR)``,
  order within a conversation by ``(ts, event_id)`` (→ ``turn_idx``),
  ``role = event_type``, ``text = props``,
  ``tool = props`` for click/purchase events else NULL;
- snapshots = signup events: ``(conv_id, ts, snap_val=value,
  snap_tag='signup')`` — the as-of join right side.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TOOL_ROLES = ("click", "purchase")
SNAP_ROLE = "signup"

# CTE fragments prepended to every oracle SQL query (DuckDB).
SQL_TURNS_CTE = """
turns AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
         event_type AS role,
         props AS text,
         CASE WHEN event_type IN ('click','purchase') THEN props END AS tool,
         ts,
         event_id
  FROM events
  WHERE event_type <> 'signup'
)
""".strip()

SQL_SNAPS_CTE = """
snaps AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id, ts,
         value AS snap_val, 'signup' AS snap_tag
  FROM events
  WHERE event_type = 'signup'
)
""".strip()


def events_to_turns(events_ds):
    """Ray-side derivation of the turns table (turn_idx assigned later,
    inside the bucket kernel, from ``order_key`` — a global order would
    otherwise need its own shuffle)."""

    def _project(tbl: pa.Table) -> pa.Table:
        keep = pc.not_equal(tbl.column("event_type"), SNAP_ROLE)
        t = tbl.filter(keep)
        is_tool = pc.is_in(
            t.column("event_type"),
            value_set=pa.array(list(TOOL_ROLES)),
        )
        return pa.table(
            {
                "conv_id": pc.cast(t.column("user_id"), pa.string()),
                "role": t.column("event_type"),
                "text": t.column("props"),
                "tool": pc.if_else(
                    is_tool, t.column("props"), pa.scalar(None, pa.string())
                ),
                "ts": t.column("ts"),
                "order_key": t.column("event_id"),
            }
        )

    return events_ds.map_batches(_project, batch_format="pyarrow")


def events_to_snapshots(events_ds):
    def _project(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(tbl.column("event_type"), SNAP_ROLE))
        n = t.num_rows
        return pa.table(
            {
                "conv_id": pc.cast(t.column("user_id"), pa.string()),
                "ts": t.column("ts"),
                "snap_val": t.column("value"),
                "snap_tag": pa.array([SNAP_ROLE] * n, type=pa.string()),
            }
        )

    return events_ds.map_batches(_project, batch_format="pyarrow")
