"""Grouped aggregates: per-session stats and tumbling windows.

Both follow the partial-then-final pattern: cheap vectorized partial
aggregation inside ``map_batches`` (one row per key per batch), then a
small ``groupby().aggregate()`` over the partials — so the wide
exchange moves pre-shrunk data, not raw turns (SURVEY.md §2.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ..config import FeatureConfig, PartitionConfig, US_PER_S
from ..functions.segkernels import tumble_bucket
from .transcript_features import compute_features


def session_stats(
    turns_ds,
    cfg: FeatureConfig | None = None,
    pcfg: PartitionConfig | None = None,
    assign_turn_idx: bool = False,
):
    """One row per (conv_id, session_id): turn/tool counts, span, rate.

    Sessions are computed by the flagship kernel; the aggregate runs
    *inside the same bucket batch* (sessions never cross conversations,
    conversations never cross buckets) — no second shuffle.
    """
    cfg = cfg or FeatureConfig()
    feats = compute_features(
        turns_ds, None, cfg=cfg, pcfg=pcfg, assign_turn_idx=assign_turn_idx
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        # a session may straddle map_batches boundaries → emit mergeable
        # partials here, combine in the (tiny) final groupby below
        from .groupagg import group_aggregate_table

        g = group_aggregate_table(
            tbl.select(["conv_id", "session_id", "ts", "tool", "turn_idx"]),
            ["conv_id", "session_id"],
            [("turn_idx", "count"), ("tool", "count"),
             ("ts", "min"), ("ts", "max")],
            ["conv_id", "session_id", "n_turns", "n_tool", "t0_us", "t1_us"],
        )
        return pa.table(
            {
                "conv_id": g.column("conv_id"),
                "session_id": g.column("session_id"),
                "n_turns": g.column("n_turns").cast(pa.int64()),
                "n_tool": g.column("n_tool").cast(pa.int64()),
                "t0_us": g.column("t0_us").cast(pa.int64()),
                "t1_us": g.column("t1_us").cast(pa.int64()),
            }
        )

    from .groupagg import hash_grouped_aggregate

    partials = feats.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    )
    final = hash_grouped_aggregate(
        partials,
        ["conv_id", "session_id"],
        [("n_turns", "sum"), ("n_tool", "sum"), ("t0_us", "min"), ("t1_us", "max")],
    )

    def _finish(tbl: pa.Table) -> pa.Table:
        t0 = tbl.column("t0_us").to_numpy()
        t1 = tbl.column("t1_us").to_numpy()
        dur = (t1 - t0).astype(np.float64) / US_PER_S
        rate = pc.divide(
            tbl.column("n_tool").cast(pa.float64()),
            tbl.column("n_turns").cast(pa.float64()),
        )
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "session_id": tbl.column("session_id").cast(pa.int64()),
                "n_turns": tbl.column("n_turns").cast(pa.int64()),
                "n_tool": tbl.column("n_tool").cast(pa.int64()),
                "session_start": tbl.column("t0_us").cast(pa.timestamp("us")),
                "session_end": tbl.column("t1_us").cast(pa.timestamp("us")),
                "duration_s": pa.array(dur),
                "tool_rate": rate,
            }
        )

    return final.map_batches(_finish, batch_format="pyarrow", batch_size=None)


def tumbling_aggregate(
    turns_ds,
    cfg: FeatureConfig | None = None,
):
    """Per (conv_id, tumbling window): turn count, tool count, tool rate.

    Needs no ordering at all → computed straight off the raw turns with
    in-batch partial aggregation; the final groupby exchanges only
    (conv, window) partials.
    """
    cfg = cfg or FeatureConfig()
    tumble_us = cfg.tumble_us

    def _partial(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column("ts").cast(pa.int64()).to_numpy()
        w = tumble_bucket(ts_us, tumble_us)
        t = pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "w_us": pa.array(w),
                "tool": tbl.column("tool"),
            }
        )
        from .groupagg import group_aggregate_table

        g = group_aggregate_table(
            t,
            ["conv_id", "w_us"],
            [("w_us", "count"), ("tool", "count")],
            ["conv_id", "w_us", "turn_cnt", "tool_cnt"],
        )
        return pa.table(
            {
                "conv_id": g.column("conv_id"),
                "w_us": g.column("w_us"),
                "turn_cnt": g.column("turn_cnt").cast(pa.int64()),
                "tool_cnt": g.column("tool_cnt").cast(pa.int64()),
            }
        )

    from .groupagg import hash_grouped_aggregate

    partials = turns_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    )
    final = hash_grouped_aggregate(
        partials,
        ["conv_id", "w_us"],
        [("turn_cnt", "sum"), ("tool_cnt", "sum")],
    )

    def _finish(tbl: pa.Table) -> pa.Table:
        rate = pc.divide(
            tbl.column("tool_cnt").cast(pa.float64()),
            tbl.column("turn_cnt").cast(pa.float64()),
        )
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "w_start": tbl.column("w_us").cast(pa.timestamp("us")),
                "turn_cnt": tbl.column("turn_cnt").cast(pa.int64()),
                "tool_cnt": tbl.column("tool_cnt").cast(pa.int64()),
                "tool_rate": rate,
            }
        )

    return final.map_batches(_finish, batch_format="pyarrow", batch_size=None)
