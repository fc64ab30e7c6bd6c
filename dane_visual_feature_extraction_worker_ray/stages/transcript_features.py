"""Flagship transcript feature pipeline: one shuffle, one vectorized pass.

Logical plan (SURVEY.md §7.1)::

    turns ∪ snapshots  (schema-aligned, tagged with is_snap)
      → two-stage hash exchange on conv_id        # THE one wide shuffle
        (stages/exchange.py; Dataset-native groupby fallback behind
         PartitionConfig.use_core_exchange=False)
           kernel (zero Python per-conversation work):
             dictionary-encode conv_id (sorted → deterministic order)
             lexsort (conv, turn_idx, ts)   [analog: sorted(paths.keys()),
                                             /root/reference/data_handling.py:33]
             exact dedup (conv_id, turn_idx) keep-first
             lag/lead, inter-turn latency
             gap sessionization
             sliding row- and time-window aggregates
             forward-fill of sparse `tool`
             sorted-merge as-of join vs snapshots (zero temporal leakage)
                                            [analog: find_shot_for_timestamp,
                                             data_handling.py:121-129]
      → (optional) stateful scorer actor pool (stages/scorer.py)

The kernel sees one whole bucket of conversations as a single Arrow
table and computes every feature for every conversation in a handful of
numpy passes (functions/segkernels.py) — no per-group Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import FeatureConfig, PartitionConfig, US_PER_S
from ..functions import segkernels as sk
from .bucketing import add_bucket_column

TURN_SCHEMA_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


# ---------------------------------------------------------------------------
# schema alignment for the turns ∪ snapshots co-group


def _align_turns(tbl: pa.Table, assign_turn_idx: bool) -> pa.Table:
    from ..functions.runtime import pin_arrow_threads

    pin_arrow_threads()
    n = tbl.num_rows
    cols = {
        "conv_id": tbl.column("conv_id"),
        "turn_idx": (
            pa.nulls(n, pa.int32())
            if assign_turn_idx
            else tbl.column("turn_idx")
        ),
        "role": tbl.column("role"),
        "text": tbl.column("text"),
        "tool": tbl.column("tool"),
        "ts": tbl.column("ts"),
        "order_key": (
            tbl.column("order_key")
            if "order_key" in tbl.column_names
            else pa.nulls(n, pa.int64())
        ),
        "snap_val": pa.nulls(n, pa.float64()),
        "snap_tag": pa.nulls(n, pa.string()),
        "is_snap": pa.array(np.zeros(n, dtype=bool)),
    }
    return pa.table(cols)


def _align_snaps(tbl: pa.Table) -> pa.Table:
    n = tbl.num_rows
    cols = {
        "conv_id": tbl.column("conv_id"),
        "turn_idx": pa.nulls(n, pa.int32()),
        "role": pa.nulls(n, pa.string()),
        "text": pa.nulls(n, pa.string()),
        "tool": pa.nulls(n, pa.string()),
        "ts": tbl.column("ts"),
        "order_key": pa.nulls(n, pa.int64()),
        "snap_val": tbl.column("snap_val"),
        "snap_tag": tbl.column("snap_tag"),
        "is_snap": pa.array(np.ones(n, dtype=bool)),
    }
    return pa.table(cols)


# ---------------------------------------------------------------------------
# per-bucket kernel


def _masked_f64(vals: np.ndarray, valid: np.ndarray) -> pa.Array:
    return pa.array(vals.astype(np.float64), mask=~valid)


def _take_str(arr: pa.Array, idx: np.ndarray, valid: np.ndarray) -> pa.Array:
    taken = arr.take(pa.array(idx))
    return pc.if_else(pa.array(valid), taken, pa.scalar(None, pa.string()))


def compute_bucket_features(
    tbl: pa.Table,
    cfg: FeatureConfig,
    assign_turn_idx: bool = False,
    extra_ops: list[str] | None = None,
) -> pa.Table:
    """All per-turn features for one bucket of whole conversations.

    ``extra_ops``: names from the user-extension registry
    (functions/feature_ops.py); each appends one column, computed in
    the same vectorized pass."""
    from ..functions.runtime import pin_arrow_threads

    pin_arrow_threads()
    tbl = tbl.combine_chunks()
    n = tbl.num_rows
    out_schema = _features_schema(extra_ops)
    if n == 0:
        return out_schema.empty_table()

    # dictionary-encode conv_id (C++), then remap codes so they follow
    # lexicographic conv_id order → deterministic output row order
    # regardless of shuffle arrival order (resume-safe); the remap sort
    # touches only the (small) unique-conversation dictionary
    dict_arr = pc.dictionary_encode(tbl.column("conv_id"))
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.chunk(0)
    raw_codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    uniq = np.asarray(dict_arr.dictionary.to_pandas(), dtype=object)
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[np.argsort(uniq, kind="stable")] = np.arange(len(uniq))
    codes_all = rank[np.asarray(raw_codes, dtype=np.int64)]
    ts_all = tbl.column("ts").cast(pa.int64()).to_numpy()
    is_snap = tbl.column("is_snap").to_numpy(zero_copy_only=False)

    turn_rows = np.flatnonzero(~is_snap)
    snap_rows = np.flatnonzero(is_snap)

    codes_t = codes_all[turn_rows]
    ts_t = ts_all[turn_rows]
    if assign_turn_idx:
        okey = tbl.column("order_key").to_numpy(zero_copy_only=False)
        okey = np.where(pd.isna(okey), 0, okey).astype(np.int64)[turn_rows]
        order = np.lexsort((okey, ts_t, codes_t))
    else:
        tidx = (
            tbl.column("turn_idx").to_numpy(zero_copy_only=False)[turn_rows]
        )
        tidx = np.asarray(tidx, dtype=np.int64)
        order = np.lexsort((ts_t, tidx, codes_t))
    sel = turn_rows[order]
    codes_t, ts_t = codes_t[order], ts_t[order]

    if not assign_turn_idx:
        tidx = tidx[order]
        keep = np.ones(len(sel), dtype=bool)
        keep[1:] = (codes_t[1:] != codes_t[:-1]) | (tidx[1:] != tidx[:-1])
        sel, codes_t, ts_t, tidx = sel[keep], codes_t[keep], ts_t[keep], tidx[keep]

    seg = sk.segment_ids(codes_t)
    first = sk.segment_first_index(seg)
    nt = len(sel)
    if assign_turn_idx:
        tidx = np.arange(nt, dtype=np.int64) - first

    turns = tbl.take(pa.array(sel))
    role_arr = turns.column("role").combine_chunks()
    tool_arr = turns.column("tool").combine_chunks()

    # lag / lead ------------------------------------------------------------
    delta_us, delta_valid = sk.lag_delta_us(ts_t, seg)
    lag_idx, lag_valid = sk.lag_indices(seg)
    lead_idx, lead_valid = sk.lead_indices(seg)

    # sessionization --------------------------------------------------------
    session_id, turn_in_session = sk.sessionize(ts_t, seg, cfg.session_gap_us)

    # sliding windows (exact integer accumulation) --------------------------
    tool_valid = pc.is_valid(tool_arr).to_numpy(zero_copy_only=False)
    rw = sk.row_window_bounds(seg, cfg.row_window)
    w_tool_sum, w_cnt = sk.windowed_sum_count(
        tool_valid.astype(np.int64), None, rw
    )
    w_tool_rate, _ = sk.ratio(w_tool_sum, w_cnt)
    delta_for_sum = np.where(delta_valid, delta_us, 0)
    w_lat_sum, w_lat_cnt = sk.windowed_sum_count(delta_for_sum, delta_valid, rw)
    w_lat_mean_s, w_lat_ok = sk.ratio(w_lat_sum, w_lat_cnt)
    w_lat_mean_s = w_lat_mean_s / US_PER_S

    tw_cnt = sk.time_window_counts(ts_t, seg, cfg.time_window_us)

    # forward fill ----------------------------------------------------------
    ff_idx, ff_ok = sk.ffill_indices(tool_valid, seg)

    # as-of join vs snapshots ----------------------------------------------
    codes_s = codes_all[snap_rows]
    ts_s = ts_all[snap_rows]
    s_order = np.lexsort((ts_s, codes_s))
    codes_s, ts_s = codes_s[s_order], ts_s[s_order]
    snap_sel = snap_rows[s_order]
    try:
        a_idx, a_ok = sk.asof_indices(
            codes_t, ts_t, codes_s, ts_s, allow_exact=cfg.asof_allow_exact
        )
    except OverflowError:
        # extreme ts span fallback: pandas merge_asof (C, by-key)
        lf = pd.DataFrame({"k": codes_t, "ts": ts_t, "i": np.arange(nt)})
        rf = pd.DataFrame(
            {"k": codes_s, "ts": ts_s, "j": np.arange(len(codes_s))}
        )
        m = pd.merge_asof(
            lf.sort_values("ts", kind="mergesort"),
            rf.sort_values("ts", kind="mergesort"),
            on="ts",
            by="k",
            allow_exact_matches=cfg.asof_allow_exact,
        ).sort_values("i", kind="mergesort")
        jj = m["j"].to_numpy()
        a_ok = ~pd.isna(jj)
        a_idx = np.where(a_ok, np.nan_to_num(jj), 0).astype(np.int64)
    if len(snap_sel):
        snaps = tbl.take(pa.array(snap_sel))
        snap_val_np = snaps.column("snap_val").to_numpy(zero_copy_only=False)
        sv = np.where(a_ok, snap_val_np[a_idx], 0.0).astype(np.float64)
        sv_valid = a_ok & ~np.isnan(np.where(a_ok, snap_val_np[a_idx], 0.0))
        snap_tag_arr = snaps.column("snap_tag").combine_chunks()
        snap_tag_out = _take_str(snap_tag_arr, a_idx, a_ok)
        snap_age = (ts_t - np.where(a_ok, ts_s[a_idx], 0)).astype(np.float64)
        snap_age /= US_PER_S
    else:
        a_ok = np.zeros(nt, dtype=bool)
        sv = np.zeros(nt, dtype=np.float64)
        sv_valid = a_ok
        snap_tag_out = pa.nulls(nt, pa.string())
        snap_age = np.zeros(nt, dtype=np.float64)

    out = pa.table(
        {
            "conv_id": turns.column("conv_id"),
            "turn_idx": pa.array(tidx.astype(np.int32)),
            "role": role_arr,
            "text": turns.column("text"),
            "tool": tool_arr,
            "ts": turns.column("ts"),
            "lag_ts_delta_s": _masked_f64(
                delta_us.astype(np.float64) / US_PER_S, delta_valid
            ),
            "prev_role": _take_str(role_arr, lag_idx, lag_valid),
            "next_role": _take_str(role_arr, lead_idx, lead_valid),
            "session_id": pa.array(session_id.astype(np.int64)),
            "turn_in_session": pa.array(turn_in_session.astype(np.int64)),
            "w_turn_count": pa.array(w_cnt.astype(np.int64)),
            "w_tool_rate": pa.array(w_tool_rate.astype(np.float64)),
            "w_latency_mean_s": _masked_f64(w_lat_mean_s, w_lat_ok),
            "tw_turn_count": pa.array(tw_cnt.astype(np.int64)),
            "snap_val_asof": _masked_f64(sv, sv_valid),
            "snap_tag_asof": snap_tag_out,
            "snap_age_s": _masked_f64(snap_age, a_ok),
            "ffill_tool": _take_str(tool_arr, ff_idx, ff_ok),
        }
    )
    if extra_ops:
        from ..functions.feature_ops import FeatureOpContext, resolve_ops

        ctx = FeatureOpContext(
            n=nt,
            ts_us=ts_t,
            seg=seg,
            first=first,
            turn_idx=tidx,
            role=role_arr,
            text=turns.column("text").combine_chunks(),
            tool=tool_arr,
            tool_valid=tool_valid,
            cfg=cfg,
        )
        for name, fn in resolve_ops(extra_ops).items():
            out = out.append_column(name, fn(ctx))
    return out.cast(out_schema)


def _features_schema(extra_ops: list[str] | None = None) -> pa.Schema:
    from ..functions.feature_ops import FEATURE_OP_TYPES

    extra = [
        (name, FEATURE_OP_TYPES[name]) for name in (extra_ops or [])
    ]
    return pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
            ("lag_ts_delta_s", pa.float64()),
            ("prev_role", pa.string()),
            ("next_role", pa.string()),
            ("session_id", pa.int64()),
            ("turn_in_session", pa.int64()),
            ("w_turn_count", pa.int64()),
            ("w_tool_rate", pa.float64()),
            ("w_latency_mean_s", pa.float64()),
            ("tw_turn_count", pa.int64()),
            ("snap_val_asof", pa.float64()),
            ("snap_tag_asof", pa.string()),
            ("snap_age_s", pa.float64()),
            ("ffill_tool", pa.string()),
        ]
        + extra
    )


# ---------------------------------------------------------------------------
# dataset-level pipeline


def compute_features(
    turns_ds,
    snapshots_ds=None,
    cfg: FeatureConfig | None = None,
    pcfg: PartitionConfig | None = None,
    assign_turn_idx: bool = False,
    extra_ops: list[str] | None = None,
):
    """turns (∪ snapshots) → per-turn feature Dataset. Lazy, streaming."""
    if extra_ops:
        from ..functions.feature_ops import resolve_ops

        resolve_ops(extra_ops)  # fail fast on unknown op names
    cfg = cfg or FeatureConfig()
    pcfg = pcfg or PartitionConfig()

    ds = turns_ds.map_batches(
        _align_turns,
        batch_format="pyarrow",
        fn_kwargs={"assign_turn_idx": assign_turn_idx},
        batch_size=None,  # whole blocks: alignment is O(1) per batch
    )
    if snapshots_ds is not None:
        ds = ds.union(
            snapshots_ds.map_batches(
                _align_snaps, batch_format="pyarrow", batch_size=None
            )
        )
    if pcfg.use_core_exchange:
        from .exchange import hash_exchange

        def _kernel(_p: int, table: pa.Table) -> pa.Table:
            return compute_bucket_features(
                table, cfg, assign_turn_idx, extra_ops
            )

        return hash_exchange(
            ds,
            "conv_id",
            pcfg.num_buckets,
            _kernel,
            empty_schema=_features_schema(extra_ops),
        )

    # Dataset-native fallback (sort-based shuffle; slower, kept for
    # A/B correctness testing and environments without ray.remote)
    ds = add_bucket_column(ds, pcfg.num_buckets)

    def _kernel_g(group: pa.Table) -> pa.Table:
        return compute_bucket_features(
            group.drop_columns(["bucket"]), cfg, assign_turn_idx, extra_ops
        )

    return ds.groupby("bucket").map_groups(_kernel_g, batch_format="pyarrow")
