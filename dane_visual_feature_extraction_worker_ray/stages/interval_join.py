"""Distributed interval (range) join: points × intervals.

Ray Data has no native range join; a cross join + filter is O(n·m).
This operator expresses ``point.ts ∈ [start, end)`` as ONE side-tagged
hash exchange on a TIME BUCKET:

1. pick ``bucket = ts // bucket_width``; every point lands in exactly
   one bucket, every interval is replicated to each bucket it overlaps
   (``start // W .. (end - 1) // W``);
2. one :func:`~.exchange.hash_exchange` on the bucket co-locates each
   bucket's points with every interval that could match them; because
   a point lives in ONE bucket, each (point, interval) pair meets
   exactly once — no output dedup pass;
3. the partition kernel sorts points by ``ts`` once, then each interval
   finds its match RUN with two ``searchsorted`` calls and expands via
   ``np.repeat`` (same run-expansion as :mod:`.join`) —
   O(m log n + output), no Python loops, no quadratic sweep.

Scale contract: replication factor per interval is
``len/bucket_width + 1`` — pick ``bucket_width`` near the TYPICAL
interval length so replication stays ~2× while buckets stay small. A
single bucket's reduce input is (points in the window) + (intervals
overlapping it); a pathological bucket (hot time region) is the same
skew class as a hot join key — the exchange's 4 GiB partition warning
applies. Timestamps are integer microseconds end to end (the repo's
float-free window-math policy); ``end`` is EXCLUSIVE.

Reference analog: the shot-interval lookup assigns each keyframe
timestamp to its containing shot interval
(``/root/reference/data_handling.py:121-129``) — generalized here to
arbitrary many-to-many point-in-range joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BKT = "__bkt"
_SIDE = "__side"


def interval_join(
    points_ds,
    intervals_ds,
    point_ts_col: str,
    start_col: str,
    end_col: str,
    point_cols: list[str],
    interval_cols: list[str],
    bucket_width: int,
    num_partitions: int = 32,
):
    """Emit one row per (interval, point) with ``start <= ts < end``.

    All three timestamp columns must be int64 (µs). Output columns:
    ``interval_cols`` then ``point_cols`` (names must not collide).
    Intervals with ``end <= start`` (empty) match nothing.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    overlap = set(point_cols) & set(interval_cols)
    if overlap:
        raise ValueError(f"output name collision: {sorted(overlap)}")

    from .join import arrow_schema_of

    p_schema = arrow_schema_of(points_ds)
    i_schema = arrow_schema_of(intervals_ds)
    p_types = {c: p_schema.field(c).type for c in point_cols}
    i_types = {c: i_schema.field(c).type for c in interval_cols}

    def _tag_points(tbl: pa.Table) -> pa.Table:
        ts = tbl.column(point_ts_col).cast(pa.int64()).to_numpy()
        n = tbl.num_rows
        cols = {
            _BKT: pa.array(ts // bucket_width, pa.int64()),
            "__ts": pa.array(ts),
            "__start": pa.nulls(n, pa.int64()),
            "__end": pa.nulls(n, pa.int64()),
        }
        for c in point_cols:
            cols[c] = tbl.column(c)
        for c in interval_cols:
            cols[c] = pa.nulls(n, i_types[c])
        cols[_SIDE] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def _tag_intervals(tbl: pa.Table) -> pa.Table:
        st = tbl.column(start_col).cast(pa.int64()).to_numpy()
        en = tbl.column(end_col).cast(pa.int64()).to_numpy()
        live = en > st  # empty intervals match nothing
        t = tbl.filter(pa.array(live))
        st, en = st[live], en[live]
        # replicate to every overlapped bucket (end exclusive)
        b_lo = st // bucket_width
        b_hi = (en - 1) // bucket_width
        reps = (b_hi - b_lo + 1).astype(np.int64)
        if len(reps) and int(reps.max()) > 1024:
            # no silent scale cliffs: an interval ~1000x the bucket
            # width means bucket_width is mis-sized for this data —
            # replication (and exchange bytes) grow linearly with it
            import logging

            logging.getLogger(__name__).warning(
                "interval_join: an interval spans %d buckets "
                "(bucket_width=%d) — raise bucket_width toward the "
                "typical interval length to curb replication",
                int(reps.max()), bucket_width,
            )
        idx = np.repeat(np.arange(len(st), dtype=np.int64), reps)
        within = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        bkt = b_lo[idx] + within
        r = t.take(pa.array(idx))
        m = len(idx)
        cols = {
            _BKT: pa.array(bkt, pa.int64()),
            "__ts": pa.nulls(m, pa.int64()),
            "__start": pa.array(st[idx]),
            "__end": pa.array(en[idx]),
        }
        for c in point_cols:
            cols[c] = pa.nulls(m, p_types[c])
        for c in interval_cols:
            cols[c] = r.column(c)
        cols[_SIDE] = pa.array(np.ones(m, np.int8))
        return pa.table(cols)

    unioned = points_ds.map_batches(
        _tag_points, batch_format="pyarrow", batch_size=None
    ).union(
        intervals_ds.map_batches(
            _tag_intervals, batch_format="pyarrow", batch_size=None
        )
    )

    out_schema = pa.schema(
        [pa.field(c, i_types[c]) for c in interval_cols]
        + [pa.field(c, p_types[c]) for c in point_cols]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        is_pt = side == 0
        pi = np.flatnonzero(is_pt)
        ii = np.flatnonzero(~is_pt)
        if len(pi) == 0 or len(ii) == 0:
            return out_schema.empty_table()

        def _int_col(name: str, rows: np.ndarray) -> np.ndarray:
            # the other side's rows are typed nulls; a plain to_numpy
            # would round-trip int64 through float64 (NaN path) and
            # alias values >= 2^53 — fill first, slice the null-free
            # rows after (same fix as the equi-join kernel)
            filled = pc.fill_null(tbl.column(name), 0)
            return filled.to_numpy(zero_copy_only=False)[rows]

        ts = _int_col("__ts", pi)
        order = np.argsort(ts, kind="stable")
        pi, ts = pi[order], ts[order]
        st = _int_col("__start", ii)
        en = _int_col("__end", ii)
        bkt = tbl.column(_BKT).to_numpy()
        # a pair is emitted only in the POINT's bucket: clamp each
        # replicated interval's run to this partition's point set (the
        # whole partition shares one bucket per group only when
        # num_partitions >= buckets; with hash packing several buckets
        # share a partition, so clamp per-row to the interval-row's
        # replica bucket)
        ib = bkt[ii]
        lo_t = np.maximum(st, ib * bucket_width)
        hi_t = np.minimum(en, (ib + 1) * bucket_width)
        lo = np.searchsorted(ts, lo_t, side="left")
        hi = np.searchsorted(ts, hi_t, side="left")  # end exclusive
        cnt = np.maximum(hi - lo, 0)
        has = cnt > 0
        rep_i = np.repeat(ii[has], cnt[has])
        offs = np.repeat(lo[has], cnt[has])
        cm = cnt[has]
        within = np.arange(cm.sum(), dtype=np.int64) - np.repeat(
            np.cumsum(cm) - cm, cm
        )
        rep_p = pi[offs + within]
        pieces = {}
        i_take = pa.array(rep_i, pa.int64())
        p_take = pa.array(rep_p, pa.int64())
        for c in interval_cols:
            pieces[c] = tbl.column(c).take(i_take)
        for c in point_cols:
            pieces[c] = tbl.column(c).take(p_take)
        return pa.table(pieces).cast(out_schema)

    from .exchange import hash_exchange

    return hash_exchange(
        unioned, _BKT, num_partitions, _kernel, empty_schema=out_schema
    )


def interval_overlap_join(
    left_ds,
    right_ds,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    left_cols: list[str],
    right_cols: list[str],
    bucket_width: int,
    num_partitions: int = 32,
    ov_start_col: str = "ov_start",
    ov_end_col: str = "ov_end",
):
    """Interval × interval OVERLAP join: one row per (left, right)
    pair with ``[l_start, l_end) ∩ [r_start, r_end) ≠ ∅``, plus the
    intersection bounds — the companion of :func:`interval_join` for
    two interval tables (sessions × incidents, shots × captions …).

    Same bucket-replication shuffle, but BOTH sides replicate; each
    pair still materializes exactly once, with no dedup pass, via the
    overlap-start ownership rule: a pair is emitted only in the bucket
    containing ``max(l_start, r_start)``. Inside a partition that
    splits into two one-sided sweeps over start-sorted HOME replicas
    (the replica whose bucket contains its own start):

    * case A (``r_start >= l_start``): every left REPLICA scans home
      rights with ``r_start ∈ [max(l_start, bkt_lo), min(l_end,
      bkt_hi))`` — a contiguous run after one sort, since ``r_end >
      r_start >= l_start`` makes the end test vacuous;
    * case B (``r_start < l_start`` STRICTLY, so A∩B is empty): the
      mirror sweep, rights-replicas over home lefts.

    A self-join (same table both sides) emits identity pairs and both
    orientations — filter to a canonical key order downstream.
    Timestamps are int64 µs, ends exclusive; empty intervals
    (``end <= start``) match nothing.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    clash = (set(left_cols) & set(right_cols)) | (
        {ov_start_col, ov_end_col} & (set(left_cols) | set(right_cols))
    )
    if clash:
        raise ValueError(f"output name collision: {sorted(clash)}")

    from .join import arrow_schema_of

    l_schema = arrow_schema_of(left_ds)
    r_schema = arrow_schema_of(right_ds)
    l_types = {c: l_schema.field(c).type for c in left_cols}
    r_types = {c: r_schema.field(c).type for c in right_cols}

    def _tag(side_val: int, start_name: str, end_name: str,
             carry: list[str], other: list[str], other_types: dict):
        # canonical output column order (both sides must union cleanly)
        def _fn(tbl: pa.Table) -> pa.Table:
            st = tbl.column(start_name).cast(pa.int64()).to_numpy()
            en = tbl.column(end_name).cast(pa.int64()).to_numpy()
            live = en > st
            t = tbl.filter(pa.array(live))
            st, en = st[live], en[live]
            b_lo = st // bucket_width
            b_hi = (en - 1) // bucket_width
            reps = (b_hi - b_lo + 1).astype(np.int64)
            if len(reps) and int(reps.max()) > 1024:
                import logging

                logging.getLogger(__name__).warning(
                    "interval_overlap_join: an interval spans %d "
                    "buckets (bucket_width=%d) — raise bucket_width",
                    int(reps.max()), bucket_width,
                )
            idx = np.repeat(np.arange(len(st), dtype=np.int64), reps)
            within = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(reps) - reps, reps
            )
            r = t.take(pa.array(idx))
            m = len(idx)
            cols = {
                _BKT: pa.array(b_lo[idx] + within, pa.int64()),
                "__st": pa.array(st[idx]),
                "__en": pa.array(en[idx]),
            }
            for c in carry:
                cols[c] = r.column(c)
            for c in other:
                cols[c] = pa.nulls(m, other_types[c])
            cols[_SIDE] = pa.array(np.full(m, side_val, np.int8))
            order = (
                [_BKT, "__st", "__en"] + left_cols + right_cols + [_SIDE]
            )
            return pa.table({c: cols[c] for c in order})

        return _fn

    unioned = left_ds.map_batches(
        _tag(0, left_start, left_end, left_cols, right_cols, r_types),
        batch_format="pyarrow", batch_size=None,
    ).union(
        right_ds.map_batches(
            _tag(1, right_start, right_end, right_cols, left_cols,
                 l_types),
            batch_format="pyarrow", batch_size=None,
        )
    )

    out_schema = pa.schema(
        [pa.field(c, l_types[c]) for c in left_cols]
        + [pa.field(c, r_types[c]) for c in right_cols]
        + [pa.field(ov_start_col, pa.int64()),
           pa.field(ov_end_col, pa.int64())]
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if len(li) == 0 or len(ri) == 0:
            return out_schema.empty_table()
        st_all = pc.fill_null(tbl.column("__st"), 0).to_numpy(
            zero_copy_only=False
        )
        en_all = pc.fill_null(tbl.column("__en"), 0).to_numpy(
            zero_copy_only=False
        )
        bkt = tbl.column(_BKT).to_numpy()

        def _sweep(scan_rows, home_rows, strict):
            """scan side's replicas × home side's start-sorted rows."""
            hst = st_all[home_rows]
            o = np.argsort(hst, kind="stable")
            home_rows, hst = home_rows[o], hst[o]
            s_st = st_all[scan_rows]
            s_en = en_all[scan_rows]
            ib = bkt[scan_rows]
            lo_t = np.maximum(s_st + (1 if strict else 0),
                              ib * bucket_width)
            hi_t = np.minimum(s_en, (ib + 1) * bucket_width)
            lo = np.searchsorted(hst, lo_t, side="left")
            hi = np.searchsorted(hst, hi_t, side="left")
            cnt = np.maximum(hi - lo, 0)
            has = cnt > 0
            rep_s = np.repeat(scan_rows[has], cnt[has])
            offs = np.repeat(lo[has], cnt[has])
            cm = cnt[has]
            within = np.arange(cm.sum(), dtype=np.int64) - np.repeat(
                np.cumsum(cm) - cm, cm
            )
            rep_h = home_rows[offs + within]
            return rep_s, rep_h

        # home replicas: the one whose bucket contains its own start
        r_home = ri[(st_all[ri] // bucket_width) == bkt[ri]]
        l_home = li[(st_all[li] // bucket_width) == bkt[li]]
        # case A: left replicas scan home rights (r_start >= l_start)
        a_l, a_r = _sweep(li, r_home, strict=False)
        # case B: right replicas scan home lefts (l_start > r_start)
        b_r, b_l = _sweep(ri, l_home, strict=True)
        l_rows = np.concatenate([a_l, b_l])
        r_rows = np.concatenate([a_r, b_r])
        if len(l_rows) == 0:
            return out_schema.empty_table()
        ov_s = np.maximum(st_all[l_rows], st_all[r_rows])
        ov_e = np.minimum(en_all[l_rows], en_all[r_rows])
        pieces = {}
        lt = pa.array(l_rows, pa.int64())
        rt = pa.array(r_rows, pa.int64())
        for c in left_cols:
            pieces[c] = tbl.column(c).take(lt)
        for c in right_cols:
            pieces[c] = tbl.column(c).take(rt)
        pieces[ov_start_col] = pa.array(ov_s)
        pieces[ov_end_col] = pa.array(ov_e)
        return pa.table(pieces).cast(out_schema)

    from .exchange import hash_exchange

    return hash_exchange(
        unioned, _BKT, num_partitions, _kernel, empty_schema=out_schema
    )
