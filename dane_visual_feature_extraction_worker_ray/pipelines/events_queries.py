"""Event-stream analytics: user×event-type pivot (wide feature
assembly) and an ordered conversion funnel.

Both ride a single user-hash exchange with whole-partition vectorized
kernels (no per-group Python dispatch): the pivot scatters partial
counts into a dense (users × types) matrix, the funnel computes
first-view / first-purchase-after via ``np.minimum.at`` over the
partition's integer-µs timestamps. Pivot is the engine's analog of the
reference's feature-matrix assembly — key column first, one fixed
column per modality/feature (``/root/reference/feature_extraction.py:26-31``);
the funnel reuses the temporal-ordering discipline of the as-of join
(strictly-after semantics, integer-µs math for IEEE-free parity).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]  # sorted

_I64_MAX = np.iinfo(np.int64).max


def _events(sf_dir: str, columns):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )


def _type_codes(et: np.ndarray) -> np.ndarray:
    """Indices of event-type strings into the sorted EVENT_TYPES list.
    ``searchsorted`` returns an INSERTION index — an event type outside
    the fixed list would silently alias a neighbor (or index off the
    end); validate and fail loudly instead."""
    nt = len(EVENT_TYPES)
    t = np.searchsorted(EVENT_TYPES, et)
    bad = (t >= nt) | (
        np.asarray(EVENT_TYPES)[np.minimum(t, nt - 1)] != et
    )
    if bad.any():
        raise ValueError(
            f"unknown event_type {et[bad][:3]!r} not in {EVENT_TYPES}"
        )
    return t


def q_user_event_pivot(sf_dir: str):
    """Per-user event-type counts pivoted to one column per type.
    Per-batch (user, type) count partials shrink the exchange to at
    most users×types rows per block; the partition kernel scatters
    into a dense count matrix — fully vectorized."""
    from ..stages.exchange import hash_exchange
    from ..stages.groupagg import group_aggregate_table

    ds = _events(sf_dir, ["user_id", "event_type"])

    def _partial(tbl: pa.Table) -> pa.Table:
        t = tbl.append_column(
            "n", pa.array(np.ones(tbl.num_rows, np.int64))
        )
        return group_aggregate_table(
            t, ["user_id", "event_type"], [("n", "sum")]
        )

    out_schema = pa.schema(
        [("user_id", pa.int64())]
        + [(f"n_{e}", pa.int64()) for e in EVENT_TYPES]
    )

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        uid = tbl.column("user_id").cast(pa.int64()).to_numpy()
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        n = tbl.column("n").cast(pa.int64()).to_numpy()
        users, inv = np.unique(uid, return_inverse=True)  # sorted, stable
        tix = _type_codes(et)
        mat = np.zeros((len(users), len(EVENT_TYPES)), np.int64)
        np.add.at(mat, (inv, tix), n)
        cols = {"user_id": pa.array(users)}
        for j, e in enumerate(EVENT_TYPES):
            cols[f"n_{e}"] = pa.array(mat[:, j])
        return pa.table(cols)

    return hash_exchange(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        16,
        _kernel,
        out_schema,
    )


def q_view_purchase_funnel(sf_dir: str):
    """Ordered funnel: per user, first 'view' and the first 'purchase'
    STRICTLY after it (the as-of discipline: later stages never match
    earlier-or-equal timestamps), plus conversion flag and integer-µs
    latency. One user-hash exchange; the kernel is np.minimum.at over
    the partition — no sort needed."""
    from ..stages.exchange import hash_exchange

    ds = _events(sf_dir, ["user_id", "event_type", "ts"])

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("first_view_ts", pa.timestamp("us")),
            ("first_purchase_ts", pa.timestamp("us")),
            ("converted", pa.bool_()),
            ("latency_us", pa.int64()),
        ]
    )

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        uid = tbl.column("user_id").cast(pa.int64()).to_numpy()
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        us = tbl.column("ts").cast(pa.int64()).to_numpy()
        users, inv = np.unique(uid, return_inverse=True)
        ta = np.full(len(users), _I64_MAX)
        vm = et == "view"
        np.minimum.at(ta, inv[vm], us[vm])
        has_view = ta != _I64_MAX
        pm = (et == "purchase") & (us > ta[inv])
        tb = np.full(len(users), _I64_MAX)
        np.minimum.at(tb, inv[pm], us[pm])
        users, ta, tb = users[has_view], ta[has_view], tb[has_view]
        conv = tb != _I64_MAX
        return pa.table(
            {
                "user_id": pa.array(users),
                "first_view_ts": pa.array(ta).cast(pa.timestamp("us")),
                "first_purchase_ts": pa.array(
                    tb, pa.int64(), mask=~conv
                ).cast(pa.timestamp("us")),
                "converted": pa.array(conv),
                "latency_us": pa.array(
                    np.where(conv, tb - ta, 0), pa.int64(), mask=~conv
                ),
            }
        )

    return hash_exchange(ds, ["user_id"], 16, _kernel, out_schema)


QUERIES = {
    "user_event_pivot": q_user_event_pivot,
    "view_purchase_funnel": q_view_purchase_funnel,
}

ORACLE_SQL = {
    "user_event_pivot": "SELECT user_id, "
    + ", ".join(
        f"CAST(count(CASE WHEN event_type = '{e}' THEN 1 END) AS BIGINT)"
        f" AS n_{e}"
        for e in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id",
    "view_purchase_funnel": """
WITH v AS (
  SELECT user_id, min(ts) AS ta FROM events
  WHERE event_type = 'view' GROUP BY user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS tb
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts > v.ta
  GROUP BY e.user_id
)
SELECT v.user_id, v.ta AS first_view_ts, p.tb AS first_purchase_ts,
  p.tb IS NOT NULL AS converted,
  CAST(epoch_us(p.tb) - epoch_us(v.ta) AS BIGINT) AS latency_us
FROM v LEFT JOIN p ON v.user_id = p.user_id
""".strip(),
}


def q_train_test_split_counts(sf_dir: str):
    """Leakage-aware train/test split: the coin is thrown per
    CONVERSATION (user), never per row, so a conversation's turns can
    never straddle the split. Two-level exact aggregation: per-batch
    (user, n) partials → user-keyed exchange (exact per-user totals,
    each user wholly in one partition) → tiny per-split sums."""
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    ev = _events(sf_dir, ["user_id", "event_type"])

    def _partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = tbl.filter(
            pc.not_equal(tbl.column("event_type"), "signup")
        )
        t = pa.table(
            {
                "user_id": t.column("user_id"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["user_id"], [("n", "sum")])

    per_user = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("n", "sum")],
        num_buckets=8,
    )

    def _split_partial(tbl: pa.Table) -> pa.Table:
        uid = tbl.column("user_id").cast(pa.int64()).to_numpy()
        split = np.where((uid * 37 + 11) % 10 < 8, "train", "test")
        t = pa.table(
            {
                "split": pa.array(split),
                "n_convs": pa.array(np.ones(len(uid), np.int64)),
                "n_turns": tbl.column("n").cast(pa.int64()),
            }
        )
        return group_aggregate_table(
            t, ["split"], [("n_convs", "sum"), ("n_turns", "sum")]
        )

    return hash_grouped_aggregate(
        per_user.map_batches(
            _split_partial, batch_format="pyarrow", batch_size=None
        ),
        ["split"],
        [("n_convs", "sum"), ("n_turns", "sum")],
        num_buckets=2,
    )


QUERIES["train_test_split_counts"] = q_train_test_split_counts
ORACLE_SQL["train_test_split_counts"] = """
SELECT CASE WHEN (user_id * 37 + 11) % 10 < 8
            THEN 'train' ELSE 'test' END AS split,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_convs,
  CAST(count(*) AS BIGINT) AS n_turns
FROM events WHERE event_type <> 'signup'
GROUP BY 1
""".strip()


def q_user_event_unpivot(sf_dir: str):
    """Reshape round trip: melt the wide pivot back to long
    (user_id, event_type, n), dropping the pivot's structural zeros —
    the result must equal the plain grouped counts, which is the SQL
    oracle. The melt is a pure per-batch reshape: tile the id column
    once per value column, concatenate the counts, filter n > 0."""
    wide = q_user_event_pivot(sf_dir)

    def _melt(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        uid = tbl.column("user_id")
        ids, types, counts = [], [], []
        for e in EVENT_TYPES:
            ids.append(uid)
            types.append(pa.array([e] * n, pa.string()))
            counts.append(tbl.column(f"n_{e}"))
        import pyarrow.compute as pc

        long = pa.table(
            {
                "user_id": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                     else c for c in ids]
                ),
                "event_type": pa.concat_arrays(types),
                "n": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                     else c for c in counts]
                ),
            }
        )
        return long.filter(pc.greater(long.column("n"), 0))

    return wide.map_batches(_melt, batch_format="pyarrow")


QUERIES["user_event_unpivot"] = q_user_event_unpivot
ORACLE_SQL["user_event_unpivot"] = """
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type
""".strip()


def q_hourly_active_users(sf_dir: str):
    """Windowed exact distinct: active users + event volume per
    tumbling hour. Two-level shape — per-batch (hour, user) partials
    collapse duplicates early, the (hour, user)-keyed exchange makes
    per-user totals exact, and the final per-hour reduction counts
    users and sums events; raw rows never shuffle."""
    import pyarrow.compute as pc

    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    ev = _events(sf_dir, ["ts", "user_id"])

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "hour": pc.floor_temporal(tbl.column("ts"), unit="hour"),
                "user_id": tbl.column("user_id"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["hour", "user_id"], [("n", "sum")]
        )

    per_user = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["hour", "user_id"],
        [("n", "sum")],
        num_buckets=8,
    )

    def _hour_partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "hour": tbl.column("hour"),
                "n_users": pa.array(np.ones(tbl.num_rows, np.int64)),
                "n_events": tbl.column("n").cast(pa.int64()),
            }
        )
        return group_aggregate_table(
            t, ["hour"], [("n_users", "sum"), ("n_events", "sum")]
        )

    return hash_grouped_aggregate(
        per_user.map_batches(
            _hour_partial, batch_format="pyarrow", batch_size=None
        ),
        ["hour"],
        [("n_users", "sum"), ("n_events", "sum")],
        num_buckets=4,
    )


QUERIES["hourly_active_users"] = q_hourly_active_users
ORACLE_SQL["hourly_active_users"] = """
SELECT date_trunc('hour', ts) AS hour,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
""".strip()


def q_props_key_stats(sf_dir: str):
    """Semi-structured column processing: extract the integer ``k``
    from the JSON ``props`` payload (vectorized RE2 on the engine,
    json_extract in the oracle — equal on well-formed JSON) and
    aggregate per event type with the standard partial→tiny-final
    shape. Missing/unparseable keys count as NULL (excluded from sum
    and mean, like SQL)."""
    import pyarrow.compute as pc

    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    ev = _events(sf_dir, ["event_type", "props"])

    def _partial(tbl: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            tbl.column("props").combine_chunks(),
            r'"k":\s*(?P<k>-?\d+)',
        )
        valid = pc.is_valid(ex).to_numpy(zero_copy_only=False)
        ks = np.zeros(tbl.num_rows, np.int64)
        if valid.any():
            field = pc.struct_field(ex, [0])
            ks_all = pc.cast(
                pc.if_else(pc.is_valid(ex), field, "0"), pa.int64()
            ).to_numpy(zero_copy_only=False)
            ks = np.where(valid, ks_all, 0)
        t = pa.table(
            {
                "event_type": tbl.column("event_type"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
                "n_k": pa.array(valid.astype(np.int64)),
                "sum_k": pa.array(ks),
            }
        )
        return group_aggregate_table(
            t,
            ["event_type"],
            [("n", "sum"), ("n_k", "sum"), ("sum_k", "sum")],
        )

    final = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["event_type"],
        [("n", "sum"), ("n_k", "sum"), ("sum_k", "sum")],
        num_buckets=2,
    )

    def _fin(tbl: pa.Table) -> pa.Table:
        n_k = tbl.column("n_k").cast(pa.int64()).to_numpy()
        s = tbl.column("sum_k").cast(pa.int64()).to_numpy()
        mean = s.astype(np.float64) / np.maximum(n_k, 1)
        # SQL sum/avg over an all-NULL group is NULL, not 0/NaN —
        # mask both outputs where no row had a parseable k
        no_k = n_k == 0
        return pa.table(
            {
                "event_type": tbl.column("event_type"),
                "n_events": tbl.column("n").cast(pa.int64()),
                "n_with_k": pa.array(n_k),
                "sum_k": pa.array(s, pa.int64(), mask=no_k),
                "mean_k": pa.array(mean, pa.float64(), mask=no_k),
            }
        )

    out = final.map_batches(_fin, batch_format="pyarrow", batch_size=None)
    return out


QUERIES["props_key_stats"] = q_props_key_stats
ORACLE_SQL["props_key_stats"] = """
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
    AS n_with_k,
  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
    AS sum_k,
  CAST(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
       AS DOUBLE)
    / count(CAST(json_extract(props, '$.k') AS BIGINT)) AS mean_k
FROM events GROUP BY event_type
""".strip()


_WEEK_US = 7 * 86_400_000_000


def _week_trunc_us(us: np.ndarray) -> np.ndarray:
    """ISO-Monday week truncation of integer-µs timestamps — the exact
    integer form of DuckDB ``date_trunc('week', ts)`` (1970-01-01 was
    a Thursday, so Monday-index weekday = (days + 3) % 7; verified
    against DuckDB over a two-week probe)."""
    d = us // 86_400_000_000
    return (d - ((d + 3) % 7)) * 86_400_000_000


def q_retention_cohorts(sf_dir: str):
    """Weekly retention cohort matrix: users bucketed by the week of
    their FIRST event (cohort), counted once per (cohort, weeks-since)
    cell they were active in.

    Skew-safe two-level shape: per-batch distinct (user, week) pairs
    (raw events collapse ~week-length runs before anything shuffles) →
    user-keyed exchange (per-user min-week is exact because each user
    is wholly in one partition; cross-batch duplicate (user, week)
    pairs collapse here) → per-partition (cohort, week_no) count
    partials → tiny final aggregation. The driver never sees rows,
    only the O(cohorts × weeks) matrix — the same
    partial→exchange→final discipline as every engine aggregate."""
    from ..stages.exchange import hash_exchange
    from ..stages.groupagg import hash_grouped_aggregate

    ds = _events(sf_dir, ["user_id", "ts"])

    def _pair_dedup(uid: np.ndarray, wk: np.ndarray):
        order = np.lexsort((wk, uid))
        u, w = uid[order], wk[order]
        if len(u) == 0:
            return u, w
        keep = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        return u[keep], w[keep]

    def _partial(tbl: pa.Table) -> pa.Table:
        uid = tbl.column("user_id").cast(pa.int64()).to_numpy()
        wk = _week_trunc_us(tbl.column("ts").cast(pa.int64()).to_numpy())
        u, w = _pair_dedup(uid, wk)
        return pa.table({"user_id": pa.array(u), "week_us": pa.array(w)})

    mid_schema = pa.schema(
        [("cohort_us", pa.int64()), ("week_no", pa.int64()),
         ("n_users", pa.int64())]
    )

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return mid_schema.empty_table()
        uid = tbl.column("user_id").cast(pa.int64()).to_numpy()
        wk = tbl.column("week_us").cast(pa.int64()).to_numpy()
        u, w = _pair_dedup(uid, wk)  # cross-batch dedup
        # sorted by (user, week): each user's run starts at its cohort
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, len(u)])
        cohort = np.repeat(w[starts], lens)
        week_no = (w - cohort) // _WEEK_US
        # partial counts over a tiny key space (cohorts × offsets);
        # pack by DAY index — cohort µs are Monday-aligned, NOT
        # multiples of 7 days from the (Thursday) epoch
        pack = (cohort // 86_400_000_000) * 100_000 + week_no
        uniq, cnt = np.unique(pack, return_counts=True)
        return pa.table(
            {
                "cohort_us": pa.array((uniq // 100_000) * 86_400_000_000),
                "week_no": pa.array(uniq % 100_000),
                "n_users": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = hash_exchange(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        16,
        _kernel,
        mid_schema,
    )
    final = hash_grouped_aggregate(
        cells, ["cohort_us", "week_no"], [("n_users", "sum")],
        num_buckets=4,
    )

    def _fin(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": tbl.column("cohort_us").cast(
                    pa.int64()
                ).cast(pa.timestamp("us")),
                "week_no": tbl.column("week_no").cast(pa.int64()),
                "n_users": tbl.column("n_users").cast(pa.int64()),
            }
        )

    return final.map_batches(_fin, batch_format="pyarrow", batch_size=None)


QUERIES["retention_cohorts"] = q_retention_cohorts
ORACLE_SQL["retention_cohorts"] = """
WITH uw AS (
  SELECT DISTINCT user_id,
    CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
  FROM events
), c AS (
  SELECT user_id, min(w) AS cw FROM uw GROUP BY user_id
)
SELECT c.cw AS cohort_week,
  CAST((epoch_us(uw.w) - epoch_us(c.cw))
       / CAST(604800000000 AS BIGINT) AS BIGINT) AS week_no,
  CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c ON uw.user_id = c.user_id
GROUP BY 1, 2
""".strip()


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts: for each user's events in
    (ts, event_id) order, count (event_type → next event_type) pairs
    globally — the behavioral-sequence analog of token bigrams.

    One user-keyed exchange of the raw 4-column rows (ordering needs
    the rows together — same shape as sessionize); the kernel is one
    lexsort + boundary mask + a 25-cell bincount, so the partition
    output is at most |types|² rows regardless of row count. The final
    aggregation sums 25-row partials — trivially skew-free."""
    from ..stages.exchange import hash_exchange
    from ..stages.groupagg import hash_grouped_aggregate

    ds = _events(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    nt = len(EVENT_TYPES)

    out_schema = pa.schema(
        [("src", pa.string()), ("dst", pa.string()), ("n", pa.int64())]
    )

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        uid = tbl.column("user_id").cast(pa.int64()).to_numpy()
        us = tbl.column("ts").cast(pa.int64()).to_numpy()
        eid = tbl.column("event_id").cast(pa.int64()).to_numpy()
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        u, t = uid[order], _type_codes(et[order])
        same = u[1:] == u[:-1]
        code = t[:-1][same] * nt + t[1:][same]
        cnt = np.bincount(code, minlength=nt * nt)
        nz = np.flatnonzero(cnt)
        ets = np.asarray(EVENT_TYPES)
        return pa.table(
            {
                "src": pa.array(ets[nz // nt]),
                "dst": pa.array(ets[nz % nt]),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    parts = hash_exchange(ds, ["user_id"], 16, _kernel, out_schema)
    return hash_grouped_aggregate(
        parts, ["src", "dst"], [("n", "sum")], num_buckets=2
    )


QUERIES["event_transitions"] = q_event_transitions
ORACLE_SQL["event_transitions"] = """
WITH o AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
)
SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS n
FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
""".strip()


def q_hourly_event_anomalies(sf_dir: str, frame: int = 24, min_w: int = 12):
    """Trailing-window anomaly flags on the hourly event-rate series:
    an hour is anomalous when its count is > 2 sample standard
    deviations from the mean of the previous ≤24 observed hours.

    The z-test is done ENTIRELY in integer arithmetic — z² > 4 is
    algebraically ``(w·n − s)²·(w−1) > 4·w·(w·q − s²)`` over the
    trailing count/sum/sum-of-squares (s, q), so both engines compare
    exact integers and no float-parity engineering is needed (same
    policy as the integer-cent money math). Distributed shape: the
    only corpus-scale work is the per-hour count (mergeable partials →
    tiny exchange); the windowed pass runs on the O(hours) aggregated
    series — post-aggregation small data, Python-int exact (no int64
    overflow even at 10⁹ events/hour, where (w·n−s)² exceeds 2⁶³; the
    SQL mirror casts the products to HUGEINT for the same headroom).
    A constant trailing window (sample sd exactly 0) flags ANY
    deviation from its mean — the flatline-then-spike case."""
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    ds = _events(sf_dir, ["ts"])
    _HOUR_US = 3_600_000_000

    def _partial(tbl: pa.Table) -> pa.Table:
        us = tbl.column("ts").cast(pa.int64()).to_numpy()
        hr = (us // _HOUR_US) * _HOUR_US
        t = pa.table(
            {
                "hour_us": pa.array(hr),
                "n": pa.array(np.ones(len(hr), np.int64)),
            }
        )
        return group_aggregate_table(t, ["hour_us"], [("n", "sum")])

    counts = hash_grouped_aggregate(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["hour_us"],
        [("n", "sum")],
        num_buckets=4,
    )
    import ray as _ray

    parts = [t for t in
             (_ray.get(r) for r in counts.to_arrow_refs()) if t.num_rows]
    if not parts:  # empty events input: empty typed result, not a crash
        return pa.table(
            {
                "hour": pa.array([], pa.timestamp("us")),
                "n": pa.array([], pa.int64()),
                "w": pa.array([], pa.int64()),
                "is_anomaly": pa.array([], pa.bool_()),
            }
        )
    series = pa.concat_tables(parts)
    hrs = series.column("hour_us").cast(pa.int64()).to_numpy()
    ns = series.column("n").cast(pa.int64()).to_numpy()
    o = np.argsort(hrs)
    hrs, ns = hrs[o], ns[o]
    n_list = [int(v) for v in ns]  # Python ints: overflow-free squares
    flags, ws = [], []
    for i, n in enumerate(n_list):
        lo = max(0, i - frame)
        win = n_list[lo:i]
        w = len(win)
        ws.append(w)
        if w < min_w:
            flags.append(False)
            continue
        s, q = sum(win), sum(v * v for v in win)
        var_num = w * q - s * s  # w²·(w−1)/w × sample variance ≥ 0
        if var_num == 0:
            # constant trailing window (sd == 0): ANY deviation from
            # the (integer) mean is infinitely many sigmas out — the
            # flatline-then-spike case a detector must catch
            flags.append(w * n != s)
        else:
            flags.append((w * n - s) ** 2 * (w - 1) > 4 * w * var_num)
    return pa.table(
        {
            "hour": pa.array(hrs).cast(pa.timestamp("us")),
            "n": pa.array(ns),
            "w": pa.array(np.array(ws, np.int64)),
            "is_anomaly": pa.array(flags, pa.bool_()),
        }
    )


QUERIES["hourly_event_anomalies"] = q_hourly_event_anomalies
ORACLE_SQL["hourly_event_anomalies"] = """
WITH h AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
    CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), wnd AS (
  SELECT hour, n,
    CAST(count(n) OVER w AS BIGINT) AS w,
    CAST(coalesce(sum(n) OVER w, 0) AS BIGINT) AS s,
    CAST(coalesce(sum(n*n) OVER w, 0) AS BIGINT) AS q
  FROM h
  WINDOW w AS (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT hour, n, w,
  CASE WHEN w < 12 THEN FALSE
       WHEN (w*q - s*s) = 0 THEN w*n <> s
       ELSE CAST(w*n - s AS HUGEINT) * (w*n - s) * (w - 1)
            > 4 * w * CAST(w*q - s*s AS HUGEINT)
       END AS is_anomaly
FROM wnd
""".strip()


_HOUR_US = 3_600_000_000


def q_hourly_dense_counts(sf_dir: str):
    """Dense time-series resample: per-(event_type, hour) event counts
    over the FULL global hour range, with explicit zero rows for silent
    hours — the gap-fill / row-GENERATION operator (aligned dense series
    are what windowed stats and anomaly scans need; observed-hours-only
    aggregates silently skip gaps, cf. ``hourly_event_anomalies`` which
    windows over observed hours only).

    Scale shape: mergeable per-batch (event_type, hour) count partials →
    one aggregated table bounded by n_types × n_hours (NOT corpus size;
    materializing it is safe at any corpus scale and is reused by the
    bounds pass) → global [min, max] hour from a 2-scalar reduction →
    per-type dense expansion via ``np.arange`` on integer-µs hours,
    distributed on the event_type-keyed exchange so a wide series
    (many keys × long span) never lands on one node. Raw events never
    shuffle. Hour truncation is ``pc.floor_temporal`` — bit-identical
    to DuckDB ``date_trunc('hour', ts)`` for µs timestamps."""
    import pyarrow.compute as pc
    import ray

    from ..stages.exchange import hash_grouped_map
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    ev = _events(sf_dir, ["ts", "event_type"])

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": tbl.column("event_type"),
                "hour": pc.floor_temporal(tbl.column("ts"), unit="hour"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["event_type", "hour"], [("n", "sum")]
        )

    counts = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["event_type", "hour"],
        [("n", "sum")],
        num_buckets=8,
    ).materialize()  # bounded by n_types × n_hours — tiny by construction

    # global hour bounds: 2 scalars off the already-aggregated table
    parts = [
        t
        for t in ray.get(counts.to_arrow_refs())
        if t.num_rows > 0
    ]
    if not parts:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "hour": pa.array([], pa.timestamp("us")),
                "n": pa.array([], pa.int64()),
            }
        )
    bounds = group_aggregate_table(
        pa.concat_tables(
            [
                pa.table(
                    {
                        "_k": pa.array([0], pa.int64()),
                        "h0": pa.array(
                            [pc.min(t.column("hour").cast(pa.int64())).as_py()],
                            pa.int64(),
                        ),
                        "h1": pa.array(
                            [pc.max(t.column("hour").cast(pa.int64())).as_py()],
                            pa.int64(),
                        ),
                    }
                )
                for t in parts
            ]
        ),
        ["_k"],
        [("h0", "min"), ("h1", "max")],
    )
    h0 = int(bounds.column("h0")[0].as_py())
    h1 = int(bounds.column("h1")[0].as_py())

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("hour", pa.timestamp("us")),
            ("n", pa.int64()),
        ]
    )

    def _expand(tbl: pa.Table) -> pa.Table:
        et = tbl.column("event_type")[0].as_py()
        h = tbl.column("hour").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = tbl.column("n").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hours = np.arange(h0, h1 + _HOUR_US, _HOUR_US, dtype=np.int64)
        dense = np.zeros(len(hours), np.int64)
        dense[(h - h0) // _HOUR_US] = n
        return pa.table(
            {
                "event_type": pa.array([et] * len(hours), pa.string()),
                "hour": pa.array(hours).cast(pa.timestamp("us")),
                "n": pa.array(dense),
            }
        )

    return hash_grouped_map(
        counts, "event_type", _expand, num_partitions=8,
        empty_schema=out_schema,
    )


QUERIES["hourly_dense_counts"] = q_hourly_dense_counts
ORACLE_SQL["hourly_dense_counts"] = """
WITH b AS (
  SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS h0,
         CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS h1
  FROM events
), hours AS (
  SELECT unnest(generate_series((SELECT h0 FROM b), (SELECT h1 FROM b),
                INTERVAL 1 HOUR)) AS hour
), c AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
), t AS (SELECT DISTINCT event_type FROM events)
SELECT t.event_type, hours.hour AS hour,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM t CROSS JOIN hours
LEFT JOIN c ON c.event_type = t.event_type AND c.hour = hours.hour
""".strip()


def q_scd2_intervals(sf_dir: str):
    """Slowly-changing-dimension (type-2) interval build: treat the
    event stream as a change log and turn each (user_id, event_type)
    change into a validity interval — ``valid_from`` = the change's
    ts, ``valid_to`` = the NEXT change's ts for the same key (NULL on
    the current row), ``is_current`` marking the open interval. The
    standard snapshot-table constructor every warehouse/history join
    needs (the as-of join's right side IS such a table).

    Scale shape: one hash exchange on ``user_id`` (all of a user's
    history co-located, same partitioning key as the funnel/pivot
    suite), then a whole-partition vectorized kernel — a single
    lexsort by (user, type, ts, event_id) and a shifted-compare lead;
    no per-group Python dispatch, no global sort. Ties on ts are broken
    by event_id identically in the SQL window's ORDER BY, so the lead
    is deterministic on both sides. Timestamps stay integer-µs
    end-to-end; ``value`` passes through untouched (no arithmetic → no
    IEEE concerns)."""
    import pyarrow.compute as pc

    from ..stages.exchange import hash_exchange

    ev = _events(
        sf_dir, ["event_id", "ts", "user_id", "event_type", "value"]
    )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("valid_from", pa.timestamp("us")),
            ("valid_to", pa.timestamp("us")),
            ("is_current", pa.bool_()),
        ]
    )

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads

        pin_arrow_threads()
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        ts = (
            tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        codes = np.unique(et, return_inverse=True)[1]
        o = np.lexsort((eid, ts, codes, uid))
        uid, eid, ts, codes = uid[o], eid[o], ts[o], codes[o]
        same_key = np.zeros(len(uid), dtype=bool)
        if len(uid) > 1:
            same_key[:-1] = (uid[1:] == uid[:-1]) & (codes[1:] == codes[:-1])
        valid_to = np.zeros(len(uid), np.int64)
        if len(uid) > 1:
            valid_to[:-1] = ts[1:]
        vt = pa.array(valid_to, pa.int64()).cast(pa.timestamp("us"))
        vt = pc.if_else(pa.array(same_key), vt, pa.nulls(len(uid), pa.timestamp("us")))
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_type": tbl.column("event_type").take(pa.array(o)),
                "value": tbl.column("value").take(pa.array(o)),
                "valid_from": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "valid_to": vt,
                "is_current": pa.array(~same_key),
            }
        )

    return hash_exchange(ev, ["user_id"], 16, _kernel, out_schema)


QUERIES["scd2_intervals"] = q_scd2_intervals
ORACLE_SQL["scd2_intervals"] = """
SELECT user_id, event_type, value, ts AS valid_from,
  lead(ts) OVER w AS valid_to,
  lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
""".strip()


SESSION_GAP_US = 1_800_000_000  # 30 min


def q_session_overlap_pairs(sf_dir: str):
    """Concurrent-activity mining: every pair of user sessions whose
    time spans overlap, with the intersection start and length — the
    interval × interval OVERLAP join
    (``stages/interval_join.interval_overlap_join``) exercised by the
    driver gate (the point-in-interval variant is covered by
    ``error_window_events``).

    Spans are gap-sessionized per user (same 30-min rule as the
    flagship sessionizer) on one user_id exchange, then self-joined
    through the bucket-replication overlap shuffle; the canonical
    ``(user, sid) <`` filter keeps each unordered pair once. Session
    intervals are CLOSED ([first_ts, last_ts]); the exclusive-end
    contract gets ``en + 1`` µs, so the emitted length is
    ``least(en) - greatest(st) + 1`` — mirrored exactly in SQL."""
    from ..functions.segkernels import sessionize
    from ..stages.exchange import hash_exchange
    from ..stages.interval_join import interval_overlap_join

    ev = _events(sf_dir, ["event_id", "ts", "user_id"])

    span_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("sid", pa.int64()),
            ("st", pa.int64()),
            ("en_ex", pa.int64()),
        ]
    )

    def _spans(p: int, tbl: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads

        pin_arrow_threads()
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        o = np.lexsort((eid, ts, uid))
        uid, ts = uid[o], ts[o]
        new_u = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.cumsum(new_u) - 1
        sid, _ = sessionize(ts, seg, SESSION_GAP_US)
        new_s = new_u | np.r_[False, sid[1:] != sid[:-1]]
        starts = np.flatnonzero(new_s)
        ends = np.r_[starts[1:], len(ts)] - 1
        return pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "sid": pa.array(sid[starts]),
                "st": pa.array(ts[starts]),
                "en_ex": pa.array(ts[ends] + 1),
            }
        )

    spans = hash_exchange(
        ev, ["user_id"], 16, _spans, empty_schema=span_schema
    ).materialize()  # consumed twice by the self-join

    def _left(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_a": t.column("user_id"), "sess_a": t.column("sid"),
             "st": t.column("st"), "en_ex": t.column("en_ex")}
        )

    def _right(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_b": t.column("user_id"), "sess_b": t.column("sid"),
             "st": t.column("st"), "en_ex": t.column("en_ex")}
        )

    joined = interval_overlap_join(
        spans.map_batches(_left, batch_format="pyarrow", batch_size=None),
        spans.map_batches(_right, batch_format="pyarrow", batch_size=None),
        "st", "en_ex", "st", "en_ex",
        ["user_a", "sess_a"], ["user_b", "sess_b"],
        bucket_width=3_600_000_000,  # ~1 h: near the typical span
        num_partitions=16,
    )

    def _canon(t: pa.Table) -> pa.Table:
        ua = t.column("user_a").to_numpy(zero_copy_only=False)
        ub = t.column("user_b").to_numpy(zero_copy_only=False)
        sa = t.column("sess_a").to_numpy(zero_copy_only=False)
        sb = t.column("sess_b").to_numpy(zero_copy_only=False)
        keep = (ua < ub) | ((ua == ub) & (sa < sb))
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "user_a": t.column("user_a"),
                "sess_a": t.column("sess_a"),
                "user_b": t.column("user_b"),
                "sess_b": t.column("sess_b"),
                "ov_start_us": t.column("ov_start"),
                "ov_us": pa.array(
                    t.column("ov_end").to_numpy(zero_copy_only=False)
                    - t.column("ov_start").to_numpy(zero_copy_only=False)
                ),
            }
        )

    return joined.map_batches(_canon, batch_format="pyarrow",
                              batch_size=None)


QUERIES["session_overlap_pairs"] = q_session_overlap_pairs
ORACLE_SQL["session_overlap_pairs"] = f"""
WITH g AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
    THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM g
), spans AS (
  SELECT user_id, sid, min(ts) AS st, max(ts) AS en
  FROM s GROUP BY 1, 2
)
SELECT a.user_id AS user_a, CAST(a.sid AS BIGINT) AS sess_a,
       b.user_id AS user_b, CAST(b.sid AS BIGINT) AS sess_b,
       greatest(epoch_us(a.st), epoch_us(b.st)) AS ov_start_us,
       least(epoch_us(a.en), epoch_us(b.en))
         - greatest(epoch_us(a.st), epoch_us(b.st)) + 1 AS ov_us
FROM spans a JOIN spans b
  ON (a.user_id, a.sid) < (b.user_id, b.sid)
 AND a.st <= b.en AND b.st <= a.en
""".strip()


def q_event_type_dow_cells(sf_dir: str):
    """Independence diagnostics: the event_type × day-of-week
    contingency table with expected counts and per-cell chi²
    contributions — the drift/bias scan a data-quality gate runs
    before training (is event mix independent of weekday?).

    The corpus is reduced ONCE to mergeable (type, dow) count partials
    (bounded by 5×7 cells — never corpus-scale); row/column marginals
    and the cells are then pure arithmetic on that bounded table.
    Per-cell chi² is emitted instead of the summed statistic
    deliberately: a sum of float contributions is accumulation-order-
    dependent, per-cell values are each ONE identical expression shape
    on both sides (`exp = (r·c)/N` one division; `(o-exp)²/exp`) —
    exact IEEE parity. dow is Monday=0 (pyarrow ``day_of_week`` ==
    DuckDB ``isodow - 1``)."""
    import pyarrow.compute as pc
    import ray

    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    ev = _events(sf_dir, ["ts", "event_type"])

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": tbl.column("event_type"),
                "dow": pc.cast(
                    pc.day_of_week(tbl.column("ts")), pa.int64()
                ),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["event_type", "dow"], [("n", "sum")]
        )

    cells = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["event_type", "dow"],
        [("n", "sum")],
        num_buckets=4,
    )
    parts = [t for t in ray.get(cells.to_arrow_refs()) if t.num_rows > 0]
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "dow": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "expected": pa.array([], pa.float64()),
            "chi2_cell": pa.array([], pa.float64()),
        }
    )
    if not parts:
        return empty
    full = pa.concat_tables(parts)  # bounded: |types| × 7 rows
    et = full.column("event_type").to_numpy(zero_copy_only=False)
    dow = full.column("dow").to_numpy(zero_copy_only=False)
    n = full.column("n").to_numpy(zero_copy_only=False)
    types, ti = np.unique(et, return_inverse=True)
    days, di = np.unique(dow, return_inverse=True)
    r = np.zeros(len(types), np.int64)
    c = np.zeros(len(days), np.int64)
    np.add.at(r, ti, n)
    np.add.at(c, di, n)
    N = float(n.sum())
    exp = (r[ti] * c[di]).astype(np.float64) / N
    o = n.astype(np.float64)
    chi2 = (o - exp) * (o - exp) / exp
    return pa.table(
        {
            "event_type": full.column("event_type"),
            "dow": full.column("dow"),
            "n": full.column("n"),
            "expected": pa.array(exp),
            "chi2_cell": pa.array(chi2),
        }
    )


QUERIES["event_type_dow_cells"] = q_event_type_dow_cells
ORACLE_SQL["event_type_dow_cells"] = """
WITH cells AS (
  SELECT event_type, CAST(isodow(ts) - 1 AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), r AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS r FROM cells
         GROUP BY 1),
c AS (SELECT dow, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS N FROM cells)
SELECT cells.event_type, cells.dow, cells.n,
  CAST(r.r * c.c AS DOUBLE) / tot.N AS expected,
  (CAST(cells.n AS DOUBLE) - CAST(r.r * c.c AS DOUBLE) / tot.N)
    * (CAST(cells.n AS DOUBLE) - CAST(r.r * c.c AS DOUBLE) / tot.N)
    / (CAST(r.r * c.c AS DOUBLE) / tot.N) AS chi2_cell
FROM cells
JOIN r USING (event_type) JOIN c USING (dow), tot
""".strip()


_DAY_US = 86_400_000_000


def q_longest_daily_streak(sf_dir: str):
    """Gaps-and-islands: per user, the longest run of CONSECUTIVE
    active days (an engagement metric the SQL idiom computes with the
    ``day - row_number()`` trick). Engine shape: per-batch distinct
    (user, day) partials shrink the stream to at most users×days rows
    per block, then ONE user-keyed exchange; the kernel lexsorts,
    dedupes cross-batch day duplicates, and finds maximal runs where
    adjacent days differ by exactly one — all shifted compares, no
    per-user Python. Days are integer epoch-days (UTC floor), exactly
    DuckDB's ``date_trunc('day', ts)``."""
    import pyarrow.compute as pc

    from ..stages.exchange import hash_exchange
    from ..stages.groupagg import group_aggregate_table

    ev = _events(sf_dir, ["ts", "user_id"])

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": tbl.column("user_id"),
                "day": pa.array(
                    tbl.column("ts").cast(pa.int64()).to_numpy(
                        zero_copy_only=False
                    )
                    // _DAY_US
                ),
                "one": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["user_id", "day"], [("one", "min")]
        )

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("max_streak", pa.int64())]
    )

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads

        pin_arrow_threads()
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        day = tbl.column("day").to_numpy(zero_copy_only=False)
        o = np.lexsort((day, uid))
        uid, day = uid[o], day[o]
        keep = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        uid, day = uid[keep], day[keep]  # distinct (user, day)
        # a new streak starts at a user change or a day gap != 1
        new = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1] + 1)]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, len(day)])
        s_uid = uid[starts]
        users = np.unique(s_uid)
        mx = np.zeros(len(users), np.int64)
        np.maximum.at(mx, np.searchsorted(users, s_uid), lens)
        return pa.table(
            {"user_id": pa.array(users), "max_streak": pa.array(mx)}
        )

    return hash_exchange(
        ev.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["user_id"], 16, _kernel, out_schema,
    )


QUERIES["longest_daily_streak"] = q_longest_daily_streak
ORACLE_SQL["longest_daily_streak"] = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
), g AS (
  SELECT user_id, day,
    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS INTEGER) AS grp
  FROM d
), s AS (
  SELECT user_id, grp, count(*) AS len FROM g GROUP BY 1, 2
)
SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
FROM s GROUP BY user_id
""".strip()


FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def q_funnel_steps(sf_dir: str):
    """N-step ordered funnel (generalizing the two-step
    view→purchase funnel): per user, the first completion timestamp of
    each step, where step k must happen STRICTLY after the user's
    first completion of step k−1 — the product-analytics conversion
    ladder. Rows: users who completed step 1; later columns are NULL
    from the first missed step onward; ``steps_completed`` counts the
    prefix.

    One user-keyed exchange; the kernel runs |steps| vectorized
    ``np.minimum.at`` sweeps over the partition (each conditioned on
    the previous step's per-user first-ts), no sorting, no per-user
    Python. Pure integer-µs comparisons — exact parity with the
    chained min-join SQL."""
    from ..stages.exchange import hash_exchange

    ev = _events(sf_dir, ["user_id", "event_type", "ts"])

    out_schema = pa.schema(
        [("user_id", pa.int64())]
        + [(f"t{i+1}_{s}", pa.timestamp("us"))
           for i, s in enumerate(FUNNEL_STEPS)]
        + [("steps_completed", pa.int64())]
    )

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        uid = tbl.column("user_id").cast(pa.int64()).to_numpy()
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        us = tbl.column("ts").cast(pa.int64()).to_numpy()
        users, inv = np.unique(uid, return_inverse=True)
        prev = np.full(len(users), -1, np.int64)  # sentinel: step 0 done
        firsts = []
        for k, step in enumerate(FUNNEL_STEPS):
            t = np.full(len(users), _I64_MAX)
            m = (et == step) & (prev[inv] != _I64_MAX) & (us > prev[inv])
            np.minimum.at(t, inv[m], us[m])
            firsts.append(t)
            prev = t
        done1 = firsts[0] != _I64_MAX
        users = users[done1]
        firsts = [t[done1] for t in firsts]
        cols = {"user_id": pa.array(users)}
        completed = np.zeros(len(users), np.int64)
        for i, (t, step) in enumerate(zip(firsts, FUNNEL_STEPS)):
            ok = t != _I64_MAX
            completed += ok
            cols[f"t{i+1}_{step}"] = pa.array(
                t, pa.int64(), mask=~ok
            ).cast(pa.timestamp("us"))
        cols["steps_completed"] = pa.array(completed)
        return pa.table(cols)

    return hash_exchange(ev, ["user_id"], 16, _kernel, out_schema)


QUERIES["funnel_steps"] = q_funnel_steps


def _funnel_sql() -> str:
    ctes = [
        "s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
        f"WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id)"
    ]
    for k in range(2, len(FUNNEL_STEPS) + 1):
        ctes.append(
            f"s{k} AS (SELECT e.user_id, min(e.ts) AS t{k} "
            f"FROM events e JOIN s{k-1} USING (user_id) "
            f"WHERE e.event_type = '{FUNNEL_STEPS[k-1]}' "
            f"AND e.ts > s{k-1}.t{k-1} GROUP BY e.user_id)"
        )
    sel = ", ".join(
        f"t{i+1} AS t{i+1}_{s}" for i, s in enumerate(FUNNEL_STEPS)
    )
    joins = " ".join(
        f"LEFT JOIN s{k} USING (user_id)"
        for k in range(2, len(FUNNEL_STEPS) + 1)
    )
    n_done = " + ".join(
        [f"CASE WHEN t{k} IS NOT NULL THEN 1 ELSE 0 END"
         for k in range(1, len(FUNNEL_STEPS) + 1)]
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT user_id, {sel}, CAST({n_done} AS BIGINT)"
        " AS steps_completed"
        f"\nFROM s1 {joins}"
    )


ORACLE_SQL["funnel_steps"] = _funnel_sql()


LATE_ALLOWED_US = 3_600_000_000  # 1 h allowed lateness


def q_late_events(sf_dir: str):
    """Streaming late-data accounting: with arrival order = event_id,
    the watermark is the max event-time of strictly PRIOR arrivals;
    an event is late by ``watermark − ts`` (when positive) and flagged
    when that exceeds the allowed lateness — exactly the
    drop/route-to-side-output decision a watermarked streaming window
    makes, materialized as a batch audit.

    The watermark is :func:`stages.scan.global_running_max` — a
    range-partitioned sort plus O(blocks) carry scalars, never a
    single-node scan. All µs integers; the lateness clamp is
    ``greatest(..., 0)`` on both sides."""
    import pyarrow.compute as pc

    from ..stages.scan import global_running_max

    ev = _events(sf_dir, ["event_id", "ts"])

    def _to_us(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": tbl.column("event_id"),
                "ts": tbl.column("ts"),
                "ts_us": tbl.column("ts").cast(pa.int64()),
            }
        )

    wm = global_running_max(
        ev.map_batches(_to_us, batch_format="pyarrow", batch_size=None),
        [("event_id", "ascending")],
        "ts_us",
        "wm_us",
        num_partitions=16,
    )

    def _finish(tbl: pa.Table) -> pa.Table:
        ts_us = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        wm_col = tbl.column("wm_us")
        wm_np = pc.fill_null(wm_col, 0).to_numpy(zero_copy_only=False)
        isnull = pc.is_null(wm_col).to_numpy(zero_copy_only=False)
        late = np.maximum(wm_np - ts_us, 0)
        return pa.table(
            {
                "event_id": tbl.column("event_id"),
                "ts": tbl.column("ts"),
                "watermark": wm_col.cast(pa.timestamp("us")),
                "late_by_us": pa.array(late, mask=isnull),
                "is_late": pa.array(
                    late > LATE_ALLOWED_US, mask=isnull
                ),
            }
        )

    return wm.map_batches(_finish, batch_format="pyarrow",
                          batch_size=None)


QUERIES["late_events"] = q_late_events
# NB: DuckDB's greatest() SKIPS nulls (greatest(NULL, 0) = 0), so the
# no-watermark first row must keep its NULL through an explicit CASE
ORACLE_SQL["late_events"] = f"""
SELECT event_id, ts,
  max(ts) OVER w AS watermark,
  CASE WHEN max(ts) OVER w IS NULL THEN NULL
       ELSE CAST(greatest(epoch_us(max(ts) OVER w) - epoch_us(ts), 0)
                 AS BIGINT) END AS late_by_us,
  CASE WHEN max(ts) OVER w IS NULL THEN NULL
       ELSE greatest(epoch_us(max(ts) OVER w) - epoch_us(ts), 0)
            > {LATE_ALLOWED_US} END AS is_late
FROM events
WINDOW w AS (ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
""".strip()


def q_cdc_view_click_diff(sf_dir: str):
    """CDC-style keyed diff (``stages/setops.keyed_diff``): per-user
    view counts as the OLD version vs click counts as the NEW —
    classifying every user added / removed / changed / unchanged with
    both values carried. The change-data-capture primitive an
    incremental pipeline uses to ship deltas instead of recomputing;
    the two versions here are derived aggregates so the query is fully
    self-contained and FULL-OUTER-JOIN oracle-checkable."""
    import pyarrow.compute as pc

    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate
    from ..stages.setops import keyed_diff

    def _counts(event_type: str):
        ev = _events(sf_dir, ["user_id", "event_type"])

        def _partial(tbl: pa.Table) -> pa.Table:
            t = tbl.filter(
                pc.equal(tbl.column("event_type"), event_type)
            )
            return group_aggregate_table(
                pa.table(
                    {
                        "user_id": t.column("user_id"),
                        "n": pa.array(np.ones(t.num_rows, np.int64)),
                    }
                ),
                ["user_id"],
                [("n", "sum")],
            )

        return hash_grouped_aggregate(
            ev.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None),
            ["user_id"],
            [("n", "sum")],
            num_buckets=8,
        )

    return keyed_diff(
        _counts("view"), _counts("click"), "user_id", "n",
        num_partitions=8,
    )


QUERIES["cdc_view_click_diff"] = q_cdc_view_click_diff
ORACLE_SQL["cdc_view_click_diff"] = """
WITH o AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v FROM events
           WHERE event_type = 'view' GROUP BY 1),
n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS v FROM events
      WHERE event_type = 'click' GROUP BY 1)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
  o.v AS old_val, n.v AS new_val,
  CASE WHEN o.user_id IS NULL THEN 'added'
       WHEN n.user_id IS NULL THEN 'removed'
       WHEN o.v <> n.v THEN 'changed'
       ELSE 'unchanged' END AS change
FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
""".strip()


def q_event_trigrams(sf_dir: str):
    """Second-order behavioral sequences: global counts of every
    (event → next → next-next) triple in each user's (ts, event_id)
    order — the 3-step path analysis that distinguishes e.g.
    view→click→purchase from view→click→error journeys (the Markov
    pair counts in ``event_transitions`` cannot). Same shape: one
    user-keyed exchange, lexsort + double-shifted boundary mask + one
    |types|³-cell bincount per partition, ≤125-row partials to the
    final sum."""
    from ..stages.exchange import hash_exchange
    from ..stages.groupagg import hash_grouped_aggregate

    ds = _events(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    nt = len(EVENT_TYPES)

    out_schema = pa.schema(
        [("t1", pa.string()), ("t2", pa.string()), ("t3", pa.string()),
         ("n", pa.int64())]
    )

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        uid = tbl.column("user_id").cast(pa.int64()).to_numpy()
        us = tbl.column("ts").cast(pa.int64()).to_numpy()
        eid = tbl.column("event_id").cast(pa.int64()).to_numpy()
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        u, t = uid[order], _type_codes(et[order])
        if len(u) < 3:
            return out_schema.empty_table()
        same3 = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        code = (
            t[:-2][same3] * nt * nt + t[1:-1][same3] * nt + t[2:][same3]
        )
        cnt = np.bincount(code, minlength=nt * nt * nt)
        nz = np.flatnonzero(cnt)
        ets = np.asarray(EVENT_TYPES)
        return pa.table(
            {
                "t1": pa.array(ets[nz // (nt * nt)]),
                "t2": pa.array(ets[(nz // nt) % nt]),
                "t3": pa.array(ets[nz % nt]),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    parts = hash_exchange(ds, ["user_id"], 16, _kernel, out_schema)
    return hash_grouped_aggregate(
        parts, ["t1", "t2", "t3"], [("n", "sum")], num_buckets=2
    )


QUERIES["event_trigrams"] = q_event_trigrams
ORACLE_SQL["event_trigrams"] = """
WITH o AS (
  SELECT user_id, event_type,
    lead(event_type) OVER w AS nxt,
    lead(event_type, 2) OVER w AS nxt2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type AS t1, nxt AS t2, nxt2 AS t3,
  CAST(count(*) AS BIGINT) AS n
FROM o WHERE nxt IS NOT NULL AND nxt2 IS NOT NULL
GROUP BY 1, 2, 3
""".strip()


# --------------------------------------------------------------------------
# key-skew profiler: the shuffle-planning diagnostic

def q_key_skew_profile(sf_dir: str):
    """Key-skew profile of events.user_id — the diagnostic that decides
    whether a downstream shuffle needs salting (stages/salting.py) or a
    hot-key split (stages/join.py hot_keys): per-key counts bucketed by
    bit length (⌊log2⌋+1), with how many keys and rows land in each
    bucket and the exact share of the hottest key in basis points.

    Integer-exact end to end: per-batch partial key counts combine on
    the hash exchange (the distinct key table never reaches the
    driver); bucket = searchsorted against powers of two, NOT
    float log2 (exact at powers of two where floats round either way);
    the hot-key share is integer basis points, no IEEE division."""
    import numpy as np
    import pyarrow as pa

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ds = _events(sf_dir, ["user_id"])

    def _partial(tbl: pa.Table) -> pa.Table:
        u, c = np.unique(tbl.column("user_id").to_numpy(), return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(u.astype(np.int64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    per_key = hash_grouped_aggregate(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["user_id"],
        [("n", "sum")],
        num_buckets=8,
    )

    pows = 2 ** np.arange(62, dtype=np.int64)

    def _bucketize(tbl: pa.Table) -> pa.Table:
        c = tbl.column("n").to_numpy()
        blen = np.searchsorted(pows, c, side="right").astype(np.int64)
        return pa.table(
            {
                "bucket_bits": pa.array(blen),
                "n_keys": pa.array(np.ones(len(c), np.int64)),
                "n_rows": pa.array(c.astype(np.int64)),
                "max_key_rows": pa.array(c.astype(np.int64)),
            }
        )

    hist = hash_grouped_aggregate(
        per_key.map_batches(_bucketize, batch_format="pyarrow",
                            batch_size=None),
        ["bucket_bits"],
        [("n_keys", "sum"), ("n_rows", "sum"), ("max_key_rows", "max")],
        num_buckets=2,
    )
    tbl = pa.Table.from_pandas(hist.to_pandas(), preserve_index=False)
    total = int(tbl.column("n_rows").to_numpy().sum())
    hot = int(tbl.column("max_key_rows").to_numpy().max()) if total else 0
    out = tbl.append_column(
        "hot_share_bp",
        pa.array(
            np.full(tbl.num_rows, (hot * 10_000) // total if total else 0,
                    np.int64)
        ),
    )
    return out


QUERIES["key_skew_profile"] = q_key_skew_profile
ORACLE_SQL["key_skew_profile"] = """
WITH per_key AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id
), hist AS (
  SELECT CAST(length(bin(n)) AS BIGINT) AS bucket_bits,
    CAST(count(*) AS BIGINT) AS n_keys,
    CAST(sum(n) AS BIGINT) AS n_rows,
    CAST(max(n) AS BIGINT) AS max_key_rows
  FROM per_key GROUP BY 1
)
SELECT *,
  CAST((SELECT max(n) FROM per_key) * 10000
       // (SELECT sum(n) FROM per_key) AS BIGINT) AS hot_share_bp
FROM hist
""".strip()


def q_sliding_active_users(sf_dir: str):
    """Trailing-24h sliding-window DISTINCT users per hour — the
    windowed-distinct shape where window counts cannot be summed from
    tumbling buckets. Distributed form: distinct (hour, user) pairs
    first (raw events collapse before anything wide), then a bounded
    x24 expansion of each pair to the trailing windows it feeds —
    pruned against the broadcast set of hours that actually occur —
    and a distinct+count reduction per window hour. The wire carries
    pair partials, never events; expansion factor == window span in
    buckets, the classic window/bucket trade."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ev = _events(sf_dir, ["ts", "user_id"])

    def _pairs(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "h": pc.floor_temporal(
                    tbl.column("ts"), unit="hour"
                ).cast(pa.int64()),
                "user_id": tbl.column("user_id"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["h", "user_id"], [("n", "sum")])

    pairs = hash_grouped_aggregate(
        ev.map_batches(_pairs, batch_format="pyarrow", batch_size=None),
        ["h", "user_id"],
        [("n", "sum")],
        num_buckets=8,
    )

    def _hours_partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "h": tbl.column("h"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["h"], [("n", "sum")])

    hours = np.sort(
        hash_grouped_aggregate(
            pairs.map_batches(
                _hours_partial, batch_format="pyarrow", batch_size=None
            ),
            ["h"],
            [("n", "sum")],
            num_buckets=4,
        ).to_pandas()["h"].to_numpy()
    )
    hours_ref = ray.put(hours)
    HOUR_US = 3_600_000_000

    def _expand(tbl: pa.Table) -> pa.Table:
        hset = ray.get(hours_ref)
        h = tbl.column("h").to_numpy()
        u = tbl.column("user_id").to_numpy()
        w = np.repeat(h, 24) + np.tile(
            np.arange(24, dtype=np.int64) * HOUR_US, len(h)
        )
        uu = np.repeat(u, 24)
        pos = np.searchsorted(hset, w)
        keep = (pos < len(hset)) & (
            hset[np.minimum(pos, len(hset) - 1)] == w
        ) if len(hset) else np.zeros(len(w), bool)
        t = pa.table(
            {
                "w": pa.array(w[keep]),
                "user_id": pa.array(uu[keep]),
                "n": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        )
        return group_aggregate_table(t, ["w", "user_id"], [("n", "sum")])

    wpairs = hash_grouped_aggregate(
        pairs.map_batches(
            _expand, batch_format="pyarrow", batch_size=None
        ),
        ["w", "user_id"],
        [("n", "sum")],
        num_buckets=8,
    )

    def _count(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "w": tbl.column("w"),
                "n_users": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["w"], [("n_users", "sum")])

    out = hash_grouped_aggregate(
        wpairs.map_batches(
            _count, batch_format="pyarrow", batch_size=None
        ),
        ["w"],
        [("n_users", "sum")],
        num_buckets=8,
    )

    def _final(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": tbl.column("w").cast(pa.timestamp("us")),
                "n_users": tbl.column("n_users"),
            }
        )

    return out.map_batches(_final, batch_format="pyarrow")


QUERIES["sliding_active_users"] = q_sliding_active_users
ORACLE_SQL["sliding_active_users"] = """
WITH hu AS (
  SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events
), hours AS (
  SELECT DISTINCT h FROM hu
)
SELECT hours.h AS hour,
  CAST(count(DISTINCT hu.user_id) AS BIGINT) AS n_users
FROM hours JOIN hu
  ON hu.h BETWEEN hours.h - INTERVAL 23 HOUR AND hours.h
GROUP BY hours.h
""".strip()


_ATTR_WINDOW_US = 7 * 86_400_000_000  # 7 days


def q_attribution_first_touch(sf_dir: str):
    """First-touch attribution: every purchase attributed to the
    user's EARLIEST view within the trailing 7 days (ties on ts break
    to the smaller event_id), NULL when no view qualifies. One
    user-keyed exchange; inside each user group the kernel is two
    sorted arrays + one searchsorted — the per-key ordered sweep that
    generalizes the as-of join to windowed semantics."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_grouped_map

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def _narrow(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(
            tbl.column("event_type"),
            value_set=pa.array(["view", "purchase"]),
        )
        t = tbl.filter(keep)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts": t.column("ts").cast(pa.int64()),
                "is_view": pc.equal(
                    t.column("event_type"), "view"
                ),
            }
        )

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("first_view_id", pa.int64())]
    )

    def _attr(group: pa.Table) -> pa.Table:
        isv = group.column("is_view").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy()
        eid = group.column("event_id").to_numpy()
        v_ts, v_id = ts[isv], eid[isv]
        o = np.lexsort((v_id, v_ts))
        v_ts, v_id = v_ts[o], v_id[o]
        p_ts, p_id = ts[~isv], eid[~isv]
        if len(p_ts) == 0:
            return out_schema.empty_table()
        if len(v_ts):
            lo = np.searchsorted(
                v_ts, p_ts - _ATTR_WINDOW_US, side="left"
            )
            safe = np.minimum(lo, len(v_ts) - 1)
            ok = (lo < len(v_ts)) & (v_ts[safe] <= p_ts)
            cand = v_id[safe]
        else:
            ok = np.zeros(len(p_ts), bool)
            cand = np.zeros(len(p_ts), np.int64)
        return pa.table(
            {
                "event_id": pa.array(p_id.astype(np.int64)),
                "first_view_id": pa.array(
                    np.where(ok, cand, 0).astype(np.int64), mask=~ok
                ),
            }
        )

    return hash_grouped_map(
        ev.map_batches(_narrow, batch_format="pyarrow",
                       batch_size=None),
        "user_id",
        _attr,
        num_partitions=16,
        empty_schema=out_schema,
    )


QUERIES["attribution_first_touch"] = q_attribution_first_touch
ORACLE_SQL["attribution_first_touch"] = """
SELECT p.event_id,
  (SELECT v.event_id FROM events v
   WHERE v.user_id = p.user_id AND v.event_type = 'view'
     AND v.ts BETWEEN p.ts - INTERVAL 7 DAY AND p.ts
   ORDER BY v.ts, v.event_id LIMIT 1) AS first_view_id
FROM events p WHERE p.event_type = 'purchase'
""".strip()


_SKIP_K = 3


def q_skip_bigrams(sf_dir: str):
    """Gap-constrained sequence mining: corpus-wide counts of ordered
    event-type pairs (a, b) where b occurs 1..3 positions after a in
    the same user's (ts, event_id)-ordered stream — the skip-gram
    generalization of adjacent transitions (event_transitions covers
    gap==1). One user-keyed exchange; the kernel emits per-group count
    partials from shifted-slice comparisons (no pair materialization
    beyond the group), then the standard tiny pair aggregation."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_grouped_map
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def _narrow(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "event_id": tbl.column("event_id"),
                "ts": tbl.column("ts").cast(pa.int64()),
                "event_type": tbl.column("event_type"),
            }
        )

    pair_schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()),
         ("n", pa.int64())]
    )

    def _pairs(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy()
        eid = group.column("event_id").to_numpy()
        o = np.lexsort((eid, ts))
        et = group.column("event_type").to_pandas().to_numpy()[o]
        if len(et) < 2:
            return pair_schema.empty_table()
        a_all, b_all = [], []
        for g in range(1, _SKIP_K + 1):
            if len(et) > g:
                a_all.append(et[:-g])
                b_all.append(et[g:])
        a = np.concatenate(a_all)
        b = np.concatenate(b_all)
        t = pa.table(
            {
                "type_a": pa.array(a.astype(object), pa.string()),
                "type_b": pa.array(b.astype(object), pa.string()),
                "n": pa.array(np.ones(len(a), np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["type_a", "type_b"], [("n", "sum")]
        )

    partials = hash_grouped_map(
        ev.map_batches(_narrow, batch_format="pyarrow",
                       batch_size=None),
        "user_id",
        _pairs,
        num_partitions=16,
        empty_schema=pair_schema,
        min_group_size=2,
    )
    return hash_grouped_aggregate(
        partials, ["type_a", "type_b"], [("n", "sum")], num_buckets=4
    )


QUERIES["skip_bigrams"] = q_skip_bigrams
ORACLE_SQL["skip_bigrams"] = f"""
WITH r AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
  CAST(count(*) AS BIGINT) AS n
FROM r a JOIN r b
  ON a.user_id = b.user_id AND b.rn - a.rn BETWEEN 1 AND {_SKIP_K}
GROUP BY 1, 2
""".strip()


def q_incremental_agg_maintenance(sf_dir: str):
    """Materialized-view maintenance: the per-type event aggregate is
    PERSISTED from the base partition (event_id % 10 != 0) as a
    partial-aggregate parquet, then refreshed by merging ONLY the
    delta partition's partials — the base is never re-scanned. The
    oracle aggregates the whole table, so the gate proves
    merge(agg(base), agg(delta)) == agg(base ∪ delta) end-to-end,
    including the disk round-trip. Money math: integer micro-units
    via floor(value*1e6 + 0.5) on both sides, summed exactly."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ev = _events(sf_dir, ["event_id", "event_type", "value"])

    def _split(delta: bool):
        def _f(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # (event_id % 10 == 0) in integer Arrow: id - (id//10)*10
            m = pc.equal(
                pc.subtract(
                    tbl.column("event_id"),
                    pc.multiply(
                        pc.divide(tbl.column("event_id"), 10), 10
                    ),
                ),
                0,
            )
            t = tbl.filter(m if delta else pc.invert(m))
            v = t.column("value").to_numpy(zero_copy_only=False)
            micro = np.floor(v * 1e6 + 0.5).astype(np.int64)
            p = pa.table(
                {
                    "event_type": t.column("event_type"),
                    "n_events": pa.array(
                        np.ones(t.num_rows, np.int64)
                    ),
                    "sum_micro": pa.array(micro),
                }
            )
            return group_aggregate_table(
                p, ["event_type"],
                [("n_events", "sum"), ("sum_micro", "sum")],
            )

        return _f

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    view_path = os.path.join(
        "/tmp/graft_matview", tag, "per_type.parquet"
    )
    os.makedirs(os.path.dirname(view_path), exist_ok=True)

    base_agg = hash_grouped_aggregate(
        ev.map_batches(_split(False), batch_format="pyarrow",
                       batch_size=None),
        ["event_type"],
        [("n_events", "sum"), ("sum_micro", "sum")],
        num_buckets=4,
    ).to_pandas()
    tmp = view_path + ".tmp"
    pq.write_table(pa.Table.from_pandas(base_agg,
                                        preserve_index=False), tmp)
    os.replace(tmp, view_path)  # atomic publish, idempotent rerun

    # refresh: stored view partials ∪ delta partials → merged view
    import ray.data as rd

    stored = rd.from_arrow(pq.read_table(view_path))
    delta = ev.map_batches(_split(True), batch_format="pyarrow",
                           batch_size=None)
    return hash_grouped_aggregate(
        stored.union(delta),
        ["event_type"],
        [("n_events", "sum"), ("sum_micro", "sum")],
        num_buckets=4,
    )


QUERIES["incremental_agg_maintenance"] = q_incremental_agg_maintenance
ORACLE_SQL["incremental_agg_maintenance"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
    AS sum_micro
FROM events GROUP BY event_type
""".strip()


# time-based split with an embargo gap (leakage hygiene for temporal
# models: trailing-window features computed at train time must not see
# test-period rows; the gap absorbs the window length)
_EMB_TRAIN_END = "2024-01-23"
_EMB_TEST_START = "2024-01-25"


def q_temporal_embargo_split(sf_dir: str):
    """Temporal train/test split with a 2-day embargo: events before
    {a} train, events from {b} test, the gap excluded — per
    (split, event_type) exact event and DISTINCT-user counts. The
    usual partial-distinct shape: (split, type, user) partials
    collapse in-batch, one exchange, final per-(split, type)
    reduction.""".format(a=_EMB_TRAIN_END, b=_EMB_TEST_START)
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    t_end = np.int64(
        pd.Timestamp(_EMB_TRAIN_END).value // 1000
    )  # µs
    t_start = np.int64(pd.Timestamp(_EMB_TEST_START).value // 1000)

    ev = _events(sf_dir, ["ts", "user_id", "event_type"])

    def _partial(tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        split = np.where(
            ts < t_end, "train", np.where(ts >= t_start, "test",
                                          "embargo")
        )
        t = pa.table(
            {
                "split": pa.array(split.astype(object), pa.string()),
                "event_type": tbl.column("event_type"),
                "user_id": tbl.column("user_id"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["split", "event_type", "user_id"], [("n", "sum")]
        )

    per_user = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow",
                       batch_size=None),
        ["split", "event_type", "user_id"],
        [("n", "sum")],
        num_buckets=8,
    )

    def _final_partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "split": tbl.column("split"),
                "event_type": tbl.column("event_type"),
                "n_events": tbl.column("n"),
                "n_users": pa.array(
                    np.ones(tbl.num_rows, np.int64)
                ),
            }
        )
        return group_aggregate_table(
            t, ["split", "event_type"],
            [("n_events", "sum"), ("n_users", "sum")],
        )

    return hash_grouped_aggregate(
        per_user.map_batches(_final_partial, batch_format="pyarrow",
                             batch_size=None),
        ["split", "event_type"],
        [("n_events", "sum"), ("n_users", "sum")],
        num_buckets=4,
    )


QUERIES["temporal_embargo_split"] = q_temporal_embargo_split
ORACLE_SQL["temporal_embargo_split"] = f"""
WITH s AS (
  SELECT CASE WHEN ts < TIMESTAMP '{_EMB_TRAIN_END}' THEN 'train'
              WHEN ts >= TIMESTAMP '{_EMB_TEST_START}' THEN 'test'
              ELSE 'embargo' END AS split,
    event_type, user_id
  FROM events
)
SELECT split, event_type, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM s GROUP BY 1, 2
""".strip()


def q_ab_experiment_summary(sf_dir: str):
    """Experiment-analysis primitive: users deterministically hashed
    into two arms (splitmix64(user_id) % 2 — the engine/SQL-identical
    assignment chain), then per-arm exposure/conversion accounting:
    distinct users, users with >= 1 view, users with >= 1 purchase,
    total purchase value (integer micro-units), and the
    converting/exposed ratio as one exact-integer division. Per-user
    flags collapse in-batch, one user exchange, a 2-row final."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import rehash64
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ev = _events(sf_dir, ["user_id", "event_type", "value"])

    def _per_user_partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        isv = pc.equal(tbl.column("event_type"), "view").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        isp = pc.equal(
            tbl.column("event_type"), "purchase"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        micro = np.floor(v * 1e6 + 0.5).astype(np.int64) * isp
        t = pa.table(
            {
                "user_id": tbl.column("user_id"),
                "n_view": pa.array(isv),
                "n_buy": pa.array(isp),
                "buy_micro": pa.array(micro),
            }
        )
        return group_aggregate_table(
            t, ["user_id"],
            [("n_view", "sum"), ("n_buy", "sum"),
             ("buy_micro", "sum")],
        )

    per_user = hash_grouped_aggregate(
        ev.map_batches(_per_user_partial, batch_format="pyarrow",
                       batch_size=None),
        ["user_id"],
        [("n_view", "sum"), ("n_buy", "sum"), ("buy_micro", "sum")],
        num_buckets=8,
    )

    def _arm_partial(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy().astype(np.uint64)
        arm = (rehash64(u, 0) % np.uint64(2)).astype(np.int64)
        nv = tbl.column("n_view").to_numpy()
        nb = tbl.column("n_buy").to_numpy()
        t = pa.table(
            {
                "arm": pa.array(arm),
                "n_users": pa.array(
                    np.ones(tbl.num_rows, np.int64)
                ),
                "n_viewers": pa.array((nv > 0).astype(np.int64)),
                "n_buyers": pa.array((nb > 0).astype(np.int64)),
                "buy_micro": tbl.column("buy_micro"),
            }
        )
        return group_aggregate_table(
            t, ["arm"],
            [("n_users", "sum"), ("n_viewers", "sum"),
             ("n_buyers", "sum"), ("buy_micro", "sum")],
        )

    agg = hash_grouped_aggregate(
        per_user.map_batches(_arm_partial, batch_format="pyarrow",
                             batch_size=None),
        ["arm"],
        [("n_users", "sum"), ("n_viewers", "sum"),
         ("n_buyers", "sum"), ("buy_micro", "sum")],
        num_buckets=2,
    ).to_pandas()
    agg["conversion"] = (
        agg["n_buyers"].astype("float64")
        / agg["n_users"].astype("float64")
    )
    return agg.sort_values("arm").reset_index(drop=True)


def _ab_sql() -> str:
    from .text_queries import _splitmix_mulmod

    chain = f"""
u1 AS (SELECT user_id, xor(x, x >> 30) AS x FROM u0
), u2 AS (SELECT user_id, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM u1
), u3 AS (SELECT user_id, xor(x, x >> 27) AS x FROM u2
), u4 AS (SELECT user_id, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM u3
), u5 AS (SELECT user_id, xor(x, x >> 31) AS x FROM u4
)"""
    return f"""
WITH pu AS (
  SELECT user_id,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      AS BIGINT) AS n_view,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      AS BIGINT) AS n_buy,
    CAST(sum(CASE WHEN event_type = 'purchase'
      THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
      AS BIGINT) AS buy_micro
  FROM events GROUP BY 1
), u0 AS (
  SELECT user_id, CAST(user_id AS UBIGINT) AS x FROM pu
), {chain}, arms AS (
  SELECT pu.user_id, CAST(u5.x % 2 AS BIGINT) AS arm,
    pu.n_view, pu.n_buy, pu.buy_micro
  FROM pu JOIN u5 USING (user_id)
)
SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(CASE WHEN n_view > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_viewers,
  CAST(sum(CASE WHEN n_buy > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_buyers,
  CAST(sum(buy_micro) AS BIGINT) AS buy_micro,
  CAST(sum(CASE WHEN n_buy > 0 THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*) AS conversion
FROM arms GROUP BY arm
""".strip()


QUERIES["ab_experiment_summary"] = q_ab_experiment_summary
ORACLE_SQL["ab_experiment_summary"] = _ab_sql()


_PATH_LEN = 3


def q_session_paths(sf_dir: str):
    """Path analysis: each user's first-{k} event-type prefix (ordered
    by ts, event_id), counted corpus-wide — the entry-path summary
    behind onboarding funnels. Per-user grouped kernel emits one
    path partial per user; only |distinct paths| rows aggregate
    (≤ |types|^{k}, a bounded domain).""".format(k=_PATH_LEN)
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_grouped_map
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def _narrow(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "event_id": tbl.column("event_id"),
                "ts": tbl.column("ts").cast(pa.int64()),
                "event_type": tbl.column("event_type"),
            }
        )

    path_schema = pa.schema(
        [("path", pa.string()), ("n", pa.int64())]
    )

    def _path(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy()
        eid = group.column("event_id").to_numpy()
        o = np.lexsort((eid, ts))[:_PATH_LEN]
        et = group.column("event_type").to_pandas().to_numpy()[o]
        return pa.table(
            {
                "path": pa.array([">".join(et)], pa.string()),
                "n": pa.array([1], pa.int64()),
            }
        )

    partials = hash_grouped_map(
        ev.map_batches(_narrow, batch_format="pyarrow",
                       batch_size=None),
        "user_id",
        _path,
        num_partitions=16,
        empty_schema=path_schema,
    )
    return hash_grouped_aggregate(
        partials, ["path"], [("n", "sum")], num_buckets=4
    )


QUERIES["session_paths"] = q_session_paths
ORACLE_SQL["session_paths"] = f"""
WITH r AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
  FROM events
), p AS (
  SELECT user_id,
    string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {_PATH_LEN} GROUP BY user_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY path
""".strip()


def q_time_rollup_multi(sf_dir: str):
    """Multi-granularity time rollup from ONE corpus pass: hour
    partials aggregate once, then day and week derive from the HOUR
    table (bounded: one row per hour), not the events — the
    aggregation-tree shape that makes N dashboard grains cost one
    scan. Integer micro-unit money; week = date_trunc('week') (ISO
    Monday), all three grains in one output."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ev = _events(sf_dir, ["ts", "value"])

    def _hour_partial(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "hour": pc.floor_temporal(
                    tbl.column("ts"), unit="hour"
                ).cast(pa.int64()),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
                "sum_micro": pa.array(
                    np.floor(v * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )
        return group_aggregate_table(
            t, ["hour"], [("n", "sum"), ("sum_micro", "sum")]
        )

    hours = hash_grouped_aggregate(
        ev.map_batches(_hour_partial, batch_format="pyarrow",
                       batch_size=None),
        ["hour"],
        [("n", "sum"), ("sum_micro", "sum")],
        num_buckets=4,
    ).to_pandas()

    h = pd.to_datetime(hours["hour"], unit="us")
    out = []
    for grain, bucket in (
        ("hour", h),
        ("day", h.dt.floor("D")),
        ("week", (h - pd.to_timedelta(h.dt.dayofweek, unit="D"))
         .dt.floor("D")),
    ):
        g = (
            hours.assign(bucket=bucket)
            .groupby("bucket", as_index=False)[["n", "sum_micro"]]
            .sum()
        )
        g.insert(0, "grain", grain)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["n"] = res["n"].astype("int64")
    res["sum_micro"] = res["sum_micro"].astype("int64")
    return res.sort_values(["grain", "bucket"]).reset_index(drop=True)


QUERIES["time_rollup_multi"] = q_time_rollup_multi
ORACLE_SQL["time_rollup_multi"] = """
SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
    AS sum_micro
FROM events GROUP BY 2
UNION ALL
SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
  CAST(count(*) AS BIGINT),
  CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
FROM events GROUP BY 2
UNION ALL
SELECT 'week', CAST(date_trunc('week', ts) AS TIMESTAMP),
  CAST(count(*) AS BIGINT),
  CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
FROM events GROUP BY 2
""".strip()


def q_daily_latest_event(sf_dir: str):
    """Latest-record-per-key-per-window: each user's LAST event of
    every active day (max ts, ties to the larger event_id) — the
    windowed dedup that turns an event log into a daily state table.
    One (user, day) grouped kernel, vectorized argmax per group."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.exchange import hash_grouped_map

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def _narrow(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "day": pc.floor_temporal(
                    tbl.column("ts"), unit="day"
                ).cast(pa.int64()),
                "ts": tbl.column("ts").cast(pa.int64()),
                "event_id": tbl.column("event_id"),
                "event_type": tbl.column("event_type"),
            }
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("day", pa.timestamp("us")),
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
        ]
    )

    def _latest(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy()
        eid = group.column("event_id").to_numpy()
        i = int(np.lexsort((eid, ts))[-1])
        # take COPIES (the exchange contract: never return raw slices
        # — pickling a slice ships the whole parent buffer)
        row = group.take(pa.array([i]))
        return pa.table(
            {
                "user_id": row.column("user_id").cast(pa.int64()),
                "day": row.column("day").cast(pa.timestamp("us")),
                "event_id": row.column("event_id").cast(pa.int64()),
                "event_type": row.column("event_type"),
            }
        )

    return hash_grouped_map(
        ev.map_batches(_narrow, batch_format="pyarrow",
                       batch_size=None),
        ["user_id", "day"],
        _latest,
        num_partitions=16,
        empty_schema=out_schema,
    )


QUERIES["daily_latest_event"] = q_daily_latest_event
ORACLE_SQL["daily_latest_event"] = """
WITH r AS (
  SELECT user_id, date_trunc('day', ts) AS day, event_id, event_type,
    row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, day, event_id, event_type FROM r WHERE rn = 1
""".strip()


def q_lifecycle_violations(sf_dir: str):
    """Sequence-validity audit: users whose first purchase precedes
    their first signup, or who purchase without ever signing up — the
    lifecycle invariant an event pipeline must hold. Per-user min
    timestamps fold as mergeable MIN partials (missing event kinds
    ride as a +inf sentinel, never a null); one row out."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    SENT = np.int64(2**62)
    ev = _events(sf_dir, ["ts", "user_id", "event_type"])

    def _partial(tbl: pa.Table) -> pa.Table:
        keep = pc.is_in(
            tbl.column("event_type"),
            value_set=pa.array(["signup", "purchase"]),
        )
        t = tbl.filter(keep)
        ts = t.column("ts").cast(pa.int64()).to_numpy()
        issu = pc.equal(t.column("event_type"), "signup").to_numpy(
            zero_copy_only=False
        )
        p = pa.table(
            {
                "user_id": t.column("user_id"),
                "first_signup": pa.array(np.where(issu, ts, SENT)),
                "first_buy": pa.array(np.where(~issu, ts, SENT)),
            }
        )
        return group_aggregate_table(
            p, ["user_id"],
            [("first_signup", "min"), ("first_buy", "min")],
        )

    pu = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow",
                       batch_size=None),
        ["user_id"],
        [("first_signup", "min"), ("first_buy", "min")],
        num_buckets=8,
    ).to_pandas()
    fs = pu["first_signup"].to_numpy()
    fb = pu["first_buy"].to_numpy()
    buyers = fb < SENT
    viol = buyers & (fb < fs)  # covers never-signed-up (fs == SENT)
    return pd.DataFrame(
        {
            "n_users_checked": [int(len(pu))],
            "n_buyers": [int(buyers.sum())],
            "n_violations": [int(viol.sum())],
        }
    )


QUERIES["lifecycle_violations"] = q_lifecycle_violations
ORACLE_SQL["lifecycle_violations"] = """
WITH pu AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'signup' THEN ts END) AS fs,
    min(CASE WHEN event_type = 'purchase' THEN ts END) AS fb
  FROM events WHERE event_type IN ('signup', 'purchase')
  GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users_checked,
  CAST(count(fb) AS BIGINT) AS n_buyers,
  CAST(sum(CASE WHEN fb IS NOT NULL
                 AND (fs IS NULL OR fb < fs) THEN 1 ELSE 0 END)
    AS BIGINT) AS n_violations
FROM pu
""".strip()


def q_interval_coverage(sf_dir: str):
    """Interval-union coverage (sweep-line): per day, the total
    seconds covered by the union of 120-second error windows and the
    count of merged maximal intervals — overlap collapses, the
    statistic a naive sum-of-windows gets wrong. Windows clip at day
    boundaries (both sides), so a per-day grouped kernel holds every
    interval it needs; inside the group one sort + running-max sweep,
    all integer µs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.exchange import hash_grouped_map

    WIN = 120_000_000
    DAY = 86_400_000_000
    ev = _events(sf_dir, ["ts", "event_type"])

    def _wins(tbl: pa.Table) -> pa.Table:
        e = tbl.filter(pc.equal(tbl.column("event_type"), "error"))
        ts = e.column("ts").cast(pa.int64()).to_numpy()
        s, t = ts, ts + WIN
        # split windows at day boundaries (a window spans <= 2 days)
        day1 = (s // DAY) * DAY
        end1 = np.minimum(t, day1 + DAY)
        out_day = [day1]
        out_s = [s]
        out_e = [end1]
        spill = t > day1 + DAY
        out_day.append(day1[spill] + DAY)
        out_s.append(day1[spill] + DAY)
        out_e.append(t[spill])
        return pa.table(
            {
                "day": pa.array(np.concatenate(out_day)),
                "s": pa.array(np.concatenate(out_s)),
                "e": pa.array(np.concatenate(out_e)),
            }
        )

    out_schema = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("covered_sec", pa.int64()),
            ("n_intervals", pa.int64()),
        ]
    )

    def _sweep(group: pa.Table) -> pa.Table:
        s = group.column("s").to_numpy()
        e = group.column("e").to_numpy()
        o = np.argsort(s, kind="stable")
        s, e = s[o], e[o]
        run_max = np.maximum.accumulate(e)
        new = np.empty(len(s), bool)
        new[0] = True
        new[1:] = s[1:] > run_max[:-1]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(s)]
        seg_end = run_max[ends - 1]
        covered = int((seg_end - s[starts]).sum())
        return pa.table(
            {
                "day": pa.array(
                    [int(group.column("day")[0].as_py())],
                    pa.int64(),
                ).cast(pa.timestamp("us")),
                "covered_sec": pa.array(
                    [covered // 1_000_000], pa.int64()
                ),
                "n_intervals": pa.array(
                    [len(starts)], pa.int64()
                ),
            }
        )

    return hash_grouped_map(
        ev.map_batches(_wins, batch_format="pyarrow",
                       batch_size=None),
        "day",
        _sweep,
        num_partitions=8,
        empty_schema=out_schema,
    )


QUERIES["interval_coverage"] = q_interval_coverage
ORACLE_SQL["interval_coverage"] = """
WITH w AS (
  SELECT epoch_us(ts) AS s, epoch_us(ts) + 120000000 AS e
  FROM events WHERE event_type = 'error'
), split AS (
  SELECT (s // 86400000000) * 86400000000 AS day, s,
    least(e, (s // 86400000000) * 86400000000 + 86400000000) AS e
  FROM w
  UNION ALL
  SELECT (s // 86400000000) * 86400000000 + 86400000000,
    (s // 86400000000) * 86400000000 + 86400000000, e
  FROM w WHERE e > (s // 86400000000) * 86400000000 + 86400000000
), r AS (
  SELECT day, s, e,
    max(e) OVER (PARTITION BY day ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM split
), isl AS (
  SELECT day, s, e,
    CAST(sum(CASE WHEN prev_max IS NULL OR s > prev_max
                  THEN 1 ELSE 0 END)
      OVER (PARTITION BY day ORDER BY s, e) AS BIGINT) AS island
  FROM r
), seg AS (
  SELECT day, island, min(s) AS ss, max(e) AS ee
  FROM isl GROUP BY 1, 2
)
SELECT CAST(to_timestamp(day / 1000000) AS TIMESTAMP) AS day,
  CAST(sum(ee - ss) // 1000000 AS BIGINT) AS covered_sec,
  CAST(count(*) AS BIGINT) AS n_intervals
FROM seg GROUP BY 1
""".strip()


def q_wow_change(sf_dir: str):
    """Week-over-week change per event type: weekly counts + integer
    micro-unit sums from one corpus pass, then lag/diff on the
    BOUNDED (type, week) table — the period-over-period report.
    Missing previous week surfaces as typed nulls (SQL lag
    semantics)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def _partial(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": tbl.column("event_type"),
                "week": pc.floor_temporal(
                    tbl.column("ts"), unit="week"
                ).cast(pa.int64()),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
                "sum_micro": pa.array(
                    np.floor(v * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )
        return group_aggregate_table(
            t, ["event_type", "week"],
            [("n", "sum"), ("sum_micro", "sum")],
        )

    agg = (
        hash_grouped_aggregate(
            ev.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None),
            ["event_type", "week"],
            [("n", "sum"), ("sum_micro", "sum")],
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["event_type", "week"])
        .reset_index(drop=True)
    )
    g = agg.groupby("event_type")
    # float64-with-NaN, matching DuckDB's nullable-BIGINT .df()
    # rendering (the same dtype every Arrow nullable-int query yields)
    agg["prev_n"] = g["n"].shift(1).astype("float64")
    agg["n_change"] = (agg["n"] - agg["prev_n"]).astype("float64")
    agg["week"] = pd.to_datetime(agg["week"], unit="us")
    agg["n"] = agg["n"].astype("int64")
    agg["sum_micro"] = agg["sum_micro"].astype("int64")
    return agg.reset_index(drop=True)


QUERIES["wow_change"] = q_wow_change
ORACLE_SQL["wow_change"] = """
WITH w AS (
  SELECT event_type,
    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
      AS sum_micro
  FROM events GROUP BY 1, 2
)
SELECT event_type, week, n, sum_micro,
  lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
  n - lag(n) OVER (PARTITION BY event_type ORDER BY week)
    AS n_change
FROM w
""".strip()


_SESS_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def q_bounce_rate_daily(sf_dir: str):
    """Web-analytics sessionization on the raw event stream: 30-min
    gap sessions per user, then per DAY of session start: sessions,
    single-event (bounce) sessions, and the bounce rate (one exact
    division). Session detection is a vectorized gap compare inside
    the user exchange; only per-day count partials leave."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_grouped_map
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ev = _events(sf_dir, ["event_id", "ts", "user_id"])

    def _narrow(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "ts": tbl.column("ts").cast(pa.int64()),
                "event_id": tbl.column("event_id"),
            }
        )

    part_schema = pa.schema(
        [
            ("day", pa.int64()),
            ("n_sessions", pa.int64()),
            ("n_bounces", pa.int64()),
        ]
    )
    DAY = 86_400_000_000

    def _sessions(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy()
        eid = group.column("event_id").to_numpy()
        o = np.lexsort((eid, ts))
        ts = ts[o]
        n = len(ts)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (ts[1:] - ts[:-1]) > _SESS_GAP_US
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, n])
        day = (ts[starts] // DAY) * DAY
        t = pa.table(
            {
                "day": pa.array(day),
                "n_sessions": pa.array(
                    np.ones(len(starts), np.int64)
                ),
                "n_bounces": pa.array(
                    (lens == 1).astype(np.int64)
                ),
            }
        )
        return group_aggregate_table(
            t, ["day"], [("n_sessions", "sum"), ("n_bounces", "sum")]
        )

    agg = hash_grouped_aggregate(
        hash_grouped_map(
            ev.map_batches(_narrow, batch_format="pyarrow",
                           batch_size=None),
            "user_id",
            _sessions,
            num_partitions=16,
            empty_schema=part_schema,
        ),
        ["day"],
        [("n_sessions", "sum"), ("n_bounces", "sum")],
        num_buckets=4,
    ).to_pandas()
    import pandas as pd

    agg["day"] = pd.to_datetime(agg["day"], unit="us")
    agg["bounce_rate"] = (
        agg["n_bounces"].astype("float64")
        / agg["n_sessions"].astype("float64")
    )
    return agg.sort_values("day").reset_index(drop=True)


QUERIES["bounce_rate_daily"] = q_bounce_rate_daily
ORACLE_SQL["bounce_rate_daily"] = f"""
WITH r AS (
  SELECT user_id, ts,
    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
           > {_SESS_GAP_US}
           OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM r
), sess AS (
  SELECT user_id, sid,
    CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS day,
    CAST(count(*) AS BIGINT) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_bounces,
  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*) AS bounce_rate
FROM sess GROUP BY day
""".strip()


_COLD_WINDOW_US = 7 * 86_400_000_000


def q_cold_start_profile(sf_dir: str):
    """Entity-bootstrap features: each user's activity profile in
    their FIRST 7 days (relative to their own first event) — events,
    active days, purchases, integer-micro purchase value. The
    per-user relative window needs the user's min ts co-located with
    their events: one user exchange, then a vectorized window filter;
    only the per-user feature row leaves."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.exchange import hash_grouped_map

    ev = _events(sf_dir, ["ts", "user_id", "event_type", "value"])

    def _narrow(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "ts": tbl.column("ts").cast(pa.int64()),
                "is_buy": pc.equal(
                    tbl.column("event_type"), "purchase"
                ),
                "micro": pa.array(
                    np.floor(v * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_events_7d", pa.int64()),
            ("n_active_days_7d", pa.int64()),
            ("n_purchases_7d", pa.int64()),
            ("buy_micro_7d", pa.int64()),
        ]
    )
    DAY = 86_400_000_000

    def _profile(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy()
        t0 = ts.min()
        sel = ts < t0 + _COLD_WINDOW_US
        buy = group.column("is_buy").to_numpy(
            zero_copy_only=False
        )[sel]
        micro = group.column("micro").to_numpy()[sel]
        days = np.unique(ts[sel] // DAY)
        return pa.table(
            {
                "user_id": pa.array(
                    [int(group.column("user_id")[0].as_py())],
                    pa.int64(),
                ),
                "n_events_7d": pa.array(
                    [int(sel.sum())], pa.int64()
                ),
                "n_active_days_7d": pa.array(
                    [len(days)], pa.int64()
                ),
                "n_purchases_7d": pa.array(
                    [int(buy.sum())], pa.int64()
                ),
                "buy_micro_7d": pa.array(
                    [int(micro[buy].sum())], pa.int64()
                ),
            }
        )

    return hash_grouped_map(
        ev.map_batches(_narrow, batch_format="pyarrow",
                       batch_size=None),
        "user_id",
        _profile,
        num_partitions=16,
        empty_schema=out_schema,
    )


QUERIES["cold_start_profile"] = q_cold_start_profile
ORACLE_SQL["cold_start_profile"] = f"""
WITH f AS (
  SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1
), w AS (
  SELECT e.user_id, e.ts, e.event_type, e.value
  FROM events e JOIN f USING (user_id)
  WHERE epoch_us(e.ts) < epoch_us(f.t0) + {_COLD_WINDOW_US}
)
SELECT CAST(user_id AS BIGINT) AS user_id,
  CAST(count(*) AS BIGINT) AS n_events_7d,
  CAST(count(DISTINCT epoch_us(ts) // 86400000000) AS BIGINT)
    AS n_active_days_7d,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
    AS BIGINT) AS n_purchases_7d,
  CAST(sum(CASE WHEN event_type = 'purchase'
    THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
    AS BIGINT) AS buy_micro_7d
FROM w GROUP BY user_id
""".strip()


_TIER_W = 10  # events per activity tier


def q_activity_tier_transitions(sf_dir: str):
    """User-lifecycle mobility: each user's activity tier
    (event count // {w}) in the first vs second half of the month,
    and the tier-pair transition counts — the churn/engagement
    transition matrix. Per-user half counts fold as mergeable sums in
    one exchange; the transition matrix is a bounded second
    aggregation.""".format(w=_TIER_W)
    import numpy as np
    import pyarrow as pa

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    SPLIT_US = 1_705_276_800_000_000  # 2024-01-15
    ev = _events(sf_dir, ["ts", "user_id"])

    def _partial(tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        late = (ts >= SPLIT_US).astype(np.int64)
        t = pa.table(
            {
                "user_id": tbl.column("user_id"),
                "n1": pa.array(1 - late),
                "n2": pa.array(late),
            }
        )
        return group_aggregate_table(
            t, ["user_id"], [("n1", "sum"), ("n2", "sum")]
        )

    pu = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow",
                       batch_size=None),
        ["user_id"],
        [("n1", "sum"), ("n2", "sum")],
        num_buckets=8,
    )

    def _tiers(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "tier_h1": pa.array(
                    tbl.column("n1").to_numpy() // _TIER_W
                ),
                "tier_h2": pa.array(
                    tbl.column("n2").to_numpy() // _TIER_W
                ),
                "n_users": pa.array(
                    np.ones(tbl.num_rows, np.int64)
                ),
            }
        )
        return group_aggregate_table(
            t, ["tier_h1", "tier_h2"], [("n_users", "sum")]
        )

    return hash_grouped_aggregate(
        pu.map_batches(_tiers, batch_format="pyarrow",
                       batch_size=None),
        ["tier_h1", "tier_h2"],
        [("n_users", "sum")],
        num_buckets=2,
    )


QUERIES["activity_tier_transitions"] = q_activity_tier_transitions
ORACLE_SQL["activity_tier_transitions"] = f"""
WITH pu AS (
  SELECT user_id,
    CAST(sum(CASE WHEN epoch_us(ts) < 1705276800000000
             THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN epoch_us(ts) >= 1705276800000000
             THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM events GROUP BY 1
)
SELECT n1 // {_TIER_W} AS tier_h1, n2 // {_TIER_W} AS tier_h2,
  CAST(count(*) AS BIGINT) AS n_users
FROM pu GROUP BY 1, 2
""".strip()
