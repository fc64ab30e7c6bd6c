"""Distributed-statistics suite: grouped z-score, moment-based
correlation/OLS, fixed-width histogram, additive rollup.

Float parity policy (CLAUDE.md): integer sums only (exact, mergeable),
Python-int combination on the driver (no global overflow), and final
IEEE expressions whose token order mirrors the oracle SQL exactly.
``floor()`` — not ``round()`` — converts prices to whole dollars, since
np.floor and SQL floor agree bit-for-bit while round's half-way rule
differs between numpy (half-even) and DuckDB (half-away).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..stages.stats import (
    corr_ols_from_moments,
    fixed_width_histogram,
    grouped_moment_partials,
    grouped_zscore,
    rollup_counts,
)


def _lineitem(sf_dir: str, columns):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "lineitem.parquet"), columns=columns
    )


def _qty(tbl: pa.Table) -> np.ndarray:
    return tbl.column("l_quantity").to_numpy().astype(np.int64)


def _floor_dollars(tbl: pa.Table) -> np.ndarray:
    return np.floor(tbl.column("l_extendedprice").to_numpy()).astype(np.int64)


def q_quantity_zscore(sf_dir: str):
    """Per-row population z-score of quantity within its return-flag
    group — the grouped-normalization primitive of a feature pipeline
    (two passes: tiny exact group moments broadcast, then streaming)."""
    ds = _lineitem(
        sf_dir,
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"],
    )

    def _cast(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": tbl.column("l_orderkey").cast(pa.int64()),
                "l_linenumber": tbl.column("l_linenumber").cast(pa.int64()),
                "l_returnflag": tbl.column("l_returnflag"),
                "l_quantity": tbl.column("l_quantity"),
            }
        )

    return grouped_zscore(
        ds.map_batches(_cast, batch_format="pyarrow", batch_size=None),
        key_cols=["l_returnflag"],
        id_cols=["l_orderkey", "l_linenumber"],
        batch_to_x=_qty,
    )


def q_price_quantity_corr(sf_dir: str):
    """Pearson correlation + OLS fit of (quantity, floor-dollar price)
    per return flag — distributed bivariate stats from one streaming
    pass of mergeable integer moments; the corpus never shuffles."""
    ds = _lineitem(
        sf_dir, ["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    moments = grouped_moment_partials(
        ds,
        ["l_returnflag"],
        lambda t: (_qty(t), _floor_dollars(t)),
    )
    return rd.from_arrow(corr_ols_from_moments(moments, ["l_returnflag"]))


def q_price_histogram(sf_dir: str):
    """Global $1000-wide histogram of extended price: mergeable
    per-batch bin counts → one tiny grouped sum."""
    ds = _lineitem(sf_dir, ["l_extendedprice"])
    return fixed_width_histogram(ds, lambda t: _floor_dollars(t) // 1000)


def q_lineitem_rollup(sf_dir: str):
    """GROUP BY ROLLUP(returnflag, linestatus) of count + quantity sum:
    finest level distributed, coarser levels derived driver-side from
    the (tiny) finest table — additive rollup costs one corpus pass."""
    ds = _lineitem(
        sf_dir, ["l_returnflag", "l_linestatus", "l_quantity"]
    )
    tbl = rollup_counts(
        ds, ["l_returnflag", "l_linestatus"], _qty
    ).rename_columns(
        ["l_returnflag", "l_linestatus", "n_rows", "sum_qty"]
    )
    return rd.from_arrow(tbl)


QUERIES = {
    "quantity_zscore": q_quantity_zscore,
    "price_quantity_corr": q_price_quantity_corr,
    "price_histogram": q_price_histogram,
    "lineitem_rollup": q_lineitem_rollup,
}

ORACLE_SQL = {
    "quantity_zscore": """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
    sum(CAST(l_quantity AS BIGINT)) AS sx,
    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx
  FROM lineitem GROUP BY l_returnflag)
SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
  l.l_returnflag,
  CAST(CAST(l.l_quantity AS BIGINT) AS DOUBLE) AS x,
  (CAST(CAST(l.l_quantity AS BIGINT) AS DOUBLE) - CAST(s.sx AS DOUBLE) / s.n)
    / sqrt((CAST(s.sxx AS DOUBLE)
            - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE) / s.n) / s.n) AS z
FROM lineitem l JOIN s USING (l_returnflag)
""".strip(),
    "price_quantity_corr": """
WITH m AS (
  SELECT l_returnflag, count(*) AS n,
    sum(CAST(l_quantity AS BIGINT)) AS sx,
    sum(CAST(floor(l_extendedprice) AS BIGINT)) AS sy,
    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
    sum(CAST(floor(l_extendedprice) AS BIGINT)
        * CAST(floor(l_extendedprice) AS BIGINT)) AS syy,
    sum(CAST(l_quantity AS BIGINT)
        * CAST(floor(l_extendedprice) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
  (CAST(sy AS DOUBLE)
   - CAST(n * sxy - sx * sy AS DOUBLE)
     / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
    / CAST(n AS DOUBLE) AS intercept
FROM m
""".strip(),
    "price_histogram": """
SELECT CAST(floor(l_extendedprice) AS BIGINT) // 1000 AS bin,
  CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1
""".strip(),
    "lineitem_rollup": """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
  coalesce(l_linestatus, 'ALL') AS l_linestatus,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""".strip(),
}


SKETCH_QS = [0.0, 0.25, 0.5, 0.75, 1.0]


def q_value_quantiles_sketch(sf_dir: str):
    """Distributed quantiles of events.value via the mergeable KLL-style
    sketch (stages/sketches.py). Capacity 2**17 exceeds every sf tier's
    row count, so nothing compacts and the sketch is EXACT here —
    quantile_disc is a full-strength oracle (the winnowing-window=1
    de-vacuation trick); sub-capacity rank-error is bounded in
    tests/test_sketches.py."""
    from ..stages.sketches import quantile_sketch_ds

    ds = _events(sf_dir, ["value"])
    return quantile_sketch_ds(ds, "value", SKETCH_QS, capacity=1 << 17)


def q_hll_distinct_values(sf_dir: str):
    """Approximate distinct count of events.event_id (HyperLogLog
    p=12, register-max merge) in the fully-reproducible regime:
    splitmix64 hash + exact bit-length ranks + the RAW estimator with
    an integer register sum, so the DuckDB oracle replays the sketch
    bit-for-bit (VERDICT r4 item 5 — promoted from rows-only). The
    production path (SipHash over arbitrary column tuples +
    linear-counting correction) keeps its ±2% envelope gate in
    tests/test_sketches.py and serves hll_tokens_per_source."""
    from ..stages.sketches import hll_distinct_int_exact

    est = hll_distinct_int_exact(_events(sf_dir, ["event_id"]), "event_id",
                                 p=12)
    return pa.table({"n_distinct_approx": pa.array([est], pa.float64())})


def _events(sf_dir: str, columns):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )


QUERIES["value_quantiles_sketch"] = q_value_quantiles_sketch
QUERIES["hll_distinct_values"] = q_hll_distinct_values


def _hll_mulmod(c: int) -> str:
    """x*c mod 2^64 via 32-bit halves (same trick as the
    weighted_sample_docs oracle, text_queries._splitmix_mulmod)."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"CAST((((CAST(x AS HUGEINT) % 4294967296) * {hi} % 4294967296)"
        f" * 4294967296 + CAST(x AS HUGEINT) * {lo})"
        f" % 18446744073709551616 AS UBIGINT)"
    )


# the full sketch replayed in SQL: splitmix64 chain, register index =
# top 12 bits, rank = 65 - bit_length((h<<12) | sentinel) via bin(),
# integer register sum (BIGINT terms, HUGEINT total), ONE final divide
ORACLE_SQL["hll_distinct_values"] = f"""
WITH s0 AS (SELECT CAST(event_id AS UBIGINT) AS x FROM events
), s1 AS (SELECT xor(x, x >> 30) AS x FROM s0
), s2 AS (SELECT {_hll_mulmod(0xBF58476D1CE4E5B9)} AS x FROM s1
), s3 AS (SELECT xor(x, x >> 27) AS x FROM s2
), s4 AS (SELECT {_hll_mulmod(0x94D049BB133111EB)} AS x FROM s3
), s5 AS (SELECT xor(x, x >> 31) AS x FROM s4
), occ AS (
  SELECT CAST(x >> 52 AS BIGINT) AS idx,
         max(65 - length(bin(
           CAST((CAST(x AS HUGEINT) * 4096) % 18446744073709551616
                AS UBIGINT) | CAST(2048 AS UBIGINT)
         ))) AS r
  FROM s5 GROUP BY idx
), allregs AS (
  SELECT g.idx, COALESCE(o.r, 0) AS r
  FROM (SELECT unnest(generate_series(0, 4095)) AS idx) g
  LEFT JOIN occ o ON g.idx = o.idx
), stot AS (
  SELECT sum(CAST(1 AS BIGINT) << (53 - r)) AS s_int FROM allregs
)
SELECT (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
       * 9007199254740992.0 / CAST(s_int AS DOUBLE) AS n_distinct_approx
FROM stot
""".strip()
ORACLE_SQL["value_quantiles_sketch"] = " UNION ALL ".join(
    f"SELECT CAST({q} AS DOUBLE) AS q, "
    f"quantile_disc(value, {q}) AS value FROM events"
    for q in SKETCH_QS
)


def q_value_quantiles_by_type(sf_dir: str):
    """Grouped quantiles (per event_type) via per-group sketch merge —
    same exact-at-this-capacity regime as value_quantiles_sketch."""
    from ..stages.sketches import grouped_quantile_sketch_ds

    tbl = grouped_quantile_sketch_ds(
        _events(sf_dir, ["event_type", "value"]),
        "event_type",
        "value",
        SKETCH_QS,
        capacity=1 << 17,
    )
    return rd.from_arrow(tbl)


QUERIES["value_quantiles_by_type"] = q_value_quantiles_by_type
ORACLE_SQL["value_quantiles_by_type"] = " UNION ALL ".join(
    f"SELECT event_type, CAST({q} AS DOUBLE) AS q, "
    f"quantile_disc(value, {q}) AS value FROM events GROUP BY event_type"
    for q in SKETCH_QS
)


def q_price_quantity_spearman(sf_dir: str):
    """Global Spearman rank correlation of (quantity, floor-dollar
    price): two distributed range-partitioned sorts attach the global
    row_number of each variable (deterministic (orderkey, linenumber)
    tie-break shared with the SQL), then Pearson over the integer
    ranks via the exact-moment machinery — ranks are ints, so the
    whole reduction is exact and the final expression is the one IEEE
    shape both engines share. Composition demo: sort_by × 2 →
    moments → formula; no joins, the rank rides the row."""
    import pyarrow.compute as pc

    from ..stages.sort import sort_by

    ds = _lineitem(
        sf_dir,
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )

    def _project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": tbl.column("l_orderkey"),
                "l_linenumber": tbl.column("l_linenumber").cast(pa.int64()),
                "x": pa.array(_qty(tbl)),
                "y": pa.array(_floor_dollars(tbl)),
            }
        )

    ranked = sort_by(
        sort_by(
            ds.map_batches(_project, batch_format="pyarrow", batch_size=None),
            [("x", "ascending"), ("l_orderkey", "ascending"),
             ("l_linenumber", "ascending")],
            num_partitions=16,
            rank_col="rx",
        ),
        [("y", "ascending"), ("l_orderkey", "ascending"),
         ("l_linenumber", "ascending")],
        num_partitions=16,
        rank_col="ry",
    )

    def _scoped(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "scope", pa.array(["all"] * tbl.num_rows, pa.string())
        )

    moments = grouped_moment_partials(
        ranked.map_batches(_scoped, batch_format="pyarrow", batch_size=None),
        ["scope"],
        lambda t: (
            t.column("rx").to_numpy(zero_copy_only=False),
            t.column("ry").to_numpy(zero_copy_only=False),
        ),
    )
    out = corr_ols_from_moments(moments, ["scope"])
    return rd.from_arrow(
        out.select(["scope", "n", "r"]).rename_columns(
            ["scope", "n", "rho"]
        )
    )


QUERIES["price_quantity_spearman"] = q_price_quantity_spearman
ORACLE_SQL["price_quantity_spearman"] = """
WITH rk AS (
  SELECT
    row_number() OVER (ORDER BY CAST(l_quantity AS BIGINT),
                       l_orderkey, l_linenumber) AS rx,
    row_number() OVER (ORDER BY CAST(floor(l_extendedprice) AS BIGINT),
                       l_orderkey, l_linenumber) AS ry
  FROM lineitem),
m AS (
  SELECT count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
    sum(rx * rx) AS sxx, sum(ry * ry) AS syy, sum(rx * ry) AS sxy
  FROM rk)
SELECT 'all' AS scope, CAST(n AS BIGINT) AS n,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS rho
FROM m
""".strip()


# --- exact ROC AUC via the rank-sum (Mann-Whitney U) statistic ------------


def q_roc_auc_rank(sf_dir: str):
    """Model-evaluation primitive at corpus scale: exact ROC AUC of a
    score column for a binary label, via the Mann-Whitney rank-sum
    with midrank tie handling — here scoring ``n_chars`` against
    ``lang = 'en'`` (the fixture pair; any int score / bool label
    works). All ranking is done on the per-VALUE table: midranks
    depend only on the score value, so the distributed part is one
    (value)-keyed count aggregation of (total, positives) and the
    driver folds the per-value table (bounded by distinct score
    values, not rows). AUC = (smr2 - npos*(npos+1)) / (2*npos*nneg)
    computed from exact integers with a single IEEE division —
    bit-identical to the SQL expression."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["n_chars", "lang"],
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pos = pc.equal(tbl.column("lang"), "en").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        t = pa.table(
            {
                "v": tbl.column("n_chars").cast(pa.int64()),
                "t": pa.array(np.ones(tbl.num_rows, np.int64)),
                "p": pa.array(pos),
            }
        )
        return group_aggregate_table(
            t, ["v"], [("t", "sum"), ("p", "sum")]
        )

    per_value = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["v"],
        [("t", "sum"), ("p", "sum")],
        num_buckets=8,
    ).to_pandas().sort_values("v").reset_index(drop=True)

    t = per_value["t"].to_numpy()
    p = per_value["p"].to_numpy()
    cum_less = np.concatenate(([0], np.cumsum(t)[:-1]))
    # midrank*2 of every row with value v: 2*cum_less + t + 1
    smr2 = int((p * (2 * cum_less + t + 1)).sum())
    npos = int(p.sum())
    nneg = int(t.sum()) - npos
    auc = (
        float(smr2 - npos * (npos + 1)) / float(2 * npos * nneg)
        if npos and nneg
        else float("nan")
    )
    return pd.DataFrame(
        {
            "n_pos": [npos],
            "n_neg": [nneg],
            "smr2": [smr2],
            "auc": [auc],
        }
    )


QUERIES["roc_auc_rank"] = q_roc_auc_rank
ORACLE_SQL["roc_auc_rank"] = """
WITH s AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
  FROM documents
), pv AS (
  SELECT v, CAST(count(*) AS BIGINT) AS t, CAST(sum(p) AS BIGINT) AS p
  FROM s GROUP BY v
), r AS (
  SELECT v, t, p,
    CAST(coalesce(sum(t) OVER (ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS cum_less
  FROM pv
)
SELECT
  CAST(sum(p) AS BIGINT) AS n_pos,
  CAST(sum(t) - sum(p) AS BIGINT) AS n_neg,
  CAST(sum(p * (2 * cum_less + t + 1)) AS BIGINT) AS smr2,
  CAST(sum(p * (2 * cum_less + t + 1)) - sum(p) * (sum(p) + 1)
       AS DOUBLE)
    / (2 * sum(p) * (sum(t) - sum(p))) AS auc
FROM r
""".strip()


# --- exact per-group OLS trend (integer sufficient statistics) ------------

_OLS_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01 in µs
_DAY_US = 86_400_000_000


def q_trend_per_type(sf_dir: str):
    """Per-event-type linear trend of daily value: OLS slope computed
    from INTEGER sufficient statistics (n, Σx, Σy, Σxy, Σx² with
    x = day index since 2024-01-01, y = integer micro-units) — the
    one place floats appear is the single closing division, identical
    on both engines. The scale shape is the ideal one: per-batch
    integer partials over a bounded group domain; only 5 rows ever
    move."""
    import numpy as np
    import pyarrow as pa

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    ev = _events_cols(sf_dir, ["ts", "event_type", "value"])

    def _partial(tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        x = (ts - _OLS_EPOCH_US) // _DAY_US
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        y = np.floor(v * 1e6 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "event_type": tbl.column("event_type"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
            }
        )
        return group_aggregate_table(
            t, ["event_type"],
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")],
        )

    agg = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow",
                       batch_size=None),
        ["event_type"],
        [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
         ("sxy", "sum"), ("sxx", "sum")],
        num_buckets=4,
    ).to_pandas()

    n = agg["n"].to_numpy()
    sx = agg["sx"].to_numpy()
    sy = agg["sy"].to_numpy()
    sxy = agg["sxy"].to_numpy()
    sxx = agg["sxx"].to_numpy()
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    agg["slope_micro_per_day"] = num.astype("float64") / den.astype(
        "float64"
    )
    return agg.sort_values("event_type").reset_index(drop=True)


def _events_cols(sf_dir: str, cols):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "events.parquet"), columns=cols
    )


QUERIES["trend_per_type"] = q_trend_per_type
ORACLE_SQL["trend_per_type"] = f"""
WITH s AS (
  SELECT event_type,
    (epoch_us(ts) - {_OLS_EPOCH_US}) // {_DAY_US} AS x,
    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS y
  FROM events
), a AS (
  SELECT event_type,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx,
    CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(x * x) AS BIGINT) AS sxx
  FROM s GROUP BY 1
)
SELECT event_type, n, sx, sy, sxy, sxx,
  CAST(n * sxy - sx * sy AS DOUBLE)
    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_micro_per_day
FROM a
""".strip()


def q_weighted_median_price(sf_dir: str):
    """Exact WEIGHTED median (and quartiles) of lineitem price with
    quantity as weight — integer-cent values, integer weights, lower
    weighted-quantile convention (first value where 2*cumw >= 2*q*W /
    cumw*4 >= q*W for quartiles), so the result is a VALUE FROM THE
    DATA and hash-exact. Distributed per-VALUE weight aggregation
    (bounded by distinct prices, like roc_auc_rank); the driver folds
    the sorted per-value table only."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    li = _li(sf_dir, ["l_extendedprice", "l_quantity"])

    def _partial(tbl: pa.Table) -> pa.Table:
        p = tbl.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        q = tbl.column("l_quantity").to_numpy(
            zero_copy_only=False
        )
        w = np.floor(q + 0.5).astype(np.int64)
        t = pa.table(
            {"cents": pa.array(cents), "w": pa.array(w)}
        )
        return group_aggregate_table(t, ["cents"], [("w", "sum")])

    pv = hash_grouped_aggregate(
        li.map_batches(_partial, batch_format="pyarrow",
                       batch_size=None),
        ["cents"],
        [("w", "sum")],
        num_buckets=8,
    ).to_pandas().sort_values("cents").reset_index(drop=True)

    v = pv["cents"].to_numpy()
    w = pv["w"].to_numpy()
    cw = np.cumsum(w)
    W = int(cw[-1])
    rows = []
    for qq in (1, 2, 3):
        i = int(np.searchsorted(cw * 4, qq * W))
        rows.append({"quartile": qq, "cents": int(v[i])})
    out = pd.DataFrame(rows).astype(
        {"quartile": "int64", "cents": "int64"}
    )
    out["total_weight"] = np.int64(W)
    return out


def _li(sf_dir: str, cols):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "lineitem.parquet"), columns=cols
    )


QUERIES["weighted_median_price"] = q_weighted_median_price
ORACLE_SQL["weighted_median_price"] = """
WITH s AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
    CAST(floor(l_quantity + 0.5) AS BIGINT) AS w
  FROM lineitem
), pv AS (
  SELECT cents, CAST(sum(w) AS BIGINT) AS w FROM s GROUP BY 1
), c AS (
  SELECT cents, w,
    CAST(sum(w) OVER (ORDER BY cents) AS BIGINT) AS cw
  FROM pv
), tot AS (SELECT CAST(sum(w) AS BIGINT) AS W FROM pv)
SELECT q.quartile,
  (SELECT min(cents) FROM c, tot WHERE c.cw * 4 >= q.quartile * tot.W)
    AS cents,
  (SELECT W FROM tot) AS total_weight
FROM (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)),
             (CAST(3 AS BIGINT))) AS q(quartile)
""".strip()


_DRIFT_BIN_MICRO = 5_000_000  # 5-unit value bins, integer micro-units


def q_histogram_drift(sf_dir: str):
    """Distribution-drift monitor between two event partitions (first
    vs second half of the month): per-value-bin integer histograms
    and the EXACT total-variation distance — the numerator
    Σ|c_old·N_new − c_new·N_old| is pure integer arithmetic, so the
    drift statistic is hash-stable (contrast KL/χ², whose float
    accumulation order is engine-dependent). One histogram exchange;
    the bin table is bounded by the value range."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    SPLIT_US = 1_705_276_800_000_000  # 2024-01-15
    ev = _events(sf_dir, ["ts", "value"])

    def _partial(tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        micro = np.floor(v * 1e6 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "bin": pa.array(micro // _DRIFT_BIN_MICRO),
                "is_new": pa.array(
                    (ts >= SPLIT_US).astype(np.int64)
                ),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["bin", "is_new"], [("n", "sum")]
        )

    h = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow",
                       batch_size=None),
        ["bin", "is_new"],
        [("n", "sum")],
        num_buckets=4,
    ).to_pandas()
    piv = h.pivot_table(
        index="bin", columns="is_new", values="n", fill_value=0,
        aggfunc="sum",
    )
    c_old = piv.get(0, pd.Series(0, index=piv.index)).to_numpy(
        dtype=np.int64
    )
    c_new = piv.get(1, pd.Series(0, index=piv.index)).to_numpy(
        dtype=np.int64
    )
    n_old = int(c_old.sum())
    n_new = int(c_new.sum())
    tv_numer = int(np.abs(c_old * n_new - c_new * n_old).sum())
    return pd.DataFrame(
        {
            "n_bins": [int(len(piv))],
            "n_old": [n_old],
            "n_new": [n_new],
            "tv_numer": [tv_numer],
            "tv": [float(tv_numer) / float(2 * n_old * n_new)],
        }
    )


QUERIES["histogram_drift"] = q_histogram_drift
ORACLE_SQL["histogram_drift"] = f"""
WITH b AS (
  SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT)
           // {_DRIFT_BIN_MICRO} AS bin,
    CASE WHEN epoch_us(ts) >= 1705276800000000 THEN 1 ELSE 0 END
      AS is_new
  FROM events
), h AS (
  SELECT bin,
    CAST(sum(1 - is_new) AS BIGINT) AS c_old,
    CAST(sum(is_new) AS BIGINT) AS c_new
  FROM b GROUP BY 1
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_bins,
    CAST(sum(c_old) AS BIGINT) AS n_old,
    CAST(sum(c_new) AS BIGINT) AS n_new,
    CAST(sum(abs(c_old * (SELECT sum(c_new) FROM h)
                 - c_new * (SELECT sum(c_old) FROM h)))
      AS BIGINT) AS tv_numer
  FROM h
)
SELECT n_bins, n_old, n_new, tv_numer,
  CAST(tv_numer AS DOUBLE) / (2 * n_old * n_new) AS tv
FROM t
""".strip()


def q_ks_drift_value(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov drift on events.value between two
    deterministic user arms (splitmix64(user_id) % 2 — same assignment
    chain as ab_experiment_summary). EXACT by integer cross-
    multiplication: at each distinct value v the CDF gap
    |F0(v) − F1(v)| = |cc0(v)·n1 − cc1(v)·n0| / (n0·n1) has an INTEGER
    numerator, so D's argmax is exact int64 on both engines and the
    only float is the single final division. Scale shape: per-batch
    (cents, arm) count partials collapse before the exchange, the
    merged per-value table is bounded by DISTINCT CENTS (the
    price_cume_dist histogram argument — domain-bounded, not
    row-bounded), one range sort + two-phase global prefix scan
    (O(blocks) ints to the driver), and the final max is a scalar
    aggregate. Unbinned twin of q_histogram_drift's total-variation
    statistic."""
    from ..functions.hashing import rehash64
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )
    from ..stages.scan import global_scan

    ev = _events(sf_dir, ["user_id", "value"])

    def _partial(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy().astype(np.uint64)
        arm = (rehash64(u, 0) % np.uint64(2)).astype(np.int64)
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "cents": pa.array(cents),
                "c0": pa.array((arm == 0).astype(np.int64)),
                "c1": pa.array(arm),
            }
        )
        return group_aggregate_table(
            t, ["cents"], [("c0", "sum"), ("c1", "sum")]
        )

    per_val = hash_grouped_aggregate(
        ev.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["cents"],
        [("c0", "sum"), ("c1", "sum")],
        num_buckets=8,
    ).materialize()  # bounded by distinct cents, not rows
    n0 = int(per_val.sum("c0") or 0)
    n1 = int(per_val.sum("c1") or 0)

    scanned = global_scan(
        per_val, [("cents", "ascending")], [("c0", "cc0"), ("c1", "cc1")]
    )

    def _dnum(tbl: pa.Table) -> pa.Table:
        cc0 = tbl.column("cc0").to_numpy()
        cc1 = tbl.column("cc1").to_numpy()
        return pa.table(
            {"d": pa.array(np.abs(cc0 * np.int64(n1) - cc1 * np.int64(n0)))}
        )

    dmax = int(
        scanned.map_batches(
            _dnum, batch_format="pyarrow", batch_size=None
        ).max("d")
        or 0
    )
    ks = float(dmax) / (float(n0) * float(n1)) if n0 and n1 else None
    return pa.table(
        {
            "n0": pa.array([n0], pa.int64()),
            "n1": pa.array([n1], pa.int64()),
            "ks_d_num": pa.array([dmax], pa.int64()),
            "ks_stat": pa.array([ks], pa.float64()),
        }
    )


def _ks_sql() -> str:
    from .text_queries import _splitmix_mulmod

    return f"""
WITH e0 AS (
  SELECT CAST(user_id AS UBIGINT) AS x,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), e1 AS (SELECT cents, xor(x, x >> 30) AS x FROM e0
), e2 AS (SELECT cents, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM e1
), e3 AS (SELECT cents, xor(x, x >> 27) AS x FROM e2
), e4 AS (SELECT cents, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM e3
), e5 AS (SELECT cents, xor(x, x >> 31) AS x FROM e4
), arms AS (
  SELECT cents, CAST(x % 2 AS BIGINT) AS arm FROM e5
), pv AS (
  SELECT cents,
    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
    CAST(sum(arm) AS BIGINT) AS c1
  FROM arms GROUP BY cents
), cum AS (
  SELECT cents,
    CAST(sum(c0) OVER (ORDER BY cents) AS BIGINT) AS cc0,
    CAST(sum(c1) OVER (ORDER BY cents) AS BIGINT) AS cc1
  FROM pv
), tot AS (
  SELECT CAST(sum(c0) AS BIGINT) AS n0,
         CAST(sum(c1) AS BIGINT) AS n1
  FROM pv
)
SELECT tot.n0, tot.n1,
  CAST(max(abs(cc0 * tot.n1 - cc1 * tot.n0)) AS BIGINT) AS ks_d_num,
  CAST(max(abs(cc0 * tot.n1 - cc1 * tot.n0)) AS DOUBLE)
    / (CAST(tot.n0 AS DOUBLE) * CAST(tot.n1 AS DOUBLE)) AS ks_stat
FROM cum, tot
GROUP BY tot.n0, tot.n1
""".strip()


QUERIES["ks_drift_value"] = q_ks_drift_value
ORACLE_SQL["ks_drift_value"] = _ks_sql()
