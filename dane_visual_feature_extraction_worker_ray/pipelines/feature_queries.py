"""ML feature-engineering operators (round 5): target encodings,
grouped exact order statistics, vocabulary-coverage features, top-k
share features.

These are the per-row FEATURE COLUMNS a training pipeline derives from
relational/label tables — the classic tabular-ML constructions
(leave-one-out and fold-aware target encoding, winsorized aggregates,
OOV rate) expressed Ray-Data-first: one metadata exchange for the
sufficient statistics, a broadcast of the (tiny) statistic table, then
a streaming per-row map. Float parity with the DuckDB oracles is
engineered the repo's usual way: integer-cent sums, identical
expression shapes, one final IEEE division on both sides.

Reference analog: the per-record metadata assembly the reference does
per batch (``/root/reference/data_handling.py:60-84``) — here the
"metadata" is learned from the corpus itself, which is what makes the
leakage rules (leave-one-out, fold-aware) matter.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUERIES: dict = {}
ORACLE_SQL: dict = {}

_TE_FOLDS = 5


def _read(sf_dir: str, name: str, columns=None):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns
    )


def _cents(arr) -> np.ndarray:
    v = arr.cast(pa.float64()).to_numpy(zero_copy_only=False)
    return np.round(v * 100.0).astype(np.int64)


def _orders_with_segment(sf_dir: str):
    """orders ⋈ customer on custkey → (o_orderkey, c_mktsegment,
    cents, c_custkey) — the shared input of both target encodings.
    Distributed shape: one key exchange via ``hash_equi_join`` (the
    size-gated planner would broadcast customer at these tiers; the
    explicit hash join keeps the shape honest at 100 TB where both
    sides are large)."""
    from ..stages.join import hash_equi_join

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = hash_equi_join(
        orders, cust, "o_custkey", "c_custkey",
        right_columns=["c_mktsegment"], num_partitions=16,
    )

    def _prep(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey").cast(pa.int64()),
                "c_custkey": tbl.column("o_custkey").cast(pa.int64()),
                "c_mktsegment": tbl.column("c_mktsegment"),
                "cents": pa.array(_cents(tbl.column("o_totalprice"))),
            }
        )

    return joined.map_batches(_prep, batch_format="pyarrow",
                              batch_size=None)


def q_loo_target_encoding(sf_dir: str):
    """Leave-one-out target encoding of ``c_mktsegment`` against the
    order total: each order's feature is the mean total of OTHER
    orders in its segment — the standard leakage-safe categorical
    encoding (an order never sees its own label).

    Scale shape: per-segment (sum, count) int-cent partials — one tiny
    aggregate bounded by segment cardinality — broadcast back into a
    streaming per-row map; the single IEEE division
    ``(seg_sum − own) / (seg_n − 1)`` is the only float op."""
    import ray

    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    oc = _orders_with_segment(sf_dir)

    def _partial(tbl: pa.Table) -> pa.Table:
        t = tbl.select(["c_mktsegment", "cents"]).append_column(
            "n", pa.array(np.ones(tbl.num_rows, np.int64))
        )
        return group_aggregate_table(
            t, ["c_mktsegment"], [("cents", "sum"), ("n", "sum")]
        )

    seg = hash_grouped_aggregate(
        oc.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["c_mktsegment"],
        [("cents", "sum"), ("n", "sum")],
        num_buckets=4,
    ).to_pandas()  # bounded: one row per segment
    stats = {
        r.c_mktsegment: (int(r.cents), int(r.n))
        for r in seg.itertuples()
    }
    stats_ref = ray.put(stats)

    def _encode(tbl: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        segs = tbl.column("c_mktsegment").to_pylist()
        own = tbl.column("cents").to_numpy()
        s = np.fromiter((st[x][0] for x in segs), np.int64, len(segs))
        n = np.fromiter((st[x][1] for x in segs), np.int64, len(segs))
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "c_mktsegment": tbl.column("c_mktsegment"),
                "loo_avg_cents": pa.array(
                    (s - own).astype(np.float64)
                    / (n - 1).astype(np.float64)
                ),
            }
        )

    return oc.map_batches(_encode, batch_format="pyarrow",
                          batch_size=None)


QUERIES["loo_target_encoding"] = q_loo_target_encoding
ORACLE_SQL["loo_target_encoding"] = """
WITH oc AS (
  SELECT o_orderkey, c_mktsegment,
         CAST(round(o_totalprice*100, 0) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), seg AS (
  SELECT c_mktsegment, CAST(sum(cents) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM oc GROUP BY c_mktsegment
)
SELECT oc.o_orderkey, oc.c_mktsegment,
  CAST(seg.s - oc.cents AS DOUBLE) / CAST(seg.n - 1 AS DOUBLE)
    AS loo_avg_cents
FROM oc JOIN seg USING (c_mktsegment)
""".strip()


def q_target_encoding_kfold(sf_dir: str):
    """Fold-aware target encoding: customers hash into K=5 folds
    (splitmix64 of ``c_custkey`` — RNG-free, resume/retry-stable, the
    ``grouped_kfold`` convention), and an order's feature is the mean
    total of the OTHER folds' orders in its segment:
    ``(seg_sum − fold_sum) / (seg_n − fold_n)`` — how target encoding
    is actually computed for cross-validated training (leave-one-out
    still leaks fold-internal order statistics; this doesn't).

    Scale shape: one (segment × fold) int-cent aggregate — ≤ 5·K rows
    — broadcast into the streaming encode map."""
    import ray

    from ..functions.hashing import rehash64
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    oc = _orders_with_segment(sf_dir)

    def _with_fold(tbl: pa.Table) -> pa.Table:
        ck = tbl.column("c_custkey").to_numpy().astype(np.uint64)
        fold = (rehash64(ck, 0) % np.uint64(_TE_FOLDS)).astype(np.int64)
        return tbl.append_column("fold", pa.array(fold))

    ocf = oc.map_batches(_with_fold, batch_format="pyarrow",
                         batch_size=None)

    def _partial(tbl: pa.Table) -> pa.Table:
        t = tbl.select(["c_mktsegment", "fold", "cents"]).append_column(
            "n", pa.array(np.ones(tbl.num_rows, np.int64))
        )
        return group_aggregate_table(
            t, ["c_mktsegment", "fold"], [("cents", "sum"), ("n", "sum")]
        )

    sf = hash_grouped_aggregate(
        ocf.map_batches(_partial, batch_format="pyarrow",
                        batch_size=None),
        ["c_mktsegment", "fold"],
        [("cents", "sum"), ("n", "sum")],
        num_buckets=4,
    ).to_pandas()  # bounded: segments × folds rows
    seg_tot: dict = {}
    cell: dict = {}
    for r in sf.itertuples():
        cell[(r.c_mktsegment, int(r.fold))] = (int(r.cents), int(r.n))
        s, n = seg_tot.get(r.c_mktsegment, (0, 0))
        seg_tot[r.c_mktsegment] = (s + int(r.cents), n + int(r.n))
    stats_ref = ray.put((seg_tot, cell))

    def _encode(tbl: pa.Table) -> pa.Table:
        seg_t, cells = ray.get(stats_ref)
        segs = tbl.column("c_mktsegment").to_pylist()
        folds = tbl.column("fold").to_numpy()
        m = len(segs)
        s_all = np.fromiter((seg_t[x][0] for x in segs), np.int64, m)
        n_all = np.fromiter((seg_t[x][1] for x in segs), np.int64, m)
        s_f = np.fromiter(
            (cells.get((x, int(f)), (0, 0))[0]
             for x, f in zip(segs, folds)),
            np.int64, m,
        )
        n_f = np.fromiter(
            (cells.get((x, int(f)), (0, 0))[1]
             for x, f in zip(segs, folds)),
            np.int64, m,
        )
        return pa.table(
            {
                "o_orderkey": tbl.column("o_orderkey"),
                "c_mktsegment": tbl.column("c_mktsegment"),
                "fold": pa.array(folds.astype(np.int64)),
                "te_cents": pa.array(
                    (s_all - s_f).astype(np.float64)
                    / (n_all - n_f).astype(np.float64)
                ),
            }
        )

    return ocf.map_batches(_encode, batch_format="pyarrow",
                           batch_size=None)


def _splitmix_sql(inp: str, out: str, src: str) -> str:
    """splitmix64 finalizer of an integer column as chained CTEs
    (same chain the weighted_sample_docs oracle proves)."""

    def mm(c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"CAST((((CAST(x AS HUGEINT) % 4294967296) * {hi}"
            f" % 4294967296) * 4294967296 + CAST(x AS HUGEINT) * {lo})"
            f" % 18446744073709551616 AS UBIGINT)"
        )

    return f"""
f0 AS (SELECT *, CAST({inp} AS UBIGINT) AS x FROM {src}
), f1 AS (SELECT * REPLACE (xor(x, x >> 30) AS x) FROM f0
), f2 AS (SELECT * REPLACE ({mm(0xBF58476D1CE4E5B9)} AS x) FROM f1
), f3 AS (SELECT * REPLACE (xor(x, x >> 27) AS x) FROM f2
), f4 AS (SELECT * REPLACE ({mm(0x94D049BB133111EB)} AS x) FROM f3
), f5 AS (SELECT * REPLACE (xor(x, x >> 31) AS x) FROM f4
), {out} AS (
  SELECT * EXCLUDE (x),
         CAST(x % {_TE_FOLDS} AS BIGINT) AS fold FROM f5
)""".strip()


QUERIES["target_encoding_kfold"] = q_target_encoding_kfold
ORACLE_SQL["target_encoding_kfold"] = f"""
WITH oc0 AS (
  SELECT o_orderkey, o_custkey, c_mktsegment,
         CAST(round(o_totalprice*100, 0) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), {_splitmix_sql("o_custkey", "oc", "oc0")},
cellagg AS (
  SELECT c_mktsegment, fold, CAST(sum(cents) AS BIGINT) AS s_f,
         CAST(count(*) AS BIGINT) AS n_f
  FROM oc GROUP BY c_mktsegment, fold
), segagg AS (
  SELECT c_mktsegment, CAST(sum(s_f) AS BIGINT) AS s,
         CAST(sum(n_f) AS BIGINT) AS n
  FROM cellagg GROUP BY c_mktsegment
)
SELECT oc.o_orderkey, oc.c_mktsegment, oc.fold,
  CAST(segagg.s - cellagg.s_f AS DOUBLE)
    / CAST(segagg.n - cellagg.n_f AS DOUBLE) AS te_cents
FROM oc
JOIN cellagg ON oc.c_mktsegment = cellagg.c_mktsegment
            AND oc.fold = cellagg.fold
JOIN segagg ON oc.c_mktsegment = segagg.c_mktsegment
""".strip()


# --------------------------------------------------------------------------
# grouped exact order statistics from ONE value-histogram exchange —
# the per-group generalization of the _lineitem_cent_hist machinery
# (relational_queries.py): driver state is O(groups × distinct cents),
# never rows


def _flag_cent_hist(sf_dir: str):
    """(l_returnflag, cent) → count, sorted per flag, on the driver."""
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    li = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice"])

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": tbl.column("l_returnflag"),
                "price_c": pa.array(_cents(tbl.column("l_extendedprice"))),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["l_returnflag", "price_c"], [("n", "sum")]
        )

    hist = hash_grouped_aggregate(
        li.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["l_returnflag", "price_c"],
        [("n", "sum")],
        num_buckets=4,
    ).to_pandas()
    out = {}
    for flag, g in hist.groupby("l_returnflag"):
        vals = g["price_c"].to_numpy()
        cnt = g["n"].to_numpy().astype(np.int64)
        o = np.argsort(vals)
        out[flag] = (vals[o], np.cumsum(cnt[o]))
    return out


def _hist_qdisc(vals: np.ndarray, cum: np.ndarray, q: float) -> int:
    """quantile_disc: order statistic at 0-based ceil(q·n) − 1."""
    k = int(np.ceil(q * int(cum[-1]))) - 1
    return int(vals[np.searchsorted(cum, k + 1)])


def q_grouped_median_price(sf_dir: str):
    """Exact per-group median (quantile_disc 0.5 of the integer cent
    price per returnflag) — grouped order statistics from ONE bounded
    histogram exchange, no per-group sort of raw rows."""
    hists = _flag_cent_hist(sf_dir)
    flags = sorted(hists)
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "median_cents": pa.array(
                [_hist_qdisc(*hists[f], 0.5) for f in flags], pa.int64()
            ),
        }
    )


QUERIES["grouped_median_price"] = q_grouped_median_price
ORACLE_SQL["grouped_median_price"] = """
SELECT l_returnflag,
  quantile_disc(CAST(round(l_extendedprice*100, 0) AS BIGINT), 0.5)
    AS median_cents
FROM lineitem GROUP BY l_returnflag
""".strip()


def q_grouped_winsorized_totals(sf_dir: str):
    """Per-group winsorized revenue: clip each price at the group's
    exact [p01, p99] (quantile_disc) and total the clipped cents —
    the robust per-category aggregate a feature store serves. The
    clipped total is computed FROM THE HISTOGRAM
    (Σ clip(v)·count, exact ints), so the raw rows are scanned exactly
    once, by the histogram pass."""
    hists = _flag_cent_hist(sf_dir)
    flags = sorted(hists)
    lo, hi, tot = [], [], []
    for f in flags:
        vals, cum = hists[f]
        cnt = np.diff(np.r_[0, cum])
        lo_c = _hist_qdisc(vals, cum, 0.01)
        hi_c = _hist_qdisc(vals, cum, 0.99)
        clipped = np.minimum(np.maximum(vals, lo_c), hi_c)
        lo.append(lo_c)
        hi.append(hi_c)
        tot.append(int(np.dot(clipped, cnt)))
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "lo_cents": pa.array(lo, pa.int64()),
            "hi_cents": pa.array(hi, pa.int64()),
            "winsorized_sum_cents": pa.array(tot, pa.int64()),
        }
    )


QUERIES["grouped_winsorized_totals"] = q_grouped_winsorized_totals
ORACLE_SQL["grouped_winsorized_totals"] = """
WITH c AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice*100, 0) AS BIGINT) AS cents
  FROM lineitem
), th AS (
  SELECT l_returnflag,
         quantile_disc(cents, 0.01) AS lo_cents,
         quantile_disc(cents, 0.99) AS hi_cents
  FROM c GROUP BY l_returnflag
)
SELECT c.l_returnflag, th.lo_cents, th.hi_cents,
  CAST(sum(least(greatest(c.cents, th.lo_cents), th.hi_cents))
       AS BIGINT) AS winsorized_sum_cents
FROM c JOIN th USING (l_returnflag)
GROUP BY c.l_returnflag, th.lo_cents, th.hi_cents
""".strip()


# --------------------------------------------------------------------------
# vocabulary-coverage feature (OOV rate per document)

_OOV_VOCAB_K = 200


def q_oov_rate(sf_dir: str):
    """Per-document out-of-vocabulary rate against the corpus top-K
    vocabulary (K=200 by count desc, token asc — deterministic ties).
    The feature a tokenizer-fit or domain-shift monitor reads.

    Scale shape: per-batch token-count partials → one token-keyed
    exchange → per-block top-K partials (K·blocks rows to the driver,
    the top_tokens bound) → broadcast vocab set → streaming per-doc
    ``is_in`` ratio (split(" ") fields, empties excluded, same as the
    oracle's string_split + filter)."""
    import ray

    from ..functions.tokenize import space_fields
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _tok_partial(tbl: pa.Table) -> pa.Table:
        _row, flat, _counts = space_fields(tbl.column("text"))
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        t = pa.table(
            {
                "tok": flat,
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        return group_aggregate_table(t, ["tok"], [("n", "sum")])

    counts = hash_grouped_aggregate(
        docs.map_batches(_tok_partial, batch_format="pyarrow",
                         batch_size=None),
        ["tok"],
        [("n", "sum")],
        num_buckets=8,
    )

    def _topk_partial(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n").to_numpy()
        toks = tbl.column("tok").to_pandas().to_numpy(dtype=object)
        order = np.lexsort((toks, -n))[:_OOV_VOCAB_K]
        return pa.table(
            {
                "tok": pa.array(toks[order].tolist(), pa.string()),
                "n": pa.array(n[order]),
            }
        )

    import pandas as pd

    parts = [
        ray.get(r)
        for r in counts.map_batches(
            _topk_partial, batch_format="pyarrow", batch_size=None
        ).to_arrow_refs()
    ]
    m = pa.concat_tables([t for t in parts if t.num_rows]).to_pandas()
    toks = m["tok"].to_numpy(dtype=object)
    n = m["n"].to_numpy()
    top = np.lexsort((toks, -n))[:_OOV_VOCAB_K]
    vocab = pa.array(sorted(toks[top].tolist()), pa.string())
    vocab_ref = ray.put(vocab)

    def _rate(tbl: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        row, flat, counts_ = space_fields(tbl.column("text"))
        nz = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        hits = pc.is_in(flat, value_set=v).to_numpy(zero_copy_only=False)
        n_rows = tbl.num_rows
        n_tok = np.bincount(row[nz], minlength=n_rows).astype(np.int64)
        n_in = np.bincount(row[nz & hits], minlength=n_rows).astype(
            np.int64
        )
        keep = n_tok > 0  # zero-token docs drop on both sides
        n_oov = (n_tok - n_in)[keep]
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()).filter(
                    pa.array(keep)
                ),
                "n_oov": pa.array(n_oov),
                "n_tokens": pa.array(n_tok[keep]),
                "oov_rate": pa.array(
                    n_oov.astype(np.float64)
                    / n_tok[keep].astype(np.float64)
                ),
            }
        )

    return docs.map_batches(_rate, batch_format="pyarrow",
                            batch_size=None)


QUERIES["oov_rate"] = q_oov_rate
ORACLE_SQL["oov_rate"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), nz AS (
  SELECT doc_id, tok FROM toks WHERE tok <> ''
), vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS c FROM nz GROUP BY tok
    ORDER BY c DESC, tok LIMIT {_OOV_VOCAB_K})
), scored AS (
  SELECT nz.doc_id,
    CAST(count(*) FILTER (WHERE vocab.tok IS NULL) AS BIGINT) AS n_oov,
    CAST(count(*) AS BIGINT) AS n_tokens
  FROM nz LEFT JOIN vocab ON nz.tok = vocab.tok
  GROUP BY nz.doc_id
)
SELECT doc_id, n_oov, n_tokens,
  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
FROM scored
""".strip()


# --------------------------------------------------------------------------
# top-2 supplier share per part (rank features with exact shares)


def q_top2_supplier_share(sf_dir: str):
    """Per part: the top-2 suppliers by revenue with their revenue
    share — the 'concentration' feature of a categorical pair (and the
    rank-k generalization of ``preferred_supplier_per_part``'s argmax).
    Ties break to the smaller suppkey on both sides.

    Scale shape: (part, supp) int-cent revenue partials collapse
    per batch before ONE partkey exchange; the reduce kernel ranks a
    whole partition vectorized (no per-group Python calls) and emits
    ≤2 rows per part; share = one IEEE division of exact ints."""
    from ..stages.exchange import hash_exchange
    from ..stages.groupagg import group_aggregate_table

    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def _rev_partial(tbl: pa.Table) -> pa.Table:
        price_c = _cents(tbl.column("l_extendedprice"))
        disc_c = _cents(tbl.column("l_discount"))
        rev = price_c * (100 - disc_c)  # cents·1e2, exact ints
        t = pa.table(
            {
                "l_partkey": tbl.column("l_partkey").cast(pa.int64()),
                "l_suppkey": tbl.column("l_suppkey").cast(pa.int64()),
                "rev_c2": pa.array(rev),
            }
        )
        return group_aggregate_table(
            t, ["l_partkey", "l_suppkey"], [("rev_c2", "sum")]
        )

    out_schema = pa.schema(
        [
            ("l_partkey", pa.int64()),
            ("rk", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("rev_c2", pa.int64()),
            ("share", pa.float64()),
        ]
    )

    def _top2(pidx: int, g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        # merge cross-batch partials, then rank within part — all
        # vectorized over the whole partition
        m = group_aggregate_table(
            g, ["l_partkey", "l_suppkey"], [("rev_c2", "sum")]
        )
        part = m.column("l_partkey").to_numpy()
        supp = m.column("l_suppkey").to_numpy()
        rev = m.column("rev_c2").to_numpy()
        order = np.lexsort((supp, -rev, part))
        part, supp, rev = part[order], supp[order], rev[order]
        starts = np.flatnonzero(np.r_[True, part[1:] != part[:-1]])
        grp = np.cumsum(np.r_[False, part[1:] != part[:-1]])
        rk = np.arange(len(part), dtype=np.int64) - starts[grp] + 1
        tot = np.add.reduceat(rev, starts)[grp]
        keep = rk <= 2
        return pa.table(
            {
                "l_partkey": pa.array(part[keep]),
                "rk": pa.array(rk[keep]),
                "l_suppkey": pa.array(supp[keep]),
                "rev_c2": pa.array(rev[keep]),
                "share": pa.array(
                    rev[keep].astype(np.float64)
                    / tot[keep].astype(np.float64)
                ),
            }
        )

    return hash_exchange(
        li.map_batches(_rev_partial, batch_format="pyarrow",
                       batch_size=None),
        "l_partkey",
        16,
        _top2,
        empty_schema=out_schema,
    )


QUERIES["top2_supplier_share"] = q_top2_supplier_share
ORACLE_SQL["top2_supplier_share"] = """
WITH rev AS (
  SELECT l_partkey, l_suppkey,
    CAST(sum(CAST(round(l_extendedprice*100, 0) AS BIGINT)
             * (100 - CAST(round(l_discount*100, 0) AS BIGINT)))
         AS BIGINT) AS rev_c2
  FROM lineitem GROUP BY l_partkey, l_suppkey
), ranked AS (
  SELECT l_partkey, l_suppkey, rev_c2,
    row_number() OVER (PARTITION BY l_partkey
                       ORDER BY rev_c2 DESC, l_suppkey) AS rk,
    CAST(sum(rev_c2) OVER (PARTITION BY l_partkey) AS BIGINT) AS tot
  FROM rev
)
SELECT l_partkey, CAST(rk AS BIGINT) AS rk, l_suppkey, rev_c2,
  CAST(rev_c2 AS DOUBLE) / CAST(tot AS DOUBLE) AS share
FROM ranked WHERE rk <= 2
""".strip()


# --------------------------------------------------------------------------
# RFM customer scoring (recency / frequency / monetary quintiles)


def q_rfm_scores(sf_dir: str):
    """Classic RFM feature block per customer: days since last order
    (vs the corpus max date), order count, lifetime cents, each
    quintiled with SQL ``ntile(5)`` semantics (deterministic ties via
    c_custkey; recency ranks ascending — most recent = score 1;
    frequency/monetary descending — biggest = score 1).

    Scale shape: ONE custkey exchange collapses orders to a
    customer-cardinality table, then three chained
    ``global_scan`` rank passes over that (much smaller) table —
    descending orders ride as negated integers. The ntile arithmetic
    is the price_deciles formula; n comes from the scan itself."""
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate
    from ..stages.scan import global_scan

    orders = _read(
        sf_dir, "orders",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": tbl.column("o_custkey").cast(pa.int64()),
                "last_us": tbl.column("o_orderdate").cast(pa.int64()),
                "n_orders": pa.array(np.ones(tbl.num_rows, np.int64)),
                "cents": pa.array(_cents(tbl.column("o_totalprice"))),
            }
        )
        return group_aggregate_table(
            t, ["c_custkey"],
            [("last_us", "max"), ("n_orders", "sum"), ("cents", "sum")],
        )

    cust = hash_grouped_aggregate(
        orders.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None),
        ["c_custkey"],
        [("last_us", "max"), ("n_orders", "sum"), ("cents", "sum")],
        num_buckets=8,
    )

    # corpus anchor: max order date — per-block max partials, one
    # int64 per block to the driver
    import ray as _ray

    cust = cust.materialize()  # customer-cardinality; reused below
    anchor = max(
        int(pc.max(t.column("last_us")).as_py())
        for t in _ray.get(cust.to_arrow_refs())
        if t.num_rows
    )

    def _metrics(tbl: pa.Table) -> pa.Table:
        last = tbl.column("last_us").to_numpy()
        rec = (anchor - last) // 86_400_000_000  # whole days, exact
        nord = tbl.column("n_orders").to_numpy()
        cents = tbl.column("cents").to_numpy()
        return pa.table(
            {
                "c_custkey": tbl.column("c_custkey"),
                "recency_days": pa.array(rec.astype(np.int64)),
                "n_orders": pa.array(nord),
                "monetary_cents": pa.array(cents),
                # descending ntile == ascending over the negation
                "neg_orders": pa.array(-nord),
                "neg_cents": pa.array(-cents),
            }
        )

    m = cust.map_batches(_metrics, batch_format="pyarrow",
                         batch_size=None)
    r1 = global_scan(
        m, [("recency_days", "ascending"), ("c_custkey", "ascending")],
        [], rank_col="r_rk",
    )
    r2 = global_scan(
        r1, [("neg_orders", "ascending"), ("c_custkey", "ascending")],
        [], rank_col="f_rk",
    )
    r3 = global_scan(
        r2, [("neg_cents", "ascending"), ("c_custkey", "ascending")],
        [], rank_col="m_rk",
    ).materialize()  # customer-cardinality; reused for count + score
    n = r3.count()
    k = 5
    q, rem = divmod(n, k)
    cut = rem * (q + 1)

    def _ntile(rk: np.ndarray) -> np.ndarray:
        r0 = rk - 1
        return (
            np.where(r0 < cut, r0 // (q + 1),
                     rem + (r0 - cut) // max(q, 1))
            + 1
        ).astype(np.int64)

    def _score(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": tbl.column("c_custkey"),
                "recency_days": tbl.column("recency_days"),
                "n_orders": tbl.column("n_orders"),
                "monetary_cents": tbl.column("monetary_cents"),
                "r_score": pa.array(
                    _ntile(tbl.column("r_rk").to_numpy())
                ),
                "f_score": pa.array(
                    _ntile(tbl.column("f_rk").to_numpy())
                ),
                "m_score": pa.array(
                    _ntile(tbl.column("m_rk").to_numpy())
                ),
            }
        )

    return r3.map_batches(_score, batch_format="pyarrow",
                           batch_size=None)


QUERIES["rfm_scores"] = q_rfm_scores
ORACLE_SQL["rfm_scores"] = """
WITH cust AS (
  SELECT o_custkey AS c_custkey,
    CAST(datediff('day', max(o_orderdate),
                  (SELECT max(o_orderdate) FROM orders)) AS BIGINT)
      AS recency_days,
    CAST(count(*) AS BIGINT) AS n_orders,
    CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT)
      AS monetary_cents
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, recency_days, n_orders, monetary_cents,
  CAST(ntile(5) OVER (ORDER BY recency_days, c_custkey) AS BIGINT)
    AS r_score,
  CAST(ntile(5) OVER (ORDER BY n_orders DESC, c_custkey) AS BIGINT)
    AS f_score,
  CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, c_custkey)
       AS BIGINT) AS m_score
FROM cust
""".strip()


# --------------------------------------------------------------------------
# character-class profile (stylometric / quality features)

_PUNCT_RE = r"[!-/:-@\[-`{-~]"  # ASCII punctuation, same RE2 both sides


def q_char_class_profile(sf_dir: str):
    """Per-document character-class counts and ratios (digit /
    uppercase / punctuation / space shares of the character count) —
    the stylometric block of a quality or formatting classifier.
    Pure streaming map: four RE2 ``count_substring_regex`` kernels +
    one division each (docs with no characters drop on both sides)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _profile(tbl: pa.Table) -> pa.Table:
        s = pc.fill_null(tbl.column("text").combine_chunks(), "")
        n = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(
            np.int64
        )

        def cnt(pat: str) -> np.ndarray:
            return (
                pc.count_substring_regex(s, pat)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )

        digits, upper, punct, spaces = (
            cnt("[0-9]"), cnt("[A-Z]"), cnt(_PUNCT_RE), cnt(" ")
        )
        keep = n > 0
        nf = n[keep].astype(np.float64)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()).filter(
                    pa.array(keep)
                ),
                "n_chars": pa.array(n[keep]),
                "n_digits": pa.array(digits[keep]),
                "n_upper": pa.array(upper[keep]),
                "n_punct": pa.array(punct[keep]),
                "digit_ratio": pa.array(digits[keep] / nf),
                "upper_ratio": pa.array(upper[keep] / nf),
                "punct_ratio": pa.array(punct[keep] / nf),
                "space_ratio": pa.array(spaces[keep] / nf),
            }
        )

    return docs.map_batches(_profile, batch_format="pyarrow",
                            batch_size=None)


QUERIES["char_class_profile"] = q_char_class_profile
ORACLE_SQL["char_class_profile"] = rf"""
WITH c AS (
  SELECT doc_id,
    CAST(len(text) AS BIGINT) AS n_chars,
    CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
         AS BIGINT) AS n_digits,
    CAST(len(text) - len(regexp_replace(text, '[A-Z]', '', 'g'))
         AS BIGINT) AS n_upper,
    CAST(len(text) - len(regexp_replace(text, '{_PUNCT_RE}', '', 'g'))
         AS BIGINT) AS n_punct,
    CAST(len(text) - len(replace(text, ' ', '')) AS BIGINT) AS n_spaces
  FROM documents WHERE len(text) > 0
)
SELECT doc_id, n_chars, n_digits, n_upper, n_punct,
  CAST(n_digits AS DOUBLE) / CAST(n_chars AS DOUBLE) AS digit_ratio,
  CAST(n_upper AS DOUBLE) / CAST(n_chars AS DOUBLE) AS upper_ratio,
  CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) AS punct_ratio,
  CAST(n_spaces AS DOUBLE) / CAST(n_chars AS DOUBLE) AS space_ratio
FROM c
""".strip()


# --------------------------------------------------------------------------
# smoothed (empirical-Bayes) target encoding


_TE_SMOOTH_A = 10.0


def q_smoothed_target_encoding(sf_dir: str):
    """Smoothed target encoder table: per segment,
    ``(sum + A·prior) / (n + A)`` with A=10 and prior = the global
    mean — the empirical-Bayes shrinkage every practical target
    encoder applies so rare categories regress to the prior. Output is
    the fitted ENCODER ARTIFACT (one row per category), the thing a
    feature store persists.

    Float parity: prior = one division of exact int cents; the
    smoothed value chains exactly two IEEE ops in the same shape on
    both sides."""
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    oc = _orders_with_segment(sf_dir)

    def _partial(tbl: pa.Table) -> pa.Table:
        t = tbl.select(["c_mktsegment", "cents"]).append_column(
            "n", pa.array(np.ones(tbl.num_rows, np.int64))
        )
        return group_aggregate_table(
            t, ["c_mktsegment"], [("cents", "sum"), ("n", "sum")]
        )

    seg = hash_grouped_aggregate(
        oc.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["c_mktsegment"],
        [("cents", "sum"), ("n", "sum")],
        num_buckets=4,
    ).to_pandas()  # bounded: one row per segment
    gs, gn = int(seg["cents"].sum()), int(seg["n"].sum())
    prior = float(gs) / float(gn)
    s = seg["cents"].to_numpy().astype(np.float64)
    n = seg["n"].to_numpy().astype(np.int64)
    te = (s + _TE_SMOOTH_A * prior) / (n + 10).astype(np.float64)
    return pa.table(
        {
            "c_mktsegment": pa.array(
                seg["c_mktsegment"].to_numpy(dtype=object).tolist(),
                pa.string(),
            ),
            "n": pa.array(n),
            "te_smoothed": pa.array(te),
        }
    )


QUERIES["smoothed_target_encoding"] = q_smoothed_target_encoding
ORACLE_SQL["smoothed_target_encoding"] = """
WITH oc AS (
  SELECT c_mktsegment,
         CAST(round(o_totalprice*100, 0) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), seg AS (
  SELECT c_mktsegment, CAST(sum(cents) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM oc GROUP BY c_mktsegment
), g AS (
  SELECT CAST(sum(s) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS prior
  FROM seg
)
SELECT c_mktsegment, n,
  (CAST(s AS DOUBLE) + 10.0 * g.prior) / CAST(n + 10 AS DOUBLE)
    AS te_smoothed
FROM seg, g
""".strip()


# --------------------------------------------------------------------------
# Gini coefficient of customer spend (inequality / concentration)


def q_customer_spend_gini(sf_dir: str):
    """Gini coefficient of per-customer lifetime spend — the
    concentration scalar a marketplace-health or data-balance monitor
    tracks. Exact-integer construction: with spend sorted ascending
    (ties by custkey) and 1-based ranks, ``G = (2·Σ rank·x − (n+1)·Σx)
    / (n·Σx)`` — both sums exact integers, one final IEEE division.

    Scale shape: one custkey exchange to customer cardinality, one
    ``global_scan`` rank pass, then per-block ``Σ rank·x`` partials
    carried as PYTHON ints (the product overflows int64 at ~10⁹
    customers; block partials use the local-rank + offset split so
    each in-block dot stays in int64)."""
    import ray as _ray

    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate
    from ..stages.scan import global_scan

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_custkey": tbl.column("o_custkey").cast(pa.int64()),
                "cents": pa.array(_cents(tbl.column("o_totalprice"))),
            }
        )
        return group_aggregate_table(t, ["c_custkey"], [("cents", "sum")])

    cust = hash_grouped_aggregate(
        orders.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None),
        ["c_custkey"],
        [("cents", "sum")],
        num_buckets=8,
    )
    ranked = global_scan(
        cust, [("cents", "ascending"), ("c_custkey", "ascending")],
        [], rank_col="rk",
    )

    @_ray.remote
    def _block_sums(tbl: pa.Table):
        if tbl.num_rows == 0:
            return 0, 0, 0
        x = tbl.column("cents").to_numpy()
        rk = tbl.column("rk").to_numpy()
        off = int(rk[0])  # global_scan ranks are contiguous per block
        local = rk - off  # 0-based in-block rank: fits int64 dots
        sx = int(x.sum())
        srx = int(np.dot(local, x)) + off * sx  # Python-int combine
        return tbl.num_rows, sx, srx

    parts = _ray.get(
        [_block_sums.remote(r) for r in ranked.to_arrow_refs()]
    )
    n = sum(p[0] for p in parts)
    sx = sum(p[1] for p in parts)
    srx = sum(p[2] for p in parts)
    gini = float(2 * srx - (n + 1) * sx) / float(n * sx)
    return pa.table(
        {
            "n_customers": pa.array([n], pa.int64()),
            "total_cents": pa.array([sx], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


QUERIES["customer_spend_gini"] = q_customer_spend_gini
ORACLE_SQL["customer_spend_gini"] = """
WITH cust AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents, c_custkey) AS rk
  FROM cust
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS sx,
         sum(CAST(rk AS HUGEINT) * CAST(cents AS HUGEINT)) AS srx
  FROM ranked
)
SELECT n AS n_customers, sx AS total_cents,
  CAST(2 * srx - (CAST(n AS HUGEINT) + 1) * CAST(sx AS HUGEINT)
       AS DOUBLE)
    / CAST(CAST(n AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) AS gini
FROM agg
""".strip()


# --------------------------------------------------------------------------
# preference-pair construction (reward-model / ranking training data)


def q_preference_pairs(sf_dir: str):
    """Per user: one (chosen, rejected) training pair — the
    highest-value ``purchase`` event vs the highest-value ``view``
    event (ties to the smaller event_id), for users having both.
    The deterministic pair-mining shape reward-model data construction
    uses (choose a positive and a hard negative per context).

    Scale shape: both argmaxes ride ONE user_id exchange as packed
    ``value_cents·2³² + (2³²−1−event_id)`` max-keys (argmax with
    min-id tie-break in a single integer max), per-batch partials
    collapse first; the pair emit is a vectorized per-partition map."""
    from ..stages.exchange import hash_exchange
    from ..stages.groupagg import group_aggregate_table

    ev = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "value"])

    def _partial(tbl: pa.Table) -> pa.Table:
        et = tbl.column("event_type")
        keep = pc.or_(pc.equal(et, "purchase"), pc.equal(et, "view"))
        t = tbl.filter(keep)
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "is_purchase": pa.array([], pa.int8()),
                    "packed": pa.array([], pa.int64()),
                }
            )
        cents = np.round(
            t.column("value").cast(pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * 100.0
        ).astype(np.int64)
        eid = t.column("event_id").to_numpy()
        if cents.min() < 0 or eid.max() >= (1 << 32):
            raise ValueError("preference_pairs: pack width exceeded")
        packed = cents * (1 << 32) + ((1 << 32) - 1 - eid)
        p = pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "is_purchase": pa.array(
                    pc.equal(t.column("event_type"), "purchase")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int8)
                ),
                "packed": pa.array(packed),
            }
        )
        return group_aggregate_table(
            p, ["user_id", "is_purchase"], [("packed", "max")]
        )

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("chosen_event_id", pa.int64()),
            ("chosen_cents", pa.int64()),
            ("rejected_event_id", pa.int64()),
            ("rejected_cents", pa.int64()),
        ]
    )

    def _pairs(pidx: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        m = group_aggregate_table(
            tbl, ["user_id", "is_purchase"], [("packed", "max")]
        )
        uid = m.column("user_id").to_numpy()
        isp = m.column("is_purchase").to_numpy()
        packed = m.column("packed").to_numpy()
        order = np.lexsort((isp, uid))
        uid, isp, packed = uid[order], isp[order], packed[order]
        # runs of length 2 = users with BOTH sides (view row first)
        both = (
            (uid[:-1] == uid[1:]) & (isp[:-1] == 0) & (isp[1:] == 1)
            if len(uid) > 1
            else np.zeros(0, bool)
        )
        vi = np.flatnonzero(both)
        chosen, rejected = packed[vi + 1], packed[vi]
        mask = np.int64((1 << 32) - 1)
        return pa.table(
            {
                "user_id": pa.array(uid[vi]),
                "chosen_event_id": pa.array(
                    mask - (chosen & mask)
                ),
                "chosen_cents": pa.array(chosen >> np.int64(32)),
                "rejected_event_id": pa.array(
                    mask - (rejected & mask)
                ),
                "rejected_cents": pa.array(rejected >> np.int64(32)),
            }
        )

    return hash_exchange(
        ev.map_batches(_partial, batch_format="pyarrow",
                       batch_size=None),
        "user_id",
        8,
        _pairs,
        empty_schema=out_schema,
    )


QUERIES["preference_pairs"] = q_preference_pairs
ORACLE_SQL["preference_pairs"] = """
WITH pv AS (
  SELECT user_id, event_id, event_type,
         CAST(round(value*100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'view')
), best AS (
  SELECT user_id, event_type, event_id, cents FROM (
    SELECT user_id, event_type, event_id, cents,
      row_number() OVER (PARTITION BY user_id, event_type
                         ORDER BY cents DESC, event_id) AS rk
    FROM pv) WHERE rk = 1
)
SELECT p.user_id,
  p.event_id AS chosen_event_id, p.cents AS chosen_cents,
  v.event_id AS rejected_event_id, v.cents AS rejected_cents
FROM best p JOIN best v USING (user_id)
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
""".strip()


# --------------------------------------------------------------------------
# curriculum data ordering (phase by difficulty, shuffled within phase)


_CURRICULUM_PHASES = 4


def q_curriculum_schedule(sf_dir: str):
    """Curriculum training order: documents staged into 4 phases by
    difficulty (ntile over (n_chars, doc_id) — short/easy docs first),
    deterministically shuffled WITHIN each phase (splitmix64, the
    epoch-shuffle convention), with the global training position from
    one prefix scan. The actual consumption ORDER a curriculum
    dataloader reads, constructed RNG-state-free so it is identical
    across retries, resumes and parallelism levels.

    Scale shape: total count from parquet footers; ONE global_scan
    over (phase, shuffle_key) — rank arithmetic is per-row; nothing
    but O(blocks) ints reaches the driver."""
    import pyarrow.parquet as _pq

    from ..functions.hashing import rehash64
    from ..stages.scan import global_scan

    n_total = _pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows
    k = _CURRICULUM_PHASES
    q, rem = divmod(n_total, k)
    cut = rem * (q + 1)

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def _key(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy().astype(np.uint64)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "n_chars": tbl.column("n_chars").cast(pa.int64()),
                "x": pa.array(rehash64(ids, 0), pa.uint64()),
            }
        )

    ranked = global_scan(
        docs.map_batches(_key, batch_format="pyarrow", batch_size=None),
        [("n_chars", "ascending"), ("doc_id", "ascending")],
        [],
        rank_col="drk",
    )

    def _phase(tbl: pa.Table) -> pa.Table:
        r0 = tbl.column("drk").to_numpy() - 1
        ph = np.where(
            r0 < cut, r0 // (q + 1), rem + (r0 - cut) // max(q, 1)
        ).astype(np.int64) + 1
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "phase": pa.array(ph),
                "x": tbl.column("x"),
            }
        )

    phased = ranked.map_batches(_phase, batch_format="pyarrow",
                                batch_size=None)
    ordered = global_scan(
        phased,
        [("phase", "ascending"), ("x", "ascending"),
         ("doc_id", "ascending")],
        [],
        rank_col="position",
    )
    return ordered.map_batches(
        lambda t: t.select(["doc_id", "phase", "position"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def _curriculum_sql() -> str:
    from .text_queries import _splitmix_mulmod

    k = _CURRICULUM_PHASES
    return f"""
WITH s0 AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(doc_id AS UBIGINT) AS x
  FROM documents
), s1 AS (SELECT doc_id, n_chars, xor(x, x >> 30) AS x FROM s0
), s2 AS (SELECT doc_id, n_chars, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM s1
), s3 AS (SELECT doc_id, n_chars, xor(x, x >> 27) AS x FROM s2
), s4 AS (SELECT doc_id, n_chars, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM s3
), s5 AS (SELECT doc_id, n_chars, xor(x, x >> 31) AS x FROM s4
), ph AS (
  SELECT doc_id, x,
         CAST(ntile({k}) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
           AS phase
  FROM s5
)
SELECT doc_id, phase,
  CAST(row_number() OVER (
    ORDER BY phase, CAST(x AS HUGEINT), doc_id) AS BIGINT) AS position
FROM ph
""".strip()


QUERIES["curriculum_schedule"] = q_curriculum_schedule
ORACLE_SQL["curriculum_schedule"] = _curriculum_sql()
