"""Distributed equi-join suite: documents enriched with embeddings
metadata via the side-tagged hash join (stages/join.py) — the
large × large join shape Ray Data lacks natively in this version."""

from __future__ import annotations

import os

from ..stages.join import hash_equi_join


def _docs(sf_dir: str):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )


def _emb(sf_dir: str):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label"],
    )


def q_docs_embeddings_join(sf_dir: str):
    """Inner hash join on doc_id == vec_id: both sides stream through
    one side-tagged exchange; many-to-many expansion is vectorized
    (searchsorted runs + repeat)."""
    return hash_equi_join(
        _docs(sf_dir),
        _emb(sf_dir),
        left_on="doc_id",
        right_on="vec_id",
        right_columns=["label"],
        how="inner",
        num_partitions=16,
    )


def q_docs_embeddings_left_join(sf_dir: str):
    """Left join against the label-0 subset of embeddings: unmatched
    documents surface with a typed-null label (SQL LEFT JOIN
    semantics), exercising the null-fill path of the join kernel."""
    return hash_equi_join(
        _docs(sf_dir),
        _emb_label0(sf_dir),
        left_on="doc_id",
        right_on="vec_id",
        right_columns=["label"],
        how="left",
        num_partitions=16,
    )


def _emb_label0(sf_dir: str):
    """Label-0 subset — guarantees unmatched documents at every sf tier
    (at small tiers every doc has an embedding row, which would make an
    anti join against the full table vacuously empty — and a 0-row Ray
    dataset drops its schema under to_pandas)."""
    import pyarrow.compute as pc

    return _emb(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("label"), 0)),
        batch_format="pyarrow",
        batch_size=None,
    )


def q_docs_without_embeddings(sf_dir: str):
    """Distributed ANTI join (SQL NOT EXISTS): documents lacking a
    label-0 embedding row — both sides stream, no broadcast (contrast
    with the broadcast anti-lookup in
    relational_queries.customers_without_orders, which needs a small
    right side)."""
    return hash_equi_join(
        _docs(sf_dir),
        _emb_label0(sf_dir),
        left_on="doc_id",
        right_on="vec_id",
        how="anti",
        num_partitions=16,
    )


def q_docs_with_embeddings_semi(sf_dir: str):
    """Distributed SEMI join (SQL EXISTS): each document with at least
    one embedding row, emitted once regardless of match multiplicity."""
    return hash_equi_join(
        _docs(sf_dir),
        _emb(sf_dir),
        left_on="doc_id",
        right_on="vec_id",
        how="semi",
        num_partitions=16,
    )


QUERIES = {
    "docs_embeddings_join": q_docs_embeddings_join,
    "docs_embeddings_left_join": q_docs_embeddings_left_join,
    "docs_without_embeddings": q_docs_without_embeddings,
    "docs_with_embeddings_semi": q_docs_with_embeddings_semi,
}

ORACLE_SQL = {
    "docs_embeddings_join": """
SELECT d.doc_id, d.lang, d.n_chars, e.label
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""".strip(),
    "docs_embeddings_left_join": """
SELECT d.doc_id, d.lang, d.n_chars, e.label
FROM documents d
LEFT JOIN (SELECT * FROM embeddings WHERE label = 0) e
  ON d.doc_id = e.vec_id
""".strip(),
    "docs_without_embeddings": """
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                  WHERE e.vec_id = d.doc_id AND e.label = 0)
""".strip(),
    "docs_with_embeddings_semi": """
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
""".strip(),
}


def q_error_window_events(sf_dir: str):
    """Distributed interval (range) join: every event falling inside a
    120-second window opened by each error event — the point-in-range
    many-to-many join Ray Data lacks (stages/interval_join.py:
    time-bucketed exchange, intervals replicated per overlapped
    bucket, searchsorted run-expansion kernel)."""
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.interval_join import interval_join

    win_us = 120_000_000  # 120 s, integer µs end to end

    ev = read_parquet_tuned(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "event_type"],
    )

    def _points(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "ts_us": t.column("ts").cast(pa.int64()),
            }
        )

    def _wins(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        e = t.filter(pc.equal(t.column("event_type"), "error"))
        start = e.column("ts").cast(pa.int64())
        return pa.table(
            {
                "win_id": e.column("event_id").cast(pa.int64()),
                "start_us": start,
                "end_us": pc.add(start, win_us),
            }
        )

    points = ev.map_batches(_points, batch_format="pyarrow", batch_size=None)
    wins = ev.map_batches(_wins, batch_format="pyarrow", batch_size=None)
    # bucket_width == window length: each interval lands in <= 2 buckets
    return interval_join(
        points,
        wins,
        point_ts_col="ts_us",
        start_col="start_us",
        end_col="end_us",
        point_cols=["event_id"],
        interval_cols=["win_id"],
        bucket_width=win_us,
        num_partitions=16,
    )


QUERIES["error_window_events"] = q_error_window_events
ORACLE_SQL["error_window_events"] = """
WITH win AS (
  SELECT CAST(event_id AS BIGINT) AS win_id, ts AS start_ts,
         ts + INTERVAL 120 SECOND AS end_ts
  FROM events WHERE event_type = 'error'
)
SELECT w.win_id, CAST(e.event_id AS BIGINT) AS event_id
FROM win w JOIN events e ON e.ts >= w.start_ts AND e.ts < w.end_ts
""".strip()


def q_docs_embeddings_join_hot(sf_dir: str):
    """The inner join again, but with a handful of keys declared HOT —
    their right rows broadcast and pre-joined map-side, riding the
    exchange as spread passthrough rows (stages/join.py hot_keys).
    Shares the plain join's oracle: skew handling must be invisible in
    the output (the same proof pattern as flagship_salted)."""
    return hash_equi_join(
        _docs(sf_dir),
        _emb(sf_dir),
        left_on="doc_id",
        right_on="vec_id",
        right_columns=["label"],
        how="inner",
        num_partitions=16,
        hot_keys=[0, 7, 13, 42],
    )


QUERIES["docs_embeddings_join_hot"] = q_docs_embeddings_join_hot
ORACLE_SQL["docs_embeddings_join_hot"] = ORACLE_SQL["docs_embeddings_join"]


def _lineitem_keys(sf_dir: str):
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned

    ds = read_parquet_tuned(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )

    def _cast(tbl):
        return tbl.set_column(
            tbl.schema.get_field_index("l_linenumber"),
            "l_linenumber",
            tbl.column("l_linenumber").cast(pa.int64()),
        )

    return ds.map_batches(_cast, batch_format="pyarrow", batch_size=None)


def _big_orders(sf_dir: str):
    from ..sources.parquet import read_parquet_tuned

    ds = read_parquet_tuned(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice"],
    )

    def _keep(tbl):
        import pyarrow.compute as pc

        return tbl.filter(
            pc.greater(tbl.column("o_totalprice"), 400000.0)
        ).select(["o_orderkey"])

    return ds.map_batches(_keep, batch_format="pyarrow", batch_size=None)


def q_bloom_semi_lineitems(sf_dir: str):
    """Lineitems of high-value orders via the bloom-pruned exact semi
    join (stages/bloom.py): the broadcast bitset prunes the probe side
    map-side, the exchange ships only bloom-positive rows, and the
    exact hash semi join removes false positives."""
    from ..stages.bloom import bloom_semi_join

    return bloom_semi_join(
        _lineitem_keys(sf_dir),
        _big_orders(sf_dir),
        left_on="l_orderkey",
        right_on="o_orderkey",
        how="semi",
        num_partitions=16,
    )


def q_bloom_anti_lineitems(sf_dir: str):
    """The anti complement: bloom-negative rows bypass the exchange
    entirely (definite non-matches), only the positive sliver is
    exactness-checked."""
    from ..stages.bloom import bloom_semi_join

    return bloom_semi_join(
        _lineitem_keys(sf_dir),
        _big_orders(sf_dir),
        left_on="l_orderkey",
        right_on="o_orderkey",
        how="anti",
        num_partitions=16,
    )


QUERIES["bloom_semi_lineitems"] = q_bloom_semi_lineitems
QUERIES["bloom_anti_lineitems"] = q_bloom_anti_lineitems
ORACLE_SQL["bloom_semi_lineitems"] = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
""".strip()
ORACLE_SQL["bloom_anti_lineitems"] = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
FROM lineitem l
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > 400000)
""".strip()


def q_docs_group_stats_join(sf_dir: str):
    """Feature augmentation on a COMPOSITE key: per-(lang, source)
    document count and mean length joined back onto every document —
    hash_equi_join_multi packs the key tuple injectively
    (length-prefixed segments) and rides the single-key join machinery.
    Mean = exact int sum with one IEEE division, shared with the SQL."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate
    from ..stages.join import hash_equi_join_multi

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "n_chars"],
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": tbl.column("lang"),
                "source": tbl.column("source"),
                "n_docs": pa.array(np.ones(tbl.num_rows, np.int64)),
                "chars": tbl.column("n_chars").cast(pa.int64()),
            }
        )
        return group_aggregate_table(
            t, ["lang", "source"], [("n_docs", "sum"), ("chars", "sum")]
        )

    stats = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["lang", "source"],
        [("n_docs", "sum"), ("chars", "sum")],
        num_buckets=8,
    )

    def _mean(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_docs").cast(pa.int64()).to_numpy()
        ch = tbl.column("chars").cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "lang": tbl.column("lang"),
                "source": tbl.column("source"),
                "grp_docs": pa.array(n),
                "grp_mean_chars": pa.array(ch.astype(np.float64) / n),
            }
        )

    stats = stats.map_batches(_mean, batch_format="pyarrow", batch_size=None)
    return hash_equi_join_multi(
        docs,
        stats,
        left_on=["lang", "source"],
        right_on=["lang", "source"],
        right_columns=["grp_docs", "grp_mean_chars"],
        how="inner",
        num_partitions=8,
    )


QUERIES["docs_group_stats_join"] = q_docs_group_stats_join
ORACLE_SQL["docs_group_stats_join"] = """
WITH g AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS grp_docs,
    CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*)
      AS grp_mean_chars
  FROM documents GROUP BY lang, source)
SELECT d.doc_id, d.lang, d.source, d.n_chars, g.grp_docs,
       g.grp_mean_chars
FROM documents d JOIN g ON d.lang = g.lang AND d.source = g.source
""".strip()


def q_join_size_estimate(sf_dir: str):
    """Exact join-size + skew statistics for orders ⋈ lineitem on
    orderkey without executing the join (stages/join.py:
    join_size_stats — per-key count partials only on the wire; the
    numbers the broadcast/salting planners consume)."""
    from ..sources.parquet import read_parquet_tuned
    from ..stages.join import join_size_stats

    orders = read_parquet_tuned(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey"]
    )
    lineitem = read_parquet_tuned(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"]
    )
    return join_size_stats(orders, "o_orderkey", lineitem, "l_orderkey")


QUERIES["join_size_estimate"] = q_join_size_estimate
ORACLE_SQL["join_size_estimate"] = """
WITH l AS (
  SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1
), o AS (
  SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1
)
SELECT
  CAST((SELECT count(*) FROM o) AS BIGINT) AS n_left_keys,
  CAST((SELECT count(*) FROM l) AS BIGINT) AS n_right_keys,
  CAST((SELECT count(*) FROM o JOIN l USING (k)) AS BIGINT)
    AS n_matched_keys,
  CAST(coalesce((SELECT sum(o.c * l.c) FROM o JOIN l USING (k)), 0)
    AS BIGINT) AS join_rows,
  CAST(coalesce((SELECT max(c) FROM o), 0) AS BIGINT) AS max_left_mult,
  CAST(coalesce((SELECT max(c) FROM l), 0) AS BIGINT) AS max_right_mult,
  CAST((SELECT sum(c) FROM o) AS BIGINT) AS n_left_rows,
  CAST((SELECT sum(c) FROM l) AS BIGINT) AS n_right_rows,
  CAST(coalesce((SELECT sum(o.c) FROM o JOIN l USING (k)), 0)
    AS BIGINT) AS matched_left_rows,
  CAST(coalesce((SELECT sum(l.c) FROM o JOIN l USING (k)), 0)
    AS BIGINT) AS matched_right_rows
""".strip()


def q_bucketed_join_roundtrip(sf_dir: str):
    """Storage-layout join: both sides first persisted as
    bucket-aligned parquet (the resumable partitioned writer, paying
    the layout cost ONCE), then joined bucket-by-bucket with zero
    exchange (stages/join.py:bucketed_storage_join). The repeated-join
    pattern for 100 TB reference data; rerunning skips completed
    bucket writes via the lineage fingerprint."""
    import hashlib

    from ..sources.parquet import read_parquet_tuned
    from ..state.lineage import write_partitioned_checkpointed
    from ..stages.join import bucketed_storage_join

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    base = os.path.join("/tmp/graft_bucketed", tag)
    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    )
    emb = read_parquet_tuned(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label"],
    )
    ldir = os.path.join(base, "docs")
    rdir = os.path.join(base, "embeddings")
    write_partitioned_checkpointed(
        docs, "doc_id", 8, ldir, fingerprint=sf_dir
    )
    write_partitioned_checkpointed(
        emb, "vec_id", 8, rdir, fingerprint=sf_dir
    )
    return bucketed_storage_join(
        ldir, rdir, "doc_id", "vec_id", join_type="inner"
    )


QUERIES["bucketed_join_roundtrip"] = q_bucketed_join_roundtrip
ORACLE_SQL["bucketed_join_roundtrip"] = """
SELECT d.doc_id, d.lang, e.label
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""".strip()


def q_fk_integrity_audit(sf_dir: str):
    """Referential-integrity audit across three FK relations — child
    orphan rows counted WITHOUT materializing any join, as
    ``n_right_rows - matched_right_rows`` from join_size_stats
    (parent on the left, unique keys). Two relations audit the real
    schema (proven-zero orphans is the assertion); the third audits a
    deterministically corrupted parent (orders with
    o_orderkey % 97 == 0 dropped — a partially-deleted dimension), so
    the non-zero path is exercised at every tier."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..sources.parquet import read_parquet_tuned
    from ..stages.join import join_size_stats

    def _tbl(name, cols):
        return read_parquet_tuned(
            os.path.join(sf_dir, f"{name}.parquet"), columns=cols
        )

    def _orphans(parent, pkey, child, ckey):
        st = join_size_stats(parent, pkey, child, ckey).iloc[0]
        return int(st["n_right_rows"]), int(
            st["n_right_rows"] - st["matched_right_rows"]
        )

    rows = []
    n, o = _orphans(
        _tbl("orders", ["o_orderkey"]), "o_orderkey",
        _tbl("lineitem", ["l_orderkey"]), "l_orderkey",
    )
    rows.append(("lineitem->orders", n, o))
    n, o = _orphans(
        _tbl("customer", ["c_custkey"]), "c_custkey",
        _tbl("orders", ["o_custkey"]), "o_custkey",
    )
    rows.append(("orders->customer", n, o))
    corrupted = _tbl("orders", ["o_orderkey"]).map_batches(
        lambda t: t.filter(
            pc.not_equal(
                pc.subtract(
                    t.column("o_orderkey"),
                    pc.multiply(
                        pc.divide(t.column("o_orderkey"), 97), 97
                    ),
                ),
                0,
            )
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    n, o = _orphans(
        corrupted, "o_orderkey",
        _tbl("lineitem", ["l_orderkey"]), "l_orderkey",
    )
    rows.append(("lineitem->orders_corrupted", n, o))
    return pd.DataFrame(
        rows, columns=["relation", "n_child_rows", "n_orphans"]
    ).astype({"n_child_rows": "int64", "n_orphans": "int64"})


QUERIES["fk_integrity_audit"] = q_fk_integrity_audit
ORACLE_SQL["fk_integrity_audit"] = """
SELECT 'lineitem->orders' AS relation,
  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child_rows,
  CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    AS BIGINT) AS n_orphans
UNION ALL
SELECT 'orders->customer',
  CAST((SELECT count(*) FROM orders) AS BIGINT),
  CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS
    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    AS BIGINT)
UNION ALL
SELECT 'lineitem->orders_corrupted',
  CAST((SELECT count(*) FROM lineitem) AS BIGINT),
  CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
       AND o.o_orderkey % 97 <> 0)) AS BIGINT)
""".strip()


def q_three_way_join_revenue(sf_dir: str):
    """Chained multi-way equi-join: orders ⋈ customer ⋈ nation, then
    revenue (integer cents) and order counts per (nation, priority).
    Two back-to-back side-tagged hash exchanges — the chain shape a
    star-schema query compiles to when no side is small enough to
    broadcast (here nation IS broadcast-sized; auto_equi_join would
    pick that — this query pins the pure chained-exchange path the
    planner falls back to at scale)."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    orders = read_parquet_tuned(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority", "o_totalprice"],
    )
    customer = read_parquet_tuned(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    nation = read_parquet_tuned(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    j1 = hash_equi_join(
        orders, customer,
        left_on="o_custkey", right_on="c_custkey",
        right_columns=["c_nationkey"],
        how="inner", num_partitions=16,
    )
    j2 = hash_equi_join(
        j1, nation,
        left_on="c_nationkey", right_on="n_nationkey",
        right_columns=["n_name"],
        how="inner", num_partitions=16,
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        p = tbl.column("o_totalprice").to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                "n_name": tbl.column("n_name"),
                "o_orderpriority": tbl.column("o_orderpriority"),
                "n_orders": pa.array(
                    np.ones(tbl.num_rows, np.int64)
                ),
                "revenue_cents": pa.array(
                    np.floor(p * 100 + 0.5).astype(np.int64)
                ),
            }
        )
        return group_aggregate_table(
            t, ["n_name", "o_orderpriority"],
            [("n_orders", "sum"), ("revenue_cents", "sum")],
        )

    return hash_grouped_aggregate(
        j2.map_batches(_partial, batch_format="pyarrow",
                       batch_size=None),
        ["n_name", "o_orderpriority"],
        [("n_orders", "sum"), ("revenue_cents", "sum")],
        num_buckets=4,
    )


QUERIES["three_way_join_revenue"] = q_three_way_join_revenue
ORACLE_SQL["three_way_join_revenue"] = """
SELECT n.n_name, o.o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
    AS BIGINT) AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1, 2
""".strip()
