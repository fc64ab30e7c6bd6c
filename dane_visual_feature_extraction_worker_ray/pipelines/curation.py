"""End-to-end training-data curation pipeline, fully oracle-checked.

The composed shape every corpus build runs (the brief's "would a user
of the reference switch": quality gate → dedup → subset → stats), as
ONE streaming Ray pipeline over the ``documents`` table:

1. quality filter (per-batch, text_quality's exact definitions:
   single-space tokens, integer counts, one IEEE division),
2. exact dedup keeping the MIN doc_id per distinct text — survivor
   attributes (lang) ride the aggregation as a combined
   ``doc_id * K + lang_code`` key (min over the group = min-doc's
   code, because doc_id strictly dominates), so no join-back and no
   corpus-scale broadcast; the lang-code table itself is a distinct
   pass over a bounded-cardinality column (legitimately broadcast),
3. deterministic systematic sample (doc_id % 3 == 0),
4. per-language aggregate (n_docs, total_chars) via the partial →
   hash-exchange combine.

Reference analog: the end-to-end job chain (download → process →
upload) in ``/root/reference/worker.py:66-90`` — re-expressed as
dataset stages instead of callback steps.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate
from ..stages.text import _STOPWORDS

MIN_WORDS = 30
MAX_STOPWORD_RATIO = 0.12
SAMPLE_MOD = 3
_LANG_K = 1024  # combined-key multiplier; lang codes < _LANG_K


def q_curation_stats(sf_dir: str):
    import ray

    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    # distinct langs (bounded cardinality) → stable code table
    lang_parts = docs.map_batches(
        lambda t: pa.table({"lang": t.column("lang").unique()}),
        batch_format="pyarrow",
        batch_size=None,
    )
    langs = sorted(
        set(
            l
            for b in lang_parts.iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
            for l in b.column("lang").to_pylist()
        )
    )
    assert len(langs) < _LANG_K
    code_of = {l: i for i, l in enumerate(langs)}
    langs_ref = ray.put(np.array(langs, dtype=object))
    codes_ref = ray.put(code_of)

    stop_arr = pa.array(sorted(_STOPWORDS), pa.string())

    def _filter_and_key(tbl: pa.Table) -> pa.Table:
        """Quality gate + per-batch dedup partial on (hash, text)."""
        from ..functions.hashing import hash64
        from ..functions.tokenize import space_stopword_stats

        n_words, n_stop = space_stopword_stats(
            tbl.column("text"), stop_arr
        )
        nw_safe = np.where(n_words == 0, 1, n_words)
        ratio = n_stop.astype(np.float64) / nw_safe.astype(np.float64)
        keep = (n_words >= MIN_WORDS) & (ratio <= MAX_STOPWORD_RATIO)

        t = tbl.filter(pa.array(keep))
        if t.num_rows == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "text": pa.array([], pa.string()),
                    "combined": pa.array([], pa.int64()),
                }
            )
        cmap = ray.get(codes_ref)
        st = t.column("text").to_pandas()
        codes = (
            t.column("lang").to_pandas().map(cmap).to_numpy(dtype=np.int64)
        )
        ids = t.column("doc_id").to_numpy()
        combined = ids * _LANG_K + codes
        p = pa.table(
            {
                "h": pa.array(hash64(st)),
                "text": t.column("text"),
                "combined": pa.array(combined),
            }
        )
        return group_aggregate_table(p, ["h", "text"], [("combined", "min")])

    partials = docs.map_batches(
        _filter_and_key, batch_format="pyarrow", batch_size=None
    )
    survivors = hash_grouped_aggregate(
        partials, ["h", "text"], [("combined", "min")]
    )

    def _sample_and_partial(tbl: pa.Table) -> pa.Table:
        comb = tbl.column("combined").to_numpy()
        ids = comb // _LANG_K
        codes = comb % _LANG_K
        keep = (ids % SAMPLE_MOD) == 0
        if not keep.any():
            return pa.table(
                {
                    "code": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "chars": pa.array([], pa.int64()),
                }
            )
        import pyarrow.compute as pc

        n_chars = pc.utf8_length(tbl.column("text")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        p = pa.table(
            {
                "code": pa.array(codes[keep]),
                "n": pa.array(np.ones(int(keep.sum()), np.int64)),
                "chars": pa.array(n_chars[keep]),
            }
        )
        return group_aggregate_table(
            p, ["code"], [("n", "sum"), ("chars", "sum")]
        )

    agg = hash_grouped_aggregate(
        survivors.map_batches(
            _sample_and_partial, batch_format="pyarrow", batch_size=None
        ),
        ["code"],
        [("n", "sum"), ("chars", "sum")],
    )

    def _finish(tbl: pa.Table) -> pa.Table:
        langs_arr = ray.get(langs_ref)
        codes = tbl.column("code").to_numpy()
        return pa.table(
            {
                "lang": pa.array(langs_arr[codes], pa.string()),
                "n_docs": tbl.column("n").cast(pa.int64()),
                "total_chars": tbl.column("chars").cast(pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

SQL_CURATION = f"""
WITH q AS (
  SELECT doc_id, text, lang FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_WORDS}
    AND CAST(len(list_filter(string_split(text, ' '),
          x -> x IN ({_STOPLIST_SQL}))) AS DOUBLE)
        / len(string_split(text, ' ')) <= {MAX_STOPWORD_RATIO}
), d AS (
  SELECT text, min(doc_id) AS doc_id FROM q GROUP BY text
), s AS (
  SELECT q.doc_id, q.text, q.lang FROM q JOIN d ON q.doc_id = d.doc_id
), samp AS (
  SELECT * FROM s WHERE doc_id % {SAMPLE_MOD} = 0
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM samp GROUP BY lang
""".strip()

QUERIES = {"curation_stats": q_curation_stats}
ORACLE_SQL = {"curation_stats": SQL_CURATION}


def q_checkpointed_write_roundtrip(sf_dir: str):
    """K1–K5 on the gate surface for a SECOND pipeline: the documents
    table written through the generic resumable partitioned writer
    (``state/lineage.write_partitioned_checkpointed`` — atomic-renamed
    ``bucket=`` dirs, ``_SUCCESS.json`` lineage, fingerprint skip) and
    read back. The oracle is the source table itself, so the entire
    write→resume→read path is hash-verified, not just row-counted.
    The fingerprint binds the input file's size+mtime, so a
    regenerated corpus can never be satisfied by a stale checkpoint;
    re-runs on unchanged input skip every bucket (resume exercised on
    every driver invocation after the first)."""
    import tempfile

    from ..sources.parquet import read_parquet_tuned
    from ..state.lineage import (
        read_checkpointed,
        write_partitioned_checkpointed,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = f"{src}:{st.st_size}:{st.st_mtime_ns}"
    # stable scratch dir per input path (no salted hash())
    slug = "".join(c if c.isalnum() else "_" for c in sf_dir).strip("_")
    out_dir = os.path.join(
        tempfile.gettempdir(), f"graft_ckpt_roundtrip_{slug}"
    )
    docs = read_parquet_tuned(
        src, columns=["doc_id", "lang", "n_chars"]
    )
    write_partitioned_checkpointed(
        docs, "doc_id", 8, out_dir, fingerprint=fp
    )
    return read_checkpointed(out_dir)


QUERIES["checkpointed_write_roundtrip"] = q_checkpointed_write_roundtrip
ORACLE_SQL["checkpointed_write_roundtrip"] = (
    "SELECT doc_id, lang, n_chars FROM documents"
)


# --------------------------------------------------------------------------
# constraint validation suite (Deequ-style data-quality checks)

ACCEPTED_LANGS = ("de", "en", "es", "fr", "zh")


def q_data_quality_checks(sf_dir: str):
    """Constraint-validation report — the data-quality gate a 100-TB
    ingest runs before anything downstream trusts the corpus: one row
    per check with its exact violation count. The clean synthetic
    tables satisfy every constraint, so violations are PLANTED
    (deterministic doc_id/o_orderkey mod classes, mirrored in the
    oracle — the engine's planted-oracle pattern): duplicated ids
    (%41), null text (%37), corrupted n_chars (%43), an unaccepted
    lang code (%47), and dangling order custkeys (%53).

    Scale shape per check: uniqueness = distributed distinct count
    (key-hash grouped, distributed row count — the distinct table
    never reaches the driver); the three column constraints share ONE
    scan emitting 1-row count partials; referential integrity is the
    distributed anti join's count. Only O(checks) rows ever reach the
    driver."""
    import ray

    from ..sources.parquet import read_parquet_tuned
    from ..stages.join import hash_equi_join

    def _aug(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = tbl.column("doc_id").cast(pa.int64()).to_numpy()
        text = tbl.column("text").to_pandas()
        text = text.where(ids % 37 != 0, None)
        n_chars = tbl.column("n_chars").cast(pa.int64()).to_numpy()
        n_chars = n_chars + (ids % 43 == 0)
        lang = tbl.column("lang").to_pandas()
        lang = lang.where(ids % 47 != 0, "xx")
        base = pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array(text, pa.string()),
                "n_chars": pa.array(n_chars.astype(np.int64)),
                "lang": pa.array(lang, pa.string()),
            }
        )
        dup = base.filter(pa.array(ids % 41 == 0))
        return pa.concat_tables([base, dup])

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "n_chars", "lang"],
    ).map_batches(_aug, batch_format="pyarrow")

    # --- the three column checks + row count: ONE shared scan -------
    def _scan_partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = tbl.column("text")
        null_text = text.null_count
        tlen = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        nch = tbl.column("n_chars").to_numpy()
        valid = pc.is_valid(text).to_numpy(zero_copy_only=False)
        mismatch = int((valid & (nch != np.where(valid, tlen, 0))).sum())
        lang = tbl.column("lang").to_pandas()
        bad_lang = int(
            (~lang.isin(ACCEPTED_LANGS) | lang.isna()).sum()
        )
        neg = int((nch < 0).sum())
        return pa.table(
            {
                "n_rows": pa.array([tbl.num_rows], pa.int64()),
                "null_text": pa.array([null_text], pa.int64()),
                "mismatch": pa.array([mismatch], pa.int64()),
                "bad_lang": pa.array([bad_lang], pa.int64()),
                "neg": pa.array([neg], pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            docs.map_batches(
                _scan_partial, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    tot = {
        c: sum(int(t.column(c)[i].as_py()) for t in parts
               for i in range(t.num_rows))
        for c in ["n_rows", "null_text", "mismatch", "bad_lang", "neg"]
    }

    # --- uniqueness: distributed distinct count ----------------------
    def _distinct_partial(tbl: pa.Table) -> pa.Table:
        ids = np.unique(tbl.column("doc_id").to_numpy())
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "one": pa.array(np.ones(len(ids), np.int64)),
            }
        )

    distinct = hash_grouped_aggregate(
        docs.map_batches(
            _distinct_partial, batch_format="pyarrow", batch_size=None
        ),
        ["doc_id"],
        [("one", "sum")],
    ).count()

    # --- referential integrity: distributed anti join ----------------
    def _aug_orders(tbl: pa.Table) -> pa.Table:
        ok = tbl.column("o_orderkey").cast(pa.int64()).to_numpy()
        ck = tbl.column("o_custkey").cast(pa.int64()).to_numpy()
        ck = ck + np.where(ok % 53 == 0, 10_000_000, 0)
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "o_custkey": pa.array(ck.astype(np.int64)),
            }
        )

    orders = read_parquet_tuned(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    ).map_batches(_aug_orders, batch_format="pyarrow")
    customer = read_parquet_tuned(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    orphans = hash_equi_join(
        orders, customer, "o_custkey", "c_custkey", how="anti",
        num_partitions=16,
    ).count()

    names = [
        "doc_id_unique",
        "lang_accepted",
        "n_chars_matches_text",
        "n_chars_nonnegative",
        "orders_custkey_refs_customer",
        "text_not_null",
    ]
    viol = [
        tot["n_rows"] - distinct,
        tot["bad_lang"],
        tot["mismatch"],
        tot["neg"],
        orphans,
        tot["null_text"],
    ]
    return pa.table(
        {
            "check_name": pa.array(names, pa.string()),
            "violations": pa.array(np.array(viol, np.int64)),
            "passed": pa.array([v == 0 for v in viol]),
        }
    )


QUERIES["data_quality_checks"] = q_data_quality_checks
ORACLE_SQL["data_quality_checks"] = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CASE WHEN doc_id % 37 = 0 THEN NULL ELSE text END AS text,
    CAST(CASE WHEN doc_id % 43 = 0 THEN n_chars + 1 ELSE n_chars END
         AS BIGINT) AS n_chars,
    CASE WHEN doc_id % 47 = 0 THEN 'xx' ELSE lang END AS lang
  FROM documents
), docs AS (
  SELECT * FROM base
  UNION ALL SELECT * FROM base WHERE doc_id % 41 = 0
), ord AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
    CAST(CASE WHEN o_orderkey % 53 = 0 THEN o_custkey + 10000000
         ELSE o_custkey END AS BIGINT) AS o_custkey
  FROM orders
), checks AS (
  SELECT 'doc_id_unique' AS check_name,
    CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS violations
  FROM docs
  UNION ALL SELECT 'lang_accepted',
    CAST(sum(CASE WHEN lang IS NULL
      OR lang NOT IN ('de','en','es','fr','zh')
      THEN 1 ELSE 0 END) AS BIGINT) FROM docs
  UNION ALL SELECT 'n_chars_matches_text',
    CAST(sum(CASE WHEN text IS NOT NULL AND n_chars <> length(text)
      THEN 1 ELSE 0 END) AS BIGINT) FROM docs
  UNION ALL SELECT 'n_chars_nonnegative',
    CAST(sum(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM docs
  UNION ALL SELECT 'orders_custkey_refs_customer',
    CAST((SELECT count(*) FROM ord
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = ord.o_custkey))
         AS BIGINT)
  UNION ALL SELECT 'text_not_null',
    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM docs
)
SELECT check_name, violations, violations = 0 AS passed FROM checks
""".strip()


# --------------------------------------------------------------------------
# per-source language diversity (Gini impurity)

def q_source_lang_gini(sf_dir: str):
    """Language-diversity profile per source — the mixture-planning
    diagnostic (a source whose Gini impurity ≈ 0 is monolingual; high
    impurity means the language-ID stage matters for that source).
    Gini = (n² − Σc²)/n² over per-(source, lang) counts c.

    Integer-exact until ONE final IEEE division: the (source, lang)
    count table combines on the hash exchange, the per-source reduce
    is Σc and Σc² in int64, and both engines evaluate
    CAST(n*n − sumsq AS DOUBLE) / (n*n) identically."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import hash_grouped_aggregate

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "lang"],
    )

    def _pair_partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = (
            pd.DataFrame(
                {
                    "source": tbl.column("source").to_pandas(),
                    "lang": tbl.column("lang").to_pandas(),
                }
            )
            .groupby(["source", "lang"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "source": pa.array(df["source"].to_numpy(dtype=object)),
                "lang": pa.array(df["lang"].to_numpy(dtype=object)),
                "c": pa.array(df["c"].to_numpy().astype(np.int64)),
            }
        )

    pair_counts = hash_grouped_aggregate(
        docs.map_batches(
            _pair_partial, batch_format="pyarrow", batch_size=None
        ),
        ["source", "lang"],
        [("c", "sum")],
        num_buckets=8,
    )

    def _sq(tbl: pa.Table) -> pa.Table:
        c = tbl.column("c").to_numpy()
        return pa.table(
            {
                "source": tbl.column("source"),
                "n_docs": pa.array(c.astype(np.int64)),
                "n_langs": pa.array(np.ones(len(c), np.int64)),
                "sumsq": pa.array((c * c).astype(np.int64)),
            }
        )

    per_source = hash_grouped_aggregate(
        pair_counts.map_batches(
            _sq, batch_format="pyarrow", batch_size=None
        ),
        ["source"],
        [("n_docs", "sum"), ("n_langs", "sum"), ("sumsq", "sum")],
        num_buckets=4,
    )

    def _gini(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_docs").to_numpy()
        sq = tbl.column("sumsq").to_numpy()
        g = (n * n - sq).astype(np.float64) / (n * n).astype(np.float64)
        return pa.table(
            {
                "source": tbl.column("source"),
                "n_docs": tbl.column("n_docs"),
                "n_langs": tbl.column("n_langs"),
                "gini": pa.array(g),
            }
        )

    return per_source.map_batches(_gini, batch_format="pyarrow",
                                  batch_size=None)


QUERIES["source_lang_gini"] = q_source_lang_gini
ORACLE_SQL["source_lang_gini"] = """
WITH pc AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang
), per AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
    CAST(count(*) AS BIGINT) AS n_langs,
    CAST(sum(c * c) AS BIGINT) AS sumsq
  FROM pc GROUP BY source
)
SELECT source, n_docs, n_langs,
  CAST(n_docs * n_docs - sumsq AS DOUBLE) / (n_docs * n_docs) AS gini
FROM per
""".strip()


# --------------------------------------------------------------------------
# compression-ratio quality signal

def q_compression_quality(sf_dir: str):
    """Per-document zlib compression ratio — the classic redundancy
    signal (highly compressible text is boilerplate/repetition;
    incompressible text is noise or non-text; both tails get pruned in
    a curation pass, cf. the Gopher/C4 repetition filters it
    complements in stages/text.py).

    Shape: pure streaming per-batch map. The per-doc loop calls C zlib
    on whole documents (compression is not expressible as a columnar
    kernel; each iteration is one C call, the standard shape for this
    operator). Deterministic: zlib level 6 output is stable for a
    given input across runs/processes. Rows-only gate (no SQL zlib);
    the pytest oracle recomputes ratios directly and pins the
    repetitive/random tails."""
    import zlib

    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def _ratio(tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        raw = np.zeros(len(texts), np.int64)
        comp = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            b = (t or "").encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, 6))
        ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_bytes": pa.array(raw),
                "n_zlib_bytes": pa.array(comp),
                "zlib_ratio": pa.array(ratio),
            }
        )

    return docs.map_batches(_ratio, batch_format="pyarrow",
                            batch_size=None)


QUERIES["compression_quality"] = q_compression_quality


# --------------------------------------------------------------------------
# feature hashing (the hashing trick) over categorical columns

FH_BUCKETS = 32
FH_COLS = ("lang", "source")
_FH_OFFSET = 1 << 20  # column separator in code space


def q_feature_hashing(sf_dir: str):
    """Hashing-trick featurization of the categorical columns — the
    fixed-width sparse encoding a linear model consumes without a
    vocabulary file (Weinberger et al. 2009): each (column, value)
    maps through splitmix64 to a bucket in [0, 32) with a ±1 sign from
    the hash's top bit; collisions sum (the method's defining
    property). Output is long-format (doc_id, bucket, val).

    Cross-engine exactness: values are dictionary-encoded first
    (sorted distinct → dense code, the token_dictionary pattern;
    bounded-cardinality columns, legitimately broadcast), so both
    engines hash the same INTEGER code through the bit-exact
    splitmix64 chain (UBIGINT xor/shift + 32-bit-split modular
    multiply in SQL — the weighted_sample_docs machinery)."""
    import pyarrow as pa
    import ray

    from ..functions.hashing import rehash64
    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", *FH_COLS],
    )

    # bounded dictionaries: per-batch distinct partials -> driver sort
    def _distinct(tbl: pa.Table) -> pa.Table:
        cols = {}
        for j, c in enumerate(FH_COLS):
            u = np.unique(tbl.column(c).to_numpy(zero_copy_only=False))
            cols.setdefault("col_idx", []).extend([j] * len(u))
            cols.setdefault("v", []).extend(u.tolist())
        return pa.table(
            {
                "col_idx": pa.array(cols.get("col_idx", []), pa.int64()),
                "v": pa.array(cols.get("v", []), pa.string()),
            }
        )

    parts = [
        t
        for t in ray.get(
            docs.map_batches(
                _distinct, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    dd = pa.concat_tables(parts).to_pandas().drop_duplicates()
    dicts = {}
    for j, c in enumerate(FH_COLS):
        vals = sorted(dd.loc[dd.col_idx == j, "v"])
        dicts[c] = {v: i for i, v in enumerate(vals)}
    d_ref = ray.put(dicts)

    def _hash(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        dicts = ray.get(d_ref)
        n = tbl.num_rows
        out_doc, out_bucket, out_sign = [], [], []
        for j, c in enumerate(FH_COLS):
            code = (
                pd.Series(tbl.column(c).to_pandas())
                .map(dicts[c])
                .to_numpy()
                .astype(np.uint64)
            )
            x = rehash64(code + np.uint64(j * _FH_OFFSET), 0)
            out_doc.append(tbl.column("doc_id").to_numpy())
            out_bucket.append(
                (x % np.uint64(FH_BUCKETS)).astype(np.int64)
            )
            out_sign.append(
                np.where(x >> np.uint64(63), -1, 1).astype(np.int64)
            )
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(out_doc).astype(np.int64)
                ),
                "bucket": pa.array(np.concatenate(out_bucket)),
                "val": pa.array(np.concatenate(out_sign)),
            }
        )
        return group_aggregate_table(
            t, ["doc_id", "bucket"], [("val", "sum")]
        )

    return docs.map_batches(_hash, batch_format="pyarrow",
                            batch_size=None)


def _fh_sql() -> str:
    from .text_queries import _splitmix_mulmod

    chains = []
    for j, c in enumerate(FH_COLS):
        chains.append(f"""
d_{c} AS (
  SELECT v, CAST(row_number() OVER (ORDER BY v) - 1 + {j * _FH_OFFSET}
       AS UBIGINT) AS x
  FROM (SELECT DISTINCT {c} AS v FROM documents)
)""".strip())
    dict_ctes = ",\n".join(chains)
    pairs = "\nUNION ALL\n".join(
        f"SELECT doc_id, d_{c}.x FROM documents JOIN d_{c} "
        f"ON documents.{c} = d_{c}.v"
        for c in FH_COLS
    )
    return f"""
WITH {dict_ctes},
p0 AS (
{pairs}
), s1 AS (SELECT doc_id, xor(x, x >> 30) AS x FROM p0
), s2 AS (SELECT doc_id, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM s1
), s3 AS (SELECT doc_id, xor(x, x >> 27) AS x FROM s2
), s4 AS (SELECT doc_id, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM s3
), s5 AS (SELECT doc_id, xor(x, x >> 31) AS x FROM s4
), feat AS (
  SELECT doc_id, CAST(x % {FH_BUCKETS} AS BIGINT) AS bucket,
    CASE WHEN x >= 9223372036854775808 THEN -1 ELSE 1 END AS sign
  FROM s5
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, bucket,
  CAST(sum(sign) AS BIGINT) AS val
FROM feat GROUP BY doc_id, bucket
""".strip()


QUERIES["feature_hashing"] = q_feature_hashing
ORACLE_SQL["feature_hashing"] = _fh_sql()


# --------------------------------------------------------------------------
# per-domain frequency capping

DOMAIN_CAP = 20


def q_domain_cap(sf_dir: str):
    """Per-domain frequency capping — the anti-overrepresentation rule
    every web-corpus build applies (no single domain/source may
    contribute more than CAP documents; survivors are the CAP earliest
    doc_ids, deterministic). Same skew-safe shape as
    ``top_docs_per_lang``: per-batch ≤CAP-row partials per source ride
    the exchange, so a source holding half the corpus still reduces in
    O(CAP · n_blocks) rows, never a stratum-sized task."""
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_grouped_map

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "lang"],
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "doc_id": tbl.column("doc_id").to_numpy(),
                "source": tbl.column("source").to_pandas(),
                "lang": tbl.column("lang").to_pandas(),
            }
        ).sort_values(["source", "doc_id"])
        keep = df.groupby("source", sort=False).cumcount() < DOMAIN_CAP
        df = df[keep]
        return pa.table(
            {
                "doc_id": pa.array(
                    df["doc_id"].to_numpy().astype(np.int64)
                ),
                "source": pa.array(df["source"].to_numpy(dtype=object)),
                "lang": pa.array(df["lang"].to_numpy(dtype=object)),
            }
        )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("lang", pa.string()),
            ("rnk", pa.int64()),
        ]
    )

    def _final(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        order = np.argsort(ids, kind="stable")[:DOMAIN_CAP]
        t = g.take(pa.array(order))
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "source": t.column("source"),
                "lang": t.column("lang"),
                "rnk": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64)
                ),
            }
        )

    return hash_grouped_map(
        docs.map_batches(
            _partial, batch_format="pyarrow", batch_size=None
        ),
        "source",
        lambda g: _final(g),
        num_partitions=8,
        empty_schema=out_schema,
    )


QUERIES["domain_cap"] = q_domain_cap
ORACLE_SQL["domain_cap"] = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, lang,
  CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
       AS BIGINT) AS rnk
FROM documents
QUALIFY rnk <= {DOMAIN_CAP}
""".strip()


# --------------------------------------------------------------------------
# grouped percent_rank via bounded-domain histograms

def q_chars_percent_rank(sf_dir: str):
    """percent_rank of n_chars WITHIN each source — the stratified
    score normalization a mixture pipeline applies before comparing
    quality across sources (SQL tie semantics: rank = 1 + count of
    strictly smaller rows, pr = (rank−1)/(n−1)).

    Scale shape — NO per-group sort anywhere: with ties, the rank is a
    pure function of the per-(source, value) count histogram, so the
    engine builds mergeable histogram partials on the hash exchange
    (bounded by source_cardinality × value_domain, the same
    bounded-domain trick as price_quantiles), prefix-sums each
    source's histogram, and joins ranks back by (source, value) —
    a stratum never concentrates in one task and rows never reorder.
    One final IEEE division, same expression shape as the oracle."""
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import hash_grouped_aggregate
    from ..stages.join import hash_equi_join_multi

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "n_chars"],
    )

    def _hist_partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = (
            pd.DataFrame(
                {
                    "source": tbl.column("source").to_pandas(),
                    "n_chars": tbl.column("n_chars").to_numpy(),
                }
            )
            .groupby(["source", "n_chars"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "source": pa.array(df["source"].to_numpy(dtype=object)),
                "n_chars": pa.array(
                    df["n_chars"].to_numpy().astype(np.int64)
                ),
                "c": pa.array(df["c"].to_numpy().astype(np.int64)),
            }
        )

    hist = hash_grouped_aggregate(
        docs.map_batches(
            _hist_partial, batch_format="pyarrow", batch_size=None
        ),
        ["source", "n_chars"],
        [("c", "sum")],
        num_buckets=8,
    )

    def _ranks(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "source": tbl.column("source").to_pandas(),
                "n_chars": tbl.column("n_chars").to_numpy(),
                "c": tbl.column("c").to_numpy(),
            }
        ).sort_values(["source", "n_chars"])
        csum = df.groupby("source", sort=False)["c"].cumsum()
        df["rnk"] = csum - df["c"] + 1  # 1 + strictly smaller
        df["n"] = df.groupby("source", sort=False)["c"].transform("sum")
        return pa.table(
            {
                "source": pa.array(df["source"].to_numpy(dtype=object)),
                "n_chars": pa.array(
                    df["n_chars"].to_numpy().astype(np.int64)
                ),
                "rnk": pa.array(df["rnk"].to_numpy().astype(np.int64)),
                "n": pa.array(df["n"].to_numpy().astype(np.int64)),
            }
        )

    # the source/value histogram is already co-located per source after
    # the aggregate exchange, but blocks may split a source — re-group
    # by source only for the prefix sum (bounded rows per source)
    from ..stages.exchange import hash_grouped_map

    rank_schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_chars", pa.int64()),
            ("rnk", pa.int64()),
            ("n", pa.int64()),
        ]
    )
    ranks = hash_grouped_map(
        hist, "source", lambda g: _ranks(g),
        num_partitions=8, empty_schema=rank_schema,
    )

    joined = hash_equi_join_multi(
        docs, ranks, ["source", "n_chars"], ["source", "n_chars"],
        right_columns=["rnk", "n"], num_partitions=8,
    )

    def _pr(tbl: pa.Table) -> pa.Table:
        rnk = tbl.column("rnk").to_numpy().astype(np.float64)
        n = tbl.column("n").to_numpy().astype(np.float64)
        pr = np.where(n > 1, (rnk - 1.0) / (n - 1.0), 0.0)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "source": tbl.column("source"),
                "n_chars": tbl.column("n_chars").cast(pa.int64()),
                "pr": pa.array(pr),
            }
        )

    return joined.map_batches(_pr, batch_format="pyarrow",
                              batch_size=None)


QUERIES["chars_percent_rank"] = q_chars_percent_rank
ORACLE_SQL["chars_percent_rank"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
  CAST(n_chars AS BIGINT) AS n_chars,
  percent_rank() OVER (PARTITION BY source ORDER BY n_chars) AS pr
FROM documents
""".strip()


# --------------------------------------------------------------------------
# end-to-end corpus build: the whole curation chain in ONE pipeline

SHARD_CHAR_BUDGET = 50_000


def q_corpus_build_manifest(
    sf_dir: str,
    domain_cap: int = DOMAIN_CAP,
    shard_budget: int = SHARD_CHAR_BUDGET,
):
    """The complete corpus build as one streaming pipeline — what a
    user actually runs end to end: quality gate → per-domain cap →
    exact dedup (keep min doc_id) → deterministic global shuffle order
    (splitmix64, RNG-state-free) → char-budget shard packing on the
    global prefix scan → per-shard manifest. Every stage is the
    engine's named operator; the oracle nests the same six steps in
    SQL, so the composition (not just each piece) is hash-verified.

    Scale shape (round-5 restructure): document TEXT is read exactly
    once, by the quality scan, which emits 28-byte metadata rows
    ``(doc_id, h=hash64(text), source_code, n_chars)`` — every wide
    step (domain cap, dedup, sort, scan) runs on metadata only, so NO
    text ever crosses an exchange (the round-4 design shipped full
    text through the cap exchange, the dedup exchange AND a semi
    join). Dedup groups on the 64-bit content hash — the same
    negligible-collision stance as the paragraph/gram-hash exchanges
    (`stages/dedup.py`); the SQL oracle groups by full text, so the
    equivalence is hash-verified at every tier. The survivor's
    ``n_chars`` rides a packed ``doc_id·2²⁴ + n_chars`` min-key (the
    ``preferred_supplier_per_part`` argmin trick), so no join back.
    Driver state: O(blocks) scalars from the scan."""
    import pyarrow as pa

    from ..functions.hashing import hash64, rehash64
    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate
    from ..stages.scan import global_scan

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source", "n_chars"],
    )
    stop_arr = pa.array(sorted(_STOPWORDS), pa.string())
    _NC_BITS = 24  # n_chars < 2^24 packed under doc_id (min-key trick)

    def _quality_meta(tbl: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads
        from ..functions.tokenize import space_stopword_stats

        pin_arrow_threads()

        n_words, n_stop = space_stopword_stats(
            tbl.column("text"), stop_arr
        )
        nw_safe = np.where(n_words == 0, 1, n_words)
        ratio = n_stop.astype(np.float64) / nw_safe.astype(np.float64)
        keep = (n_words >= MIN_WORDS) & (ratio <= MAX_STOPWORD_RATIO)
        t = tbl.filter(pa.array(keep))
        nc = t.column("n_chars").cast(pa.int64()).to_numpy()
        if len(nc) and int(nc.max()) >= (1 << _NC_BITS):
            raise ValueError("corpus_build: n_chars exceeds pack width")
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "h": pa.array(hash64(t.column("text").to_pandas())),
                "source": t.column("source"),
                "n_chars": pa.array(nc),
            }
        )

    meta = docs.map_batches(_quality_meta, batch_format="pyarrow",
                            batch_size=None)

    # per-domain cap on metadata: <=CAP-row partials per source per
    # batch, then one tiny source-keyed exchange finalizes the cap
    from ..stages.exchange import hash_grouped_map

    cap_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("h", pa.uint64()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )

    def _cap_partial(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "doc_id": tbl.column("doc_id").to_numpy(),
                "source": tbl.column("source").to_pandas(),
            }
        ).sort_values(["source", "doc_id"])
        keep = np.zeros(tbl.num_rows, bool)
        keep[df.index[df.groupby("source", sort=False).cumcount()
                      < domain_cap]] = True
        return tbl.filter(pa.array(keep))

    def _cap_final(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        order = np.argsort(ids, kind="stable")[:domain_cap]
        return g.take(pa.array(order)).select(
            ["doc_id", "h", "source", "n_chars"]
        )

    capped = hash_grouped_map(
        meta.map_batches(_cap_partial, batch_format="pyarrow",
                         batch_size=None),
        "source",
        lambda g: _cap_final(g),
        num_partitions=8,
        empty_schema=cap_schema,
    )

    # exact dedup keep-min on the content hash; the packed key carries
    # the survivor's n_chars through the min-aggregate (no join back)
    def _dedup_partial(tbl: pa.Table) -> pa.Table:
        packed = (
            tbl.column("doc_id").to_numpy() * (1 << _NC_BITS)
            + tbl.column("n_chars").to_numpy()
        )
        t = pa.table(
            {"h": tbl.column("h"), "packed": pa.array(packed)}
        )
        return group_aggregate_table(t, ["h"], [("packed", "min")])

    survivors = hash_grouped_aggregate(
        capped.map_batches(_dedup_partial, batch_format="pyarrow",
                           batch_size=None),
        ["h"],
        [("packed", "min")],
        num_buckets=8,
    )

    # deterministic shuffle order + shard packing on the prefix scan
    def _order_key(tbl: pa.Table) -> pa.Table:
        packed = tbl.column("packed").to_numpy()
        ids = (packed >> _NC_BITS).astype(np.int64)
        nc = (packed & ((1 << _NC_BITS) - 1)).astype(np.int64)
        x = rehash64(ids.astype(np.uint64), 0)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_chars": pa.array(nc),
                "x": pa.array(x, pa.uint64()),
            }
        )

    keyed = survivors.map_batches(_order_key, batch_format="pyarrow",
                                  batch_size=None)
    scanned = global_scan(
        keyed,
        sort_keys=[("x", "ascending"), ("doc_id", "ascending")],
        cum_cols=[("n_chars", "cum")],
    )

    def _shard(tbl: pa.Table) -> pa.Table:
        cum = tbl.column("cum").to_numpy(zero_copy_only=False)
        n = tbl.column("n_chars").to_numpy(zero_copy_only=False)
        start = cum - n
        return pa.table(
            {
                "shard_id": pa.array(
                    (start // shard_budget).astype(np.int64)
                ),
                "n_docs": pa.array(np.ones(len(n), np.int64)),
                "total_chars": pa.array(n.astype(np.int64)),
            }
        )

    return hash_grouped_aggregate(
        scanned.map_batches(_shard, batch_format="pyarrow",
                            batch_size=None),
        ["shard_id"],
        [("n_docs", "sum"), ("total_chars", "sum")],
        num_buckets=4,
    )


def _corpus_build_sql() -> str:
    from .text_queries import _splitmix_mulmod

    return f"""
WITH q AS (
  SELECT doc_id, text, source, CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_WORDS}
    AND CAST(len(list_filter(string_split(text, ' '),
          x -> x IN ({_STOPLIST_SQL}))) AS DOUBLE)
        / len(string_split(text, ' ')) <= {MAX_STOPWORD_RATIO}
), cap AS (
  SELECT * FROM q
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id)
          <= {DOMAIN_CAP}
), d AS (
  SELECT text, min(doc_id) AS doc_id FROM cap GROUP BY text
), s AS (
  SELECT cap.doc_id, cap.n_chars FROM cap JOIN d
  ON cap.doc_id = d.doc_id
), s0 AS (
  SELECT doc_id, n_chars, CAST(doc_id AS UBIGINT) AS x FROM s
), s1 AS (SELECT doc_id, n_chars, xor(x, x >> 30) AS x FROM s0
), s2 AS (SELECT doc_id, n_chars, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM s1
), s3 AS (SELECT doc_id, n_chars, xor(x, x >> 27) AS x FROM s2
), s4 AS (SELECT doc_id, n_chars, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM s3
), s5 AS (SELECT doc_id, n_chars, xor(x, x >> 31) AS x FROM s4
), sc AS (
  SELECT doc_id, n_chars,
    CAST(sum(n_chars) OVER (
      ORDER BY CAST(x AS HUGEINT), doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum
  FROM s5
)
SELECT (cum - n_chars) // {SHARD_CHAR_BUDGET} AS shard_id,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM sc GROUP BY shard_id
""".strip()


QUERIES["corpus_build_manifest"] = q_corpus_build_manifest
ORACLE_SQL["corpus_build_manifest"] = _corpus_build_sql()


# --- z-order layout (multi-dimensional clustering for scan pruning) -------

_Z_BITS = 16
_Z_ROWS_PER_FILE = 4096


def _z_terms(col: str, offset: int) -> str:
    return " + ".join(
        f"(({col} >> {i}) & 1) * {1 << (2 * i + offset)}"
        for i in range(_Z_BITS)
    )


def q_zorder_layout(sf_dir: str):
    """Z-order data layout: interleave the low 16 bits of
    (l_partkey, l_suppkey) into a Morton code, globally sort by it,
    and assign fixed-size output files — the multi-dimensional
    clustering that lets a 100 TB scan prune row groups on EITHER key
    (each key's value range maps to O(sqrt) of the curve). Rides the
    engine's sample-based range sort (stages/sort.py) with the global
    rank giving deterministic file assignment; the z-value costs one
    vectorized numpy pass per batch, no shuffle beyond the sort's
    single exchange."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.sort import sort_by

    ds = read_parquet_tuned(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def _interleave(v: np.ndarray) -> np.ndarray:
        # spread the low 16 bits of v to even bit positions (classic
        # Morton spreading via parallel-prefix masks, ~5 ops)
        x = v.astype(np.uint64) & np.uint64(0xFFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
        return x

    def _zval(tbl: pa.Table) -> pa.Table:
        p = tbl.column("l_partkey").to_numpy()
        s = tbl.column("l_suppkey").to_numpy()
        z = (_interleave(p) | (_interleave(s) << np.uint64(1))).astype(
            np.int64
        )
        return pa.table(
            {
                "l_orderkey": tbl.column("l_orderkey"),
                "l_linenumber": tbl.column("l_linenumber").cast(
                    pa.int64()
                ),
                "zval": pa.array(z),
            }
        )

    ranked = sort_by(
        ds.map_batches(_zval, batch_format="pyarrow", batch_size=None),
        [("zval", "ascending"), ("l_orderkey", "ascending"),
         ("l_linenumber", "ascending")],
        num_partitions=16,
        rank_col="rnk",
    )

    def _file(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fid = pc.divide(
            pc.subtract(tbl.column("rnk"), 1), _Z_ROWS_PER_FILE
        )
        return pa.table(
            {
                "l_orderkey": tbl.column("l_orderkey"),
                "l_linenumber": tbl.column("l_linenumber"),
                "zval": tbl.column("zval"),
                "file_id": fid,
            }
        )

    return ranked.map_batches(_file, batch_format="pyarrow")


QUERIES["zorder_layout"] = q_zorder_layout
ORACLE_SQL["zorder_layout"] = f"""
WITH z AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
    CAST({_z_terms('l_partkey', 0)}
         + {_z_terms('l_suppkey', 1)} AS BIGINT) AS zval
  FROM lineitem
), ranked AS (
  SELECT l_orderkey, l_linenumber, zval,
    row_number() OVER (ORDER BY zval, l_orderkey, l_linenumber) AS rnk
  FROM z
)
SELECT l_orderkey, l_linenumber, zval,
  CAST((rnk - 1) // {_Z_ROWS_PER_FILE} AS BIGINT) AS file_id
FROM ranked
""".strip()


def q_zorder_pruning_stats(sf_dir: str):
    """The data-skipping payoff of the z-order layout: per output
    file, row count and min/max of BOTH clustered keys — the zone-map
    a scan planner prunes against. After the Morton sort each file's
    key ranges are tight on both dimensions (vs one dimension for a
    plain sort); this query materializes exactly those zone maps.
    Shape: the same single range-sort exchange as zorder_layout, then
    per-batch min/max partials + a tiny per-file agg."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )
    from ..stages.sort import sort_by

    ds = read_parquet_tuned(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def _interleave(v: np.ndarray) -> np.ndarray:
        x = v.astype(np.uint64) & np.uint64(0xFFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
        return x

    def _zval(tbl: pa.Table) -> pa.Table:
        p = tbl.column("l_partkey").to_numpy()
        s = tbl.column("l_suppkey").to_numpy()
        z = (_interleave(p) | (_interleave(s) << np.uint64(1))).astype(
            np.int64
        )
        return pa.table(
            {
                "l_orderkey": tbl.column("l_orderkey"),
                "l_linenumber": tbl.column("l_linenumber").cast(
                    pa.int64()
                ),
                "l_partkey": tbl.column("l_partkey"),
                "l_suppkey": tbl.column("l_suppkey"),
                "zval": pa.array(z),
            }
        )

    ranked = sort_by(
        ds.map_batches(_zval, batch_format="pyarrow", batch_size=None),
        [("zval", "ascending"), ("l_orderkey", "ascending"),
         ("l_linenumber", "ascending")],
        num_partitions=16,
        rank_col="rnk",
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table(
            {
                "file_id": pc.divide(
                    pc.subtract(tbl.column("rnk"), 1), _Z_ROWS_PER_FILE
                ),
                "l_partkey": tbl.column("l_partkey"),
                "l_suppkey": tbl.column("l_suppkey"),
                "n_rows": pa.array(np.ones(tbl.num_rows, np.int64)),
                "min_part": tbl.column("l_partkey"),
                "max_part": tbl.column("l_partkey"),
                "min_supp": tbl.column("l_suppkey"),
                "max_supp": tbl.column("l_suppkey"),
            }
        ).select(["file_id", "n_rows", "min_part", "max_part",
                  "min_supp", "max_supp"])
        return group_aggregate_table(
            t, ["file_id"],
            [("n_rows", "sum"), ("min_part", "min"),
             ("max_part", "max"), ("min_supp", "min"),
             ("max_supp", "max")],
        )

    return hash_grouped_aggregate(
        ranked.map_batches(
            _partial, batch_format="pyarrow", batch_size=None
        ),
        ["file_id"],
        [("n_rows", "sum"), ("min_part", "min"), ("max_part", "max"),
         ("min_supp", "min"), ("max_supp", "max")],
        num_buckets=4,
    )


QUERIES["zorder_pruning_stats"] = q_zorder_pruning_stats
ORACLE_SQL["zorder_pruning_stats"] = f"""
WITH z AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
    l_partkey, l_suppkey,
    CAST({_z_terms('l_partkey', 0)}
         + {_z_terms('l_suppkey', 1)} AS BIGINT) AS zval
  FROM lineitem
), ranked AS (
  SELECT l_partkey, l_suppkey,
    CAST((row_number() OVER (ORDER BY zval, l_orderkey, l_linenumber)
          - 1) // {_Z_ROWS_PER_FILE} AS BIGINT) AS file_id
  FROM z
)
SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
FROM ranked GROUP BY file_id
""".strip()


# --- length-bucketed training batches -------------------------------------

_LB_BATCH = 32


def q_length_bucketed_batching(sf_dir: str):
    """Length-bucketed batch construction (the padding-efficiency
    step before tokenized training): docs grouped into power-of-two
    token-length buckets, deterministic ``doc_id``-ordered batches of
    {batch} within each bucket, and per-batch padding accounting
    (``n_docs * max_tokens - sum_tokens`` — the waste a
    length-agnostic batcher would pay). Bucket count is bounded by
    log2(max doc length), so the per-bucket grouped kernel is the
    natural co-location (within-bucket work is one sort + reduceat);
    a corpus where single buckets outgrow a worker would range-rank
    inside the bucket exactly like stages/sort.py.""".format(
        batch=_LB_BATCH
    )
    import numpy as np
    import pyarrow as pa

    from ..functions.tokenize import ws_tokens
    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_grouped_map

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def _lens(tbl: pa.Table) -> pa.Table:
        row, _flat = ws_tokens(tbl.column("text"))
        n = np.bincount(row, minlength=tbl.num_rows).astype(np.int64)
        bucket = np.floor(
            np.log2(np.maximum(n, 1).astype(np.float64))
        ).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "n": pa.array(n),
            }
        )

    out_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("batch_id", pa.int64()),
            ("n_docs", pa.int64()),
            ("max_tokens", pa.int64()),
            ("sum_tokens", pa.int64()),
            ("padding_waste", pa.int64()),
        ]
    )

    def _batches(group: pa.Table) -> pa.Table:
        b = int(group.column("bucket")[0].as_py())
        d = group.column("doc_id").to_numpy()
        n = group.column("n").to_numpy()
        o = np.argsort(d)
        n = n[o]
        nb = len(d)
        starts = np.arange(0, nb, _LB_BATCH)
        batch_id = np.arange(len(starts), dtype=np.int64)
        cnt = np.minimum(starts + _LB_BATCH, nb) - starts
        mx = np.maximum.reduceat(n, starts)
        sm = np.add.reduceat(n, starts)
        return pa.table(
            {
                "bucket": pa.array(np.full(len(starts), b, np.int64)),
                "batch_id": pa.array(batch_id),
                "n_docs": pa.array(cnt.astype(np.int64)),
                "max_tokens": pa.array(mx.astype(np.int64)),
                "sum_tokens": pa.array(sm.astype(np.int64)),
                "padding_waste": pa.array(
                    (cnt * mx - sm).astype(np.int64)
                ),
            }
        )

    return hash_grouped_map(
        docs.map_batches(_lens, batch_format="pyarrow",
                         batch_size=None),
        "bucket",
        _batches,
        num_partitions=8,
        empty_schema=out_schema,
    )


QUERIES["length_bucketed_batching"] = q_length_bucketed_batching
ORACLE_SQL["length_bucketed_batching"] = f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CAST(len(list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '')) AS BIGINT) AS n
  FROM documents
), b AS (
  SELECT doc_id, n,
    CAST(floor(log2(CAST(greatest(n, 1) AS DOUBLE))) AS BIGINT)
      AS bucket
  FROM t
), r AS (
  SELECT bucket, n,
    row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM b
), g AS (
  SELECT bucket, CAST((rn - 1) // {_LB_BATCH} AS BIGINT) AS batch_id, n
  FROM r
)
SELECT bucket, batch_id, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(max(n) AS BIGINT) AS max_tokens,
  CAST(sum(n) AS BIGINT) AS sum_tokens,
  CAST(count(*) * max(n) - sum(n) AS BIGINT) AS padding_waste
FROM g GROUP BY 1, 2
""".strip()


# --- group-level K-fold assignment (leakage-safe CV splits) ---------------

_KFOLD = 5


def q_grouped_kfold(sf_dir: str):
    """Leakage-safe cross-validation folds at the GROUP level: every
    document of a source lands in the same fold (doc-level hashing —
    train_test_split_counts — leaks near-duplicate template docs
    across folds; grouping by origin is the standard fix). Fold =
    splitmix64(dense source code) % K, the engine/SQL-identical hash
    chain shared with feature_hashing. The distinct-source table is
    bounded-cardinality (a domain column), so the code map is a
    legitimate broadcast; doc counting stays distributed."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..functions.hashing import rehash64
    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )

    def _distinct(tbl: pa.Table) -> pa.Table:
        return pa.table({"source": tbl.column("source").unique()})

    srcs = sorted(
        set(
            s
            for b in docs.map_batches(
                _distinct, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            for s in b.column("source").to_pylist()
        )
    )
    codes = np.arange(len(srcs), dtype=np.uint64)
    folds = (rehash64(codes, 0) % np.uint64(_KFOLD)).astype(np.int64)
    fold_of = dict(zip(srcs, folds.tolist()))
    fold_ref = ray.put(fold_of)

    def _partial(tbl: pa.Table) -> pa.Table:
        fm = ray.get(fold_ref)
        f = tbl.column("source").to_pandas().map(fm).to_numpy(
            dtype=np.int64
        )
        t = pa.table(
            {
                "fold": pa.array(f),
                "n_docs": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["fold"], [("n_docs", "sum")])

    agg = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["fold"],
        [("n_docs", "sum")],
        num_buckets=4,
    ).to_pandas()

    n_sources = (
        np.bincount(folds, minlength=_KFOLD).astype(np.int64)
    )
    agg["n_sources"] = agg["fold"].map(
        lambda f: int(n_sources[int(f)])
    ).astype("int64")
    return agg.sort_values("fold").reset_index(drop=True)


QUERIES["grouped_kfold"] = q_grouped_kfold
_KF_CHAIN = """
, s1 AS (SELECT source, xor(x, x >> 30) AS x FROM s0
), s2 AS (SELECT source, {m1} AS x FROM s1
), s3 AS (SELECT source, xor(x, x >> 27) AS x FROM s2
), s4 AS (SELECT source, {m2} AS x FROM s3
), s5 AS (SELECT source, xor(x, x >> 31) AS x FROM s4
)"""


def _kfold_sql() -> str:
    from .text_queries import _splitmix_mulmod

    chain = _KF_CHAIN.format(
        m1=_splitmix_mulmod(0xBF58476D1CE4E5B9),
        m2=_splitmix_mulmod(0x94D049BB133111EB),
    )
    return f"""
WITH src AS (SELECT DISTINCT source FROM documents),
s0 AS (
  SELECT source,
    CAST(row_number() OVER (ORDER BY source) - 1 AS UBIGINT) AS x
  FROM src
){chain},
fold AS (
  SELECT source, CAST(x % {_KFOLD} AS BIGINT) AS fold FROM s5
)
SELECT f.fold, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources
FROM documents d JOIN fold f USING (source)
GROUP BY f.fold
""".strip()


ORACLE_SQL["grouped_kfold"] = _kfold_sql()


# --- deterministic multi-epoch shuffle schedule ---------------------------

_EP_N = 3
_EP_M = 2147483647  # order-checksum modulus
_EP_GOLD = 0x9E3779B97F4A7C15


def q_epoch_shuffle_fingerprints(sf_dir: str):
    """Deterministic per-EPOCH global shuffle: epoch e orders the
    corpus by splitmix64(doc_id ^ seed_mix(e)) — reproducible on any
    cluster size, no RNG state to ship — and the ORDER itself is
    hash-verified via an order-sensitive checksum
    sum((rank % M) * (key % M) % M): any transposition changes it.
    Three epochs through the engine's range-sort with global rank
    (stages/sort.py); per-batch checksum partials, one scalar per
    epoch to the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import rehash64
    from ..sources.parquet import read_parquet_tuned
    from ..stages.sort import sort_by

    rows = []
    for ep in range(_EP_N):
        docs = read_parquet_tuned(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id"],
        )

        def _key(tbl: pa.Table, _ep=ep) -> pa.Table:
            ids = tbl.column("doc_id").to_numpy().astype(np.uint64)
            return pa.table(
                {
                    "key": pa.array(rehash64(ids, _ep), pa.uint64()),
                    "doc_id": tbl.column("doc_id").cast(pa.int64()),
                }
            )

        ranked = sort_by(
            docs.map_batches(_key, batch_format="pyarrow",
                             batch_size=None),
            [("key", "ascending"), ("doc_id", "ascending")],
            num_partitions=8,
            rank_col="rnk",
        )

        def _partial(tbl: pa.Table) -> pa.Table:
            k = tbl.column("key").to_numpy().astype(np.uint64)
            r = tbl.column("rnk").to_numpy().astype(np.int64)
            m = np.int64(_EP_M)
            contrib = ((r % m) * (k % np.uint64(_EP_M)).astype(
                np.int64
            )) % m
            return pa.table(
                {
                    "fp": pa.array([int(contrib.sum())], pa.int64()),
                    "n": pa.array([len(r)], pa.int64()),
                }
            )

        parts = ranked.map_batches(
            _partial, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        rows.append(
            {
                "epoch": ep,
                "n_docs": int(parts["n"].sum()),
                "fingerprint": int(parts["fp"].sum()),
            }
        )
    return pd.DataFrame(rows).astype(
        {"epoch": "int64", "n_docs": "int64", "fingerprint": "int64"}
    )


def _epoch_sql() -> str:
    from .text_queries import _splitmix_mulmod

    legs = []
    for ep in range(_EP_N):
        seed_mix = (ep * _EP_GOLD) % (1 << 64)
        legs.append(f"""
SELECT {ep} AS epoch, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(((rnk % {_EP_M}) * (x % {_EP_M})) % {_EP_M}) AS BIGINT)
    AS fingerprint
FROM (
  SELECT x, row_number() OVER (ORDER BY x, doc_id) AS rnk
  FROM (
    WITH s0 AS (
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
        xor(CAST(doc_id AS UBIGINT), {seed_mix}) AS x
      FROM documents
    ), s1 AS (SELECT doc_id, xor(x, x >> 30) AS x FROM s0
    ), s2 AS (SELECT doc_id, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM s1
    ), s3 AS (SELECT doc_id, xor(x, x >> 27) AS x FROM s2
    ), s4 AS (SELECT doc_id, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM s3
    ), s5 AS (SELECT doc_id, xor(x, x >> 31) AS x FROM s4
    ) SELECT doc_id, x FROM s5
  )
)""".strip())
    return "\nUNION ALL\n".join(legs)


QUERIES["epoch_shuffle_fingerprints"] = q_epoch_shuffle_fingerprints
ORACLE_SQL["epoch_shuffle_fingerprints"] = _epoch_sql()


def q_distribution_match_weights(sf_dir: str):
    """Distribution matching for corpus mixing: per-language
    resampling weight that reshapes the corpus to the UNIFORM target
    (weight_l = N / (L * n_l); >1 upsample, <1 downsample — the DoReMi
    /data-mixing primitive in its exact closed form). Counts are the
    standard partial→tiny-final shape; weights are one IEEE division
    of exact integers per language, identical to the SQL expression."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": tbl.column("lang"),
                "n_docs": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["lang"], [("n_docs", "sum")])

    agg = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["lang"],
        [("n_docs", "sum")],
        num_buckets=4,
    ).to_pandas()
    total = int(agg["n_docs"].sum())
    L = len(agg)
    agg["weight"] = float(total) / (
        np.int64(L) * agg["n_docs"].to_numpy()
    ).astype("float64")
    return agg.sort_values("lang").reset_index(drop=True)


QUERIES["distribution_match_weights"] = q_distribution_match_weights
ORACLE_SQL["distribution_match_weights"] = """
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
), t AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS total,
    CAST(count(*) AS BIGINT) AS L
  FROM c
)
SELECT c.lang, c.n_docs,
  CAST(t.total AS DOUBLE) / (t.L * c.n_docs) AS weight
FROM c, t
""".strip()


_TOPN_KEEP = 3


def q_topn_other_rollup(sf_dir: str):
    """Cardinality-capped groupby (the dashboard-safety shape for
    unbounded group domains): top-{n} sources by doc count keep their
    own row (ties broken by name), everything else rolls into
    'OTHER'. The full per-source aggregate is bounded-cardinality;
    capping is a driver fold of that tiny table.""".format(
        n=_TOPN_KEEP
    )
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": tbl.column("source"),
                "n_docs": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["source"], [("n_docs", "sum")])

    agg = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["source"],
        [("n_docs", "sum")],
        num_buckets=4,
    ).to_pandas()
    agg = agg.sort_values(
        ["n_docs", "source"], ascending=[False, True]
    ).reset_index(drop=True)
    top = agg.iloc[:_TOPN_KEEP][["source", "n_docs"]].copy()
    rest = agg.iloc[_TOPN_KEEP:]
    if len(rest):
        top = pd.concat(
            [
                top,
                pd.DataFrame(
                    {
                        "source": ["OTHER"],
                        "n_docs": [int(rest["n_docs"].sum())],
                    }
                ),
            ],
            ignore_index=True,
        )
    top["n_docs"] = top["n_docs"].astype("int64")
    return top.sort_values("source").reset_index(drop=True)


QUERIES["topn_other_rollup"] = q_topn_other_rollup
ORACLE_SQL["topn_other_rollup"] = f"""
WITH c AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
), r AS (
  SELECT source, n_docs,
    row_number() OVER (ORDER BY n_docs DESC, source) AS rk
  FROM c
)
SELECT CASE WHEN rk <= {_TOPN_KEEP} THEN source ELSE 'OTHER' END
    AS source,
  CAST(sum(n_docs) AS BIGINT) AS n_docs
FROM r GROUP BY 1
""".strip()


_FQ_BUDGET = 382


def q_fair_quota_allocation(sf_dir: str):
    """Max-min fair (waterfilling) quota allocation of a {b}-doc
    sampling budget across languages: sources below the water level
    keep everything, the rest are capped at the level, and the
    integer remainder goes +1 each to the first capped sources in
    (count, lang) order — the fair-mixing generalization of
    domain_cap, in exact closed form on both engines. Counts
    aggregate distributed; the allocation folds the bounded per-lang
    table.""".format(b=_FQ_BUDGET)
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": tbl.column("lang"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["lang"], [("n", "sum")])

    agg = (
        hash_grouped_aggregate(
            docs.map_batches(_partial, batch_format="pyarrow",
                             batch_size=None),
            ["lang"],
            [("n", "sum")],
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["n", "lang"])
        .reset_index(drop=True)
    )
    n = agg["n"].to_numpy()
    nn = len(n)
    B = _FQ_BUDGET
    alloc = np.empty(nn, np.int64)
    rem = B
    k = nn  # first capped index (none if all fit)
    for i in range(nn):
        level = rem // (nn - i)
        if n[i] <= level:
            alloc[i] = n[i]
            rem -= n[i]
        else:
            k = i
            break
    if k < nn:
        m = nn - k
        level = rem // m
        r = rem - level * m
        alloc[k:] = level
        alloc[k:k + r] += 1
    agg["allocation"] = alloc
    agg["n"] = agg["n"].astype("int64")
    return agg.sort_values("lang").reset_index(drop=True)


QUERIES["fair_quota_allocation"] = q_fair_quota_allocation
ORACLE_SQL["fair_quota_allocation"] = f"""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
), o AS (
  SELECT lang, n,
    CAST(row_number() OVER (ORDER BY n, lang) AS BIGINT) AS i,
    CAST(count(*) OVER () AS BIGINT) AS nn,
    CAST(coalesce(sum(n) OVER (ORDER BY n, lang
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS cum
  FROM c
), lev AS (
  SELECT *, ({_FQ_BUDGET} - cum) // (nn - i + 1) AS ti FROM o
), kk AS (
  SELECT coalesce(min(i), (SELECT max(nn) + 1 FROM lev)) AS k
  FROM lev WHERE n > ti
), p AS (
  SELECT lev.*, kk.k,
    (SELECT ti FROM lev l2, kk WHERE l2.i = kk.k) AS level,
    (SELECT {_FQ_BUDGET} - cum - ti * (nn - i + 1)
     FROM lev l3, kk WHERE l3.i = kk.k) AS r
  FROM lev, kk
)
SELECT lang, n,
  CAST(CASE WHEN i < k THEN n
            WHEN i - k < r THEN level + 1
            ELSE level END AS BIGINT) AS allocation
FROM p
""".strip()


def q_contingency_deviation(sf_dir: str):
    """Exact contingency-table independence deviations for
    (lang x source): observed count, row/column totals, and the
    integer deviation N·o_ij − r_i·c_j per cell (the χ² numerator
    core, kept in exact integers — the float χ² sum is
    accumulation-order-dependent and deliberately NOT emitted). One
    count exchange; totals fold on the bounded cell table."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source"],
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lang": tbl.column("lang"),
                "source": tbl.column("source"),
                "o": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["lang", "source"], [("o", "sum")]
        )

    cells = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["lang", "source"],
        [("o", "sum")],
        num_buckets=4,
    ).to_pandas()
    r = cells.groupby("lang")["o"].transform("sum")
    c = cells.groupby("source")["o"].transform("sum")
    N = int(cells["o"].sum())
    cells = cells.rename(columns={"o": "observed"})
    cells["row_total"] = r.astype("int64")
    cells["col_total"] = c.astype("int64")
    cells["deviation"] = (
        N * cells["observed"] - cells["row_total"] * cells["col_total"]
    ).astype("int64")
    return cells.sort_values(["lang", "source"]).reset_index(
        drop=True
    )


QUERIES["contingency_deviation"] = q_contingency_deviation
ORACLE_SQL["contingency_deviation"] = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS observed
  FROM documents GROUP BY 1, 2
), t AS (SELECT CAST(sum(observed) AS BIGINT) AS N FROM cells)
SELECT lang, source, observed,
  CAST(sum(observed) OVER (PARTITION BY lang) AS BIGINT)
    AS row_total,
  CAST(sum(observed) OVER (PARTITION BY source) AS BIGINT)
    AS col_total,
  CAST((SELECT N FROM t) * observed
    - sum(observed) OVER (PARTITION BY lang)
      * sum(observed) OVER (PARTITION BY source) AS BIGINT)
    AS deviation
FROM cells
""".strip()


_PPS_N = 50  # samples drawn


def q_pps_systematic_sample(sf_dir: str):
    """Systematic probability-proportional-to-size sampling: docs
    weighted by n_chars, {n} selection points placed at
    floor((2i+1)·W / (2·{n})) along the cumulative-weight axis, a doc
    selected once per point landing in its weight interval — the
    deterministic PPS design (every byte equally likely to be
    sampled, long docs proportionally more often; no RNG state).
    Global cumulative weights come from the engine's two-phase prefix
    scan in doc_id order; the point set is O({n}) and broadcast; each
    batch does one searchsorted. Exact integers throughout.""".format(
        n=_PPS_N
    )
    import numpy as np
    import pyarrow as pa
    import ray

    from ..sources.parquet import read_parquet_tuned
    from ..stages.scan import global_scan

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )

    def _w(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "w": tbl.column("n_chars").cast(pa.int64()),
            }
        )

    scanned = global_scan(
        docs.map_batches(_w, batch_format="pyarrow",
                         batch_size=None),
        [("doc_id", "ascending")],
        [("w", "cw")],
    ).materialize()

    # total weight = max cumulative (last block's last row)
    import pyarrow.compute as pc

    W = 0
    for b in scanned.iter_batches(batch_size=1 << 20,
                                  batch_format="pyarrow"):
        m = pc.max(b.column("cw")).as_py()
        W = max(W, int(m if m is not None else 0))
    pts = np.array(
        [((2 * i + 1) * W) // (2 * _PPS_N) for i in range(_PPS_N)],
        dtype=np.int64,
    )
    pts_ref = ray.put(pts)

    def _select(tbl: pa.Table) -> pa.Table:
        p = ray.get(pts_ref)
        cw = tbl.column("cw").to_numpy()
        w = tbl.column("w").to_numpy()
        lo = cw - w  # interval [lo, cw): points p with lo <= p < cw
        n_hits = (
            np.searchsorted(p, cw, side="left")
            - np.searchsorted(p, lo, side="left")
        ).astype(np.int64)
        keep = n_hits > 0
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").filter(
                    pa.array(keep)
                ),
                "w": pa.array(w[keep]),
                "n_hits": pa.array(n_hits[keep]),
            }
        )

    return scanned.map_batches(
        _select, batch_format="pyarrow", batch_size=None
    )


QUERIES["pps_systematic_sample"] = q_pps_systematic_sample
ORACLE_SQL["pps_systematic_sample"] = f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CAST(n_chars AS BIGINT) AS w
  FROM documents
), c AS (
  SELECT doc_id, w,
    CAST(sum(w) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cw
  FROM d
), t AS (SELECT CAST(max(cw) AS BIGINT) AS W FROM c),
p AS (
  SELECT ((2 * CAST(i AS BIGINT) + 1) * (SELECT W FROM t))
           // (2 * {_PPS_N}) AS pt
  FROM unnest(range(0, {_PPS_N})) AS u(i)
)
SELECT c.doc_id, c.w, CAST(count(*) AS BIGINT) AS n_hits
FROM c JOIN p ON p.pt >= c.cw - c.w AND p.pt < c.cw
GROUP BY 1, 2
""".strip()


_KFL_OFFSET = 60_000_000


def q_kfold_leakage_audit(sf_dir: str):
    """CV-leakage audit on top of grouped_kfold: texts that appear in
    MORE than one fold (possible exactly when duplicates span
    sources, since folds are source-level) — the check that catches a
    bad fold design before it inflates eval numbers. Planted
    cross-source duplicates (doc_id % 11 == 0 copied under a new id
    with the next source, both sides) keep the audit non-vacuous; the
    natural corpus has no cross-source dups, which the audit itself
    proves. Text-hash groups collapse per batch; only
    (hash, fold)-distinct partials exchange."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from ..functions.hashing import hash64, rehash64
    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )

    # fold map: identical chain to grouped_kfold
    def _distinct(tbl: pa.Table) -> pa.Table:
        return pa.table({"source": tbl.column("source").unique()})

    srcs = sorted(
        set(
            s
            for b in docs.map_batches(
                _distinct, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            for s in b.column("source").to_pylist()
        )
    )
    codes = np.arange(len(srcs), dtype=np.uint64)
    folds = (rehash64(codes, 0) % np.uint64(_KFOLD)).astype(np.int64)
    fold_of = dict(zip(srcs, folds.tolist()))
    # the planted copy uses the NEXT source in sorted order
    next_src = {
        s: srcs[(i + 1) % len(srcs)] for i, s in enumerate(srcs)
    }
    maps_ref = ray.put((fold_of, next_src))

    def _partial(tbl: pa.Table) -> pa.Table:
        fm, ns = ray.get(maps_ref)
        ids = tbl.column("doc_id").to_numpy()
        txt = tbl.column("text").to_pandas().fillna("")
        src = tbl.column("source").to_pandas()
        m = ids % 11 == 0
        all_txt = pd.concat([txt, txt[m]], ignore_index=True)
        all_src = pd.concat(
            [src, src[m].map(ns)], ignore_index=True
        )
        h = hash64(all_txt)
        f = all_src.map(fm).to_numpy(dtype=np.int64)
        t = pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "fold": pa.array(f),
                "n": pa.array(np.ones(len(h), np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["h", "fold"], [("n", "sum")]
        )

    hf = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["h", "fold"],
        [("n", "sum")],
        num_buckets=8,
    )

    def _per_text(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "h": tbl.column("h"),
                "n_folds": pa.array(
                    np.ones(tbl.num_rows, np.int64)
                ),
            }
        )
        return group_aggregate_table(t, ["h"], [("n_folds", "sum")])

    per_text = hash_grouped_aggregate(
        hf.map_batches(_per_text, batch_format="pyarrow",
                       batch_size=None),
        ["h"],
        [("n_folds", "sum")],
        num_buckets=4,
    ).to_pandas()
    nf = per_text["n_folds"].to_numpy()
    return pd.DataFrame(
        {
            "n_texts": [int(len(per_text))],
            "n_leaking_texts": [int((nf > 1).sum())],
            "max_folds_spanned": [int(nf.max()) if len(nf) else 0],
        }
    )


def _kfl_sql() -> str:
    from .text_queries import _splitmix_mulmod

    chain = _KF_CHAIN.format(
        m1=_splitmix_mulmod(0xBF58476D1CE4E5B9),
        m2=_splitmix_mulmod(0x94D049BB133111EB),
    )
    return f"""
WITH src AS (SELECT DISTINCT source FROM documents),
s0 AS (
  SELECT source,
    CAST(row_number() OVER (ORDER BY source) - 1 AS UBIGINT) AS x
  FROM src
){chain},
fold AS (
  SELECT source, CAST(x % {_KFOLD} AS BIGINT) AS fold FROM s5
), ranked_src AS (
  SELECT source, row_number() OVER (ORDER BY source) AS rk,
    count(*) OVER () AS ns
  FROM src
), nxt AS (
  SELECT a.source, b.source AS next_source
  FROM ranked_src a JOIN ranked_src b
    ON b.rk = (a.rk % a.ns) + 1
), aug AS (
  SELECT text, source FROM documents
  UNION ALL
  SELECT d.text, nxt.next_source
  FROM documents d JOIN nxt ON nxt.source = d.source
  WHERE d.doc_id % 11 = 0
), tf AS (
  SELECT DISTINCT a.text, f.fold
  FROM aug a JOIN fold f USING (source)
), pt AS (
  SELECT text, CAST(count(*) AS BIGINT) AS n_folds
  FROM tf GROUP BY text
)
SELECT CAST(count(*) AS BIGINT) AS n_texts,
  CAST(sum(CASE WHEN n_folds > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_leaking_texts,
  CAST(max(n_folds) AS BIGINT) AS max_folds_spanned
FROM pt
""".strip()


QUERIES["kfold_leakage_audit"] = q_kfold_leakage_audit
ORACLE_SQL["kfold_leakage_audit"] = _kfl_sql()
