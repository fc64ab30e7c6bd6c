"""Text-analysis suite queries over the ``documents`` table."""

from __future__ import annotations

import os

from ..stages.text import (
    _LANG_PROFILES,
    _STOPWORDS,
    doc_fingerprints,
    lang_id,
    text_quality,
    token_counts,
)


def _docs(sf_dir: str):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def q_text_quality(sf_dir: str):
    return text_quality(_docs(sf_dir))


def q_token_counts(sf_dir: str):
    return token_counts(_docs(sf_dir))


def q_lang_id(sf_dir: str):
    return lang_id(_docs(sf_dir))


def q_doc_fingerprints(sf_dir: str):
    return doc_fingerprints(_docs(sf_dir))


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

QUERIES = {
    "text_quality": q_text_quality,
    "token_counts": q_token_counts,
    "lang_id": q_lang_id,
    "doc_fingerprints": q_doc_fingerprints,
}

ORACLE_SQL = {
    "text_quality": f"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS avg_word_len,
  CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOPLIST_SQL}))) AS BIGINT) AS n_stopwords,
  CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_STOPLIST_SQL}))) AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio
FROM documents
""".strip(),
    "token_counts": r"""
SELECT doc_id,
  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_word_tokens
FROM documents
""".strip(),
    # doc_fingerprints: hash-sketch op → rows-only; determinism +
    # correctness covered in tests/test_text.py.
}


def _lang_id_sql() -> str:
    """DuckDB oracle mirroring LangId exactly: per-language profile hit
    counts over whitespace tokens, argmax with first-in-sorted-order
    tie-break, conf = max/sum as a single IEEE division."""
    langs = sorted(_LANG_PROFILES)  # same order as LangId.__init__
    score_cols = ",\n    ".join(
        "CAST(len(list_filter(tk, x -> x IN ({}))) AS DOUBLE) AS s_{}".format(
            ", ".join(f"'{w}'" for w in _LANG_PROFILES[lang]), lang
        )
        for lang in langs
    )
    total = " + ".join(f"s_{lang}" for lang in langs)
    greatest = "greatest({})".format(
        ", ".join(f"s_{lang}" for lang in langs)
    )
    # argmax tie-break = first max in sorted lang order (np.argmax)
    branches = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in langs[i + 1:]
        )
        branches.append(f"WHEN {conds} THEN '{lang}'")
    case_pred = (
        f"CASE WHEN {total} = 0 THEN 'und' "
        + " ".join(branches)
        + f" ELSE '{langs[-1]}' END"
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents
), scored AS (
  SELECT doc_id,
    {score_cols}
  FROM toks
)
SELECT doc_id,
  {case_pred} AS lang_pred,
  CASE WHEN {total} = 0 THEN 0.0
       ELSE {greatest} / ({total}) END AS lang_conf
FROM scored
""".strip()


ORACLE_SQL["lang_id"] = _lang_id_sql()


def _topk_per_lang_partial(tbl, k):
    """Vectorized per-batch top-k rows per language by (n_chars DESC,
    doc_id ASC): factorize lang, one lexsort, keep the first k of each
    lang run. Mergeable — top-k of a union == top-k of per-part top-ks."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    if tbl.num_rows == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    nc = tbl.column("n_chars").cast(pa.int64()).to_numpy()
    ids = tbl.column("doc_id").cast(pa.int64()).to_numpy()
    # use_na_sentinel=False: a NULL lang gets its own code (and its own
    # stratum, matching SQL's PARTITION BY) — the default -1 sentinel
    # would wrap to uniq[-1] and misattribute null-lang rows to the
    # last real language
    codes, uniq = pd.factorize(
        tbl.column("lang").to_pandas(), sort=False, use_na_sentinel=False
    )
    order = np.lexsort((ids, -nc, codes))
    c_sorted = codes[order]
    new = np.ones(len(order), dtype=bool)
    new[1:] = c_sorted[1:] != c_sorted[:-1]
    # rank within each lang run = position - position of run start
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(order)), 0))
    keep = (np.arange(len(order)) - run_start) < k
    pick = order[keep]
    return pa.table(
        {
            # from_pandas: NaN (null lang) -> arrow null, not a string
            "lang": pa.Array.from_pandas(
                pd.Series(uniq[codes[pick]]), type=pa.string()
            ),
            "doc_id": pa.array(ids[pick], pa.int64()),
            "n_chars": pa.array(nc[pick], pa.int64()),
        }
    )


def q_top_docs_per_lang(sf_dir: str, k: int = 3):
    """Grouped window-rank: top-k documents per language by n_chars
    (deterministic tie-break on doc_id).

    Skew-safe shape (round-3 fix): a lang-keyed shuffle of the full
    corpus would put an entire language stratum in one reduce task
    (~corpus/5 at target scale). Instead: per-batch top-k PARTIALS
    (<= k rows per lang per batch) ride the exchange — the reduce side
    sees O(k x n_blocks) rows per language, independent of corpus size.
    Same partial->final pattern as ``q_conv_peak_latency``."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_grouped_map

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    partials = docs.map_batches(
        lambda t: _topk_per_lang_partial(t, k),
        batch_format="pyarrow",
        batch_size=None,
    )
    out_schema = pa.schema(
        [
            ("lang", pa.string()),
            ("doc_id", pa.int64()),
            ("n_chars", pa.int64()),
            ("rnk", pa.int64()),
        ]
    )

    def _top(g: pa.Table) -> pa.Table:
        nc = g.column("n_chars").to_numpy()
        ids = g.column("doc_id").to_numpy()
        order = np.lexsort((ids, -nc))[:k]
        t = g.take(pa.array(order))
        return pa.table(
            {
                "lang": t.column("lang"),
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_chars": t.column("n_chars").cast(pa.int64()),
                "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return hash_grouped_map(
        partials, ["lang"], _top, num_partitions=8, empty_schema=out_schema
    )


def stratified_sample_ranked(
    docs,
    every_n: int = 4,
    bucket_width: int = 1 << 16,
    num_partitions: int = 8,
):
    """Stratified systematic sample: every Nth document per language in
    global doc_id order, WITHOUT a lang-keyed full-corpus shuffle.

    Skew-safe two-pass global rank (round-3 fix — a shuffle keyed on
    the ~5-value ``lang`` column puts a whole stratum in one reduce
    task):

    1. count pass: mergeable per-batch ``(lang, bkt, n)`` partials where
       ``bkt = doc_id // bucket_width`` — the partial table is
       O(n_langs x n_buckets), collected driver-side and turned into
       exclusive prefix offsets per (lang, bkt);
    2. emit pass: exchange keyed on the COMPOSITE ``(lang, bkt)`` — each
       co-located group holds at most ``bucket_width`` rows of one
       stratum, never the whole language; global rank of a row =
       prefix_offset[lang, bkt] + local rank by doc_id; keep rows with
       ``rank % every_n == 0``.

    Reduce-task input stays bounded by bucket_width x (groups/partition)
    regardless of corpus size; the driver holds only the count table.
    """
    import numpy as np
    import pyarrow as pa
    import ray

    from ..stages.exchange import hash_grouped_map
    from ..stages.groupagg import group_aggregate_table

    def _with_bkt(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").cast(pa.int64()).to_numpy()
        return tbl.append_column(
            "bkt", pa.array(ids // bucket_width, pa.int64())
        )

    # pass 1: mergeable (lang, bkt, n) count partials -> tiny driver table
    def _count_partial(tbl: pa.Table) -> pa.Table:
        t = _with_bkt(tbl).append_column(
            "n", pa.array(np.ones(tbl.num_rows, np.int64))
        )
        return group_aggregate_table(t, ["lang", "bkt"], [("n", "sum")])

    partial_refs = docs.map_batches(
        _count_partial, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs()
    counts = group_aggregate_table(
        pa.concat_tables([ray.get(r) for r in partial_refs]),
        ["lang", "bkt"],
        [("n", "sum")],
    )
    # exclusive prefix sum of counts per lang in bkt order
    langs = counts.column("lang").to_numpy(zero_copy_only=False)
    bkts = counts.column("bkt").to_numpy()
    ns = counts.column("n").cast(pa.int64()).to_numpy()
    order = np.lexsort((bkts, langs))
    lang_s, bkt_s, n_s = langs[order], bkts[order], ns[order]
    csum = np.cumsum(n_s) - n_s  # exclusive
    new_lang = np.ones(len(order), dtype=bool)
    new_lang[1:] = lang_s[1:] != lang_s[:-1]
    lang_base = np.maximum.accumulate(
        np.where(new_lang, csum, 0)
    )  # cumsum at each lang's first bucket
    offsets = {
        (str(l), int(b)): int(c - lb)
        for l, b, c, lb in zip(lang_s, bkt_s, csum, lang_base)
    }
    off_ref = ray.put(offsets)

    out_schema = pa.schema([("lang", pa.string()), ("doc_id", pa.int64())])

    def _emit(g: pa.Table, _cache={}) -> pa.Table:
        # ray.get once per reduce task (the closure — with its fresh
        # _cache — is pickled per task; groups within a task share it)
        off = _cache.get("off")
        if off is None:
            off = _cache["off"] = ray.get(off_ref)
        ids = g.column("doc_id").cast(pa.int64()).to_numpy()
        lang = g.column("lang")[0].as_py()
        bkt = int(g.column("bkt")[0].as_py())
        base = off[(lang, bkt)]
        order_l = np.argsort(ids, kind="stable")
        ranks = np.empty(len(ids), dtype=np.int64)
        ranks[order_l] = base + np.arange(len(ids), dtype=np.int64)
        keep = ranks % every_n == 0
        t = g.filter(pa.array(keep))
        return pa.table(
            {
                "lang": t.column("lang"),
                "doc_id": t.column("doc_id").cast(pa.int64()),
            }
        )

    return hash_grouped_map(
        docs.map_batches(_with_bkt, batch_format="pyarrow", batch_size=None),
        ["lang", "bkt"],
        _emit,
        num_partitions=num_partitions,
        empty_schema=out_schema,
    )


def q_stratified_sample(sf_dir: str, every_n: int = 4):
    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    )
    return stratified_sample_ranked(docs, every_n=every_n)


QUERIES["stratified_sample"] = q_stratified_sample
ORACLE_SQL["stratified_sample"] = """
SELECT lang, doc_id FROM (
  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
    row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS rn
  FROM documents)
WHERE rn % 4 = 0
""".strip()

def q_mode_source_per_lang(sf_dir: str):
    """Grouped mode/argmax: the most frequent source per language
    (deterministic tie-break: smallest source) — mergeable
    (lang, source)-count partials, then a per-lang argmax in a grouped
    map. The distributed shape for 'dominant category per key'."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_grouped_map
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source"],
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        t = tbl.append_column(
            "n", pa.array(np.ones(tbl.num_rows, np.int64))
        )
        return group_aggregate_table(t, ["lang", "source"], [("n", "sum")])

    counts = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["lang", "source"],
        [("n", "sum")],
    )
    out_schema = pa.schema(
        [
            ("lang", pa.string()),
            ("top_source", pa.string()),
            ("n_docs", pa.int64()),
        ]
    )

    def _argmax(g: pa.Table) -> pa.Table:
        n = g.column("n").cast(pa.int64()).to_numpy()
        src = g.column("source").to_numpy(zero_copy_only=False)
        best = np.lexsort((src, -n))[0]
        return pa.table(
            {
                "lang": pa.array([g.column("lang")[0].as_py()], pa.string()),
                "top_source": pa.array([src[best]], pa.string()),
                "n_docs": pa.array([int(n[best])], pa.int64()),
            }
        )

    return hash_grouped_map(
        counts, ["lang"], _argmax, num_partitions=8, empty_schema=out_schema
    )


QUERIES["mode_source_per_lang"] = q_mode_source_per_lang
ORACLE_SQL["mode_source_per_lang"] = """
SELECT lang, source AS top_source, CAST(cnt AS BIGINT) AS n_docs FROM (
  SELECT lang, source, count(*) AS cnt,
    row_number() OVER (
      PARTITION BY lang ORDER BY count(*) DESC, source) AS rk
  FROM documents GROUP BY lang, source)
WHERE rk = 1
""".strip()

QUERIES["top_docs_per_lang"] = q_top_docs_per_lang
ORACLE_SQL["top_docs_per_lang"] = """
SELECT lang, doc_id, n_chars, rnk FROM (
  SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
    CAST(n_chars AS BIGINT) AS n_chars,
    CAST(row_number() OVER (
      PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
  FROM documents)
WHERE rnk <= 3
""".strip()


def q_sample_documents(sf_dir: str):
    """Deterministic systematic sample (doc_id % 7 == 0) — the
    reproducible sampling pattern for training-data subsetting (seeded
    random_sample exists in Ray but cannot be SQL-checked)."""
    import pyarrow as pa

    def _take(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        return tbl.filter(pa.array(ids % 7 == 0))

    return _docs(sf_dir).map_batches(_take, batch_format="pyarrow")


QUERIES["sample_documents"] = q_sample_documents
ORACLE_SQL["sample_documents"] = (
    "SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0"
)


def q_top_tokens(sf_dir: str, k: int = 20):
    """Heavy hitters: the k globally most frequent whitespace tokens
    (tie-break token asc). Mergeable per-batch token counts → token-hash
    exchange (exact totals, each token wholly in one partition) →
    per-partition top-k partials → tiny driver merge. No stage ever
    holds more than its partition's token vocabulary."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..stages.groupagg import hash_grouped_aggregate

    from ..stages.text import token_count_partial as _partial

    counts = hash_grouped_aggregate(
        _docs(sf_dir).map_batches(
            _partial, batch_format="pyarrow", batch_size=None
        ),
        ["tok"],
        [("n", "sum")],
        num_buckets=16,
    )

    def _topk(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n").cast(pa.int64()).to_numpy()
        tok = tbl.column("tok").to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, -n))[:k]
        return pa.table(
            {
                "tok": pa.array(tok[order], pa.string()),
                "n": pa.array(n[order]),
            }
        )

    partials = [
        ray.get(r)
        for r in counts.map_batches(
            _topk, batch_format="pyarrow", batch_size=None
        ).to_arrow_refs()
    ]
    live = [t for t in partials if t.num_rows]
    if not live:  # all-empty token stream: typed empty result
        return pa.schema([("tok", pa.string()), ("n", pa.int64())]).empty_table()
    return _topk(pa.concat_tables(live))  # k x parts rows -> final k


QUERIES["top_tokens"] = q_top_tokens
ORACLE_SQL["top_tokens"] = r"""
SELECT tok, n FROM (
  SELECT tok, CAST(count(*) AS BIGINT) AS n,
    row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
  FROM (
    SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) AS tok
    FROM documents)
  GROUP BY tok)
WHERE rk <= 20
""".strip()


def q_distinct_tokens_per_source(sf_dir: str):
    """Grouped exact distinct count: vocabulary size per source.
    Two-level aggregation — per-batch DISTINCT (source, token) pairs →
    pair-keyed exchange dedupe → mergeable (source, 1) partials →
    tiny source-keyed sum. The shuffle carries distinct pairs only,
    never raw text rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"), columns=["source", "text"]
    )

    def _pairs(tbl: pa.Table) -> pa.Table:
        s = tbl.column("text").to_pandas().fillna("")
        src = tbl.column("source").to_pandas()
        ex = s.str.split().explode().dropna()
        df = pd.DataFrame(
            {"source": src.reindex(ex.index).to_numpy(), "tok": ex.to_numpy()}
        ).drop_duplicates()
        t = pa.table(
            {
                "source": pa.array(df["source"].to_numpy(dtype=object)),
                "tok": pa.array(df["tok"].to_numpy(dtype=object)),
                "one": pa.array(np.ones(len(df), np.int64)),
            }
        )
        return t

    dedup = hash_grouped_aggregate(
        docs.map_batches(_pairs, batch_format="pyarrow", batch_size=None),
        ["source", "tok"],
        [("one", "min")],
        num_buckets=16,
    )

    def _per_source(tbl: pa.Table) -> pa.Table:
        return group_aggregate_table(
            tbl.select(["source", "one"]),
            ["source"],
            [("one", "sum")],
            ["source", "n_tokens"],
        )

    return hash_grouped_aggregate(
        dedup.map_batches(
            _per_source, batch_format="pyarrow", batch_size=None
        ),
        ["source"],
        [("n_tokens", "sum")],
        num_buckets=8,
    )


QUERIES["distinct_tokens_per_source"] = q_distinct_tokens_per_source
ORACLE_SQL["distinct_tokens_per_source"] = r"""
SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens
FROM (
  SELECT source,
    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
  FROM documents)
GROUP BY source
""".strip()


TFIDF_TERMS = ["spark", "merge", "column"]  # fixed query-term set


def q_tfidf_scores(sf_dir: str):
    """Inverse-document-frequency weighted term scoring against a fixed
    query-term set — the lexical-retrieval primitive next to the
    embedding kNN. Two passes: (1) mergeable per-batch document
    frequencies (docs containing each term) → 3 scalars broadcast;
    (2) streaming per-doc term counts, score = Σ tf_t / df_t with a
    FIXED term order and one IEEE division per term so the float
    matches the identically-shaped SQL expression bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..stages.groupagg import group_aggregate_table

    docs = _docs(sf_dir)

    def _tf(texts) -> np.ndarray:
        """(n_docs, n_terms) whitespace-token term counts, vectorized."""
        ex = texts.fillna("").str.split().explode()
        mask = ex.notna()
        row = ex.index.to_numpy()[mask].astype(np.int64)
        toks = ex[mask]
        out = np.zeros((len(texts), len(TFIDF_TERMS)), np.int64)
        for j, term in enumerate(TFIDF_TERMS):
            hits = (toks == term).to_numpy()
            out[:, j] = np.bincount(
                row, weights=hits.astype(np.float64), minlength=len(texts)
            ).astype(np.int64)
        return out

    def _df_partial(tbl: pa.Table) -> pa.Table:
        tf = _tf(tbl.column("text").to_pandas())
        cols = {"_k": pa.array(np.zeros(1, np.int64))}
        for j, term in enumerate(TFIDF_TERMS):
            cols[f"df_{term}"] = pa.array(
                [int((tf[:, j] > 0).sum())], pa.int64()
            )
        return pa.table(cols)

    df_parts = pa.concat_tables(
        [
            ray.get(r)
            for r in docs.map_batches(
                _df_partial, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        ]
    )
    df_tot = group_aggregate_table(
        df_parts, ["_k"], [(f"df_{t}", "sum") for t in TFIDF_TERMS]
    )
    dfs = np.array(
        [int(df_tot.column(f"df_{t}")[0].as_py()) for t in TFIDF_TERMS],
        np.int64,
    )
    dfs_ref = ray.put(dfs)

    def _score(tbl: pa.Table) -> pa.Table:
        d = ray.get(dfs_ref).astype(np.float64)
        tf = _tf(tbl.column("text").to_pandas())
        # fixed-order sum of single divisions — identical expression
        # shape to the SQL oracle, so doubles match bit-for-bit
        score = np.zeros(tbl.num_rows, np.float64)
        for j in range(len(TFIDF_TERMS)):
            score = score + (
                tf[:, j].astype(np.float64) / d[j] if d[j] else 0.0
            )
        cols = {"doc_id": tbl.column("doc_id")}
        for j, term in enumerate(TFIDF_TERMS):
            cols[f"tf_{term}"] = pa.array(tf[:, j])
        cols["score"] = pa.array(score)
        return pa.table(cols)

    return docs.map_batches(_score, batch_format="pyarrow", batch_size=None)


QUERIES["tfidf_scores"] = q_tfidf_scores


def _tfidf_sql() -> str:
    tf_exprs = ",\n  ".join(
        "CAST(len(list_filter(tk, x -> x = '{t}')) AS BIGINT) AS tf_{t}".format(
            t=t
        )
        for t in TFIDF_TERMS
    )
    df_ctes = ",\n".join(
        "df_{t} AS (SELECT count(*) AS d FROM toks "
        "WHERE list_contains(tk, '{t}'))".format(t=t)
        for t in TFIDF_TERMS
    )
    score = " + ".join(
        "CAST(tf_{t} AS DOUBLE) / (SELECT d FROM df_{t})".format(t=t)
        for t in TFIDF_TERMS
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents
),
{df_ctes},
tf AS (
  SELECT doc_id,
  {tf_exprs}
  FROM toks
)
SELECT doc_id, {', '.join('tf_' + t for t in TFIDF_TERMS)},
  {score} AS score
FROM tf
""".strip()


ORACLE_SQL["tfidf_scores"] = _tfidf_sql()


def q_fingerprint_counts(sf_dir: str):
    """Winnowing fingerprints with window=1 degenerate to the distinct
    token-4-gram set, so the per-doc fingerprint COUNT has a plain SQL
    oracle (count of distinct 4-grams; whole-text fallback = 1 for docs
    under 4 tokens) — de-vacuating the shingle/dedup machinery of the
    rows-only doc_fingerprints check. The windowed-min path (window>1)
    keeps its brute-force pytest oracle in tests/test_text.py."""
    import numpy as np
    import pyarrow as pa

    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    fps = doc_fingerprints(_docs(sf_dir), k=4, window=1)

    def _count(tbl: pa.Table) -> pa.Table:
        t = tbl.append_column(
            "n_fingerprints", pa.array(np.ones(tbl.num_rows, np.int64))
        )
        return group_aggregate_table(
            t.select(["doc_id", "n_fingerprints"]),
            ["doc_id"],
            [("n_fingerprints", "sum")],
        )

    return hash_grouped_aggregate(
        fps.map_batches(_count, batch_format="pyarrow", batch_size=None),
        ["doc_id"],
        [("n_fingerprints", "sum")],
    )


QUERIES["fingerprint_counts"] = q_fingerprint_counts
ORACLE_SQL["fingerprint_counts"] = r"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(CASE WHEN len(tk) < 4 THEN 1
       ELSE len(list_distinct(list_transform(range(1, len(tk) - 2),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])))
  END AS BIGINT) AS n_fingerprints
FROM toks
""".strip()


def q_quality_filter(sf_dir: str):
    """Gopher/C4-style quality gate: word-repetition metrics + pass
    verdict per doc (see stages/text.py:quality_filter)."""
    from ..stages.text import quality_filter

    return quality_filter(_docs(sf_dir))


QUERIES["quality_filter"] = q_quality_filter
ORACLE_SQL["quality_filter"] = r"""
WITH tok AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
  FROM documents
), cnt AS (
  SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w
), agg AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS top_cnt
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n_words, n_distinct,
  CAST(n_words - n_distinct AS DOUBLE) / n_words AS dup_word_frac,
  CAST(top_cnt AS DOUBLE) / n_words AS top_word_frac,
  (n_words >= 20
   AND CAST(n_words - n_distinct AS DOUBLE) / n_words <= 0.5
   AND CAST(top_cnt AS DOUBLE) / n_words <= 0.12) AS passes
FROM agg
""".strip()


# deterministic planted PII suffix (the corpus itself is clean word
# soup — the same de-vacuation trick as the planted near-dup queries):
# one URL, one email, one long digit run, appended to every 7th doc in
# BOTH the Ray pipeline and the oracle.
_PII_SUFFIX = (
    " contact alice.smith@example.org or"
    " https://data.example.com/path?x=1&y=2 ref 9876543210"
)


def q_pii_scrub(sf_dir: str):
    """URL/email/long-number redaction over the planted-augmented
    corpus; counts + scrubbed text per doc (stages/text.py:pii_scrub)."""
    import numpy as np
    import pyarrow as pa

    from ..stages.text import pii_scrub

    def _aug(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        s = tbl.column("text").to_pandas().fillna("")
        aug = np.where(ids % 7 == 0, s + _PII_SUFFIX, s)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(aug, pa.string()),
            }
        )

    return pii_scrub(
        _docs(sf_dir).map_batches(_aug, batch_format="pyarrow")
    )


def _pii_sql() -> str:
    from ..stages.text import SCRUB_PATTERNS

    counts = []
    clean = "t"
    for name, pat, repl in SCRUB_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"""
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    text || CASE WHEN doc_id % 7 = 0 THEN '{_PII_SUFFIX}' ELSE '' END AS t
  FROM documents
)
SELECT doc_id, {", ".join(counts)}, {clean} AS clean_text FROM aug
""".strip()


QUERIES["pii_scrub"] = q_pii_scrub
ORACLE_SQL["pii_scrub"] = _pii_sql()


def q_doc_freq_score(sf_dir: str):
    """Two-pass broadcast-model scoring: global token counts (pass 1,
    distributed aggregation; the VOCABULARY — not the corpus — lands on
    the driver) → mean corpus token frequency per doc (pass 2,
    streaming against the ray.put model)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..stages.groupagg import hash_grouped_aggregate
    from ..stages.text import doc_freq_score

    from ..stages.text import token_count_partial as _partial

    docs = _docs(sf_dir)
    counts = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["tok"],
        [("n", "sum")],
        num_buckets=16,
    )
    vocab = pa.concat_tables(
        [ray.get(r) for r in counts.to_arrow_refs()]
    ).combine_chunks()
    return doc_freq_score(docs, vocab)


QUERIES["doc_freq_score"] = q_doc_freq_score
ORACLE_SQL["doc_freq_score"] = r"""
WITH tok AS (
  SELECT doc_id,
    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
  FROM documents
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
), per AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(v.c) AS BIGINT) AS freq_sum
  FROM tok t JOIN vocab v USING (w) GROUP BY t.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens, freq_sum,
  CAST(freq_sum AS DOUBLE) / n_tokens AS freq_score
FROM per
""".strip()


POSTINGS_CAP = 20


def q_token_postings(sf_dir: str):
    """Bounded inverted index: per token, the document frequency plus
    the first POSTINGS_CAP doc_ids (sorted) as a comma-joined posting
    segment — the lexical-search build next to tfidf_scores.

    Scale shape: per-batch DISTINCT (tok, doc_id) pairs ride a
    token-hash exchange (each token wholly in one partition, pairs only
    — never raw text); inside a partition ONE C++ sort + vectorized run
    detection computes df and caps the posting list BEFORE any string
    is built, so output per token is bounded no matter how hot the
    token (the full chain lives in sharded segments, exactly how a real
    index bounds its posting blocks)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_exchange

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def _pairs(tbl: pa.Table) -> pa.Table:
        s = tbl.column("text").to_pandas().fillna("")
        ids = tbl.column("doc_id").to_pandas()
        ex = s.str.split().explode().dropna()
        df = pd.DataFrame(
            {
                "tok": ex.to_numpy(),
                "doc_id": ids.reindex(ex.index).to_numpy(dtype=np.int64),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "tok": pa.array(df["tok"].to_numpy(dtype=object)),
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            }
        )

    out_schema = pa.schema(
        [
            ("tok", pa.string()),
            ("df", pa.int64()),
            ("postings", pa.string()),
        ]
    )

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        t = tbl.take(
            pc.sort_indices(
                tbl,
                sort_keys=[("tok", "ascending"), ("doc_id", "ascending")],
            )
        )
        toks = t.column("tok").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy()
        n = len(toks)
        new = np.ones(n, dtype=bool)
        new[1:] = toks[1:] != toks[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, n])
        # rank within run, cap BEFORE building strings
        run_id = np.cumsum(new) - 1
        rank = np.arange(n) - starts[run_id]
        keep = rank < POSTINGS_CAP
        joined = (
            pd.Series(ids[keep].astype(str))
            .groupby(run_id[keep], sort=True)
            .agg(",".join)
        )
        return pa.table(
            {
                "tok": pa.array(toks[starts], pa.string()),
                "df": pa.array(lens.astype(np.int64)),
                "postings": pa.array(joined.to_numpy(dtype=object)),
            }
        )

    pairs = docs.map_batches(_pairs, batch_format="pyarrow", batch_size=None)
    return hash_exchange(pairs, ["tok"], 16, _kernel, out_schema)


QUERIES["token_postings"] = q_token_postings
ORACLE_SQL["token_postings"] = rf"""
WITH pairs AS (
  SELECT DISTINCT doc_id,
    unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
  FROM documents
)
SELECT tok, CAST(count(*) AS BIGINT) AS df,
  array_to_string(
    list_slice(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id),
               1, {POSTINGS_CAP}), ',') AS postings
FROM pairs GROUP BY tok
""".strip()


# --------------------------------------------------------------------------
# data-mixture sampling: per-source keep rates (the training-mix
# operator — upsample curated sources, downsample bulk scrapes) via a
# deterministic per-row coin that both engines compute identically.
# The coin ((doc_id * 37 + 11) % 100) is a gate-checkable stand-in for
# the production hash64-based coin (functions/hashing.py) — swap the
# coin, keep the plumbing.

MIXTURE_RATES = {f"src{i}": (80 if i % 2 == 0 else 25) for i in range(20)}


def q_mixture_sample(sf_dir: str):
    """Rate-based mixture sample: each source kept at its configured
    percentage. Pure per-batch filter — rates ride the closure (tiny
    broadcast), the corpus streams, nothing shuffles."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    srcs = sorted(MIXTURE_RATES)
    thr = np.array([MIXTURE_RATES[s] for s in srcs], np.int64)
    src_arr = pa.array(srcs, pa.string())

    def _keep(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        coin = (ids * 37 + 11) % 100
        idx = pc.index_in(tbl.column("source"), value_set=src_arr)
        idx_np = idx.to_numpy(zero_copy_only=False)
        known = ~np.isnan(idx_np)
        t = np.zeros(tbl.num_rows, np.int64)  # unknown source -> rate 0
        t[known] = thr[idx_np[known].astype(np.int64)]
        return tbl.filter(pa.array(coin < t))

    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "lang"],
    )
    return docs.map_batches(_keep, batch_format="pyarrow")


QUERIES["mixture_sample"] = q_mixture_sample

_MIX_CASE = " ".join(
    f"WHEN '{s}' THEN {r}" for s, r in sorted(MIXTURE_RATES.items())
)
ORACLE_SQL["mixture_sample"] = f"""
SELECT doc_id, source, lang FROM documents
WHERE (doc_id * 37 + 11) % 100 <
      (CASE source {_MIX_CASE} ELSE 0 END)
""".strip()


def q_canonical_text(sf_dir: str):
    """Dedup-grade text canonicalization as a DERIVED column (raw text
    preserved byte-exact per the engine invariant): lowercase, collapse
    whitespace runs, trim — all Arrow C++ kernels (RE2), patterns
    shared verbatim with the oracle's regexp_replace."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def _canon(tbl: pa.Table) -> pa.Table:
        canon = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(tbl.column("text")), r"\s+", " "
            ),
            characters=" ",
        )
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "text": tbl.column("text"),
                "canon": canon,
            }
        )

    return docs.map_batches(_canon, batch_format="pyarrow")


QUERIES["canonical_text"] = q_canonical_text
ORACLE_SQL["canonical_text"] = r"""
SELECT doc_id, text,
  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS canon
FROM documents
""".strip()


def q_hll_tokens_per_source(sf_dir: str):
    """Approximate per-source vocabulary size via grouped HyperLogLog
    (stages/sketches.hll_distinct_grouped): register partials are
    mergeable, so shuffled bytes per batch are bounded by
    sources × 2**p regardless of corpus size — the sketch twin of the
    exact q_distinct_tokens_per_source (tolerance-tested against it in
    tests/test_sketches.py; approximate ⇒ rows-only in the gate)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash64_columns
    from ..functions.tokenize import ws_tokens
    from ..sources.parquet import read_parquet_tuned
    from ..stages.sketches import hll_distinct_grouped

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "text"],
    )

    def _kv(tbl: pa.Table):
        row_idx, flat = ws_tokens(tbl.column("text"))
        src = tbl.column("source").to_numpy(zero_copy_only=False)[row_idx]
        h = hash64_columns(pa.table({"t": flat}), ["t"])
        return src, h

    return hll_distinct_grouped(docs, "source", _kv, p=12)


QUERIES["hll_tokens_per_source"] = q_hll_tokens_per_source


TOKEN_BUDGET = 512


def q_token_budget_chunks(sf_dir: str):
    """Offset-based sequence packing: assign each document to a
    training chunk by its global token OFFSET (chunk = floor(offset /
    budget), the standard approximate packing where boundary docs are
    split at tokenization time). The offset is the engine's two-phase
    global prefix scan over doc_id order — per-block token sums to the
    driver, never rows."""
    import numpy as np
    import pyarrow as pa

    from ..functions.tokenize import ws_tokens
    from ..sources.parquet import read_parquet_tuned
    from ..stages.scan import global_scan

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    def _ntok(tbl: pa.Table) -> pa.Table:
        row_idx, _ = ws_tokens(tbl.column("text"))
        n = np.bincount(row_idx, minlength=tbl.num_rows).astype(np.int64)
        return pa.table(
            {"doc_id": tbl.column("doc_id"), "n_tokens": pa.array(n)}
        )

    scanned = global_scan(
        docs.map_batches(_ntok, batch_format="pyarrow"),
        [("doc_id", "ascending")],
        [("n_tokens", "cum_tokens")],
    )

    def _chunk(tbl: pa.Table) -> pa.Table:
        cum = tbl.column("cum_tokens").to_numpy(zero_copy_only=False)
        ntk = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        off = cum - ntk
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_tokens": tbl.column("n_tokens"),
                "chunk_id": pa.array(off // TOKEN_BUDGET),
            }
        )

    return scanned.map_batches(_chunk, batch_format="pyarrow")


QUERIES["token_budget_chunks"] = q_token_budget_chunks
ORACLE_SQL["token_budget_chunks"] = rf"""
WITH t AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split_regex(text, '\s+'),
             x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens,
  CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       - n_tokens AS BIGINT) // {TOKEN_BUDGET} AS chunk_id
FROM t
""".strip()


def q_vocab_growth(sf_dir: str):
    """Vocabulary growth curve per source: how many NEW tokens each
    document introduces, and the running vocabulary size — the
    corpus-diversity diagnostic for training-data curation. Three-step
    composition, no step ever holds raw text after the first:
    (source, tok) → min(doc_id) on the pair-keyed exchange (first
    sighting), then per-(source, first_doc) counts, then the grouped
    prefix scan for the running total."""
    import numpy as np
    import pyarrow as pa

    from ..functions.tokenize import ws_tokens
    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate
    from ..stages.scan import grouped_scan

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )

    def _pair_partial(tbl: pa.Table) -> pa.Table:
        row_idx, flat = ws_tokens(tbl.column("text"))
        t = pa.table(
            {
                "source": tbl.column("source").take(pa.array(row_idx)),
                "tok": flat,
                "first_doc": tbl.column("doc_id").take(pa.array(row_idx)),
            }
        )
        return group_aggregate_table(
            t, ["source", "tok"], [("first_doc", "min")]
        )

    firsts = hash_grouped_aggregate(
        docs.map_batches(
            _pair_partial, batch_format="pyarrow", batch_size=None
        ),
        ["source", "tok"],
        [("first_doc", "min")],
        num_buckets=8,
    )

    def _doc_partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": tbl.column("source"),
                "doc_id": tbl.column("first_doc").cast(pa.int64()),
                "new_toks": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["source", "doc_id"], [("new_toks", "sum")]
        )

    per_doc = hash_grouped_aggregate(
        firsts.map_batches(
            _doc_partial, batch_format="pyarrow", batch_size=None
        ),
        ["source", "doc_id"],
        [("new_toks", "sum")],
        num_buckets=8,
    )

    def _typed(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": tbl.column("source"),
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "new_toks": tbl.column("new_toks").cast(pa.int64()),
            }
        )

    return grouped_scan(
        per_doc.map_batches(_typed, batch_format="pyarrow", batch_size=None),
        "source",
        [("doc_id", "ascending")],
        [("cumsum", "new_toks", "vocab_size")],
        num_partitions=8,
    )


QUERIES["vocab_growth"] = q_vocab_growth
ORACLE_SQL["vocab_growth"] = r"""
WITH pairs AS (
  SELECT source, doc_id,
    unnest(list_filter(string_split_regex(text, '\s+'),
           x -> x <> '')) AS tok
  FROM documents),
firsts AS (
  SELECT source, tok, min(doc_id) AS first_doc
  FROM pairs GROUP BY source, tok),
per_doc AS (
  SELECT source, first_doc AS doc_id,
    CAST(count(*) AS BIGINT) AS new_toks
  FROM firsts GROUP BY source, first_doc)
SELECT source, doc_id, new_toks,
  CAST(SUM(new_toks) OVER (PARTITION BY source ORDER BY doc_id
       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
FROM per_doc
""".strip()


def q_heavy_hitter_tokens(sf_dir: str, k: int = 20, capacity: int = 256):
    """Approximate top-k heavy hitters via the mergeable Misra-Gries
    sketch: the sketch analog of ``top_tokens`` with memory bounded by
    ``capacity`` counters per stage instead of the partition
    vocabulary — the 100-TB shape when the vocabulary itself doesn't
    fit a reduce task. Estimates never exceed the true count and
    undercount ≤ err_bound = 3·N/(capacity+1); the bound and the
    guaranteed-containment property are pytest-checked against exact
    counts in the genuinely approximate regime (a 3000-token tail,
    tests/test_sketches.py). The synthetic corpus has a fixed ~31-word
    vocabulary < capacity at every sf tier, so HERE no tier ever
    subtracts and the estimates ARE the exact counts — plain SQL is a
    full-strength oracle (the same pinned-exact-regime gate as the
    quantile sketch, stages/sketches.py module docstring)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.tokenize import ws_tokens
    from ..stages.sketches import mg_topk_tokens

    def _toks(tbl: pa.Table) -> np.ndarray:
        _, flat = ws_tokens(tbl.column("text"))
        return flat.to_numpy(zero_copy_only=False)

    return mg_topk_tokens(
        _docs(sf_dir), _toks, k=k, capacity=capacity, num_partitions=8
    )


QUERIES["heavy_hitter_tokens"] = q_heavy_hitter_tokens
ORACLE_SQL["heavy_hitter_tokens"] = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                x -> x <> '')) AS tok
  FROM documents
), tot AS (SELECT count(*) AS n FROM toks)
SELECT tok, est, CAST(3 * tot.n // 257 AS BIGINT) AS err_bound
FROM (
  SELECT tok, CAST(count(*) AS BIGINT) AS est,
    row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
  FROM toks GROUP BY tok), tot
WHERE rk <= 20
""".strip()


BM25_K1 = 1.2
BM25_B = 0.75  # 1 - b = 0.25, written as the literal 0.25 on BOTH sides


def q_bm25_scores(sf_dir: str):
    """Okapi BM25 lexical scoring against the fixed TFIDF_TERMS query
    set — tfidf_scores plus document-length normalization, the standard
    retrieval ranking a pre-training curation pipeline uses to mine
    topical documents.

    Two streaming passes (same shape as tfidf_scores): (1) mergeable
    per-batch corpus statistics — per-term document frequencies, doc
    count, total token count → 5 scalars broadcast via ``ray.put``;
    (2) per-doc term counts + doc length → score. IEEE-parity is
    engineered, not hoped for: a rational idf (no ``ln`` — libm vs
    DuckDB rounding is not bit-stable), every constant written as the
    same literal on both sides (``2.2``, ``1.2``, ``0.25``, ``0.75``,
    ``0.5``), one division per factor, and a fixed term order with
    left-associated accumulation so the doubles match the
    identically-shaped SQL expression bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..stages.groupagg import group_aggregate_table

    docs = _docs(sf_dir)

    def _tf_dl(texts):
        """((n_docs, n_terms) term counts, (n_docs,) token counts)."""
        ex = texts.fillna("").str.split().explode()
        mask = ex.notna()
        row = ex.index.to_numpy()[mask].astype(np.int64)
        toks = ex[mask]
        tf = np.zeros((len(texts), len(TFIDF_TERMS)), np.int64)
        for j, term in enumerate(TFIDF_TERMS):
            hits = (toks == term).to_numpy()
            tf[:, j] = np.bincount(
                row, weights=hits.astype(np.float64), minlength=len(texts)
            ).astype(np.int64)
        dl = np.bincount(row, minlength=len(texts)).astype(np.int64)
        return tf, dl

    def _stats_partial(tbl: pa.Table) -> pa.Table:
        tf, dl = _tf_dl(tbl.column("text").to_pandas())
        cols = {"_k": pa.array(np.zeros(1, np.int64))}
        for j, term in enumerate(TFIDF_TERMS):
            cols[f"df_{term}"] = pa.array(
                [int((tf[:, j] > 0).sum())], pa.int64()
            )
        cols["nd"] = pa.array([tbl.num_rows], pa.int64())
        cols["st"] = pa.array([int(dl.sum())], pa.int64())
        return pa.table(cols)

    parts = pa.concat_tables(
        [
            ray.get(r)
            for r in docs.map_batches(
                _stats_partial, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        ]
    )
    tot = group_aggregate_table(
        parts,
        ["_k"],
        [(f"df_{t}", "sum") for t in TFIDF_TERMS]
        + [("nd", "sum"), ("st", "sum")],
    )
    dfs = np.array(
        [int(tot.column(f"df_{t}")[0].as_py()) for t in TFIDF_TERMS],
        np.int64,
    )
    nd = int(tot.column("nd")[0].as_py())
    st = int(tot.column("st")[0].as_py())
    stats_ref = ray.put((dfs, nd, st))

    def _score(tbl: pa.Table) -> pa.Table:
        d, n_docs, sum_dl = ray.get(stats_ref)
        tf, dl = _tf_dl(tbl.column("text").to_pandas())
        avgdl = float(sum_dl) / float(n_docs)
        dlf = dl.astype(np.float64)
        score = np.zeros(tbl.num_rows, np.float64)
        for j in range(len(TFIDF_TERMS)):
            idf = (float(n_docs - d[j]) + 0.5) / (float(d[j]) + 0.5)
            num = tf[:, j].astype(np.float64) * 2.2
            den = tf[:, j].astype(np.float64) + 1.2 * (
                0.25 + 0.75 * (dlf / avgdl)
            )
            score = score + idf * num / den
        cols = {"doc_id": tbl.column("doc_id"), "dl": pa.array(dl)}
        for j, term in enumerate(TFIDF_TERMS):
            cols[f"tf_{term}"] = pa.array(tf[:, j])
        cols["score"] = pa.array(score)
        return pa.table(cols)

    return docs.map_batches(_score, batch_format="pyarrow", batch_size=None)


QUERIES["bm25_scores"] = q_bm25_scores


def _bm25_sql() -> str:
    tf_exprs = ",\n  ".join(
        "CAST(len(list_filter(tk, x -> x = '{t}')) AS BIGINT) AS tf_{t}".format(
            t=t
        )
        for t in TFIDF_TERMS
    )
    df_ctes = ",\n".join(
        "df_{t} AS (SELECT count(*) AS d FROM toks "
        "WHERE list_contains(tk, '{t}'))".format(t=t)
        for t in TFIDF_TERMS
    )
    contribs = " + ".join(
        "(CAST((SELECT nd FROM tot) - (SELECT d FROM df_{t}) AS DOUBLE) + 0.5)"
        " / (CAST((SELECT d FROM df_{t}) AS DOUBLE) + 0.5)"
        " * (CAST(tf_{t} AS DOUBLE) * 2.2)"
        " / (CAST(tf_{t} AS DOUBLE) + 1.2 * (0.25 + 0.75 *"
        " (CAST(dl AS DOUBLE) / (SELECT ad FROM tot))))".format(t=t)
        for t in TFIDF_TERMS
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents
),
{df_ctes},
tot AS (
  SELECT count(*) AS nd,
    CAST(sum(len(tk)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS ad
  FROM toks
),
tf AS (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
  {tf_exprs}
  FROM toks
)
SELECT doc_id, dl, {', '.join('tf_' + t for t in TFIDF_TERMS)},
  {contribs} AS score
FROM tf
""".strip()


ORACLE_SQL["bm25_scores"] = _bm25_sql()


def q_doc_repetition(sf_dir: str):
    """Gopher-style intra-document repetition signals — the quality
    filters a pre-training curation pipeline runs to drop boilerplate
    and degenerate generations: per doc, token/distinct-token counts,
    the most-frequent-token and most-frequent-bigram multiplicities,
    and the two repetition fractions built from them
    (``dup_tok_frac = (n_tokens - n_distinct) / n_tokens``,
    ``top_bigram_frac = top_bigram_n / (n_tokens - 1)``).

    Stateless per-batch map — embarrassingly parallel, no shuffle.
    Inside a batch everything is one factorize + two lexsort run-counts
    (tokens, then adjacent bigrams); no Python loop over docs. All
    counts are int64; each fraction is a single IEEE division with the
    identical CASE guard on both sides, so parity is exact."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    docs = _docs(sf_dir)

    def _rep(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        texts = tbl.column("text").to_pandas().fillna("")
        ex = texts.str.split().explode()
        mask = ex.notna()
        rows = ex.index.to_numpy()[mask.to_numpy()].astype(np.int64)
        toks = ex[mask]
        n_tok = np.bincount(rows, minlength=n).astype(np.int64)
        codes = pd.factorize(toks, sort=False)[0].astype(np.int64)
        n_distinct = np.zeros(n, np.int64)
        max_tok = np.zeros(n, np.int64)
        if len(rows):
            o = np.lexsort((codes, rows))
            r, c = rows[o], codes[o]
            new = np.r_[True, (r[1:] != r[:-1]) | (c[1:] != c[:-1])]
            starts = np.flatnonzero(new)
            cnt = np.diff(np.r_[starts, len(r)])
            r_run = r[starts]
            n_distinct = np.bincount(r_run, minlength=n).astype(np.int64)
            np.maximum.at(max_tok, r_run, cnt)
        top_bi = np.zeros(n, np.int64)
        if len(rows) > 1:
            adj = rows[1:] == rows[:-1]  # explode preserves in-doc order
            br = rows[:-1][adj]
            b1 = codes[:-1][adj]
            b2 = codes[1:][adj]
            if len(br):
                o = np.lexsort((b2, b1, br))
                rr, x1, x2 = br[o], b1[o], b2[o]
                new = np.r_[
                    True,
                    (rr[1:] != rr[:-1]) | (x1[1:] != x1[:-1])
                    | (x2[1:] != x2[:-1]),
                ]
                starts = np.flatnonzero(new)
                cnt = np.diff(np.r_[starts, len(rr)])
                np.maximum.at(top_bi, rr[starts], cnt)
        ntf = n_tok.astype(np.float64)
        dup_frac = np.where(
            n_tok >= 1, (n_tok - n_distinct).astype(np.float64) / ntf, np.nan
        )
        bi_frac = np.where(
            n_tok >= 2, top_bi.astype(np.float64) / (ntf - 1.0), np.nan
        )
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_tokens": pa.array(n_tok),
                "n_distinct": pa.array(n_distinct),
                "max_tok_n": pa.array(max_tok),
                "top_bigram_n": pa.array(top_bi),
                "dup_tok_frac": pa.array(dup_frac).cast(pa.float64()),
                "top_bigram_frac": pa.array(bi_frac).cast(pa.float64()),
            }
        )

    out = docs.map_batches(_rep, batch_format="pyarrow", batch_size=None)

    def _nullify(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # NaN -> NULL so the frame matches SQL's CASE ... ELSE NULL
        cols = {c: tbl.column(c) for c in tbl.column_names}
        for c in ("dup_tok_frac", "top_bigram_frac"):
            v = tbl.column(c)
            cols[c] = pc.if_else(pc.is_nan(v), pa.nulls(tbl.num_rows, pa.float64()), v)
        return pa.table(cols)

    return out.map_batches(_nullify, batch_format="pyarrow", batch_size=None)


QUERIES["doc_repetition"] = q_doc_repetition
ORACLE_SQL["doc_repetition"] = r"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents
), ex AS (
  SELECT doc_id, unnest(tk) AS tok,
         unnest(range(len(tk))) AS i
  FROM toks
), tc AS (
  SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY doc_id, tok
), per_tok AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS max_tok_n,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM tc GROUP BY doc_id
), bi AS (
  SELECT a.doc_id, a.tok AS t1, b.tok AS t2, count(*) AS c
  FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  GROUP BY a.doc_id, a.tok, b.tok
), per_bi AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n
  FROM bi GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(pt.n_tokens, 0) AS n_tokens,
  COALESCE(pt.n_distinct, 0) AS n_distinct,
  COALESCE(pt.max_tok_n, 0) AS max_tok_n,
  COALESCE(pb.top_bigram_n, 0) AS top_bigram_n,
  CASE WHEN COALESCE(pt.n_tokens, 0) >= 1 THEN
    CAST(pt.n_tokens - pt.n_distinct AS DOUBLE)
      / CAST(pt.n_tokens AS DOUBLE)
  ELSE NULL END AS dup_tok_frac,
  CASE WHEN COALESCE(pt.n_tokens, 0) >= 2 THEN
    CAST(COALESCE(pb.top_bigram_n, 0) AS DOUBLE)
      / (CAST(pt.n_tokens AS DOUBLE) - 1.0)
  ELSE NULL END AS top_bigram_frac
FROM documents d
LEFT JOIN per_tok pt USING (doc_id)
LEFT JOIN per_bi pb USING (doc_id)
""".strip()


def q_token_dictionary(sf_dir: str):
    """Distributed dictionary encoding: assign every distinct token a
    dense contiguous id by lexicographic order — the vocabulary-build
    primitive (tokenizer tables, categorical encoders, embedding row
    ids) that needs a GLOBAL rank, not a hash.

    Two mergeable stages: per-batch distinct partials → token-hash
    exchange (exact global distinct, each token once) → the sample-
    based RANGE-partitioned sort (``stages/sort.sort_by``) whose
    per-partition counts give exact prefix offsets, so ``tok_id`` is
    the true global rank with no single-node sort. Matches SQL
    ``dense_rank() OVER (ORDER BY tok) - 1`` exactly (ids are
    contiguous 0..V-1 because the input is distinct)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate
    from ..stages.sort import sort_by

    docs = _docs(sf_dir)

    def _partial(tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pandas().fillna("")
        ex = texts.str.split().explode()
        toks = ex[ex.notna()]
        u = pd.unique(toks)
        return pa.table(
            {
                "tok": pa.array(u, pa.string()),
                "one": pa.array(np.ones(len(u), np.int64)),
            }
        )

    distinct = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["tok"],
        [("one", "min")],
        num_buckets=8,
    ).map_batches(
        lambda t: t.select(["tok"]), batch_format="pyarrow",
        batch_size=None,
    )
    ranked = sort_by(
        distinct, [("tok", "ascending")], num_partitions=8,
        rank_col="tok_id",
    )

    def _zero_base(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "tok": t.column("tok"),
                "tok_id": pc.subtract(
                    t.column("tok_id").cast(pa.int64()), 1
                ),
            }
        )

    return ranked.map_batches(_zero_base, batch_format="pyarrow",
                              batch_size=None)


QUERIES["token_dictionary"] = q_token_dictionary
ORACLE_SQL["token_dictionary"] = r"""
WITH toks AS (
  SELECT DISTINCT unnest(
    list_filter(string_split_regex(text, '\s+'), x -> x <> '')
  ) AS tok
  FROM documents
)
SELECT tok, CAST(dense_rank() OVER (ORDER BY tok) - 1 AS BIGINT)
  AS tok_id
FROM toks
""".strip()


BPE_NUM_MERGES = 24


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer training over the corpus: the learned merge table
    (rank, left, right, merged, pair_count). Corpus-scale work is the
    exact word-count reduction; the merge loop runs over the BOUNDED
    distinct-word table (stages/bpe.py). Deterministic (integer counts,
    lexicographic tie-break) but iterative — not SQL-expressible, so
    rows-only in the gate with a pytest reference-implementation
    oracle (tests/test_bpe.py)."""
    from ..stages.bpe import learn_bpe

    return learn_bpe(_docs(sf_dir), num_merges=BPE_NUM_MERGES)


def q_bpe_doc_stats(sf_dir: str):
    """Per-doc BPE compression stats (n_words, n_pieces) with the
    corpus-trained merges — segmentation as a stateful actor-pool
    stage (ranks in __init__, distinct-word cache per batch)."""
    from ..stages.bpe import bpe_doc_stats, learn_bpe

    merges = learn_bpe(_docs(sf_dir), num_merges=BPE_NUM_MERGES)
    return bpe_doc_stats(_docs(sf_dir), merges)


QUERIES["bpe_merges"] = q_bpe_merges
QUERIES["bpe_doc_stats"] = q_bpe_doc_stats
# iterative training: rows-only in the driver gate (pytest oracle)


WEIGHTED_SAMPLE_K = 50


def q_weighted_sample_docs(sf_dir: str):
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each doc gets priority
    ``ln(u) / w`` with ``u = (splitmix64(doc_id)+0.5) / 2^64`` and
    weight ``w = n_chars``; the global top-k by priority IS a weighted
    sample — the training-mix constructor that favors long documents
    without any RNG state (reruns and retries pick the identical
    sample).

    Scale shape: stateless per-batch priority + per-batch top-k
    PARTIALS → a ≤ k × n_blocks driver merge (the established top-k
    pattern). Round-4 (verdict #6): the RNG-free splitmix64 finalizer
    (``functions/hashing.rehash64``) is reproduced bit-exactly in the
    DuckDB oracle (UBIGINT xor/shift + 32-bit-split HUGEINT modular
    multiply), so the query is now rows+schema+hash in the gate. The
    output carries the SELECTED rows only (no priority column): numpy
    and DuckDB ``ln`` agree to ≤1 ulp — orders of magnitude below any
    top-k boundary gap, but not bit-identical."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..functions.hashing import rehash64
    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )

    def _prio(tbl: pa.Table):
        ids = tbl.column("doc_id").cast(pa.int64()).to_numpy()
        w = tbl.column("n_chars").cast(pa.int64()).to_numpy()
        h = rehash64(ids.astype(np.uint64), seed=0)
        u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
        pr = np.where(w > 0, np.log(u) / w.astype(np.float64), -np.inf)
        return ids, w, pr

    def _partial(tbl: pa.Table) -> pa.Table:
        ids, w, pr = _prio(tbl)
        keep = w > 0  # zero-weight docs are unsampleable (oracle: WHERE)
        ids, w, pr = ids[keep], w[keep], pr[keep]
        top = np.lexsort((ids, -pr))[:WEIGHTED_SAMPLE_K]
        return pa.table(
            {
                "doc_id": pa.array(ids[top]),
                "n_chars": pa.array(w[top]),
                "priority": pa.array(pr[top]),
            }
        )

    parts = [
        t
        for t in ray.get(
            docs.map_batches(
                _partial, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows > 0
    ]
    if not parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
            }
        )
    m = pa.concat_tables(parts)
    ids = m.column("doc_id").to_numpy()
    w = m.column("n_chars").to_numpy()
    pr = m.column("priority").to_numpy()
    top = np.lexsort((ids, -pr))[:WEIGHTED_SAMPLE_K]
    return pa.table(
        {
            "doc_id": pa.array(ids[top]),
            "n_chars": pa.array(w[top]),
        }
    )


def _splitmix_mulmod(c: int) -> str:
    """``x*c mod 2^64`` in DuckDB without INT128 overflow: split the
    64-bit constant into 32-bit halves — ``x*c_lo < 2^96`` fits
    HUGEINT, and the high half only needs its low 32 bits before the
    ``* 2^32``."""
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (
        f"CAST((((CAST(x AS HUGEINT) % 4294967296) * {hi} % 4294967296)"
        f" * 4294967296 + CAST(x AS HUGEINT) * {lo})"
        f" % 18446744073709551616 AS UBIGINT)"
    )


SQL_WEIGHTED_SAMPLE = f"""
WITH s0 AS (
  SELECT doc_id, n_chars, CAST(doc_id AS UBIGINT) AS x FROM documents
), s1 AS (SELECT doc_id, n_chars, xor(x, x >> 30) AS x FROM s0
), s2 AS (SELECT doc_id, n_chars, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM s1
), s3 AS (SELECT doc_id, n_chars, xor(x, x >> 27) AS x FROM s2
), s4 AS (SELECT doc_id, n_chars, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM s3
), s5 AS (SELECT doc_id, n_chars, xor(x, x >> 31) AS x FROM s4
), pri AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
    ln((CAST(x AS DOUBLE) + 0.5) / 18446744073709551616.0)
      / CAST(n_chars AS DOUBLE) AS p
  FROM s5 WHERE n_chars > 0
)
SELECT doc_id, n_chars FROM pri
ORDER BY p DESC, doc_id LIMIT {WEIGHTED_SAMPLE_K}
""".strip()


QUERIES["weighted_sample_docs"] = q_weighted_sample_docs
ORACLE_SQL["weighted_sample_docs"] = SQL_WEIGHTED_SAMPLE


# --------------------------------------------------------------------------
# context-window sequence packing (round-4): the layout step a
# pretraining dataloader consumes — docs in a deterministic global
# order, packed into fixed-capacity bins by GLOBAL prefix sum.

PACK_CAPACITY = 4096


def q_sequence_packing(sf_dir: str):
    """Chunked sequence packing: in global ``doc_id`` order, doc ``i``
    starts at global offset ``cumsum(n_chars) - n_chars`` and lands in
    bin ``start // PACK_CAPACITY`` at ``start % PACK_CAPACITY`` — the
    deterministic packing layout (a doc straddling a boundary belongs
    to the bin where it starts; the dataloader splits it there).

    Scale shape: one range-partitioned global sort + the two-phase
    prefix scan (``stages/scan.global_scan`` — per-block int sums,
    O(blocks) scalars through the driver, per-block rebase). No
    sequential driver loop, no per-row Python."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.scan import global_scan

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )
    scanned = global_scan(
        docs,
        sort_keys=[("doc_id", "ascending")],
        cum_cols=[("n_chars", "cum")],
    )

    def _bins(tbl: pa.Table) -> pa.Table:
        cum = tbl.column("cum").to_numpy(zero_copy_only=False)
        n = tbl.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        start = cum - n
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "n_chars": pa.array(n),
                "bin_id": pa.array(start // PACK_CAPACITY),
                "offset_in_bin": pa.array(start % PACK_CAPACITY),
            }
        )

    return scanned.map_batches(
        _bins, batch_format="pyarrow", batch_size=None
    )


SQL_SEQUENCE_PACKING = f"""
WITH s AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
    CAST(sum(n_chars) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM documents
)
SELECT doc_id, n_chars,
  (cum - n_chars) // {PACK_CAPACITY} AS bin_id,
  (cum - n_chars) % {PACK_CAPACITY} AS offset_in_bin
FROM s
""".strip()

QUERIES["sequence_packing"] = q_sequence_packing
ORACLE_SQL["sequence_packing"] = SQL_SEQUENCE_PACKING


# --------------------------------------------------------------------------
# deterministic global shuffle + shard layout (training-data export)

SHUFFLE_SHARD_BUDGET = 8192


def q_global_shuffle_export(sf_dir: str):
    """The export step a pretraining dataloader consumes: the corpus in
    a DETERMINISTIC global shuffle order — ``splitmix64(doc_id)`` as
    the sort key, so reruns, retries, and resumed jobs produce the
    identical permutation with zero RNG state — then sharded by
    cumulative char budget in shuffled order (each output shard is a
    contiguous rank range ≈ ``SHUFFLE_SHARD_BUDGET`` chars).

    Scale shape: stateless per-batch key map → range-partitioned
    sample sort on the hash key + the two-phase global prefix scan
    (``stages/scan.global_scan``) — O(blocks) scalars through the
    driver, no ``random_shuffle`` all-to-all, no materialization. The
    hash key is uniform, so the sampled ranges are balanced by
    construction (no skew salting needed)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import rehash64
    from ..sources.parquet import read_parquet_tuned
    from ..stages.scan import global_scan

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )

    def _key(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").cast(pa.int64()).to_numpy()
        h = rehash64(ids.astype(np.uint64), seed=0)
        return tbl.append_column(
            "shuffle_key", pa.array(h, pa.uint64())
        )

    keyed = docs.map_batches(_key, batch_format="pyarrow")
    scanned = global_scan(
        keyed,
        sort_keys=[("shuffle_key", "ascending"), ("doc_id", "ascending")],
        cum_cols=[("n_chars", "cum")],
        rank_col="shuffle_rank",
    )

    def _shard(tbl: pa.Table) -> pa.Table:
        cum = tbl.column("cum").to_numpy(zero_copy_only=False)
        n = tbl.column("n_chars").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        start = cum - n
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "shuffle_rank": tbl.column("shuffle_rank").cast(
                    pa.int64()
                ),
                "shard_id": pa.array(start // SHUFFLE_SHARD_BUDGET),
            }
        )

    return scanned.map_batches(
        _shard, batch_format="pyarrow", batch_size=None
    )


SQL_GLOBAL_SHUFFLE = f"""
WITH s0 AS (
  SELECT doc_id, n_chars, CAST(doc_id AS UBIGINT) AS x FROM documents
), s1 AS (SELECT doc_id, n_chars, xor(x, x >> 30) AS x FROM s0
), s2 AS (SELECT doc_id, n_chars, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM s1
), s3 AS (SELECT doc_id, n_chars, xor(x, x >> 27) AS x FROM s2
), s4 AS (SELECT doc_id, n_chars, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM s3
), s5 AS (SELECT doc_id, n_chars, xor(x, x >> 31) AS x FROM s4
), ordered AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
    row_number() OVER (ORDER BY x, doc_id) AS shuffle_rank,
    CAST(sum(n_chars) OVER (ORDER BY x, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM s5
)
SELECT doc_id, CAST(shuffle_rank AS BIGINT) AS shuffle_rank,
  (cum - n_chars) // {SHUFFLE_SHARD_BUDGET} AS shard_id
FROM ordered
""".strip()

QUERIES["global_shuffle_export"] = q_global_shuffle_export
ORACLE_SQL["global_shuffle_export"] = SQL_GLOBAL_SHUFFLE


# --------------------------------------------------------------------------
# PMI collocations over the top tokens (corpus statistics / feature
# engineering: which frequent tokens co-occur in documents more than
# chance predicts)

PMI_TOP_M = 30
PMI_MIN_COUNT = 5


def q_pmi_collocations(sf_dir: str):
    """Collocation strength of top-token pairs: the PMI ratio ("lift")
    ``c_ab·N / (c_a·c_b)`` over DOCUMENT frequencies (distinct per
    doc), restricted to the ``PMI_TOP_M`` most frequent tokens and
    pairs co-occurring in ≥ ``PMI_MIN_COUNT`` docs. The raw counts ride
    along, so ``pmi = ln(lift)`` is one call away — the ln itself stays
    OUT of the hash-compared output per the engine's float-parity
    policy (numpy's SIMD log and DuckDB's libm ln disagree by 1 ulp on
    ~60% of inputs; measured, see tfidf_scores for the same policy).

    Scale shape: exact document frequency by the established two-level
    pattern (per-batch distinct (doc, token) partials → token-hash
    grouped sum → per-partition top-M partials → M×partitions driver
    merge); then ONE streaming pass where each batch builds its n×M
    presence matrix and emits the M×M co-occurrence matmul ``BᵀB`` —
    bounded partials (≤ M² ints/block), never a token-pair shuffle.
    Float parity is engineered: all counts stay integer, each side
    computes ``(f8(c_ab)·f8(N)) / (f8(c_a)·f8(c_b))`` in the same
    expression shape — double products, one IEEE division, no
    transcendentals, no int products that could overflow at corpus
    scale."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..functions.tokenize import ws_tokens
    from ..stages.groupagg import hash_grouped_aggregate

    docs = _docs(sf_dir)
    n_docs = docs.count()  # metadata count on an untransformed read

    def _df_partial(tbl: pa.Table) -> pa.Table:
        row, toks = ws_tokens(tbl.column("text"))
        empty = pa.table(
            {"tok": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
        if len(row) == 0:
            return empty
        t = toks.to_pandas().to_numpy()
        o = np.lexsort((t, row))
        row, t = row[o], t[o]
        first = np.r_[True, (row[1:] != row[:-1]) | (t[1:] != t[:-1])]
        t = t[first]
        ts = np.sort(t)
        new = np.r_[True, ts[1:] != ts[:-1]]
        return pa.table(
            {
                "tok": pa.array(ts[new], pa.string()),
                "n": pa.array(
                    np.diff(np.r_[np.flatnonzero(new), len(ts)]).astype(
                        np.int64
                    )
                ),
            }
        )

    counts = hash_grouped_aggregate(
        docs.map_batches(
            _df_partial, batch_format="pyarrow", batch_size=None
        ),
        ["tok"],
        [("n", "sum")],
        num_buckets=16,
    )

    def _topm(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n").cast(pa.int64()).to_numpy()
        tok = tbl.column("tok").to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, -n))[:PMI_TOP_M]
        return pa.table(
            {"tok": pa.array(tok[order], pa.string()),
             "n": pa.array(n[order])}
        )

    partials = [
        t
        for t in ray.get(
            counts.map_batches(
                _topm, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    out_schema = pa.schema(
        [
            ("tok_a", pa.string()),
            ("tok_b", pa.string()),
            ("c_ab", pa.int64()),
            ("ca", pa.int64()),
            ("cb", pa.int64()),
            ("lift", pa.float64()),
        ]
    )
    if not partials:
        return out_schema.empty_table()
    top = _topm(pa.concat_tables(partials))
    # canonical lexicographic index: i < j  <=>  tok_i < tok_j
    toks = top.column("tok").to_numpy(zero_copy_only=False)
    dfs = top.column("n").to_numpy()
    o = np.argsort(toks)
    toks, dfs = toks[o], dfs[o]
    m = len(toks)
    top_ref = ray.put(toks)

    def _pairs(tbl: pa.Table) -> pa.Table:
        ts = ray.get(top_ref)
        row, tk = ws_tokens(tbl.column("text"))
        cm = np.zeros((m, m), np.int64)
        if len(row):
            t = tk.to_pandas().to_numpy()
            pos = np.searchsorted(ts, t)
            np.clip(pos, 0, m - 1, out=pos)
            valid = ts[pos] == t
            b = np.zeros((tbl.num_rows, m), np.int64)
            b[row[valid], pos[valid]] = 1
            cm = b.T @ b
        return pa.table({"cm": pa.array([cm.ravel()])})

    cm = np.zeros(m * m, np.int64)
    for t in ray.get(
        docs.map_batches(
            _pairs, batch_format="pyarrow", batch_size=None
        ).to_arrow_refs()
    ):
        if t.num_rows:
            for v in t.column("cm").to_pylist():
                cm += np.asarray(v, np.int64)
    cm = cm.reshape(m, m)
    iu, ju = np.triu_indices(m, 1)
    c_ab = cm[iu, ju]
    keep = c_ab >= PMI_MIN_COUNT
    iu, ju, c_ab = iu[keep], ju[keep], c_ab[keep]
    lift = (
        c_ab.astype(np.float64) * np.float64(n_docs)
    ) / (dfs[iu].astype(np.float64) * dfs[ju].astype(np.float64))
    return pa.table(
        {
            "tok_a": pa.array(toks[iu], pa.string()),
            "tok_b": pa.array(toks[ju], pa.string()),
            "c_ab": pa.array(c_ab),
            "ca": pa.array(dfs[iu].astype(np.int64)),
            "cb": pa.array(dfs[ju].astype(np.int64)),
            "lift": pa.array(lift),
        }
    )


SQL_PMI = f"""
WITH tok AS (
  SELECT doc_id,
    unnest(list_distinct(list_filter(
      string_split_regex(text, '\\s+'), x -> x <> ''))) AS t
  FROM documents
), df AS (
  SELECT t, count(*) AS c FROM tok GROUP BY t
), top AS (
  SELECT t, c FROM df ORDER BY c DESC, t LIMIT {PMI_TOP_M}
), tt AS (
  SELECT tok.doc_id, tok.t, top.c FROM tok JOIN top USING (t)
), pairs AS (
  SELECT a.t AS tok_a, b.t AS tok_b,
    max(a.c) AS ca, max(b.c) AS cb, count(*) AS c_ab
  FROM tt a JOIN tt b ON a.doc_id = b.doc_id AND a.t < b.t
  GROUP BY a.t, b.t
  HAVING count(*) >= {PMI_MIN_COUNT}
)
SELECT tok_a, tok_b, CAST(c_ab AS BIGINT) AS c_ab,
  CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
  (CAST(c_ab AS DOUBLE)
   * CAST((SELECT count(*) FROM documents) AS DOUBLE))
  / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)) AS lift
FROM pairs
""".strip()

QUERIES["pmi_collocations"] = q_pmi_collocations
ORACLE_SQL["pmi_collocations"] = SQL_PMI


# --------------------------------------------------------------------------
# deterministic train/val/test split (round-4): hash-bucket split with
# per-(lang, split) counts — retrain-stable (no RNG state), and since
# splitmix64 is reproduced in SQL the split itself is oracle-verified.


def q_dataset_split_counts(sf_dir: str):
    """90/5/5 train/val/test split by ``splitmix64(doc_id) % 100``
    (<90 train, <95 val, else test) — membership is a pure function of
    the id, so a regenerated corpus or a resumed job assigns every doc
    identically, and eval rows can never leak into train across runs.
    One stateless streaming pass with per-batch grouped partials; the
    final groupby is (langs × 3) rows."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import rehash64
    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import group_aggregate_table, hash_grouped_aggregate

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )

    def _partial(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").cast(pa.int64()).to_numpy()
        b = rehash64(ids.astype(np.uint64), seed=0) % np.uint64(100)
        split = np.where(b < 90, "train", np.where(b < 95, "val", "test"))
        t = pa.table(
            {
                "lang": tbl.column("lang"),
                "split": pa.array(split, pa.string()),
                "n_docs": pa.array(np.ones(tbl.num_rows, np.int64)),
                "total_chars": tbl.column("n_chars").cast(pa.int64()),
            }
        )
        return group_aggregate_table(
            t, ["lang", "split"], [("n_docs", "sum"), ("total_chars", "sum")]
        )

    agg = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow", batch_size=None),
        ["lang", "split"],
        [("n_docs", "sum"), ("total_chars", "sum")],
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "lang": t.column("lang"),
                "split": t.column("split"),
                "n_docs": t.column("n_docs").cast(pa.int64()),
                "total_chars": t.column("total_chars").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


SQL_SPLIT_COUNTS = f"""
WITH s0 AS (
  SELECT lang, n_chars, CAST(doc_id AS UBIGINT) AS x FROM documents
), s1 AS (SELECT lang, n_chars, xor(x, x >> 30) AS x FROM s0
), s2 AS (SELECT lang, n_chars, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM s1
), s3 AS (SELECT lang, n_chars, xor(x, x >> 27) AS x FROM s2
), s4 AS (SELECT lang, n_chars, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM s3
), s5 AS (SELECT lang, n_chars, xor(x, x >> 31) AS x FROM s4
), sp AS (
  SELECT lang, n_chars,
    CASE WHEN x % 100 < 90 THEN 'train'
         WHEN x % 100 < 95 THEN 'val'
         ELSE 'test' END AS split
  FROM s5
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM sp GROUP BY lang, split
""".strip()

QUERIES["dataset_split_counts"] = q_dataset_split_counts
ORACLE_SQL["dataset_split_counts"] = SQL_SPLIT_COUNTS


# --------------------------------------------------------------------------
# phrase search: positional adjacency over whitespace tokens

PHRASE_TERMS = ("big", "order", "scan")


def q_phrase_search(sf_dir: str):
    """Exact phrase search — find every document containing the query
    terms at consecutive token positions, with the occurrence count
    and first match position (the positional-index probe of a lexical
    search stack, next to token_postings' doc-level index).

    Scale shape: phrase matching only needs tokens of ONE document,
    and the raw layout already co-locates them — so this is a pure
    streaming per-batch map, no shuffle at all. Vectorized anchor
    intersection: each occurrence of term i at position p becomes
    anchor p−i (packed row<<32|pos); a document matches where one
    anchor survives all k intersections (np.intersect1d chain — sorted
    C merges, no Python per-token loop)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    from ..stages.text import phrase_match_table

    def _match(tbl: pa.Table) -> pa.Table:
        return phrase_match_table(tbl, PHRASE_TERMS)

    return docs.map_batches(_match, batch_format="pyarrow",
                            batch_size=None)


QUERIES["phrase_search"] = q_phrase_search


def _phrase_sql() -> str:
    sets = "\nINTERSECT\n".join(
        "SELECT doc_id, p - {i} AS anchor FROM pos WHERE tok = '{t}'".format(
            i=i, t=t
        )
        for i, t in enumerate(PHRASE_TERMS)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents
), pos AS (
  SELECT doc_id, unnest(range(1, len(tk) + 1)) AS p, unnest(tk) AS tok
  FROM toks
), anchors AS (
{sets}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(count(*) AS BIGINT) AS n_matches,
  CAST(min(anchor) AS BIGINT) AS first_pos
FROM anchors GROUP BY doc_id
""".strip()


ORACLE_SQL["phrase_search"] = _phrase_sql()


# --------------------------------------------------------------------------
# reciprocal-rank fusion of the two lexical rankers

RRF_K = 60


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (Cormack et al. 2009) of the tfidf and
    BM25 rankings — the standard way a retrieval stack combines
    heterogeneous scorers without calibrating their score scales:
    rrf = Σ 1/(K + rank_i) over the fused systems.

    Scale shape: each ranker is the existing streaming scorer, each
    global rank is the sample-partitioned distributed sort
    (stages/sort.py — the one wide op, O(n log n) total, never a
    driver gather), and the fuse is the hash equi-join on doc_id.
    Ranks are integers (deterministic: score DESC, doc_id ASC with
    hash-exact scores), so the fused float is two single divisions in
    fixed order — identical IEEE shape to the SQL."""
    import pyarrow as pa

    from ..stages.join import hash_equi_join
    from ..stages.sort import sort_by

    def _ranked(ds, rank_col: str):
        ds = ds.map_batches(
            lambda t: t.select(["doc_id", "score"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        ranked = sort_by(
            ds,
            [("score", "descending"), ("doc_id", "ascending")],
            num_partitions=8,
            rank_col=rank_col,
        )
        return ranked.map_batches(
            lambda t: t.select(["doc_id", rank_col]),
            batch_format="pyarrow",
            batch_size=None,
        )

    ra = _ranked(q_tfidf_scores(sf_dir), "r_lex")
    rb = _ranked(q_bm25_scores(sf_dir), "r_bm")
    joined = hash_equi_join(
        ra, rb, "doc_id", "doc_id", right_columns=["r_bm"],
        num_partitions=8,
    )

    def _fuse(tbl: pa.Table) -> pa.Table:
        import numpy as np

        rl = tbl.column("r_lex").to_numpy().astype(np.float64)
        rb_ = tbl.column("r_bm").to_numpy().astype(np.float64)
        rrf = 1.0 / (60.0 + rl) + 1.0 / (60.0 + rb_)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "r_lex": tbl.column("r_lex"),
                "r_bm": tbl.column("r_bm"),
                "rrf_score": pa.array(rrf),
            }
        )

    return joined.map_batches(_fuse, batch_format="pyarrow",
                              batch_size=None)


QUERIES["rrf_fusion"] = q_rrf_fusion
ORACLE_SQL["rrf_fusion"] = f"""
WITH a AS (SELECT doc_id, score FROM ({_tfidf_sql()}) t),
b AS (SELECT doc_id, score FROM ({_bm25_sql()}) t),
ra AS (SELECT doc_id, CAST(row_number() OVER (
         ORDER BY score DESC, doc_id) AS BIGINT) AS r_lex FROM a),
rb AS (SELECT doc_id, CAST(row_number() OVER (
         ORDER BY score DESC, doc_id) AS BIGINT) AS r_bm FROM b)
SELECT CAST(ra.doc_id AS BIGINT) AS doc_id, r_lex, r_bm,
  1.0 / (60.0 + CAST(r_lex AS DOUBLE))
    + 1.0 / (60.0 + CAST(r_bm AS DOUBLE)) AS rrf_score
FROM ra JOIN rb ON ra.doc_id = rb.doc_id
""".strip()


# --------------------------------------------------------------------------
# bigram novelty: the n-gram-LM-flavored fluency/novelty signal

def q_bigram_novelty(sf_dir: str):
    """Per-document rare-bigram ratio — the n-gram language-model
    style fluency signal (documents full of corpus-rare bigrams are
    OCR noise, boilerplate mashups, or genuinely novel text; both ends
    matter to a curation pipeline). A bigram is RARE when its corpus
    count is under a quarter of the mean bigram count — the threshold
    is an exact integer cross-multiplication
    (cn · n_distinct · 4 ≤ total), scale-free so the gate stays
    non-vacuous at every tier.

    Scale shape: (1) per-batch (bigram, count) partials → hash-grouped
    corpus counts (the distinct-bigram table stays distributed);
    (2) two integer scalars (distinct, total) from tiny per-batch
    partials — the only driver state; (3) per-doc bigram pairs join
    the count table on the hash exchange (never broadcast — the rare
    SET can be corpus-proportional, the drop-set lesson); (4) per-doc
    integer aggregate + ONE final IEEE division."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import hash_grouped_aggregate
    from ..stages.join import hash_equi_join

    def _docs_ds():
        return read_parquet_tuned(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )

    def _bigram_pairs(tbl: pa.Table) -> pa.Table:
        # bigrams ride every exchange as 64-bit hashed keys, never as
        # strings (the output carries no bigram text): tokens are
        # hashed ONCE per batch-distinct token, pairs mix with a
        # splitmix finalizer, and per-(key, doc) counts are a lexsort
        # run-length — no pandas string groupby, ~3x narrower shuffle.
        # 64-bit-key equality is the engine's exact-dedup convention
        # (stages/dedup.py dedup_exact); a collision merging two
        # distinct bigrams is ~n^2/2^65.
        from ..functions.hashing import _MIX, hash64, rehash64

        s = tbl.column("text").to_pandas().fillna("").reset_index(
            drop=True
        )
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        ex = s.str.split().explode().dropna()
        empty = pa.table(
            {
                "bigram": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        if len(ex) == 0:
            return empty
        row = ex.index.to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(ex.to_numpy(), sort=False)
        h = hash64(uniq)[codes]
        same = row[1:] == row[:-1]
        if not same.any():
            return empty
        bkey = rehash64(h[:-1][same] * _MIX + h[1:][same], 0xB1)
        doc = ids[row[:-1][same]].astype(np.int64)
        order = np.lexsort((bkey, doc))
        bkey, doc = bkey[order], doc[order]
        new = np.ones(len(bkey), dtype=bool)
        new[1:] = (bkey[1:] != bkey[:-1]) | (doc[1:] != doc[:-1])
        starts = np.flatnonzero(new)
        c = np.diff(np.r_[starts, len(bkey)])
        return pa.table(
            {
                "bigram": pa.array(
                    bkey[starts].view(np.int64)
                ),
                "doc_id": pa.array(doc[starts]),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    pairs = _docs_ds().map_batches(
        _bigram_pairs, batch_format="pyarrow", batch_size=None
    )

    # ONE bigram exchange does everything key-side: every occurrence of
    # a bigram is co-located, so the kernel computes its corpus count
    # locally (run-length over one lexsort) and attaches it to each
    # (doc, c) row — no separate count table, no join, and the
    # extraction map runs ONCE. Each partition also emits one sentinel
    # row (doc_id = -1) carrying its (n_distinct, total) contribution;
    # the materialized output is scanned once for the two global
    # scalars (O(blocks) driver rows) before the per-doc reduce.
    import ray as _ray

    from ..stages.exchange import hash_exchange

    nb = max(8, int(_ray.cluster_resources().get("CPU", 8)))
    ann_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("c", pa.int64()),
            ("cn", pa.int64()),
        ]
    )

    def _attach_cn(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return ann_schema.empty_table()
        bkey = tbl.column("bigram").to_numpy()
        doc = tbl.column("doc_id").to_numpy()
        c = tbl.column("c").to_numpy()
        order = np.argsort(bkey, kind="stable")
        bkey, doc, c = bkey[order], doc[order], c[order]
        new = np.ones(len(bkey), dtype=bool)
        new[1:] = bkey[1:] != bkey[:-1]
        run_id = np.cumsum(new) - 1
        cn_run = np.bincount(run_id, weights=c.astype(np.float64))
        cn = cn_run.astype(np.int64)[run_id]
        out = pa.table(
            {
                "doc_id": pa.array(doc.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
                "cn": pa.array(cn),
            }
        )
        sentinel = pa.table(
            {
                "doc_id": pa.array([-1], pa.int64()),
                "c": pa.array([int(new.sum())], pa.int64()),
                "cn": pa.array([int(c.sum())], pa.int64()),
            }
        )
        return pa.concat_tables([out, sentinel])

    annotated = hash_exchange(
        pairs, ["bigram"], nb, _attach_cn, ann_schema
    ).materialize()

    def _scal(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sent = tbl.filter(pc.equal(tbl.column("doc_id"), -1))
        return pa.table(
            {
                "d": pa.array(
                    [int(sent.column("c").to_numpy().sum())], pa.int64()
                ),
                "t": pa.array(
                    [int(sent.column("cn").to_numpy().sum())], pa.int64()
                ),
            }
        )

    sparts = [
        t
        for t in ray.get(
            annotated.map_batches(
                _scal, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    n_distinct = sum(int(t.column("d")[i].as_py())
                     for t in sparts for i in range(t.num_rows))
    total = sum(int(t.column("t")[i].as_py())
                for t in sparts for i in range(t.num_rows))

    def _doc_partial(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = tbl.filter(pc.not_equal(tbl.column("doc_id"), -1))
        c = keep.column("c").to_numpy()
        cn = keep.column("cn").to_numpy()
        rare = (cn * n_distinct * 4 <= total).astype(np.int64)
        return pa.table(
            {
                "doc_id": keep.column("doc_id"),
                "n_bigrams": pa.array(c.astype(np.int64)),
                "n_rare": pa.array(c * rare),
            }
        )

    per_doc = hash_grouped_aggregate(
        annotated.map_batches(
            _doc_partial, batch_format="pyarrow", batch_size=None
        ),
        ["doc_id"],
        [("n_bigrams", "sum"), ("n_rare", "sum")],
        num_buckets=nb,
    )

    def _score(tbl: pa.Table) -> pa.Table:
        import numpy as np

        nb = tbl.column("n_bigrams").to_numpy().astype(np.float64)
        nr = tbl.column("n_rare").to_numpy().astype(np.float64)
        return tbl.append_column("novelty", pa.array(nr / nb))

    return per_doc.map_batches(_score, batch_format="pyarrow",
                               batch_size=None)


QUERIES["bigram_novelty"] = q_bigram_novelty
ORACLE_SQL["bigram_novelty"] = r"""
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents
), pos AS (
  SELECT doc_id, unnest(range(1, len(tk) + 1)) AS p, unnest(tk) AS tok
  FROM toks
), bg AS (
  SELECT doc_id, tok || ' ' || lead(tok) OVER (
    PARTITION BY doc_id ORDER BY p) AS bigram
  FROM pos
  QUALIFY bigram IS NOT NULL
), cnt AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS cn FROM bg GROUP BY bigram
), scal AS (
  SELECT CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(cn) AS BIGINT) AS total
  FROM cnt
), per AS (
  SELECT doc_id,
    CAST(count(*) AS BIGINT) AS n_bigrams,
    CAST(sum(CASE WHEN cn * (SELECT n_distinct FROM scal) * 4
                       <= (SELECT total FROM scal)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
  FROM bg JOIN cnt USING (bigram)
  GROUP BY doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_bigrams, n_rare,
  CAST(n_rare AS DOUBLE) / n_bigrams AS novelty
FROM per
""".strip()


# --------------------------------------------------------------------------
# count-min sketch point estimates for the fixed query-term set

def q_cms_token_counts(sf_dir: str):
    """Count-min-sketch token counts for the TFIDF query terms — the
    bounded-memory counter a streaming ingest keeps when the exact
    token table would not fit (depth 4 × width 65536 int64s per
    partial, merged by ADD). With this corpus and width the fixed
    hashes land collision-free, so the oracle is the EXACT SQL count —
    a deterministic exact-regime gate (same convention as the
    exact-regime HLL/KLL gates); the ≥-truth guarantee and adversarial
    narrow-width behavior are property-tested in pytest."""
    from ..sources.parquet import read_parquet_tuned
    from ..stages.sketches import cms_token_counts_ds

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    return cms_token_counts_ds(docs, TFIDF_TERMS)


QUERIES["cms_token_counts"] = q_cms_token_counts
ORACLE_SQL["cms_token_counts"] = rf"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
)
SELECT tok AS term, CAST(count(*) AS BIGINT) AS est
FROM toks WHERE tok IN ({', '.join("'" + t + "'" for t in TFIDF_TERMS)})
GROUP BY tok
""".strip()


# --------------------------------------------------------------------------
# bigram language-model log-probability scoring (perplexity signal)

def q_bigram_lm_score(sf_dir: str):
    """Per-document average bigram log-probability under a
    Laplace-smoothed corpus bigram LM — the perplexity-style fluency
    score (Σ c·ln((c(w1,w2)+1)/(c(w1)+V)) / n_bigrams): the
    n-gram-LM quality filter classic curation stacks run (CCNet's
    KenLM stage, linear core) with the LM trained on the corpus
    itself.

    Scale shape: ONE exchange keyed on hash(w1) co-locates every
    occurrence of a first-token — the kernel computes c(w1) and every
    c(w1, w2) locally and annotates per-doc pair rows in place (the
    bigram_novelty shape); V rides sentinel rows; the per-doc reduce
    sums contributions in sorted (h1, h2) order so the float is
    deterministic across runs, partitions, and parallelism. Rows-only
    gate (ln: numpy SIMD log vs DuckDB libm differ by 1 ulp — the PMI
    lesson); the pytest oracle recomputes the identical formula in the
    identical order and matches bit-for-bit."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from ..functions.hashing import hash64
    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_exchange, hash_grouped_map

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    pair_schema = pa.schema(
        [
            ("h1", pa.int64()),   # exchange key: hash(w1); -1 rows are
            ("h2", pa.int64()),   # unigram-count carriers (doc_id -1)
            ("doc_id", pa.int64()),
            ("c", pa.int64()),
        ]
    )

    def _extract(tbl: pa.Table) -> pa.Table:
        s = tbl.column("text").to_pandas().fillna("").reset_index(
            drop=True
        )
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        ex = s.str.split().explode().dropna()
        if len(ex) == 0:
            return pair_schema.empty_table()
        row = ex.index.to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(ex.to_numpy(), sort=False)
        uh = hash64(uniq).view(np.int64)
        h = uh[codes]
        # unigram carriers: per-batch (h(tok), count), doc_id = -1
        utok, ucnt = np.unique(h, return_counts=True)
        uni = pa.table(
            {
                "h1": pa.array(utok),
                "h2": pa.array(np.zeros(len(utok), np.int64)),
                "doc_id": pa.array(np.full(len(utok), -1, np.int64)),
                "c": pa.array(ucnt.astype(np.int64)),
            }
        )
        same = row[1:] == row[:-1]
        if not same.any():
            return uni
        h1, h2 = h[:-1][same], h[1:][same]
        doc = ids[row[:-1][same]].astype(np.int64)
        df = (
            pd.DataFrame({"h1": h1, "h2": h2, "doc_id": doc})
            .groupby(["h1", "h2", "doc_id"], sort=False)
            .size()
            .reset_index(name="c")
        )
        bi = pa.table(
            {
                "h1": pa.array(df["h1"].to_numpy()),
                "h2": pa.array(df["h2"].to_numpy()),
                "doc_id": pa.array(df["doc_id"].to_numpy()),
                "c": pa.array(df["c"].to_numpy().astype(np.int64)),
            }
        )
        return pa.concat_tables([uni, bi])

    pairs = docs.map_batches(_extract, batch_format="pyarrow",
                             batch_size=None)

    nb = max(8, int(ray.cluster_resources().get("CPU", 8)))
    ann_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("h1", pa.int64()),
            ("h2", pa.int64()),
            ("c", pa.int64()),
            ("cn_pair", pa.int64()),
            ("c_w1", pa.int64()),
        ]
    )

    def _annotate(_p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return ann_schema.empty_table()
        doc = tbl.column("doc_id").to_numpy()
        h1 = tbl.column("h1").to_numpy()
        h2 = tbl.column("h2").to_numpy()
        c = tbl.column("c").to_numpy()
        is_uni = doc == -1
        # c(w1): total unigram count per first-token in this partition
        uk, inv = np.unique(h1, return_inverse=True)
        cw1 = np.bincount(inv[is_uni], weights=c[is_uni].astype(
            np.float64), minlength=len(uk)).astype(np.int64)
        # c(w1,w2): corpus bigram count (all occurrences co-located)
        bi = ~is_uni
        if not bi.any():
            # still emit one sentinel carrying this partition's
            # distinct-unigram contribution to V
            return pa.table(
                {
                    "doc_id": pa.array([-1], pa.int64()),
                    "h1": pa.array([0], pa.int64()),
                    "h2": pa.array([0], pa.int64()),
                    "c": pa.array([int(is_uni.sum())], pa.int64()),
                    "cn_pair": pa.array([0], pa.int64()),
                    "c_w1": pa.array([0], pa.int64()),
                }
            )
        key = np.stack([h1[bi], h2[bi]], axis=1)
        order = np.lexsort((key[:, 1], key[:, 0]))
        kb = key[order]
        cb = c[bi][order]
        new = np.ones(len(kb), dtype=bool)
        new[1:] = (kb[1:] != kb[:-1]).any(axis=1)
        run = np.cumsum(new) - 1
        cn_run = np.bincount(run, weights=cb.astype(np.float64)).astype(
            np.int64
        )
        cn = cn_run[run]
        out = pa.table(
            {
                "doc_id": pa.array(doc[bi][order]),
                "h1": pa.array(kb[:, 0]),
                "h2": pa.array(kb[:, 1]),
                "c": pa.array(cb),
                "cn_pair": pa.array(cn),
                "c_w1": pa.array(cw1[inv[bi][order]]),
            }
        )
        sentinel = pa.table(
            {
                "doc_id": pa.array([-1], pa.int64()),
                "h1": pa.array([0], pa.int64()),
                "h2": pa.array([0], pa.int64()),
                "c": pa.array([int(np.unique(h1[is_uni]).size)],
                              pa.int64()),
                "cn_pair": pa.array([0], pa.int64()),
                "c_w1": pa.array([0], pa.int64()),
            }
        )
        return pa.concat_tables([out, sentinel])

    annotated = hash_exchange(
        pairs, ["h1"], nb, _annotate, ann_schema
    ).materialize()

    # V: distinct unigrams (sentinel rows, disjoint across partitions)
    vparts = [
        t
        for t in ray.get(
            annotated.map_batches(
                lambda t: pa.table(
                    {
                        "v": pa.array(
                            [
                                int(
                                    t.filter(
                                        pa.compute.equal(
                                            t.column("doc_id"), -1
                                        )
                                    ).column("c").to_numpy().sum()
                                )
                            ],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
                batch_size=None,
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    V = sum(int(t.column("v")[i].as_py())
            for t in vparts for i in range(t.num_rows))

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_bigrams", pa.int64()),
            ("avg_logprob", pa.float64()),
        ]
    )

    def _score(g: pa.Table) -> pa.Table:
        doc = g.column("doc_id").to_numpy()
        if len(doc) and doc[0] == -1:
            return out_schema.empty_table()
        h1 = g.column("h1").to_numpy()
        h2 = g.column("h2").to_numpy()
        c = g.column("c").to_numpy().astype(np.float64)
        cn = g.column("cn_pair").to_numpy().astype(np.float64)
        cw = g.column("c_w1").to_numpy().astype(np.float64)
        order = np.lexsort((h2, h1))  # deterministic summation order
        c, cn, cw = c[order], cn[order], cw[order]
        contrib = c * np.log((cn + 1.0) / (cw + float(V)))
        n = c.sum()
        s = np.add.reduce(contrib)  # fixed order after the lexsort
        return pa.table(
            {
                "doc_id": pa.array([int(doc[0])], pa.int64()),
                "n_bigrams": pa.array([int(n)], pa.int64()),
                "avg_logprob": pa.array([s / n], pa.float64()),
            }
        )

    return hash_grouped_map(
        annotated, "doc_id", _score, num_partitions=nb,
        empty_schema=out_schema,
    )


QUERIES["bigram_lm_score"] = q_bigram_lm_score


def q_vocab_overlap(sf_dir: str):
    """Pairwise source-vocabulary overlap: for every pair of sources,
    the number of shared distinct tokens, each side's vocabulary size,
    and the Jaccard similarity (one final IEEE division of exact
    integer counts — bit-identical to the SQL expression). Corpus
    drift / contamination analysis between ingestion feeds.

    Shape: per-batch distinct (source, token) partials → one
    (source, token) hash agg → a TOKEN-keyed grouped map emits source
    pairs per shared token (min_group_size=2 skips unshared vocab
    before Python dispatch) → per-pair count agg. Vocabulary sizes
    ride the same distinct-pair table; only the tiny per-source and
    per-pair count tables reach the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions.tokenize import ws_tokens
    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_grouped_map
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "text"],
    )

    def _pairs(tbl: pa.Table) -> pa.Table:
        row, flat = ws_tokens(tbl.column("text"))
        src = tbl.column("source").to_pandas().to_numpy()
        t = pa.table(
            {
                "source": pa.array(src[row].astype(object),
                                   pa.string()),
                "tok": flat,
                "n": pa.array(np.ones(len(row), np.int64)),
            }
        )
        return group_aggregate_table(t, ["source", "tok"], [("n", "sum")])

    st = hash_grouped_aggregate(
        docs.map_batches(_pairs, batch_format="pyarrow",
                         batch_size=None),
        ["source", "tok"],
        [("n", "sum")],
        num_buckets=16,
    )

    # vocabulary sizes (tiny: one row per source)
    def _size_partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": tbl.column("source"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["source"], [("n", "sum")])

    sizes = hash_grouped_aggregate(
        st.map_batches(_size_partial, batch_format="pyarrow",
                       batch_size=None),
        ["source"],
        [("n", "sum")],
        num_buckets=4,
    ).to_pandas().set_index("source")["n"]

    pair_schema = pa.schema(
        [("source_a", pa.string()), ("source_b", pa.string()),
         ("n", pa.int64())]
    )

    def _tok_pairs(group: pa.Table) -> pa.Table:
        s = np.sort(
            group.column("source").to_pandas().to_numpy().astype(str)
        )
        ia, ib = np.triu_indices(len(s), k=1)
        return pa.table(
            {
                "source_a": pa.array(s[ia].astype(object), pa.string()),
                "source_b": pa.array(s[ib].astype(object), pa.string()),
                "n": pa.array(np.ones(len(ia), np.int64)),
            }
        )

    common = hash_grouped_aggregate(
        hash_grouped_map(
            st,
            "tok",
            _tok_pairs,
            num_partitions=16,
            empty_schema=pair_schema,
            min_group_size=2,
        ),
        ["source_a", "source_b"],
        [("n", "sum")],
        num_buckets=4,
    ).to_pandas()

    na = sizes.loc[common["source_a"]].to_numpy()
    nb = sizes.loc[common["source_b"]].to_numpy()
    c = common["n"].to_numpy()
    out = pd.DataFrame(
        {
            "source_a": common["source_a"],
            "source_b": common["source_b"],
            "n_common": c.astype("int64"),
            "n_a": na.astype("int64"),
            "n_b": nb.astype("int64"),
            "jaccard": c.astype("float64") / (na + nb - c),
        }
    )
    return out.sort_values(["source_a", "source_b"]).reset_index(
        drop=True
    )


QUERIES["vocab_overlap"] = q_vocab_overlap
ORACLE_SQL["vocab_overlap"] = """
WITH st AS (
  SELECT DISTINCT source,
    unnest(list_filter(string_split_regex(text, '\\s+'),
                       x -> x <> '')) AS tok
  FROM documents
), sizes AS (
  SELECT source, count(*) AS n FROM st GROUP BY 1
), common AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS c
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, CAST(c AS BIGINT) AS n_common,
  CAST(x.n AS BIGINT) AS n_a, CAST(y.n AS BIGINT) AS n_b,
  CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
FROM common
JOIN sizes x ON x.source = common.source_a
JOIN sizes y ON y.source = common.source_b
""".strip()


# --- vocabulary pruning / <unk> replacement -------------------------------

_UNK_T = 8  # tokens with corpus frequency < T become <unk>


def q_unk_replacement(sf_dir: str):
    """Frequency-based vocabulary pruning: every token with corpus
    frequency < {t} rewritten to ``<unk>``, with per-doc OOV
    accounting — the closed-vocab preprocessing step of classic LM
    training. Augmented (both sides) with a per-doc unique token
    (always OOV at any tier) and a doc_id%23 class token (always kept)
    so both paths are exercised at every sf.

    Scale shape: the corpus frequency table is a token hash agg; the
    KEPT vocabulary (freq >= T) is the broadcast side — bounded by
    total_tokens/T regardless of corpus size (Zipf makes it far
    smaller), while the unbounded rare tail never leaves its
    partitions. Rewrite is one sorted-array membership test + Arrow
    binary_join per batch.""".format(t=_UNK_T)
    import numpy as np
    import pyarrow as pa
    import ray

    from ..functions.tokenize import ws_tokens
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    def _aug(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        s = tbl.column("text").to_pandas().fillna("").to_numpy()
        t = np.char.add(
            np.char.add(s.astype(str), " r"),
            ids.astype(str),
        )
        t = np.char.add(np.char.add(t, " c"), (ids % 23).astype(str))
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(t.astype(object), pa.string()),
            }
        )

    docs = _docs(sf_dir).map_batches(_aug, batch_format="pyarrow")

    def _freq(tbl: pa.Table) -> pa.Table:
        _row, flat = ws_tokens(tbl.column("text"))
        t = pa.table(
            {
                "tok": flat,
                "n": pa.array(np.ones(len(flat), np.int64)),
            }
        )
        return group_aggregate_table(t, ["tok"], [("n", "sum")])

    freq = hash_grouped_aggregate(
        docs.map_batches(_freq, batch_format="pyarrow",
                         batch_size=None),
        ["tok"],
        [("n", "sum")],
        num_buckets=8,
    )

    def _kept(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return tbl.filter(
            pc.greater_equal(tbl.column("n"), _UNK_T)
        ).select(["tok"])

    vocab = np.sort(
        freq.map_batches(_kept, batch_format="pyarrow",
                         batch_size=None)
        .to_pandas()["tok"].to_numpy().astype(str)
    )
    vocab_ref = ray.put(vocab)

    def _rewrite(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = ray.get(vocab_ref)
        row, flat = ws_tokens(tbl.column("text"))
        n_docs = tbl.num_rows
        toks = flat.to_numpy(zero_copy_only=False).astype(str)
        pos = np.searchsorted(v, toks)
        ok = (pos < len(v)) & (
            v[np.minimum(pos, max(len(v) - 1, 0))] == toks
        ) if len(v) else np.zeros(len(toks), bool)
        out_toks = np.where(ok, toks, "<unk>")
        n_tok = np.bincount(row, minlength=n_docs).astype(np.int64)
        n_oov = np.bincount(
            row[~ok], minlength=n_docs
        ).astype(np.int64) if len(row) else np.zeros(n_docs, np.int64)
        offsets = np.concatenate(([0], np.cumsum(n_tok)))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            pa.array(out_toks.astype(object), pa.large_string()),
        )
        text_unk = pc.binary_join(
            lists, pa.scalar(" ", pa.large_string())
        ).cast(pa.string())
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "text_unk": text_unk,
                "n_oov": pa.array(n_oov),
                "n_tokens": pa.array(n_tok),
            }
        )

    return docs.map_batches(_rewrite, batch_format="pyarrow")


QUERIES["unk_replacement"] = q_unk_replacement
ORACLE_SQL["unk_replacement"] = f"""
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    text || ' r' || doc_id || ' c' || (doc_id % 23) AS t
  FROM documents
), tk AS (
  SELECT doc_id,
    list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS l
  FROM aug
), tok AS (
  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos
  FROM tk
), f AS (
  SELECT w, count(*) AS c FROM tok GROUP BY 1
), rep AS (
  SELECT doc_id, pos,
    CASE WHEN f.c >= {_UNK_T} THEN tok.w ELSE '<unk>' END AS w2,
    CASE WHEN f.c >= {_UNK_T} THEN 0 ELSE 1 END AS oov
  FROM tok JOIN f USING (w)
)
SELECT doc_id, string_agg(w2, ' ' ORDER BY pos) AS text_unk,
  CAST(sum(oov) AS BIGINT) AS n_oov,
  CAST(count(*) AS BIGINT) AS n_tokens
FROM rep GROUP BY doc_id
""".strip()


def q_eval_confusion(sf_dir: str):
    """Model-evaluation at corpus scale: confusion-matrix cells of the
    heuristic language-ID against the labeled ``lang`` column —
    (truth, prediction, count) plus the per-cell share of the truth
    row (exact integers, one IEEE division per bounded cell). The
    LangId kernel (stages/text.py) runs per batch with the truth
    column riding along; only |langs|² count partials shuffle."""
    import numpy as np
    import pyarrow as pa

    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )
    from ..stages.text import LangId

    docs = _docs_with_lang(sf_dir)

    li = LangId()

    def _partial(tbl: pa.Table) -> pa.Table:
        pred = li(tbl)
        t = pa.table(
            {
                "lang_true": tbl.column("lang"),
                "lang_pred": pred.column("lang_pred"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["lang_true", "lang_pred"], [("n", "sum")]
        )

    cells = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["lang_true", "lang_pred"],
        [("n", "sum")],
        num_buckets=4,
    ).to_pandas()
    row_tot = cells.groupby("lang_true")["n"].transform("sum")
    cells = cells.rename(columns={"n": "n_docs"})
    cells["row_share"] = (
        cells["n_docs"].astype("float64") / row_tot.astype("float64")
    )
    return cells.sort_values(
        ["lang_true", "lang_pred"]
    ).reset_index(drop=True)


def _docs_with_lang(sf_dir: str):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )


def _confusion_sql() -> str:
    base = _lang_id_sql()
    return f"""
WITH pred AS (
{base}
), cells AS (
  SELECT d.lang AS lang_true, p.lang_pred,
    CAST(count(*) AS BIGINT) AS n_docs
  FROM documents d JOIN pred p USING (doc_id)
  GROUP BY 1, 2
)
SELECT lang_true, lang_pred, n_docs,
  CAST(n_docs AS DOUBLE)
    / sum(n_docs) OVER (PARTITION BY lang_true) AS row_share
FROM cells
""".strip()


QUERIES["eval_confusion"] = q_eval_confusion
ORACLE_SQL["eval_confusion"] = _confusion_sql()


# --- overlapping token-window chunking (RAG / retrieval prep) -------------

_RC_W = 16   # window tokens
_RC_S = 8    # stride tokens


def q_overlapping_chunks(sf_dir: str):
    """Retrieval-prep chunking: sliding token windows of {w} with
    stride {s} per document (chunk c covers tokens [c*s, c*s+w), the
    tail clipped; n_chunks = ceil(n/s)) — the layout an embedding /
    RAG indexing pipeline consumes. Emitted per chunk: doc_id,
    chunk_idx, chunk text, token count. Fully vectorized ragged
    expansion (repeat + arange intra-offsets + one Arrow take +
    binary_join); output grows by ~w/s x, the inherent overlap
    cost.""".format(w=_RC_W, s=_RC_S)
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.tokenize import ws_tokens

    docs = _docs(sf_dir)

    def _chunks(tbl: pa.Table) -> pa.Table:
        row, flat = ws_tokens(tbl.column("text"))
        ids = tbl.column("doc_id").to_numpy().astype(np.int64)
        n_docs = tbl.num_rows
        total = len(row)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        if total == 0:
            return empty
        n_tok = np.bincount(row, minlength=n_docs).astype(np.int64)
        tok_start = np.concatenate(([0], np.cumsum(n_tok)))[:-1]
        n_chunks = -(-n_tok // _RC_S)  # ceil(n / stride); 0 for empty
        doc_of_chunk = np.repeat(np.arange(n_docs), n_chunks)
        if len(doc_of_chunk) == 0:
            return empty
        cstart_in_doc = (
            np.arange(len(doc_of_chunk))
            - np.repeat(
                np.concatenate(([0], np.cumsum(n_chunks)))[:-1],
                n_chunks,
            )
        )
        starts = cstart_in_doc * _RC_S
        clen = np.minimum(_RC_W, n_tok[doc_of_chunk] - starts)
        offsets = np.concatenate(([0], np.cumsum(clen)))
        tot = int(offsets[-1])
        intra = np.arange(tot, dtype=np.int64) - np.repeat(
            offsets[:-1], clen
        )
        tok_global = (
            np.repeat(tok_start[doc_of_chunk] + starts, clen) + intra
        )
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        gathered = flat.take(pa.array(tok_global))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()),
            gathered.cast(pa.large_string()),
        )
        chunk = pc.binary_join(
            lists, pa.scalar(" ", pa.large_string())
        ).cast(pa.string())
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_of_chunk]),
                "chunk_idx": pa.array(
                    cstart_in_doc.astype(np.int64)
                ),
                "chunk": chunk,
                "n_tokens": pa.array(clen.astype(np.int64)),
            }
        )

    return docs.map_batches(
        _chunks, batch_format="pyarrow", batch_size=None
    )


QUERIES["overlapping_chunks"] = q_overlapping_chunks
ORACLE_SQL["overlapping_chunks"] = f"""
WITH tk AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
  FROM documents
), c AS (
  SELECT doc_id, l,
    unnest(range(0, CAST(ceil(len(l) / {_RC_S}.0) AS INT))) AS ci
  FROM tk
)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
  array_to_string(l[ci * {_RC_S} + 1 : ci * {_RC_S} + {_RC_W}],
                  ' ') AS chunk,
  CAST(least({_RC_W}, len(l) - ci * {_RC_S}) AS BIGINT) AS n_tokens
FROM c
""".strip()


# --- end-to-end retrieval-index build (chunk -> dedup -> embed ->
# IVF assign), integer-exact so ONE nested SQL oracle verifies the
# whole composition

_RI_D = 4      # pseudo-embedding dims
_RI_K = 4      # IVF lists
_RI_MOD = 1001


def q_rag_index_build(sf_dir: str):
    """The retrieval-index build pipeline, end to end and
    hash-verified: sliding-window chunks (q_overlapping_chunks) →
    corpus-distinct chunks with occurrence counts → deterministic
    INTEGER pseudo-embeddings (dim j = splitmix64(code*D+j) mod 1001
    − 500, on the dictionary code = rank of the chunk in sorted
    distinct order — the feature_hashing trick that makes a string
    embedding SQL-reproducible) → nearest-centroid assignment to K
    seed lists (exact integer L2, ties to the smaller list) → per-list
    manifest (distinct chunks, source chunks incl. multiplicity, sum
    of squared norms). At production scale the dictionary step is
    replaced by hashing the chunk text directly (no broadcast) and the
    seed centroids by the trained k-means quantizer (stages/
    clustering.py); the gate pins the full composition shape."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..functions.hashing import rehash64
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    chunks = q_overlapping_chunks(sf_dir)

    def _partial(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "chunk": tbl.column("chunk"),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(t, ["chunk"], [("n", "sum")])

    distinct = hash_grouped_aggregate(
        chunks.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None),
        ["chunk"],
        [("n", "sum")],
        num_buckets=8,
    )

    # dictionary: sorted distinct chunks (gate-scale broadcast; the
    # 100 TB path hashes text directly, no dictionary)
    vocab = np.sort(
        np.concatenate(
            [
                b.column("chunk").to_numpy(zero_copy_only=False)
                for b in distinct.iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            ]
        ).astype(str)
    )
    vocab_ref = ray.put(vocab)

    def _embed_of(codes: np.ndarray) -> np.ndarray:
        e = np.empty((len(codes), _RI_D), np.int64)
        for j in range(_RI_D):
            x = rehash64(
                (codes.astype(np.uint64) * np.uint64(_RI_D)
                 + np.uint64(j)),
                0,
            )
            e[:, j] = (x % np.uint64(_RI_MOD)).astype(np.int64) - (
                _RI_MOD // 2
            )
        return e

    cent = _embed_of(np.arange(_RI_K, dtype=np.int64))

    def _assign(tbl: pa.Table) -> pa.Table:
        v = ray.get(vocab_ref)
        ch = tbl.column("chunk").to_numpy(
            zero_copy_only=False
        ).astype(str)
        codes = np.searchsorted(v, ch).astype(np.int64)
        e = _embed_of(codes)
        # exact integer L2 to each centroid; argmin tie -> smaller id
        d2 = ((e[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        lid = np.argmin(d2, axis=1).astype(np.int64)
        t = pa.table(
            {
                "list_id": pa.array(lid),
                "n_chunks": pa.array(np.ones(len(lid), np.int64)),
                "n_source_chunks": tbl.column("n"),
                "sum_sq_norm": pa.array((e * e).sum(axis=1)),
            }
        )
        return group_aggregate_table(
            t, ["list_id"],
            [("n_chunks", "sum"), ("n_source_chunks", "sum"),
             ("sum_sq_norm", "sum")],
        )

    return hash_grouped_aggregate(
        distinct.map_batches(_assign, batch_format="pyarrow",
                             batch_size=None),
        ["list_id"],
        [("n_chunks", "sum"), ("n_source_chunks", "sum"),
         ("sum_sq_norm", "sum")],
        num_buckets=2,
    )


def _rag_index_sql() -> str:
    from .text_queries import _splitmix_mulmod  # self-import safe

    def chain(src: str) -> str:
        return f"""
h1 AS (SELECT code, j, xor(x, x >> 30) AS x FROM {src}
), h2 AS (SELECT code, j, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM h1
), h3 AS (SELECT code, j, xor(x, x >> 27) AS x FROM h2
), h4 AS (SELECT code, j, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM h3
), h5 AS (SELECT code, j, xor(x, x >> 31) AS x FROM h4
)"""

    base = ORACLE_SQL["overlapping_chunks"]
    return f"""
WITH chunks AS (
{base}
), cnt AS (
  SELECT chunk, CAST(count(*) AS BIGINT) AS n FROM chunks GROUP BY 1
), code AS (
  SELECT chunk, n,
    CAST(row_number() OVER (ORDER BY chunk) - 1 AS BIGINT) AS code
  FROM cnt
), h0 AS (
  SELECT code,
    CAST(j AS BIGINT) AS j,
    CAST(code * {_RI_D} + j AS UBIGINT) AS x
  FROM code, unnest(range(0, {_RI_D})) AS t(j)
), {chain('h0')}, emb AS (
  SELECT code, j,
    CAST(x % {_RI_MOD} AS BIGINT) - {_RI_MOD // 2} AS v
  FROM h5
), cent AS (
  SELECT code AS cid, j, v FROM emb WHERE code < {_RI_K}
), dist AS (
  SELECT e.code, c.cid,
    CAST(sum((e.v - c.v) * (e.v - c.v)) AS BIGINT) AS d2
  FROM emb e JOIN cent c USING (j) GROUP BY 1, 2
), asn AS (
  SELECT code, cid,
    row_number() OVER (PARTITION BY code ORDER BY d2, cid) AS rn
  FROM dist
), nrm AS (
  SELECT code, CAST(sum(v * v) AS BIGINT) AS sq FROM emb GROUP BY 1
)
SELECT asn.cid AS list_id,
  CAST(count(*) AS BIGINT) AS n_chunks,
  CAST(sum(code.n) AS BIGINT) AS n_source_chunks,
  CAST(sum(nrm.sq) AS BIGINT) AS sum_sq_norm
FROM asn
JOIN code USING (code)
JOIN nrm USING (code)
WHERE asn.rn = 1
GROUP BY 1
""".strip()


QUERIES["rag_index_build"] = q_rag_index_build
ORACLE_SQL["rag_index_build"] = _rag_index_sql()


# --- T5-style span corruption (denoising pretraining pairs) ---------------

_T5_MOD = 5  # ~20% token noise rate
_T5_POSK = 1_000_000


def q_t5_span_corruption(sf_dir: str):
    """Deterministic T5 denoising pairs: tokens whose
    splitmix64(doc_id*K + pos) lands in the noise class are masked;
    each MAXIMAL noise run becomes one sentinel ``<X_k>`` in the
    inputs and ``<X_k> tokens...`` in the targets — the seq2seq
    pretraining corruption, reproducible on any cluster because the
    mask is a pure hash of (doc, position). One streaming pass,
    vectorized run detection; the hash chain is the engine/SQL-shared
    splitmix."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import rehash64
    from ..functions.tokenize import ws_tokens

    docs = _docs(sf_dir)

    def _corrupt(tbl: pa.Table) -> pa.Table:
        row, flat = ws_tokens(tbl.column("text"))
        ids = tbl.column("doc_id").to_numpy().astype(np.int64)
        n_docs = tbl.num_rows
        total = len(row)
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array(ids),
                    "inputs": pa.array([""] * n_docs),
                    "targets": pa.array([""] * n_docs),
                    "n_masked": pa.array(
                        np.zeros(n_docs, np.int64)
                    ),
                    "n_spans": pa.array(np.zeros(n_docs, np.int64)),
                }
            )
        n_tok = np.bincount(row, minlength=n_docs).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(n_tok)))[:-1]
        pos = np.arange(total, dtype=np.int64) - starts[row] + 1
        x = rehash64(
            (ids[row].astype(np.uint64) * np.uint64(_T5_POSK)
             + pos.astype(np.uint64)),
            0,
        )
        noise = (x % np.uint64(_T5_MOD)) == 0
        first_of_doc = np.zeros(total, bool)
        first_of_doc[starts[n_tok > 0]] = True
        prev_noise = np.concatenate(([False], noise[:-1]))
        is_start = noise & (first_of_doc | ~prev_noise)
        run_global = np.cumsum(is_start) - 1
        run_start_doc = np.concatenate(
            ([0], np.cumsum(np.bincount(row[is_start],
                                        minlength=n_docs)))
        )[:-1]
        run_in_doc = np.where(
            noise, run_global - run_start_doc[row], 0
        )
        toks = flat.to_numpy(zero_copy_only=False).astype(object)
        sent = np.char.add(
            np.char.add("<X_", run_in_doc.astype(str)), ">"
        ).astype(object)
        # inputs: kept tokens + one sentinel per run start
        in_keep = ~noise | is_start
        in_tok = np.where(noise, sent, toks)[in_keep]
        in_row = row[in_keep]
        # targets: noise tokens, run starts prefixed by sentinel
        tg_keep = noise
        tg_tok = np.where(
            is_start,
            np.char.add(np.char.add(sent.astype(str), " "),
                        toks.astype(str)).astype(object),
            toks,
        )[tg_keep]
        tg_row = row[tg_keep]

        def _join(tok_arr, row_arr):
            cnt = np.bincount(row_arr, minlength=n_docs).astype(
                np.int64
            )
            off = np.concatenate(([0], np.cumsum(cnt)))
            order = np.argsort(row_arr, kind="stable")
            lists = pa.LargeListArray.from_arrays(
                pa.array(off, pa.int64()),
                pa.array(tok_arr[order].astype(object),
                         pa.large_string()),
            )
            return pc.binary_join(
                lists, pa.scalar(" ", pa.large_string())
            ).cast(pa.string())

        return pa.table(
            {
                "doc_id": pa.array(ids),
                "inputs": _join(in_tok, in_row),
                "targets": _join(tg_tok, tg_row),
                "n_masked": pa.array(
                    np.bincount(row[noise], minlength=n_docs)
                    .astype(np.int64)
                ),
                "n_spans": pa.array(
                    np.bincount(row[is_start], minlength=n_docs)
                    .astype(np.int64)
                ),
            }
        )

    return docs.map_batches(
        _corrupt, batch_format="pyarrow", batch_size=None
    )


def _t5_sql() -> str:
    chain = f"""
t1 AS (SELECT doc_id, pos, w, xor(x, x >> 30) AS x FROM t0
), t2 AS (SELECT doc_id, pos, w, {_splitmix_mulmod(0xBF58476D1CE4E5B9)} AS x FROM t1
), t3 AS (SELECT doc_id, pos, w, xor(x, x >> 27) AS x FROM t2
), t4 AS (SELECT doc_id, pos, w, {_splitmix_mulmod(0x94D049BB133111EB)} AS x FROM t3
), t5 AS (SELECT doc_id, pos, w, xor(x, x >> 31) AS x FROM t4
)"""
    return f"""
WITH tk AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
  FROM documents
), tp AS (
  SELECT doc_id, l,
    CAST(unnest(range(1, len(l) + 1)) AS BIGINT) AS pos
  FROM tk
), t0 AS (
  SELECT doc_id, pos, l[pos] AS w,
    CAST(doc_id * {_T5_POSK} + pos AS UBIGINT) AS x
  FROM tp
), {chain}, nz AS (
  SELECT doc_id, pos, w, (x % {_T5_MOD} = 0) AS noise FROM t5
), st AS (
  SELECT *, noise AND coalesce(NOT lag(noise) OVER w, TRUE)
      AS is_start
  FROM nz WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), runs AS (
  SELECT *,
    CAST(sum(CASE WHEN is_start THEN 1 ELSE 0 END) OVER
      (PARTITION BY doc_id ORDER BY pos) - 1 AS BIGINT) AS run
  FROM st
), agg AS (
  SELECT doc_id,
    coalesce(string_agg(
      CASE WHEN NOT noise THEN w
           ELSE '<X_' || run || '>' END, ' ' ORDER BY pos)
      FILTER (WHERE NOT noise OR is_start), '') AS inputs,
    coalesce(string_agg(
      CASE WHEN is_start THEN '<X_' || run || '> ' || w
           ELSE w END, ' ' ORDER BY pos)
      FILTER (WHERE noise), '') AS targets,
    CAST(count(*) FILTER (WHERE noise) AS BIGINT) AS n_masked,
    CAST(count(*) FILTER (WHERE is_start) AS BIGINT) AS n_spans
  FROM runs GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.inputs, '') AS inputs,
  coalesce(a.targets, '') AS targets,
  coalesce(a.n_masked, 0) AS n_masked,
  coalesce(a.n_spans, 0) AS n_spans
FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
LEFT JOIN agg a USING (doc_id)
""".strip()


QUERIES["t5_span_corruption"] = q_t5_span_corruption
ORACLE_SQL["t5_span_corruption"] = _t5_sql()


# --- blocklist safety filter ----------------------------------------------

# terms drawn from the synthetic vocabulary so hits exist at every
# tier; a real deployment swaps in the policy list
_BLOCK_TERMS = ["spark", "window", "merge"]


def q_blocklist_filter(sf_dir: str):
    """Safety/compliance filtering: per-document blocked-term hit
    counts (token-exact matches against a broadcast blocklist) and
    the keep/drop verdict — the first gate of a curation pipeline.
    One streaming pass; ``pc.is_in`` runs the lookup in C++ against
    the value-set (the list is policy-sized, trivially broadcast)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.tokenize import ws_tokens

    docs = _docs(sf_dir)
    value_set = pa.array(sorted(set(_BLOCK_TERMS)), pa.string())

    def _scan(tbl: pa.Table) -> pa.Table:
        row, flat = ws_tokens(tbl.column("text"))
        n_docs = tbl.num_rows
        hit = pc.is_in(flat, value_set=value_set).to_numpy(
            zero_copy_only=False
        )
        n_hits = (
            np.bincount(row[hit], minlength=n_docs).astype(np.int64)
            if len(row)
            else np.zeros(n_docs, np.int64)
        )
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").cast(pa.int64()),
                "n_blocked_hits": pa.array(n_hits),
                "keep": pa.array(n_hits == 0),
            }
        )

    return docs.map_batches(
        _scan, batch_format="pyarrow", batch_size=None
    )


_BL_SQL_LIST = ", ".join(f"'{t}'" for t in sorted(set(_BLOCK_TERMS)))

QUERIES["blocklist_filter"] = q_blocklist_filter
ORACLE_SQL["blocklist_filter"] = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CAST(len(list_filter(
    list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
    x -> x IN ({_BL_SQL_LIST}))) AS BIGINT) AS n_blocked_hits,
  len(list_filter(
    list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
    x -> x IN ({_BL_SQL_LIST}))) = 0 AS keep
FROM documents
""".strip()


def q_type_token_ratio(sf_dir: str):
    """Vocabulary richness per source: total tokens, distinct tokens
    (type count) and the type-token ratio — exact integers and one
    closing division. Distinct counting rides the (source, token)
    hash agg (raw tokens collapse in-batch first); totals ride the
    same partials, so one exchange serves both."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions.tokenize import ws_tokens
    from ..sources.parquet import read_parquet_tuned
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["source", "text"],
    )

    def _pairs(tbl: pa.Table) -> pa.Table:
        row, flat = ws_tokens(tbl.column("text"))
        src = tbl.column("source").to_pandas().to_numpy()
        t = pa.table(
            {
                "source": pa.array(
                    src[row].astype(object), pa.string()
                ),
                "tok": flat,
                "n": pa.array(np.ones(len(row), np.int64)),
            }
        )
        return group_aggregate_table(
            t, ["source", "tok"], [("n", "sum")]
        )

    st = hash_grouped_aggregate(
        docs.map_batches(_pairs, batch_format="pyarrow",
                         batch_size=None),
        ["source", "tok"],
        [("n", "sum")],
        num_buckets=8,
    )

    def _final(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": tbl.column("source"),
                "n_tokens": tbl.column("n"),
                "n_types": pa.array(
                    np.ones(tbl.num_rows, np.int64)
                ),
            }
        )
        return group_aggregate_table(
            t, ["source"], [("n_tokens", "sum"), ("n_types", "sum")]
        )

    agg = hash_grouped_aggregate(
        st.map_batches(_final, batch_format="pyarrow",
                       batch_size=None),
        ["source"],
        [("n_tokens", "sum"), ("n_types", "sum")],
        num_buckets=4,
    ).to_pandas()
    agg["ttr"] = (
        agg["n_types"].astype("float64")
        / agg["n_tokens"].astype("float64")
    )
    return agg.sort_values("source").reset_index(drop=True)


QUERIES["type_token_ratio"] = q_type_token_ratio
ORACLE_SQL["type_token_ratio"] = """
WITH tok AS (
  SELECT source,
    unnest(list_filter(string_split_regex(text, '\\s+'),
                       x -> x <> '')) AS w
  FROM documents
), pt AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS n
  FROM tok GROUP BY 1, 2
)
SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS n_types,
  CAST(count(*) AS DOUBLE) / sum(n) AS ttr
FROM pt GROUP BY source
""".strip()


# --- bitext candidate mining (comparable-corpus alignment) ----------------

_BX_MAX_DF = 3    # a token is an anchor if it appears in <= 3 docs
_BX_MIN_SHARED = 2


def q_bitext_candidates(sf_dir: str):
    """Comparable-corpus mining: candidate translation pairs = docs in
    DIFFERENT languages sharing >= {m} anchor tokens, where an anchor
    is a rare token (document frequency <= {d}) — the classic bitext
    candidate generator (rare names/numbers align documents across
    languages). Pair emission happens per anchor-token group
    (min_group_size=2) and is df-bounded (<= df² pairs per token), so
    the frequent tail never explodes; per-pair counts aggregate in
    the standard tiny exchange.""".format(m=_BX_MIN_SHARED,
                                          d=_BX_MAX_DF)
    import numpy as np
    import pyarrow as pa

    from ..functions.tokenize import ws_tokens
    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_grouped_map
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    # planted anchors (both sides): docs 13k and 13k+1 share the two
    # rare tokens anchorA<k>/anchorB<k> (df == 2) — the synthetic
    # corpus's 31-token vocabulary has no naturally rare tokens, so
    # without planting the query is vacuous at every tier. Pairs whose
    # two docs happen to share a language are dropped by the
    # cross-lang predicate, identically on both sides.
    def _plant(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        txt = tbl.column("text").to_pandas().fillna("").to_numpy()
        k = (ids // 13).astype(np.int64)
        mark = (ids % 13) < 2
        add = np.char.add(
            np.char.add(" anchorA", k.astype(str)),
            np.char.add(" anchorB", k.astype(str)),
        )
        out = np.where(mark, np.char.add(txt.astype(str), add),
                       txt.astype(str))
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(out.astype(object), pa.string()),
                "lang": tbl.column("lang"),
            }
        )

    docs = docs.map_batches(_plant, batch_format="pyarrow")

    def _doc_tokens(tbl: pa.Table) -> pa.Table:
        row, flat = ws_tokens(tbl.column("text"))
        ids = tbl.column("doc_id").to_numpy().astype(np.int64)
        # lang as a small int via first-char+second-char packing is
        # fragile; ship the string (bounded-domain dictionary in IPC)
        lang = tbl.column("lang").to_pandas().to_numpy()
        t = pa.table(
            {
                "tok": flat,
                "doc_id": pa.array(ids[row]),
                "lang": pa.array(lang[row].astype(object),
                                 pa.string()),
                "n": pa.array(np.ones(len(row), np.int64)),
            }
        )
        # distinct (tok, doc) per batch
        return group_aggregate_table(
            t, ["tok", "doc_id", "lang"], [("n", "sum")]
        )

    tok_docs = hash_grouped_aggregate(
        docs.map_batches(_doc_tokens, batch_format="pyarrow",
                         batch_size=None),
        ["tok", "doc_id", "lang"],
        [("n", "sum")],
        num_buckets=8,
    )

    pair_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("n", pa.int64())]
    )

    def _pairs(group: pa.Table) -> pa.Table:
        if group.num_rows > _BX_MAX_DF:  # frequent token: no anchor
            return pair_schema.empty_table()
        d = group.column("doc_id").to_numpy()
        lg = group.column("lang").to_pandas().to_numpy()
        o = np.argsort(d)
        d, lg = d[o], lg[o]
        ia, ib = np.triu_indices(len(d), k=1)
        diff = lg[ia] != lg[ib]
        ia, ib = ia[diff], ib[diff]
        return pa.table(
            {
                "doc_a": pa.array(d[ia].astype(np.int64)),
                "doc_b": pa.array(d[ib].astype(np.int64)),
                "n": pa.array(np.ones(len(ia), np.int64)),
            }
        )

    pairs = hash_grouped_aggregate(
        hash_grouped_map(
            tok_docs, "tok", _pairs, num_partitions=8,
            empty_schema=pair_schema, min_group_size=2,
        ),
        ["doc_a", "doc_b"],
        [("n", "sum")],
        num_buckets=4,
    )

    def _filter(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = tbl.filter(
            pc.greater_equal(tbl.column("n"), _BX_MIN_SHARED)
        )
        return pa.table(
            {
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "n_shared_anchors": t.column("n"),
            }
        )

    return pairs.map_batches(
        _filter, batch_format="pyarrow", batch_size=None
    )


QUERIES["bitext_candidates"] = q_bitext_candidates
ORACLE_SQL["bitext_candidates"] = f"""
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
    text || CASE WHEN doc_id % 13 < 2
      THEN ' anchorA' || (doc_id // 13) || ' anchorB' || (doc_id // 13)
      ELSE '' END AS text
  FROM documents
), td AS (
  SELECT DISTINCT doc_id, lang,
    unnest(list_filter(string_split_regex(text, '\\s+'),
                       x -> x <> '')) AS tok
  FROM aug
), rare AS (
  SELECT tok FROM td GROUP BY tok
  HAVING count(*) BETWEEN 2 AND {_BX_MAX_DF}
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(count(*) AS BIGINT) AS n_shared_anchors
  FROM td a
  JOIN td b ON a.tok = b.tok AND a.doc_id < b.doc_id
            AND a.lang <> b.lang
  JOIN rare r ON r.tok = a.tok
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared_anchors FROM p
WHERE n_shared_anchors >= {_BX_MIN_SHARED}
""".strip()
