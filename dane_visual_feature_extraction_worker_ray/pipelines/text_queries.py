"""Text-analysis suite queries over the ``documents`` table."""

from __future__ import annotations

import os

import ray.data as rd

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


def q_top_docs_per_lang(sf_dir: str, k: int = 3):
    """Grouped window-rank: top-k documents per language by n_chars
    (deterministic tie-break on doc_id) — row_number() OVER (PARTITION
    BY lang ORDER BY ...) expressed as a hash_grouped_map (one
    co-located group per call, rank computed with a lexsort)."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_grouped_map

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
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
        docs, ["lang"], _top, num_partitions=8, empty_schema=out_schema
    )


def q_stratified_sample(sf_dir: str, every_n: int = 4):
    """Stratified systematic sample: every Nth document per language in
    doc_id order — the per-stratum subsetting pattern for balanced
    training mixes (deterministic, SQL-checkable; same grouped-rank
    machinery as top_docs_per_lang)."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_grouped_map

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    )
    out_schema = pa.schema([("lang", pa.string()), ("doc_id", pa.int64())])

    def _strat(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        order = np.argsort(ids)
        keep_rows = order[::every_n]
        t = g.take(pa.array(np.sort(keep_rows)))
        return pa.table(
            {
                "lang": t.column("lang"),
                "doc_id": t.column("doc_id").cast(pa.int64()),
            }
        )

    return hash_grouped_map(
        docs, ["lang"], _strat, num_partitions=8, empty_schema=out_schema
    )


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
