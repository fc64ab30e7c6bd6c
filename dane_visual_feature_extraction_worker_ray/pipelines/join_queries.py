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
