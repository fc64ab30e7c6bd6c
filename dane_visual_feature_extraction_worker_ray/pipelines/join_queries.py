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
    import pyarrow as pa
    import pyarrow.compute as pc

    emb0 = _emb(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("label"), 0)),
        batch_format="pyarrow",
        batch_size=None,
    )
    return hash_equi_join(
        _docs(sf_dir),
        emb0,
        left_on="doc_id",
        right_on="vec_id",
        right_columns=["label"],
        how="left",
        num_partitions=16,
    )


QUERIES = {
    "docs_embeddings_join": q_docs_embeddings_join,
    "docs_embeddings_left_join": q_docs_embeddings_left_join,
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
}
