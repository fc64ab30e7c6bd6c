"""Set-operation and full-outer-join gate queries.

INTERSECT/EXCEPT over per-language token vocabularies (stages/
setops.py) and the FULL OUTER join mode of the hash join (stages/
join.py), each paired with the literal SQL operator in DuckDB.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import ws_tokens
from ..stages.join import hash_equi_join
from ..stages.setops import set_op

QUERIES = {}
ORACLE_SQL = {}


def _lang_bigrams(sf_dir: str, lang: str):
    """Token-bigram stream of one language's documents (single-token
    vocabularies of the synthetic corpus fully overlap across
    languages, so bigrams are the smallest unit whose per-language
    sets actually differ). The set_op map side re-distincts per batch;
    exact distinct happens in the reduce."""
    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["text", "lang"],
    )

    def _bigrams(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(tbl.column("lang"), lang))
        row_idx, flat = ws_tokens(t.column("text"))
        if len(flat) < 2:
            return pa.table({"big": pa.array([], pa.string())})
        same_doc = row_idx[1:] == row_idx[:-1]
        big = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " "
        )
        return pa.table({"big": big.filter(pa.array(same_doc))})

    return docs.map_batches(_bigrams, batch_format="pyarrow")


def q_bigrams_en_de_intersect(sf_dir: str):
    """Phrase overlap: token bigrams used by BOTH English and German
    documents — distributed INTERSECT DISTINCT on the bigram key."""
    return set_op(
        _lang_bigrams(sf_dir, "en"),
        _lang_bigrams(sf_dir, "de"),
        keys="big",
        op="intersect",
        num_partitions=16,
    )


def q_bigrams_en_minus_de(sf_dir: str):
    """English-only phrases: EXCEPT DISTINCT on the bigram key."""
    return set_op(
        _lang_bigrams(sf_dir, "en"),
        _lang_bigrams(sf_dir, "de"),
        keys="big",
        op="except",
        num_partitions=16,
    )


QUERIES["bigrams_en_de_intersect"] = q_bigrams_en_de_intersect
QUERIES["bigrams_en_minus_de"] = q_bigrams_en_minus_de

_BIG_CTE = r"""
big_{l} AS (
  SELECT t[i] || ' ' || t[i+1] AS big
  FROM (SELECT list_filter(string_split_regex(text, '\s+'),
               x -> x <> '') AS t
        FROM documents WHERE lang = '{l}'),
       unnest(range(1, len(t))) AS u(i)
)
""".strip()

ORACLE_SQL["bigrams_en_de_intersect"] = (
    "WITH "
    + _BIG_CTE.format(l="en")
    + ",\n"
    + _BIG_CTE.format(l="de")
    + "\nSELECT big FROM big_en INTERSECT SELECT big FROM big_de"
)
ORACLE_SQL["bigrams_en_minus_de"] = (
    "WITH "
    + _BIG_CTE.format(l="en")
    + ",\n"
    + _BIG_CTE.format(l="de")
    + "\nSELECT big FROM big_en EXCEPT SELECT big FROM big_de"
)


def q_docs_embeddings_full_join(sf_dir: str):
    """FULL OUTER join of the English documents against the label-0
    embeddings on doc_id == vec_id: unmatched rows from BOTH sides
    surface with typed nulls for the other side's columns."""
    from ..sources.parquet import read_parquet_tuned

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )

    def _en(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.equal(tbl.column("lang"), "en"))

    emb = read_parquet_tuned(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label"],
    )

    def _l0(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.equal(tbl.column("label"), 0))

    return hash_equi_join(
        docs.map_batches(_en, batch_format="pyarrow"),
        emb.map_batches(_l0, batch_format="pyarrow"),
        left_on="doc_id",
        right_on="vec_id",
        right_columns=["vec_id", "label"],
        how="outer",
        num_partitions=16,
    )


QUERIES["docs_embeddings_full_join"] = q_docs_embeddings_full_join
ORACLE_SQL["docs_embeddings_full_join"] = """
SELECT d.doc_id, d.lang, d.n_chars, e.vec_id, e.label
FROM (SELECT * FROM documents WHERE lang = 'en') d
FULL OUTER JOIN (SELECT * FROM embeddings WHERE label = 0) e
  ON d.doc_id = e.vec_id
""".strip()
