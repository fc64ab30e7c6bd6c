"""Similarity-search suite over the ``embeddings`` table."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from ..stages.similarity import knn_brute_force, near_dup_pairs_cosine

K = 10
QUERY_VEC_ID = 0


def _emb(sf_dir: str):
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        filters=[("vec_id", "=", QUERY_VEC_ID)],
    )
    return np.array(t.column("embedding").to_pylist()[0], dtype=np.float64)


def q_knn_topk(sf_dir: str):
    df = knn_brute_force(
        _emb(sf_dir), _query_vec(sf_dir), k=K, round_decimals=4
    )
    return df[["vec_id", "score"]].reset_index(drop=True)


def q_embedding_near_dups(sf_dir: str):
    return near_dup_pairs_cosine(_emb(sf_dir), threshold=0.9)


QUERIES = {
    "knn_topk": q_knn_topk,
    "embedding_near_dups": q_embedding_near_dups,
}

ORACLE_SQL = {
    "knn_topk": f"""
SELECT vec_id,
  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = {QUERY_VEC_ID})), 4) AS score
FROM embeddings
ORDER BY score DESC, vec_id
LIMIT {K}
""".strip(),
    # embedding_near_dups: LSH sketch → rows-only; recall verified in
    # tests/test_similarity.py against a brute-force cosine oracle.
}
