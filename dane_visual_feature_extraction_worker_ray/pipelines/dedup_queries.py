"""Dedup suite queries over the ``documents`` table."""

from __future__ import annotations

import os

import ray.data as rd

from ..stages.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs

_STOP = None


def _docs(sf_dir: str):
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def q_dedup_exact(sf_dir: str):
    return exact_dedup(_docs(sf_dir))


def q_dedup_minhash_lsh(sf_dir: str):
    return minhash_lsh_pairs(_docs(sf_dir), threshold=0.5)


def q_dedup_simhash(sf_dir: str):
    return simhash_pairs(_docs(sf_dir), max_hamming=8)


def q_dedup_ngram_jaccard(sf_dir: str):
    """MinHash-LSH candidates → exact word-3-gram Jaccard verification."""
    from ..stages.dedup import jaccard_verify

    cand = minhash_lsh_pairs(_docs(sf_dir), threshold=0.3).to_pandas()
    pairs = list(zip(cand["doc_a"], cand["doc_b"]))
    if not pairs:
        import pandas as pd

        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"),
             "doc_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    out = jaccard_verify(_docs(sf_dir), pairs)
    return out[out["jaccard"] >= 0.3].reset_index(drop=True)


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
}

ORACLE_SQL = {
    "dedup_exact": (
        "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text "
        "FROM documents GROUP BY text"
    ),
    # minhash_lsh / simhash are sketch-based → rows-only driver check;
    # recall/precision are covered by tests/test_dedup.py against a
    # brute-force oracle on a constructed near-dup corpus.
}


def q_dedup_near_survivors(sf_dir: str):
    """Corpus minus near-duplicates: MinHash-LSH pairs → connected
    components → keep min doc_id per cluster (rows-only; clustering is
    sketch-derived). On the synthetic corpus near-dup pairs may be
    empty → returns the full corpus, which is correct."""
    from ..stages.dedup import near_dup_survivors

    pairs = minhash_lsh_pairs(_docs(sf_dir), threshold=0.6).to_pandas()
    return near_dup_survivors(_docs(sf_dir), pairs)


QUERIES["dedup_near_survivors"] = q_dedup_near_survivors
