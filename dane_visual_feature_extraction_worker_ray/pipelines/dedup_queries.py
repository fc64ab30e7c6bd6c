"""Dedup suite queries over the ``documents`` table."""

from __future__ import annotations

import os

import ray.data as rd

from ..stages.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs

_STOP = None


def _docs(sf_dir: str):
    from ..sources.parquet import read_parquet_tuned

    return read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def q_dedup_exact(sf_dir: str):
    return exact_dedup(_docs(sf_dir))


def q_dedup_minhash_lsh(sf_dir: str):
    return minhash_lsh_pairs(_docs(sf_dir), threshold=0.5)


def q_dedup_simhash(sf_dir: str):
    # bands=16 → pigeonhole-guaranteed recall up to hamming 15 >= 8
    return simhash_pairs(_docs(sf_dir), max_hamming=8, bands=16)


NGRAM_J_THRESHOLD = 0.5


def q_dedup_ngram_jaccard(sf_dir: str):
    """MinHash-LSH candidates (loose est >= 0.3) → exact word-3-gram
    Jaccard verification, keep >= NGRAM_J_THRESHOLD.

    Fully SQL-checkable: the oracle brute-forces exact Jaccard over all
    pairs. Equality holds because every pair with true J >= 0.5 is an
    LSH candidate on this corpus (near-dup pairs here sit at J >= 0.8,
    where 16-band/4-row LSH recall is ~1-6e-4 per pair and the seeded
    signatures are deterministic — verified offline at both sf tiers).

    Verification runs distributed (shingle-partitioned intersection
    counts) — shingle sets never land on the driver.
    """
    from ..stages.dedup import jaccard_verify_distributed

    cand = minhash_lsh_pairs(_docs(sf_dir), threshold=0.3).to_pandas()
    pairs = list(zip(cand["doc_a"], cand["doc_b"]))
    if not pairs:
        import pandas as pd

        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"),
             "doc_b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    out = jaccard_verify_distributed(_docs(sf_dir), pairs)
    return (
        out[out["jaccard"] >= NGRAM_J_THRESHOLD]
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


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
    #
    # ngram_jaccard: exact metric → full brute-force oracle. Shingle
    # identity: 3 consecutive whitespace tokens (joined rendering here,
    # combined token-hash in the engine — same set relations); docs
    # shorter than 3 tokens fall back to a single whole-text shingle.
    "dedup_ngram_jaccard": r"""
WITH toks AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id,
    CASE WHEN len(tk) < 3 THEN [coalesce(text, '')]
         ELSE list_distinct(list_transform(range(1, len(tk) - 1),
              i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]))
    END AS g
  FROM toks
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
    (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS jaccard
FROM grams a JOIN grams b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE) /
    (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.5
ORDER BY doc_a, doc_b
""".strip(),
}


def q_dedup_near_survivors(sf_dir: str):
    """Corpus minus near-duplicates: MinHash-LSH pairs → DISTRIBUTED
    connected components (min-label propagation on the hash exchange;
    the pair list never lands on the driver) → keep min doc_id per
    cluster (rows-only; clustering is sketch-derived)."""
    from ..stages.dedup import near_dup_survivors_distributed

    pairs = minhash_lsh_pairs(_docs(sf_dir), threshold=0.6)
    return near_dup_survivors_distributed(_docs(sf_dir), pairs)


QUERIES["dedup_near_survivors"] = q_dedup_near_survivors
