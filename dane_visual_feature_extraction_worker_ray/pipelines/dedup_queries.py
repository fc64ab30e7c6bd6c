"""Dedup suite queries over the ``documents`` table."""

from __future__ import annotations

import os

from ..stages.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs


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


# --------------------------------------------------------------------------
# planted-duplicate variants: the corpus is augmented with EXACT text
# copies (doc_id < N_PLANT copied to doc_id + PLANT_OFFSET). Identical
# texts give identical MinHash signatures (est = 1.0 in every band) and
# identical SimHash bits (hamming 0), so sketch recall of the planted
# pairs is guaranteed and SQL-checkable — de-vacuating the rows-only
# checks exactly like embedding_near_dups did in round 2
# (similarity_queries.py; see _planted_only for why the output is
# restricted to the planted id structure).

N_PLANT = 20
PLANT_OFFSET = 10_000_000


def _planted_docs(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    def _plant(tbl: pa.Table) -> pa.Table:
        m = tbl.filter(pc.less(tbl.column("doc_id"), N_PLANT))
        if m.num_rows == 0:
            return tbl
        i = m.schema.get_field_index("doc_id")
        dup = m.set_column(
            i, "doc_id", pc.add(m.column("doc_id"), PLANT_OFFSET)
        )
        return pa.concat_tables([tbl, dup])

    return _docs(sf_dir).map_batches(_plant, batch_format="pyarrow")


def _planted_only(pairs_ds):
    """Keep only structurally-planted pairs (a < N_PLANT, b = a+offset).
    The corpus carries natural one-token-apart near-dups whose 64-perm
    signatures occasionally collide at est 1.0, so a bare threshold
    cannot isolate the planted copies; the id-structure filter makes
    the oracle exact while the gate still verifies 100% RECALL of the
    planted duplicates through the full distributed sketch path
    (precision is covered by the brute-force oracles in
    tests/test_dedup.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _f(tbl: pa.Table) -> pa.Table:
        a = tbl.column("doc_a")
        b = tbl.column("doc_b")
        return tbl.filter(
            pc.and_(
                pc.less(a, N_PLANT),
                pc.equal(pc.subtract(b, a), PLANT_OFFSET),
            )
        )

    return pairs_ds.map_batches(_f, batch_format="pyarrow", batch_size=None)


def q_dedup_minhash_planted(sf_dir: str):
    """MinHash-LSH at threshold 1.0 over the planted corpus, restricted
    to the planted pairs: identical texts guarantee identical
    signatures, so all N_PLANT pairs must surface with est 1.0."""
    return _planted_only(
        minhash_lsh_pairs(_planted_docs(sf_dir), threshold=1.0)
    )


def q_dedup_simhash_planted(sf_dir: str):
    """SimHash at max_hamming 0 over the planted corpus, restricted to
    the planted pairs (identical text -> identical simhash -> hamming
    0, guaranteed in every band)."""
    return _planted_only(
        simhash_pairs(_planted_docs(sf_dir), max_hamming=0, bands=4)
    )


def q_dedup_survivors_planted(sf_dir: str):
    """Full near-dup removal pipeline (LSH pairs → distributed
    connected components → keep min id per cluster) over the planted
    corpus: every planted copy is dropped, every original survives —
    the end-to-end dedup path with a plain SQL oracle."""
    from ..stages.dedup import near_dup_survivors_distributed

    aug = _planted_docs(sf_dir)
    pairs = _planted_only(
        minhash_lsh_pairs(_planted_docs(sf_dir), threshold=1.0)
    )
    return near_dup_survivors_distributed(aug, pairs)


QUERIES["dedup_minhash_planted"] = q_dedup_minhash_planted
QUERIES["dedup_simhash_planted"] = q_dedup_simhash_planted
QUERIES["dedup_survivors_planted"] = q_dedup_survivors_planted

ORACLE_SQL["dedup_minhash_planted"] = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_a,
       CAST(doc_id + {PLANT_OFFSET} AS BIGINT) AS doc_b,
       1.0 AS est_jaccard
FROM documents WHERE doc_id < {N_PLANT}
""".strip()

ORACLE_SQL["dedup_simhash_planted"] = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_a,
       CAST(doc_id + {PLANT_OFFSET} AS BIGINT) AS doc_b,
       CAST(0 AS BIGINT) AS hamming
FROM documents WHERE doc_id < {N_PLANT}
""".strip()

# every text is unique in the base corpus (no natural exact dups at the
# driver tiers), so the survivors of the planted corpus are exactly the
# original rows
ORACLE_SQL["dedup_survivors_planted"] = (
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents"
)


# keep-BEST survivor policy: the planted COPY carries higher quality
# than its original, so it must win its cluster — the inverse of the
# min-id policy above, exercising CC → distributed quality join →
# per-cluster argmax → anti filter end-to-end (stages/dedup.py:
# near_dup_keep_best).
BEST_PLANT_BONUS = 1000


def q_dedup_survivors_best_planted(sf_dir: str):
    """Near-dup removal keeping the highest-``n_chars`` member per
    cluster (ties → min id). Clusters are the planted id structure
    (original ↔ copy with ``n_chars + BEST_PLANT_BONUS``); the pair
    list is constructed from the structure — the sketch recall path is
    already covered by ``dedup_survivors_planted`` — so the subject
    under SQL verification is the SELECTION policy."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.parquet import read_parquet_tuned
    from ..stages.dedup import near_dup_keep_best

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
    )

    def _plant(tbl: pa.Table) -> pa.Table:
        m = tbl.filter(pc.less(tbl.column("doc_id"), N_PLANT))
        if m.num_rows == 0:
            return tbl
        dup = pa.table(
            {
                "doc_id": pc.add(m.column("doc_id"), PLANT_OFFSET),
                "n_chars": pc.add(m.column("n_chars"), BEST_PLANT_BONUS),
            }
        )
        return pa.concat_tables([tbl, dup.cast(tbl.schema)])

    aug = docs.map_batches(_plant, batch_format="pyarrow")

    def _pairs(tbl: pa.Table) -> pa.Table:
        m = tbl.filter(pc.less(tbl.column("doc_id"), N_PLANT))
        return pa.table(
            {
                "doc_a": m.column("doc_id").cast(pa.int64()),
                "doc_b": pc.add(
                    m.column("doc_id"), PLANT_OFFSET
                ).cast(pa.int64()),
            }
        )

    pairs = docs.map_batches(_pairs, batch_format="pyarrow")
    return near_dup_keep_best(aug, pairs, quality_col="n_chars")


QUERIES["dedup_survivors_best_planted"] = q_dedup_survivors_best_planted
ORACLE_SQL["dedup_survivors_best_planted"] = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE doc_id >= {N_PLANT}
UNION ALL
SELECT CAST(doc_id + {PLANT_OFFSET} AS BIGINT),
       CAST(n_chars + {BEST_PLANT_BONUS} AS BIGINT)
FROM documents WHERE doc_id < {N_PLANT}
""".strip()


# --- benchmark decontamination ---------------------------------------------

# planted contamination (the corpus is non-repeating word soup): a
# fixed 10-word sentinel phrase is appended to the BENCHMARK docs
# (doc_id % 53 == 0) and to some corpus docs (doc_id % 37 == 0) in
# BOTH the Ray pipeline and the oracle — those corpus docs must flag.
_DECON_K = 8
_DECON_PHRASE = (
    "held out benchmark evaluation phrase alpha beta gamma delta omega"
)


def q_decontaminate(sf_dir: str):
    """Eval-set n-gram decontamination: flag every doc sharing a word
    8-gram with the benchmark subset (stages/dedup.py:
    contamination_flags — broadcast benchmark shingle hashes, one
    streaming pass, distinct-hit counts per doc)."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..stages.dedup import _word_shingles, contamination_flags

    def _aug(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        s = tbl.column("text").to_pandas().fillna("")
        planted = (ids % 37 == 0) | (ids % 53 == 0)
        aug = np.where(planted, s + " " + _DECON_PHRASE, s)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(aug, pa.string()),
            }
        )

    docs = _docs(sf_dir).map_batches(_aug, batch_format="pyarrow")
    # benchmark = the doc_id % 53 subset; an eval set is small by
    # definition, so its shingle set is built driver-side and broadcast
    bench_tbl = pa.concat_tables(
        [
            ray.get(r)
            for r in docs.map_batches(
                lambda t: t.filter(
                    pa.array(t.column("doc_id").to_numpy() % 53 == 0)
                ),
                batch_format="pyarrow",
                batch_size=None,
            ).to_arrow_refs()
        ]
    )
    _, sh = _word_shingles(
        bench_tbl.column("text").to_pandas(), _DECON_K
    )
    return contamination_flags(
        docs, np.unique(sh), shingle_k=_DECON_K
    )


# --- exact duplicate-substring spans (Lee et al. exact-substring) ----------

# a fixed 9-word phrase appended to every doc_id % 5 == 0 document (in
# BOTH the Ray pipeline and the oracle) guarantees duplicated 8-grams
# at every sf tier on top of the corpus's natural repeats
_SPAN_K = 8
_SPAN_PHRASE = (
    "shared duplicated training sentence epsilon zeta eta theta iota"
)


def q_dup_span_marks(sf_dir: str):
    """Per-document duplicate-substring span marks: the union of token
    spans covered by word-8-grams occurring more than once corpus-wide
    (stages/dedup.py: duplicate_ngram_spans — gram-hash exchange →
    doc-id exchange, 20 B/gram on the wire, the distributed form of
    Lee et al.'s exact-substring dedup)."""
    import numpy as np
    import pyarrow as pa

    from ..stages.dedup import duplicate_ngram_spans

    def _aug(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        s = tbl.column("text").to_pandas().fillna("")
        aug = np.where(ids % 5 == 0, s + " " + _SPAN_PHRASE, s)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(aug, pa.string()),
            }
        )

    docs = _docs(sf_dir).map_batches(_aug, batch_format="pyarrow")
    return duplicate_ngram_spans(docs, k=_SPAN_K, num_partitions=16)


QUERIES["dup_span_marks"] = q_dup_span_marks
_GSPAN = "||' '||".join(f"tk[pos+{j}]" for j in range(_SPAN_K))
ORACLE_SQL["dup_span_marks"] = f"""
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    text || CASE WHEN doc_id % 5 = 0 THEN ' {_SPAN_PHRASE}' ELSE '' END AS t
  FROM documents
), tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS tk
  FROM aug
), pos AS (
  SELECT doc_id, tk, unnest(range(1, len(tk) - {_SPAN_K - 2})) AS pos
  FROM tok
), grams AS (
  SELECT doc_id, pos, {_GSPAN} AS g FROM pos
), dupg AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) > 1
), hits AS (
  SELECT grams.doc_id, grams.pos FROM grams JOIN dupg USING (g)
), brk AS (
  SELECT doc_id, pos,
    CASE WHEN lag(pos) OVER w IS NULL
           OR pos - lag(pos) OVER w > {_SPAN_K} THEN 1 ELSE 0 END AS b
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), isl AS (
  SELECT doc_id, pos,
    sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
), spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) AS e,
    count(*) AS c
  FROM isl GROUP BY doc_id, island
)
SELECT doc_id,
  CAST(sum(c) AS BIGINT) AS n_dup_grams,
  CAST(count(*) AS BIGINT) AS n_spans,
  CAST(sum(e - s + {_SPAN_K}) AS BIGINT) AS dup_tokens
FROM spans GROUP BY doc_id
""".strip()


def q_dup_span_clean(sf_dir: str):
    """APPLY-side of the exact-substring dedup: every document
    rewritten with corpus-duplicated 8-gram spans removed
    (stages/dedup.py: remove_duplicate_spans — the gram phases shared
    with dup_span_marks; text moves exactly once, on the doc_id
    rewrite exchange). Canonical token-level rebuild: kept tokens
    joined by one space, matching the oracle's ordered string_agg."""
    import numpy as np
    import pyarrow as pa

    from ..stages.dedup import remove_duplicate_spans

    def _aug(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        s = tbl.column("text").to_pandas().fillna("")
        aug = np.where(ids % 5 == 0, s + " " + _SPAN_PHRASE, s)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(aug, pa.string()),
            }
        )

    docs = _docs(sf_dir).map_batches(_aug, batch_format="pyarrow")
    return remove_duplicate_spans(docs, k=_SPAN_K, num_partitions=16)


QUERIES["dup_span_clean"] = q_dup_span_clean
ORACLE_SQL["dup_span_clean"] = f"""
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    text || CASE WHEN doc_id % 5 = 0 THEN ' {_SPAN_PHRASE}' ELSE '' END AS t
  FROM documents
), tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS tk
  FROM aug
), pos AS (
  SELECT doc_id, tk, unnest(range(1, len(tk) - {_SPAN_K - 2})) AS pos
  FROM tok
), grams AS (
  SELECT doc_id, pos, {{gspan}} AS g FROM pos
), dupg AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) > 1
), hits AS (
  SELECT grams.doc_id, grams.pos FROM grams JOIN dupg USING (g)
), cover AS (
  SELECT DISTINCT doc_id, i FROM (
    SELECT doc_id, unnest(range(pos, pos + {_SPAN_K})) AS i FROM hits)
), alltok AS (
  SELECT doc_id, unnest(tk) AS token,
    unnest(range(1, len(tk) + 1)) AS i
  FROM tok
), kept AS (
  SELECT a.doc_id, a.i, a.token
  FROM alltok a ANTI JOIN cover c
    ON a.doc_id = c.doc_id AND a.i = c.i
), rebuilt AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY i) AS clean_text,
    count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(r.clean_text, '') AS clean_text,
  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
  CAST(len(t.tk) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
FROM tok t LEFT JOIN rebuilt r USING (doc_id)
""".strip().replace(
    "{gspan}", "||' '||".join(f"tk[pos+{j}]" for j in range(_SPAN_K))
)


QUERIES["decontaminate"] = q_decontaminate
_G8 = "||' '||".join(f"tk[i+{j}]" for j in range(_DECON_K))
ORACLE_SQL["decontaminate"] = f"""
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    text || CASE WHEN doc_id % 37 = 0 OR doc_id % 53 = 0
                 THEN ' {_DECON_PHRASE}' ELSE '' END AS t
  FROM documents
), tok AS (
  SELECT doc_id, t,
    list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS tk
  FROM aug
), grams AS (
  SELECT doc_id,
    unnest(CASE WHEN len(tk) < {_DECON_K} THEN [t]
           ELSE list_distinct(list_transform(
             range(1, len(tk) - {_DECON_K - 2}), i -> {_G8}))
           END) AS g
  FROM tok
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 53 = 0
), hits AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM grams d JOIN bench b ON d.g = b.g
  GROUP BY d.doc_id
)
SELECT a.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
  COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM aug a LEFT JOIN hits h USING (doc_id)
""".strip()


# --------------------------------------------------------------------------
# edit-distance (Levenshtein) near-dups — fuzzy-string dedup family

EDIT_PLANT_OFFSET = 20_000_000
EDIT_MAX_DIST = 2
EDIT_PREFIX = 60


def q_edit_distance_near_dups(sf_dir: str):
    """Same-source pairs within 2 Levenshtein edits on the 60-codepoint
    text prefix, over the corpus augmented with planted one-edit
    mutants ('Z' replacing each planted doc's first character) — the
    transcription-jitter dedup that exact hashing and shingle sketches
    both miss. The metric is exact (full DP, no sketch), so the DuckDB
    ``levenshtein()`` self-join oracle matches hash-for-hash; planted
    mutants guarantee the result is non-vacuous at every sf tier, and
    any natural jitter pairs surface identically on both sides."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.parquet import read_parquet_tuned
    from ..stages.dedup import edit_distance_pairs

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )

    def _plant(tbl: pa.Table) -> pa.Table:
        sel = pc.less(tbl.column("doc_id"), N_PLANT)
        m = tbl.filter(sel)
        mut = pa.table(
            {
                "doc_id": pc.add(m.column("doc_id"), EDIT_PLANT_OFFSET),
                "text": pc.binary_join_element_wise(
                    "Z", pc.utf8_slice_codeunits(m.column("text"), 1), ""
                ),
                "source": m.column("source"),
            }
        )
        return pa.concat_tables([tbl, mut.cast(tbl.schema)])

    aug = docs.map_batches(_plant, batch_format="pyarrow")
    return edit_distance_pairs(
        aug, max_dist=EDIT_MAX_DIST, prefix_len=EDIT_PREFIX
    )


QUERIES["edit_distance_near_dups"] = q_edit_distance_near_dups
ORACLE_SQL["edit_distance_near_dups"] = f"""
WITH aug AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + {EDIT_PLANT_OFFSET}, 'Z' || substr(text, 2), source
  FROM documents WHERE doc_id < {N_PLANT}
), p AS (
  SELECT doc_id, substr(text, 1, {EDIT_PREFIX}) AS pfx, source FROM aug
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
FROM p a JOIN p b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= {EDIT_MAX_DIST}
""".strip()


# --- oracle harness for the distributed connected-components engine -------

# chain edges derived from doc_id: (d, d-1) whenever both ids exist and
# d is not a multiple of _CC_BREAK — components are maximal consecutive
# id runs broken at multiples of _CC_BREAK, i.e. worst-case-diameter
# chains (up to 61 hops), which is exactly the shape the engine's
# pointer-jumping exists for. Production edge sets come from the dedup
# candidate generators (minhash/simhash/edit-distance pairs); this
# query pins the CC engine itself to a closed-form SQL oracle
# (gaps-and-islands — no recursion needed for chain graphs).
_CC_BREAK = 61


def q_graph_components(sf_dir: str):
    """Distributed connected components (min-label propagation +
    pointer jumping, stages/dedup.py:connected_components_labels) over
    deterministic doc-id chain edges. Edge construction is itself
    distributed: a hash-grouped map on ``doc_id // _CC_BREAK`` — both
    endpoints of every edge share that bucket by construction, and the
    local consecutive-id check equals the global edge predicate, so no
    join is needed to test id existence. The CC engine then
    re-partitions the edges by ITS own node hash; nothing about the
    bucket layout leaks into the propagation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.dedup import connected_components_labels
    from ..stages.exchange import hash_grouped_map

    ids = _docs(sf_dir).select_columns(["doc_id"])

    def _bucket(tbl: pa.Table) -> pa.Table:
        d = tbl.column("doc_id")
        return pa.table(
            {
                "bucket": pc.divide(d, _CC_BREAK),
                "doc_id": d,
            }
        )

    edge_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def _edges(group: pa.Table) -> pa.Table:
        d = np.sort(
            group.column("doc_id").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        a = d[1:]
        keep = (a == d[:-1] + 1) & (a % _CC_BREAK != 0)
        return pa.table(
            {"doc_a": pa.array(a[keep]), "doc_b": pa.array((a - 1)[keep])}
        )

    edges = hash_grouped_map(
        ids.map_batches(_bucket, batch_format="pyarrow", batch_size=None),
        "bucket",
        _edges,
        num_partitions=8,
        empty_schema=edge_schema,
        min_group_size=2,
    )
    return connected_components_labels(edges, num_partitions=8)


QUERIES["graph_components"] = q_graph_components
ORACLE_SQL["graph_components"] = f"""
WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
edges AS (
  SELECT a.d AS doc_a, b.d AS doc_b
  FROM ids a JOIN ids b ON b.d = a.d - 1
  WHERE a.d % {_CC_BREAK} <> 0
),
nodes AS (
  SELECT doc_a AS n FROM edges UNION SELECT doc_b FROM edges
),
brk AS (
  SELECT n,
    CASE WHEN lag(n) OVER (ORDER BY n) = n - 1
           AND n % {_CC_BREAK} <> 0 THEN 0 ELSE 1 END AS b
  FROM nodes
),
isl AS (
  SELECT n, sum(b) OVER (ORDER BY n) AS island FROM brk
)
SELECT n AS node, min(n) OVER (PARTITION BY island) AS label
FROM isl
""".strip()


# --- C4-style paragraph dedup (keep-first) --------------------------------

# a fixed 20-token paragraph PREPENDED to every doc_id % 7 == 0
# document (both sides): prepending pins it to chunk positions 0 and 1
# regardless of each doc's length, so its two 10-token chunks are
# byte-identical across all planted docs and keep-first retains them
# only in the smallest planted doc_id. Natural chunk repeats (if any)
# dedup identically on both sides.
_PARA_W = 10
_PARA_PHRASE = (
    "omega alpha beta gamma delta epsilon zeta eta theta iota "
    "kappa lambda mu nu xi omicron pi rho sigma tau"
)


def q_paragraph_dedup(sf_dir: str):
    """Corpus-wide keep-first paragraph dedup, C4 line-dedup policy
    (stages/dedup.py:paragraph_dedup — 20 B/paragraph hash exchange,
    drop decisions only into the doc_id rewrite exchange)."""
    import numpy as np
    import pyarrow as pa

    from ..stages.dedup import paragraph_dedup

    def _aug(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        s = tbl.column("text").to_pandas().fillna("")
        aug = np.where(ids % 7 == 0, _PARA_PHRASE + " " + s, s)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "text": pa.array(aug, pa.string()),
            }
        )

    docs = _docs(sf_dir).map_batches(_aug, batch_format="pyarrow")
    return paragraph_dedup(docs, chunk_w=_PARA_W, num_partitions=16)


QUERIES["paragraph_dedup"] = q_paragraph_dedup
ORACLE_SQL["paragraph_dedup"] = f"""
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
    CASE WHEN doc_id % 7 = 0 THEN '{_PARA_PHRASE} ' || text
         ELSE text END AS t
  FROM documents
), tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS tk
  FROM aug
), chunks AS (
  SELECT doc_id, tk,
    unnest(range(0, CAST(ceil(len(tk) / {_PARA_W}.0) AS INT))) AS ci
  FROM tok
), cstr AS (
  SELECT doc_id, CAST(ci AS INT) AS ci,
    array_to_string(tk[ci * {_PARA_W} + 1 : (ci + 1) * {_PARA_W}],
                    ' ') AS chunk
  FROM chunks
), ranked AS (
  SELECT doc_id, ci, chunk,
    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, ci) AS rn
  FROM cstr
), per_doc AS (
  SELECT doc_id,
    coalesce(string_agg(chunk, ' ' ORDER BY ci)
             FILTER (WHERE rn = 1), '') AS clean_text,
    CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept_chunks,
    CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_removed_chunks
  FROM ranked GROUP BY doc_id
)
SELECT a.doc_id, coalesce(p.clean_text, '') AS clean_text,
  coalesce(p.n_kept_chunks, 0) AS n_kept_chunks,
  coalesce(p.n_removed_chunks, 0) AS n_removed_chunks
FROM aug a LEFT JOIN per_doc p USING (doc_id)
""".strip()


# --- incremental dedup against a persisted index --------------------------


def q_incremental_dedup(sf_dir: str):
    """Incremental exact dedup (the daily-ingest shape): the OLD
    corpus partition's distinct text hashes are persisted once as the
    dedup index; the NEW partition (doc_id % 5 == 0) then dedups
    against index ∪ itself WITHOUT re-scanning old documents — old
    text never moves again, only its 8-byte hashes. Verdict per new
    doc: kept iff its text is absent from the index AND it is the
    min-doc_id holder among new docs sharing the text. The oracle
    recomputes from the full table, so index build + reload + the
    incremental semi-join are all hash-verified. Same
    negligible-collision stance as every hash-keyed dedup here."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions.hashing import hash64
    from ..stages.exchange import hash_grouped_map
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:12]
    idx_path = os.path.join("/tmp/graft_dedup_idx", tag,
                            "index.parquet")
    os.makedirs(os.path.dirname(idx_path), exist_ok=True)

    docs = _docs(sf_dir)

    def _old_hashes(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        t = tbl.filter(pa.array(ids % 5 != 0))
        h = hash64(t.column("text").to_pandas().fillna(""))
        p = pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return group_aggregate_table(p, ["h"], [("n", "sum")])

    index = hash_grouped_aggregate(
        docs.map_batches(_old_hashes, batch_format="pyarrow",
                         batch_size=None),
        ["h"],
        [("n", "sum")],
        num_buckets=8,
    )
    tmp = idx_path + ".tmp"
    idx_tbl = pa.concat_tables(
        [b.select(["h"]) for b in index.iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )]
    )
    pq.write_table(idx_tbl, tmp)
    os.replace(tmp, idx_path)

    # incremental pass: new docs' (hash, doc_id) + reloaded index
    # hashes, one co-grouped exchange — old TEXT never reappears
    def _new_hashes(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        t = tbl.filter(pa.array(ids % 5 == 0))
        h = hash64(t.column("text").to_pandas().fillna(""))
        return pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "doc_id": t.column("doc_id").cast(pa.int64()),
            }
        )

    def _idx_rows(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "h": tbl.column("h"),
                "doc_id": pa.array(
                    np.full(tbl.num_rows, -1, np.int64)
                ),
            }
        )

    union = docs.map_batches(
        _new_hashes, batch_format="pyarrow", batch_size=None
    ).union(
        rd.read_parquet(idx_path).map_batches(
            _idx_rows, batch_format="pyarrow", batch_size=None
        )
    )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("kept", pa.bool_())]
    )

    def _verdict(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy()
        new = d[d >= 0]
        if len(new) == 0:
            return out_schema.empty_table()
        in_index = (d < 0).any()
        keep = np.zeros(len(new), bool)
        if not in_index:
            keep[np.argmin(new)] = True
        return pa.table(
            {
                "doc_id": pa.array(np.sort(new).astype(np.int64)),
                "kept": pa.array(keep[np.argsort(new)]),
            }
        )

    return hash_grouped_map(
        union, "h", _verdict, num_partitions=8,
        empty_schema=out_schema,
    )


QUERIES["incremental_dedup"] = q_incremental_dedup
ORACLE_SQL["incremental_dedup"] = """
WITH newd AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  WHERE doc_id % 5 = 0
), oldt AS (
  SELECT DISTINCT text FROM documents WHERE doc_id % 5 <> 0
), r AS (
  SELECT n.doc_id, n.text,
    row_number() OVER (PARTITION BY n.text ORDER BY n.doc_id) AS rn,
    EXISTS (SELECT 1 FROM oldt o WHERE o.text = n.text) AS seen
  FROM newd n
)
SELECT doc_id, (rn = 1 AND NOT seen) AS kept FROM r
""".strip()


def q_dedup_savings(sf_dir: str):
    """Dedup ROI report: corpus bytes vs bytes surviving exact
    keep-first dedup, and the savings ratio — the number a curation
    run reports up. Per-batch (hash, bytes, min-doc) partials; the
    survivor byte sum never re-reads text (byte length rides the
    partial)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import hash64
    from ..stages.groupagg import (
        group_aggregate_table,
        hash_grouped_aggregate,
    )

    docs = _docs(sf_dir)

    def _partial(tbl: pa.Table) -> pa.Table:
        s = tbl.column("text").to_pandas().fillna("")
        h = hash64(s)
        nb = pc.binary_length(
            pc.fill_null(tbl.column("text"), "")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "h": pa.array(h, pa.uint64()),
                "n": pa.array(np.ones(tbl.num_rows, np.int64)),
                "bytes": pa.array(nb),
                "one_bytes": pa.array(nb),  # min == the text's size
            }
        )
        return group_aggregate_table(
            t, ["h"],
            [("n", "sum"), ("bytes", "sum"), ("one_bytes", "min")],
        )

    per_text = hash_grouped_aggregate(
        docs.map_batches(_partial, batch_format="pyarrow",
                         batch_size=None),
        ["h"],
        [("n", "sum"), ("bytes", "sum"), ("one_bytes", "min")],
        num_buckets=8,
    ).to_pandas()
    n_docs = int(per_text["n"].sum())
    n_surv = int(len(per_text))
    tb = int(per_text["bytes"].sum())
    sb = int(per_text["one_bytes"].sum())
    return pd.DataFrame(
        {
            "n_docs": [n_docs],
            "n_survivors": [n_surv],
            "total_bytes": [tb],
            "surviving_bytes": [sb],
            "savings": [float(tb - sb) / float(tb)],
        }
    )


QUERIES["dedup_savings"] = q_dedup_savings
ORACLE_SQL["dedup_savings"] = """
WITH g AS (
  SELECT text, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(strlen(coalesce(text, ''))) AS BIGINT) AS bytes,
    CAST(min(strlen(coalesce(text, ''))) AS BIGINT) AS one_bytes
  FROM documents GROUP BY text
)
SELECT CAST(sum(n) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_survivors,
  CAST(sum(bytes) AS BIGINT) AS total_bytes,
  CAST(sum(one_bytes) AS BIGINT) AS surviving_bytes,
  CAST(sum(bytes) - sum(one_bytes) AS DOUBLE)
    / CAST(sum(bytes) AS DOUBLE) AS savings
FROM g
""".strip()


# --- asymmetric containment (quote / inclusion detection) -----------------

_CT_OFFSET = 40_000_000
_CT_PREFIX_TOKENS = 40
_CT_K = 3


def q_containment_pairs(sf_dir: str):
    """ASYMMETRIC near-duplication: shingle containment
    |A∩B| / |A| per direction — the quote/inclusion signal symmetric
    Jaccard misses (a short doc quoted inside a long one scores low
    Jaccard but high containment). Planted quoting docs (first 40
    tokens of every doc_id % 17 == 0 doc + unique filler) keep both
    directions non-vacuous at every tier. The set arithmetic runs on
    the shingle-partitioned exchange (stages/dedup.py:
    jaccard_verify_distributed with counts); candidate pairs are
    given — at scale they come from the MinHash/LSH generators."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.dedup import jaccard_verify_distributed

    import pandas as pd

    ids = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).column("doc_id").to_numpy()
    planted = np.sort(ids[ids % 17 == 0]).astype(np.int64)
    pairs = [(int(d), int(d + _CT_OFFSET)) for d in planted]

    def pd_str(arr):
        return pd.Series(arr).astype(str).to_numpy()

    def _aug(tbl: pa.Table) -> pa.Table:
        d = tbl.column("doc_id").to_numpy()
        txt = tbl.column("text").to_pandas().fillna("")
        m = d % 17 == 0
        q = txt[m].str.split().str[:_CT_PREFIX_TOKENS].str.join(" ")
        qd = d[m]
        quote = (
            q
            + " qx" + pd_str(qd) + " qy" + pd_str(qd) + " qz"
            + pd_str(qd)
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([d, qd + _CT_OFFSET]).astype(
                        np.int64
                    )
                ),
                "text": pa.array(
                    np.concatenate(
                        [txt.to_numpy(), quote.to_numpy()]
                    ).astype(object),
                    pa.string(),
                ),
            }
        )

    aug = _docs(sf_dir).map_batches(_aug, batch_format="pyarrow")
    df = jaccard_verify_distributed(
        aug, pairs, shingle_k=_CT_K, num_partitions=16,
        return_counts=True,
    )
    df["containment_in_a"] = df["n_inter"].astype("float64") / df[
        "n_a"
    ].astype("float64")
    df["containment_in_b"] = df["n_inter"].astype("float64") / df[
        "n_b"
    ].astype("float64")
    return df[
        ["doc_a", "doc_b", "n_inter", "n_a", "n_b",
         "containment_in_a", "containment_in_b"]
    ].sort_values("doc_a").reset_index(drop=True)


_CT_GRAM = "||' '||".join(f"tk[pos+{j}]" for j in range(_CT_K))
ORACLE_SQL["containment_pairs"] = f"""
WITH aug AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_CT_OFFSET},
    array_to_string(
      list_filter(string_split_regex(text, '\\s+'),
                  x -> x <> '')[1:{_CT_PREFIX_TOKENS}], ' ')
    || ' qx' || doc_id || ' qy' || doc_id || ' qz' || doc_id
  FROM documents WHERE doc_id % 17 = 0
), tok AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM aug
), pos AS (
  SELECT doc_id, tk,
    unnest(range(1, len(tk) - {_CT_K - 2})) AS pos
  FROM tok
), sets AS (
  SELECT DISTINCT doc_id, {_CT_GRAM} AS g FROM pos
), sz AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sets GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(count(*) AS BIGINT) AS n_inter
  FROM sets a JOIN sets b
    ON a.g = b.g AND b.doc_id = a.doc_id + {_CT_OFFSET}
  WHERE a.doc_id % 17 = 0
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_inter,
  sa.n AS n_a, sb.n AS n_b,
  CAST(i.n_inter AS DOUBLE) / sa.n AS containment_in_a,
  CAST(i.n_inter AS DOUBLE) / sb.n AS containment_in_b
FROM inter i
JOIN sz sa ON sa.doc_id = i.doc_a
JOIN sz sb ON sb.doc_id = i.doc_b
""".strip()
QUERIES["containment_pairs"] = q_containment_pairs
