"""Byte-pair-encoding tokenizer training and segmentation.

The tokenizer-training step of an LLM data pipeline, in the
scale-correct two-level shape:

* the CORPUS-scale work is one streaming word-count reduction
  (per-batch partials → word-hash exchange → exact ``(word, n)``),
  exactly the partial-then-final aggregate every other operator uses;
* the merge LOOP then runs over that BOUNDED vocabulary table (distinct
  words, not corpus rows — the same bounded-materialization argument as
  the CUBE rollup). Standard BPE (Sennrich et al. 2016) trains on the
  vocab+counts multiset, so this is the textbook algorithm, not a
  shortcut; a corpus-resident variant would re-scan 100 TB once per
  merge for identical results.
* segmentation back over the corpus is a STATEFUL actor-pool stage:
  the learned merge ranks load once per actor in ``__init__``; inside a
  batch each DISTINCT word is segmented once and broadcast to its
  occurrences (words repeat heavily — the cache turns the per-word loop
  into a per-distinct-word loop).

Determinism: merge selection breaks count ties by (left, right)
lexicographic order; greedy lowest-rank-first segmentation with
leftmost-first overlap resolution — both fixed, so training is
bit-reproducible across partitionings (pair counts are integer sums).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EOW = "</w>"  # end-of-word marker, per the original BPE formulation


def word_counts(docs_ds, text_col: str = "text", num_partitions: int = 16):
    """Exact ``(word, n)`` over whitespace tokens — the corpus-scale
    pass (mergeable per-batch partials, one word-hash exchange)."""
    from .groupagg import group_aggregate_table, hash_grouped_aggregate

    def _partial(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_col).to_pandas().fillna("")
        ex = texts.str.split().explode()
        toks = ex[ex.notna()]
        if not len(toks):
            return pa.table(
                {"word": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        vc = toks.value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    return hash_grouped_aggregate(
        docs_ds.map_batches(_partial, batch_format="pyarrow",
                            batch_size=None),
        ["word"],
        [("n", "sum")],
        num_buckets=num_partitions,
    )


def _segment(word: str, ranks: dict) -> list[str]:
    """Greedy BPE segmentation: repeatedly merge the LOWEST-rank
    adjacent pair, leftmost first on rank ties (the standard greedy
    inference rule matching how training consumed pairs)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def learn_bpe(
    docs_ds,
    num_merges: int,
    text_col: str = "text",
    num_partitions: int = 16,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges. Returns the merge table
    ``(rank, left, right, merged, pair_count)`` — ``rank`` is the merge
    order (0-based), ``pair_count`` the corpus-weighted frequency that
    won the rank.

    The vocab gather is bounded by DISTINCT words (documented
    scale assumption: vocab ≪ corpus; at 100 TB a distinct-word table
    is millions of rows — gatherable — while the corpus is not). The
    merge loop is pure python over that table with integer counts, so
    results are independent of partitioning and batch order.
    """
    import ray

    wc = word_counts(docs_ds, text_col, num_partitions)
    parts = [t for t in ray.get(wc.to_arrow_refs()) if t.num_rows > 0]
    schema = pa.schema(
        [
            ("rank", pa.int64()),
            ("left", pa.string()),
            ("right", pa.string()),
            ("merged", pa.string()),
            ("pair_count", pa.int64()),
        ]
    )
    if not parts:
        return schema.empty_table()
    vocab_t = pa.concat_tables(parts)  # bounded: distinct words
    words = vocab_t.column("word").to_pylist()
    counts = vocab_t.column("n").to_numpy(zero_copy_only=False)
    seqs = [list(w) + [_EOW] for w in words]

    out = {"rank": [], "left": [], "right": [], "merged": [],
           "pair_count": []}
    for rank in range(num_merges):
        pair_n: dict = {}
        for syms, n in zip(seqs, counts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_n[p] = pair_n.get(p, 0) + int(n)
        if not pair_n:
            break
        # deterministic: max count, ties by (left, right) lexicographic
        (left, right), best = min(
            pair_n.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merged = left + right
        new_seqs = []
        for syms in seqs:
            i = 0
            cur = []
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    cur.append(merged)  # leftmost-first greedy
                    i += 2
                else:
                    cur.append(syms[i])
                    i += 1
            new_seqs.append(cur)
        seqs = new_seqs
        out["rank"].append(rank)
        out["left"].append(left)
        out["right"].append(right)
        out["merged"].append(merged)
        out["pair_count"].append(best)
    return pa.table(
        {
            "rank": pa.array(out["rank"], pa.int64()),
            "left": pa.array(out["left"], pa.string()),
            "right": pa.array(out["right"], pa.string()),
            "merged": pa.array(out["merged"], pa.string()),
            "pair_count": pa.array(out["pair_count"], pa.int64()),
        }
    )


class BpeSegmenter:
    """Actor-pool segmentation stage: merge ranks load once per actor
    (``__init__``), each batch segments its DISTINCT words once.
    Emits per-doc BPE statistics (piece and char counts) — the
    compression-ratio signal tokenizer evaluation uses."""

    def __init__(self, merges: pa.Table):
        self.ranks = {
            (l, r): k
            for k, l, r in zip(
                merges.column("rank").to_pylist(),
                merges.column("left").to_pylist(),
                merges.column("right").to_pylist(),
            )
        }

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pandas().fillna("")
        ex = texts.str.split().explode()
        mask = ex.notna()
        rows = ex.index.to_numpy()[mask.to_numpy()].astype(np.int64)
        toks = ex[mask].to_numpy()
        n = tbl.num_rows
        uniq, inv = np.unique(toks, return_inverse=True)
        pieces_u = np.array(
            [len(_segment(w, self.ranks)) for w in uniq], np.int64
        )
        n_pieces = np.zeros(n, np.int64)
        np.add.at(n_pieces, rows, pieces_u[inv])
        n_words = np.bincount(rows, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_words": pa.array(n_words),
                "n_pieces": pa.array(n_pieces),
            }
        )


def bpe_doc_stats(
    docs_ds,
    merges: pa.Table,
    concurrency=(1, 8),
):
    """Segment the corpus with the learned merges (actor pool) and
    return per-doc ``(doc_id, n_words, n_pieces)``."""
    return docs_ds.map_batches(
        BpeSegmenter,
        fn_constructor_args=(merges,),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
