"""Dedup operators vs brute-force oracles on a constructed corpus."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.dedup import (
    _word_shingles,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)


def jaccard_verify(docs_ds, pairs, text_col="text", id_col="doc_id",
                   shingle_k=3):
    """TEST ORACLE ONLY (demoted from stages/dedup.py in round 3): exact
    word-k-gram Jaccard with candidate shingle sets gathered onto the
    driver — scale-unsafe by construction; production uses
    jaccard_verify_distributed."""
    import pyarrow.compute as pc

    wset = np.array(sorted({i for p in pairs for i in p}), dtype=np.int64)

    def _shingles(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.is_in(tbl.column(id_col), value_set=pa.array(wset)))
        texts = t.column(text_col).to_pandas()
        ids = t.column(id_col).to_numpy()
        row, sh = _word_shingles(texts, shingle_k)
        return pa.table(
            {
                id_col: pa.array(
                    ids[row] if len(row) else np.array([], np.int64)
                ),
                "shingle": pa.array(sh),
            }
        )

    tbl = pa.concat_tables(
        list(
            docs_ds.map_batches(
                _shingles, batch_format="pyarrow"
            ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
    )
    df = tbl.to_pandas().drop_duplicates()
    sets = {k: set(v) for k, v in df.groupby(id_col)["shingle"]}
    out = []
    for a, b in pairs:
        sa, sb = sets.get(a, set()), sets.get(b, set())
        union = len(sa | sb)
        out.append(
            {
                "doc_a": a,
                "doc_b": b,
                "jaccard": len(sa & sb) / union if union else 0.0,
            }
        )
    return pd.DataFrame(out)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a tall tree near the river bank in summer"
)


def _corpus() -> pa.Table:
    rng = np.random.default_rng(3)
    words = BASE.split()
    docs = [BASE, BASE]  # exact dup pair (0, 1)
    near = words.copy()
    near[5] = "leaps"  # one-word change → high jaccard (doc 2)
    docs.append(" ".join(near))
    for i in range(12):  # unrelated docs
        docs.append(
            " ".join(rng.choice(np.array(list("abcdefghijklmnop")), 20))
        )
    docs.append(BASE + " extra tail words appended here")  # doc 15
    return pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "text": docs}
    )


def _brute_jaccard(tbl: pa.Table, k: int = 3) -> dict:
    s = tbl.column("text").to_pandas()
    row, sh = _word_shingles(s, k)
    sets = {}
    for r, h in zip(row, sh):
        sets.setdefault(int(r), set()).add(int(h))
    out = {}
    for a, b in itertools.combinations(range(len(s)), 2):
        sa, sb = sets.get(a, set()), sets.get(b, set())
        u = len(sa | sb)
        out[(a, b)] = len(sa & sb) / u if u else 0.0
    return out


def test_exact_dedup():
    tbl = _corpus()
    got = exact_dedup(rd.from_arrow(tbl)).to_pandas()
    exp = (
        tbl.to_pandas().groupby("text", sort=False)["doc_id"].min().reset_index()
    )
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)[["doc_id", "text"]]
    pd.testing.assert_frame_equal(got[["doc_id", "text"]], exp)
    assert 1 not in got["doc_id"].to_numpy()  # dup of doc 0 removed


def test_minhash_finds_near_dups():
    tbl = _corpus()
    pairs = minhash_lsh_pairs(rd.from_arrow(tbl), threshold=0.5).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    brute = _brute_jaccard(tbl)
    # exact dup must be found with estimate 1.0
    assert (0, 1) in found
    est = pairs.set_index(["doc_a", "doc_b"])["est_jaccard"]
    assert est.loc[(0, 1)] == 1.0
    # strong near-dups (true J >= 0.7) must be found
    for (a, b), j in brute.items():
        if j >= 0.7:
            assert (a, b) in found, (a, b, j)
    # weak pairs (true J < 0.1) must not be reported
    for a, b in found:
        assert brute[(a, b)] >= 0.2, (a, b, brute[(a, b)])


def test_jaccard_verify_matches_brute():
    tbl = _corpus()
    brute = _brute_jaccard(tbl)
    cand = [(0, 1), (0, 2), (0, 15), (3, 4)]
    got = jaccard_verify(rd.from_arrow(tbl), cand)
    for _, r in got.iterrows():
        assert abs(r["jaccard"] - brute[(r["doc_a"], r["doc_b"])]) < 1e-12


def test_jaccard_verify_distributed_matches_driver():
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        jaccard_verify_distributed,
    )

    tbl = _corpus()
    cand = [(0, 1), (0, 2), (0, 15), (3, 4), (2, 15)]
    drv = jaccard_verify(rd.from_arrow(tbl), cand)
    dist = jaccard_verify_distributed(
        rd.from_arrow(tbl), cand, num_partitions=8
    )
    pd.testing.assert_frame_equal(
        drv.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        dist.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
    )


def test_simhash_near_dups():
    tbl = _corpus()
    # bands=16 → pigeonhole guarantees recall up to hamming 15 >= 10
    pairs = simhash_pairs(
        rd.from_arrow(tbl), max_hamming=10, bands=16
    ).to_pandas()
    found = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 1) in found  # identical docs, hamming 0
    ham = pairs.set_index(["doc_a", "doc_b"])["hamming"]
    assert ham.loc[(0, 1)] == 0
    if (0, 2) in found:
        assert ham.loc[(0, 2)] <= 10


def test_simhash_rejects_recall_gap_params():
    import pytest

    tbl = _corpus()
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(rd.from_arrow(tbl), max_hamming=8, bands=4)
    # the escape hatch keeps the old behavior, now explicit
    pairs = simhash_pairs(
        rd.from_arrow(tbl), max_hamming=8, bands=4, allow_partial_recall=True
    ).to_pandas()
    assert (0, 1) in set(zip(pairs["doc_a"], pairs["doc_b"]))


def test_large_bucket_pairs_still_surface():
    """A bucket larger than the old silent 2000-row cap must still
    yield its pairs (vectorized verify); a bucket above max_bucket is
    skipped (loudly, via log) rather than processed."""
    n = 2100  # one all-identical bucket > the old 2000 cap
    tbl = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()),
         "text": pa.array(["the same document text here"] * n, pa.string())}
    )
    pairs = minhash_lsh_pairs(
        rd.from_arrow(tbl), num_perm=16, bands=2, threshold=1.0
    ).to_pandas()
    assert len(pairs) == n * (n - 1) // 2  # every pair surfaces
    capped = minhash_lsh_pairs(
        rd.from_arrow(tbl), num_perm=16, bands=2, threshold=1.0,
        max_bucket=100,
    ).to_pandas()
    assert len(capped) == 0  # capped: skipped, logged in worker output


def test_distributed_cc_matches_union_find():
    """Distributed min-label-propagation CC == driver union-find, on a
    graph with a long path (forces multiple propagation rounds), a
    clique, and singletons."""
    import ray.data as rd_

    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        connected_components_labels,
        near_dup_survivors,
        near_dup_survivors_distributed,
    )

    # path 0-1-2-...-9 (diameter 9), clique {20,21,22}, pair {30,31}
    edges = [(i, i + 1) for i in range(9)]
    edges += [(20, 21), (20, 22), (21, 22), (30, 31)]
    pairs_df = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    pairs_tbl = pa.table(
        {
            "doc_a": pa.array(pairs_df["doc_a"], pa.int64()),
            "doc_b": pa.array(pairs_df["doc_b"], pa.int64()),
        }
    )
    labels = (
        connected_components_labels(rd_.from_arrow(pairs_tbl), num_partitions=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = {i: 0 for i in range(10)}
    exp.update({20: 20, 21: 20, 22: 20, 30: 30, 31: 30})
    got = dict(zip(labels["node"], labels["label"]))
    assert got == exp

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(35)), pa.int64()),
            "text": pa.array([f"d{i}" for i in range(35)], pa.string()),
        }
    )
    surv_d = (
        near_dup_survivors_distributed(
            rd_.from_arrow(docs), rd_.from_arrow(pairs_tbl), num_partitions=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    surv_u = (
        near_dup_survivors(rd_.from_arrow(docs), pairs_df)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(surv_d, surv_u)


def test_survivor_anti_join_bounded_driver_on_heavy_dup_corpus():
    """Round-4 fix (verdict #1): when >30% of the corpus is near-dup,
    the drop set is corpus-proportional and must NOT be driver-gathered
    and broadcast — the anti filter runs as a bloom-pruned distributed
    anti join, with driver-held bytes bounded by the constant bloom
    bitset. Output must be identical to the broadcast fast path."""
    import ray.data as rd_

    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        near_dup_survivors_distributed,
    )
    from dane_visual_feature_extraction_worker_ray.state import counters

    n = 3000
    # 40% of docs are dups: doc i ~ doc i+n for i < 1200 → drop set =
    # {n..n+1199}, 1200 ids of 2*n docs
    docs = pa.table(
        {
            "doc_id": pa.array(
                list(range(n)) + list(range(n, n + 1200)), pa.int64()
            ),
            "text": pa.array(
                [f"d{i}" for i in range(n + 1200)], pa.string()
            ),
        }
    )
    pairs = pa.table(
        {
            "doc_a": pa.array(list(range(1200)), pa.int64()),
            "doc_b": pa.array(list(range(n, n + 1200)), pa.int64()),
        }
    )
    counters.reset()
    # force the join path: cap far below the 1200*8-byte drop set
    join_out = (
        near_dup_survivors_distributed(
            rd_.from_arrow(docs).repartition(4),
            rd_.from_arrow(pairs),
            num_partitions=4,
            broadcast_max_bytes=1024,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    snap = counters.snapshot()
    assert snap["neardup_drop_ids_max"] == 1200
    # driver held the bloom bitset only — never the 9.6 KB drop array
    # (at web scale: 1 MiB constant vs tens of GB)
    assert snap["neardup_drop_driver_bytes_max"] == (1 << 23) >> 3
    bcast_out = (
        near_dup_survivors_distributed(
            rd_.from_arrow(docs).repartition(4),
            rd_.from_arrow(pairs),
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(join_out, bcast_out)
    assert len(join_out) == n  # survivors: all originals, no mutants
    assert set(join_out["doc_id"]) == set(range(n))


def test_near_dup_keep_best_policy_and_paths():
    """Keep-best survivor policy: per cluster the max-quality member
    wins (ties → min id); singletons untouched; bloom-join and
    broadcast paths produce identical output."""
    import ray.data as rd_

    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        near_dup_keep_best,
    )

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "quality": pa.array(
                [5, 9, 7, 1, 1, 4, 4, 2, 2, 2], pa.int64()
            ),
        }
    )
    # clusters: {0,1,2} (1 wins on quality 9), {5,6} (tie 4 → min id 5)
    pairs = pa.table(
        {
            "doc_a": pa.array([0, 1, 5], pa.int64()),
            "doc_b": pa.array([1, 2, 6], pa.int64()),
        }
    )
    exp = {1, 3, 4, 5, 7, 8, 9}
    for kwargs in ({}, {"broadcast_max_bytes": 1}):
        got = (
            near_dup_keep_best(
                rd_.from_arrow(docs),
                rd_.from_arrow(pairs),
                quality_col="quality",
                num_partitions=4,
                **kwargs,
            )
            .to_pandas()
        )
        assert set(got["doc_id"]) == exp, kwargs


def test_near_dup_survivors():
    import ray.data as rd_

    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        near_dup_survivors,
    )

    tbl = _corpus()
    pairs = minhash_lsh_pairs(rd.from_arrow(tbl), threshold=0.6).to_pandas()
    surv = near_dup_survivors(rd.from_arrow(tbl), pairs).to_pandas()
    kept = set(surv["doc_id"])
    # cluster {0,1,...}: only the min id survives
    assert 0 in kept and 1 not in kept
    # unrelated docs all survive
    for d in range(3, 15):
        assert d in kept
    # survivors + dropped = corpus
    dropped = set(tbl.column("doc_id").to_pylist()) - kept
    for d in dropped:
        assert any(
            (a in kept or b in kept)
            for a, b in zip(pairs["doc_a"], pairs["doc_b"])
            if a == d or b == d
        )


def test_simhash_oversized_bucket_recursion_full_recall():
    """Round-3 fix: with narrow band keys (bands=16 -> 4-bit keys) a
    modest corpus floods every bucket past max_bucket; oversized
    buckets must be recursively sub-banded — not skipped — so recall
    vs the brute-force hamming oracle stays exact while the recursion
    depth is within the pigeonhole guarantee."""
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        _popcount64,
        simhash_signatures,
    )

    rng = np.random.default_rng(3)
    words = [f"tok{i}" for i in range(400)]
    texts = [
        " ".join(rng.choice(words, size=30)) for _ in range(120)
    ]
    # planted near-identical pair: one word changed
    texts[1] = texts[0].replace("tok", "kot", 1)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    max_h, bands = 8, 16
    got = simhash_pairs(
        rd.from_arrow(tbl), max_hamming=max_h, bands=bands, max_bucket=6
    ).to_pandas()
    # brute-force oracle over the signatures
    sig = (
        simhash_signatures(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
    )
    h = sig["simhash"].to_numpy().astype(np.uint64)
    d = _popcount64(h[:, None] ^ h[None, :])
    iu, ju = np.triu_indices(len(h), k=1)
    exp = {
        (int(a), int(b)): int(dd)
        for a, b, dd in zip(iu[iu != ju], ju[iu != ju], d[iu, ju])
        if dd <= max_h
    }
    got_pairs = {
        (int(r["doc_a"]), int(r["doc_b"])): int(r["hamming"])
        for _, r in got.iterrows()
    }
    assert got_pairs == exp
    assert len(exp) >= 1  # the planted pair is in range


def test_simhash_cross_cluster_pairs_in_oversized_bucket():
    """Round-3.1 regression (code-review finding): two clusters of
    identical texts A and B with small hamming(A, B) — the oversized
    bucket's only splitting band is one the cross pairs DISAGREE on, so
    the old recursion lost all |A| x |B| cross pairs. The distinct-sig
    collapse + exact fallback must find every within- and cross-cluster
    pair."""
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        _popcount64,
        simhash_signatures,
    )

    words = ["alpha beta gamma delta epsilon zeta eta theta " * 3]
    text_a = words[0]
    text_b = words[0].replace("beta", "betb", 1)  # near-identical
    texts = [text_a] * 10 + [text_b] * 10
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    sig = (
        simhash_signatures(rd.from_arrow(tbl))
        .to_pandas().sort_values("doc_id")
    )
    h = sig["simhash"].to_numpy().astype(np.uint64)
    cross_d = int(_popcount64(np.array([h[0] ^ h[10]]))[0])
    max_h = max(cross_d, 1)
    assert max_h <= 15
    got = simhash_pairs(
        rd.from_arrow(tbl), max_hamming=max_h, bands=16, max_bucket=6
    ).to_pandas()
    found = set(zip(got["doc_a"], got["doc_b"]))
    # all 45+45 within-cluster pairs (hamming 0)
    for grp in (range(10), range(10, 20)):
        for a in grp:
            for b in grp:
                if a < b:
                    assert (a, b) in found, (a, b)
    # all 100 cross pairs (the ones the old recursion silently lost)
    for a in range(10):
        for b in range(10, 20):
            assert (a, b) in found, (a, b)
    ham = got.set_index(["doc_a", "doc_b"])["hamming"]
    assert ham.loc[(0, 1)] == 0
    assert ham.loc[(0, 10)] == cross_d


def test_contamination_flags_edges():
    """Decontamination stage: distinct-hit counting, zero-hit docs
    emitted, short-doc whole-text fallback, empty benchmark."""
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        _word_shingles,
        contamination_flags,
    )

    bench_texts = pd.Series(["the quick brown fox jumps over the lazy dog"])
    _, bsh = _word_shingles(bench_texts, 8)
    bench = np.unique(bsh)
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    # contains both benchmark 8-grams (9 words → 2)
                    "x the quick brown fox jumps over the lazy dog y",
                    "totally unrelated words here with no overlap at all",
                    "short doc",  # < 8 words: whole-text fallback, no hit
                    # the same contaminated 8-gram twice → still distinct
                    "the quick brown fox jumps over the lazy"
                    " padding the quick brown fox jumps over the lazy",
                ]
            ),
        }
    )
    out = (
        contamination_flags(rd.from_arrow(docs), bench, shingle_k=8)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert len(out) == 4  # every doc emitted
    assert out.loc[0, "n_hits"] == 2 and bool(out.loc[0, "contaminated"])
    assert out.loc[1, "n_hits"] == 0 and not out.loc[1, "contaminated"]
    assert out.loc[2, "n_hits"] == 0
    assert out.loc[3, "n_hits"] == 1  # duplicate gram counted once
    # empty benchmark: nothing flags
    out2 = (
        contamination_flags(
            rd.from_arrow(docs), np.empty(0, np.uint64), shingle_k=8
        ).to_pandas()
    )
    assert not out2["contaminated"].any()


# --------------------------------------------------------------------------
# edit-distance near-dup pairs


def _lev_ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    D = list(range(lb + 1))
    for i in range(1, la + 1):
        prev_diag, D[0] = D[0], i
        for j in range(1, lb + 1):
            prev_diag, D[j] = D[j], min(
                D[j] + 1, D[j - 1] + 1, prev_diag + (a[i - 1] != b[j - 1])
            )
    return D[lb]


def test_levenshtein_vec_matches_reference():
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        _levenshtein_pairs_vec,
    )

    rng = np.random.default_rng(11)
    strs = ["", "a", "ab", "kitten", "sitting", "flaw", "lawn", "résumé",
            "resume", "ζωή", "zzzz"]
    for _ in range(80):
        strs.append(
            "".join(rng.choice(list("abcd")) for _ in range(rng.integers(0, 14)))
        )
    L = 16
    n = len(strs)
    cp = np.zeros((n, L), np.uint32)
    lens = np.zeros(n, np.int64)
    for i, t in enumerate(strs):
        u = np.frombuffer(t.encode("utf-32-le"), np.uint32)
        lens[i] = len(u)
        cp[i, : len(u)] = u
    ia, ib = np.triu_indices(n, k=1)
    got = _levenshtein_pairs_vec(cp, lens, ia, ib)
    exp = np.array([_lev_ref(strs[x], strs[y]) for x, y in zip(ia, ib)])
    assert (got == exp).all()


def test_edit_distance_pairs_finds_planted_jitter():
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        edit_distance_pairs,
    )

    base = [
        (0, "the quick brown fox jumps over the lazy dog", "s1"),
        (1, "the quick brown fox jumps over the lazy dot", "s1"),  # 1 edit
        (2, "an entirely different document about parquet files", "s1"),
        (3, "the quick brown fox jumps over the lazy dog", "s2"),  # cross-src
        (4, "streaming execution with backpressure and spilling", "s2"),
        (5, "streaming execution with backpressure and spilling!", "s2"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in base], pa.int64()),
                "text": pa.array([r[1] for r in base]),
                "source": pa.array([r[2] for r in base]),
            }
        )
    )
    out = edit_distance_pairs(ds, max_dist=2, prefix_len=60).to_pandas()
    got = {(a, b): d for a, b, d in zip(out.doc_a, out.doc_b, out.dist)}
    # same-source jitter pairs surface with exact distances
    assert got[(0, 1)] == 1
    assert got[(4, 5)] == 1
    # identical text in DIFFERENT sources is outside the candidate
    # policy (documented partitioning assumption)
    assert (0, 3) not in got and (1, 3) not in got
    assert all(d <= 2 for d in got.values())
    assert (2, 0) not in got and (0, 2) not in got


def test_cc_pointer_jumping_logarithmic_rounds():
    """Round-4 fix (verdict #4): a 10k-node duplicate CHAIN must
    converge in O(log n) rounds (pointer jumping interleaved with the
    min propagation), not O(diameter) — pure propagation would blow the
    64-round cap on this fixture. Round count is read from the
    ``cc_rounds`` lineage counter; labels must be exactly the chain
    minimum."""
    import math

    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        connected_components_labels,
    )
    from dane_visual_feature_extraction_worker_ray.state import counters

    n = 10_000
    pairs = pa.table(
        {
            "doc_a": pa.array(list(range(n - 1)), pa.int64()),
            "doc_b": pa.array(list(range(1, n)), pa.int64()),
        }
    )
    counters.reset()
    labels = (
        connected_components_labels(rd.from_arrow(pairs), num_partitions=4)
        .to_pandas()
    )
    assert len(labels) == n
    assert (labels["label"] == 0).all()
    rounds = counters.snapshot()["cc_rounds"]
    assert rounds <= math.ceil(math.log2(n)) + 2, rounds


def test_edit_distance_pairs_survives_nul_codepoint():
    """A real U+0000 codepoint in the text is data, not padding: the
    histogram prefilter masks padding by POSITION (round-4 advice fix —
    a value-based mask desynced the rows/values arrays and crashed the
    partition kernel)."""
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        edit_distance_pairs,
    )

    base = [
        (0, "abc\x00def and a longer tail here", "s1"),
        (1, "abc\x00dxf and a longer tail here", "s1"),  # 1 edit
        (2, "completely unrelated document body", "s1"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in base], pa.int64()),
                "text": pa.array([r[1] for r in base]),
                "source": pa.array([r[2] for r in base]),
            }
        )
    )
    out = edit_distance_pairs(ds, max_dist=2, prefix_len=60).to_pandas()
    got = {(a, b): d for a, b, d in zip(out.doc_a, out.doc_b, out.dist)}
    assert got == {(0, 1): 1}


def _jitter_corpus(n: int, hot_frac: float, seed: int = 7):
    """Deterministic corpus: random letter strings (varied lengths),
    ``hot_frac`` of docs in one source, plus planted one-edit mutants
    (doc_id + 100000) for every 10th doc."""
    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    ids, texts, srcs = [], [], []
    for i in range(n):
        length = int(rng.integers(20, 60))
        t = "".join(rng.choice(letters, size=length))
        ids.append(i)
        texts.append(t)
        srcs.append("hot" if rng.random() < hot_frac else f"s{i % 5}")
    for i in range(0, n, 10):  # planted one-edit mutants, same source
        ids.append(100_000 + i)
        texts.append("Q" + texts[i][1:])
        srcs.append(srcs[i])
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
            "source": pa.array(srcs),
        }
    )


def _pairs_set(df):
    return {(a, b, d) for a, b, d in zip(df.doc_a, df.doc_b, df.dist)}


def test_edit_distance_bucketed_matches_source_strategy():
    """A/B: the PassJoin sub-bucketed path (round-4, verdict #3) must
    produce the identical pair set as the per-source O(n²) reference
    strategy, including all planted one-edit mutants."""
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        edit_distance_pairs,
    )

    tbl = _jitter_corpus(n=300, hot_frac=0.3)
    got_b = edit_distance_pairs(
        rd.from_arrow(tbl).repartition(3), max_dist=2, prefix_len=60,
        strategy="bucketed",
    ).to_pandas()
    got_s = edit_distance_pairs(
        rd.from_arrow(tbl).repartition(3), max_dist=2, prefix_len=60,
        strategy="source",
    ).to_pandas()
    assert _pairs_set(got_b) == _pairs_set(got_s)
    # every planted mutant surfaced with dist 1
    got = _pairs_set(got_b)
    for i in range(0, 300, 10):
        assert (i, 100_000 + i, 1) in got


def test_edit_distance_hot_source_bounded_buckets():
    """One source holding ~90% of the corpus must NOT produce a
    quadratic candidate set in any single bucket: per-bucket pair
    counts stay bounded (lineage counter), capped buckets stay zero,
    and the result still matches the O(n²) reference strategy."""
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        edit_distance_pairs,
    )
    from dane_visual_feature_extraction_worker_ray.state import counters

    tbl = _jitter_corpus(n=600, hot_frac=0.9)
    counters.reset()
    got_b = edit_distance_pairs(
        rd.from_arrow(tbl).repartition(4), max_dist=2, prefix_len=60,
        strategy="bucketed",
    ).to_pandas()
    snap = counters.snapshot()
    n_hot = 600 * 0.9 + 60
    # the old per-source scan would hold ~n_hot²/2 ≈ 180k pairs in one
    # task; no sub-bucket may come anywhere near that
    assert snap.get("editdist_bucket_pairs_max", 0) < n_hot**2 / 20
    assert snap.get("editdist_capped_buckets", 0) == 0
    got_s = edit_distance_pairs(
        rd.from_arrow(tbl).repartition(4), max_dist=2, prefix_len=60,
        strategy="source",
    ).to_pandas()
    assert _pairs_set(got_b) == _pairs_set(got_s)


def test_connected_components_empty_and_chain(ray_session):
    """Empty pair set: typed-empty labels, survivors = whole corpus
    (regression for the 0-column empty-block path); a 4-chain plus a
    disjoint pair converge to min labels across >1 round."""
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        connected_components_labels,
        near_dup_survivors_distributed,
    )

    empty = rd.from_arrow(
        pa.table(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64())}
        )
    )
    assert connected_components_labels(empty, num_partitions=4).count() == 0
    docs = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1, 2, 3], pa.int64()),
             "text": pa.array(["a", "b", "c"])}
        )
    )
    out = near_dup_survivors_distributed(docs, empty).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]
    chain = rd.from_arrow(
        pa.table(
            {"doc_a": pa.array([1, 2, 3, 10], pa.int64()),
             "doc_b": pa.array([2, 3, 4, 11], pa.int64())}
        )
    )
    lab = (
        connected_components_labels(chain, num_partitions=4)
        .to_pandas().set_index("node")["label"]
    )
    assert dict(lab) == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_duplicate_ngram_spans_brute_force():
    """duplicate_ngram_spans == a per-doc brute-force span oracle on a
    corpus exercising every edge: cross-doc dups, within-doc repeats,
    multiple islands separated by gaps > k, docs shorter than k, and a
    doc that is one solid duplicated block."""
    import ray.data as rd
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        duplicate_ngram_spans,
    )

    k = 3
    dup = "x1 x2 x3"          # 3 tokens = one k-gram, planted widely
    docs = {
        1: f"{dup} a b c d e f g h {dup} tail1",   # two islands, gap > k
        2: f"lead2 {dup} mid2a mid2b {dup}",       # gap == 4 > k? pos 1 and 6 -> gap 5 > 3: two islands
        3: f"{dup} {dup}",                          # within-doc adjacent: one island
        4: "unique4 tokens4 only4 here4 now4",      # no dups
        5: "short doc",                              # < k tokens
        6: f"{dup}",                                 # exactly k tokens, one dup gram
        7: f"p q {dup} r s",                        # overlapping boundary grams unique
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        )
    )
    got = (
        duplicate_ngram_spans(ds, k=k, num_partitions=4)
        .to_pandas().set_index("doc_id").sort_index()
    )

    # brute force: global gram counts, then per-doc island merge
    from collections import Counter

    grams = {}
    cnt = Counter()
    for d, t in docs.items():
        tk = t.split()
        gs = [tuple(tk[i : i + k]) for i in range(len(tk) - k + 1)]
        grams[d] = gs
        cnt.update(gs)
    exp = {}
    for d, gs in grams.items():
        pos = [i for i, g in enumerate(gs) if cnt[g] > 1]
        if not pos:
            continue
        spans = []
        for p in pos:
            if spans and p - spans[-1][1] <= k:
                spans[-1] = (spans[-1][0], p)
            else:
                spans.append((p, p))
        exp[d] = (
            len(pos),
            len(spans),
            sum(e - s + k for s, e in spans),
        )
    assert sorted(got.index) == sorted(exp)
    for d, (ng, ns, dt) in exp.items():
        assert (
            got.loc[d, "n_dup_grams"],
            got.loc[d, "n_spans"],
            got.loc[d, "dup_tokens"],
        ) == (ng, ns, dt), d
    # sanity on the fixture itself: multi-island and solid-block cases
    assert exp[1][1] == 2 and exp[3][1] == 1 and 5 not in exp and 4 not in exp


def test_remove_duplicate_spans_consistency():
    """remove_duplicate_spans agrees with duplicate_ngram_spans
    (n_removed == dup_tokens), keeps non-dup docs byte-identical under
    the canonical single-space rebuild, and clears fully-covered
    docs."""
    import ray.data as rd
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        duplicate_ngram_spans,
        remove_duplicate_spans,
    )

    k = 3
    dup = "x1 x2 x3"
    docs = {
        1: f"{dup} a b c d e f g h {dup} tail1",
        2: f"lead2 {dup} mid2a mid2b {dup}",
        3: f"{dup} {dup}",
        4: "unique4 tokens4 only4 here4 now4",
        5: "short doc",
        6: f"{dup}",
        7: f"p q {dup} r s",
        8: "",
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        )
    )
    clean = (
        remove_duplicate_spans(ds, k=k, num_partitions=4)
        .to_pandas().set_index("doc_id").sort_index()
    )
    marks = (
        duplicate_ngram_spans(ds, k=k, num_partitions=4)
        .to_pandas().set_index("doc_id")
    )
    assert sorted(clean.index) == sorted(docs)  # every doc emitted
    for d in docs:
        toks = docs[d].split()
        assert clean.loc[d, "n_kept"] + clean.loc[d, "n_removed"] == len(
            toks
        )
        if d in marks.index:
            assert clean.loc[d, "n_removed"] == marks.loc[d, "dup_tokens"]
        else:
            assert clean.loc[d, "n_removed"] == 0
            assert clean.loc[d, "clean_text"] == " ".join(toks)
    assert clean.loc[3, "clean_text"] == ""  # fully duplicated doc
    assert clean.loc[1, "clean_text"] == "a b c d e f g h tail1"


def test_graph_components_sparse_ids(ray_session, tmp_path):
    """q_graph_components must not assume contiguous doc_ids: an edge
    (d, d-1) exists only when BOTH ids are present — the bucketed
    consecutive-id check is the distributed existence test."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.dedup_queries import (
        _CC_BREAK,
        q_graph_components,
    )

    # runs [0..5], {8}, [59..63] (63>61: run crosses a break multiple),
    # plus an isolated id 200 (no neighbor -> excluded from output)
    ids = list(range(6)) + [8] + list(range(59, 64)) + [200]
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(["x"] * len(ids))}),
        tmp_path / "documents.parquet",
    )
    out = (
        q_graph_components(str(tmp_path))
        .to_pandas()
        .set_index("node")["label"]
        .sort_index()
    )
    # expected components: [0..5] -> 0; [59,60] -> 59 (61 is a break
    # multiple so edge (61,60) is absent); [61..63] -> 61; 8 and 200
    # isolated -> absent
    exp = {}
    for n in range(6):
        exp[n] = 0
    exp[59] = exp[60] = 59
    for n in (61, 62, 63):
        exp[n] = 61
    assert _CC_BREAK == 61
    assert out.to_dict() == exp


def test_paragraph_dedup_brute_force(ray_session):
    """Keep-first chunk dedup vs a per-doc Python oracle, including
    empty docs, intra-doc repeats, and cross-doc duplicates."""
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        paragraph_dedup,
    )

    W = 3
    docs = {
        0: "a b c a b c x",      # chunk0 == chunk1's first 3? chunks: "a b c","a b c","x"
        1: "a b c d e",          # chunk "a b c" duplicates doc0 chunk0
        2: "",                   # empty doc
        3: "x",                  # single-token chunk; dup of doc0's tail chunk
        4: "d e",                # unique
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        )
    ).repartition(3)
    out = (
        paragraph_dedup(ds, chunk_w=W, num_partitions=4)
        .to_pandas().set_index("doc_id").sort_index()
    )

    # python oracle
    chunks = {}  # chunk text -> first (doc, ci)
    rows = {}
    for d in sorted(docs):
        toks = docs[d].split()
        cs = [" ".join(toks[i:i + W]) for i in range(0, len(toks), W)]
        kept = []
        nrem = 0
        for ci, c in enumerate(cs):
            if c in chunks:
                nrem += 1
            else:
                chunks[c] = (d, ci)
                kept.append(c)
        rows[d] = (" ".join(kept), len(cs) - nrem, nrem)

    assert len(out) == len(docs)
    for d, (clean, nk, nr) in rows.items():
        assert out.loc[d, "clean_text"] == clean, d
        assert out.loc[d, "n_kept_chunks"] == nk, d
        assert out.loc[d, "n_removed_chunks"] == nr, d


def test_paragraph_dedup_wire_economy(ray_session):
    """Scale property, asserted: paragraph text crosses the exchange
    ONCE (the doc_id rewrite); phase 1 ships only ~20 B/paragraph
    hashes. If chunk TEXT ever leaked into the gram exchange the
    byte counter would roughly double."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        paragraph_dedup,
    )
    from dane_visual_feature_extraction_worker_ray.state import counters

    rng = np.random.default_rng(11)
    words = np.array([f"w{i:03d}" for i in range(400)])
    texts = [
        " ".join(rng.choice(words, size=330))
        for _ in range(500)
    ]
    text_bytes = sum(len(t) for t in texts)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(500), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(4)
    before = counters.snapshot().get("exchange_bytes", 0)
    out = paragraph_dedup(ds, chunk_w=10, num_partitions=8)
    n = out.count()
    after = counters.snapshot().get("exchange_bytes", 0)
    assert n == 500
    delta = after - before
    # one text move (~1x) + 20 B/paragraph hashes (~0.35x here) +
    # IPC framing; 2x would mean text rode the gram exchange too
    assert delta < 2.0 * text_bytes, (delta, text_bytes)
    assert delta > 0.8 * text_bytes, (delta, text_bytes)
