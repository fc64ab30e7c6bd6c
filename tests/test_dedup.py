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
    jaccard_verify,
    minhash_lsh_pairs,
    simhash_pairs,
)

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
