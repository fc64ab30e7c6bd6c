"""Distributed k-means: seed determinism, Lloyd parity vs a
single-process numpy reference, assignment tie-break, run-to-run
determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.clustering import (
    kmeans_assign,
    kmeans_cluster_sizes,
    kmeans_fit,
)


def _emb_table(n=300, d=16, seed=11) -> tuple[pa.Table, np.ndarray]:
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
        }
    )
    return tbl, m.astype(np.float64)


def _reference_kmeans(m: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Single-process Lloyd with the same seed rule (k smallest ids)."""
    C = m[:k].copy()
    for _ in range(iters):
        d2 = (
            (m * m).sum(1)[:, None]
            + (C * C).sum(1)[None, :]
            - 2.0 * (m @ C.T)
        )
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            mem = m[assign == c]
            if len(mem):
                C[c] = mem.mean(axis=0)
    return C


def test_seed_centroids_are_smallest_ids():
    tbl, m = _emb_table()
    ds = rd.from_arrow(tbl).repartition(4)
    C = kmeans_fit(ds, k=5, iters=0)
    np.testing.assert_array_equal(C, m[:5])


def test_lloyd_matches_numpy_reference():
    tbl, m = _emb_table()
    ds = rd.from_arrow(tbl).repartition(4)
    C = kmeans_fit(ds, k=6, iters=4)
    ref = _reference_kmeans(m, k=6, iters=4)
    # distributed partial sums vs one global mean: allclose, not exact
    np.testing.assert_allclose(C, ref, rtol=1e-9, atol=1e-12)


def test_assignment_matches_reference_and_is_deterministic():
    tbl, m = _emb_table()
    ds = rd.from_arrow(tbl).repartition(4)
    C = kmeans_fit(ds, k=6, iters=3)
    a1 = (
        kmeans_assign(ds, C)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    a2 = (
        kmeans_assign(rd.from_arrow(tbl).repartition(7), C)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a1.equals(a2)  # block-split independent
    ref = _reference_kmeans(m, k=6, iters=3)
    d = np.round(
        np.sqrt(
            np.maximum(
                (m * m).sum(1)[:, None]
                + (ref * ref).sum(1)[None, :]
                - 2.0 * (m @ ref.T),
                0,
            )
        ),
        4,
    )
    np.testing.assert_array_equal(
        a1["cluster"].to_numpy(), np.argmin(d, axis=1)
    )


def test_assignment_tie_breaks_to_smaller_cluster():
    # two identical centroids -> every row is equidistant -> cluster 0
    m = np.ones((4, 3), np.float32) * np.arange(4)[:, None]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
        }
    )
    C = np.stack([m[0].astype(np.float64), m[0].astype(np.float64)])
    out = kmeans_assign(rd.from_arrow(tbl), C).to_pandas()
    assert (out["cluster"] == 0).all()


def test_cluster_sizes_cover_corpus():
    tbl, _ = _emb_table(n=257)
    sizes = (
        kmeans_cluster_sizes(rd.from_arrow(tbl).repartition(3), k=4, iters=2)
        .to_pandas()
        .sort_values("cluster")
    )
    assert sizes["n_vecs"].sum() == 257
    assert set(sizes["cluster"]).issubset(set(range(4)))


def test_semantic_dedup_planted_groups(ray_session):
    """Planted near-identical groups are pruned to their min id
    (transitively); distinct vectors survive; drops point at their
    group representative."""
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.clustering import (
        semantic_dedup,
    )

    rng = np.random.default_rng(17)
    base = rng.standard_normal((40, 16)).astype(np.float32) * 3
    rows = [base[i] for i in range(40)]
    # group A: ids 40,41,42 ~ base[0]; group B: ids 43,44 ~ base[1]
    for i, proto in [(40, 0), (41, 0), (42, 0), (43, 1), (44, 1)]:
        rows.append(
            (base[proto] + 0.001 * rng.standard_normal(16)).astype(
                np.float32
            )
        )
    m = np.stack(rows)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(m)), pa.int64()),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    drops = (
        semantic_dedup(ds, k=4, iters=4, threshold=0.95)
        .to_pandas()
        .sort_values("vec_id")
    )
    # exactly the non-min group members drop, toward the group min
    assert drops["vec_id"].tolist() == [40, 41, 42, 43, 44]
    assert drops["kept_id"].tolist() == [0, 0, 0, 1, 1]


def test_semantic_dedup_transitive_chain(ray_session):
    """A chain a~b, b~c where a and c are NOT directly similar must
    still collapse to one survivor (true connected components, not a
    greedy parent walk)."""
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.clustering import (
        semantic_dedup,
    )

    # unit vectors at angles 0deg, 20deg, 40deg in 2D, embedded in 8D:
    # cos(20deg)=0.94 >= 0.9, cos(40deg)=0.766 < 0.9 -> chain 0~1~2
    ang = np.deg2rad([0.0, 20.0, 40.0])
    m = np.zeros((3, 8), np.float32)
    m[:, 0] = np.cos(ang)
    m[:, 1] = np.sin(ang)
    # pad with mutually-orthogonal distinct vectors (cosine 0, never
    # near-dups) so k-means has signal
    far = np.zeros((5, 8), np.float32)
    for i in range(5):
        far[i, 3 + i] = 10.0 * (i + 1)
    allm = np.vstack([m, far])
    t = pa.table(
        {
            "vec_id": pa.array(range(len(allm)), pa.int64()),
            "embedding": pa.array(list(allm), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    drops = (
        semantic_dedup(ds, k=2, iters=3, threshold=0.9)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert drops["vec_id"].tolist() == [1, 2]
    assert (drops["kept_id"] == 0).all()
