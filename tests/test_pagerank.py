"""PageRank stage: fixed-point recurrence vs a python-int brute force,
co-occurrence edge construction, isolated/dangling nodes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.pagerank import (
    cooccurrence_edges,
    pagerank_fixed_point,
)

SCALE = 10**12
BASE = (SCALE * 15) // 100


def _brute(edges, nodes, iters):
    """Same recurrence in pure python ints (exact)."""
    ow = {}
    for s, _, w in edges:
        ow[s] = ow.get(s, 0) + w
    r = {n: SCALE for n in nodes}
    for _ in range(iters):
        nxt = {n: BASE for n in nodes}
        for s, d, w in edges:
            nxt[d] += ((85 * (r[s] // ow[s])) // 100) * w
        r = nxt
    return r


def _run(edges, nodes, iters=3):
    e = pa.table(
        {
            "src": pa.array([x[0] for x in edges], pa.int64()),
            "dst": pa.array([x[1] for x in edges], pa.int64()),
            "w": pa.array([x[2] for x in edges], pa.int64()),
        }
    )
    n = pa.table({"node": pa.array(nodes, pa.int64())})
    out = pagerank_fixed_point(
        rd.from_arrow(e), rd.from_arrow(n), iters=iters, num_partitions=4
    ).to_pandas()
    return dict(zip(out["node"], out["rank"]))


def test_pagerank_matches_pure_python_recurrence(ray_session):
    rng = np.random.default_rng(3)
    nodes = list(range(20))
    edges = []
    seen = set()
    for _ in range(60):
        s, d = int(rng.integers(0, 20)), int(rng.integers(0, 20))
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            edges.append((s, d, int(rng.integers(1, 5))))
    got = _run(edges, nodes)
    exp = _brute(edges, nodes, 3)
    assert got == exp


def test_pagerank_isolated_and_dangling(ray_session):
    # 0 -> 1 -> 2 (2 dangles), 3 isolated
    edges = [(0, 1, 1), (1, 2, 1)]
    nodes = [0, 1, 2, 3]
    got = _run(edges, nodes, iters=2)
    exp = _brute(edges, nodes, 2)
    assert got == exp
    # isolated node settles at base; dangling node keeps receiving
    assert got[3] == BASE
    assert got[2] > got[0] == BASE


def test_pagerank_parallel_edges_presummed(ray_session):
    # duplicate (src,dst) rows must sum into one weighted edge
    edges = [(0, 1, 1), (0, 1, 2), (1, 0, 3)]
    got = _run(edges, [0, 1], iters=3)
    exp = _brute([(0, 1, 3), (1, 0, 3)], [0, 1], 3)
    assert got == exp


def test_cooccurrence_edges_distinct_and_weighted(ray_session):
    # group 10: items {1,2,2,3} -> distinct {1,2,3} -> 6 directed pairs
    # group 11: items {1,2}     -> 2 pairs; (1,2)/(2,1) weight becomes 2
    # group 12: single item     -> no pairs
    t = pa.table(
        {
            "g": pa.array([10, 10, 10, 10, 11, 11, 12], pa.int64()),
            "item": pa.array([1, 2, 2, 3, 1, 2, 9], pa.int64()),
        }
    )
    out = (
        cooccurrence_edges(rd.from_arrow(t), "g", "item", num_partitions=4)
        .to_pandas()
    )
    got = {(s, d): w for s, d, w in zip(out["src"], out["dst"], out["w"])}
    assert got == {
        (1, 2): 2, (2, 1): 2, (1, 3): 1, (3, 1): 1, (2, 3): 1, (3, 2): 1,
    }


def test_triangle_count_known_graphs(ray_session):
    from dane_visual_feature_extraction_worker_ray.stages.pagerank import (
        triangle_count,
    )

    def run(pairs):
        t = pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.int64()),
                "dst": pa.array([p[1] for p in pairs], pa.int64()),
                "w": pa.array(np.ones(len(pairs), np.int64)),
            }
        )
        out = triangle_count(rd.from_arrow(t), num_partitions=4).to_pandas()
        return int(out["n_triangles"].iloc[0])

    # K4: 4 triangles — given as DIRECTED duplicates + a self loop,
    # which canonicalization must collapse/drop
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    assert run(k4 + [(2, 2)]) == 4
    # path 0-1-2-3: none
    assert run([(0, 1), (1, 2), (2, 3)]) == 0
    # two triangles sharing an edge: 0-1-2 and 1-2-3
    assert run([(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]) == 2


def test_triangle_count_matches_brute_random(ray_session):
    from dane_visual_feature_extraction_worker_ray.stages.pagerank import (
        triangle_count,
    )

    rng = np.random.default_rng(17)
    n = 30
    pairs = set()
    for _ in range(140):
        a, b = int(rng.integers(0, n)), int(rng.integers(0, n))
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    adj = np.zeros((n, n), bool)
    for a, b in pairs:
        adj[a, b] = adj[b, a] = True
    brute = int(np.trace(adj.astype(np.int64) @ adj @ adj) // 6)
    t = pa.table(
        {
            "src": pa.array([p[0] for p in pairs], pa.int64()),
            "dst": pa.array([p[1] for p in pairs], pa.int64()),
            "w": pa.array(np.ones(len(pairs), np.int64)),
        }
    )
    out = triangle_count(rd.from_arrow(t), num_partitions=4).to_pandas()
    assert int(out["n_triangles"].iloc[0]) == brute


def test_pagerank_missing_source_node_fails_loudly(ray_session):
    import pytest
    import ray

    from dane_visual_feature_extraction_worker_ray.stages.pagerank import (
        pagerank_fixed_point,
    )

    e = pa.table(
        {
            "src": pa.array([0, 7], pa.int64()),  # 7 not in nodes
            "dst": pa.array([1, 1], pa.int64()),
            "w": pa.array([1, 1], pa.int64()),
        }
    )
    n = pa.table({"node": pa.array([0, 1], pa.int64())})
    with pytest.raises(ray.exceptions.RayTaskError, match="not in nodes_ds"):
        pagerank_fixed_point(
            rd.from_arrow(e), rd.from_arrow(n), iters=1, num_partitions=2
        ).materialize()
