"""Distributed k-means clustering over an embedding column.

The training-data-curation counterpart to the IVF coarse quantizer in
``stages/similarity.py`` (same bounded-gather init, same broadcast
pattern), exposed as a first-class operator: cluster documents by
embedding to balance domains / prune boilerplate clusters before
training. Reference analogy: the model state is broadcast once and
reused across batches, like the reference loading its checkpoint once
per worker (``/root/reference/worker.py:61``,
``/root/reference/nn_models.py:282-296``) — here the "model" is the
centroid matrix shipped via ``ray.put`` each Lloyd round.

Scale shape (100-TB safe):

- **init**: centroids = embeddings of the ``k`` smallest ids. The
  gather is bounded BEFORE the driver collect — each batch keeps only
  its ``k`` smallest-id rows, so the driver holds ≤ ``k × n_blocks``
  rows, never a corpus fraction (same fix as the IVF trainer,
  ``similarity.py:132-146``).
- **Lloyd round**: one streaming pass; each batch emits a ``k``-row
  partial ``(cluster, n, sum_vec)`` table (mergeable moments). The
  driver combines ``k × n_blocks`` tiny rows and updates centroids —
  the corpus never moves, there is NO shuffle at all.
- **assign**: one streaming pass against the broadcast centroids.

Determinism: partials are combined in block order (deterministic for a
fixed read plan); assignment ties break toward the smallest cluster id
after rounding, mirroring the SQL oracle's
``row_number() OVER (ORDER BY dist, cluster)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .similarity import _matrix


def kmeans_init_centroids(
    emb_ds, k: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic seed: the ``k`` smallest-id vectors, gathered with
    a per-batch cap so the driver never sees more than k rows/block."""

    def _cand(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy()
        if len(ids) > k:
            keep = np.zeros(len(ids), dtype=bool)
            keep[np.argpartition(ids, k)[:k]] = True
            tbl = tbl.filter(pa.array(keep))
        return tbl.select([id_col, vec_col])

    cand = pa.concat_tables(
        list(
            emb_ds.map_batches(_cand, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    ids = cand.column(id_col).to_numpy()
    order = np.argsort(ids, kind="stable")[:k]
    seed = _matrix(cand.take(pa.array(order)), vec_col).astype(np.float64)
    if seed.shape[0] == 0:
        raise ValueError("kmeans: empty input")
    if seed.shape[0] < k:
        # corpus smaller than k: cycle the available vectors — the
        # duplicates become dead clusters (zero members) and keep their
        # seed under the live-mask update, so every caller's (k, dim)
        # shape contract holds on tiny inputs
        reps = -(-k // seed.shape[0])
        seed = np.tile(seed, (reps, 1))[:k]
    return seed


def _sq_dists(m: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(batch, k) squared euclidean distances via the expanded form —
    no (batch, k, dim) intermediate, so memory stays batch × k."""
    d2 = (
        (m * m).sum(axis=1)[:, None]
        + (C * C).sum(axis=1)[None, :]
        - 2.0 * (m @ C.T)
    )
    return np.maximum(d2, 0.0)


def kmeans_fit(
    emb_ds,
    k: int = 8,
    iters: int = 0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Lloyd's algorithm, distributed: returns the (k, dim) float64
    centroid matrix. ``iters=0`` returns the deterministic seed."""
    centroids = kmeans_init_centroids(emb_ds, k, vec_col, id_col)
    dim = centroids.shape[1]
    for _ in range(iters):
        c_ref = ray.put(centroids)

        def _partial(tbl: pa.Table) -> pa.Table:
            C = ray.get(c_ref)
            m = _matrix(tbl, vec_col).astype(np.float64)
            assign = np.argmin(_sq_dists(m, C), axis=1)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            sums = np.zeros((k, dim), np.float64)
            for c in np.unique(assign):
                sums[c] = m[assign == c].sum(axis=0)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(counts),
                    "s": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.ravel()), dim
                    ),
                }
            )

        parts = [
            ray.get(r)
            for r in emb_ds.map_batches(
                _partial, batch_format="pyarrow"
            ).to_arrow_refs()
        ]
        total_n = np.zeros(k, np.int64)
        total_s = np.zeros((k, dim), np.float64)
        for t in parts:  # block order: deterministic for a fixed read
            if t.num_rows == 0:
                continue
            total_n += t.column("n").to_numpy()
            total_s += (
                t.column("s")
                .combine_chunks()
                .flatten()
                .to_numpy()
                .reshape(k, dim)
            )
        live = total_n > 0
        centroids = np.where(
            live[:, None], total_s / np.maximum(total_n, 1)[:, None], centroids
        )
    return centroids


def kmeans_assign(
    emb_ds,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int | None = 4,
):
    """Streaming assignment: Dataset of (vec_id, cluster, dist) with
    dist rounded for cross-engine comparability (same policy as the
    knn queries) and ties broken toward the smaller cluster id AFTER
    rounding — identical to the oracle's ``ORDER BY dist, cluster``."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(tbl: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        m = _matrix(tbl, vec_col).astype(np.float64)
        d = np.sqrt(_sq_dists(m, C))
        if round_decimals is not None:
            d = np.round(d, round_decimals)
        assign = np.argmin(d, axis=1)  # first min == smallest cluster id
        return pa.table(
            {
                id_col: tbl.column(id_col).cast(pa.int64()),
                "cluster": pa.array(assign.astype(np.int64)),
                "dist": pa.array(d[np.arange(len(assign)), assign]),
            }
        )

    return emb_ds.map_batches(_assign, batch_format="pyarrow")


def kmeans_cluster_sizes(
    emb_ds,
    k: int = 8,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Fit + assign + per-cluster row count: the 'domain balance' view a
    curation pipeline reads before sampling. Counts come from mergeable
    per-batch partials — no shuffle."""
    from .groupagg import group_aggregate_table, hash_grouped_aggregate

    centroids = kmeans_fit(emb_ds, k=k, iters=iters, vec_col=vec_col,
                           id_col=id_col)
    assigned = kmeans_assign(emb_ds, centroids, vec_col=vec_col,
                             id_col=id_col)

    def _count(tbl: pa.Table) -> pa.Table:
        t = tbl.append_column(
            "n_vecs", pa.array(np.ones(tbl.num_rows, np.int64))
        )
        return group_aggregate_table(
            t.select(["cluster", "n_vecs"]), ["cluster"], [("n_vecs", "sum")]
        )

    return hash_grouped_aggregate(
        assigned.map_batches(_count, batch_format="pyarrow", batch_size=None),
        ["cluster"],
        [("n_vecs", "sum")],
        num_buckets=4,
    )


def semantic_dedup(
    emb_ds,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 —
    public method): k-means-cluster the embeddings, then prune
    near-duplicates WITHIN each cluster (cosine ≥ ``threshold``),
    keeping the smallest id per connected duplicate group. Returns a
    Dataset of drops ``(vec_id, kept_id, cluster)``.

    Scale shape: the all-pairs scan is cluster-scoped by construction
    — SemDeDup's own argument: choose k ∝ corpus so clusters stay
    bounded (the O(c²) kernel below is per cluster, on the cluster
    hash exchange, never a corpus-wide pair scan). Near-duplicates
    split across cluster boundaries are missed; that is the method's
    documented recall trade, not an engine limitation (the LSH path in
    stages/similarity.py is the boundary-free alternative)."""
    from .exchange import hash_grouped_map

    centroids = kmeans_fit(emb_ds, k=k, iters=iters, vec_col=vec_col,
                           id_col=id_col)
    c_ref = ray.put(np.asarray(centroids, np.float64))

    def _assign_keep_vec(tbl: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        m = _matrix(tbl, vec_col).astype(np.float64)
        a = np.argmin(_sq_dists(m, C), axis=1)
        return pa.table(
            {
                id_col: tbl.column(id_col).cast(pa.int64()),
                "cluster": pa.array(a.astype(np.int64)),
                vec_col: tbl.column(vec_col),
            }
        )

    assigned = emb_ds.map_batches(
        _assign_keep_vec, batch_format="pyarrow", batch_size=None
    )

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("kept_id", pa.int64()),
            ("cluster", pa.int64()),
        ]
    )

    def _prune(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy()
        m = _matrix(g, vec_col).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        order = np.argsort(ids, kind="stable")
        ids, mn = ids[order], mn[order]
        sim = mn @ mn.T
        n = len(ids)
        # TRUE connected components on the thresholded similarity
        # graph (a chain a~b, b~c with a≁c must still collapse to one
        # survivor): vectorized min-label fixpoint — labels converge in
        # O(log n) squarings of the boolean adjacency's min-plus
        # action, all cluster-local
        adj = sim >= threshold
        np.fill_diagonal(adj, True)
        label = np.arange(n)
        while True:
            # each node takes the min label among its neighbors
            nxt = np.where(adj, label[None, :], n).min(axis=1)
            if (nxt == label).all():
                break
            label = nxt
        parent = label
        drop = parent != np.arange(n)
        cl = int(g.column("cluster")[0].as_py())
        return pa.table(
            {
                id_col: pa.array(ids[drop].astype(np.int64)),
                "kept_id": pa.array(ids[parent[drop]].astype(np.int64)),
                "cluster": pa.array(
                    np.full(int(drop.sum()), cl, np.int64)
                ),
            }
        )

    return hash_grouped_map(
        assigned, "cluster", _prune,
        num_partitions=min(32, max(4, k)),
        empty_schema=out_schema,
    )
