"""Product quantization (PQ) of an embedding column.

The next compression step after the scalar SQ8 quantizer
(``pipelines/similarity_queries.q_embedding_int8_quantize``): split
each d-dim vector into ``m`` contiguous subspaces and vector-quantize
each against its own k-entry codebook (Jégou, Douze & Schmid 2011 —
public method). A vector compresses to ``m`` small codes; an ANN stack
scans codes with per-subspace lookup tables.

Scale shape (same contract as ``stages/clustering.py``):

- **train**: ONE streaming pass per Lloyd round covers ALL subspaces —
  each batch emits a single ``(m·k)``-row moments partial
  ``(sub, cluster, n, Σsubvec)``; the driver combines
  ``m·k × n_blocks`` tiny rows and refreshes the ``(m, k, d/m)``
  codebook tensor. The corpus never moves; the codebooks are broadcast
  once per round via ``ray.put``.
- **encode**: one streaming pass against the broadcast codebooks;
  codes + reconstruction error per vector, no shuffle.

Determinism: seed codebooks come from the k smallest-id vectors
(bounded gather, ``clustering.kmeans_init_centroids``); partials are
combined in block order; assignment ties break toward the smallest
code (first argmin).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .clustering import _sq_dists, kmeans_init_centroids
from .similarity import _matrix


def _split(mtx: np.ndarray, m: int) -> np.ndarray:
    """(n, d) → (m, n, d/m) contiguous subspace views."""
    n, d = mtx.shape
    if d % m:
        raise ValueError(f"pq: dim {d} not divisible by m={m}")
    dsub = d // m
    return mtx.reshape(n, m, dsub).transpose(1, 0, 2)


def pq_train(
    emb_ds,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train the ``(m, k, d/m)`` codebook tensor with distributed
    Lloyd rounds shared across subspaces."""
    seed = kmeans_init_centroids(emb_ds, k, vec_col, id_col)
    d = seed.shape[1]
    if d % m:
        raise ValueError(f"pq: dim {d} not divisible by m={m}")
    dsub = d // m
    books = _split(seed, m).copy()  # (m, k, dsub)

    for _ in range(iters):
        b_ref = ray.put(books)

        def _partial(tbl: pa.Table) -> pa.Table:
            B = ray.get(b_ref)
            x = _split(_matrix(tbl, vec_col).astype(np.float64), m)
            subs = []
            clusters = []
            counts = []
            sums = []
            for j in range(m):
                a = np.argmin(_sq_dists(x[j], B[j]), axis=1)
                cnt = np.bincount(a, minlength=k).astype(np.int64)
                s = np.zeros((k, dsub), np.float64)
                for c in np.unique(a):
                    s[c] = x[j][a == c].sum(axis=0)
                subs.append(np.full(k, j, np.int64))
                clusters.append(np.arange(k, dtype=np.int64))
                counts.append(cnt)
                sums.append(s)
            return pa.table(
                {
                    "sub": pa.array(np.concatenate(subs)),
                    "cluster": pa.array(np.concatenate(clusters)),
                    "n": pa.array(np.concatenate(counts)),
                    "s": pa.FixedSizeListArray.from_arrays(
                        pa.array(np.concatenate(sums).ravel()), dsub
                    ),
                }
            )

        total_n = np.zeros((m, k), np.int64)
        total_s = np.zeros((m, k, dsub), np.float64)
        for t in ray.get(
            emb_ds.map_batches(
                _partial, batch_format="pyarrow"
            ).to_arrow_refs()
        ):
            if t.num_rows == 0:
                continue
            sub = t.column("sub").to_numpy()
            clu = t.column("cluster").to_numpy()
            total_n[sub, clu] += t.column("n").to_numpy()
            total_s[sub, clu] += (
                t.column("s")
                .combine_chunks()
                .flatten()
                .to_numpy()
                .reshape(-1, dsub)
            )
        live = total_n > 0
        books = np.where(
            live[..., None],
            total_s / np.maximum(total_n, 1)[..., None],
            books,
        )
    return books


def pq_encode(
    emb_ds,
    books: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Encode every vector: Dataset of (vec_id, code_0..code_{m-1},
    recon_err) where recon_err is the euclidean distance between the
    vector and its codebook reconstruction."""
    books = np.asarray(books, np.float64)
    m = books.shape[0]
    b_ref = ray.put(books)

    def _enc(tbl: pa.Table) -> pa.Table:
        B = ray.get(b_ref)
        mtx = _matrix(tbl, vec_col).astype(np.float64)
        x = _split(mtx, m)
        n = mtx.shape[0]
        codes = np.zeros((m, n), np.int64)
        err2 = np.zeros(n, np.float64)
        for j in range(m):
            d2 = _sq_dists(x[j], B[j])
            codes[j] = np.argmin(d2, axis=1)
            err2 += d2[np.arange(n), codes[j]]
        cols = {id_col: tbl.column(id_col).cast(pa.int64())}
        for j in range(m):
            cols[f"code_{j}"] = pa.array(codes[j])
        cols["recon_err"] = pa.array(np.sqrt(err2))
        return pa.table(cols)

    return emb_ds.map_batches(_enc, batch_format="pyarrow")


def knn_pq_adc(
    emb_ds,
    books: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Asymmetric-distance top-k: the query stays float, the corpus is
    scanned through its PQ codes — per batch the (m, k_codes) table of
    exact query-to-codeword squared distances is built once (tiny) and
    summed by lookup, the standard ADC scan of an IVF-PQ index.

    Per-batch top-k partials (k rows each) are the only driver gather
    — O(k · n_blocks), same bound as knn_brute_force. Returns a pandas
    frame (vec_id, adc_dist) sorted ascending, ties to smaller id."""
    import pandas as pd

    books = np.asarray(books, np.float64)
    m, kc, dsub = books.shape
    q = np.asarray(query, np.float64).reshape(m, dsub)
    # (m, kc) exact query→codeword squared distances
    lut = ((books - q[:, None, :]) ** 2).sum(axis=2)
    lut_ref = ray.put(lut)
    b_ref = ray.put(books)

    def _scan(tbl: pa.Table) -> pa.Table:
        B = ray.get(b_ref)
        L = ray.get(lut_ref)
        mtx = _matrix(tbl, vec_col).astype(np.float64)
        x = _split(mtx, m)
        n = mtx.shape[0]
        dist2 = np.zeros(n, np.float64)
        for j in range(m):
            codes = np.argmin(_sq_dists(x[j], B[j]), axis=1)
            dist2 += L[j, codes]
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        if n > k:
            # lexsort, not argpartition: partial top-k must break
            # distance TIES by id or the block boundary silently keeps
            # arbitrary rows (same rule as knn_brute_force)
            part = np.lexsort((ids, dist2))[:k]
            ids, dist2 = ids[part], dist2[part]
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "adc_dist": pa.array(np.sqrt(dist2)),
            }
        )

    parts = [
        t
        for t in ray.get(
            emb_ds.map_batches(_scan, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    allp = pa.concat_tables(parts).to_pandas()
    return (
        allp.sort_values(["adc_dist", id_col])
        .head(k)
        .reset_index(drop=True)
    )


def knn_ivf_pq(
    emb_ds,
    query: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """IVF-PQ: the production ANN index shape — an IVF coarse
    quantizer restricts the scan to ``n_probe`` lists, and within a
    probed list distances come from PQ codes over the RESIDUAL
    (x − centroid), scanned asymmetrically with a per-list lookup
    table (the query's residual differs per list). Jégou et al. 2011.

    Scale shape: coarse centroids via the bounded-gather k-means
    (``clustering.kmeans_fit``); residual codebooks via the
    shared-round PQ trainer over a derived residual dataset (one
    moments partial per block per round); the probe is one streaming
    pass — batches drop rows outside probed lists BEFORE computing
    codes, and only k-row top-k partials reach the driver."""
    from .clustering import kmeans_fit

    cents = kmeans_fit(emb_ds, k=n_lists, iters=iters,
                       vec_col=vec_col, id_col=id_col)
    c_ref = ray.put(cents)

    def _residual(tbl: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        x = _matrix(tbl, vec_col).astype(np.float64)
        a = np.argmin(_sq_dists(x, C), axis=1)
        r = (x - C[a]).astype(np.float32)
        return pa.table(
            {
                id_col: tbl.column(id_col).cast(pa.int64()),
                "list_id": pa.array(a.astype(np.int64)),
                vec_col: pa.array(list(r), pa.list_(pa.float32())),
            }
        )

    res_ds = emb_ds.map_batches(
        _residual, batch_format="pyarrow", batch_size=None
    )
    books = pq_train(res_ds, m=m, k=k_codes, iters=iters,
                     vec_col=vec_col, id_col=id_col)

    q = np.asarray(query, np.float64)
    qd = ((cents - q) ** 2).sum(axis=1)
    probed = np.sort(np.argsort(qd, kind="stable")[:n_probe])
    # per-probed-list LUT: exact (q - centroid_l) residual vs codewords
    dsub = books.shape[2]
    luts = {}
    for l in probed:
        qr = (q - cents[l]).reshape(m, dsub)
        luts[int(l)] = ((books - qr[:, None, :]) ** 2).sum(axis=2)
    luts_ref = ray.put(luts)
    b_ref = ray.put(books)

    def _probe(tbl: pa.Table) -> pa.Table:
        B = ray.get(b_ref)
        L = ray.get(luts_ref)
        lists = tbl.column("list_id").to_numpy()
        keep = np.isin(lists, np.fromiter(L.keys(), np.int64))
        if not keep.any():
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "adc_dist": pa.array([], pa.float64()),
                }
            )
        t = tbl.filter(pa.array(keep))
        lists = t.column("list_id").to_numpy()
        x = _split(_matrix(t, vec_col).astype(np.float64), B.shape[0])
        n = x.shape[1]
        dist2 = np.zeros(n, np.float64)
        for j in range(B.shape[0]):
            codes = np.argmin(_sq_dists(x[j], B[j]), axis=1)
            for l, lut in L.items():
                sel = lists == l
                dist2[sel] += lut[j, codes[sel]]
        ids = t.column(id_col).to_numpy()
        if n > k:
            # deterministic tie-break (see knn_pq_adc)
            part = np.lexsort((ids, dist2))[:k]
            ids, dist2 = ids[part], dist2[part]
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64)),
                "adc_dist": pa.array(np.sqrt(dist2)),
            }
        )

    parts = [
        t
        for t in ray.get(
            res_ds.map_batches(_probe, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        import pandas as pd

        return pd.DataFrame({id_col: [], "adc_dist": []})
    allp = pa.concat_tables(parts).to_pandas()
    return (
        allp.sort_values(["adc_dist", id_col])
        .head(k)
        .reset_index(drop=True)
    )
