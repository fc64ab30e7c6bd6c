"""Distributed PCA over an embedding column.

The distributed part is the MOMENTS pass: each batch contributes the
mergeable sufficient statistics (n, Σx, ΣxxT) — one (d + d²)-double
partial per block, so the driver holds O(blocks · d²) transient rows
and one d×d matrix, never the corpus. The eigensolve itself runs on
that d×d covariance at the driver: for model embedding dims (64 here,
1k–4k in production) d² doubles is megabytes — the textbook split
(moments distributed, spectrum local) every large-scale PCA uses.

Sign convention: each eigenvector is flipped so its largest-|.|
component is positive, making loadings deterministic (eigenvectors are
only defined up to sign).

Reference analog: the per-worker feature aggregation boundary in
``/root/reference/feature_extraction.py:17-32`` — heavy reduction on
workers, small state on the coordinator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _flat_fixed(tbl: pa.Table, col: str):
    c = tbl.column(col).combine_chunks()
    arr = c.chunk(0) if hasattr(c, "chunk") else c
    vals = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    lens = arr.value_lengths().to_numpy(zero_copy_only=False)
    if len(lens) == 0:
        return np.zeros((0, 0)), 0
    if lens.min() != lens.max():
        raise ValueError("pca: ragged embedding lists")
    d = int(lens[0])
    return vals.reshape(-1, d), d


def pca_moments(ds, col: str = "embedding"):
    """Distributed (n, Σx, ΣxxT) over ``ds[col]`` → (n, mean, cov).

    Covariance is the population form (divide by n), computed from the
    raw moments: cov = ΣxxT/n − mean·meanT."""
    import ray

    def _partial(tbl: pa.Table) -> pa.Table:
        v, d = _flat_fixed(tbl, col)
        if d == 0:
            return pa.table(
                {
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.float64())),
                    "o": pa.array([], pa.list_(pa.float64())),
                }
            )
        return pa.table(
            {
                "n": pa.array([v.shape[0]], pa.int64()),
                "s": pa.array([v.sum(axis=0)], pa.list_(pa.float64())),
                "o": pa.array(
                    [(v.T @ v).reshape(-1)], pa.list_(pa.float64())
                ),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(
                _partial, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        raise ValueError("pca: empty input")
    n = sum(int(t.column("n").to_numpy().sum()) for t in parts)
    s = None
    o = None
    for t in parts:
        sf = (
            t.column("s").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(t.num_rows, -1)
            .sum(axis=0)
        )
        of = (
            t.column("o").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(t.num_rows, -1)
            .sum(axis=0)
        )
        s = sf if s is None else s + sf
        o = of if o is None else o + of
    d = len(s)
    mean = s / n
    cov = o.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean, cov


def pca_top_components(ds, col: str = "embedding", k: int = 4):
    """Top-k principal components of ``ds[col]``.

    Returns ``(eigvals (k,), loadings (d, k), evr (k,), mean (d,), n)``
    with eigvals descending and the deterministic sign convention."""
    n, mean, cov = pca_moments(ds, col)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    w = w[order]
    v = v[:, order]
    # deterministic sign: largest-|.| component positive
    for j in range(v.shape[1]):
        i = int(np.argmax(np.abs(v[:, j])))
        if v[i, j] < 0:
            v[:, j] = -v[:, j]
    total = float(np.trace(cov))
    evr = w / total if total > 0 else np.zeros_like(w)
    return w, v, evr, mean, n
