"""Distributed logistic-regression training — the trainable quality
filter of LLM curation stacks (the CCNet / GPT-3-style fastText
classifier, reduced to its linear core). Joins the engine's iterative
family (BPE, k-means, PageRank) and follows the same static/moving
discipline: the design matrices are built ONCE per block and cached in
the object store; per GD round only the (d+1)-sized weight vector goes
out and (d+1)-sized gradient partials come back — nothing
corpus-proportional moves after the first pass, at any corpus size.

Determinism: block boundaries come from the tuned read (fixed
``override_num_blocks``), per-block numpy reductions are fixed-order,
and the driver combines partials in block order — retraining on the
same input is bit-identical, the property every other sampling/split
operator in this engine guarantees (reference analog: the fixed
``torch.load`` weights of nn_models.py:282-296, except here the
weights are LEARNED on-cluster instead of fetched).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _moments(tbl: pa.Table, feature_cols: list[str]):
    pa.set_cpu_count(1)
    n = tbl.num_rows
    sums, sqs = [], []
    for c in feature_cols:
        x = tbl.column(c).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        sums.append(float(x.sum()))
        sqs.append(float((x * x).sum()))
    return n, sums, sqs


@ray.remote
def _design(
    tbl: pa.Table,
    feature_cols: list[str],
    label_col: str,
    mean: np.ndarray,
    std: np.ndarray,
):
    pa.set_cpu_count(1)
    cols = [
        tbl.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        for c in feature_cols
    ]
    X = np.column_stack([np.ones(tbl.num_rows)] + cols)
    X[:, 1:] = (X[:, 1:] - mean) / std
    y = tbl.column(label_col).to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    return X, y


@ray.remote
def _grad(mat, w: np.ndarray):
    X, y = mat
    z = X @ w
    p = 1.0 / (1.0 + np.exp(-z))
    g = X.T @ (p - y)
    # stable log-loss: log(1+e^z) - y*z, with the large-|z| guard
    ll = np.logaddexp(0.0, z) - y * z
    return g, float(ll.sum()), len(y)


def train_logreg(
    ds,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    iters: int = 30,
    l2: float = 0.0,
):
    """Full-batch GD on z-scaled features. Returns
    ``(weights, mean, std, history)`` — ``weights[0]`` is the
    intercept, ``history`` the per-iteration mean log-loss. ``ds`` must
    carry numeric ``feature_cols`` and a 0/1 ``label_col``."""
    from .exchange import _cpus_per_task

    refs = ds.to_arrow_refs()
    ncpu = _cpus_per_task()
    d = len(feature_cols)
    mom = ray.get(
        [
            _moments.options(num_cpus=ncpu).remote(r, feature_cols)
            for r in refs
        ]
    )
    n_tot = sum(m[0] for m in mom)
    if n_tot == 0:
        raise ValueError("train_logreg: empty dataset")
    mean = np.array(
        [sum(m[1][j] for m in mom) / n_tot for j in range(d)]
    )
    var = np.array(
        [
            max(sum(m[2][j] for m in mom) / n_tot - mean[j] ** 2, 0.0)
            for j in range(d)
        ]
    )
    std = np.sqrt(var)
    std[std == 0.0] = 1.0  # constant feature: leave centered at 0

    mats = [
        _design.options(num_cpus=ncpu).remote(
            r, feature_cols, label_col, mean, std
        )
        for r in refs
    ]
    w = np.zeros(d + 1)
    history = []
    for _ in range(iters):
        parts = ray.get(
            [_grad.options(num_cpus=ncpu).remote(m, w) for m in mats]
        )
        g = np.zeros(d + 1)
        loss = 0.0
        for gi, li, _n in parts:  # fixed block order — deterministic
            g += gi
            loss += li
        w = w - lr * (g / n_tot + l2 * w)
        history.append(loss / n_tot)
    return w, mean, std, history


def apply_logreg(
    ds,
    w: np.ndarray,
    mean: np.ndarray,
    std: np.ndarray,
    feature_cols: list[str],
    id_col: str = "doc_id",
    label_col: str | None = None,
):
    """Score every row with the learned weights (broadcast once —
    they're d+1 floats) → ``(id, score, pred[, label])``."""
    w = np.asarray(w)
    mean = np.asarray(mean)
    std = np.asarray(std)

    def _score(tbl: pa.Table) -> pa.Table:
        cols = [
            tbl.column(c)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            for c in feature_cols
        ]
        X = np.column_stack([np.ones(tbl.num_rows)] + cols)
        X[:, 1:] = (X[:, 1:] - mean) / std
        z = X @ w
        score = 1.0 / (1.0 + np.exp(-z))
        out = {
            id_col: tbl.column(id_col),
            "score": pa.array(score),
            "pred": pa.array((score >= 0.5).astype(np.int64)),
        }
        if label_col is not None:
            out["label"] = tbl.column(label_col).cast(pa.int64())
        return pa.table(out)

    return ds.map_batches(_score, batch_format="pyarrow")
