"""stages/classifier.py: distributed logistic regression vs a
single-process numpy oracle, bit-identical retrain determinism, and a
learnability floor on the planted objective."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.classifier import (
    apply_logreg,
    train_logreg,
)

FEATS = ["x1", "x2"]


def _synth(n=400, seed=7):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(0.0, 2.0, n)
    x2 = rng.normal(5.0, 1.0, n)  # non-zero mean exercises z-scaling
    y = (1.5 * x1 - 0.8 * (x2 - 5.0) + rng.normal(0, 0.4, n) > 0).astype(
        np.int64
    )
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "x1": pa.array(x1),
            "x2": pa.array(x2),
            "label": pa.array(y),
        }
    )


def _oracle(tbl, lr=0.5, iters=30):
    X = np.column_stack(
        [np.ones(tbl.num_rows)]
        + [tbl.column(c).to_numpy() for c in FEATS]
    )
    mean, std = X[:, 1:].mean(axis=0), X[:, 1:].std(axis=0)
    std[std == 0] = 1.0
    X[:, 1:] = (X[:, 1:] - mean) / std
    y = tbl.column("label").to_numpy().astype(np.float64)
    w = np.zeros(X.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / len(y)
    return w, mean, std


def test_matches_single_process_oracle():
    tbl = _synth()
    ds = rd.from_arrow(tbl).repartition(5)
    w, mean, std, hist = train_logreg(ds, FEATS, "label")
    w0, mean0, std0 = _oracle(tbl)
    # block-wise float summation differs from whole-array summation
    # only in rounding order — allclose, not bit-equal
    assert np.allclose(mean, mean0, rtol=0, atol=1e-9)
    assert np.allclose(w, w0, rtol=1e-7, atol=1e-9)
    assert hist[-1] < hist[0]  # loss actually decreased


def test_retrain_is_bit_identical():
    tbl = _synth()
    ds = rd.from_arrow(tbl).repartition(5)
    w1, m1, s1, h1 = train_logreg(ds, FEATS, "label")
    w2, m2, s2, h2 = train_logreg(ds, FEATS, "label")
    assert (w1 == w2).all() and h1 == h2
    assert (m1 == m2).all() and (s1 == s2).all()


def test_learns_separable_objective_and_scores():
    tbl = _synth()
    ds = rd.from_arrow(tbl).repartition(4)
    w, mean, std, _ = train_logreg(ds, FEATS, "label")
    preds = (
        apply_logreg(ds, w, mean, std, FEATS, label_col="label")
        .to_pandas()
    )
    acc = (preds["pred"] == preds["label"]).mean()
    assert acc > 0.9, acc
    assert ((preds["score"] >= 0) & (preds["score"] <= 1)).all()


def test_constant_feature_and_empty_guard():
    n = 50
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "x1": pa.array(np.arange(n, dtype=np.float64)),
            "x2": pa.array(np.full(n, 3.0)),  # zero variance
            "label": pa.array((np.arange(n) % 2).astype(np.int64)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    w, mean, std, _ = train_logreg(ds, FEATS, "label", iters=5)
    assert np.isfinite(w).all() and std[1] == 1.0
    with pytest.raises(ValueError):
        train_logreg(
            rd.from_arrow(tbl.slice(0, 0)), FEATS, "label"
        )


def test_gate_queries_run():
    from dane_visual_feature_extraction_worker_ray.pipelines.classifier_queries import (
        q_classifier_preds,
        q_classifier_weights,
    )

    wtbl = q_classifier_weights("/root/testdata/sf0.001")
    assert wtbl.num_rows == 4 and np.isfinite(
        wtbl.column("weight").to_numpy()
    ).all()
    preds = q_classifier_preds("/root/testdata/sf0.001").to_pandas()
    assert len(preds) > 0
    # the planted long-doc objective is learnable from token features
    assert (preds["pred"] == preds["label"]).mean() > 0.8
