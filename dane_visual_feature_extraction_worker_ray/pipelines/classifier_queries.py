"""Trainable quality-classifier queries: distributed logistic
regression over the documents table (stages/classifier.py). Iterative
GD is not SQL-expressible, so both queries are rows-only in the driver
gate; tests/test_classifier.py holds the single-process brute-force
oracle, the determinism gate, and the learnability floor."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

# the planted-but-learnable objective: "long document" as the quality
# label, predicted from token-level features only (n_words correlates
# with n_chars; the classifier must discover that)
LABEL_MIN_CHARS = 250
FEATURE_COLS = ["n_words", "avg_word_len", "stopword_ratio"]
TRAIN_LR = 0.5
TRAIN_ITERS = 30


def _features(sf_dir: str):
    from ..sources.parquet import read_parquet_tuned
    from ..stages.text import text_quality

    docs = read_parquet_tuned(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )
    feats = text_quality(docs)

    def _label(tbl: pa.Table) -> pa.Table:
        y = (
            tbl.column("n_chars").to_numpy(zero_copy_only=False)
            >= LABEL_MIN_CHARS
        ).astype(np.int64)
        return tbl.append_column("label", pa.array(y))

    return feats.map_batches(_label, batch_format="pyarrow")


def _train(sf_dir: str):
    from ..stages.classifier import train_logreg

    return train_logreg(
        _features(sf_dir),
        FEATURE_COLS,
        "label",
        lr=TRAIN_LR,
        iters=TRAIN_ITERS,
    )


def q_classifier_weights(sf_dir: str):
    """The learned quality-filter model itself: one row per
    coefficient (intercept + z-scaled features) plus the final mean
    train log-loss — the artifact a curation pipeline persists and
    ships to its scoring stage."""
    w, mean, std, hist = _train(sf_dir)
    names = ["intercept"] + FEATURE_COLS
    return pa.table(
        {
            "feature": pa.array(names, pa.string()),
            "weight": pa.array(w),
            "final_loss": pa.array([hist[-1]] * len(names)),
        }
    )


def q_classifier_preds(sf_dir: str):
    """Train-then-score: every document's quality score and verdict
    under the learned model (the broadcast-weights scoring pass a
    100-TB curation run streams)."""
    from ..stages.classifier import apply_logreg

    feats = _features(sf_dir)
    w, mean, std, _ = _train(sf_dir)
    return apply_logreg(
        feats, w, mean, std, FEATURE_COLS, label_col="label"
    )


QUERIES = {
    "classifier_weights": q_classifier_weights,
    "classifier_preds": q_classifier_preds,
}
ORACLE_SQL: dict[str, str] = {}
