"""Scorer actor-pool stage: determinism, layout invariance, golden
comparison through the distributed pipeline (reference pattern:
tests/unit/feature_extraction_test.py:51-60 — exact keys, allclose
features)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.config import FeatureConfig
from dane_visual_feature_extraction_worker_ray.oracle.pandas_oracle import (
    oracle_features,
)
from dane_visual_feature_extraction_worker_ray.stages.scorer import (
    FeatureScorer,
    score_features,
)
from dane_visual_feature_extraction_worker_ray.stages.transcript_features import (
    compute_features,
)

CFG = FeatureConfig()


def _oracle_scored(corpus) -> pd.DataFrame:
    turns, snaps = corpus
    exp = oracle_features(turns.to_pandas(), snaps.to_pandas(), CFG)
    tbl = pa.Table.from_pandas(exp, preserve_index=False)
    scored = FeatureScorer(CFG)(tbl).to_pandas()
    return scored.sort_values(["conv_id", "turn_idx"], kind="mergesort")


def test_scorer_batch_size_invariance(corpus):
    turns, snaps = corpus
    exp = oracle_features(turns.to_pandas(), snaps.to_pandas(), CFG)
    tbl = pa.Table.from_pandas(exp, preserve_index=False)
    s = FeatureScorer(CFG)
    full = np.vstack(s(tbl).column("feature_vec").to_numpy(zero_copy_only=False))
    parts = [
        np.vstack(
            s(tbl.slice(i, 100)).column("feature_vec").to_numpy(
                zero_copy_only=False
            )
        )
        for i in range(0, tbl.num_rows, 100)
    ]
    assert np.allclose(full, np.vstack(parts), atol=1e-5)


def test_scorer_deterministic():
    a, b = FeatureScorer(CFG), FeatureScorer(CFG)
    assert np.array_equal(a.tok_emb, b.tok_emb)
    assert np.array_equal(a.num_proj, b.num_proj)


def test_pipeline_scored_matches_oracle(corpus):
    turns, snaps = corpus
    ds = compute_features(rd.from_arrow(turns), rd.from_arrow(snaps), CFG)
    scored = score_features(ds, CFG, concurrency=2, batch_size=500)
    got = scored.to_pandas().sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    )
    exp = _oracle_scored(corpus)
    assert len(got) == len(exp)
    gv = np.vstack(got["feature_vec"].to_numpy())
    ev = np.vstack(exp["feature_vec"].to_numpy())
    assert gv.shape == (len(got), CFG.feature_dim)
    assert np.allclose(gv, ev, atol=1e-5)
    assert not np.allclose(gv, 0)
