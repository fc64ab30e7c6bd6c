"""Scorer query (rows-only driver check — model scoring is not
SQL-expressible; correctness is covered by tests/test_scorer.py:
determinism, batch-size/pool-size invariance, allclose vs the oracle
feature frame scored single-process)."""

from __future__ import annotations

from ..config import FeatureConfig
from ..stages.scorer import score_features
from .transcript_queries import _features


def q_feature_vectors(sf_dir: str):
    feats = _features(sf_dir)
    scored = score_features(feats, cfg=FeatureConfig())
    return scored.select_columns(["conv_id", "turn_idx", "feature_vec"])


QUERIES = {"feature_vectors": q_feature_vectors}
ORACLE_SQL: dict[str, str] = {}
