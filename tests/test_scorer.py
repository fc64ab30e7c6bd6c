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


def test_weights_artifact_fetch_validate_cache(tmp_path):
    """Round-4 seam (verdict sweep): a weights artifact is fetched AT
    MOST once (cache keyed by uri), atomically cached, shape-validated,
    and produces the same scores as direct seeded weights when the
    artifact holds them."""
    ref = FeatureScorer(CFG)
    art = tmp_path / "weights_src.npz"
    np.savez(art, tok_emb=ref.tok_emb, num_proj=ref.num_proj)
    calls = []

    def fetch(uri, dest):
        calls.append(uri)
        import shutil

        shutil.copy(art, dest)

    cache = str(tmp_path / "cache")
    s1 = FeatureScorer(
        CFG, weights_uri="s3://bucket/w.npz", cache_dir=cache, fetch_fn=fetch
    )
    assert calls == ["s3://bucket/w.npz"]
    # second construction: cache hit, no fetch
    s2 = FeatureScorer(
        CFG, weights_uri="s3://bucket/w.npz", cache_dir=cache, fetch_fn=fetch
    )
    assert calls == ["s3://bucket/w.npz"]
    assert np.array_equal(s1.tok_emb, ref.tok_emb)
    assert np.array_equal(s2.num_proj, ref.num_proj)
    # no fetch_fn + cache miss → loud NotImplementedError
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        FeatureScorer(CFG, weights_uri="s3://bucket/other.npz",
                      cache_dir=cache)
    # wrong shapes → loud ValueError
    bad = tmp_path / "bad.npz"
    np.savez(bad, tok_emb=ref.tok_emb[:5], num_proj=ref.num_proj)

    def fetch_bad(uri, dest):
        import shutil

        shutil.copy(bad, dest)

    with _pytest.raises(ValueError):
        FeatureScorer(CFG, weights_uri="s3://bucket/bad.npz",
                      cache_dir=cache, fetch_fn=fetch_bad)
