from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    """Small deterministic transcript corpus (FIXTURES.md t2 tier)."""
    from dane_visual_feature_extraction_worker_ray.sources.synthetic import (
        make_snapshots,
        make_transcripts,
    )

    t = make_transcripts(n_convs=50, seed=42, mega_conv=True)
    s = make_snapshots(n_convs=50, seed=42, transcripts=t)
    return t, s


def assert_features_match(
    got: pd.DataFrame, exp: pd.DataFrame, float_cols, key_cols
):
    """Reference-style comparison: exact keys first, allclose features
    (mirrors /root/reference/tests/unit/feature_extraction_test.py:56-60)."""
    got = got.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
    exp = exp.sort_values(key_cols, kind="mergesort").reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in key_cols:
        pd.testing.assert_series_equal(
            got[c], exp[c], check_names=False, check_dtype=False
        )
    for c in float_cols:
        a = got[c].to_numpy(dtype=np.float64)
        b = exp[c].to_numpy(dtype=np.float64)
        assert np.allclose(a, b, equal_nan=True), c
