"""Skew salting: salted mega-conversation output must be bit-identical
to the unsalted kernel and the oracle (SURVEY.md §7.4 hard part)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.config import (
    FeatureConfig,
    PartitionConfig,
)
from dane_visual_feature_extraction_worker_ray.oracle.pandas_oracle import (
    oracle_features,
)
from dane_visual_feature_extraction_worker_ray.sources.synthetic import (
    make_snapshots,
    make_transcripts,
)
from dane_visual_feature_extraction_worker_ray.stages.salting import (
    compute_features_auto,
    detect_mega_conversations,
)
from dane_visual_feature_extraction_worker_ray.stages.transcript_features import (
    compute_features,
)

CFG = FeatureConfig()
# small chunks so the mega conversation splits into many chunks
PCFG_SALT = PartitionConfig(num_buckets=8, salt_threshold=200, salt_chunk=60)
PCFG_OFF = PartitionConfig(num_buckets=8)  # default huge threshold


@pytest.fixture(scope="module")
def skew_corpus():
    t = make_transcripts(n_convs=20, seed=7, mega_conv=True, mega_turns=700)
    s = make_snapshots(n_convs=20, seed=7, transcripts=t)
    return t, s


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(
        ["conv_id", "turn_idx"], kind="mergesort"
    ).reset_index(drop=True)


def test_detection(skew_corpus):
    turns, _ = skew_corpus
    mega = detect_mega_conversations(rd.from_arrow(turns), 200)
    assert list(mega["conv_id"]) == ["conv-000000"]
    assert mega["n_rows"].iloc[0] >= 700


def test_salted_equals_unsalted(skew_corpus):
    turns, snaps = skew_corpus
    salted = canon(
        compute_features_auto(
            rd.from_arrow(turns), rd.from_arrow(snaps), CFG, PCFG_SALT
        ).to_pandas()
    )
    plain = canon(
        compute_features(
            rd.from_arrow(turns), rd.from_arrow(snaps), CFG, PCFG_OFF
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(salted, plain)


def test_salted_matches_oracle(skew_corpus):
    turns, snaps = skew_corpus
    salted = canon(
        compute_features_auto(
            rd.from_arrow(turns), rd.from_arrow(snaps), CFG, PCFG_SALT
        ).to_pandas()
    )
    exp = canon(oracle_features(turns.to_pandas(), snaps.to_pandas(), CFG))
    assert len(salted) == len(exp)
    for c in ["conv_id", "turn_idx", "text", "session_id", "turn_in_session",
              "w_turn_count", "tw_turn_count"]:
        assert (
            salted[c].to_numpy(dtype=object) == exp[c].to_numpy(dtype=object)
        ).all(), c
    for c in ["lag_ts_delta_s", "w_tool_rate", "w_latency_mean_s",
              "snap_val_asof", "snap_age_s"]:
        a = salted[c].to_numpy(dtype=np.float64)
        b = exp[c].to_numpy(dtype=np.float64)
        assert np.allclose(a, b, equal_nan=True), c
    for c in ["prev_role", "next_role", "ffill_tool", "snap_tag_asof"]:
        g = salted[c].to_numpy(dtype=object)
        e = exp[c].to_numpy(dtype=object)
        same = [
            (pd.isna(x) and pd.isna(y)) or x == y for x, y in zip(g, e)
        ]
        assert all(same), c


def test_equal_ts_run_spanning_many_chunks():
    """An equal-ts run longer than salt_chunk spans >1 chunk boundary;
    tw_turn_count must still count every forward peer (regression: only
    the immediately-next chunk's leading run was credited)."""
    import pyarrow as pa

    n = 250
    same_ts = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "conv_id": pa.array(["conv-eq"] * n, pa.string()),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
            "role": pa.array(
                np.array(["user", "assistant"], object)[np.arange(n) % 2]
            ),
            "text": pa.array([f"t{i}" for i in range(n)], pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(
                np.full(n, same_ts, np.int64), pa.timestamp("us")
            ),
        }
    )
    pcfg = PartitionConfig(num_buckets=4, salt_threshold=100, salt_chunk=60)
    salted = canon(
        compute_features_auto(rd.from_arrow(tbl), None, CFG, pcfg).to_pandas()
    )
    plain = canon(
        compute_features(rd.from_arrow(tbl), None, CFG, PCFG_OFF).to_pandas()
    )
    assert (salted["tw_turn_count"] == n).all()
    pd.testing.assert_frame_equal(salted, plain)


def test_partial_equal_ts_tail_across_chunks():
    """Equal-ts run covering the tail of one chunk and two full later
    chunks; earlier distinct-ts rows must be unaffected."""
    import pyarrow as pa

    n = 260
    run_start = 50  # rows 50..259 share one ts → run of 210 > 3 chunks
    base = 1_700_000_000_000_000
    ts = np.where(
        np.arange(n) < run_start,
        base + np.arange(n) * 2_000_000,
        base + run_start * 2_000_000,
    ).astype(np.int64)
    tbl = pa.table(
        {
            "conv_id": pa.array(["conv-eq2"] * n, pa.string()),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
            "role": pa.array(
                np.array(["user", "assistant"], object)[np.arange(n) % 2]
            ),
            "text": pa.array([f"t{i}" for i in range(n)], pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    pcfg = PartitionConfig(num_buckets=4, salt_threshold=100, salt_chunk=60)
    salted = canon(
        compute_features_auto(rd.from_arrow(tbl), None, CFG, pcfg).to_pandas()
    )
    plain = canon(
        compute_features(rd.from_arrow(tbl), None, CFG, PCFG_OFF).to_pandas()
    )
    pd.testing.assert_frame_equal(salted, plain)


def test_no_skew_falls_through(skew_corpus):
    turns, snaps = skew_corpus
    a = canon(
        compute_features_auto(
            rd.from_arrow(turns), rd.from_arrow(snaps), CFG, PCFG_OFF
        ).to_pandas()
    )
    b = canon(
        compute_features(
            rd.from_arrow(turns), rd.from_arrow(snaps), CFG, PCFG_OFF
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)
