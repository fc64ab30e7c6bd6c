"""Edge inputs: empty tables, snapshot-only conversations, single-turn
conversations, config validation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.config import (
    FeatureConfig,
    PartitionConfig,
)
from dane_visual_feature_extraction_worker_ray.stages.transcript_features import (
    compute_features,
)


def _turns(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([f"t{r[1]}" for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array(
                np.array([r[2] for r in rows], dtype=np.int64),
                pa.timestamp("us"),
            ),
        }
    )


def _snaps(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype=np.int64),
                pa.timestamp("us"),
            ),
            "snap_val": pa.array([float(r[2]) for r in rows]),
            "snap_tag": pa.array(["x"] * len(rows), pa.string()),
        }
    )


def test_empty_turns():
    out = compute_features(
        rd.from_arrow(_turns([])), None, pcfg=PartitionConfig(num_buckets=4)
    ).to_pandas()
    assert len(out) == 0


def test_snapshot_only_conversation_emits_nothing():
    t = _turns([("a", 0, 1000)])
    s = _snaps([("a", 500, 1.0), ("ghost", 100, 2.0)])
    out = compute_features(
        rd.from_arrow(t), rd.from_arrow(s), pcfg=PartitionConfig(num_buckets=4)
    ).to_pandas()
    assert list(out["conv_id"]) == ["a"]
    assert out["snap_val_asof"].iloc[0] == 1.0


def test_single_turn_conversations():
    t = _turns([("a", 0, 10), ("b", 0, 20), ("c", 0, 30)])
    out = (
        compute_features(
            rd.from_arrow(t), None, pcfg=PartitionConfig(num_buckets=2)
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert out["lag_ts_delta_s"].isna().all()
    assert out["next_role"].isna().all()
    assert (out["session_id"] == 0).all()
    assert (out["w_turn_count"] == 1).all()
    assert (out["tw_turn_count"] == 1).all()


def test_config_validation():
    with pytest.raises(ValueError):
        FeatureConfig(session_gap_us=0)
    with pytest.raises(ValueError):
        FeatureConfig(row_window=0)
    with pytest.raises(ValueError):
        PartitionConfig(num_buckets=0)
    with pytest.raises(ValueError):
        PartitionConfig(salt_threshold=10, salt_chunk=100)


def test_layered_config_round_trip(tmp_path):
    """YAML base → overlay → kwarg overrides, later layers win; unknown
    sections/keys fail fast; values re-validated by the dataclasses."""
    from dane_visual_feature_extraction_worker_ray.config import (
        load_config,
    )

    base = tmp_path / "base.yml"
    base.write_text(
        "features:\n  row_window: 3\n  feature_dim: 8\n"
        "partitioning:\n  num_buckets: 16\n"
    )
    overlay = tmp_path / "site.yml"
    overlay.write_text("features:\n  row_window: 7\n")

    cfg = load_config(base, overlay, partitioning__num_buckets=32)
    assert cfg.features.row_window == 7  # overlay beat base
    assert cfg.features.feature_dim == 8  # base survives
    assert cfg.partitioning.num_buckets == 32  # kwarg beat file
    assert cfg.partitioning.salt_chunk == 100_000  # untouched default

    # defaults only
    d = load_config()
    assert d.features.row_window == 5

    with pytest.raises(ValueError, match="unknown config section"):
        load_config({"nope": {}})
    with pytest.raises(ValueError, match="unknown key"):
        load_config({"features": {"row_windw": 5}})
    with pytest.raises(ValueError, match="section__key"):
        load_config(row_window=5)
    with pytest.raises(ValueError):  # dataclass validation still runs
        load_config({"features": {"row_window": 0}})
