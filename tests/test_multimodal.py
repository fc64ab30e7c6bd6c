"""Multimodal plumbing: schema, modality merge, zero-fill, actor-pool
stage, determinism — with the stub decoder (real codecs unavailable)."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.multimodal import (
    MediaFeatureExtractor,
    extract_media_features,
    media_schema,
    mock_decode_fn,
    synthesize_media_table,
)


def test_real_decoder_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decoder="real")


def test_real_decoder_plumbing_with_mock():
    """decoder="real" with an injected decode_fn must run the full
    actor-pool path end-to-end (exercises the integration contract the
    stub otherwise bypasses). The mock lives in the library module so
    Ray workers can deserialize it by import path."""
    t = synthesize_media_table(n_assets=2, frames_per_asset=6)
    out = (
        extract_media_features(
            rd.from_arrow(t), decoder="real", decode_fn=mock_decode_fn
        )
        .to_pandas()
        .sort_values(["asset_id", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    n_keys = t.to_pandas()[["asset_id", "ts"]].drop_duplicates().shape[0]
    assert len(out) == n_keys
    vecs = np.vstack(out["media_vec"].to_numpy())
    assert vecs.shape[1] == (
        MediaFeatureExtractor.IMAGE_DIM + MediaFeatureExtractor.AUDIO_DIM
    )
    assert np.isfinite(vecs).all()
    # missing audio still zero-filled through the real path
    assert (~out["audio_present"]).any()


def test_real_decoder_shape_contract_enforced():
    ex = MediaFeatureExtractor(
        decoder="real", decode_fn=lambda p, m, d: np.zeros((1, 1), np.float32)
    )
    t = synthesize_media_table(n_assets=1, frames_per_asset=2)
    with pytest.raises(ValueError, match="decode_fn returned"):
        ex(t)


def test_schema_and_corpus():
    t = synthesize_media_table()
    assert t.schema.equals(media_schema())
    mods = set(t.column("modality").to_pylist())
    assert mods == {"image", "audio"}


def test_extract_features_merges_and_zero_fills():
    t = synthesize_media_table(n_assets=3, frames_per_asset=8)
    out = (
        extract_media_features(rd.from_arrow(t), concurrency=2)
        .to_pandas()
        .sort_values(["asset_id", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    # one output row per (asset, ts) regardless of modality count
    n_keys = t.to_pandas()[["asset_id", "ts"]].drop_duplicates().shape[0]
    assert len(out) == n_keys
    vecs = np.vstack(out["media_vec"].to_numpy())
    assert vecs.shape == (
        n_keys,
        MediaFeatureExtractor.IMAGE_DIM + MediaFeatureExtractor.AUDIO_DIM,
    )
    # missing-audio rows exist (generator drops ~20%) and are flagged
    assert (~out["audio_present"]).any()
    assert out["audio_present"].any()


def test_deterministic_across_runs():
    t = synthesize_media_table(n_assets=2, frames_per_asset=5)
    a = (
        extract_media_features(rd.from_arrow(t))
        .to_pandas()
        .sort_values(["asset_id", "ts"])
        .reset_index(drop=True)
    )
    b = (
        extract_media_features(rd.from_arrow(t), concurrency=1)
        .to_pandas()
        .sort_values(["asset_id", "ts"])
        .reset_index(drop=True)
    )
    assert np.allclose(
        np.vstack(a["media_vec"].to_numpy()),
        np.vstack(b["media_vec"].to_numpy()),
    )


def test_sample_frames_every_n():
    from dane_visual_feature_extraction_worker_ray.stages.multimodal import (
        sample_frames,
    )

    t = synthesize_media_table(n_assets=3, frames_per_asset=10)
    out = sample_frames(rd.from_arrow(t), every_n=3, num_partitions=4).to_pandas()
    src = t.to_pandas()
    src["ts_i"] = src["ts"].astype("int64")
    out["ts_i"] = out["ts"].astype("int64")
    for aid, g in src.groupby("asset_id"):
        distinct_ts = np.sort(g["ts_i"].unique())
        kept_ts = set(distinct_ts[::3])
        got = out[out["asset_id"] == aid]
        assert set(got["ts_i"].unique()) == kept_ts
        # both modalities of a kept timestamp survive
        for ts in kept_ts:
            exp_mods = set(g[g["ts_i"] == ts]["modality"])
            assert set(got[got["ts_i"] == ts]["modality"]) == exp_mods


def test_sample_frames_then_extract_pipeline():
    from dane_visual_feature_extraction_worker_ray.stages.multimodal import (
        sample_frames,
    )

    t = synthesize_media_table(n_assets=2, frames_per_asset=8)
    sampled = sample_frames(rd.from_arrow(t), every_n=2, num_partitions=4)
    out = extract_media_features(sampled, concurrency=2).to_pandas()
    n_keys = (
        sampled.to_pandas()[["asset_id", "ts"]].drop_duplicates().shape[0]
    )
    assert len(out) == n_keys


def test_resource_kwargs_reach_map_batches(monkeypatch):
    """GPU/resource passthrough (reference per-worker device pick,
    nn_models.py:287): num_gpus / ray_remote_args must reach the
    actor-pool map_batches call on both stateful stages."""
    from dane_visual_feature_extraction_worker_ray.stages import (
        exchange,
        multimodal,
        scorer,
    )

    captured = {}

    class _StubDS:
        def map_batches(self, *a, **kw):
            captured.update(kw)
            return "ok"

    monkeypatch.setattr(
        exchange, "hash_exchange", lambda *a, **kw: _StubDS()
    )
    out = multimodal.extract_media_features(
        _StubDS(), concurrency=3, num_gpus=0.5,
        ray_remote_args={"resources": {"accel": 1}},
    )
    assert out == "ok"
    assert captured["num_gpus"] == 0.5
    assert captured["resources"] == {"accel": 1}
    lo, hi = captured["concurrency"]
    assert hi == 3 and lo < hi  # autoscaling tuple, never a fixed pool
    # floor leaves >= 2 CPUs for the upstream read (deadlock guard)
    import ray

    assert lo <= max(1, int(ray.cluster_resources()["CPU"]) - 2)

    captured.clear()
    scorer.score_features(
        _StubDS(), num_gpus=1, ray_remote_args={"resources": {"accel": 2}}
    )
    assert captured["num_gpus"] == 1
    assert captured["resources"] == {"accel": 2}


def test_tar_media_roundtrip_and_features(ray_session, tmp_path):
    """S4 made real: pack the synthetic media corpus into tar.gz
    archives, stream them back through the Ray-native in-memory
    extractor, and verify the table round-trips bit-exact — then run
    the media feature extractor over the tar-sourced table."""
    import numpy as np
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.sources.tar import (
        read_media_tarballs,
        write_media_tarballs,
    )
    from dane_visual_feature_extraction_worker_ray.stages.multimodal import (
        extract_media_features,
        synthesize_media_table,
    )

    tbl = synthesize_media_table(n_assets=5, frames_per_asset=6)
    paths = write_media_tarballs(tbl, str(tmp_path / "tars"), assets_per_tar=2)
    assert len(paths) == 3

    got = (
        read_media_tarballs(paths)
        .to_pandas()
        .sort_values(["asset_id", "ts", "modality"])
        .reset_index(drop=True)
    )
    exp = (
        tbl.to_pandas()
        .sort_values(["asset_id", "ts", "modality"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ["asset_id", "ts", "modality", "width", "height", "sample_rate"]:
        assert (got[c].values == exp[c].values).all(), c
    assert all(a == b for a, b in zip(got["payload"], exp["payload"]))

    feats = extract_media_features(read_media_tarballs(paths)).to_pandas()
    assert len(feats) > 0


def test_tar_member_name_parse_rejects_garbage():
    import pytest

    from dane_visual_feature_extraction_worker_ray.sources.tar import (
        parse_member_name,
    )

    with pytest.raises(ValueError):
        parse_member_name("not-a-media-member.txt")
    with pytest.raises(ValueError):
        parse_member_name("a/image/12_34.bin")
