"""Multimodal suite query (rows-only: binary decode is stubbed —
real codecs are unavailable in this container; see
stages/multimodal.py. Correctness of the plumbing is covered by
tests/test_multimodal.py)."""

from __future__ import annotations

import ray.data as rd

from ..stages.multimodal import extract_media_features, synthesize_media_table


def q_media_features(sf_dir: str):
    """Per-(asset, ts) media feature vectors over a deterministic
    synthetic media corpus (sf_dir unused — the driver tables carry no
    binary columns; scale tier is fixed and seeded)."""
    media = rd.from_arrow(synthesize_media_table(n_assets=8, frames_per_asset=12))
    return extract_media_features(media, concurrency=2, num_partitions=8)


def q_media_features_real(sf_dir: str):
    """The ``decoder="real"`` contract exercised end-to-end in the
    driver gate (not just pytest): the pluggable decode_fn — here the
    deterministic ``mock_decode_fn`` standing in for
    torchvision.io.read_image / librosa (reference integration point
    ``data_handling.py:86-109``) — rides the full exchange + actor-pool
    path and must produce one feature row per (asset, ts)."""
    from ..stages.multimodal import mock_decode_fn

    media = rd.from_arrow(
        synthesize_media_table(n_assets=8, frames_per_asset=12)
    )
    return extract_media_features(
        media, decoder="real", decode_fn=mock_decode_fn,
        concurrency=2, num_partitions=8,
    )


def q_media_frame_sample(sf_dir: str):
    """Frame-sampled media features: every 2nd distinct timestamp per
    asset kept (both modalities), then the extractor pool — the
    decode-volume-reduction path a video pipeline runs before the
    expensive stage (rows-only; same seeded corpus)."""
    from ..stages.multimodal import sample_frames

    media = rd.from_arrow(
        synthesize_media_table(n_assets=8, frames_per_asset=12)
    )
    sampled = sample_frames(media, every_n=2, num_partitions=8)
    return extract_media_features(sampled, concurrency=2, num_partitions=8)


QUERIES = {
    "media_features": q_media_features,
    "media_features_real": q_media_features_real,
    "media_frame_sample": q_media_frame_sample,
}
ORACLE_SQL: dict[str, str] = {}


def q_media_tar_ingest(sf_dir: str):
    """S4 (tar.gz extraction) run for real in the driver gate: the
    seeded media corpus is packed into ``.tar.gz`` archives (stable
    bytes — gzip mtime pinned), streamed back through
    ``sources/tar.read_media_tarballs`` (in-memory stdlib ``tarfile``
    inside map tasks — no disk staging, unlike the reference's
    ``extractall``, io_util.py:299-302), and projected to the metadata
    columns. Rows-only (no media table in the oracle views); the
    bit-exact round trip vs the source table is asserted in
    tests/test_multimodal.py."""
    import os
    import tempfile

    from ..sources.tar import read_media_tarballs, write_media_tarballs

    tbl = synthesize_media_table(n_assets=8, frames_per_asset=12)
    out_dir = os.path.join(tempfile.gettempdir(), "graft_media_tars")
    paths = write_media_tarballs(tbl, out_dir, assets_per_tar=2)
    return read_media_tarballs(paths).select_columns(
        ["asset_id", "ts", "modality", "width", "height", "sample_rate"]
    )


QUERIES["media_tar_ingest"] = q_media_tar_ingest
