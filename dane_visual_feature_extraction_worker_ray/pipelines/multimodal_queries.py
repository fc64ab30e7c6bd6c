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
    return extract_media_features(media, concurrency=2)


QUERIES = {"media_features": q_media_features}
ORACLE_SQL: dict[str, str] = {}
