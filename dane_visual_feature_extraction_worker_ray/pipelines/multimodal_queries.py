"""Multimodal suite queries. Real binary decode is stubbed (no codecs
in this container; see stages/multimodal.py) — most queries are
rows-only with pytest oracles, but ``media_decode_check`` is
rows+schema+hash: the deterministic length-based mock decode makes the
full real-decoder path SQL-expressible (round-4, verdict #5)."""

from __future__ import annotations

import os

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
    expensive stage. Round-4: hash-exact — the sampled set is
    SQL-expressible (``dense_rank`` over distinct timestamps per
    asset) and the real-decoder checksum trick from
    ``media_decode_check`` verifies the decode output on the kept
    frames."""
    from ..sources.parquet import read_parquet_tuned
    from ..stages.multimodal import mock_decode_fn, sample_frames

    media = read_parquet_tuned(ensure_media_fixture())
    sampled = sample_frames(media, every_n=2, num_partitions=8)
    feats = extract_media_features(
        sampled, decoder="real", decode_fn=mock_decode_fn, project=False,
        concurrency=2, num_partitions=8,
    )
    return _checksum_features(feats)


QUERIES = {
    "media_features": q_media_features,
    "media_features_real": q_media_features_real,
    "media_frame_sample": q_media_frame_sample,
}
ORACLE_SQL: dict[str, str] = {}


def q_media_tar_ingest(sf_dir: str):
    """S4 (tar.gz extraction) run for real in the driver gate: the
    parquet media fixture is packed into ``.tar.gz`` archives (stable
    bytes — gzip mtime pinned), streamed back through
    ``sources/tar.read_media_tarballs`` (in-memory stdlib ``tarfile``
    inside map tasks — no disk staging, unlike the reference's
    ``extractall``, io_util.py:299-302), and projected to the metadata
    columns. Round-4: hash-exact — the round trip must reproduce the
    fixture table's metadata exactly, which DuckDB reads straight from
    the source parquet; the payload-byte equality half stays in
    tests/test_multimodal.py."""
    import tempfile

    import pyarrow.parquet as pq

    from ..sources.tar import read_media_tarballs, write_media_tarballs

    tbl = pq.read_table(ensure_media_fixture())
    out_dir = os.path.join(tempfile.gettempdir(), "graft_media_tars_fx")
    paths = write_media_tarballs(tbl, out_dir, assets_per_tar=2)
    return read_media_tarballs(paths).select_columns(
        ["asset_id", "ts", "modality", "width", "height", "sample_rate"]
    )


QUERIES["media_tar_ingest"] = q_media_tar_ingest


# --------------------------------------------------------------------------
# media decode oracle (round-4, verdict #5): the real-decoder media
# pipeline moves from rows-only to rows+schema+hash — the gate analog of
# the reference's golden feature test
# (/root/reference/tests/unit/feature_extraction_test.py:51-60).

_FIXTURE_ASSETS = 8
_FIXTURE_FRAMES = 12


def ensure_media_fixture() -> str:
    """Write the deterministic media corpus (varied payload lengths) as
    a parquet fixture under /tmp — the table DuckDB reads for the media
    oracle. Atomic rename; content is a pure function of the seed, so
    concurrent writers produce identical bytes."""
    import tempfile

    import pyarrow.parquet as pq

    d = os.path.join(tempfile.gettempdir(), "graft_media_fixture")
    p = os.path.join(
        d, f"media_{_FIXTURE_ASSETS}x{_FIXTURE_FRAMES}_seed42_v1.parquet"
    )
    if not os.path.isfile(p):
        os.makedirs(d, exist_ok=True)
        tmp = p + f".tmp.{os.getpid()}"
        pq.write_table(
            synthesize_media_table(
                n_assets=_FIXTURE_ASSETS,
                frames_per_asset=_FIXTURE_FRAMES,
                vary_payload_len=True,
            ),
            tmp,
        )
        os.replace(tmp, p)
    return p


def _checksum_features(feats):
    """Integer checksums of the unprojected image/audio halves —
    per-element ``round(v*100)`` is exact (mock values are <0.9 with
    float32 error ≪ the 0.01 quantum), so the sums equal
    ``32*(len%7)+496`` / ``16*(len%7)+120`` in SQL."""
    import numpy as np
    import pyarrow as pa

    from ..stages.multimodal import MediaFeatureExtractor

    d_img = MediaFeatureExtractor.IMAGE_DIM
    d_all = d_img + MediaFeatureExtractor.AUDIO_DIM

    def _chk(tbl: pa.Table) -> pa.Table:
        flat = (
            tbl.column("media_vec")
            .combine_chunks()
            .flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(tbl.num_rows, d_all)
        )
        scaled = np.rint(flat.astype(np.float64) * 100.0).astype(np.int64)
        return pa.table(
            {
                "asset_id": tbl.column("asset_id"),
                "ts": tbl.column("ts"),
                "audio_present": tbl.column("audio_present"),
                "img_chk": pa.array(scaled[:, :d_img].sum(axis=1)),
                "aud_chk": pa.array(scaled[:, d_img:].sum(axis=1)),
            }
        )

    return feats.map_batches(_chk, batch_format="pyarrow")


def q_media_decode_check(sf_dir: str):
    """The full real-decoder media path — parquet read of binary
    payloads → hash-exchange co-location → actor-pool modality pivot +
    pluggable decode (``mock_decode_fn``, deterministic from
    ``octet_length``) — verified HASH-EXACTLY against SQL via
    :func:`_checksum_features`: with ``project=False`` the unprojected
    feature vector is closed-form in the payload length. Zero-fill of
    missing modalities and ``audio_present`` ride the same check."""
    from ..sources.parquet import read_parquet_tuned
    from ..stages.multimodal import extract_media_features, mock_decode_fn

    media = read_parquet_tuned(ensure_media_fixture())
    feats = extract_media_features(
        media, decoder="real", decode_fn=mock_decode_fn, project=False,
        concurrency=2, num_partitions=8,
    )
    return _checksum_features(feats)


def _media_oracle_sql(sample_every: int | None = None) -> str:
    p = ensure_media_fixture()
    if sample_every is None:
        src = f"SELECT * FROM read_parquet('{p}')"
    else:
        # sample_frames semantics: dense rank of distinct ts per asset,
        # keep (rank-1) % every_n == 0, BOTH modalities of a kept ts.
        src = f"""
SELECT raw.* FROM read_parquet('{p}') raw
JOIN (SELECT asset_id, ts FROM (
        SELECT asset_id, ts,
               dense_rank() OVER (PARTITION BY asset_id ORDER BY ts) AS dr
        FROM (SELECT DISTINCT asset_id, ts FROM read_parquet('{p}')))
      WHERE (dr - 1) % {sample_every} = 0) keep
USING (asset_id, ts)
""".strip()
    return f"""
WITH m AS ({src}),
img AS (SELECT asset_id, ts, octet_length(payload) AS len
        FROM m WHERE modality = 'image'),
aud AS (SELECT asset_id, ts, octet_length(payload) AS len
        FROM m WHERE modality = 'audio'),
k AS (SELECT DISTINCT asset_id, ts FROM m)
SELECT k.asset_id, k.ts,
  a.len IS NOT NULL AS audio_present,
  CAST(CASE WHEN i.len > 0 THEN 32 * (i.len % 7) + 496 ELSE 0 END
       AS BIGINT) AS img_chk,
  CAST(CASE WHEN a.len > 0 THEN 16 * (a.len % 7) + 120 ELSE 0 END
       AS BIGINT) AS aud_chk
FROM k
LEFT JOIN img i ON k.asset_id = i.asset_id AND k.ts = i.ts
LEFT JOIN aud a ON k.asset_id = a.asset_id AND k.ts = a.ts
""".strip()


def _tar_ingest_oracle_sql() -> str:
    p = ensure_media_fixture()
    return (
        "SELECT asset_id, ts, modality, width, height, sample_rate "
        f"FROM read_parquet('{p}')"
    )


QUERIES["media_decode_check"] = q_media_decode_check
ORACLE_SQL["media_decode_check"] = _media_oracle_sql()
ORACLE_SQL["media_frame_sample"] = _media_oracle_sql(sample_every=2)
ORACLE_SQL["media_tar_ingest"] = _tar_ingest_oracle_sql()


SHOT_DIFF_THRESHOLD = 128  # checksum units: splits the fixture's
# two observed inter-frame jumps (64 vs 160) so the gate is non-vacuous


def q_media_shot_boundaries(sf_dir: str):
    """Shot-boundary detection — the reference's own domain (its shot
    intervals arrive precomputed, S7; here the engine DERIVES them):
    a boundary is a frame whose image-feature change vs the previous
    frame exceeds a threshold. Runs on the real-decoder path
    (pluggable ``mock_decode_fn``), so the integer checksum trick
    makes the whole detector hash-exact against SQL: the frame
    feature's checksum is closed-form in octet_length, and the
    boundary rule is a lag() window on it.

    Scale shape: frames of one asset are co-located by the SAME
    asset_id exchange the extractor pool uses; the detector is one
    lexsort + vectorized diff per partition — no second shuffle."""
    import numpy as np
    import pyarrow as pa

    from ..sources.parquet import read_parquet_tuned
    from ..stages.exchange import hash_grouped_map
    from ..stages.multimodal import extract_media_features, mock_decode_fn

    media = read_parquet_tuned(ensure_media_fixture())
    feats = extract_media_features(
        media, decoder="real", decode_fn=mock_decode_fn, project=False,
        concurrency=2, num_partitions=8,
    )
    chk = _checksum_features(feats)

    out_schema = pa.schema(
        [
            ("asset_id", pa.string()),
            ("ts", pa.int64()),
            ("img_diff", pa.int64()),
            ("is_boundary", pa.bool_()),
        ]
    )

    def _detect(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        chv = g.column("img_chk").to_numpy()
        order = np.argsort(ts, kind="stable")
        ts, chv = ts[order], chv[order]
        diff = np.zeros(len(ts), np.int64)
        diff[1:] = np.abs(chv[1:] - chv[:-1])
        aid = g.column("asset_id").to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {
                "asset_id": pa.array(aid, pa.string()),
                "ts": pa.array(ts),
                "img_diff": pa.array(diff),
                # the first frame of an asset always opens a shot
                "is_boundary": pa.array(
                    (diff >= SHOT_DIFF_THRESHOLD)
                    | (np.arange(len(ts)) == 0)
                ),
            }
        )

    return hash_grouped_map(
        chk, "asset_id", _detect, num_partitions=8,
        empty_schema=out_schema,
    )


def _shot_oracle_sql() -> str:
    p = ensure_media_fixture()
    return f"""
WITH m AS (SELECT * FROM read_parquet('{p}')),
img AS (SELECT asset_id, ts, octet_length(payload) AS len
        FROM m WHERE modality = 'image'),
k AS (SELECT DISTINCT asset_id, ts FROM m),
chk AS (
  SELECT k.asset_id, k.ts,
    CAST(CASE WHEN i.len > 0 THEN 32 * (i.len % 7) + 496 ELSE 0 END
         AS BIGINT) AS img_chk
  FROM k LEFT JOIN img i ON k.asset_id = i.asset_id AND k.ts = i.ts
), lagged AS (
  SELECT asset_id, CAST(epoch_us(ts) AS BIGINT) AS ts,
    CAST(coalesce(abs(img_chk - lag(img_chk) OVER w), 0) AS BIGINT)
      AS img_diff,
    lag(img_chk) OVER w IS NULL AS first_frame
  FROM chk
  WINDOW w AS (PARTITION BY asset_id ORDER BY ts)
)
SELECT asset_id, ts, img_diff,
  img_diff >= {SHOT_DIFF_THRESHOLD} OR first_frame AS is_boundary
FROM lagged
""".strip()


QUERIES["media_shot_boundaries"] = q_media_shot_boundaries
ORACLE_SQL["media_shot_boundaries"] = _shot_oracle_sql()


def q_media_keyframes(sf_dir: str):
    """Keyframe selection — the reference's literal input object
    (keyframe JPEGs, S5) DERIVED by the engine: shots come from the
    boundary detector, and each shot's keyframe is its most-changed
    frame (max img_diff, earliest ts on ties; a shot's opening frame
    for single-frame shots). Same asset co-location, one extra
    vectorized pass: shot ids are a boundary cumsum, the argmax is a
    lexsort run-reduce. Hash-exact via the same closed-form checksum."""
    import numpy as np
    import pyarrow as pa

    from ..stages.exchange import hash_grouped_map

    bounds = q_media_shot_boundaries(sf_dir)

    out_schema = pa.schema(
        [
            ("asset_id", pa.string()),
            ("shot_id", pa.int64()),
            ("keyframe_ts", pa.int64()),
            ("n_frames", pa.int64()),
            ("max_diff", pa.int64()),
        ]
    )

    def _keyframes(g: pa.Table) -> pa.Table:
        ts = g.column("ts").to_numpy()
        diff = g.column("img_diff").to_numpy()
        isb = g.column("is_boundary").to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts, diff, isb = ts[order], diff[order], isb[order]
        shot = np.cumsum(isb.astype(np.int64)) - 1
        n_shots = int(shot[-1]) + 1 if len(shot) else 0
        # per shot: max diff, tie -> earliest ts (lexsort by
        # (shot, -diff, ts) then take run firsts)
        o2 = np.lexsort((ts, -diff, shot))
        s2, d2, t2 = shot[o2], diff[o2], ts[o2]
        first = np.ones(len(s2), dtype=bool)
        first[1:] = s2[1:] != s2[:-1]
        starts = np.flatnonzero(first)
        counts = np.bincount(shot, minlength=n_shots)
        aid = g.column("asset_id").to_numpy(zero_copy_only=False)[0]
        return pa.table(
            {
                "asset_id": pa.array([aid] * n_shots, pa.string()),
                "shot_id": pa.array(s2[starts]),
                "keyframe_ts": pa.array(t2[starts]),
                "n_frames": pa.array(counts.astype(np.int64)),
                "max_diff": pa.array(d2[starts]),
            }
        )

    return hash_grouped_map(
        bounds, "asset_id", _keyframes, num_partitions=8,
        empty_schema=out_schema,
    )


def _keyframes_oracle_sql() -> str:
    return f"""
WITH lagged AS ({_shot_oracle_sql()}),
shots AS (
  SELECT asset_id, ts, img_diff,
    CAST(sum(CASE WHEN is_boundary THEN 1 ELSE 0 END) OVER (
      PARTITION BY asset_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
      AS BIGINT) AS shot_id
  FROM lagged
)
SELECT asset_id, shot_id,
  CAST(min(ts ORDER BY img_diff DESC, ts) FILTER (WHERE rn = 1)
       AS BIGINT) AS keyframe_ts,
  CAST(count(*) AS BIGINT) AS n_frames,
  CAST(max(img_diff) AS BIGINT) AS max_diff
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY asset_id, shot_id
    ORDER BY img_diff DESC, ts) AS rn
  FROM shots
)
GROUP BY asset_id, shot_id
""".strip()


QUERIES["media_keyframes"] = q_media_keyframes
ORACLE_SQL["media_keyframes"] = _keyframes_oracle_sql()
