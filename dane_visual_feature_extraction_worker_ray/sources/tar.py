"""Tar.gz media archives → the engine's media table, Ray-natively.

The reference stages every job through disk: download tar.gz from S3,
``tarfile.extractall`` into an input dir, then glob filenames back into
a keyed index (``/root/reference/io_util.py:299-302``,
``data_handling.py:30-51``). The Ray-native form needs no staging:
``ray.data.read_binary_files`` streams whole archives as binary rows
through the object store, and each map task expands ITS archive
in memory with the stdlib ``tarfile`` — one task per archive, archives
pipelined by the streaming executor, no shared filesystem.

Member-name convention (mirrors the reference's metadata-in-filename
scheme — ``<ts>.jpg`` keyframes, ``<ts>_<hz>.npz`` spectrograms)::

    <asset_id>/<modality>/<ts_us>_<width>x<height>_<sample_rate>.bin

Scale note: one archive = one task's working set, so archive size is
the memory knob (the reference has the same granularity: one source's
tar). At 100 TB, millions of archives stream through
``read_binary_files``'s lazy file listing; nothing is globbed to the
driver beyond the path listing itself.
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile

import numpy as np
import pyarrow as pa

from ..stages.multimodal import media_schema


def member_name(
    asset_id: str, modality: str, ts_us: int,
    width: int, height: int, sample_rate: int,
) -> str:
    return f"{asset_id}/{modality}/{ts_us}_{width}x{height}_{sample_rate}.bin"


def parse_member_name(name: str) -> dict:
    """Inverse of :func:`member_name`; raises ValueError on a name that
    doesn't follow the convention (corrupt archives fail loudly, the
    same policy as the reference's keyframe-filename parse)."""
    parts = name.split("/")
    if len(parts) != 3 or not parts[2].endswith(".bin"):
        raise ValueError(f"unrecognized media member name: {name!r}")
    asset_id, modality, leaf = parts
    try:
        ts_s, dims, sr_s = leaf[: -len(".bin")].split("_")
        w_s, h_s = dims.split("x")
        return {
            "asset_id": asset_id,
            "modality": modality,
            "ts": int(ts_s),
            "width": int(w_s),
            "height": int(h_s),
            "sample_rate": int(sr_s),
        }
    except ValueError as e:
        raise ValueError(f"unrecognized media member name: {name!r}") from e


def write_media_tarballs(
    media_tbl: pa.Table, out_dir: str, assets_per_tar: int = 2
) -> list[str]:
    """Fixture/egress writer: pack a media table into ``.tar.gz``
    archives of ``assets_per_tar`` assets each (deterministic: assets
    sorted, members in (asset, ts, modality) order). Returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    aid = media_tbl.column("asset_id").to_numpy(zero_copy_only=False)
    ts = media_tbl.column("ts").cast(pa.int64()).to_numpy()
    mod = media_tbl.column("modality").to_numpy(zero_copy_only=False)
    order = np.lexsort((mod, ts, aid))
    assets = sorted(set(aid))
    groups = [
        assets[i : i + assets_per_tar]
        for i in range(0, len(assets), assets_per_tar)
    ]
    paths = []
    by_asset: dict[str, list[int]] = {}
    for i in order:
        by_asset.setdefault(aid[i], []).append(int(i))
    w = media_tbl.column("width").cast(pa.int32()).to_numpy()
    h = media_tbl.column("height").cast(pa.int32()).to_numpy()
    sr = media_tbl.column("sample_rate").cast(pa.int32()).to_numpy()
    payload = media_tbl.column("payload")
    for g, group in enumerate(groups):
        path = os.path.join(out_dir, f"media-{g:05d}.tar.gz")
        # mtime=0 in the gzip header → byte-stable archives across runs
        with open(path, "wb") as raw:
            with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as gz:
                with tarfile.open(fileobj=gz, mode="w") as tf:
                    for a in group:
                        for i in by_asset.get(a, []):
                            data = payload[i].as_py() or b""
                            info = tarfile.TarInfo(
                                member_name(
                                    aid[i], mod[i], int(ts[i]),
                                    int(w[i]), int(h[i]), int(sr[i]),
                                )
                            )
                            info.size = len(data)
                            info.mtime = 0
                            tf.addfile(info, io.BytesIO(data))
        paths.append(path)
    return paths


def read_media_tarballs(paths):
    """Ray-native S4: stream ``.tar.gz`` archives → media-schema rows,
    extracting IN MEMORY inside map tasks (no disk staging, unlike the
    reference's ``extractall``). ``paths`` is a directory or list of
    archive paths. Returns a Dataset with :func:`media_schema`."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    schema = media_schema()

    def _extract(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in schema.names}
        for blob in batch.column("bytes"):
            data = blob.as_py()
            with tarfile.open(
                fileobj=io.BytesIO(data), mode="r:*"
            ) as tf:
                for m in tf:
                    if not m.isfile():
                        continue
                    meta = parse_member_name(m.name)
                    f = tf.extractfile(m)
                    rows["asset_id"].append(meta["asset_id"])
                    rows["ts"].append(meta["ts"])
                    rows["modality"].append(meta["modality"])
                    rows["payload"].append(f.read() if f else b"")
                    rows["width"].append(meta["width"])
                    rows["height"].append(meta["height"])
                    rows["sample_rate"].append(meta["sample_rate"])
        return pa.table(
            {
                "asset_id": pa.array(rows["asset_id"], pa.string()),
                "ts": pa.array(rows["ts"], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "modality": pa.array(rows["modality"], pa.string()),
                "payload": pa.array(rows["payload"], pa.binary()),
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
            }
        )

    return ds.map_batches(_extract, batch_format="pyarrow")
