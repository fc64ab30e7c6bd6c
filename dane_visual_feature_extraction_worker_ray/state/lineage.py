"""Per-partition lineage records + checkpoint/resume output layout.

North-rule requirement: "every partition emits lineage records and
counters so the job resumes from per-partition checkpoints after
preemption." Reference analog: the per-source provenance chain
(``/root/reference/provenance.py:19-43``, ``models.py:19-43``) and
whole-source requeue as the only resume mechanism
(``worker.py:174-186``).

Layout (resumable, deterministic)::

    out_dir/
      bucket=0007/
        part.parquet        # features for every conversation hashed to 7
        _SUCCESS.json       # lineage: fingerprint, rows in/out, key
                            # range, content checksum, timings

A bucket directory is written to a temp name and atomically renamed, so
a preempted/retried task can never leave a half-written partition that
passes validation. Resume = list valid ``_SUCCESS.json`` files whose
input fingerprint matches, filter those buckets out of the shuffle
input, recompute only the rest. Outputs are bit-stable across retries
(deterministic kernel order, no wall-clock in the data path), so
resume produces the identical dataset.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import FeatureConfig, PartitionConfig
from ..functions.hashing import hash64
from .. import __version__


def _bucket_dir(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"bucket={bucket:05d}")


def content_checksum(tbl: pa.Table) -> str:
    """Order-insensitive checksum (hex uint64) over the partition keys."""
    if tbl.num_rows == 0:
        return "0"
    h = hash64(tbl.column("conv_id").to_pandas())
    tix = tbl.column("turn_idx").cast(pa.int64()).to_numpy().astype(np.uint64)
    ts = tbl.column("ts").cast(pa.int64()).to_numpy().astype(np.uint64)
    mixed = h ^ (tix * np.uint64(0x9E3779B97F4A7C15)) ^ ts
    return f"{int(np.bitwise_xor.reduce(mixed) ^ np.uint64(tbl.num_rows)):016x}"


def purge_mismatched_buckets(out_dir: str, fingerprint: str) -> int:
    """Delete bucket dirs whose ``_SUCCESS.json`` is missing, unreadable,
    or carries a DIFFERENT fingerprint. Must run at the start of every
    write: a regenerated input can hash its rows into a subset of the
    buckets, and the exchange's empty-partition pruning means the
    now-empty buckets would never be overwritten — ``read_checkpointed``
    would silently resurface the previous corpus's data from them.
    Returns the number of dirs removed."""
    n = 0
    if not os.path.isdir(out_dir):
        return n
    for name in os.listdir(out_dir):
        if not name.startswith("bucket=") or ".tmp." in name:
            continue
        d = os.path.join(out_dir, name)
        marker = os.path.join(d, "_SUCCESS.json")
        part = os.path.join(d, "part.parquet")
        keep = False
        if os.path.isfile(marker) and os.path.isfile(part):
            try:
                with open(marker) as f:
                    keep = json.load(f).get("fingerprint") == fingerprint
            except (ValueError, OSError):
                keep = False
        if not keep:
            shutil.rmtree(d, ignore_errors=True)
            n += 1
    return n


def list_completed_buckets(out_dir: str, fingerprint: str) -> set[int]:
    done: set[int] = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if not name.startswith("bucket="):
            continue
        if ".tmp." in name:
            # stale half-written dir from a task preempted before the
            # atomic rename: purge so it can never shadow real output
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
            continue
        marker = os.path.join(out_dir, name, "_SUCCESS.json")
        part = os.path.join(out_dir, name, "part.parquet")
        if not (os.path.isfile(marker) and os.path.isfile(part)):
            continue
        try:
            with open(marker) as f:
                rec = json.load(f)
            if rec.get("fingerprint") == fingerprint:
                done.add(int(name.split("=")[1]))
        except (ValueError, OSError):
            continue
    return done


def write_features_checkpointed(
    turns_ds,
    snapshots_ds,
    out_dir: str,
    cfg: FeatureConfig | None = None,
    pcfg: PartitionConfig | None = None,
    fingerprint: str = "",
    assign_turn_idx: bool = False,
    resume: bool = True,
):
    """Run the flagship pipeline, writing one parquet partition + one
    lineage record per bucket; skip buckets already completed for the
    same ``fingerprint``. Returns (lineage DataFrame, skipped buckets).
    """
    from ..stages.bucketing import add_bucket_column
    from ..stages.transcript_features import (
        _align_snaps,
        _align_turns,
        compute_bucket_features,
    )

    cfg = cfg or FeatureConfig()
    pcfg = pcfg or PartitionConfig()
    os.makedirs(out_dir, exist_ok=True)
    # stale-fingerprint dirs must go even when resume=False — a
    # regenerated input may leave some buckets empty (never
    # overwritten), and read_checkpointed reads every bucket dir
    purge_mismatched_buckets(out_dir, fingerprint)
    done = list_completed_buckets(out_dir, fingerprint) if resume else set()

    ds = turns_ds.map_batches(
        _align_turns,
        batch_format="pyarrow",
        fn_kwargs={"assign_turn_idx": assign_turn_idx},
    )
    if snapshots_ds is not None:
        ds = ds.union(
            snapshots_ds.map_batches(_align_snaps, batch_format="pyarrow")
        )
    if done:
        # only pay the bucket-assignment pass when there is something
        # to skip; the exchange re-derives the same hash internally
        ds = add_bucket_column(ds, pcfg.num_buckets)
        done_arr = pa.array(sorted(done), pa.int32())
        ds = ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t.column("bucket"), value_set=done_arr))
            ),
            batch_format="pyarrow",
        ).map_batches(
            lambda t: t.drop_columns(["bucket"]), batch_format="pyarrow"
        )

    def _kernel_write(bucket: int, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        rows_in = group.num_rows
        if "bucket" in group.column_names:
            group = group.drop_columns(["bucket"])
        feats = compute_bucket_features(group, cfg, assign_turn_idx)
        t_kernel = time.monotonic()
        final_dir = _bucket_dir(out_dir, bucket)
        tmp_dir = final_dir + f".tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(feats, os.path.join(tmp_dir, "part.parquet"))
        t_write = time.monotonic()
        conv_sorted = feats.column("conv_id")
        rec = {
            "bucket": bucket,
            "fingerprint": fingerprint,
            "engine_version": __version__,
            "rows_in": rows_in,
            "rows_out": feats.num_rows,
            "n_conversations": len(pc.unique(conv_sorted)),
            "conv_min": conv_sorted[0].as_py() if feats.num_rows else None,
            "conv_max": (
                conv_sorted[feats.num_rows - 1].as_py()
                if feats.num_rows
                else None
            ),
            "checksum": content_checksum(feats),
            "elapsed_s": round(time.monotonic() - t0, 4),
            # per-step provenance tree (reference analog: nested
            # activity records with per-step durations,
            # /root/reference/provenance.py:19-43, models.py:19-43)
            "steps": [
                {
                    "name": "compute_bucket_features",
                    "elapsed_s": round(t_kernel - t0, 4),
                    "rows_in": rows_in,
                    "rows_out": feats.num_rows,
                },
                {
                    "name": "write_parquet",
                    "elapsed_s": round(t_write - t_kernel, 4),
                    "rows_out": feats.num_rows,
                    "output_path": os.path.join(final_dir, "part.parquet"),
                },
            ],
        }
        with open(os.path.join(tmp_dir, "_SUCCESS.json"), "w") as f:
            json.dump(rec, f)
        if os.path.isdir(final_dir):  # retried task: idempotent overwrite
            shutil.rmtree(final_dir)
        os.rename(tmp_dir, final_dir)
        return pa.Table.from_pylist(
            [
                {
                    k: v
                    for k, v in rec.items()
                    if k not in ("fingerprint", "engine_version", "steps")
                }
            ]
        )

    from ..stages.exchange import hash_exchange

    lineage_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("rows_in", pa.int64()),
            ("rows_out", pa.int64()),
            ("n_conversations", pa.int64()),
            ("conv_min", pa.string()),
            ("conv_max", pa.string()),
            ("checksum", pa.string()),
            ("elapsed_s", pa.float64()),
        ]
    )

    def _kernel(p: int, table: pa.Table) -> pa.Table:
        if table.num_rows == 0:
            return lineage_schema.empty_table()
        return _kernel_write(p, table).cast(lineage_schema)

    lineage = hash_exchange(
        ds, "conv_id", pcfg.num_buckets, _kernel, empty_schema=lineage_schema
    ).to_pandas()
    write_job_manifest(out_dir, fingerprint, lineage, sorted(done))
    return lineage, sorted(done)


def write_job_manifest(
    out_dir: str, fingerprint: str, lineage, skipped: list[int]
) -> dict:
    """Persist one queryable job-summary record (reference analog: the
    per-job index result row, ``/root/reference/worker.py:93-114``)
    plus the aggregated step tree collected from every bucket's
    ``_SUCCESS.json`` provenance."""
    steps_agg: dict[str, dict] = {}
    for name in os.listdir(out_dir):
        if not name.startswith("bucket=") or ".tmp." in name:
            continue
        marker = os.path.join(out_dir, name, "_SUCCESS.json")
        try:
            with open(marker) as f:
                rec = json.load(f)
        except (ValueError, OSError):
            continue
        if rec.get("fingerprint") != fingerprint:
            continue
        for st in rec.get("steps", []):
            agg = steps_agg.setdefault(
                st["name"],
                {"name": st["name"], "elapsed_s": 0.0, "rows_out": 0,
                 "n_buckets": 0},
            )
            agg["elapsed_s"] = round(agg["elapsed_s"] + st["elapsed_s"], 4)
            agg["rows_out"] += int(st.get("rows_out", 0))
            agg["n_buckets"] += 1
    manifest = {
        "fingerprint": fingerprint,
        "engine_version": __version__,
        "output_dir": out_dir,
        "n_buckets": int(len(lineage)) + len(skipped),
        "n_computed": int(len(lineage)),
        "n_skipped": len(skipped),
        "rows_in": int(lineage["rows_in"].sum()) if len(lineage) else 0,
        "rows_out": int(lineage["rows_out"].sum()) if len(lineage) else 0,
        "elapsed_s_total": (
            round(float(lineage["elapsed_s"].sum()), 4) if len(lineage) else 0.0
        ),
        "steps": sorted(steps_agg.values(), key=lambda s: s["name"]),
    }
    tmp = os.path.join(out_dir, f"_JOB.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_JOB.json"))
    return manifest


def read_job_manifest(out_dir: str) -> dict | None:
    p = os.path.join(out_dir, "_JOB.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return json.load(f)


def read_checkpointed(out_dir: str) -> pa.Table:
    parts = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("bucket=") or ".tmp." in name:
            # '.tmp.' dirs are preempted tasks' half-writes awaiting the
            # atomic rename — reading them would double-count the bucket
            continue
        p = os.path.join(out_dir, name, "part.parquet")
        if os.path.isfile(p):
            parts.append(pq.read_table(p))
    return pa.concat_tables(parts) if parts else None


def write_partitioned_checkpointed(
    ds,
    key,
    num_buckets: int,
    out_dir: str,
    fingerprint: str = "",
    kernel=None,
    resume: bool = True,
):
    """Generic resumable partitioned writer: ANY dataset, ANY key.

    The flagship's checkpoint/resume layout (atomic-renamed
    ``bucket=NNNNN/`` dirs, ``_SUCCESS.json`` lineage markers,
    fingerprint-matched skip) generalized so every pipeline — curation
    output, dedup survivors, scored documents — gets the same
    preemption story. ``key`` is one column or a list (composite keys
    use the exchange's injective multi-column hash); ``kernel``
    optionally transforms each bucket's table before the write
    (identity default). Returns ``(lineage DataFrame, skipped)``.

    Resume correctness hinges on one invariant: the skip filter and
    the exchange assign buckets with the SAME hash
    (``bucket_of(hash64_columns(...))``) — asserted by
    ``tests/test_lineage_resume.py`` round-tripping a composite key.

    Deliberately NOT unified with :func:`write_features_checkpointed`:
    the flagship writer carries pipeline-specific provenance (per-step
    timing tree, conversation ranges, the turn-keyed checksum) that a
    generic key contract can't express; the shared protocol pieces —
    purge, completed-bucket listing, atomic rename, manifest — are the
    common helpers both call.
    """
    from ..functions.hashing import bucket_of, hash64_columns
    from ..stages.exchange import hash_exchange

    key_list = [key] if isinstance(key, str) else list(key)
    os.makedirs(out_dir, exist_ok=True)
    # stale-fingerprint dirs must go even when resume=False — a
    # regenerated input may leave some buckets empty (never
    # overwritten), and read_checkpointed reads every bucket dir
    purge_mismatched_buckets(out_dir, fingerprint)
    done = list_completed_buckets(out_dir, fingerprint) if resume else set()

    if done:
        done_arr = pa.array(sorted(done), pa.int32())

        def _skip(tbl: pa.Table) -> pa.Table:
            b = bucket_of(hash64_columns(tbl, key_list), num_buckets)
            return tbl.filter(
                pc.invert(
                    pc.is_in(pa.array(b, pa.int32()), value_set=done_arr)
                )
            )

        ds = ds.map_batches(_skip, batch_format="pyarrow", batch_size=None)

    lineage_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("rows_in", pa.int64()),
            ("rows_out", pa.int64()),
            ("checksum", pa.string()),
            ("elapsed_s", pa.float64()),
        ]
    )

    def _kernel_write(bucket: int, group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        rows_in = group.num_rows
        out = kernel(group) if kernel is not None else group
        final_dir = _bucket_dir(out_dir, bucket)
        tmp_dir = final_dir + f".tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(out, os.path.join(tmp_dir, "part.parquet"))
        # order-insensitive checksum over the key columns
        ck = (
            f"{int(np.bitwise_xor.reduce(hash64_columns(out, key_list)) ^ np.uint64(out.num_rows)):016x}"
            if out.num_rows
            else "0"
        )
        rec = {
            "bucket": bucket,
            "fingerprint": fingerprint,
            "engine_version": __version__,
            "rows_in": rows_in,
            "rows_out": out.num_rows,
            "checksum": ck,
            "elapsed_s": round(time.monotonic() - t0, 4),
        }
        with open(os.path.join(tmp_dir, "_SUCCESS.json"), "w") as f:
            json.dump(rec, f)
        if os.path.isdir(final_dir):  # retried task: idempotent overwrite
            shutil.rmtree(final_dir)
        os.rename(tmp_dir, final_dir)
        return pa.Table.from_pylist(
            [{k: rec[k] for k in
              ("bucket", "rows_in", "rows_out", "checksum", "elapsed_s")}]
        )

    def _k(p: int, table: pa.Table) -> pa.Table:
        if table.num_rows == 0:
            return lineage_schema.empty_table()
        return _kernel_write(p, table).cast(lineage_schema)

    lineage = hash_exchange(
        ds, key_list, num_buckets, _k, empty_schema=lineage_schema
    ).to_pandas()
    write_job_manifest(out_dir, fingerprint, lineage, sorted(done))
    return lineage, sorted(done)
