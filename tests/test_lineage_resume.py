"""Checkpoint/resume: partial outputs are skipped, recomputation is
value-identical, lineage records reconcile with the data."""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.config import (
    FeatureConfig,
    PartitionConfig,
)
from dane_visual_feature_extraction_worker_ray.state.lineage import (
    content_checksum,
    list_completed_buckets,
    read_checkpointed,
    write_features_checkpointed,
)

CFG = FeatureConfig()
PCFG = PartitionConfig(num_buckets=8)
FP = "test-fingerprint-v1"


def _run(corpus, out_dir, resume=True):
    turns, snaps = corpus
    return write_features_checkpointed(
        rd.from_arrow(turns),
        rd.from_arrow(snaps),
        out_dir,
        CFG,
        PCFG,
        fingerprint=FP,
        resume=resume,
    )


def _canon(tbl) -> pd.DataFrame:
    return (
        tbl.to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def test_full_write_and_lineage(corpus, tmp_path):
    out = str(tmp_path / "full")
    lineage, skipped = _run(corpus, out)
    assert skipped == []
    assert len(lineage) == PCFG.num_buckets or len(lineage) == len(
        [d for d in os.listdir(out) if d.startswith("bucket=")]
    )
    # lineage reconciles with the written partitions
    for r in lineage.itertuples():
        part = os.path.join(out, f"bucket={r.bucket:05d}", "part.parquet")
        import pyarrow.parquet as pq

        tbl = pq.read_table(part)
        assert tbl.num_rows == r.rows_out
        assert content_checksum(tbl) == r.checksum
    total = sum(lineage["rows_out"])
    feats = read_checkpointed(out)
    assert feats.num_rows == total


def test_resume_skips_and_is_identical(corpus, tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    _run(corpus, out_a)
    fresh = _canon(read_checkpointed(out_a))

    # simulate preemption: copy only some completed buckets, resume
    os.makedirs(out_b)
    buckets = sorted(d for d in os.listdir(out_a) if d.startswith("bucket="))
    kept = buckets[: len(buckets) // 2]
    for d in kept:
        shutil.copytree(os.path.join(out_a, d), os.path.join(out_b, d))
    done_before = list_completed_buckets(out_b, FP)
    assert len(done_before) == len(kept)

    mtimes = {
        d: os.path.getmtime(os.path.join(out_b, d, "part.parquet"))
        for d in kept
    }
    lineage, skipped = _run(corpus, out_b)
    assert [f"bucket={b:05d}" for b in skipped] == kept
    # kept partitions untouched
    for d in kept:
        assert os.path.getmtime(os.path.join(out_b, d, "part.parquet")) == mtimes[d]
    resumed = _canon(read_checkpointed(out_b))
    pd.testing.assert_frame_equal(resumed, fresh)


def test_provenance_step_tree_and_job_manifest(corpus, tmp_path):
    """Every bucket's _SUCCESS.json carries a per-step provenance tree;
    the job manifest aggregates it and persists one queryable summary
    row that reconciles with the lineage."""
    from dane_visual_feature_extraction_worker_ray.state.lineage import (
        read_job_manifest,
    )

    out = str(tmp_path / "prov")
    lineage, skipped = _run(corpus, out)

    for d in sorted(os.listdir(out)):
        if not d.startswith("bucket="):
            continue
        rec = json.load(open(os.path.join(out, d, "_SUCCESS.json")))
        steps = rec["steps"]
        names = [s["name"] for s in steps]
        assert names == ["compute_bucket_features", "write_parquet"]
        assert steps[0]["rows_in"] == rec["rows_in"]
        assert steps[0]["rows_out"] == rec["rows_out"]
        assert steps[1]["output_path"].endswith(f"{d}/part.parquet")
        assert all(s["elapsed_s"] >= 0 for s in steps)

    m = read_job_manifest(out)
    assert m is not None
    assert m["fingerprint"] == FP
    assert m["n_computed"] == len(lineage)
    assert m["n_skipped"] == 0
    assert m["rows_out"] == int(lineage["rows_out"].sum())
    step_names = [s["name"] for s in m["steps"]]
    assert step_names == ["compute_bucket_features", "write_parquet"]
    for s in m["steps"]:
        assert s["n_buckets"] == len(lineage)
        if s["name"] == "write_parquet":
            assert s["rows_out"] == m["rows_out"]

    # resume run: manifest reflects all-skipped
    _run(corpus, out)
    m2 = read_job_manifest(out)
    assert m2["n_skipped"] == len(lineage)
    assert m2["n_computed"] == 0


def test_stale_tmp_dirs_are_ignored_and_purged(corpus, tmp_path):
    """A task preempted before the atomic rename leaves bucket=N.tmp.<pid>;
    it must never be read back (double-counting) and must be purged on the
    next resume scan."""
    out = str(tmp_path / "stale")
    _run(corpus, out)
    fresh = _canon(read_checkpointed(out))

    # simulate the preempted task's half-write: a full copy under .tmp.
    buckets = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    stale = os.path.join(out, buckets[0] + ".tmp.12345")
    shutil.copytree(os.path.join(out, buckets[0]), stale)

    again = _canon(read_checkpointed(out))
    pd.testing.assert_frame_equal(again, fresh)  # no duplicated rows

    done = list_completed_buckets(out, FP)
    assert len(done) == len(buckets)
    assert not os.path.isdir(stale)  # purged by the resume scan

    lineage, skipped = _run(corpus, out)
    assert len(skipped) == len(buckets)
    pd.testing.assert_frame_equal(_canon(read_checkpointed(out)), fresh)


def test_fingerprint_mismatch_forces_recompute(corpus, tmp_path):
    out = str(tmp_path / "fp")
    _run(corpus, out)
    # corrupt one marker's fingerprint → that bucket must be redone
    buckets = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    victim = os.path.join(out, buckets[0], "_SUCCESS.json")
    rec = json.load(open(victim))
    rec["fingerprint"] = "stale"
    json.dump(rec, open(victim, "w"))
    done = list_completed_buckets(out, FP)
    assert len(done) == len(buckets) - 1
    lineage, skipped = _run(corpus, out)
    assert len(skipped) == len(buckets) - 1
    assert set(lineage["bucket"]) == {int(buckets[0].split("=")[1])}


def _docs_tbl(n=200):
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(11)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(rng.choice(["en", "de"], n)),
            "n_chars": pa.array(rng.integers(10, 500, n)),
        }
    )


def test_generic_checkpointed_writer_resume_identical(ray_session, tmp_path):
    """The generic writer: fresh run writes every bucket; a second run
    skips all of them; outputs bit-identical; deleting one bucket
    recomputes exactly that bucket with the same content."""
    import pyarrow.compute as pc

    from dane_visual_feature_extraction_worker_ray.state.lineage import (
        read_checkpointed,
        write_partitioned_checkpointed,
    )

    tbl = _docs_tbl()
    out = str(tmp_path / "docs_out")

    def _kernel(g):
        # per-bucket transform: deterministic sort + derived column
        idx = pc.sort_indices(g, sort_keys=[("doc_id", "ascending")])
        g = g.take(idx)
        return g.append_column(
            "n_chars_2x", pc.multiply(g.column("n_chars"), 2)
        )

    lin1, skipped1 = write_partitioned_checkpointed(
        rd.from_arrow(tbl).repartition(4),
        ["lang", "doc_id"],
        8,
        out,
        fingerprint="fp1",
        kernel=_kernel,
    )
    assert skipped1 == [] and len(lin1) == lin1["bucket"].nunique()
    first = read_checkpointed(out).to_pandas().sort_values("doc_id")
    assert len(first) == tbl.num_rows
    assert (first["n_chars_2x"].to_numpy()
            == first["n_chars"].to_numpy() * 2).all()

    lin2, skipped2 = write_partitioned_checkpointed(
        rd.from_arrow(tbl).repartition(4),
        ["lang", "doc_id"],
        8,
        out,
        fingerprint="fp1",
        kernel=_kernel,
    )
    assert len(lin2) == 0 and len(skipped2) == len(lin1)
    second = read_checkpointed(out).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        first.reset_index(drop=True), second.reset_index(drop=True)
    )

    # knock out one bucket: only it recomputes, content identical
    victim = int(lin1["bucket"].iloc[0])
    shutil.rmtree(os.path.join(out, f"bucket={victim:05d}"))
    lin3, skipped3 = write_partitioned_checkpointed(
        rd.from_arrow(tbl).repartition(4),
        ["lang", "doc_id"],
        8,
        out,
        fingerprint="fp1",
        kernel=_kernel,
    )
    assert lin3["bucket"].tolist() == [victim]
    assert len(skipped3) == len(lin1) - 1
    third = read_checkpointed(out).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        first.reset_index(drop=True), third.reset_index(drop=True)
    )
    assert (
        lin3["checksum"].iloc[0]
        == lin1.set_index("bucket")["checksum"][victim]
    )


def test_regenerated_input_purges_stale_buckets(ray_session, tmp_path):
    """A regenerated input (new fingerprint) whose keys hash into a
    SUBSET of the buckets must not resurface the old corpus's rows
    from the now-empty buckets (the exchange prunes empty partitions,
    so those dirs are never overwritten — they must be purged)."""
    import numpy as np
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.state.lineage import (
        read_checkpointed,
        write_partitioned_checkpointed,
    )

    out = str(tmp_path / "regen_out")
    corpus_a = pa.table(
        {"doc_id": pa.array(np.arange(40, dtype=np.int64)),
         "v": pa.array(np.arange(40, dtype=np.int64))}
    )
    write_partitioned_checkpointed(
        rd.from_arrow(corpus_a), "doc_id", 8, out, fingerprint="fpA"
    )
    assert len(read_checkpointed(out)) == 40

    # regenerated corpus: 3 rows — most buckets now legitimately empty
    corpus_b = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "v": pa.array([100, 101, 102], pa.int64())}
    )
    write_partitioned_checkpointed(
        rd.from_arrow(corpus_b), "doc_id", 8, out, fingerprint="fpB"
    )
    got = read_checkpointed(out).to_pandas().sort_values("doc_id")
    assert len(got) == 3, f"stale rows resurfaced: {len(got)}"
    assert got["v"].tolist() == [100, 101, 102]
