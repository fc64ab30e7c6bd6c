#!/usr/bin/env python
"""Benchmark harness.

Plain run: times the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) plus the flagship transcript pipeline over a
cached ~2M-turn synthetic corpus, under
``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)``, and prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "synthetic_turns": N, "synthetic_turns_per_sec": N}

``--scaling``: runs the same job in two fresh processes at N=8 and
4N=32 CPUs on the same input and prints throughputs + scaling
efficiency (recorded in BASELINE.md) — the sandbox stand-in for the
north rule's N vs 4N cluster-size criterion.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_CONVS = 1_200_000  # ~29M turns at ~24 turns/conv
BENCH_SEED = 42
BENCH_DIR = "/tmp/graft_bench"
BENCH_TEXT_POOL = 200_000


def ensure_bench_corpus() -> tuple[str, str]:
    from dane_visual_feature_extraction_worker_ray.sources.synthetic import (
        write_corpus,
    )

    tag = f"{BENCH_CONVS}_{BENCH_SEED}"
    tp = os.path.join(BENCH_DIR, tag, "transcripts.parquet")
    sp = os.path.join(BENCH_DIR, tag, "snapshots.parquet")
    if not (os.path.isfile(tp) and os.path.isfile(sp)):
        write_corpus(
            os.path.join(BENCH_DIR, tag),
            n_convs=BENCH_CONVS,
            seed=BENCH_SEED,
            row_group_size=131_072,
            text_pool=BENCH_TEXT_POOL,
        )
    return tp, sp


def run_bench(num_cpus: int, sf_dir: str) -> dict:
    import ray

    # NOTE: do not use runtime_env worker_process_setup_hook here — the
    # runtime-env agent hangs in sandboxed (no-network, no-dashboard)
    # sessions. Arrow thread pools are pinned inside the hot UDFs
    # instead (functions/runtime.py).
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.config import (
        FeatureConfig,
        PartitionConfig,
    )
    from dane_visual_feature_extraction_worker_ray.pipelines import (
        dedup_queries,
        relational_queries,
        similarity_queries,
        transcript_queries,
    )
    from dane_visual_feature_extraction_worker_ray.stages.transcript_features import (
        compute_features,
    )

    tp, sp = ensure_bench_corpus()

    # warm the page cache so we measure compute + shuffle, not cold disk
    rd.read_parquet(tp).count()
    rd.read_parquet(sp).count()
    rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    rd.read_parquet(os.path.join(sf_dir, "events.parquet")).count()
    rd.read_parquet(os.path.join(sf_dir, "documents.parquet")).count()
    rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet")).count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        res = fn()
        if hasattr(res, "materialize"):
            res = res.materialize()
        timings[name] = round(time.monotonic() - t0, 3)
        return res

    # headline: flagship transcript features over the synthetic corpus
    n_turns = rd.read_parquet(tp).count()
    cfg = FeatureConfig()
    pcfg = PartitionConfig(num_buckets=max(32, num_cpus * 4))

    from dane_visual_feature_extraction_worker_ray.sources.parquet import (
        read_parquet_tuned,
    )

    def _synthetic_flagship():
        return compute_features(
            read_parquet_tuned(tp), read_parquet_tuned(sp), cfg, pcfg
        )

    timed("synthetic_flagship", _synthetic_flagship)

    if os.environ.get("GRAFT_BENCH_ONLY") == "flagship":
        total = round(sum(timings.values()), 3)
        result = {
            "metric": "synthetic flagship wall-clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": os.path.basename(sf_dir.rstrip("/")),
            "num_cpus": num_cpus,
            "synthetic_turns": n_turns,
            "synthetic_turns_per_sec": round(
                n_turns / timings["synthetic_flagship"], 1
            ),
        }
        ray.shutdown()
        return result

    timed("flagship_events", lambda: transcript_queries.q_flagship(sf_dir))
    timed(
        "session_stats", lambda: transcript_queries.q_session_stats(sf_dir)
    )
    timed(
        "window_tumbling",
        lambda: transcript_queries.q_window_tumbling(sf_dir),
    )
    timed(
        "pricing_summary",
        lambda: relational_queries.q_pricing_summary(sf_dir),
    )
    timed("dedup_exact", lambda: dedup_queries.q_dedup_exact(sf_dir))
    timed("knn_topk", lambda: similarity_queries.q_knn_topk(sf_dir))

    total = round(sum(timings.values()), 3)
    flagship_s = timings["synthetic_flagship"]
    result = {
        "metric": "headline pipeline suite wall-clock (flagship transcript "
        "feature engineering + aggregates + dedup + knn)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "num_cpus": num_cpus,
        "synthetic_turns": n_turns,
        "synthetic_turns_per_sec": round(n_turns / flagship_s, 1),
    }
    ray.shutdown()
    return result


def run_subprocess(ncpu: int, flagship_only: bool = False) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), OMP_NUM_THREADS="1")
    if flagship_only:
        env["GRAFT_BENCH_ONLY"] = "flagship"
    cmd = [sys.executable, os.path.abspath(__file__)]
    if shutil.which("taskset"):
        # hard-pin the whole Ray process tree to ncpu cores: a faithful
        # single-box emulation of an ncpu-core cluster (otherwise Ray
        # auxiliary threads leak extra host CPU into small-N runs and
        # understate scaling efficiency)
        cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, check=True
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        # Two N-vs-4N pairs on the same input, fresh processes each.
        # The primary pair is 2 vs 8: this Firecracker VM exposes 32
        # vCPUs but only ~16 effective physical cores (+ ~20% steal;
        # see BASELINE.md capacity probe), so 8→32 measures the
        # hardware ceiling, not the engine. Both pairs are reported.
        out = {"metric": "scaling efficiency, synthetic flagship, N vs 4N cpus"}
        results = {}
        for ncpu in (2, 8, 32):
            r = run_subprocess(ncpu, flagship_only=True)
            results[ncpu] = r
            out[f"sec_{ncpu}"] = r["queries"]["synthetic_flagship"]
            out[f"turns_per_sec_{ncpu}"] = r["synthetic_turns_per_sec"]
            out[f"suite_sec_{ncpu}"] = r["value"]
        tp = {
            n: results[n]["synthetic_turns"]
            / results[n]["queries"]["synthetic_flagship"]
            for n in results
        }
        out["scaling_efficiency_2_to_8"] = round((tp[8] / tp[2]) / 4, 3)
        out["scaling_efficiency_8_to_32"] = round((tp[32] / tp[8]) / 4, 3)
        out["scaling_efficiency"] = out["scaling_efficiency_2_to_8"]
        print(json.dumps(out))
        return
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    print(json.dumps(run_bench(ncpu, sf_dir)))


if __name__ == "__main__":
    main()
