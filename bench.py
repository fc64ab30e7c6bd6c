#!/usr/bin/env python
"""Benchmark harness.

Plain run: times the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) plus the flagship transcript pipeline
(read → hash exchange → feature kernels → checkpointed parquet write)
over a cached ~8.5M-turn synthetic corpus (``GRAFT_BENCH_CONVS``
overrides), under ``ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)``, and
prints ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "synthetic_turns": N, "synthetic_turns_per_sec": N,
     "synthetic_turns_big": N, "synthetic_turns_per_sec_big": N,
     "counters": {exchange_bytes, exchange_rows, ...}}

The big tier (~29M turns, ``GRAFT_BENCH_BIG_CONVS``, disable with
``GRAFT_BENCH_BIG=0``) records scale-flatness as a per-round JSON
datum; ``counters`` carries the lineage counters (exact IPC bytes
through every hash exchange, gather bounds) accumulated over the
suite.

``--scaling``: the same flagship job at N=1 and 4N=4 CPUs in fresh
taskset-pinned processes on the same input; prints both throughputs +
the scaling efficiency (recorded in BASELINE.md) — the sandbox
stand-in for the north rule's N vs 4N cluster-size criterion. Pair
rationale documented in main() and BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_CONVS = int(os.environ.get("GRAFT_BENCH_CONVS", "350000"))  # ~8.5M turns
BENCH_SEED = 42
BENCH_DIR = "/tmp/graft_bench"
BENCH_TEXT_POOL = 200_000


def ensure_bench_corpus(n_convs: int | None = None) -> tuple[str, str]:
    from dane_visual_feature_extraction_worker_ray.sources.synthetic import (
        write_corpus,
    )

    n_convs = BENCH_CONVS if n_convs is None else n_convs
    tag = f"{n_convs}_{BENCH_SEED}"
    tp = os.path.join(BENCH_DIR, tag, "transcripts.parquet")
    sp = os.path.join(BENCH_DIR, tag, "snapshots.parquet")
    if not (os.path.isfile(tp) and os.path.isfile(sp)):
        write_corpus(
            os.path.join(BENCH_DIR, tag),
            n_convs=n_convs,
            seed=BENCH_SEED,
            row_group_size=131_072,
            text_pool=BENCH_TEXT_POOL,
        )
    return tp, sp


def ensure_skew_corpus() -> tuple[str, str]:
    """Skewed corpus: one 500k-turn mega-conversation among 50k normal
    ones — exercises detection + salting + exact stitching at scale."""
    from dane_visual_feature_extraction_worker_ray.sources.synthetic import (
        write_corpus,
    )

    d = os.path.join(BENCH_DIR, "skew_50000_43")
    tp = os.path.join(d, "transcripts.parquet")
    sp = os.path.join(d, "snapshots.parquet")
    if not (os.path.isfile(tp) and os.path.isfile(sp)):
        write_corpus(
            d,
            n_convs=50_000,
            seed=43,
            mega_turns=500_000,
            row_group_size=131_072,
            text_pool=50_000,
        )
    return tp, sp


def ensure_doc_corpus() -> tuple[str, int]:
    """Cached 1M-doc corpus (testdata documents schema, ~51% exact-dup
    rate from a 600k text pool) for the doc-scale curation stages.
    ``GRAFT_BENCH_DOCS`` overrides the size; 0 disables the stages."""
    from dane_visual_feature_extraction_worker_ray.sources.synthetic import (
        write_doc_corpus,
    )

    n_docs = int(os.environ.get("GRAFT_BENCH_DOCS", "1000000"))
    d = os.path.join(BENCH_DIR, f"docs_{n_docs}_{BENCH_SEED}")
    p = os.path.join(d, "documents.parquet")
    if n_docs and not os.path.isfile(p):
        write_doc_corpus(
            d, n_docs=n_docs, seed=BENCH_SEED,
            text_pool=max(1, int(n_docs * 0.6)),
        )
    return d, n_docs


def _memcpy_gbps() -> float:
    """Single-thread 100 MB memcpy probe (GB/s, read+write counted).
    This VM's host-side DRAM starvation is invisible to loadavg and
    steal counters but inflates every memory-bound stage uniformly
    (measured 0.1-0.8 GB/s during bad windows vs several GB/s
    healthy) — recording it makes an out-of-band suite total
    attributable. See BASELINE.md variance notes."""
    import time

    import numpy as np

    x = np.ones(12_500_000)  # 100 MB
    x.copy()  # touch pages
    t0 = time.perf_counter()
    for _ in range(3):
        x.copy()
    dt = time.perf_counter() - t0
    return round(3 * 0.1 * 2 / dt, 2)


def run_bench(num_cpus: int, sf_dir: str) -> dict:
    import ray

    # pre-run load: our own workers inflate loadavg once the suite
    # starts, so only the STARTING value attributes external load
    load_at_start = round(os.getloadavg()[0], 2)
    membw_at_start = _memcpy_gbps()

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
    heavy_repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))

    def timed(name, fn, repeats: int = 1):
        # repeats=2 on the heavy stages: this VM shares a host (steal /
        # DRAM contention give ±2× run-to-run swings); min-of-2 reports
        # the engine, not the neighbor. Light stages stay single-run.
        best = None
        res = None
        for _ in range(repeats):
            t0 = time.monotonic()
            res = fn()
            if hasattr(res, "materialize"):
                res = res.materialize()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return res

    # headline: flagship transcript features over the synthetic corpus
    n_turns = rd.read_parquet(tp).count()
    cfg = FeatureConfig()
    pcfg = PartitionConfig(num_buckets=max(32, num_cpus * 4))

    from dane_visual_feature_extraction_worker_ray.sources.parquet import (
        read_parquet_tuned,
    )
    from dane_visual_feature_extraction_worker_ray.state.lineage import (
        write_features_checkpointed,
    )

    def _synthetic_flagship():
        # full production path: read → exchange → kernel → partitioned
        # parquet + lineage, all inside the reduce tasks — the output
        # never accumulates in the object store (29M-turn outputs would
        # otherwise spill and serialize the run)
        out_dir = f"/tmp/graft_bench_out/cpus{num_cpus}"
        import shutil as _sh

        _sh.rmtree(out_dir, ignore_errors=True)
        lineage, _ = write_features_checkpointed(
            read_parquet_tuned(tp),
            read_parquet_tuned(sp),
            out_dir,
            cfg,
            pcfg,
            fingerprint="bench",
            resume=False,
        )
        assert int(lineage["rows_out"].sum()) > 0
        return None

    timed("synthetic_flagship", _synthetic_flagship, repeats=heavy_repeats)

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
            "host_load_1m_at_start": load_at_start,
            "memcpy_gbps_at_start": membw_at_start,
        }
        ray.shutdown()
        return result

    def _scorer_stage():
        # the reference's hot path (batched forward pass,
        # feature_extraction.py:17-32): score every written feature row
        # through the actor pool; weights load once per actor
        from dane_visual_feature_extraction_worker_ray.stages.scorer import (
            score_features,
        )

        feats = rd.read_parquet(f"/tmp/graft_bench_out/cpus{num_cpus}")
        scored = score_features(
            feats, cfg, concurrency=max(2, num_cpus // 2), batch_size=16384
        )
        n = 0
        for b in scored.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        assert n > 0
        return None

    timed("scorer_stage", _scorer_stage, repeats=heavy_repeats)

    def _salted_flagship():
        # skew path: detection pre-pass + mega-conversation chunking
        # with exact carry stitching (stages/salting.py)
        from dane_visual_feature_extraction_worker_ray.stages.salting import (
            compute_features_auto,
        )

        stp, ssp = ensure_skew_corpus()
        ds = compute_features_auto(
            read_parquet_tuned(stp), read_parquet_tuned(ssp), cfg, pcfg,
            detection_ds=read_parquet_tuned(stp, columns=["conv_id"]),
        )
        n = 0
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        assert n > 500_000
        return None

    timed("salted_flagship", _salted_flagship, repeats=heavy_repeats)

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
    timed(
        "part_pagerank",
        lambda: relational_queries.q_part_pagerank(sf_dir),
    )

    # doc-scale curation stages: exact dedup + the bigram-novelty text
    # shuffle over a 1M-doc corpus with a realistic (~51%) dup rate —
    # the LLM-curation path timed at data scale, not sf0.1's 5k docs
    doc_dir, bench_docs = ensure_doc_corpus()
    if bench_docs:
        from dane_visual_feature_extraction_worker_ray.pipelines import (
            text_queries,
        )

        rd.read_parquet(
            os.path.join(doc_dir, "documents.parquet")
        ).count()  # warm page cache
        timed(
            "dedup_exact_1m",
            lambda: dedup_queries.q_dedup_exact(doc_dir),
            repeats=heavy_repeats,
        )
        timed(
            "bigram_novelty_1m",
            lambda: text_queries.q_bigram_novelty(doc_dir),
            repeats=heavy_repeats,
        )

        # the composed corpus build (quality -> cap -> dedup -> shuffle
        # order -> shard packing -> manifest) uncapped at this tier so
        # the dedup/sort/scan stages see real volume
        from dane_visual_feature_extraction_worker_ray.pipelines import (
            curation,
        )

        timed(
            "corpus_build_1m",
            lambda: curation.q_corpus_build_manifest(
                doc_dir, domain_cap=1_000_000, shard_budget=5_000_000
            ),
            repeats=heavy_repeats,
        )

        # C4-style keep-first paragraph dedup at 1M docs: two text-wide
        # exchanges (20 B/paragraph hashes out, drop decisions + one
        # doc_id text move back) — the round-4 sixth-wave curation op
        # timed at data scale
        timed(
            "paragraph_dedup_1m",
            lambda: dedup_queries.q_paragraph_dedup(doc_dir),
            repeats=heavy_repeats,
        )

        # retrieval-prep chunking at 1M docs: the ragged-expansion
        # path (sliding 16/8 token windows, ~2x output text) timed at
        # data scale
        timed(
            "rag_chunking_1m",
            lambda: text_queries.q_overlapping_chunks(doc_dir),
            repeats=heavy_repeats,
        )

    # 29M-turn tier (3.4x the headline corpus), recorded per-round so
    # scale-flatness is a JSON datum, not a prose claim (round-4 #8).
    # One repeat: the point is the big-tier turns/s next to the 8.5M
    # number, not a min-of-2; skippable via GRAFT_BENCH_BIG=0.
    big_turns = 0
    if os.environ.get("GRAFT_BENCH_BIG", "1") != "0":
        big_convs = int(os.environ.get("GRAFT_BENCH_BIG_CONVS", "1200000"))
        btp, bsp = ensure_bench_corpus(big_convs)
        # warm page cache + worker set like every other stage; min-of-2
        # (heavy_repeats): the first big job in a session additionally
        # pays plasma page-faulting for ~10 GB of fresh object-store
        # pages (measured 55-95 s first run vs 35-43 s steady state)
        big_turns = rd.read_parquet(btp).count()
        rd.read_parquet(bsp).count()
        bcfg = PartitionConfig(num_buckets=max(128, num_cpus * 4))

        def _synthetic_flagship_big():
            out_dir = f"/tmp/graft_bench_out_big/cpus{num_cpus}"
            import shutil as _sh

            _sh.rmtree(out_dir, ignore_errors=True)
            lineage, _ = write_features_checkpointed(
                read_parquet_tuned(btp),
                read_parquet_tuned(bsp),
                out_dir,
                cfg,
                bcfg,
                fingerprint="bench_big",
                resume=False,
            )
            assert int(lineage["rows_out"].sum()) > 0
            return None

        timed(
            "synthetic_flagship_big",
            _synthetic_flagship_big,
            repeats=heavy_repeats,
        )

    # lineage counters: shuffle bytes through the exchange etc. —
    # recorded facts next to the timings (round-4 #7)
    from dane_visual_feature_extraction_worker_ray.state import counters

    counter_snap = counters.snapshot()

    # suite total stays the 10-stage sf0.1 metric (comparable round
    # over round and to BASELINE.md); the big tier reports separately
    # as synthetic_turns_per_sec_big
    total = round(
        sum(v for k, v in timings.items() if k != "synthetic_flagship_big"),
        3,
    )
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
        # 1-min load average BEFORE the run: this shared-host VM sees
        # external load spikes that inflate timings ~2x (BASELINE.md
        # variance note) — recorded so a slow number can be attributed
        "host_load_1m_at_start": load_at_start,
        "memcpy_gbps_at_start": membw_at_start,
        "counters": counter_snap,
    }
    if big_turns:
        result["synthetic_turns_big"] = big_turns
        result["synthetic_turns_per_sec_big"] = round(
            big_turns / timings["synthetic_flagship_big"], 1
        )
    if bench_docs:
        result["bench_docs"] = bench_docs
        result["bench_docs_per_sec_dedup"] = round(
            bench_docs / timings["dedup_exact_1m"], 1
        )
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
        # N vs 4N on the same input, fresh taskset-pinned processes.
        # Pair choice (1 vs 4): this VM's DRAM bandwidth saturates past
        # ~4 concurrent memory-bound kernels (the integer busy-loop
        # probe in BASELINE.md shows the CPUs themselves scale to 32),
        # so larger pairs measure the box, not the engine; on a real
        # multi-node cluster each node brings its own memory bus.
        os.environ["GRAFT_BENCH_CONVS"] = "350000"  # ~8.5M turns
        lo_cpus, hi_cpus = 1, 4
        # INTERLEAVED draws (lo,hi,lo,hi), per-leg min: the two legs
        # must sample the same host-contention windows or the ratio
        # measures the neighbor's schedule, not the engine (observed:
        # the 4-way leg alone degrading 16→22 s across an afternoon
        # while the 1-way leg reproduced within 1%)
        lo = run_subprocess(lo_cpus, flagship_only=True)
        hi = run_subprocess(hi_cpus, flagship_only=True)
        lo2 = run_subprocess(lo_cpus, flagship_only=True)
        hi2 = run_subprocess(hi_cpus, flagship_only=True)
        for leg, leg2 in ((lo, lo2), (hi, hi2)):
            leg["queries"]["synthetic_flagship"] = min(
                leg["queries"]["synthetic_flagship"],
                leg2["queries"]["synthetic_flagship"],
            )
        tp_lo = lo["synthetic_turns"] / lo["queries"]["synthetic_flagship"]
        tp_hi = hi["synthetic_turns"] / hi["queries"]["synthetic_flagship"]
        eff = (tp_hi / tp_lo) / (hi_cpus / lo_cpus)
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency, synthetic flagship, "
                    f"N={lo_cpus} vs 4N={hi_cpus} cpus (taskset-pinned)",
                    "synthetic_turns": lo["synthetic_turns"],
                    f"sec_{lo_cpus}": lo["queries"]["synthetic_flagship"],
                    f"sec_{hi_cpus}": hi["queries"]["synthetic_flagship"],
                    f"turns_per_sec_{lo_cpus}": round(tp_lo, 1),
                    f"turns_per_sec_{hi_cpus}": round(tp_hi, 1),
                    "scaling_efficiency": round(eff, 3),
                }
            )
        )
        return
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    print(json.dumps(run_bench(ncpu, sf_dir)))


if __name__ == "__main__":
    main()
