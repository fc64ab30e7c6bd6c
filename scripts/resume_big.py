"""Kill-and-resume exercise at the 29M-turn tier (VERDICT r4 item 7).

Modes: run <out_dir> (full or to-be-killed run), resume <out_dir>,
Both print a one-line JSON with lineage facts for BASELINE.md.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")

import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from dane_visual_feature_extraction_worker_ray.config import FeatureConfig, PartitionConfig
from dane_visual_feature_extraction_worker_ray.sources.parquet import read_parquet_tuned
from dane_visual_feature_extraction_worker_ray.state.lineage import (
    write_features_checkpointed,
)

mode, out_dir = sys.argv[1], sys.argv[2]
tp = "/tmp/graft_bench/1200000_42/transcripts.parquet"
sp = "/tmp/graft_bench/1200000_42/snapshots.parquet"
cfg = FeatureConfig()
pcfg = PartitionConfig(num_buckets=128)

t0 = time.monotonic()
lineage, skipped = write_features_checkpointed(
    read_parquet_tuned(tp), read_parquet_tuned(sp), out_dir, cfg, pcfg,
    fingerprint="resume_big_v1", resume=(mode == "resume"),
)
elapsed = time.monotonic() - t0
# digest from the on-disk markers (the resumed run's returned
# lineage holds only re-run buckets; markers cover every bucket)
recs = []
for d in sorted(os.listdir(out_dir)):
    if not d.startswith("bucket="):
        continue
    with open(os.path.join(out_dir, d, "_SUCCESS.json")) as f:
        r = json.load(f)
    recs.append((int(r["bucket"]), int(r["rows_out"]), str(r["checksum"])))
recs.sort()
print(json.dumps({
    "mode": mode, "elapsed_s": round(elapsed, 2),
    "n_buckets": len(recs), "n_skipped": len(skipped),
    "rows_total": sum(r[1] for r in recs),
    "marker_digest": __import__("hashlib").sha256(
        json.dumps(recs).encode()).hexdigest()[:16],
}))
ray.shutdown()
