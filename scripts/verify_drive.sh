#!/bin/bash
# Drives both verify surfaces per .claude/skills/verify/SKILL.md.
# Usage: verify_drive.sh [query_name ...]  (extra queries get driver-style duckdb compare at sf0.01)
set -e
cd /root/repo
timeout 500 python - "$@" <<'EOF'
import sys
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as m
ds = m.entry()
df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
assert len(df) > 0, "entry() empty"
print("SURFACE1 entry rows:", len(df))
q, s = m.queries(), m.oracle_sql()
assert set(s) <= set(q)
print("SURFACE1 queries:", len(q), "oracles:", len(s))
import duckdb, pyarrow as pa
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
for name in sys.argv[1:]:
    res = q[name](sf)
    if isinstance(res, pa.Table): a = res.to_pandas()
    elif hasattr(res, "to_pandas"): a = res.to_pandas()
    else: a = res
    if name in s:
        b = con.execute(s[name]).df()
        cols = sorted(a.columns); assert sorted(b.columns) == cols, (name, a.columns, b.columns)
        import pandas as pd
        ka = a[cols].sort_values(cols).reset_index(drop=True)
        kb = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(ka, kb, check_dtype=False)
        print("SURFACE1", name, "oracle MATCH rows:", len(ka))
    else:
        print("SURFACE1", name, "rows-only rows:", len(a))
ray.shutdown()
EOF
GRAFT_BENCH_ONLY=flagship RAY_GRAFT_CPUS=8 GRAFT_BENCH_CONVS=85000 timeout 300 python bench.py 2>/dev/null | head -1
echo "SURFACE2 bench OK"
