"""Sorted export with persisted zone maps + pruned read-back.

The storage side of predicate pushdown made explicit: a range-sorted
write leaves each output file with a tight min/max on the sort column;
persisting those ranges (``_ZONES.json``) lets every later scan skip
files whose range misses the predicate WITHOUT opening them — the same
contract parquet row-group stats give a single file, lifted to the
file/manifest level (Iceberg/Delta data-skipping). ``zonemap_files_*``
counters record exactly how much a pruned scan skipped.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def write_sorted_with_zonemaps(
    ds,
    sort_col: str,
    out_dir: str,
    num_partitions: int = 8,
    extra_sort_keys: list | None = None,
):
    """Range-sort ``ds`` by ``sort_col`` (+ deterministic tie-break
    keys) and write one parquet file per partition IN the reduce
    tasks, then publish ``_ZONES.json`` mapping each file to its
    [min, max] of ``sort_col``. Atomic per-file writes (tmp + rename);
    the manifest is written last, so readers never see a partial
    layout."""
    from .sort import sort_by

    os.makedirs(out_dir, exist_ok=True)
    keys = [(sort_col, "ascending")] + (extra_sort_keys or [])
    ordered = sort_by(ds, keys, num_partitions=num_partitions)

    @ray.remote
    def _write(tbl, idx: int):
        pa.set_cpu_count(1)
        if tbl.num_rows == 0:
            return None
        name = f"part-{idx:05d}.parquet"
        tmp = os.path.join(out_dir, f".tmp.{name}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        col = tbl.column(sort_col).to_numpy(zero_copy_only=False)
        return name, int(col.min()), int(col.max()), tbl.num_rows

    refs = ordered.to_arrow_refs()
    res = ray.get([_write.remote(r, i) for i, r in enumerate(refs)])
    zones = [
        {"file": n, "min": lo, "max": hi, "rows": nr}
        for (n, lo, hi, nr) in [r for r in res if r is not None]
    ]
    tmp = os.path.join(out_dir, ".tmp._ZONES.json")
    with open(tmp, "w") as f:
        json.dump({"sort_col": sort_col, "zones": zones}, f)
    os.replace(tmp, os.path.join(out_dir, "_ZONES.json"))
    return zones


def read_pruned(out_dir: str, lo: int, hi: int):
    """Dataset over only the files whose zone overlaps [lo, hi)
    (half-open). Files skipped never open; counters record the
    pruning ratio. Rows still need the residual filter (zones are
    file-granular)."""
    import ray.data as rd

    from ..state import counters

    with open(os.path.join(out_dir, "_ZONES.json")) as f:
        man = json.load(f)
    keep = [
        z["file"]
        for z in man["zones"]
        if z["max"] >= lo and z["min"] < hi
    ]
    counters.add("zonemap_files_total", len(man["zones"]))
    counters.add("zonemap_files_read", len(keep))
    if not keep:
        raise ValueError("read_pruned: predicate prunes every file")
    return rd.read_parquet(
        [os.path.join(out_dir, k) for k in keep]
    ), len(man["zones"]), len(keep)


def compact_files(
    out_dir: str,
    target_bytes: int,
    compacted_dir: str,
):
    """Small-file compaction over a zone-mapped layout: adjacent files
    (the layout is range-sorted, so adjacency preserves global order)
    are greedily grouped until ``target_bytes``, each group rewritten
    by ONE Ray task into one file, and a fresh ``_ZONES.json`` is
    published — the table-maintenance pass that keeps file counts
    bounded as incremental writers append small files. Returns
    (n_files_before, n_files_after). Planning reads only the manifest
    and file sizes; data moves worker-side, never through the
    driver."""
    import json

    import ray.data as rd  # noqa: F401  (import parity with reader)

    with open(os.path.join(out_dir, "_ZONES.json")) as f:
        man = json.load(f)
    zones = man["zones"]
    sizes = {
        z["file"]: os.path.getsize(os.path.join(out_dir, z["file"]))
        for z in zones
    }
    groups, cur, cur_b = [], [], 0
    for z in zones:  # manifest order == range order
        b = sizes[z["file"]]
        if cur and cur_b + b > target_bytes:
            groups.append(cur)
            cur, cur_b = [], 0
        cur.append(z)
        cur_b += b
    if cur:
        groups.append(cur)
    os.makedirs(compacted_dir, exist_ok=True)

    @ray.remote
    def _merge(zs, idx: int):
        pa.set_cpu_count(1)
        tbl = pa.concat_tables(
            [
                pq.read_table(os.path.join(out_dir, z["file"]))
                for z in zs
            ]
        )
        name = f"part-{idx:05d}.parquet"
        tmp = os.path.join(compacted_dir, f".tmp.{name}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(compacted_dir, name))
        return {
            "file": name,
            "min": min(z["min"] for z in zs),
            "max": max(z["max"] for z in zs),
            "rows": sum(z["rows"] for z in zs),
        }

    new_zones = ray.get(
        [_merge.remote(g, i) for i, g in enumerate(groups)]
    )
    tmp = os.path.join(compacted_dir, ".tmp._ZONES.json")
    with open(tmp, "w") as f:
        json.dump(
            {"sort_col": man["sort_col"], "zones": new_zones}, f
        )
    os.replace(tmp, os.path.join(compacted_dir, "_ZONES.json"))
    from ..state import counters

    counters.add("compact_files_before", len(zones))
    counters.add("compact_files_after", len(new_zones))
    return len(zones), len(new_zones)
