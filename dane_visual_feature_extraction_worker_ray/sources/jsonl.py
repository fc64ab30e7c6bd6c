"""Tuned JSONL reading — the interchange format LLM training corpora
usually arrive in (one JSON object per line; the reference's analog is
its JSON metadata reads, io_util.py).

Unlike parquet, JSONL has no row-count metadata and physically cannot
prune columns at the read — so block sizing is byte-based and the
column projection / schema alignment happens post-parse in the same
map. This reader exists for INGEST of upstream corpora; anything hot
should be converted to parquet on the first pass (``write_parquet`` /
``state.lineage.write_partitioned_checkpointed``).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

DEFAULT_BYTES_PER_BLOCK = 8 << 20


def _list_files(paths) -> list[str]:
    if isinstance(paths, (list, tuple)):
        return list(paths)
    if os.path.isdir(paths):
        return [
            os.path.join(paths, f)
            for f in sorted(os.listdir(paths))
            if f.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz"))
        ]
    return [paths]


def align_to_schema(ds, schema: pa.Schema):
    """Map every block onto ``schema``: present columns cast to the
    target type, absent columns filled with typed nulls, extras
    dropped, column order fixed. The same alignment contract as
    ``read_parquet_tuned``'s schema-evolution path."""

    def _align(t: pa.Table) -> pa.Table:
        cols = {}
        for fld in schema:
            if fld.name in t.column_names:
                cols[fld.name] = t.column(fld.name).cast(fld.type)
            else:
                cols[fld.name] = pa.nulls(t.num_rows, fld.type)
        return pa.table(cols, schema=schema)

    return ds.map_batches(_align, batch_format="pyarrow")


def read_jsonl_tuned(
    paths,
    schema: pa.Schema | None = None,
    columns: list[str] | None = None,
    bytes_per_block: int = DEFAULT_BYTES_PER_BLOCK,
    max_blocks: int = 512,
    **kwargs,
):
    """Read newline-delimited JSON into a Dataset with sized blocks.

    ``schema`` (optional) pins the output schema exactly — heterogeneous
    files (a field added partway through a corpus) align to it with
    typed nulls instead of failing the union. ``columns`` without
    ``schema`` projects after the parse (order preserved). Extra
    ``kwargs`` pass through to ``ray.data.read_json``.
    """
    files = _list_files(paths)
    if not files:
        raise FileNotFoundError(f"no JSONL files under {paths!r}")
    total = sum(os.path.getsize(p) for p in files)
    blocks = max(1, min(max_blocks, total // bytes_per_block + 1))
    ds = rd.read_json(files, override_num_blocks=blocks, **kwargs)
    if schema is not None:
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        return align_to_schema(ds, schema)
    if columns is not None:
        return ds.select_columns(columns)
    return ds
