"""Tuned CSV reading — the legacy interchange format bulk corpora and
metadata dumps still arrive in (the reference's analog is its CSV-ish
provenance exports). Same contract as ``sources/jsonl.py``: byte-based
block sizing (CSV has no row-count metadata), post-parse projection,
and pinned-schema alignment for shards whose columns drifted. INGEST
only — hot paths should convert to parquet on the first pass.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from .jsonl import align_to_schema

DEFAULT_BYTES_PER_BLOCK = 8 << 20


def _list_files(paths) -> list[str]:
    if isinstance(paths, (list, tuple)):
        return list(paths)
    if os.path.isdir(paths):
        return [
            os.path.join(paths, f)
            for f in sorted(os.listdir(paths))
            if f.endswith((".csv", ".csv.gz"))
        ]
    return [paths]


def read_csv_tuned(
    paths,
    schema: pa.Schema | None = None,
    columns: list[str] | None = None,
    bytes_per_block: int = DEFAULT_BYTES_PER_BLOCK,
    max_blocks: int = 512,
    **kwargs,
):
    """Read RFC-4180 CSV into a Dataset with sized blocks.

    ``schema`` pins the output exactly (parse types come from Arrow's
    CSV ``convert_options`` so "87" in a string column stays a string,
    then alignment fixes order and fills drifted columns with typed
    nulls); ``columns`` without ``schema`` projects after the parse.
    """
    files = _list_files(paths)
    if not files:
        raise FileNotFoundError(f"no CSV files under {paths!r}")
    total = sum(os.path.getsize(p) for p in files)
    blocks = max(1, min(max_blocks, total // bytes_per_block + 1))
    from pyarrow import csv as pacsv

    # quoted embedded newlines are legal RFC-4180; Arrow's default
    # parser rejects them for splittability — ingest correctness wins
    kwargs.setdefault(
        "parse_options", pacsv.ParseOptions(newlines_in_values=True)
    )
    if schema is not None:
        kwargs.setdefault(
            "convert_options",
            pacsv.ConvertOptions(
                column_types={f.name: f.type for f in schema}
            ),
        )
    ds = rd.read_csv(files, override_num_blocks=blocks, **kwargs)
    if schema is not None:
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        return align_to_schema(ds, schema)
    if columns is not None:
        return ds.select_columns(columns)
    return ds
