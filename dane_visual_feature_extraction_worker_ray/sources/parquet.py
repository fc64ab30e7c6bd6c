"""Tuned Parquet reading.

Ray's default ``read_op_min_num_blocks`` (200) over-splits small-to-
medium inputs into hundreds of tiny blocks, which turns the downstream
sort/groupby shuffle into an O(blocks × partitions) fragment-merge
(measured: 95 s → 11 s on a 2M-row shuffle just from block sizing).
``read_parquet_tuned`` sizes blocks from the file's own metadata:
~``rows_per_block`` rows each, bounded so tiny tables stay one block
and huge tables still fan out. Column pruning is passed through —
never read columns a pipeline doesn't use.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import ray.data as rd

DEFAULT_ROWS_PER_BLOCK = 65_536


def read_parquet_tuned(
    path: str,
    columns: list[str] | None = None,
    rows_per_block: int = DEFAULT_ROWS_PER_BLOCK,
    max_blocks: int = 512,
    **kwargs,
):
    """Extra ``kwargs`` (e.g. ``filter=``) pass through to
    ``read_parquet``; block sizing is computed from file metadata
    BEFORE filtering (conservative: a filtered read gets at most the
    unfiltered block count)."""
    try:
        n_rows = pq.read_metadata(path).num_rows
    except Exception:
        ds = rd.read_parquet(path, columns=columns, **kwargs)
    else:
        blocks = max(
            1, min(max_blocks, (n_rows + rows_per_block - 1) // rows_per_block)
        )
        ds = rd.read_parquet(
            path, columns=columns, override_num_blocks=blocks, **kwargs
        )
    # strip schema metadata (pandas-written files carry a JSON blob that
    # defeats Ray's schema-identity dedup — "Failed to hash the schemas"
    # warnings — and would ride every exchange fragment); fuses with the
    # read, metadata-only per block
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        batch_size=None,
    )
