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
        # directory / multi-file input. If the files' schemas differ
        # (schema evolution: a column added partway through a dataset's
        # lifetime), Ray's parquet datasource cannot read them in one
        # pass with a unified schema — so group the files BY schema,
        # issue one pruned read per group, align every block to the
        # unified (projected) schema with typed NULLs for absent
        # columns, and union. Homogeneous directories take the single
        # fast path unchanged.
        try:
            import pyarrow as pa
            import pyarrow.dataset as pads

            dset = pads.dataset(path, format="parquet")
            files = list(dset.files)
            schemas = [pq.read_schema(fp) for fp in files]
        except Exception:
            return _strip_meta(rd.read_parquet(path, columns=columns,
                                               **kwargs))
        groups: dict = {}
        for fp, sch in zip(files, schemas):
            groups.setdefault(
                tuple(sorted(zip(sch.names, map(str, sch.types)))), []
            ).append((fp, sch))
        if len(groups) == 1:
            n_rows = sum(
                pq.read_metadata(fp).num_rows for fp in files
            )
            blocks = max(
                1,
                min(max_blocks,
                    (n_rows + rows_per_block - 1) // rows_per_block),
            )
            ds = rd.read_parquet(
                path, columns=columns, override_num_blocks=blocks,
                **kwargs
            )
        else:
            unified = pa.unify_schemas(schemas)
            if columns is not None:
                unified = pa.schema([unified.field(c) for c in columns])

            def _align_to(target):
                def _fn(t: pa.Table) -> pa.Table:
                    cols = {}
                    for fld in target:
                        if fld.name in t.column_names:
                            cols[fld.name] = t.column(fld.name).cast(
                                fld.type
                            )
                        else:
                            cols[fld.name] = pa.nulls(
                                t.num_rows, fld.type
                            )
                    return pa.table(cols)

                return _fn

            parts = []
            for (_, members) in groups.items():
                fps = [fp for fp, _ in members]
                g_names = set(members[0][1].names)
                g_cols = (
                    [c for c in columns if c in g_names]
                    if columns is not None else None
                )
                g_rows = sum(
                    pq.read_metadata(fp).num_rows for fp in fps
                )
                g_blocks = max(
                    1,
                    min(max_blocks,
                        (g_rows + rows_per_block - 1) // rows_per_block),
                )
                g_ds = rd.read_parquet(
                    fps, columns=g_cols or None,
                    override_num_blocks=g_blocks, **kwargs
                )
                parts.append(
                    g_ds.map_batches(
                        _align_to(unified), batch_format="pyarrow",
                        batch_size=None,
                    )
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.union(p)
            return out
    else:
        blocks = max(
            1, min(max_blocks, (n_rows + rows_per_block - 1) // rows_per_block)
        )
        ds = rd.read_parquet(
            path, columns=columns, override_num_blocks=blocks, **kwargs
        )
    return _strip_meta(ds)


def _strip_meta(ds):
    # strip schema metadata (pandas-written files carry a JSON blob that
    # defeats Ray's schema-identity dedup — "Failed to hash the schemas"
    # warnings — and would ride every exchange fragment); fuses with the
    # read, metadata-only per block
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        batch_size=None,
    )
