"""Hash-bucketed grouped aggregation with Arrow-native combine.

``Dataset.groupby().aggregate()`` runs its reduce step as per-group
Python — measured ~10 s for a 77k-group combine that pyarrow's C++
``Table.group_by`` does in milliseconds. This helper implements the
same partial→final contract with both sides vectorized:

1. map side: caller pre-aggregates per batch (one row per key per
   batch) — already the norm in this codebase;
2. a single hash exchange on the composite key (small partial rows);
3. final combine per partition with ``pyarrow.Table.group_by`` (C++).

Aggregation spec uses pyarrow group_by names (``sum``/``min``/``max``)
and must be mergeable (sums of sums etc.) — counts are emitted as
columns on the map side and summed here.
"""

from __future__ import annotations

import pyarrow as pa


def group_aggregate_table(
    table: pa.Table,
    keys: list[str],
    agg_spec: list[tuple[str, str]],
    out_names: list[str] | None = None,
) -> pa.Table:
    """``table.group_by(keys).aggregate(agg_spec)`` — safe on EMPTY
    input as long as the input is TYPED (0 rows but real columns): this
    pyarrow version's C++ kernel then yields the correctly-promoted
    0-row schema (``sum(int*) -> int64``, ``sum(uint*) -> uint64``,
    ``sum(float32) -> float64``, ``count* -> int64``), identical to the
    non-empty case, so empty and non-empty partitions always concat.
    The guard that matters is upstream: never feed a 0-COLUMN table
    (Ray's map operators emit those for skipped empty blocks — the
    exchange prunes them before this runs)."""
    out_names = out_names or (keys + [c for c, _ in agg_spec])
    if table.num_columns == 0:
        raise ValueError(
            "group_aggregate_table: 0-column input (a schema-less empty "
            "block leaked past the exchange's empty-partition pruning)"
        )
    g = table.group_by(keys).aggregate(agg_spec)
    return g.rename_columns(out_names)


def hash_grouped_aggregate(
    partials_ds,
    keys: list[str],
    agg_spec: list[tuple[str, str]],
    num_buckets: int = 32,
):
    """Final combine of mergeable partials: groupby(keys) with C++ kernels.

    Runs on the explicit hash exchange (``stages/exchange.py``) rather
    than ``Dataset.groupby().map_groups``: no global sort, and empty
    partitions emit typed empty tables (the Dataset-native path emitted
    schema-less empties → Ray's "RefBundle with a different schema"
    warning)."""
    out_names = keys + [c for c, _ in agg_spec]

    def _combine(p: int, table: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads

        pin_arrow_threads()
        return group_aggregate_table(table, keys, agg_spec, out_names)

    from .exchange import hash_exchange

    return hash_exchange(partials_ds, keys, num_buckets, _combine)
