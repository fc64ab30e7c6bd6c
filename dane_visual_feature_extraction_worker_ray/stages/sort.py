"""Distributed global sort via sample-based range partitioning.

``Dataset.sort`` in this Ray version rides the sort shuffle the engine
measured as 5-20× slower than its explicit exchange (see
stages/exchange.py). This operator keeps the engine's one shuffle
primitive and swaps the hash partitioner for RANGE bounds:

1. sample pass — each block contributes ≤ ``sample_per_block`` keys at
   evenly spaced positions (deterministic, no RNG); the driver sorts
   the ≤ ``sample_per_block × n_blocks`` sample and picks ``P − 1``
   evenly spaced bounds;
2. one exchange with a range ``partitioner``: partition id =
   ``searchsorted(bounds, key)`` — a pure function of the FIRST sort
   key, so rows with equal primary keys always co-locate and ties never
   straddle a boundary;
3. each partition kernel runs one C++ ``sort_indices`` over the full
   composite key; partition ``p`` holds exactly the rows between bounds
   ``p−1`` and ``p``, so concatenating partitions in id order IS the
   global order (block order out of the exchange is partition order).

``rank_col`` additionally attaches the 1-based GLOBAL rank: per-block
``(partition, n)`` counts → driver prefix offsets → a streaming map
adds ``offset + local_index``. The rank column makes global ordering
content — hash-checkable against ``row_number() OVER (ORDER BY …)``
even though the driver's comparator is order-insensitive.

Scale notes: the driver holds only the key sample and the count table;
a hot primary-key value produces a hot partition (same skew class as a
hot groupby key — the exchange's 4 GiB warning applies; add a
tie-breaking first key or more partitions). Skewed-but-distinct keys
are handled by the sample: bounds follow the observed distribution.

Reference analog: the reference sorts each source's frame paths once,
in-process (``/root/reference/data_handling.py:33``); a 100 TB corpus
needs the distributed equivalent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .exchange import hash_exchange


def sort_by(
    ds,
    sort_keys: list[tuple[str, str]],
    num_partitions: int = 32,
    sample_per_block: int = 256,
    rank_col: str | None = None,
):
    """Globally sort ``ds`` by ``sort_keys`` (list of
    ``(column, "ascending"|"descending")``). Returns a Dataset whose
    block order is the global order and each block is internally
    sorted. ``rank_col`` (optional) appends the 1-based global rank.
    First-key column must be numeric or string and non-null.
    """
    if not sort_keys:
        raise ValueError("sort_keys must be non-empty")
    for _, order in sort_keys:
        if order not in ("ascending", "descending"):
            raise ValueError(f"bad sort order {order!r}")
    first_col, first_order = sort_keys[0]
    descending = first_order == "descending"

    # pass 1: deterministic evenly-spaced key sample per block
    def _sample(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return tbl.select([first_col])
        take = min(sample_per_block, n)
        idx = np.linspace(0, n - 1, take).astype(np.int64)
        return tbl.select([first_col]).take(pa.array(idx))

    # drop 0-row blocks: Ray skips the UDF on them and emits 0-COLUMN
    # blocks (CLAUDE.md gotcha) that would break the typed concat
    sample_parts = [
        t
        for t in (
            ray.get(r)
            for r in ds.map_batches(
                _sample, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if sample_parts:
        sample = pa.concat_tables(sample_parts)
        keys = np.sort(
            sample.column(first_col).to_numpy(zero_copy_only=False)
        )
    else:
        keys = np.empty(0)
    if len(keys) == 0:
        bounds = keys
    else:
        # P-1 evenly spaced bounds over the observed distribution
        pos = np.linspace(0, len(keys) - 1, num_partitions + 1)[1:-1]
        bounds = keys[pos.astype(np.int64)]
    bounds_ref = ray.put(bounds)

    def _partitioner(tbl: pa.Table) -> np.ndarray:
        b = ray.get(bounds_ref)
        k = tbl.column(first_col).to_numpy(zero_copy_only=False)
        q = np.searchsorted(b, k, side="right")
        return (num_partitions - 1) - q if descending else q

    base = getattr(ds.schema(), "base_schema", None)
    out_fields = list(base) if isinstance(base, pa.Schema) else None

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=sort_keys)
        t = tbl.take(idx)
        # no-raw-slice contract: take() builds fresh buffers already
        return t

    out_schema = pa.schema(out_fields) if out_fields else None
    ranked = hash_exchange(
        ds,
        first_col,
        num_partitions,
        _kernel,
        empty_schema=out_schema,
        partitioner=_partitioner,
    )
    if rank_col is None:
        return ranked

    # per-block counts → prefix offsets (block order == partition
    # order out of the exchange); only tiny ints cross to the driver —
    # blocks themselves stay in the object store
    @ray.remote
    def _nrows(tbl) -> int:
        return tbl.num_rows if hasattr(tbl, "num_rows") else len(tbl)

    refs = ranked.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.cumsum([0] + counts[:-1]) if counts else np.array([], np.int64)

    import ray.data as rd

    @ray.remote
    def _rank_block(tbl, off, name):
        import pyarrow as _pa

        t = tbl if isinstance(tbl, _pa.Table) else _pa.table(tbl)
        r = np.arange(1, t.num_rows + 1, dtype=np.int64) + off
        return t.append_column(name, _pa.array(r))

    out_refs = [
        _rank_block.remote(b, int(o), rank_col)
        for b, o in zip(refs, offsets)
    ]
    return rd.from_arrow_refs(out_refs)
