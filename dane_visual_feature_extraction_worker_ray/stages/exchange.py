"""Two-stage hash exchange: the engine's wide shuffle, made explicit.

``Dataset.groupby(key).map_groups`` implements co-location via a full
SORT of every row — measured 13-57 s (high variance) on a 2M-row
bucket shuffle where plain hash partitioning suffices; the
``HASH_SHUFFLE`` strategy was slower still (212 s) and is a global
``DataContext`` switch that would degrade the small groupbys elsewhere.
This module drops to Ray core tasks for exactly this one exchange (the
documented escape hatch: the Dataset API cannot express
"hash-partition without sorting" efficiently in this Ray version):

- stage 1 — one task per upstream block: vectorized split of the block
  into ``num_partitions`` Arrow sub-tables by ``hash(key) % P``
  (single argsort + slices, zero row-copies beyond ``take``);
- stage 2 — one task per partition: concat its fragments and run the
  caller's kernel on the whole co-located partition.

Measured on the 2M-turn corpus at 32 CPUs: 2.7-6.5 s end-to-end
(vs 13-57 s), ~750k rows/s warm.

Scale notes (100 TB / multi-node): driver metadata is O(B × P) object
refs — identical to what Ray Data's own shuffle tracks. Keep map
blocks ~64-128 MiB and P ≈ (total cores × 2-4); for B, P in the low
thousands this is millions of tiny refs at most. Partition output is
streamed onward as a normal ``Dataset`` (``from_arrow_refs``), so
downstream stages (scorer pool, parquet writer) pipeline as usual.
The hash function is the same stable ``hash64 % P`` used everywhere
(resume-safe: partition membership never changes between runs).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import bucket_of, hash64, hash64_columns

logger = logging.getLogger(__name__)

# one reduce task concatenates its whole partition in heap; past this
# size the partition count is undersized for the input (or one key is
# pathologically hot) — warn loudly instead of OOMing silently
PARTITION_BYTES_WARN = 4 << 30


def _ipc_bytes(tbl: pa.Table) -> bytes:
    """IPC-serialize (truncates sliced buffers — pickling an Arrow
    slice ships the ENTIRE parent buffer: measured 50 MB pickle for a
    2k-row slice vs 102 KB IPC; without this the exchange write
    amplification is O(num_partitions) per block)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def _from_ipc(buf: bytes) -> pa.Table:
    return pa.ipc.open_stream(pa.py_buffer(buf)).read_all()


@ray.remote
def _split_block(block: pa.Table, key, num_partitions: int,
                 partitioner=None):
    # one Arrow thread per task: 32 tasks x 32-thread default pools
    # thrash the node (measured 55s -> 24s on the 8.5M-turn exchange)
    pa.set_cpu_count(1)
    if not isinstance(block, pa.Table):
        # Ray's map operators SKIP the UDF on 0-row blocks, so a 0-row
        # PANDAS source block can reach to_arrow_refs un-converted.
        # Coerce here; a wrongly-typed 0-row fragment is harmless (the
        # reduce drops empty fragments, and the all-empty case uses the
        # caller's empty_schema).
        import pandas as pd

        if isinstance(block, pd.DataFrame):
            block = pa.Table.from_pandas(block, preserve_index=False)
        else:
            block = pa.table(block)
    if num_partitions == 1:  # num_returns=1 → return value is NOT unpacked
        return _ipc_bytes(block)
    if block.num_rows == 0:
        empty = _ipc_bytes(block.slice(0, 0))
        return tuple(empty for _ in range(num_partitions))
    if partitioner is not None:
        # range/custom partitioning (e.g. the global sort's bound
        # assignment): partitioner(block) -> int array of partition ids
        b = np.asarray(partitioner(block), dtype=np.int64)
    else:
        keys = [key] if isinstance(key, str) else list(key)
        h = hash64_columns(block, keys)
        b = bucket_of(h, num_partitions)
    idx = np.argsort(b, kind="stable")
    bs = b[idx]
    bounds = np.arange(num_partitions)
    starts = np.searchsorted(bs, bounds, side="left")
    ends = np.searchsorted(bs, bounds, side="right")
    taken = block.take(pa.array(idx))
    return tuple(
        _ipc_bytes(taken.slice(s, e - s))
        for s, e in zip(starts, ends)
    )


@ray.remote(num_returns=2)
def _reduce_partition(kernel, partition_idx: int, empty_schema, *frags):
    pa.set_cpu_count(1)  # see _split_block
    from ..state.counters import add as _cadd

    tables = [_from_ipc(f) for f in frags]
    live = [t for t in tables if t.num_rows > 0]
    # shuffle-byte lineage: exact IPC bytes that crossed the exchange
    # into this partition (round-3's hand-measured de-amplification
    # numbers, now recorded facts — reported by bench.py)
    _cadd("exchange_bytes", sum(len(f) for f in frags))
    _cadd("exchange_rows", sum(t.num_rows for t in live))
    if not live:
        if empty_schema is not None:
            out = empty_schema.empty_table()
        else:
            # no declared output schema: run the kernel on a typed
            # empty INPUT table so the empty output still carries the
            # kernel's column types. Kernels that can't take 0 rows
            # fall back to the input schema — harmless, because empty
            # partitions are dropped by the driver unless EVERY
            # partition is empty.
            try:
                out = kernel(partition_idx, tables[0].slice(0, 0))
            except Exception:
                out = tables[0].slice(0, 0)
        return out, out.num_rows
    part_bytes = sum(t.nbytes for t in live)
    if part_bytes > PARTITION_BYTES_WARN:
        logger.warning(
            "hash_exchange: partition %d holds %.1f GiB in one reduce "
            "task — raise num_partitions (or salt the hot key)",
            partition_idx, part_bytes / (1 << 30),
        )
    table = pa.concat_tables(live).combine_chunks()
    out = kernel(partition_idx, table)
    return out, out.num_rows


def _cpus_per_task() -> int:
    """Reserve 2 logical CPUs per exchange task on wide sessions: with
    >= ~24 schedulable CPUs the extra slots are SMT siblings / stolen
    vCPUs and running a memory-bound kernel on every one of them makes
    each task ~6x slower (measured 19 s vs 2.2 s for the same reduce
    wave at 32 vs 16 concurrent tasks on this 32-vCPU VM)."""
    try:
        total = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        return 1
    return 2 if total >= 24 else 1


def hash_exchange(
    ds,
    key: str | list[str],
    num_partitions: int,
    kernel,
    empty_schema: pa.Schema | None = None,
    prune_empty_sync: bool = True,
    partitioner=None,
):
    """Co-locate rows by ``hash64(key) % num_partitions`` (``key`` may
    be one column or a composite list) and apply
    ``kernel(partition_idx, table)`` to each whole partition. Returns a
    Dataset of the kernel outputs.

    The upstream ``ds`` executes (streamed into the object store) at
    the exchange boundary — the same materialization point any
    all-to-all op has.

    ``prune_empty_sync=True`` (default) ``ray.get``-syncs the tiny
    per-partition row counts so empty partitions never reach Ray Data
    (this Ray version's map operators skip the UDF on 0-row blocks and
    emit 0-COLUMN blocks downstream — "RefBundle with a different
    schema" warnings). The sync makes the exchange a full driver-side
    barrier at dataset-construction time; for CHAINED exchanges whose
    consumer is itself empty-safe (another hash_exchange, a union —
    e.g. the per-round label propagation in connected components), pass
    ``False`` to keep reduce outputs streaming into the next stage's
    splits without waiting for the slowest partition. Requires
    ``empty_schema`` so the un-pruned empties are at least typed.
    """
    if not prune_empty_sync and empty_schema is None:
        raise ValueError("prune_empty_sync=False requires empty_schema")
    blocks = ds.to_arrow_refs()
    if not blocks:
        return rd.from_arrow(
            empty_schema.empty_table() if empty_schema else pa.table({})
        )
    ncpu = _cpus_per_task()
    frag_lists = [
        _split_block.options(
            num_returns=num_partitions, num_cpus=ncpu
        ).remote(b, key, num_partitions, partitioner)
        for b in blocks
    ]
    if num_partitions == 1:  # num_returns=1 yields a bare ref, not a list
        frag_lists = [[fl] for fl in frag_lists]
    pairs = [
        _reduce_partition.options(num_cpus=ncpu, num_returns=2).remote(
            kernel, p, empty_schema, *[fl[p] for fl in frag_lists]
        )
        for p in range(num_partitions)
    ]
    if not prune_empty_sync:
        return rd.from_arrow_refs([t for t, _ in pairs])
    # Drop empty partition outputs BEFORE handing refs to Ray Data:
    # this Ray version's map operators skip the UDF on 0-row blocks
    # and emit 0-COLUMN blocks, poisoning downstream schemas ("RefBundle
    # with a different schema" warnings). Row counts are tiny ints; the
    # exchange is already an all-to-all barrier, so the sync is cheap.
    counts = ray.get([c for _, c in pairs])
    out_refs = [t for (t, _), n in zip(pairs, counts) if n > 0]
    if not out_refs:
        out_refs = [pairs[0][0]]  # keep one typed empty block
    return rd.from_arrow_refs(out_refs)


def hash_grouped_map(
    ds,
    keys: str | list[str],
    fn,
    num_partitions: int = 32,
    empty_schema: pa.Schema | None = None,
    min_group_size: int = 1,
):
    """``groupby(keys).map_groups(fn)`` on the explicit hash exchange.

    Replaces the Dataset-native path (global SORT shuffle + schema-less
    empty blocks on empty partitions — Ray's "RefBundle with a
    different schema" warning) with: hash-partition on the composite
    key, then inside each partition a single C++ ``sort_indices`` and a
    per-group-run application of ``fn`` (a whole co-located group per
    call, like ``map_groups``). Groups are never split; empty
    partitions yield typed empty tables.

    Key columns must be non-null and non-float (run detection compares
    adjacent values; NaN != NaN and int-with-null → float casting would
    shatter groups) — true of every engine key (strings, ints, uint64
    hashes).

    ``fn`` must BUILD its output (``take`` / ``filter`` / fresh arrays),
    not return a raw ``slice`` of its input: the reduce task's return
    value is pickled, and pickling an Arrow slice ships the ENTIRE
    parent partition buffer (see ``_ipc_bytes``). Every in-repo kernel
    complies.

    ``min_group_size``: groups smaller than this are dropped BEFORE the
    per-group Python dispatch (vectorized on the run lengths). Pass 2
    for pair-emitting kernels (LSH buckets) — most buckets are
    singletons that the kernel would immediately discard, and skipping
    them removes one Python call per group.

    COST MODEL: dispatch is O(groups) Python calls. Fine for
    entity keys (conversations, users, IVF lists — few, large groups);
    pathological for keys whose group count approaches the row count
    (content hashes, n-grams): paragraph_dedup's drops step measured
    21 s of Python dispatch over ~1M tiny hash groups at the 1M-doc
    tier before being rewritten as a whole-partition vectorized
    ``hash_exchange`` kernel (one lexsort + run masks, ~2 s). If your
    per-group logic is expressible as sort + segmented reduce, use
    ``hash_exchange`` directly.
    """
    import pyarrow.compute as pc

    key_list = [keys] if isinstance(keys, str) else list(keys)

    def _kernel(p: int, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            if empty_schema is not None:
                return empty_schema.empty_table()
            try:
                out = fn(tbl)
            except Exception:
                return tbl  # input schema; dropped unless all empty
            return out if out.num_rows == 0 else out.slice(0, 0)
        idx = pc.sort_indices(
            tbl, sort_keys=[(k, "ascending") for k in key_list]
        )
        t = tbl.take(idx)
        # group run boundaries on the sorted key columns (exact values,
        # not hashes — no collision risk)
        n = t.num_rows
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for k in key_list:
            col = t.column(k).to_numpy(zero_copy_only=False)
            new[1:] |= col[1:] != col[:-1]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], n]
        if min_group_size > 1:
            keep = (ends - starts) >= min_group_size
            starts, ends = starts[keep], ends[keep]
        outs = []
        for s, e in zip(starts, ends):
            o = fn(t.slice(s, e - s))
            if o.num_rows:
                outs.append(o)
        if not outs:
            if empty_schema is not None:
                return empty_schema.empty_table()
            try:
                o = fn(t.slice(0, 0))
            except Exception:
                return t.slice(0, 0)
            return o if o.num_rows == 0 else o.slice(0, 0)
        return pa.concat_tables(outs)

    return hash_exchange(ds, key_list, num_partitions, _kernel, empty_schema)


@ray.remote
def _concat_frags(*frags):
    pa.set_cpu_count(1)
    from ..state.counters import add as _cadd

    _cadd("exchange_bytes", sum(len(f) for f in frags))
    tables = [_from_ipc(f) for f in frags]
    live = [t for t in tables if t.num_rows > 0]
    if not live:
        return tables[0].slice(0, 0)  # IPC frags are always typed
    return pa.concat_tables(live).combine_chunks()


def partition_table_refs(ds, key, num_partitions: int):
    """Hash-partition ``ds`` ONCE and return the per-partition tables
    as a list of object refs (index p = rows with
    ``hash64(key) % num_partitions == p``) — the building block for
    ITERATIVE algorithms where a static table (edges, a dimension)
    must stay co-partitioned across many rounds: partition it once,
    then zip each round's moving side against the cached refs instead
    of re-shipping the static side through a fresh exchange every
    round. The same stable ``hash64`` as :func:`hash_exchange`, so
    refs from different calls with the same ``num_partitions`` are
    mutually aligned (same key value → same index, even for different
    column names)."""
    blocks = ds.to_arrow_refs()
    ncpu = _cpus_per_task()
    if not blocks:
        raise ValueError("partition_table_refs: empty input dataset")
    frag_lists = [
        _split_block.options(
            num_returns=num_partitions, num_cpus=ncpu
        ).remote(b, key, num_partitions)
        for b in blocks
    ]
    if num_partitions == 1:
        frag_lists = [[fl] for fl in frag_lists]
    return [
        _concat_frags.options(num_cpus=ncpu).remote(
            *[fl[p] for fl in frag_lists]
        )
        for p in range(num_partitions)
    ]
