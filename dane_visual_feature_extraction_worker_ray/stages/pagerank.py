"""Distributed weighted PageRank in exact integer fixed-point.

The iterative-graph family next to connected components
(``stages/dedup.connected_components_labels``): where CC propagates a
min-label to a fixpoint, PageRank propagates rank MASS for a fixed
number of rounds. Execution shape: the static sides (edges by ``src``,
nodes/ranks by ``node``) are hash-partitioned ONCE with the same hash
(``exchange.partition_table_refs``), so the aligned partition pairs
zip every round and the only per-round data motion is the
destination-aggregated contribution messages — iterating does NOT
re-shuffle the edge table (the cost multiplier a naive
re-exchange-per-round design pays at 100 TB). The driver holds only
O(partitions) refs; no corpus-scale row set ever lands on it.

Arithmetic is integer fixed-point (ranks scaled by ``scale``), with
the floor divisions placed at exactly the same spots a SQL oracle can
reproduce (``((dn * (r // ow)) // dd) * w``): sums of int64 are
order-independent, so the result is bit-identical to an unrolled SQL
iteration regardless of partitioning — no IEEE accumulation-order
hazards, the same engineering as the integer-cent money math. The
quantization error vs real-valued PageRank is O(1/scale) per term
(``r // ow`` floors once per source, the damping division floors once
per edge); ranking order is unaffected for any realistic ``scale``.

Semantics: simplified PageRank — dangling mass (nodes with no
out-edges) is dropped rather than redistributed, exactly what the
mirrored SQL computes. Overflow bound: ``dn * (r // ow)`` then
``* w`` requires ``dn * scale_mass`` and ``base * w_max`` within
int64; with the default ``scale=1e12`` there is headroom for graphs
up to ~1e5 nodes of fully-concentrated mass — raise/lower ``scale``
to trade precision for headroom.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa



import ray
import ray.data as rd

from ..functions.hashing import bucket_of, hash64_columns
from .exchange import _cpus_per_task, _from_ipc, _ipc_bytes

_MSG_SCHEMA = pa.schema([("dst", pa.int64()), ("c", pa.int64())])
_RANK_SCHEMA = pa.schema([("node", pa.int64()), ("rank", pa.int64())])


@ray.remote
def _pr_phase1(edge_tbl, rank_tbl, num_partitions, dn, dd):
    """One aligned partition's propagation round: derive out-weights
    locally, floor-divide each source's rank share, emit per-dst
    contribution PARTIALS already split into the destination's
    partition (IPC fragments — the only bytes that move per round)."""
    pa.set_cpu_count(1)
    empty = _ipc_bytes(_MSG_SCHEMA.empty_table())
    if edge_tbl.num_rows == 0 or rank_tbl.num_rows == 0:
        if num_partitions == 1:
            return empty
        return tuple(empty for _ in range(num_partitions))
    src = edge_tbl.column("src").to_numpy(zero_copy_only=False)
    dst = edge_tbl.column("dst").to_numpy(zero_copy_only=False)
    w = edge_tbl.column("w").to_numpy(zero_copy_only=False)
    rkeys = rank_tbl.column("node").to_numpy(zero_copy_only=False)
    rvals = rank_tbl.column("rank").to_numpy(zero_copy_only=False)
    o = np.argsort(src, kind="stable")
    src, dst, w = src[o], dst[o], w[o]
    new = np.r_[True, src[1:] != src[:-1]]
    gidx = np.cumsum(new) - 1
    ow = np.zeros(gidx[-1] + 1, np.int64)
    np.add.at(ow, gidx, w)
    ro = np.argsort(rkeys, kind="stable")
    rkeys, rvals = rkeys[ro], rvals[ro]
    srcs = src[new]
    pos = np.searchsorted(rkeys, srcs).clip(0, len(rkeys) - 1)
    # searchsorted returns an INSERTION index — an edge source missing
    # from nodes_ds would silently read a neighbor's rank; fail loudly
    # (contract: nodes ⊇ sources; hash alignment puts a source's node
    # row in this very partition)
    if not (rkeys[pos] == srcs).all():
        missing = srcs[rkeys[pos] != srcs]
        raise ValueError(
            f"pagerank: edge sources not in nodes_ds: {missing[:3]}"
        )
    q = rvals[pos] // ow  # per-source floored mass share
    c = ((dn * q[gidx]) // dd) * w
    from .groupagg import group_aggregate_table

    partial = group_aggregate_table(
        pa.table({"dst": pa.array(dst), "c": pa.array(c)}),
        ["dst"],
        [("c", "sum")],
    )
    if num_partitions == 1:
        return _ipc_bytes(partial)
    b = bucket_of(hash64_columns(partial, ["dst"]), num_partitions)
    idx = np.argsort(b, kind="stable")
    bs = b[idx]
    bounds = np.arange(num_partitions)
    starts = np.searchsorted(bs, bounds, side="left")
    ends = np.searchsorted(bs, bounds, side="right")
    taken = partial.take(pa.array(idx))
    return tuple(
        _ipc_bytes(taken.slice(s, e - s)) for s, e in zip(starts, ends)
    )


@ray.remote
def _pr_phase2(rank_tbl, base, *frags):
    """Combine one partition's incoming contribution fragments onto
    its (static) node set: ``rank' = base + Σ c``. Output stays
    node-partition-aligned for the next round's phase 1."""
    pa.set_cpu_count(1)
    nodes = np.sort(
        rank_tbl.column("node").to_numpy(zero_copy_only=False)
    )
    if len(nodes) == 0:
        return _RANK_SCHEMA.empty_table()
    total = np.full(len(nodes), base, np.int64)
    for f in frags:
        t = _from_ipc(f)
        if t.num_rows == 0:
            continue
        mk = t.column("dst").to_numpy(zero_copy_only=False)
        mc = t.column("c").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nodes, mk).clip(0, len(nodes) - 1)
        if not (nodes[pos] == mk).all():
            raise ValueError(
                "pagerank: a contribution dst is not a node "
                "(nodes must cover all edge endpoints)"
            )
        np.add.at(total, pos, mc)
    return pa.table({"node": pa.array(nodes), "rank": pa.array(total)})


def pagerank_fixed_point(
    edges_ds,
    nodes_ds,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    num_partitions: int = 16,
):
    """Iterate ``r'(v) = base + Σ_{(u→v)} ((dn·(r(u)//ow(u)))//dd)·w``
    for ``iters`` rounds from ``r0 = scale``, where ``ow(u)`` is u's
    total out-weight and ``base = (scale·(dd-dn))//dd``.

    ``edges_ds``: columns ``src``, ``dst``, ``w`` (int64; parallel
    edges allowed — they are pre-summed). ``nodes_ds``: column
    ``node`` (int64, distinct; must cover every edge endpoint;
    isolated nodes keep ``base`` after round 1). Returns a Dataset
    ``(node, rank)``.

    Iteration shape (the static/moving split that matters at scale):
    edges are hash-partitioned by ``src`` ONCE and nodes/ranks by
    ``node`` ONCE with the same hash (``exchange.partition_table_refs``
    — same key value → same partition index), so every round the
    aligned (edge, rank) partition pairs zip with NO re-shipping of
    either static side; the only per-round data motion is the
    contribution messages, pre-aggregated per destination before they
    move. Out-weights are derived locally from each partition's
    co-located out-edges — never a join.
    """
    dn, dd = damping_num, damping_den
    base = (scale * (dd - dn)) // dd

    from .exchange import partition_table_refs
    from .groupagg import group_aggregate_table, hash_grouped_aggregate

    def _edge_partial(t: pa.Table) -> pa.Table:
        return group_aggregate_table(
            pa.table(
                {
                    "src": t.column("src").cast(pa.int64()),
                    "dst": t.column("dst").cast(pa.int64()),
                    "w": t.column("w").cast(pa.int64()),
                }
            ),
            ["src", "dst"],
            [("w", "sum")],
        )

    edges = hash_grouped_aggregate(
        edges_ds.map_batches(
            _edge_partial, batch_format="pyarrow", batch_size=None
        ),
        ["src", "dst"],
        [("w", "sum")],
        num_buckets=num_partitions,
    )

    ranks0 = nodes_ds.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node").cast(pa.int64()),
                "rank": pa.array(np.full(t.num_rows, scale, np.int64)),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    edge_parts = partition_table_refs(edges, "src", num_partitions)
    rank_parts = partition_table_refs(ranks0, "node", num_partitions)

    ncpu = _cpus_per_task()
    for _ in range(iters):
        frag_lists = [
            _pr_phase1.options(
                num_returns=num_partitions, num_cpus=ncpu
            ).remote(edge_parts[p], rank_parts[p], num_partitions, dn, dd)
            for p in range(num_partitions)
        ]
        if num_partitions == 1:
            frag_lists = [[fl] for fl in frag_lists]
        rank_parts = [
            _pr_phase2.options(num_cpus=ncpu).remote(
                rank_parts[p], base,
                *[frag_lists[q][p] for q in range(num_partitions)],
            )
            for p in range(num_partitions)
        ]
    return rd.from_arrow_refs(rank_parts)


def cooccurrence_edges(
    ds,
    group_col: str,
    item_col: str,
    num_partitions: int = 16,
):
    """Co-occurrence graph construction: for every group (order,
    basket, document …) emit a directed edge between every ordered
    pair of DISTINCT items it contains; parallel edges across groups
    are summed into an integer weight ``w``.

    One hash exchange on ``group_col`` co-locates each group, then the
    pair expansion is fully vectorized (run-length product-index
    decomposition — no Python loop over groups). A group with k items
    emits k·(k-1) pairs: bound k upstream if groups can be huge (the
    documented hot-key assumption; TPC-H-ish orders hold ≤ ~7 items).
    Returns ``(src, dst, w)`` aggregated across groups.
    """
    from .exchange import hash_exchange
    from .groupagg import group_aggregate_table, hash_grouped_aggregate

    pair_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("w", pa.int64())]
    )

    def _pairs(p: int, tbl: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads

        pin_arrow_threads()
        g = tbl.column(group_col).to_numpy(zero_copy_only=False)
        it = tbl.column(item_col).to_numpy(zero_copy_only=False)
        o = np.lexsort((it, g))
        g, it = g[o], it[o]
        keep = np.r_[True, (g[1:] != g[:-1]) | (it[1:] != it[:-1])]
        g, it = g[keep], it[keep]  # distinct (group, item)
        new = np.r_[True, g[1:] != g[:-1]]
        starts = np.flatnonzero(new)
        k = np.diff(np.r_[starts, len(g)])
        tot = k * (k - 1)
        n_pairs = int(tot.sum())
        if n_pairs == 0:
            return pair_schema.empty_table()
        wi = np.arange(n_pairs, dtype=np.int64) - np.repeat(
            np.cumsum(tot) - tot, tot
        )
        run = np.repeat(np.arange(len(k), dtype=np.int64), tot)
        k_rep = k[run]
        i = wi // (k_rep - 1)
        jj = wi % (k_rep - 1)
        j = jj + (jj >= i)
        src = it[starts[run] + i]
        dst = it[starts[run] + j]
        return group_aggregate_table(
            pa.table(
                {
                    "src": pa.array(src),
                    "dst": pa.array(dst),
                    "w": pa.array(np.ones(n_pairs, np.int64)),
                }
            ),
            ["src", "dst"],
            [("w", "sum")],
        )

    partials = hash_exchange(
        ds, group_col, num_partitions, _pairs, empty_schema=pair_schema,
        prune_empty_sync=False,
    )
    return hash_grouped_aggregate(
        partials, ["src", "dst"], [("w", "sum")],
        num_buckets=num_partitions,
    )


def triangle_count(
    edges_ds,
    num_partitions: int = 16,
):
    """Distributed triangle count (each triangle counted once).

    Node-iterator with message passing, the standard two-round
    MapReduce formulation: canonicalize to distinct undirected edges
    ``a < b`` (so every edge is stored under its smaller endpoint —
    the id-order orientation; a degree-order orientation would shave
    the wedge volume further and is the documented upgrade for
    power-law graphs), then

    1. exchange keyed by ``a``: each partition holds node a's full
       forward adjacency; emit a wedge message ``(v, w)`` for every
       neighbor pair ``v < w`` (vectorized product-index expansion);
    2. exchange keyed by ``(v, w)``: a wedge closes iff the edge
       ``(v, w)`` exists — side-tagged union with the edge list, one
       lexsort run-scan counts closing wedges per partition.

    The driver sees one int64 per partition. Wedge volume is
    ``Σ_a deg⁺(a)·(deg⁺(a)-1)/2`` — the hot-node caution of
    :func:`cooccurrence_edges` applies. Returns a 1-row Dataset
    ``(n_triangles,)``.
    """
    from .exchange import hash_exchange
    from .groupagg import group_aggregate_table, hash_grouped_aggregate

    def _canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False)
        d = t.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return group_aggregate_table(
            pa.table(
                {
                    "a": pa.array(np.minimum(s, d)),
                    "b": pa.array(np.maximum(s, d)),
                    "one": pa.array(np.ones(len(s), np.int64)),
                }
            ),
            ["a", "b"],
            [("one", "min")],
        )

    edges = hash_grouped_aggregate(
        edges_ds.map_batches(_canon, batch_format="pyarrow",
                             batch_size=None),
        ["a", "b"],
        [("one", "min")],
        num_buckets=num_partitions,
    ).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow",
        batch_size=None,
    ).materialize()  # reused by both rounds

    wedge_schema = pa.schema(
        [("v", pa.int64()), ("w", pa.int64()), ("c", pa.int64())]
    )

    def _wedges(p: int, tbl: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads

        pin_arrow_threads()
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        b = tbl.column("b").to_numpy(zero_copy_only=False)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        new = np.r_[True, a[1:] != a[:-1]]
        starts = np.flatnonzero(new)
        k = np.diff(np.r_[starts, len(a)])
        tot = k * (k - 1)  # full ordered product, filtered to v<w below
        n = int(tot.sum())
        if n == 0:
            return wedge_schema.empty_table()
        wi = np.arange(n, dtype=np.int64) - np.repeat(
            np.cumsum(tot) - tot, tot
        )
        run = np.repeat(np.arange(len(k), dtype=np.int64), tot)
        k_rep = k[run]
        i = wi // (k_rep - 1)
        jj = wi % (k_rep - 1)
        j = jj + (jj >= i)
        keep = i < j  # b sorted within a run → S[i] < S[j]
        v = b[starts[run[keep]] + i[keep]]
        w = b[starts[run[keep]] + j[keep]]
        # combine repeated wedges (different a, same (v,w) — exactly
        # the common-neighbor multiplicity the closure check sums), so
        # the exchange ships (v, w, count) instead of one row per wedge
        return group_aggregate_table(
            pa.table(
                {
                    "v": pa.array(v),
                    "w": pa.array(w),
                    "c": pa.array(np.ones(len(v), np.int64)),
                }
            ),
            ["v", "w"],
            [("c", "sum")],
        )

    wedges = hash_exchange(
        edges, "a", num_partitions, _wedges, empty_schema=wedge_schema,
        prune_empty_sync=False,
    )

    cnt_schema = pa.schema([("n_triangles", pa.int64())])

    def _close(p: int, tbl: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads

        pin_arrow_threads()
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        c = tbl.column("c").to_numpy(zero_copy_only=False)
        o = np.lexsort((side, w, v))  # edges (side 0) first in each run
        v, w, side, c = v[o], w[o], side[o], c[o]
        new = np.r_[True, (v[1:] != v[:-1]) | (w[1:] != w[:-1])]
        run = np.cumsum(new) - 1
        n_runs = run[-1] + 1 if len(run) else 0
        has_edge = np.zeros(n_runs, bool)
        starts = np.flatnonzero(new)
        has_edge[run[starts]] = side[starts] == 0
        mm = side == 1
        # integer-exact accumulation (repo policy: no float64 counting
        # path — weighted bincount accumulates in float64 and loses
        # exactness past 2^53). run is non-decreasing after the lexsort,
        # so per-run totals are a reduceat over run boundaries.
        msgs = np.zeros(n_runs, np.int64)
        idx = run[mm]
        cv = c[mm].astype(np.int64)
        if len(idx):
            bounds = np.flatnonzero(np.r_[True, idx[1:] != idx[:-1]])
            msgs[idx[bounds]] = np.add.reduceat(cv, bounds)
        total = int(msgs[has_edge].sum())
        return pa.table({"n_triangles": pa.array([total], pa.int64())})

    tagged = wedges.map_batches(
        lambda t: t.append_column(
            "side", pa.array(np.ones(t.num_rows, np.int8))
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).union(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "v": t.column("a"),
                    "w": t.column("b"),
                    "c": pa.array(np.zeros(t.num_rows, np.int64)),
                    "side": pa.array(np.zeros(t.num_rows, np.int8)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    partials = hash_exchange(
        tagged, ["v", "w"], num_partitions, _close,
        empty_schema=cnt_schema,
    )
    return hash_grouped_aggregate(
        partials.map_batches(
            lambda t: t.append_column(
                "_k", pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["_k"],
        [("n_triangles", "sum")],
        num_buckets=1,
    ).map_batches(
        lambda t: t.select(["n_triangles"]), batch_format="pyarrow",
        batch_size=None,
    )
