"""Distributed prefix scans: running (cumulative) aggregates.

SQL's ``SUM(x) OVER (... ROWS UNBOUNDED PRECEDING)`` family in two
distributed shapes, both on the engine's explicit exchange:

- :func:`grouped_scan` — running aggregates *within* a group
  (``PARTITION BY key ORDER BY ...``): one hash exchange co-locates
  each group, then one C++ sort + fully vectorized segmented kernels
  (numpy cumsum re-based at group starts) — no per-group Python
  dispatch, so a partition with a million tiny groups costs the same
  as one big group.
- :func:`global_scan` — running aggregates over the *global* sort
  order (``ORDER BY ...`` with no partition): range-partitioned sort
  (stages/sort.py), then the classic two-phase prefix scan: per-block
  partial sums (tiny ints to the driver) → driver prefix offsets →
  per-block cumsum + offset. The driver holds O(blocks × cols) ints,
  never rows.
- :func:`grouped_string_agg` — ordered ``string_agg(value, sep)`` per
  group, vectorized end-to-end via ``ListArray.from_arrays`` over the
  group offsets + C++ ``binary_join`` (no Python string loops).

Exactness: scans run on *integer* columns (cents, micros, counts,
lengths) so partial→final addition is associative bit-for-bit;
callers divide once per row at the end when a float surface is needed
(same policy as pipelines/relational_queries.py). Null values
contribute 0 — identical to SQL ``SUM`` semantics whenever each
window frame contains at least one non-null row (running frames
always contain the current row; pair null-able sources with
``coalesce`` on both sides).

Reference analog: the reference accumulates per-batch results in
timestamp order into one growing matrix (``/root/reference/
feature_extraction.py:75-81``) — an O(source) in-memory prefix
concat; these operators are the bounded-memory distributed form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .exchange import hash_exchange
from .sort import sort_by

# spec forms accepted by grouped_scan
_SPEC_KINDS = ("rownum", "count", "cumsum")


def _seg_starts(tbl: pa.Table, keys: list[str]) -> np.ndarray:
    """Run-start mask over already-sorted key columns (exact values)."""
    n = tbl.num_rows
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in keys:
        col = tbl.column(k).to_numpy(zero_copy_only=False)
        new[1:] |= col[1:] != col[:-1]
    return np.flatnonzero(new)


def grouped_scan(
    ds,
    keys: str | list[str],
    order_by: list[tuple[str, str]],
    specs: list[tuple],
    num_partitions: int = 32,
    keep_cols: list[str] | None = None,
):
    """Running aggregates within each ``keys`` group, ordered by
    ``order_by`` (``(col, "ascending"|"descending")`` pairs).

    ``specs`` entries:
      ``("rownum", out)``        1-based row number within the group
      ``("count", out)``         group size, broadcast to every row
      ``("cumsum", col, out)``   running int64 sum of ``col``
                                 (nulls add 0)

    For deterministic output, ``order_by`` must be a TOTAL order
    within each group (include a unique tie-breaker column, as SQL
    window frames need for reproducible running values); every gate
    query does.

    Output columns: ``keep_cols`` (default: all input columns) +
    the spec outputs. Project ``ds`` to the needed columns *before*
    calling — everything passed in rides the exchange.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    for s in specs:
        if s[0] not in _SPEC_KINDS:
            raise ValueError(f"unknown scan spec {s[0]!r}")

    sort_keys = [(k, "ascending") for k in key_list] + list(order_by)

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=sort_keys)
        t = tbl.take(idx)
        n = t.num_rows
        cols = {c: t.column(c) for c in (keep_cols or t.column_names)}
        if n == 0:
            for s in specs:
                cols[s[-1]] = pa.array([], pa.int64())
            return pa.table(cols)
        starts = _seg_starts(t, key_list)
        lens = np.diff(np.r_[starts, n])
        for s in specs:
            if s[0] == "rownum":
                out = np.arange(n, dtype=np.int64) - np.repeat(
                    starts, lens
                ) + 1
            elif s[0] == "count":
                out = np.repeat(lens.astype(np.int64), lens)
            else:  # cumsum
                col = t.column(s[1])
                if pa.types.is_integer(col.type):
                    # fill nulls ARROW-side (mirror global_scan._apply):
                    # a to_numpy round-trip of int-with-null goes
                    # through float64 and silently loses exactness for
                    # |v| > 2^53 before the cumsum
                    v = pc.fill_null(col.cast(pa.int64()), 0).to_numpy(
                        zero_copy_only=False
                    ).astype(np.int64)
                else:
                    v = col.to_numpy(zero_copy_only=False)
                    if v.dtype.kind == "f":
                        # a genuinely fractional value means the caller
                        # violated the integer contract — fail loudly
                        # instead of truncating toward zero
                        vf = np.nan_to_num(v.astype(np.float64), nan=0.0)
                        if not (vf == np.floor(vf)).all():
                            raise ValueError(
                                f"grouped_scan cumsum column {s[1]!r} "
                                "has non-integral values; cast to "
                                "integer units (cents/micros) first"
                            )
                        v = vf.astype(np.int64)
                    else:
                        v = v.astype(np.int64)
                cs = np.cumsum(v)
                out = cs - np.repeat(cs[starts] - v[starts], lens)
            cols[s[-1]] = pa.array(out)
        return pa.table(cols)

    return hash_exchange(ds, key_list, num_partitions, _kernel)


def global_scan(
    ds,
    sort_keys: list[tuple[str, str]],
    cum_cols: list[tuple[str, str]],
    rank_col: str | None = None,
    num_partitions: int = 32,
):
    """Running int64 sums over the GLOBAL ``sort_keys`` order.

    ``cum_cols``: ``(source_col, out_col)`` pairs — source must be
    integer-typed (exact associative partials; cast money to cents
    first). ``rank_col`` optionally adds the 1-based global rank.
    Two-phase prefix scan: per-block sums → driver prefix → per-block
    rebase; only O(blocks) ints reach the driver.
    """
    from .exchange import _cpus_per_task

    sorted_ds = sort_by(ds, sort_keys, num_partitions=num_partitions)
    refs = sorted_ds.to_arrow_refs()
    src_cols = [c for c, _ in cum_cols]
    ncpu = _cpus_per_task()

    @ray.remote
    def _partials(tbl):
        pa.set_cpu_count(1)  # memory-bound; see exchange._cpus_per_task
        t = tbl if isinstance(tbl, pa.Table) else pa.table(tbl)
        sums = [
            int(pc.sum(t.column(c)).as_py() or 0) for c in src_cols
        ]
        return t.num_rows, sums

    parts = ray.get(
        [_partials.options(num_cpus=ncpu).remote(r) for r in refs]
    )
    # Python-int prefix combine on the driver — exact at any scale
    # (no int64 overflow in the offsets even if totals exceed 2**63
    # would raise on the Arrow cast below, loudly not silently).
    rank_offs, sum_offs = [], []
    rtot, stot = 0, [0] * len(src_cols)
    for n, sums in parts:
        rank_offs.append(rtot)
        sum_offs.append(list(stot))
        rtot += n
        stot = [a + b for a, b in zip(stot, sums)]

    @ray.remote
    def _apply(tbl, roff, soffs):
        pa.set_cpu_count(1)
        t = tbl if isinstance(tbl, pa.Table) else pa.table(tbl)
        n = t.num_rows
        for (c, out), off in zip(cum_cols, soffs):
            # fill nulls with 0 IN ARROW (matching pc.sum's null-skip
            # in _partials) — a to_numpy round-trip of int-with-null
            # goes through float64 NaN and astype(int64) turns NaN
            # into INT64_MIN garbage (the CLAUDE.md trap)
            v = pc.fill_null(
                t.column(c).cast(pa.int64()), 0
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            t = t.append_column(out, pa.array(np.cumsum(v) + off))
        if rank_col is not None:
            t = t.append_column(
                rank_col,
                pa.array(np.arange(1, n + 1, dtype=np.int64) + roff),
            )
        return t

    out_refs = [
        _apply.options(num_cpus=ncpu).remote(b, int(ro), so)
        for b, ro, so in zip(refs, rank_offs, sum_offs)
    ]
    return rd.from_arrow_refs(out_refs)


def global_lag(
    ds,
    sort_keys: list[tuple[str, str]],
    lag_cols: list[tuple[str, str]],
    num_partitions: int = 32,
):
    """``lag(col, 1) OVER (ORDER BY sort_keys)`` with no partition:
    range-partitioned sort, then each block's lag needs exactly ONE
    carry-in row — the previous block's last value — which the driver
    relays as O(blocks) scalars. The global first row lags to null.

    ``lag_cols``: ``(source_col, out_col)`` pairs (any Arrow type —
    values are carried as Arrow scalars, never round-tripped through
    numpy).
    """
    from .exchange import _cpus_per_task

    sorted_ds = sort_by(ds, sort_keys, num_partitions=num_partitions)
    refs = sorted_ds.to_arrow_refs()
    src_cols = [c for c, _ in lag_cols]
    ncpu = _cpus_per_task()

    @ray.remote
    def _last_vals(tbl):
        t = tbl if isinstance(tbl, pa.Table) else pa.table(tbl)
        if t.num_rows == 0:
            return None
        return {c: t.column(c).slice(t.num_rows - 1, 1).to_pylist()[0]
                for c in src_cols}

    lasts = ray.get([_last_vals.remote(r) for r in refs])
    # carry-in for block i = last row of the nearest NON-EMPTY block
    # before it (empty partitions may survive in degenerate inputs)
    carries, prev = [], None
    for lv in lasts:
        carries.append(prev)
        if lv is not None:
            prev = lv

    @ray.remote
    def _apply(tbl, carry):
        pa.set_cpu_count(1)
        t = tbl if isinstance(tbl, pa.Table) else pa.table(tbl)
        n = t.num_rows
        for c, out in lag_cols:
            col = t.column(c)
            if n == 0:
                t = t.append_column(out, pa.array([], col.type))
                continue
            head = pa.array(
                [None if carry is None else carry[c]], col.type
            )
            body = col.slice(0, n - 1)
            if isinstance(body, pa.ChunkedArray):
                body = body.combine_chunks()
            t = t.append_column(out, pa.concat_arrays([head, body]))
        return t

    out_refs = [
        _apply.options(num_cpus=ncpu).remote(b, c)
        for b, c in zip(refs, carries)
    ]
    return rd.from_arrow_refs(out_refs)


def grouped_string_agg(
    ds,
    keys: str | list[str],
    order_by: list[tuple[str, str]],
    value_col: str,
    sep: str,
    out: str,
    count_col: str | None = None,
    num_partitions: int = 32,
):
    """Ordered ``string_agg(value_col, sep)`` per group → one row per
    group (key columns + ``out`` + optional ``count_col``). The join
    itself is C++: a ListArray built from the group offsets fed to
    ``pc.binary_join`` — no per-group Python.

    SQL ``string_agg`` semantics for nulls: null values are SKIPPED
    from the join (an all-null group aggregates to NULL), while
    ``count_col`` counts ALL rows in the group (``count(*)``).
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    sort_keys = [(k, "ascending") for k in key_list] + list(order_by)

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(tbl, sort_keys=sort_keys)
        t = tbl.take(idx)
        n = t.num_rows
        if n == 0:
            cols = {k: t.column(k) for k in key_list}
            cols[out] = pa.array([], pa.string())
            if count_col:
                cols[count_col] = pa.array([], pa.int64())
            return pa.table(cols)
        starts = _seg_starts(t, key_list)
        lens = np.diff(np.r_[starts, n])
        vals = pc.cast(t.column(value_col), pa.string()).combine_chunks()
        valid = vals.is_valid().to_numpy(zero_copy_only=False)
        # per-group offsets over the VALID subset only (binary_join
        # would null the whole group on one null element otherwise —
        # SQL string_agg skips nulls)
        run_id = np.repeat(
            np.arange(len(starts), dtype=np.int64), lens
        )
        valid_per_group = np.bincount(
            run_id[valid], minlength=len(starts)
        )
        offsets = np.r_[0, np.cumsum(valid_per_group)].astype(np.int32)
        kept = vals.filter(pa.array(valid)) if not valid.all() else vals
        lists = pa.ListArray.from_arrays(pa.array(offsets), kept)
        joined = pc.binary_join(lists, sep)
        if (valid_per_group == 0).any():
            joined = pc.if_else(
                pa.array(valid_per_group > 0),
                joined,
                pa.scalar(None, pa.string()),
            )
        cols = {k: t.column(k).take(pa.array(starts)) for k in key_list}
        cols[out] = joined
        if count_col:
            cols[count_col] = pa.array(lens.astype(np.int64))
        return pa.table(cols)

    return hash_exchange(ds, key_list, num_partitions, _kernel)


def global_running_max(
    ds,
    sort_keys: list[tuple[str, str]],
    col: str,
    out_col: str,
    num_partitions: int = 32,
):
    """``max(col) OVER (ORDER BY sort_keys ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` — the EXCLUSIVE running maximum the
    streaming-watermark pattern needs (each row compared against the
    high-water mark of strictly PRIOR rows; the global first row gets
    NULL). ``col`` must be int64-typed (timestamps: cast to µs first).

    Same two-phase shape as :func:`global_scan`: range-partitioned
    sort → per-block maxima → driver prefix-max of PRIOR blocks
    (O(blocks) scalars) → per-block shifted cummax with the carry.
    """
    from .exchange import _cpus_per_task

    sorted_ds = sort_by(ds, sort_keys, num_partitions=num_partitions)
    refs = sorted_ds.to_arrow_refs()
    ncpu = _cpus_per_task()
    _MIN = np.iinfo(np.int64).min

    @ray.remote
    def _blockmax(tbl):
        t = tbl if isinstance(tbl, pa.Table) else pa.table(tbl)
        if t.num_rows == 0:
            return 0, None
        m = pc.max(t.column(col).cast(pa.int64())).as_py()
        return t.num_rows, m

    parts = ray.get([_blockmax.options(num_cpus=ncpu).remote(r)
                     for r in refs])
    carries, offs = [], []
    cur, rtot = None, 0
    for n, m in parts:
        carries.append(cur)
        offs.append(rtot)
        rtot += n
        if m is not None:
            cur = m if cur is None else max(cur, m)

    @ray.remote
    def _apply(tbl, carry, roff):
        pa.set_cpu_count(1)
        t = tbl if isinstance(tbl, pa.Table) else pa.table(tbl)
        n = t.num_rows
        v = t.column(col).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        shifted = np.empty(n, np.int64)
        if n:
            shifted[0] = carry if carry is not None else _MIN
            if n > 1:
                shifted[1:] = v[:-1]
            ex = np.maximum.accumulate(shifted)
        else:
            ex = shifted
        # NULL only where no prior row exists: the global first row
        null = np.zeros(n, bool)
        if n and carry is None and roff == 0:
            null[0] = True
        return t.append_column(out_col, pa.array(ex, mask=null))

    out_refs = [
        _apply.options(num_cpus=ncpu).remote(b, c, int(ro))
        for b, c, ro in zip(refs, carries, offs)
    ]
    return rd.from_arrow_refs(out_refs)
