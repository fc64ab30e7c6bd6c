"""Distributed set operations: UNION / INTERSECT / EXCEPT (DISTINCT).

SQL's bag-to-set operators over arbitrary composite keys, on the
engine's one shuffle primitive: both sides are projected to the key
columns, tagged with an int8 side flag, unioned, and co-located by ONE
hash exchange; each partition then reduces with a single C++
``Table.group_by`` over the exact key values (no hash-collision risk)
computing ``min(side)`` / ``max(side)``:

- ``union``     → every distinct key            (min/max unused)
- ``intersect`` → ``min == 0 AND max == 1``     (seen on both sides)
- ``except``    → ``max == 0``                  (left only)

Duplicates collapse per SQL DISTINCT semantics; NULL keys compare
equal to each other (SQL INTERSECT/EXCEPT treat NULLs as
not-distinct — matching DuckDB), which falls out of ``group_by``
grouping nulls together.

Scale: only key columns ride the exchange, and the map side
pre-distincts each batch, so shuffled bytes are bounded by distinct
keys per batch (the engine's usual partial→final shape). A hot key
value is benign: its duplicates already collapse map-side, and in the
reduce it is a single group with one output row.

Reference analog: the reference's path index implicitly
set-unions the two modality key sets (``/root/reference/
data_handling.py:30-33,50-51``); these operators are the general
distributed form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .exchange import hash_exchange

_SIDE = "__so_side"


def set_op(
    left_ds,
    right_ds,
    keys: str | list[str],
    op: str,
    num_partitions: int = 32,
):
    """DISTINCT set operation over the ``keys`` columns of both sides.

    ``op``: ``"union"`` | ``"intersect"`` | ``"except"`` (left minus
    right). Returns a Dataset with exactly the ``keys`` columns, one
    row per qualifying distinct key.
    """
    if op not in ("union", "intersect", "except"):
        raise ValueError(
            f"op must be 'union'/'intersect'/'except', got {op!r}"
        )
    key_list = [keys] if isinstance(keys, str) else list(keys)

    def _project(side: int):
        def _fn(tbl: pa.Table) -> pa.Table:
            # map-side pre-distinct bounds shuffled bytes by the
            # number of distinct keys per batch
            t = tbl.select(key_list).group_by(key_list).aggregate([])
            return t.append_column(
                _SIDE,
                pa.array([side] * t.num_rows, pa.int8()),
            )

        return _fn

    unioned = left_ds.map_batches(
        _project(0), batch_format="pyarrow", batch_size=None
    ).union(
        right_ds.map_batches(
            _project(1), batch_format="pyarrow", batch_size=None
        )
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        g = tbl.group_by(key_list).aggregate(
            [(_SIDE, "min"), (_SIDE, "max")]
        )
        lo = g.column(_SIDE + "_min")
        hi = g.column(_SIDE + "_max")
        if op == "union":
            keep = None
        elif op == "intersect":
            keep = pc.and_(
                pc.equal(lo, pa.scalar(0, pa.int8())),
                pc.equal(hi, pa.scalar(1, pa.int8())),
            )
        else:  # except
            keep = pc.equal(hi, pa.scalar(0, pa.int8()))
        out = g if keep is None else g.filter(keep)
        return out.select(key_list)

    return hash_exchange(unioned, key_list, num_partitions, _kernel)


def keyed_diff(
    old_ds,
    new_ds,
    key: str,
    val_col: str,
    num_partitions: int = 16,
):
    """CDC-style keyed diff of two table versions: one row per key in
    either side, classified ``added`` (new only) / ``removed`` (old
    only) / ``changed`` / ``unchanged``, with both values carried
    (NULL on the absent side) — the change-data-capture primitive an
    incremental pipeline uses to propagate deltas instead of
    recomputing.

    Inputs: ``(key int64, val_col int64)`` with DISTINCT keys per side
    (pre-aggregate first — the usual partial→final shape). One
    side-tagged hash exchange on ``key``; the partition kernel is a
    lexsort + run-compare, no per-key Python.
    """
    from .exchange import hash_exchange

    out_schema = pa.schema(
        [
            (key, pa.int64()),
            ("old_val", pa.int64()),
            ("new_val", pa.int64()),
            ("change", pa.string()),
        ]
    )

    def _tag(side: int):
        def _fn(tbl: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key: tbl.column(key).cast(pa.int64()),
                    "_v": tbl.column(val_col).cast(pa.int64()),
                    "_s": pa.array(
                        np.full(tbl.num_rows, side, np.int8)
                    ),
                }
            )

        return _fn

    unioned = old_ds.map_batches(
        _tag(0), batch_format="pyarrow", batch_size=None
    ).union(
        new_ds.map_batches(_tag(1), batch_format="pyarrow",
                           batch_size=None)
    )

    def _kernel(_p: int, tbl: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads

        pin_arrow_threads()
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        v = tbl.column("_v").to_numpy(zero_copy_only=False)
        s = tbl.column("_s").to_numpy(zero_copy_only=False)
        o = np.lexsort((s, k))  # old (0) first within a key run
        k, v, s = k[o], v[o], s[o]
        new_run = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, len(k)])
        two = lens == 2
        dup_in_one_side = two & (
            s[starts] == s[np.minimum(starts + 1, len(s) - 1)]
        )
        if (lens > 2).any() or dup_in_one_side.any():
            raise ValueError(
                "keyed_diff: duplicate keys within one side — inputs "
                "must be key-distinct (pre-aggregate first)"
            )
        keys = k[starts]
        has_old = s[starts] == 0
        # a 2-row run is (old, new) by the sort; a 1-row run is one side
        has_new = np.where(two, True, s[starts] == 1)
        old_v = np.where(has_old, v[starts], 0)
        new_v = np.where(
            lens == 2, v[np.minimum(starts + 1, len(v) - 1)],
            np.where(has_old, 0, v[starts]),
        )
        change = np.where(
            ~has_old, "added",
            np.where(
                ~has_new, "removed",
                np.where(old_v != new_v, "changed", "unchanged"),
            ),
        )
        return pa.table(
            {
                key: pa.array(keys),
                "old_val": pa.array(old_v, pa.int64(), mask=~has_old),
                "new_val": pa.array(new_v, pa.int64(), mask=~has_new),
                "change": pa.array(
                    np.asarray(change, dtype=object), pa.string()
                ),
            }
        )

    return hash_exchange(
        unioned, key, num_partitions, _kernel, empty_schema=out_schema
    )
