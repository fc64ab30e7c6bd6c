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
