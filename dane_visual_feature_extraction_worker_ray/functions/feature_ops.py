"""User-extension surface: a registry of named per-conversation
feature ops.

Reference analog: the model-type registry switch (``AVNet`` /
``VisualNet`` selected by config string, error on unknown —
``/root/reference/nn_models.py:330-348``, ``data_handling.py:56-61``).
Here the extension point is a *vectorized kernel*: an op receives the
bucket kernel's segment context (already sorted, deduped, segmented)
and returns one column for every turn row — it runs inside the same
single pass as the built-in features, so user ops inherit the engine's
shuffle, salting-compatibility is the op author's concern only if it
needs cross-chunk state (built-ins that do are in segkernels).

Op contract::

    @register_feature_op("my_op")
    def my_op(ctx: FeatureOpContext) -> pa.Array:   # len == ctx.n rows
        ...

``ctx`` fields: ``n``, ``ts_us`` (int64, sorted per conv), ``seg``
(contiguous segment ids), ``first`` (segment-start index per row),
``turn_idx``, ``role`` / ``text`` / ``tool`` (Arrow arrays),
``tool_valid`` (bool ndarray), ``cfg`` (FeatureConfig). No Python
per-row loops — numpy/pyarrow only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa

from ..config import FeatureConfig
from . import segkernels as sk


@dataclass
class FeatureOpContext:
    n: int
    ts_us: np.ndarray
    seg: np.ndarray
    first: np.ndarray
    turn_idx: np.ndarray
    role: pa.Array
    text: pa.Array
    tool: pa.Array
    tool_valid: np.ndarray
    cfg: FeatureConfig


FEATURE_OPS: dict[str, Callable[[FeatureOpContext], pa.Array]] = {}
FEATURE_OP_TYPES: dict[str, pa.DataType] = {}


def register_feature_op(name: str, dtype: pa.DataType):
    """``dtype`` declares the output column type up front so empty
    partitions can still emit a complete, consistent schema."""

    def deco(fn):
        if name in FEATURE_OPS:
            raise ValueError(f"feature op {name!r} already registered")
        FEATURE_OPS[name] = fn
        FEATURE_OP_TYPES[name] = dtype
        return fn

    return deco


def resolve_ops(names) -> dict[str, Callable]:
    unknown = [n for n in names if n not in FEATURE_OPS]
    if unknown:  # error on unknown, like the reference's model switch
        raise KeyError(
            f"unknown feature op(s) {unknown}; registered: "
            f"{sorted(FEATURE_OPS)}"
        )
    return {n: FEATURE_OPS[n] for n in names}


# --------------------------------------------------------------------------
# built-in example ops


@register_feature_op("conv_turn_count", pa.int64())
def conv_turn_count(ctx: FeatureOpContext) -> pa.Array:
    """Total turns of the row's conversation, broadcast per row.

    SQL: ``count(*) OVER (PARTITION BY conv_id)``.
    """
    last = sk.is_segment_last(ctx.seg)
    sizes = np.flatnonzero(last) - ctx.first[last] + 1
    return pa.array(sizes[ctx.seg].astype(np.int64))


@register_feature_op("is_session_start", pa.bool_())
def is_session_start(ctx: FeatureOpContext) -> pa.Array:
    """True where a new session begins (first turn or gap > threshold)."""
    delta, dvalid = sk.lag_delta_us(ctx.ts_us, ctx.seg)
    return pa.array((~dvalid) | (delta > ctx.cfg.session_gap_us))


@register_feature_op("role_changed", pa.bool_())
def role_changed(ctx: FeatureOpContext) -> pa.Array:
    """True when the role differs from the previous turn's (first turn
    of a conversation → false; SQL: ``role <> lag(role) OVER w``
    with NULL → false)."""
    import pyarrow.compute as pc

    lag_idx, lag_valid = sk.lag_indices(ctx.seg)
    prev = ctx.role.take(pa.array(lag_idx))
    changed = pc.fill_null(pc.not_equal(ctx.role, prev), False)
    return pc.and_(changed, pa.array(lag_valid))
