"""Segment-vectorized per-conversation kernels.

These are the engine's hot-path compute primitives. Each operates on
arrays that are already sorted by ``(conv_id, turn_idx, ts)`` and a
contiguous int segment-id array (``seg``: 0..n_segments-1, constant
within a conversation, non-decreasing). A single numpy pass handles
*every conversation in the batch at once* — there is no per-group
Python loop anywhere (reference contrast: per-item ``__getitem__``
loop, ``/root/reference/data_handling.py:74-84``).

All time arithmetic is int64 microseconds → bit-exact parity with the
DuckDB oracle (``epoch_us``). Missing values are represented as
``(values, valid_mask)`` pairs so NaN-vs-null is decided only at the
Arrow boundary.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# segment structure


def segment_ids(sorted_codes: np.ndarray) -> np.ndarray:
    """Contiguous 0-based segment ids from an already-grouped code array."""
    if len(sorted_codes) == 0:
        return np.empty(0, dtype=np.int64)
    boundary = np.empty(len(sorted_codes), dtype=bool)
    boundary[0] = True
    np.not_equal(sorted_codes[1:], sorted_codes[:-1], out=boundary[1:])
    return np.cumsum(boundary) - 1


def segment_first_index(seg: np.ndarray) -> np.ndarray:
    """For each row, the row index where its segment starts."""
    n = len(seg)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = np.zeros(n, dtype=np.int64)
    idx = np.arange(1, n, dtype=np.int64)
    first[1:] = np.where(seg[1:] != seg[:-1], idx, 0)
    np.maximum.accumulate(first, out=first)
    return first


def is_segment_first(seg: np.ndarray) -> np.ndarray:
    n = len(seg)
    out = np.empty(n, dtype=bool)
    if n:
        out[0] = True
        np.not_equal(seg[1:], seg[:-1], out=out[1:])
    return out


def is_segment_last(seg: np.ndarray) -> np.ndarray:
    n = len(seg)
    out = np.empty(n, dtype=bool)
    if n:
        out[-1] = True
        np.not_equal(seg[1:], seg[:-1], out=out[:-1])
    return out


# ---------------------------------------------------------------------------
# lag / lead


def lag_indices(seg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(index of previous row in same segment, valid mask)."""
    n = len(seg)
    idx = np.arange(n, dtype=np.int64) - 1
    valid = ~is_segment_first(seg)
    idx[~valid] = 0  # harmless placeholder
    return idx, valid


def lead_indices(seg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(index of next row in same segment, valid mask)."""
    n = len(seg)
    idx = np.arange(n, dtype=np.int64) + 1
    valid = ~is_segment_last(seg)
    idx[~valid] = 0
    return idx, valid


def lag_delta_us(ts_us: np.ndarray, seg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """ts - lag(ts) per segment, int64 us. Returns (delta, valid)."""
    n = len(ts_us)
    delta = np.zeros(n, dtype=np.int64)
    if n:
        delta[1:] = ts_us[1:] - ts_us[:-1]
    valid = ~is_segment_first(seg)
    delta[~valid] = 0
    return delta, valid


# ---------------------------------------------------------------------------
# sessionization


def sessionize(
    ts_us: np.ndarray, seg: np.ndarray, gap_us: int
) -> tuple[np.ndarray, np.ndarray]:
    """Gap-based sessions within each segment.

    A new session starts at the first row of a segment and whenever
    ``ts - lag(ts) > gap_us``. Returns ``(session_id, turn_in_session)``
    both int64, 0-based. Oracle SQL equivalent::

        SUM(CASE WHEN delta IS NULL OR delta > gap THEN 1 ELSE 0 END)
          OVER (PARTITION BY conv ORDER BY turn_idx) - 1
    """
    n = len(ts_us)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    delta, dvalid = lag_delta_us(ts_us, seg)
    new_sess = (~dvalid) | (delta > gap_us)
    # absolute cumsum, re-based at each segment start (new_sess is True there)
    gsid = np.cumsum(new_sess)
    first = segment_first_index(seg)
    session_id = gsid - gsid[first]  # 0-based within segment
    sess_start = np.where(new_sess, np.arange(n, dtype=np.int64), -1)
    np.maximum.accumulate(sess_start, out=sess_start)
    turn_in_session = np.arange(n, dtype=np.int64) - sess_start
    return session_id.astype(np.int64), turn_in_session


# ---------------------------------------------------------------------------
# sliding windows (row-based and time-based), exact integer accumulation


def _shifted_cumsum(x: np.ndarray) -> np.ndarray:
    cs = np.empty(len(x) + 1, dtype=np.int64)
    cs[0] = 0
    np.cumsum(x, dtype=np.int64, out=cs[1:])
    return cs


def row_window_bounds(seg: np.ndarray, window: int) -> np.ndarray:
    """Start index of the ROWS-window [i-window+1, i] clipped at segment start."""
    first = segment_first_index(seg)
    i = np.arange(len(seg), dtype=np.int64)
    return np.maximum(first, i - window + 1)


def time_window_bounds(
    ts_us: np.ndarray, seg: np.ndarray, window_us: int
) -> np.ndarray:
    """Start index of the RANGE-window [ts_i - window_us, ts_i] per segment.

    Single global ``searchsorted`` via a strictly-increasing composite
    key: each segment's timestamps are shifted into a disjoint range
    separated by > window_us, so a query never crosses a segment
    boundary. O(n log n), fully vectorized across conversations.
    """
    n = len(ts_us)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = segment_first_index(seg)
    is_first = is_segment_first(seg)
    starts = np.flatnonzero(is_first)
    seg_min = ts_us[starts]
    # last row of each segment = row before next start, plus global last
    ends = np.concatenate((starts[1:] - 1, [n - 1]))
    seg_max = ts_us[ends]
    span = (seg_max - seg_min).astype(np.int64)
    offsets = np.zeros(len(starts), dtype=np.int64)
    if len(starts) > 1:
        np.cumsum(span[:-1] + window_us + 1, out=offsets[1:])
    g = (ts_us - seg_min[seg]) + offsets[seg]
    target = g - window_us
    j = np.searchsorted(g, target, side="left").astype(np.int64)
    # by construction j lands inside the row's own segment
    return np.maximum(j, first)


def time_window_counts(
    ts_us: np.ndarray, seg: np.ndarray, window_us: int
) -> np.ndarray:
    """Row count of the value-based window [ts_i - window_us, ts_i].

    Includes *all* rows whose ts falls in the window — also ts-peers
    that sort after row i — matching SQL ``RANGE BETWEEN window
    PRECEDING AND CURRENT ROW`` frame semantics exactly.
    """
    n = len(ts_us)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    left = time_window_bounds(ts_us, seg, window_us)
    # recompute the composite key to find the last ts-peer (inclusive)
    first = segment_first_index(seg)
    starts = np.flatnonzero(is_segment_first(seg))
    seg_min = ts_us[starts]
    ends = np.concatenate((starts[1:] - 1, [n - 1]))
    seg_max = ts_us[ends]
    span = (seg_max - seg_min).astype(np.int64)
    offsets = np.zeros(len(starts), dtype=np.int64)
    if len(starts) > 1:
        np.cumsum(span[:-1] + window_us + 1, out=offsets[1:])
    g = (ts_us - seg_min[seg]) + offsets[seg]
    right = np.searchsorted(g, g, side="right").astype(np.int64)
    return right - left


def windowed_sum_count(
    values: np.ndarray,
    valid: np.ndarray | None,
    win_start: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact windowed (sum, non-null count) over int64 values.

    ``values`` must already have 0 at invalid slots. Sums are int64 →
    bit-identical to any other exact integer accumulation (the oracle's
    SQL ``SUM`` over BIGINT).
    """
    n = len(values)
    i = np.arange(n, dtype=np.int64)
    cs = _shifted_cumsum(values)
    wsum = cs[i + 1] - cs[win_start]
    if valid is None:
        wcount = i + 1 - win_start
    else:
        cv = _shifted_cumsum(valid.astype(np.int64))
        wcount = cv[i + 1] - cv[win_start]
    return wsum, wcount


def ratio(num: np.ndarray, den: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """num/den as float64 with a valid mask (den==0 → invalid).

    Single IEEE division of exact integers → bit-identical to the
    oracle's ``CAST(sum AS DOUBLE)/count``.
    """
    den_safe = np.where(den == 0, 1, den)
    out = num.astype(np.float64) / den_safe.astype(np.float64)
    return out, den != 0


# ---------------------------------------------------------------------------
# forward fill


def ffill_indices(
    valid: np.ndarray, seg: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(index of latest valid row at-or-before i within segment, mask).

    Reference analog: zero-fill of missing modality cells
    (``data_handling.py:93-99``) — here the backfill carries the last
    observation forward instead of imputing a constant.
    """
    n = len(valid)
    idx = np.where(valid, np.arange(n, dtype=np.int64), -1)
    np.maximum.accumulate(idx, out=idx)
    first = segment_first_index(seg)
    ok = idx >= first  # a valid index from an earlier segment never applies
    idx_safe = np.where(ok, idx, 0)
    return idx_safe, ok


def segment_last_index(seg: np.ndarray) -> np.ndarray:
    """For each row, the row index where its segment ends (mirror of
    :func:`segment_first_index` via the reversed array)."""
    n = len(seg)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    return n - 1 - segment_first_index(seg[::-1])[::-1]


def bfill_indices(
    valid: np.ndarray, seg: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(index of earliest valid row at-or-after i within segment, mask)
    — backward fill, the mirror of :func:`ffill_indices`. Like the
    forward as-of mirror, this reads the future: a label/backfill
    operator, not a leakage-safe feature."""
    n = len(valid)
    idx = np.where(valid, np.arange(n, dtype=np.int64), n)
    idx = np.minimum.accumulate(idx[::-1])[::-1]
    last = segment_last_index(seg)
    ok = idx <= last  # a valid index from a later segment never applies
    idx_safe = np.where(ok, idx, 0)
    return idx_safe, ok


# ---------------------------------------------------------------------------
# sorted-merge as-of lookup (core graft; reference analog
# find_shot_for_timestamp, data_handling.py:121-129)


def asof_indices(
    left_key: np.ndarray,
    left_ts: np.ndarray,
    right_key: np.ndarray,
    right_ts: np.ndarray,
    allow_exact: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """For each left row, index of the latest right row with the same
    int key and ``right_ts <= left_ts`` (or ``<`` when not allow_exact).

    Both sides must be sorted by (key, ts). Returns (index, valid);
    invalid = no prior snapshot (reference sentinel ``(-1,-1)``,
    data_handling.py:128-129 → here a typed null).

    Implemented as one vectorized ``searchsorted`` over a composite
    monotone key — zero Python per-group work. Keys are assumed to be
    *dense small ints* (factorized codes), so the composite
    ``key * (span+2) + (ts - min_ts)`` fits int64; the caller
    guarantees ``(max_key+1) * (span+2)`` < 2**63 by bucketing.
    """
    nl, nr = len(left_key), len(right_key)
    out_idx = np.zeros(nl, dtype=np.int64)
    if nl == 0 or nr == 0:
        return out_idx, np.zeros(nl, dtype=bool)
    lo = min(left_ts.min(), right_ts.min())
    hi = max(left_ts.max(), right_ts.max())
    span = int(hi) - int(lo) + 2
    max_key = int(max(left_key.max(), right_key.max()))
    if (max_key + 1) * span >= 2**63:
        raise OverflowError(
            "composite as-of key overflows int64; factorize keys per bucket"
        )
    gl = left_key.astype(np.int64) * span + (left_ts.astype(np.int64) - lo)
    gr = right_key.astype(np.int64) * span + (right_ts.astype(np.int64) - lo)
    side = "right" if allow_exact else "left"
    pos = np.searchsorted(gr, gl, side=side)  # count of right rows <= / < left
    idx = pos - 1
    valid = idx >= 0
    idx_safe = np.where(valid, idx, 0)
    # same-key check: the found right row must share the left row's key
    valid &= right_key[idx_safe] == left_key
    out_idx = np.where(valid, idx_safe, 0)
    return out_idx, valid


def asof_indices_forward(
    left_key: np.ndarray,
    left_ts: np.ndarray,
    right_key: np.ndarray,
    right_ts: np.ndarray,
    allow_exact: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Mirror of :func:`asof_indices` looking FORWARD: for each left
    row, index of the EARLIEST right row with the same int key and
    ``right_ts >= left_ts`` (``>`` when not allow_exact).

    The backward join is the leakage-safe *feature* lookup; this one
    is the *label* lookup — "the next snapshot/outcome at or after
    this turn" — which deliberately reads the future. Same composite
    monotone-key searchsorted, same dense-small-int key contract.
    """
    nl, nr = len(left_key), len(right_key)
    if nl == 0 or nr == 0:
        return np.zeros(nl, dtype=np.int64), np.zeros(nl, dtype=bool)
    lo = min(left_ts.min(), right_ts.min())
    hi = max(left_ts.max(), right_ts.max())
    span = int(hi) - int(lo) + 2
    max_key = int(max(left_key.max(), right_key.max()))
    if (max_key + 1) * span >= 2**63:
        raise OverflowError(
            "composite as-of key overflows int64; factorize keys per bucket"
        )
    gl = left_key.astype(np.int64) * span + (left_ts.astype(np.int64) - lo)
    gr = right_key.astype(np.int64) * span + (right_ts.astype(np.int64) - lo)
    side = "left" if allow_exact else "right"
    idx = np.searchsorted(gr, gl, side=side)  # first right row >= / > left
    valid = idx < nr
    idx_safe = np.where(valid, idx, 0)
    valid &= right_key[idx_safe] == left_key
    out_idx = np.where(valid, idx_safe, 0)
    return out_idx, valid


# ---------------------------------------------------------------------------
# tumbling windows


def tumble_bucket(ts_us: np.ndarray, tumble_us: int) -> np.ndarray:
    """Floor each timestamp to its tumbling-window start (int64 us).

    Timestamps are non-negative (unix epoch) so integer division is the
    floor; oracle equivalent ``date_trunc`` for hour-aligned windows or
    ``to_timestamp(epoch_us//w*w)`` generally.
    """
    return (ts_us // tumble_us) * tumble_us
