"""Property-based tests (hypothesis): segment kernels vs brute force on
randomized segment structures, timestamps with ties, and sparse
validity — the randomized complement to the fixed-seed golden tests."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from dane_visual_feature_extraction_worker_ray.functions import segkernels as sk


@st.composite
def segmented_series(draw):
    n_segs = draw(st.integers(1, 6))
    sizes = [draw(st.integers(1, 12)) for _ in range(n_segs)]
    seg = np.repeat(np.arange(n_segs), sizes)
    n = len(seg)
    # non-decreasing ts within segment, ties allowed
    gaps = draw(
        st.lists(st.integers(0, 50), min_size=n, max_size=n)
    )
    first = sk.segment_first_index(seg)
    g = np.array(gaps, dtype=np.int64)
    g[first] = 0
    cs = np.cumsum(g)
    base = np.repeat(
        np.array([draw(st.integers(0, 1000)) for _ in range(n_segs)]),
        sizes,
    )
    ts = base + cs - cs[first]
    return seg, np.asarray(ts, dtype=np.int64)


@settings(max_examples=40, deadline=None)
@given(segmented_series(), st.integers(1, 60))
def test_sessionize_property(data, gap):
    seg, ts = data
    sid, tis = sk.sessionize(ts, seg, gap)
    first = sk.segment_first_index(seg)
    for i in range(len(seg)):
        if first[i] == i:
            assert sid[i] == 0 and tis[i] == 0
        else:
            if ts[i] - ts[i - 1] > gap:
                assert sid[i] == sid[i - 1] + 1 and tis[i] == 0
            else:
                assert sid[i] == sid[i - 1] and tis[i] == tis[i - 1] + 1


@settings(max_examples=40, deadline=None)
@given(segmented_series(), st.integers(1, 8))
def test_row_window_property(data, w):
    seg, ts = data
    rng = np.random.default_rng(0)
    x = rng.integers(0, 5, len(seg))
    first = sk.segment_first_index(seg)
    start = sk.row_window_bounds(seg, w)
    wsum, wcnt = sk.windowed_sum_count(x, None, start)
    for i in range(len(seg)):
        s0 = max(first[i], i - w + 1)
        assert wsum[i] == x[s0 : i + 1].sum()
        assert wcnt[i] == i + 1 - s0


@settings(max_examples=40, deadline=None)
@given(segmented_series(), st.integers(1, 100))
def test_time_window_counts_property(data, tw):
    seg, ts = data
    cnt = sk.time_window_counts(ts, seg, tw)
    for i in range(len(seg)):
        expect = sum(
            1
            for j in range(len(seg))
            if seg[j] == seg[i] and ts[i] - tw <= ts[j] <= ts[i]
        )
        assert cnt[i] == expect, (i, cnt[i], expect)


@settings(max_examples=40, deadline=None)
@given(segmented_series())
def test_ffill_property(data):
    seg, ts = data
    rng = np.random.default_rng(1)
    valid = rng.random(len(seg)) < 0.4
    first = sk.segment_first_index(seg)
    idx, ok = sk.ffill_indices(valid, seg)
    for i in range(len(seg)):
        cands = [j for j in range(first[i], i + 1) if valid[j]]
        if cands:
            assert ok[i] and idx[i] == cands[-1]
        else:
            assert not ok[i]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 200)),
        min_size=0,
        max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 200)),
        min_size=0,
        max_size=25,
    ),
    st.booleans(),
)
def test_asof_property(left, right, allow_exact):
    lk = np.array([k for k, _ in sorted(left)], dtype=np.int64)
    lt = np.array([t for _, t in sorted(left)], dtype=np.int64)
    rk = np.array([k for k, _ in sorted(right)], dtype=np.int64)
    rt = np.array([t for _, t in sorted(right)], dtype=np.int64)
    idx, ok = sk.asof_indices(lk, lt, rk, rt, allow_exact=allow_exact)
    for i in range(len(lk)):
        if allow_exact:
            c = [j for j in range(len(rk)) if rk[j] == lk[i] and rt[j] <= lt[i]]
        else:
            c = [j for j in range(len(rk)) if rk[j] == lk[i] and rt[j] < lt[i]]
        if c:
            assert ok[i] and idx[i] == c[-1]
        else:
            assert not ok[i]
