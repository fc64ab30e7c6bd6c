"""Brute-force validation of the segment-vectorized kernels."""

from __future__ import annotations

import numpy as np
import pytest

from dane_visual_feature_extraction_worker_ray.functions import segkernels as sk


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    seg = sk.segment_ids(np.sort(rng.integers(0, 12, 300)))
    ts = np.cumsum(rng.integers(0, 100, 300)).astype(np.int64)
    return seg, ts, rng


def test_segment_first_index(data):
    seg, ts, _ = data
    first = sk.segment_first_index(seg)
    for i in range(len(seg)):
        assert first[i] == np.flatnonzero(seg == seg[i])[0]


def test_lag_delta(data):
    seg, ts, _ = data
    first = sk.segment_first_index(seg)
    d, v = sk.lag_delta_us(ts, seg)
    for i in range(len(seg)):
        if first[i] == i:
            assert not v[i]
        else:
            assert v[i] and d[i] == ts[i] - ts[i - 1]


def test_sessionize(data):
    seg, ts, _ = data
    sid, tis = sk.sessionize(ts, seg, 50)
    for s in np.unique(seg):
        idx = np.flatnonzero(seg == s)
        cur, count = 0, 0
        for k, i in enumerate(idx):
            if k > 0 and ts[i] - ts[idx[k - 1]] > 50:
                cur, count = cur + 1, 0
            elif k > 0:
                count += 1
            assert sid[i] == cur and tis[i] == count


def test_row_window(data):
    seg, ts, _ = data
    rng = np.random.default_rng(8)
    x = rng.integers(0, 10, len(seg))
    first = sk.segment_first_index(seg)
    ws = sk.row_window_bounds(seg, 5)
    wsum, wc = sk.windowed_sum_count(x, None, ws)
    for i in range(len(seg)):
        s0 = max(first[i], i - 4)
        assert wsum[i] == x[s0 : i + 1].sum() and wc[i] == i + 1 - s0


def test_time_window(data):
    seg, ts, _ = data
    first = sk.segment_first_index(seg)
    tw = sk.time_window_bounds(ts, seg, 120)
    for i in range(len(seg)):
        j = first[i]
        while ts[j] < ts[i] - 120:
            j += 1
        assert tw[i] == j


def test_ffill(data):
    seg, ts, _ = data
    rng = np.random.default_rng(9)
    valid = rng.random(len(seg)) < 0.3
    first = sk.segment_first_index(seg)
    fi, fok = sk.ffill_indices(valid, seg)
    for i in range(len(seg)):
        idxs = [j for j in range(first[i], i + 1) if valid[j]]
        if idxs:
            assert fok[i] and fi[i] == idxs[-1]
        else:
            assert not fok[i]


@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof(allow_exact):
    rng = np.random.default_rng(11)
    lk = np.sort(rng.integers(0, 6, 80))
    lt = np.sort(rng.integers(0, 1000, 80))
    o = np.lexsort((lt, lk))
    lk, lt = lk[o], lt[o]
    rk = np.sort(rng.integers(0, 6, 25))
    rt = np.sort(rng.integers(0, 1000, 25))
    o = np.lexsort((rt, rk))
    rk, rt = rk[o], rt[o]
    ai, av = sk.asof_indices(lk, lt, rk, rt, allow_exact=allow_exact)
    for i in range(len(lk)):
        if allow_exact:
            c = [j for j in range(len(rk)) if rk[j] == lk[i] and rt[j] <= lt[i]]
        else:
            c = [j for j in range(len(rk)) if rk[j] == lk[i] and rt[j] < lt[i]]
        if c:
            assert av[i] and ai[i] == c[-1]
        else:
            assert not av[i]


def test_asof_empty_sides():
    e = np.empty(0, dtype=np.int64)
    idx, ok = sk.asof_indices(e, e, e, e)
    assert len(idx) == 0
    idx, ok = sk.asof_indices(
        np.array([0]), np.array([5]), e, e
    )
    assert not ok[0]


def test_tumble_bucket():
    ts = np.array([0, 999, 1000, 1001, 2500], dtype=np.int64)
    assert (sk.tumble_bucket(ts, 1000) == [0, 0, 1000, 1000, 2000]).all()


@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_forward(allow_exact):
    rng = np.random.default_rng(12)
    lk = np.sort(rng.integers(0, 6, 80))
    lt = np.sort(rng.integers(0, 1000, 80))
    o = np.lexsort((lt, lk))
    lk, lt = lk[o], lt[o]
    rk = np.sort(rng.integers(0, 6, 25))
    rt = np.sort(rng.integers(0, 1000, 25))
    o = np.lexsort((rt, rk))
    rk, rt = rk[o], rt[o]
    ai, av = sk.asof_indices_forward(lk, lt, rk, rt, allow_exact=allow_exact)
    for i in range(len(lk)):
        if allow_exact:
            c = [j for j in range(len(rk)) if rk[j] == lk[i] and rt[j] >= lt[i]]
        else:
            c = [j for j in range(len(rk)) if rk[j] == lk[i] and rt[j] > lt[i]]
        if c:
            assert av[i] and ai[i] == c[0]  # EARLIEST at-or-after
        else:
            assert not av[i]


def test_asof_forward_never_reads_past():
    # mirror of the leakage probe: perturbing PAST snapshots must not
    # change the forward (label) lookup
    lk = np.array([0, 0, 0], dtype=np.int64)
    lt = np.array([10, 20, 30], dtype=np.int64)
    rk = np.array([0, 0, 0], dtype=np.int64)
    rt = np.array([5, 25, 35], dtype=np.int64)
    ai, av = sk.asof_indices_forward(lk, lt, rk, rt)
    assert av.all() and ai.tolist() == [1, 1, 2]
    # drop the past snapshot: labels unchanged
    ai2, av2 = sk.asof_indices_forward(lk, lt, rk[1:], rt[1:])
    assert av2.all() and ai2.tolist() == [0, 0, 1]
    assert (rt[1:][ai2] == rt[ai]).all()


def test_asof_forward_empty_sides():
    e = np.empty(0, dtype=np.int64)
    idx, ok = sk.asof_indices_forward(e, e, e, e)
    assert len(idx) == 0
    idx, ok = sk.asof_indices_forward(np.array([0]), np.array([5]), e, e)
    assert not ok[0]


def test_bfill_indices_brute_force():
    rng = np.random.default_rng(23)
    n = 200
    seg = np.sort(rng.integers(0, 12, n))
    valid = rng.random(n) < 0.3
    idx, ok = sk.bfill_indices(valid, seg)
    for i in range(n):
        nxt = [j for j in range(i, n) if seg[j] == seg[i] and valid[j]]
        if nxt:
            assert ok[i] and idx[i] == nxt[0]
        else:
            assert not ok[i]


def test_segment_last_index():
    seg = np.array([0, 0, 1, 1, 1, 2])
    assert sk.segment_last_index(seg).tolist() == [1, 1, 4, 4, 4, 5]
    assert len(sk.segment_last_index(np.empty(0, np.int64))) == 0
