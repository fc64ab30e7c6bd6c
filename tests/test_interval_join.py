"""Tests for the distributed interval (range) join
(stages/interval_join.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.interval_join import (
    interval_join,
)


def _brute(pts: pd.DataFrame, ivs: pd.DataFrame) -> set:
    out = set()
    for w, s, e in ivs[["win_id", "start", "end"]].itertuples(index=False):
        for p, t in pts[["pid", "ts"]].itertuples(index=False):
            if s <= t < e:
                out.add((int(w), int(p)))
    return out


def _run(pts, ivs, width, parts=4):
    got = interval_join(
        rd.from_pandas(pts),
        rd.from_pandas(ivs),
        point_ts_col="ts",
        start_col="start",
        end_col="end",
        point_cols=["pid"],
        interval_cols=["win_id"],
        bucket_width=width,
        num_partitions=parts,
    ).to_pandas()
    return set(zip(got["win_id"].astype(int), got["pid"].astype(int)))


def test_interval_join_boundaries_and_spans(ray_session):
    pts = pd.DataFrame(
        {
            "pid": np.arange(6, dtype=np.int64),
            "ts": np.array([0, 10, 19, 20, 35, 100], dtype=np.int64),
        }
    )
    ivs = pd.DataFrame(
        {
            "win_id": np.array([0, 1, 2, 3], dtype=np.int64),
            # [10, 20): start inclusive, end exclusive
            # [5, 40): spans several width-10 buckets
            # [50, 50): empty — matches nothing
            # [95, 105): catches the last point across a bucket edge
            "start": np.array([10, 5, 50, 95], dtype=np.int64),
            "end": np.array([20, 40, 50, 105], dtype=np.int64),
        }
    )
    got = _run(pts, ivs, width=10)
    exp = _brute(pts, ivs)
    assert got == exp
    assert (0, 1) in got and (0, 2) in got  # ts=10 in, ts=19 in
    assert (0, 3) not in got  # ts=20 excluded (end exclusive)
    assert all(w != 2 for w, _ in got)  # empty interval matches nothing


def test_interval_join_random_vs_brute(ray_session):
    rng = np.random.default_rng(7)
    n, m = 400, 80
    pts = pd.DataFrame(
        {
            "pid": np.arange(n, dtype=np.int64),
            "ts": rng.integers(0, 10_000, n).astype(np.int64),
        }
    )
    start = rng.integers(0, 10_000, m).astype(np.int64)
    ivs = pd.DataFrame(
        {
            "win_id": np.arange(m, dtype=np.int64),
            "start": start,
            "end": start + rng.integers(1, 900, m).astype(np.int64),
        }
    )
    for width in (100, 512, 5000):
        assert _run(pts, ivs, width) == _brute(pts, ivs), width


def test_interval_join_many_to_many_multiplicity(ray_session):
    # duplicate timestamps and overlapping windows: every pair appears
    # exactly ONCE (the point lives in one bucket) with full expansion
    pts = pd.DataFrame(
        {"pid": np.arange(4, dtype=np.int64),
         "ts": np.array([7, 7, 7, 8], dtype=np.int64)}
    )
    ivs = pd.DataFrame(
        {"win_id": np.array([0, 1], dtype=np.int64),
         "start": np.array([0, 5], dtype=np.int64),
         "end": np.array([10, 9], dtype=np.int64)}
    )
    got = interval_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        point_ts_col="ts", start_col="start", end_col="end",
        point_cols=["pid"], interval_cols=["win_id"],
        bucket_width=4, num_partitions=3,
    ).to_pandas()
    assert len(got) == 8  # 2 windows x 4 points, no duplicates
    assert len(got.drop_duplicates()) == 8


def test_interval_join_validation(ray_session):
    pts = pd.DataFrame({"pid": [1], "ts": [0]})
    ivs = pd.DataFrame({"pid": [1], "start": [0], "end": [1]})
    import pytest

    with pytest.raises(ValueError, match="collision"):
        interval_join(
            rd.from_pandas(pts), rd.from_pandas(ivs),
            point_ts_col="ts", start_col="start", end_col="end",
            point_cols=["pid"], interval_cols=["pid"], bucket_width=10,
        )
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(
            rd.from_pandas(pts), rd.from_pandas(ivs),
            point_ts_col="ts", start_col="start", end_col="end",
            point_cols=["pid"], interval_cols=[], bucket_width=0,
        )


# --------------------------------------------------------------------------
# interval × interval overlap join


def _mk_intervals(rows, id_name):
    return rd.from_arrow(
        pa.table(
            {
                id_name: pa.array([r[0] for r in rows], pa.int64()),
                "st": pa.array([r[1] for r in rows], pa.int64()),
                "en": pa.array([r[2] for r in rows], pa.int64()),
            }
        )
    )


def _overlap_run(left, right, W):
    from dane_visual_feature_extraction_worker_ray.stages.interval_join import (
        interval_overlap_join,
    )

    out = interval_overlap_join(
        _mk_intervals(left, "lid"), _mk_intervals(right, "rid"),
        "st", "en", "st", "en", ["lid"], ["rid"],
        bucket_width=W, num_partitions=4,
    ).to_pandas()
    return {
        (l, r): (s, e)
        for l, r, s, e in zip(out.lid, out.rid, out.ov_start, out.ov_end)
    }


def test_overlap_join_boundaries(ray_session):
    # exclusive ends: [0,10) and [10,20) do NOT overlap; [0,11) does
    left = [(1, 0, 10), (2, 0, 11), (3, 5, 6)]
    right = [(7, 10, 20), (8, 0, 100)]
    got = _overlap_run(left, right, W=8)
    assert (1, 7) not in got
    assert got[(2, 7)] == (10, 11)
    assert got[(1, 8)] == (0, 10)
    assert got[(2, 8)] == (0, 11)
    assert got[(3, 8)] == (5, 6)
    assert len(got) == 4


def test_overlap_join_random_vs_brute_each_pair_once(ray_session):
    rng = np.random.default_rng(23)
    left = [
        (i, int(s := rng.integers(0, 2000)), int(s + rng.integers(1, 300)))
        for i in range(120)
    ]
    right = [
        (i, int(s := rng.integers(0, 2000)), int(s + rng.integers(1, 300)))
        for i in range(110)
    ]
    for W in (7, 100, 5000):  # smaller, comparable, larger than spans
        out = _overlap_run(left, right, W)
        brute = {
            (l, r): (max(ls, rs), min(le, re))
            for l, ls, le in left
            for r, rs, re in right
            if max(ls, rs) < min(le, re)
        }
        assert out == brute, f"W={W}"


def test_overlap_join_self_join_orientations(ray_session):
    # self-join emits identity + both orientations; canonical filter
    # downstream keeps exactly one per unordered pair
    rows = [(1, 0, 10), (2, 5, 15), (3, 20, 30)]
    got = _overlap_run(rows, rows, W=8)
    assert got[(1, 1)] == (0, 10) and got[(2, 1)] == got[(1, 2)] == (5, 10)
    uno = {(a, b) for (a, b) in got if a < b}
    assert uno == {(1, 2)}


def test_overlap_join_tie_heavy_starts(ray_session):
    """Many intervals sharing exact start values (and exact start==
    another's start edge cases) — the searchsorted boundaries between
    case A (>=) and case B (strict >) must not double-count or drop."""
    rng = np.random.default_rng(31)
    starts = rng.choice([0, 10, 20, 30], size=80)  # heavy ties
    left = [(i, int(s), int(s + rng.choice([1, 5, 15]))) for i, s in
            enumerate(starts)]
    starts_r = rng.choice([0, 10, 20, 30], size=70)
    right = [(i, int(s), int(s + rng.choice([1, 5, 15]))) for i, s in
             enumerate(starts_r)]
    for W in (4, 10, 100):
        got = _overlap_run(left, right, W)
        brute = {
            (l, r): (max(ls, rs), min(le, re))
            for l, ls, le in left
            for r, rs, re in right
            if max(ls, rs) < min(le, re)
        }
        assert got == brute, f"W={W}"
