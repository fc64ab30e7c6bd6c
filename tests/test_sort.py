"""Tests for the distributed range-partitioned global sort
(stages/sort.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.sort import sort_by


def _blocks(ds):
    return [ray.get(r) for r in ds.to_arrow_refs()]


def test_sort_global_order_and_rank(ray_session):
    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 1000, n).astype(np.int64),  # many ties
            "id": np.arange(n, dtype=np.int64),
        }
    )
    out = sort_by(
        rd.from_pandas(df),
        [("k", "ascending"), ("id", "ascending")],
        num_partitions=7,
        sample_per_block=64,
        rank_col="rnk",
    )
    blocks = _blocks(out)
    got = pa.concat_tables(blocks).to_pandas()
    exp = df.sort_values(["k", "id"]).reset_index(drop=True)
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["rnk"].tolist() == list(range(1, n + 1))
    # each block internally sorted and block ranges non-overlapping
    prev_max = None
    for b in blocks:
        ks = b.column("k").to_numpy()
        assert (np.diff(ks) >= 0).all()
        if prev_max is not None and len(ks):
            assert ks[0] >= prev_max
        if len(ks):
            prev_max = ks[-1]


def test_sort_descending_strings(ray_session):
    words = ["pear", "apple", "fig", "apple", "kiwi", "banana", "fig"]
    df = pd.DataFrame(
        {"w": words, "id": np.arange(len(words), dtype=np.int64)}
    )
    out = sort_by(
        rd.from_pandas(df),
        [("w", "descending"), ("id", "ascending")],
        num_partitions=3,
        rank_col="rnk",
    ).to_pandas()
    exp = df.sort_values(
        ["w", "id"], ascending=[False, True]
    ).reset_index(drop=True)
    got = out.sort_values("rnk").reset_index(drop=True)
    assert got["w"].tolist() == exp["w"].tolist()
    assert got["id"].tolist() == exp["id"].tolist()


def test_sort_ties_never_split_partitions(ray_session):
    # one hot key value: every duplicate must land in ONE partition
    df = pd.DataFrame(
        {
            "k": np.array([5] * 100 + [1, 9], dtype=np.int64),
            "id": np.arange(102, dtype=np.int64),
        }
    )
    out = sort_by(
        rd.from_pandas(df), [("k", "ascending"), ("id", "ascending")],
        num_partitions=8, sample_per_block=16,
    )
    blocks = [b for b in _blocks(out) if b.num_rows]
    hot = [b for b in blocks if 5 in set(b.column("k").to_pylist())]
    assert len(hot) == 1  # the tie run is whole
    assert hot[0].num_rows >= 100


def test_sort_validation(ray_session):
    df = pd.DataFrame({"k": [1]})
    import pytest

    with pytest.raises(ValueError):
        sort_by(rd.from_pandas(df), [])
    with pytest.raises(ValueError):
        sort_by(rd.from_pandas(df), [("k", "up")])


def test_sort_by_survives_empty_blocks(ray_session):
    """Ray emits 0-COLUMN blocks for 0-row inputs (UDF skipped) — the
    sample concat and range partitioning must not crash on them."""
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.sort import sort_by

    tbl = pa.table(
        {"k": pa.array([5, 3, 9, 1], pa.int64()),
         "v": pa.array([1.0, 2.0, 3.0, 4.0])}
    )
    ds = rd.from_arrow(tbl).repartition(4).filter(lambda r: r["k"] < 6)
    out = sort_by(ds, [("k", "ascending")], num_partitions=2).to_pandas()
    assert out["k"].tolist() == [1, 3, 5]
