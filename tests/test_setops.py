"""Distributed set operations + full outer join vs pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.join import (
    hash_equi_join,
)
from dane_visual_feature_extraction_worker_ray.stages.setops import set_op


def _sets(seed=9):
    rng = np.random.default_rng(seed)
    a = pd.DataFrame(
        {
            "k": rng.integers(0, 60, 400).astype(np.int64),
            "junk": np.arange(400),
        }
    )
    b = pd.DataFrame(
        {
            "k": rng.integers(30, 90, 300).astype(np.int64),
            "other": np.arange(300),
        }
    )
    return a, b


@pytest.mark.parametrize("op", ["union", "intersect", "except"])
def test_set_ops_match_pandas(ray_session, op):
    a, b = _sets()
    got = (
        set_op(
            rd.from_pandas(a).repartition(4),
            rd.from_pandas(b).repartition(3),
            keys="k",
            op=op,
            num_partitions=5,
        )
        .to_pandas()["k"]
        .sort_values()
        .to_numpy()
    )
    sa, sb = set(a["k"]), set(b["k"])
    exp = {
        "union": sa | sb,
        "intersect": sa & sb,
        "except": sa - sb,
    }[op]
    assert got.tolist() == sorted(exp)


def test_set_op_composite_keys_and_nulls(ray_session):
    # NULL keys group together (SQL INTERSECT/EXCEPT not-distinct rule)
    a = pa.table(
        {
            "x": pa.array([1, 1, 2, None, None], pa.int64()),
            "y": pa.array(["p", "p", "q", "r", "r"]),
        }
    )
    b = pa.table(
        {
            "x": pa.array([1, None], pa.int64()),
            "y": pa.array(["p", "r"]),
        }
    )
    inter = (
        set_op(rd.from_arrow(a), rd.from_arrow(b), ["x", "y"], "intersect")
        .to_pandas()
        .sort_values(["x", "y"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(inter) == 2  # (1,'p') and (NULL,'r')
    assert inter["y"].tolist() == ["p", "r"]
    exc = set_op(
        rd.from_arrow(a), rd.from_arrow(b), ["x", "y"], "except"
    ).to_pandas()
    assert exc["y"].tolist() == ["q"]


def test_set_op_bad_op(ray_session):
    a, b = _sets()
    with pytest.raises(ValueError):
        set_op(rd.from_pandas(a), rd.from_pandas(b), "k", "xor")


def test_full_outer_join_matches_pandas(ray_session):
    rng = np.random.default_rng(13)
    ldf = pd.DataFrame(
        {
            "k": rng.integers(0, 30, 120).astype(np.int64),
            "lval": np.arange(120, dtype=np.int64),
        }
    )
    rdf = pd.DataFrame(
        {
            "rk": rng.integers(15, 45, 80).astype(np.int64),
            "rval": np.arange(80, dtype=np.int64) * 3,
        }
    )
    got = (
        hash_equi_join(
            rd.from_pandas(ldf).repartition(4),
            rd.from_pandas(rdf).repartition(3),
            left_on="k",
            right_on="rk",
            right_columns=["rk", "rval"],
            how="outer",
            num_partitions=6,
        )
        .to_pandas()
        .sort_values(["k", "lval", "rk", "rval"], na_position="last")
        .reset_index(drop=True)
    )
    exp = (
        ldf.merge(rdf, left_on="k", right_on="rk", how="outer")
        .sort_values(["k", "lval", "rk", "rval"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ["k", "lval", "rk", "rval"]:
        pd.testing.assert_series_equal(
            got[c].astype("float64"),
            exp[c].astype("float64"),
            check_names=False,
        )


def test_full_outer_join_null_keys_both_sides(ray_session):
    ldf = pa.table(
        {
            "k": pa.array(["a", None, "c"], pa.string()),
            "lval": pa.array([1, 2, 3], pa.int64()),
        }
    )
    rdf = pa.table(
        {
            "rk": pa.array(["a", None], pa.string()),
            "rval": pa.array([10, 20], pa.int64()),
        }
    )
    got = (
        hash_equi_join(
            rd.from_arrow(ldf),
            rd.from_arrow(rdf),
            left_on="k",
            right_on="rk",
            right_columns=["rval"],
            how="outer",
            num_partitions=3,
        )
        .to_pandas()
        .sort_values(["lval", "rval"], na_position="last")
        .reset_index(drop=True)
    )
    # a matches; null-left unmatched; c unmatched; null-right unmatched
    assert len(got) == 4
    matched = got[got["rval"] == 10]
    assert matched["k"].tolist() == ["a"]
    assert got["rval"].isna().sum() == 2  # rows for None-key left and c
    assert got["lval"].isna().sum() == 1  # the unmatched right row


def test_outer_join_rejects_hot_keys(ray_session):
    a, b = _sets()
    with pytest.raises(ValueError):
        hash_equi_join(
            rd.from_pandas(a),
            rd.from_pandas(b),
            left_on="k",
            right_on="k",
            right_columns=["other"],
            how="outer",
            hot_keys=[1],
        )


def test_keyed_diff_all_classes_and_dup_rejection(ray_session):
    import pytest
    import ray

    from dane_visual_feature_extraction_worker_ray.stages.setops import (
        keyed_diff,
    )

    def _ds(pairs):
        return rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([p[0] for p in pairs], pa.int64()),
                    "v": pa.array([p[1] for p in pairs], pa.int64()),
                }
            )
        )

    old = [(1, 10), (2, 20), (3, 30)]
    new = [(2, 20), (3, 99), (4, 40)]
    out = (
        keyed_diff(_ds(old), _ds(new), "k", "v", num_partitions=4)
        .to_pandas().set_index("k").sort_index()
    )
    assert out.loc[1, "change"] == "removed" and pd.isna(out.loc[1, "new_val"])
    assert out.loc[2, "change"] == "unchanged"
    assert out.loc[3, "change"] == "changed"
    assert (out.loc[3, "old_val"], out.loc[3, "new_val"]) == (30, 99)
    assert out.loc[4, "change"] == "added" and pd.isna(out.loc[4, "old_val"])
    # duplicate key within one side must fail loudly
    with pytest.raises(ray.exceptions.RayTaskError, match="key-distinct"):
        keyed_diff(
            _ds([(1, 1), (1, 2)]), _ds([(1, 3)]), "k", "v",
            num_partitions=2,
        ).materialize()
