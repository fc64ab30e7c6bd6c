"""Bloom-pruned semi/anti joins: exactness under forced false
positives, null-key semantics, and real pruning."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.bloom import (
    bloom_semi_join,
    build_bloom,
    _probe_mask,
)


def _sides(n_left=500, seed=9):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 1000, n_left)
    left = pa.table(
        {
            "k": pa.array(list(lk) + [None, None], pa.int64()),
            "v": pa.array(range(n_left + 2), pa.int64()),
        }
    )
    right = pa.table({"k": pa.array(range(0, 1000, 7), pa.int64())})
    return left, right, set(range(0, 1000, 7))


def test_semi_exact_even_with_tiny_filter():
    # 256-bit filter over 143 keys: false positives guaranteed; the
    # exact second pass must still produce the precise semi join
    left, right, rset = _sides()
    out = bloom_semi_join(
        rd.from_arrow(left).repartition(4),
        rd.from_arrow(right),
        "k",
        "k",
        how="semi",
        n_bits=256,
        num_partitions=4,
    ).to_pandas()
    exp = left.to_pandas()
    exp = exp[exp["k"].isin(rset)]
    assert sorted(out["v"]) == sorted(exp["v"])


def test_anti_exact_and_keeps_nulls():
    left, right, rset = _sides()
    out = bloom_semi_join(
        rd.from_arrow(left).repartition(4),
        rd.from_arrow(right),
        "k",
        "k",
        how="anti",
        n_bits=256,
        num_partitions=4,
    ).to_pandas()
    exp = left.to_pandas()
    exp = exp[~exp["k"].isin(rset)]  # keeps the 2 null-key rows
    assert sorted(out["v"]) == sorted(exp["v"])
    assert out["k"].isna().sum() == 2


def test_probe_mask_no_false_negatives_and_prunes():
    left, right, rset = _sides()
    words = build_bloom(rd.from_arrow(right), "k", n_bits=1 << 16)
    mask = _probe_mask(left, "k", words, 1 << 16, 4)
    keys = left.column("k").to_pandas()
    is_member = keys.isin(rset).to_numpy()
    assert (mask[is_member]).all()  # no false negatives, ever
    nonmember = (~is_member) & keys.notna().to_numpy()
    # 64Kbit / 143 keys: FP rate ~0 at this load -> real pruning
    assert mask[nonmember].mean() < 0.05
    assert not mask[keys.isna().to_numpy()].any()


def test_build_bloom_split_invariant():
    _, right, _ = _sides()
    w3 = build_bloom(rd.from_arrow(right).repartition(3), "k", n_bits=4096)
    w5 = build_bloom(rd.from_arrow(right).repartition(5), "k", n_bits=4096)
    np.testing.assert_array_equal(w3, w5)
