"""Exchange primitives: multi-key hash_exchange, hash_grouped_map
(groupby().map_groups semantics on the exchange), empty-partition
pruning, and grouped-aggregate typed-empty behavior."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.exchange import (
    hash_exchange,
    hash_grouped_map,
)
from dane_visual_feature_extraction_worker_ray.stages.groupagg import (
    group_aggregate_table,
    hash_grouped_aggregate,
)


def _tbl(n=1000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k1": pa.array(rng.integers(0, 7, n)),
            "k2": pa.array(
                np.array(["x", "y", "z"], object)[rng.integers(0, 3, n)]
            ),
            "v": pa.array(rng.integers(0, 100, n)),
        }
    )


def test_multikey_exchange_colocates_groups():
    t = _tbl()
    seen = []

    def _kernel(p, tbl):
        df = tbl.to_pandas()
        g = df.groupby(["k1", "k2"])["v"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = hash_exchange(rd.from_arrow(t).repartition(5), ["k1", "k2"], 8, _kernel)
    got = (
        out.to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .groupby(["k1", "k2"])["v"]
        .sum()
        .reset_index()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every (k1, k2) group appears in exactly one partition's output:
    # total row count equals the distinct group count
    assert len(got) == exp.shape[0]


def test_hash_grouped_map_matches_pandas_groupby_apply():
    t = _tbl(n=500, seed=9)

    def _per_group(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        return pa.table(
            {
                "k1": pa.array([int(df["k1"].iloc[0])]),
                "k2": pa.array([str(df["k2"].iloc[0])]),
                "n": pa.array([len(df)], pa.int64()),
                "vmax": pa.array([int(df["v"].max())], pa.int64()),
            }
        )

    out = (
        hash_grouped_map(
            rd.from_arrow(t).repartition(4), ["k1", "k2"], _per_group, 8
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .groupby(["k1", "k2"])
        .agg(n=("v", "size"), vmax=("v", "max"))
        .reset_index()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_exchange_drops_empty_partitions():
    # 2 distinct keys, 32 partitions → ~30 empty; output Dataset must
    # contain no 0-column blocks and no empty blocks
    t = pa.table({"k": pa.array([1, 2] * 50), "v": pa.array(range(100))})

    def _kernel(p, tbl):
        return tbl

    out = hash_exchange(rd.from_arrow(t).repartition(3), "k", 32, _kernel)
    import ray

    refs = out.to_arrow_refs()
    blocks = [ray.get(r) for r in refs]
    assert all(b.num_columns == 2 for b in blocks)
    assert all(b.num_rows > 0 for b in blocks)
    assert sum(b.num_rows for b in blocks) == 100


def test_exchange_all_empty_keeps_one_typed_block():
    t = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})

    def _kernel(p, tbl):
        return tbl

    out = hash_exchange(rd.from_arrow(t), "k", 8, _kernel)
    import ray

    blocks = [ray.get(r) for r in out.to_arrow_refs()]
    # exactly one typed empty block survives (Dataset.to_pandas() on an
    # all-empty dataset drops columns — Ray behavior, asserted at the
    # block level instead)
    assert len(blocks) == 1
    assert blocks[0].schema.names == ["k", "v"]
    assert blocks[0].num_rows == 0


def test_group_aggregate_table_typed_empty():
    t = pa.table(
        {
            "k": pa.array([], pa.string()),
            "v": pa.array([], pa.int64()),
            "w": pa.array([], pa.float64()),
        }
    )
    g = group_aggregate_table(t, ["k"], [("v", "sum"), ("w", "max")])
    assert g.schema.names == ["k", "v", "w"]
    assert g.schema.types == [pa.string(), pa.int64(), pa.float64()]
    assert g.num_rows == 0


def test_connected_components_empty_pairs():
    from dane_visual_feature_extraction_worker_ray.stages.dedup import (
        connected_components_labels,
    )

    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    labels = connected_components_labels(rd.from_arrow(empty), num_partitions=4)
    assert len(labels.to_pandas()) == 0


def test_grouped_aggregate_multikey_matches_pandas():
    t = _tbl(n=2000, seed=4)

    def _partial(tbl: pa.Table) -> pa.Table:
        return group_aggregate_table(tbl, ["k1", "k2"], [("v", "sum")])

    partials = rd.from_arrow(t).repartition(6).map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    )
    got = (
        hash_grouped_aggregate(partials, ["k1", "k2"], [("v", "sum")])
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .groupby(["k1", "k2"])["v"]
        .sum()
        .reset_index()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_group_aggregate_table_empty_schema_promotion():
    """Empty-input schema must match the non-empty promoted schema
    exactly (sum(int32)->int64, sum(float32)->float64, sum(uint16)->
    uint64) so empty and non-empty partitions concat downstream."""
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.stages.groupagg import (
        group_aggregate_table,
    )

    full = pa.table(
        {
            "k": ["a"],
            "i": pa.array([1], pa.int32()),
            "f": pa.array([1.0], pa.float32()),
            "u": pa.array([1], pa.uint16()),
        }
    )
    spec = [("i", "sum"), ("f", "sum"), ("u", "sum"), ("i", "min")]
    names = ["k", "si", "sf", "su", "mi"]
    s_full = group_aggregate_table(full, ["k"], spec, names).schema
    s_empty = group_aggregate_table(
        full.slice(0, 0), ["k"], spec, names
    ).schema
    assert s_full == s_empty
    assert s_empty.field("si").type == pa.int64()
    assert s_empty.field("sf").type == pa.float64()
    assert s_empty.field("su").type == pa.uint64()
    assert s_empty.field("mi").type == pa.int32()
    # concat must succeed
    pa.concat_tables(
        [
            group_aggregate_table(full, ["k"], spec, names),
            group_aggregate_table(full.slice(0, 0), ["k"], spec, names),
        ]
    )


def test_key_hash_stable_under_nulls():
    """A key value must hash identically whether or not its block
    happens to contain nulls (int-with-null columns convert to float64
    under to_pandas, which used to hash the same value differently and
    broke join/groupby co-location for nullable keys)."""
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.functions.hashing import (
        hash64_columns,
    )

    clean = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    dirty = pa.table({"k": pa.array([1, 2, None], pa.int64())})
    h_clean = hash64_columns(clean, ["k"])
    h_dirty = hash64_columns(dirty, ["k"])
    assert (h_clean[:2] == h_dirty[:2]).all()
    # both nulls hash to the same (sentinel) value, distinct runs agree
    dirty2 = pa.table({"k": pa.array([None, 5], pa.int64())})
    assert hash64_columns(dirty2, ["k"])[0] == h_dirty[2]
