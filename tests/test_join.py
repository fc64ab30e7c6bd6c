"""Distributed hash equi-join vs pandas merge oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.join import (
    hash_equi_join,
)


def _oracle(ldf, rdf, left_on, right_on, right_cols, how):
    r = rdf[[right_on] + right_cols].rename(
        columns={right_on: left_on}
    )
    out = ldf.merge(r, on=left_on, how=how)
    return out


def test_inner_join_many_to_many():
    rng = np.random.default_rng(5)
    ldf = pd.DataFrame(
        {
            "k": rng.integers(0, 40, size=300),
            "lval": np.arange(300, dtype=np.int64),
        }
    )
    rdf = pd.DataFrame(
        {
            "rk": rng.integers(0, 40, size=200),
            "rval": np.arange(200, dtype=np.int64) * 10,
        }
    )
    got = (
        hash_equi_join(
            rd.from_pandas(ldf).repartition(5),
            rd.from_pandas(rdf).repartition(3),
            left_on="k",
            right_on="rk",
            right_columns=["rval"],
            how="inner",
            num_partitions=7,
        )
        .to_pandas()
        .sort_values(["k", "lval", "rval"])
        .reset_index(drop=True)
    )
    exp = (
        ldf.merge(rdf.rename(columns={"rk": "k"}), on="k", how="inner")
        .sort_values(["k", "lval", "rval"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"rval": "int64"}), exp[["k", "lval", "rval"]]
    )


def test_left_join_nulls_and_string_keys():
    ldf = pd.DataFrame(
        {"k": ["a", "b", "c", "d", None], "lval": [1, 2, 3, 4, 5]}
    )
    rdf = pd.DataFrame({"rk": ["b", "b", "d"], "rval": [10, 11, 12]})
    got = (
        hash_equi_join(
            rd.from_pandas(ldf).repartition(2),
            rd.from_pandas(rdf),
            left_on="k",
            right_on="rk",
            right_columns=["rval"],
            how="left",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["lval", "rval"])
        .reset_index(drop=True)
    )
    # null key never matches but survives the left join
    assert len(got) == 6  # a, b x2, c, d, None
    assert got.loc[got["k"].isna(), "rval"].isna().all()
    assert sorted(
        got.loc[got["k"] == "b", "rval"].astype(int)
    ) == [10, 11]
    assert got.loc[got["k"] == "a", "rval"].isna().all()
    assert int(got.loc[got["k"] == "d", "rval"].iloc[0]) == 12


def test_name_collision_suffix():
    ldf = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    rdf = pd.DataFrame({"k2": [1, 2], "v": [10, 20]})
    got = hash_equi_join(
        rd.from_pandas(ldf),
        rd.from_pandas(rdf),
        left_on="k",
        right_on="k2",
        right_columns=["v"],
        num_partitions=2,
    ).to_pandas()
    assert set(got.columns) == {"k", "v", "v_r"}
    assert sorted(got["v_r"].astype(int)) == [10, 20]


def test_semi_anti_join():
    ldf = pd.DataFrame(
        {"k": [1, 1, 2, 3, None], "lval": [10, 11, 20, 30, 40]}
    ).astype({"k": "Int64"})
    rdf = pd.DataFrame({"rk": [1, 1, 3], "rval": [0, 0, 0]})
    semi = (
        hash_equi_join(
            rd.from_pandas(ldf), rd.from_pandas(rdf),
            left_on="k", right_on="rk", how="semi", num_partitions=3,
        )
        .to_pandas().sort_values("lval").reset_index(drop=True)
    )
    # each matching left ROW once, even with 2 right matches
    assert list(semi["lval"]) == [10, 11, 30]
    anti = (
        hash_equi_join(
            rd.from_pandas(ldf), rd.from_pandas(rdf),
            left_on="k", right_on="rk", how="anti", num_partitions=3,
        )
        .to_pandas().sort_values("lval").reset_index(drop=True)
    )
    # null-key row never matches -> surfaces in anti (NOT EXISTS)
    assert list(anti["lval"]) == [20, 40]

    import pytest

    with pytest.raises(ValueError, match="no right columns"):
        hash_equi_join(
            rd.from_pandas(ldf), rd.from_pandas(rdf),
            left_on="k", right_on="rk", right_columns=["rval"], how="semi",
        )


def test_large_int_keys_with_null_no_float_alias():
    """Round-3.1 regression (code-review finding): a null key in the
    partition used to push int64 keys through float64 (to_numpy NaN
    path), aliasing adjacent keys >= 2^53 — 2^62 must NOT match
    2^62 + 1, and the real key must still match exactly."""
    big = 1 << 62
    ldf = pd.DataFrame(
        {"k": pd.array([big, big + 2, None], dtype="Int64"),
         "lv": [1, 2, 3]}
    )
    rdf = pd.DataFrame(
        {"rk": np.array([big + 1, big + 2], dtype=np.int64),
         "rv": [10, 20]}
    )
    got = hash_equi_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf),
        left_on="k", right_on="rk", right_columns=["rv"],
        how="inner", num_partitions=1,  # force co-residence with the null
    ).to_pandas()
    assert list(got["lv"]) == [2]  # only big+2 matches; big does NOT
    assert list(got["rv"].astype(int)) == [20]
    # left join: unmatched big and the null row survive with null rv
    left = hash_equi_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf),
        left_on="k", right_on="rk", right_columns=["rv"],
        how="left", num_partitions=1,
    ).to_pandas().sort_values("lv").reset_index(drop=True)
    assert len(left) == 3
    assert left.loc[left["lv"] == 1, "rv"].isna().all()
    assert left.loc[left["lv"] == 3, "rv"].isna().all()


def test_join_empty_pandas_side():
    """An empty (pandas-block) side must yield a typed empty result,
    not an IndexError at schema-derivation time."""
    ldf = pd.DataFrame({"k": np.array([], dtype=np.int64),
                        "lv": np.array([], dtype=np.int64)})
    rdf = pd.DataFrame({"rk": [1], "rv": [10]})
    out = hash_equi_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf),
        left_on="k", right_on="rk", right_columns=["rv"], how="inner",
        num_partitions=2,
    )
    assert out.count() == 0


def test_hot_keys_equal_plain_join_all_modes():
    """Skew path: pre-joined hot rows (broadcast right + map-side
    expansion + spread partition key) must produce EXACTLY the plain
    exchange join's rows for every mode — including a hot key with no
    right match and null keys in the stream."""
    rng = np.random.default_rng(5)
    n = 3000
    ldf = pd.DataFrame(
        {
            # key 7 is hot (a third of all rows); 99 is hot but absent
            # from the right side; a few nulls ride along
            "k": pd.array(
                [7] * 1000
                + [99] * 50
                + list(rng.integers(0, 40, n - 1052))
                + [None, None],
                dtype="Int64",
            ),
            "lv": np.arange(n, dtype=np.int64),
        }
    )
    rdf = pd.DataFrame(
        {
            "rk": np.array([7, 7, 3, 5, 11, 21], dtype=np.int64),
            "rv": np.array([70, 71, 30, 50, 110, 210], dtype=np.int64),
        }
    )
    for how in ("inner", "left", "semi", "anti"):
        rc = ["rv"] if how in ("inner", "left") else None
        plain = hash_equi_join(
            rd.from_pandas(ldf), rd.from_pandas(rdf),
            left_on="k", right_on="rk", right_columns=rc, how=how,
            num_partitions=8,
        ).to_pandas()
        hot = hash_equi_join(
            rd.from_pandas(ldf), rd.from_pandas(rdf),
            left_on="k", right_on="rk", right_columns=rc, how=how,
            num_partitions=8, hot_keys=[7, 99],
        ).to_pandas()
        cols = sorted(plain.columns)
        a = plain[cols].sort_values(cols).reset_index(drop=True)
        b = hot[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.astype(str), b.astype(str), check_dtype=False
        ), how


def test_hot_keys_string_join():
    ldf = pd.DataFrame(
        {"k": ["hot", "hot", "cold", "x", "hot"], "lv": [1, 2, 3, 4, 5]}
    )
    rdf = pd.DataFrame({"rk": ["hot", "cold"], "rv": [10, 20]})
    out = hash_equi_join(
        rd.from_pandas(ldf), rd.from_pandas(rdf),
        left_on="k", right_on="rk", right_columns=["rv"], how="left",
        num_partitions=4, hot_keys=["hot"],
    ).to_pandas().sort_values(["lv"]).reset_index(drop=True)
    assert out["rv"].tolist()[0:2] == [10, 10]
    assert out.loc[out["lv"] == 3, "rv"].tolist() == [20]
    assert out.loc[out["lv"] == 4, "rv"].isna().all()
    assert out.loc[out["lv"] == 5, "rv"].tolist() == [10]


def test_pack_keys_injective_on_adversarial_strings():
    """Separator characters inside values must not alias tuples —
    ('a|b', 'c') vs ('a', 'b|c') vs ('a', 'b', 'c')-style collisions."""
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.stages.join import (
        pack_keys,
    )

    tuples = [
        ("a|b", "c"),
        ("a", "b|c"),
        ("a:b", "c"),
        ("a", "b:c"),
        ("ab", "c"),
        ("a", "bc"),
        ("", "abc"),
        ("abc", ""),
        ("1:a", "b"),
        ("1", "a|b"),
    ]
    tbl = pa.table(
        {
            "x": pa.array([t[0] for t in tuples]),
            "y": pa.array([t[1] for t in tuples]),
        }
    )
    packed = pack_keys(tbl, ["x", "y"]).to_pylist()
    assert len(set(packed)) == len(tuples), packed
    # null component -> null packed key
    tbl2 = pa.table(
        {
            "x": pa.array(["a", None], pa.string()),
            "y": pa.array([None, "b"], pa.string()),
        }
    )
    assert pack_keys(tbl2, ["x", "y"]).null_count == 2


def test_multi_key_join_matches_pandas(ray_session):
    from dane_visual_feature_extraction_worker_ray.stages.join import (
        hash_equi_join_multi,
    )

    rng = np.random.default_rng(31)
    ldf = pd.DataFrame(
        {
            "a": rng.integers(0, 8, 200).astype(np.int64),
            "b": rng.choice(["x", "y", "z"], 200),
            "lval": np.arange(200, dtype=np.int64),
        }
    )
    rdf = pd.DataFrame(
        {
            "ra": rng.integers(0, 8, 60).astype(np.int64),
            "rb": rng.choice(["x", "y", "z", "w"], 60),
            "rval": np.arange(60, dtype=np.int64) * 7,
        }
    )
    got = (
        hash_equi_join_multi(
            rd.from_pandas(ldf).repartition(4),
            rd.from_pandas(rdf).repartition(3),
            left_on=["a", "b"],
            right_on=["ra", "rb"],
            right_columns=["rval"],
            how="left",
            num_partitions=5,
        )
        .to_pandas()
        .sort_values(["a", "b", "lval", "rval"], na_position="last")
        .reset_index(drop=True)
    )
    exp = (
        ldf.merge(
            rdf.rename(columns={"ra": "a", "rb": "b"}),
            on=["a", "b"],
            how="left",
        )
        .sort_values(["a", "b", "lval", "rval"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ["a", "lval", "rval"]:
        pd.testing.assert_series_equal(
            got[c].astype("float64"), exp[c].astype("float64"),
            check_names=False,
        )
    assert (got["b"] == exp["b"]).all()


def test_auto_hot_key_detection_and_join_parity():
    """hot_keys='auto' detects the skewed tail exactly and produces the
    identical join result as the plain exchange path and pandas."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.join import (
        detect_hot_join_keys,
        hash_equi_join,
    )

    n = 5000
    keys = np.where(np.arange(n) % 10 < 9, 7, np.arange(n) % 50)
    left = pa.table(
        {
            "k": pa.array(keys.astype(np.int64)),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    right = pa.table(
        {
            "k": pa.array(np.arange(50, dtype=np.int64)),
            "w": pa.array(np.arange(50, dtype=np.int64) * 100),
        }
    )
    lds = rd.from_arrow(left).repartition(8)
    rds = rd.from_arrow(right)

    hot = detect_hot_join_keys(lds, "k", num_partitions=8)
    assert hot == [7]

    out_auto = (
        hash_equi_join(lds, rds, "k", "k", ["w"], hot_keys="auto",
                       num_partitions=8)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    out_plain = (
        hash_equi_join(lds, rds, "k", "k", ["w"], num_partitions=8)
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    exp = (
        left.to_pandas().merge(right.to_pandas(), on="k")
        .sort_values(["k", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out_auto[exp.columns.tolist()], exp, check_dtype=False
    )
    pd.testing.assert_frame_equal(out_auto, out_plain)


def test_auto_hot_keys_none_detected_falls_through():
    """A uniform key distribution detects no hot keys and 'auto'
    degrades to the plain path (hot_keys=None)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.join import (
        detect_hot_join_keys,
        hash_equi_join,
    )

    left = pa.table(
        {
            "k": pa.array((np.arange(1000) % 100).astype(np.int64)),
            "v": pa.array(np.arange(1000, dtype=np.int64)),
        }
    )
    right = pa.table(
        {
            "k": pa.array(np.arange(100, dtype=np.int64)),
            "w": pa.array(np.arange(100, dtype=np.int64)),
        }
    )
    lds = rd.from_arrow(left).repartition(4)
    assert detect_hot_join_keys(lds, "k", num_partitions=4) == []
    out = hash_equi_join(
        lds, rd.from_arrow(right), "k", "k", ["w"],
        hot_keys="auto", num_partitions=4,
    )
    assert out.count() == 1000


def test_auto_equi_join_paths_agree(ray_session):
    """The size-gated planner returns identical rows on both paths
    (broadcast vs exchange), records its decision, and honors
    inner/left/semi/anti semantics including null keys and dup keys."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.join import (
        auto_equi_join,
        hash_equi_join,
    )
    from dane_visual_feature_extraction_worker_ray.state import counters

    left = pa.table(
        {
            "k": pa.array([1, 2, 2, None, 5], pa.int64()),
            "lv": pa.array(["a", "b", "c", "d", "e"]),
        }
    )
    right = pa.table(
        {
            "k": pa.array([2, 2, 3, None], pa.int64()),
            "rv": pa.array(["x", "y", "z", "n"]),
        }
    )
    lds = rd.from_arrow(left).repartition(3)
    rds = rd.from_arrow(right).repartition(2)

    def norm(ds):
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for how in ["inner", "left", "semi", "anti"]:
        rc = ["rv"] if how in ("inner", "left") else None
        counters.reset()
        bc = auto_equi_join(lds, rds, "k", "k", right_columns=rc,
                            how=how)
        assert counters.snapshot().get("auto_join_broadcast") == 1
        counters.reset()
        ex = auto_equi_join(lds, rds, "k", "k", right_columns=rc,
                            how=how, broadcast_max_bytes=0)
        assert counters.snapshot().get("auto_join_exchange") == 1
        ref = hash_equi_join(lds, rds, "k", "k",
                             right_columns=rc, how=how,
                             num_partitions=4)
        pd.testing.assert_frame_equal(norm(bc), norm(ref),
                                      check_dtype=False)
        pd.testing.assert_frame_equal(norm(ex), norm(ref),
                                      check_dtype=False)


def test_auto_equi_join_random_tables_vs_pandas(ray_session):
    """Randomized A/B: both planner paths against a pandas-merge
    oracle over tables with duplicate keys, null keys, and keys
    present on only one side — 25 seeds."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.join import (
        auto_equi_join,
    )

    for seed in range(25):
        rng = np.random.default_rng(seed)
        nl, nr = int(rng.integers(1, 40)), int(rng.integers(1, 30))
        lk = rng.integers(0, 12, nl).astype(float)
        rk = rng.integers(0, 12, nr).astype(float)
        lk[rng.random(nl) < 0.15] = np.nan
        rk[rng.random(nr) < 0.15] = np.nan
        left = pd.DataFrame(
            {"k": pd.array(lk).astype("Int64"), "lv": np.arange(nl)}
        )
        right = pd.DataFrame(
            {"k": pd.array(rk).astype("Int64"), "rv": np.arange(nr) * 10}
        )
        lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(3)
        rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(2)

        for how in ["inner", "left"]:
            # pandas merge joins NA keys to each other; SQL never
            # matches NULLs — drop them from the build side
            r_nn = right[right["k"].notna()]
            if how == "inner":
                ref = left[left["k"].notna()].merge(r_nn, on="k")
            else:
                ref = left.merge(r_nn, on="k", how="left")
            ref = ref.sort_values(
                ["k", "lv", "rv"], na_position="last"
            )
            for gate in [1 << 30, 0]:  # broadcast, then exchange
                got = auto_equi_join(
                    lds, rds, "k", "k", right_columns=["rv"],
                    how=how, broadcast_max_bytes=gate,
                    num_partitions=4,
                ).to_pandas()
                assert len(got) == len(ref), (seed, how, gate)
                if not len(ref):
                    continue  # empty to_pandas drops schema (CLAUDE.md)
                got = got.sort_values(
                    ["k", "lv", "rv"], na_position="last"
                )
                for c in ["k", "lv", "rv"]:
                    a = got[c].to_numpy(dtype=float, na_value=np.nan)
                    b = ref[c].to_numpy(dtype=float, na_value=np.nan)
                    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), (
                        seed, how, gate, c
                    )


def test_join_size_stats_edge_cases(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.join import (
        join_size_stats,
    )

    def mk(col, vals):
        return rd.from_arrow(
            pa.table({col: pa.array(vals, pa.int64())})
        ).repartition(2)

    # skewed overlap: key 1 -> 2x3 rows, key 2 -> 1x1, key 9 unmatched
    st = join_size_stats(
        mk("a", [1, 1, 2, 9]), "a", mk("b", [1, 1, 1, 2, 7]), "b"
    ).iloc[0]
    assert st["n_left_keys"] == 3 and st["n_right_keys"] == 3
    assert st["n_matched_keys"] == 2
    assert st["join_rows"] == 2 * 3 + 1 * 1
    assert st["max_left_mult"] == 2 and st["max_right_mult"] == 3

    # disjoint keys
    st = join_size_stats(mk("a", [1, 2]), "a", mk("b", [3, 4]), "b").iloc[0]
    assert st["n_matched_keys"] == 0 and st["join_rows"] == 0


def test_merge_upsert_semantics(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.upsert import (
        merge_upsert,
    )

    base = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array(["a", "b", "c", "d"]),
            }
        )
    ).repartition(2)
    # k=1 updated twice (latest wins); k=2 deleted; k=3 delete ties a
    # same-seq update (delete wins); k=5 inserted; k=4 untouched
    ch = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 2, 3, 3, 5], pa.int64()),
                "seq": pa.array([1, 2, 1, 7, 7, 1], pa.int64()),
                "op": pa.array(["U", "U", "D", "U", "D", "I"]),
                "v": pa.array(["a1", "a2", None, "c7", None, "e"]),
            }
        )
    )
    out = (
        merge_upsert(base, ch, "k", ["v"], num_partitions=4)
        .to_pandas().set_index("k")["v"].sort_index()
    )
    assert out.to_dict() == {1: "a2", 4: "d", 5: "e"}


def test_table_diff_null_safety(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.upsert import (
        table_diff,
    )

    old = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "v": pa.array(["a", None, "c", None, "e"]),
            }
        )
    ).repartition(2)
    new = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 6], pa.int64()),
                # 1 unchanged, 2 null->null unchanged, 3 value->null
                # changed, 4 null->value changed, 5 removed, 6 added
                "v": pa.array(["a", None, None, "d", "f"]),
            }
        )
    )
    out = (
        table_diff(old, new, "k", ["v"], num_partitions=4)
        .to_pandas().set_index("k")["change_type"].sort_index()
    )
    assert out.to_dict() == {
        3: "changed", 4: "changed", 5: "removed", 6: "added"
    }


def test_bucketed_join_roundtrip_idempotent(ray_session):
    """Second run must reuse the persisted bucket layout (lineage
    skip) and produce the identical join result."""
    from dane_visual_feature_extraction_worker_ray.pipelines.join_queries import (
        q_bucketed_join_roundtrip,
    )

    sf = "/root/testdata/sf0.001"
    a = (
        q_bucketed_join_roundtrip(sf).to_pandas()
        .sort_values(["doc_id"]).reset_index(drop=True)
    )
    b = (
        q_bucketed_join_roundtrip(sf).to_pandas()
        .sort_values(["doc_id"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 500


def test_bucketed_storage_join_ab_random(ray_session, tmp_path):
    """Randomized A/B: the zero-exchange bucketed storage join must
    equal a pandas merge on the same tables (many-to-many keys,
    missing keys on either side, several bucket counts)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.state.lineage import (
        write_partitioned_checkpointed,
    )
    from dane_visual_feature_extraction_worker_ray.stages.join import (
        bucketed_storage_join,
    )

    rng = np.random.default_rng(7)
    for trial, nb in [(0, 4), (1, 8)]:
        lk = rng.integers(0, 40, size=200)
        rk = rng.integers(20, 60, size=150)
        left = pa.table(
            {
                "k": pa.array(lk, pa.int64()),
                "lv": pa.array(rng.integers(0, 1000, size=200)),
            }
        )
        right = pa.table(
            {
                "rk": pa.array(rk, pa.int64()),
                "rv": pa.array(rng.integers(0, 1000, size=150)),
            }
        )
        ldir = str(tmp_path / f"l{trial}")
        rdir = str(tmp_path / f"r{trial}")
        write_partitioned_checkpointed(
            rd.from_arrow(left).repartition(3), "k", nb, ldir,
            fingerprint=f"t{trial}",
        )
        write_partitioned_checkpointed(
            rd.from_arrow(right).repartition(2), "rk", nb, rdir,
            fingerprint=f"t{trial}",
        )
        got = (
            bucketed_storage_join(ldir, rdir, "k", "rk")
            .to_pandas()
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        exp = (
            left.to_pandas()
            .merge(right.to_pandas(), left_on="k", right_on="rk")
            .drop(columns=["rk"])
            .sort_values(["k", "lv", "rv"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["k", "lv", "rv"]], exp[["k", "lv", "rv"]]
        )
