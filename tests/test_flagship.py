"""Golden E2E: Ray flagship pipeline vs the single-process pandas oracle.

Mirrors the reference's golden test
(/root/reference/tests/unit/feature_extraction_test.py:51-60): exact
equality on key columns (incl. per-turn text) under stable ordering,
then allclose on feature columns; plus the leakage probe (perturbing
any strictly-future snapshot must not change any output row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.config import (
    FeatureConfig,
    PartitionConfig,
)
from dane_visual_feature_extraction_worker_ray.oracle.pandas_oracle import (
    oracle_features,
)
from dane_visual_feature_extraction_worker_ray.stages.transcript_features import (
    compute_features,
)

KEYS = ["conv_id", "turn_idx"]
STR_FEATS = ["prev_role", "next_role", "ffill_tool", "snap_tag_asof", "role", "text", "tool"]
FLOAT_FEATS = [
    "lag_ts_delta_s",
    "w_tool_rate",
    "w_latency_mean_s",
    "snap_val_asof",
    "snap_age_s",
]
INT_FEATS = ["session_id", "turn_in_session", "w_turn_count", "tw_turn_count"]


def run_engine(turns_tbl, snaps_tbl, cfg=None, pcfg=None) -> pd.DataFrame:
    ds = compute_features(
        rd.from_arrow(turns_tbl),
        rd.from_arrow(snaps_tbl) if snaps_tbl is not None else None,
        cfg=cfg,
        pcfg=pcfg,
    )
    return ds.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(KEYS, kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def results(corpus):
    turns, snaps = corpus
    got = canon(run_engine(turns, snaps, pcfg=PartitionConfig(num_buckets=13)))
    exp = canon(oracle_features(turns.to_pandas(), snaps.to_pandas()))
    return got, exp


def test_keys_and_text_exact(results):
    got, exp = results
    assert len(got) == len(exp)
    for c in ["conv_id", "turn_idx", "text", "role"]:
        assert (
            got[c].to_numpy(dtype=object) == exp[c].to_numpy(dtype=object)
        ).all(), c
    # ts exact equality (reference: torch.equal on the ts column)
    assert (
        got["ts"].astype("datetime64[us]").to_numpy()
        == exp["ts"].astype("datetime64[us]").to_numpy()
    ).all()


def test_string_features(results):
    got, exp = results
    for c in STR_FEATS:
        g = got[c].to_numpy(dtype=object)
        e = exp[c].to_numpy(dtype=object)
        same = np.array(
            [
                (pd.isna(a) and pd.isna(b)) or a == b
                for a, b in zip(g, e)
            ]
        )
        assert same.all(), (c, np.flatnonzero(~same)[:5])


def test_int_features(results):
    got, exp = results
    for c in INT_FEATS:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_float_features(results):
    got, exp = results
    for c in FLOAT_FEATS:
        a = got[c].to_numpy(dtype=np.float64)
        b = exp[c].to_numpy(dtype=np.float64)
        assert np.allclose(a, b, equal_nan=True), c


def test_bucket_count_invariance(corpus):
    """Feature values must not depend on the partitioning layout."""
    turns, snaps = corpus
    a = canon(run_engine(turns, snaps, pcfg=PartitionConfig(num_buckets=1)))
    b = canon(run_engine(turns, snaps, pcfg=PartitionConfig(num_buckets=40)))
    pd.testing.assert_frame_equal(a, b)


def test_exchange_matches_native_groupby(corpus):
    """The core-task hash exchange and the Dataset-native sort-groupby
    shuffle must produce identical results (A/B over the same kernel)."""
    turns, snaps = corpus
    a = canon(
        run_engine(
            turns,
            snaps,
            pcfg=PartitionConfig(num_buckets=16, use_core_exchange=True),
        )
    )
    b = canon(
        run_engine(
            turns,
            snaps,
            pcfg=PartitionConfig(num_buckets=16, use_core_exchange=False),
        )
    )
    pd.testing.assert_frame_equal(a, b)


def test_leakage_probe(corpus):
    """Perturbing snapshots that lie strictly after every turn of their
    conversation must leave the output bit-identical (zero temporal
    leakage; reference precedent: uncovered timestamps → sentinel,
    data_handling.py:128-129)."""
    turns, snaps = corpus
    base = canon(run_engine(turns, snaps))
    mask = pc.equal(snaps.column("snap_tag"), "future")
    perturbed = snaps.set_column(
        snaps.schema.get_field_index("snap_val"),
        "snap_val",
        pc.if_else(mask, pc.add(snaps.column("snap_val"), 1e9), snaps.column("snap_val")),
    )
    got = canon(run_engine(turns, perturbed))
    pd.testing.assert_frame_equal(base, got)
    # and the 'future' tag never appears in any as-of output
    assert not (base["snap_tag_asof"] == "future").any()


def test_no_prior_snapshot_is_null(results):
    got, _ = results
    # conversations exist with no snapshot at all → all-null as-of cols
    per_conv = got.groupby("conv_id")["snap_val_asof"].apply(
        lambda s: s.notna().any()
    )
    assert (~per_conv).any()
    # every conversation's first turn precedes its first snapshot
    firsts = got[got["turn_idx"] == 0]
    assert firsts["snap_val_asof"].isna().all()


def test_strict_asof_variant(corpus):
    turns, snaps = corpus
    cfg = FeatureConfig(asof_allow_exact=False)
    got = canon(run_engine(turns, snaps, cfg=cfg))
    exp = canon(oracle_features(turns.to_pandas(), snaps.to_pandas(), cfg))
    a = got["snap_val_asof"].to_numpy(dtype=np.float64)
    b = exp["snap_val_asof"].to_numpy(dtype=np.float64)
    assert np.allclose(a, b, equal_nan=True)


def test_dedup_applied(corpus):
    turns, _ = corpus
    got = run_engine(turns, None)
    assert not got.duplicated(["conv_id", "turn_idx"]).any()
    n_unique = (
        turns.select(["conv_id", "turn_idx"]).to_pandas().drop_duplicates().shape[0]
    )
    assert len(got) == n_unique


def test_extra_feature_ops(corpus):
    """User-extension registry: extra ops compute in the same pass and
    unknown names fail fast (reference analog: model-type switch errors
    on unknown, nn_models.py:330-348)."""
    turns, snaps = corpus
    ds = compute_features(
        rd.from_arrow(turns),
        rd.from_arrow(snaps),
        pcfg=PartitionConfig(num_buckets=8),
        extra_ops=["conv_turn_count", "is_session_start", "role_changed"],
    )
    df = canon(ds.to_pandas())
    sizes = df.groupby("conv_id")["turn_idx"].transform("size")
    assert (df["conv_turn_count"] == sizes).all()
    # session starts agree with session_id transitions
    starts = df.groupby("conv_id")["session_id"].diff().fillna(1) > 0
    assert (df["is_session_start"] == starts.to_numpy()).all()
    prev_role = df.groupby("conv_id")["role"].shift(1)
    expect = (df["role"] != prev_role) & prev_role.notna()
    assert (df["role_changed"] == expect.to_numpy()).all()

    import pytest as _pytest

    with _pytest.raises(KeyError):
        compute_features(
            rd.from_arrow(turns), None, extra_ops=["nope"]
        )


def test_sft_pairs_adjacency(ray_session, tmp_path):
    """Pairs only form on immediately-consecutive (view, purchase)
    turns inside one conversation; text is byte-exact; latency is the
    integer-us delta divided once."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.transcript_queries import (
        q_sft_pairs,
    )

    rows = [
        # conv 1: view -> purchase (pair), then error breaks adjacency
        (1, 1, "view", "p1"),
        (2, 1, "purchase", "c1"),
        (3, 1, "view", "p2"),
        (4, 1, "error", "x"),
        (5, 1, "purchase", "c2"),   # NOT paired (prev is error)
        # conv 2: purchase first (no prompt), then view at the end
        (6, 2, "purchase", "c3"),
        (7, 2, "view", "p3"),
        # conv 3: view then purchase but in DIFFERENT conversations
        (8, 3, "view", "p4"),
        (9, 4, "purchase", "c4"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[0] * 1_000_000 for r in rows], np.int64)
                .astype("datetime64[us]")
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q_sft_pairs(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["conv_id"], r["prompt"], r["completion"]) == ("1", "p1", "c1")
    assert r["latency_s"] == 1.0
