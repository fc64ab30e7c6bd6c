"""Edge inputs: empty tables, snapshot-only conversations, single-turn
conversations, config validation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.config import (
    FeatureConfig,
    PartitionConfig,
)
from dane_visual_feature_extraction_worker_ray.stages.transcript_features import (
    compute_features,
)


def _turns(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([f"t{r[1]}" for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array(
                np.array([r[2] for r in rows], dtype=np.int64),
                pa.timestamp("us"),
            ),
        }
    )


def _snaps(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype=np.int64),
                pa.timestamp("us"),
            ),
            "snap_val": pa.array([float(r[2]) for r in rows]),
            "snap_tag": pa.array(["x"] * len(rows), pa.string()),
        }
    )


def test_empty_turns():
    out = compute_features(
        rd.from_arrow(_turns([])), None, pcfg=PartitionConfig(num_buckets=4)
    ).to_pandas()
    assert len(out) == 0


def test_snapshot_only_conversation_emits_nothing():
    t = _turns([("a", 0, 1000)])
    s = _snaps([("a", 500, 1.0), ("ghost", 100, 2.0)])
    out = compute_features(
        rd.from_arrow(t), rd.from_arrow(s), pcfg=PartitionConfig(num_buckets=4)
    ).to_pandas()
    assert list(out["conv_id"]) == ["a"]
    assert out["snap_val_asof"].iloc[0] == 1.0


def test_single_turn_conversations():
    t = _turns([("a", 0, 10), ("b", 0, 20), ("c", 0, 30)])
    out = (
        compute_features(
            rd.from_arrow(t), None, pcfg=PartitionConfig(num_buckets=2)
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert out["lag_ts_delta_s"].isna().all()
    assert out["next_role"].isna().all()
    assert (out["session_id"] == 0).all()
    assert (out["w_turn_count"] == 1).all()
    assert (out["tw_turn_count"] == 1).all()


def test_config_validation():
    with pytest.raises(ValueError):
        FeatureConfig(session_gap_us=0)
    with pytest.raises(ValueError):
        FeatureConfig(row_window=0)
    with pytest.raises(ValueError):
        PartitionConfig(num_buckets=0)
    with pytest.raises(ValueError):
        PartitionConfig(salt_threshold=10, salt_chunk=100)


def test_layered_config_round_trip(tmp_path):
    """YAML base → overlay → kwarg overrides, later layers win; unknown
    sections/keys fail fast; values re-validated by the dataclasses."""
    from dane_visual_feature_extraction_worker_ray.config import (
        load_config,
    )

    base = tmp_path / "base.yml"
    base.write_text(
        "features:\n  row_window: 3\n  feature_dim: 8\n"
        "partitioning:\n  num_buckets: 16\n"
    )
    overlay = tmp_path / "site.yml"
    overlay.write_text("features:\n  row_window: 7\n")

    cfg = load_config(base, overlay, partitioning__num_buckets=32)
    assert cfg.features.row_window == 7  # overlay beat base
    assert cfg.features.feature_dim == 8  # base survives
    assert cfg.partitioning.num_buckets == 32  # kwarg beat file
    assert cfg.partitioning.salt_chunk == 100_000  # untouched default

    # defaults only
    d = load_config()
    assert d.features.row_window == 5

    with pytest.raises(ValueError, match="unknown config section"):
        load_config({"nope": {}})
    with pytest.raises(ValueError, match="unknown key"):
        load_config({"features": {"row_windw": 5}})
    with pytest.raises(ValueError, match="section__key"):
        load_config(row_window=5)
    with pytest.raises(ValueError):  # dataclass validation still runs
        load_config({"features": {"row_window": 0}})


def _docs_table(rows):
    import pyarrow as pa

    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] else 0 for r in rows], pa.int64()
            ),
        }
    )


def test_round4_ops_degenerate_docs(ray_session, tmp_path):
    """The round-4 doc operators survive degenerate corpora: a single
    doc, empty text, null text, one-token docs (no bigrams)."""
    import pyarrow.parquet as pq

    from dane_visual_feature_extraction_worker_ray.pipelines.curation import (
        q_chars_percent_rank,
        q_domain_cap,
        q_source_lang_gini,
    )
    from dane_visual_feature_extraction_worker_ray.pipelines.text_queries import (
        q_bigram_lm_score,
        q_bigram_novelty,
        q_phrase_search,
    )

    rows = [
        (1, "solo", "en", "s1"),
        (2, "", "en", "s1"),
        (3, None, "de", "s2"),
        (4, "two words", "fr", "s3"),
    ]
    pq.write_table(_docs_table(rows), str(tmp_path / "documents.parquet"))
    d = str(tmp_path)

    assert len(q_phrase_search(d).to_pandas()) == 0  # phrase absent
    nov = q_bigram_novelty(d).to_pandas()
    assert nov["doc_id"].tolist() == [4]  # only doc with a bigram
    lm = q_bigram_lm_score(d).to_pandas()
    assert lm["doc_id"].tolist() == [4]
    assert lm["n_bigrams"].tolist() == [1]
    cap = q_domain_cap(d).to_pandas()
    assert len(cap) == 4 and (cap["rnk"] >= 1).all()
    gini = q_source_lang_gini(d).to_pandas().set_index("source")
    assert gini.loc["s1", "gini"] == 0.0  # monolingual source
    pr = q_chars_percent_rank(d).to_pandas()
    assert len(pr) == 4
    # single-row sources rank 0
    assert (pr[pr.source.isin(["s2", "s3"])]["pr"] == 0.0).all()


def test_round4_vector_ops_tiny_corpus(ray_session, tmp_path):
    """PQ/PCA/SQ8 survive a corpus smaller than their parameters."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from dane_visual_feature_extraction_worker_ray.stages.pca import (
        pca_top_components,
    )
    from dane_visual_feature_extraction_worker_ray.stages.pq import (
        knn_pq_adc,
        pq_encode,
        pq_train,
    )

    rng = np.random.default_rng(3)
    m = rng.standard_normal((5, 8)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    # k_codes (8) > corpus (5): dead codes keep their seed, encode works
    books = pq_train(ds, m=2, k=8, iters=2)
    enc = pq_encode(ds, books).to_pandas()
    assert len(enc) == 5
    got = knn_pq_adc(ds, books, m[0].astype(np.float64), k=10)
    assert len(got) == 5  # k larger than corpus returns everything
    w, v, evr, mean, n = pca_top_components(ds, "embedding", k=3)
    assert n == 5 and v.shape == (8, 3)
