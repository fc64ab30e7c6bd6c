"""Lineage counters: cluster-wide accumulation and the exchange's
shuffle-byte accounting (the round-4 'measured, not guessed' hook)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.exchange import (
    hash_exchange,
)
from dane_visual_feature_extraction_worker_ray.state import counters


def test_add_and_reset(ray_session):
    counters.reset()
    counters.add("t_alpha", 3)
    counters.add("t_alpha", 4)
    counters.set_max("t_beta", 7)
    counters.set_max("t_beta", 5)
    snap = counters.snapshot()
    assert snap["t_alpha"] == 7
    assert snap["t_beta_max"] == 7
    counters.reset()
    assert "t_alpha" not in counters.snapshot()


def test_exchange_records_bytes_and_rows(ray_session):
    counters.reset()
    n = 5000
    tbl = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64) % 97),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out = hash_exchange(
        rd.from_arrow(tbl).repartition(4),
        "k",
        8,
        lambda p, t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
    )
    total = sum(
        t["n"][0].as_py()
        for t in out.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    assert total == n
    snap = counters.snapshot()
    # every row crossed the exchange exactly once
    assert snap["exchange_rows"] == n
    # IPC framing: bytes are nonzero and at least the raw payload size
    assert snap["exchange_bytes"] >= n * 16
