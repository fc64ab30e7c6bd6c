"""Unit tests for the shared candidate-set plumbing
(stages/candidates.py) extracted from the two-pass LSH verify
pipelines."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dane_visual_feature_extraction_worker_ray.stages.candidates import (
    dedupe_pairs,
    gather_rows_by_ids,
    in_sorted,
    pair_endpoint_ids,
)


def test_in_sorted_ints_strings_empty():
    s = np.array([2, 5, 9], dtype=np.int64)
    assert in_sorted(s, np.array([1, 2, 5, 8, 9, 10])).tolist() == [
        False, True, True, False, True, False,
    ]
    # values past the end (searchsorted == len) must clip, not crash
    assert in_sorted(s, np.array([100])).tolist() == [False]
    ss = np.array(sorted(["b", "d"]), dtype=object)
    assert in_sorted(ss, np.array(["a", "b", "c", "d"], dtype=object)).tolist() == [
        False, True, False, True,
    ]
    assert in_sorted(np.array([], np.int64), np.array([1, 2])).tolist() == [
        False, False,
    ]


def test_pair_endpoints_and_gather(ray_session):
    cand = rd.from_pandas(
        pd.DataFrame({"a": [3, 1, 3], "b": [7, 3, 9]})
    )
    ids = pair_endpoint_ids(cand, "a", "b")
    assert ids.tolist() == [1, 3, 7, 9]  # unique + sorted

    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(12), pa.int64()),
                "text": pa.array([f"t{i}" for i in range(12)]),
                "extra": pa.array(range(12), pa.int64()),
            }
        )
    )
    picked = gather_rows_by_ids(corpus, "doc_id", ids, columns=["doc_id", "text"])
    assert picked.column_names == ["doc_id", "text"]
    assert sorted(picked.column("doc_id").to_pylist()) == [1, 3, 7, 9]
    # gather is bounded by the candidate set, not the corpus
    assert picked.num_rows == len(ids)


def test_dedupe_pairs(ray_session):
    cand = rd.from_pandas(
        pd.DataFrame({"a": [1, 1, 2, 1], "b": [5, 5, 6, 5]})
    )
    out = dedupe_pairs(cand, "a", "b").to_pandas()
    got = sorted(map(tuple, out[["a", "b"]].itertuples(index=False)))
    assert got == [(1, 5), (2, 6)]
    assert list(out.columns) == ["a", "b"]
