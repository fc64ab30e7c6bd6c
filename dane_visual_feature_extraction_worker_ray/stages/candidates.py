"""Shared candidate-set plumbing for the two-pass verify pipelines.

Both LSH near-dup operators (MinHash over text, hyperplane LSH over
embeddings) follow the same scale shape: buckets emit candidate ID
PAIRS only; the exact/estimated similarity is verified in a second
streaming pass against a driver-bounded broadcast of the candidate
endpoints. The anti-join survivor filters and the salting mega-conv
split use the same "broadcast ONE sorted array, membership via
searchsorted" idiom. This module is the single home for that plumbing
(round-3 review: the scaffolding had been copy-pasted between
stages/dedup.py and stages/similarity.py and was already diverging).

Scale contract: everything here is bounded by the CANDIDATE set (LSH
output / survivor drop-list), never the corpus — the corpus only
streams through ``map_batches`` membership filters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_GATHER_BATCH = 1 << 20


def in_sorted(sorted_vals: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Boolean membership mask of ``vals`` in the SORTED, unique array
    ``sorted_vals`` (numpy's isin for the pre-sorted broadcast case —
    one searchsorted, no hashing). Works for any comparable dtype the
    two arrays share (int64 ids, object strings)."""
    if len(sorted_vals) == 0:
        return np.zeros(len(vals), dtype=bool)
    pos = np.searchsorted(sorted_vals, vals).clip(0, len(sorted_vals) - 1)
    return sorted_vals[pos] == vals


def pair_endpoint_ids(cand_ds, col_a: str, col_b: str) -> np.ndarray:
    """Unique sorted endpoint ids of a candidate-pair Dataset (already
    LSH-pruned — orders of magnitude smaller than the corpus)."""
    ends = [
        np.concatenate(
            [b.column(col_a).to_numpy(), b.column(col_b).to_numpy()]
        )
        for b in cand_ds.iter_batches(
            batch_size=_GATHER_BATCH, batch_format="pyarrow"
        )
    ]
    return np.unique(np.concatenate(ends)) if ends else np.array([], np.int64)


def gather_rows_by_ids(
    ds,
    id_col: str,
    sorted_ids: np.ndarray,
    columns: list[str] | None = None,
) -> pa.Table:
    """Stream ``ds`` once and gather (driver-side) the rows whose
    ``id_col`` is in the broadcast sorted id set. The gather is bounded
    by ``len(sorted_ids)`` rows — the corpus itself never lands on the
    driver. ``columns`` prunes the shipped projection."""
    ids_ref = ray.put(np.asarray(sorted_ids))

    def _pick(tbl: pa.Table) -> pa.Table:
        w = ray.get(ids_ref)
        t = tbl.filter(
            pa.array(in_sorted(w, tbl.column(id_col).to_numpy()))
        )
        return t.select(columns) if columns is not None else t

    return pa.concat_tables(
        list(
            ds.map_batches(
                _pick, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_size=_GATHER_BATCH, batch_format="pyarrow")
        )
    )


def dedupe_pairs(cand_ds, col_a: str, col_b: str):
    """Collapse candidate pairs that collided in several LSH tables /
    bands to one row each — a tiny grouped count over 16-byte rows (the
    8-byte-hash pre-aggregation pattern, not a raw-payload shuffle)."""
    from .groupagg import hash_grouped_aggregate

    return hash_grouped_aggregate(
        cand_ds.map_batches(
            lambda t: t.append_column(
                "n", pa.array(np.ones(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        [col_a, col_b],
        [("n", "sum")],
    ).map_batches(
        lambda t: t.select([col_a, col_b]),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
