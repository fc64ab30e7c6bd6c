"""Hash-bucket partitioning — the engine's ONE wide shuffle.

Conversations are hashed into ``num_buckets`` buckets; the downstream
``groupby("bucket").map_groups`` shuffle co-locates every row of a
conversation (turns AND snapshots) in a single Arrow batch, inside
which all per-conversation kernels run segment-vectorized. This
replaces the reference's per-source directory co-location
(``/root/reference/config/config.yml:16-19``: one worker sees one
source's files on local disk).

Scale note: ``num_buckets`` is the knob — at 100 TB pick it so one
bucket ≈ 0.5-1 GiB (e.g. 100k-200k buckets); the hash shuffle streams
through the object store with backpressure; no driver materialization.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import bucket_of, hash64


def add_bucket_column(
    ds, num_buckets: int, key: str = "conv_id", col: str = "bucket"
):
    """Append an int32 ``bucket`` column = stable_hash(key) % num_buckets."""

    def _assign(tbl: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_arrow_threads

        pin_arrow_threads()
        h = hash64(tbl.column(key).to_pandas())
        return tbl.append_column(col, pa.array(bucket_of(h, num_buckets)))

    return ds.map_batches(_assign, batch_format="pyarrow", batch_size=None)
