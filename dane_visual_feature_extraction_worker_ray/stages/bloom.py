"""Bloom-filter pruned semi/anti joins.

The scale story: a semi-join's exchange must ship every probe-side row
whose key MIGHT match. A Bloom filter built from the build side and
broadcast once (``ray.put``, read per task — never re-shipped per
batch) prunes the probe side MAP-SIDE, so only bloom-positive rows
(true matches + the tunable false-positive residue) enter the hash
exchange; exactness is restored by running the existing exact
``hash_equi_join`` only over the survivors. For ``how="anti"`` the
pruning inverts: bloom-NEGATIVE rows are definite non-matches and are
emitted directly map-side (no exchange at all); only the bloom-positive
sliver rides the exchange for the exact anti check.

Build is one streaming pass over the build side: each batch emits its
own packed bitset partial and the driver ORs them — cost is
``filter_bytes × n_blocks`` through the driver, bounded by the filter
size, never by build-side rows. Double hashing (h1 + i·h2) derives all
probe positions from one 64-bit key hash (`functions/hashing.py`), the
standard Kirsch–Mitzenmacher construction.

Reference analogy: the reference prunes work map-side too — a record
outside every shot interval short-circuits to the sentinel before any
model work (``/root/reference/data_handling.py:121-129``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.hashing import hash64_columns
from .join import hash_equi_join

_KM_ODD = np.uint64(0xC2B2AE3D27D4EB4F)  # odd multiplier for h2


def _positions(keys: pa.Table, key_col: str, n_bits: int, n_hashes: int):
    """(rows, n_hashes) bit positions via double hashing of the stable
    64-bit key hash. Null keys hash like values but are masked out by
    callers (SQL: NULL never matches)."""
    h1 = hash64_columns(keys, [key_col])  # uint64
    h2 = h1 * _KM_ODD | np.uint64(1)  # odd => full-period stride
    i = np.arange(n_hashes, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)


def build_bloom(
    ds, key_col: str, n_bits: int = 1 << 23, n_hashes: int = 4
) -> np.ndarray:
    """Packed uint64 bitset (n_bits/64 words) over the dataset's keys:
    per-batch partial bitsets, OR-combined on the driver."""

    def _partial(tbl: pa.Table) -> pa.Table:
        words = np.zeros(n_bits >> 6, np.uint64)
        if tbl.num_rows:
            valid = ~np.asarray(
                pc.is_null(tbl.column(key_col)).combine_chunks()
            )
            pos = _positions(tbl.select([key_col]), key_col, n_bits, n_hashes)
            pos = pos[valid].ravel()
            np.bitwise_or.at(
                words, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        return pa.table({"w": pa.array(words.view(np.int64))})

    out = np.zeros(n_bits >> 6, np.uint64)
    for ref in ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            out |= t.column("w").to_numpy().view(np.uint64)
    return out


def _probe_mask(
    tbl: pa.Table, key_col: str, words: np.ndarray, n_bits: int,
    n_hashes: int,
) -> np.ndarray:
    """Boolean: all n_hashes bits set (possible member). Null keys are
    always False (never members)."""
    pos = _positions(tbl.select([key_col]), key_col, n_bits, n_hashes)
    hit = (
        words[(pos >> np.uint64(6)).astype(np.int64)]
        >> (pos & np.uint64(63))
    ) & np.uint64(1)
    mask = hit.all(axis=1)
    valid = ~np.asarray(
        pc.is_null(tbl.column(key_col)).combine_chunks()
    )
    return mask & valid


def bloom_semi_join(
    left_ds,
    right_ds,
    left_on: str,
    right_on: str,
    how: str = "semi",
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
    num_partitions: int = 32,
):
    """Exact semi/anti join with Bloom map-side pruning of the exchange.

    semi: exchange input = bloom-positive rows only (matches + FP).
    anti: bloom-negative rows bypass the exchange entirely; only the
    positive sliver is exactness-checked.
    """
    if how not in ("semi", "anti"):
        raise ValueError(f"how must be 'semi'/'anti', got {how!r}")
    words = build_bloom(right_ds, right_on, n_bits, n_hashes)
    w_ref = ray.put(words)

    def _keep_positive(tbl: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        return tbl.filter(
            pa.array(_probe_mask(tbl, left_on, w, n_bits, n_hashes))
        )

    positives = left_ds.map_batches(
        _keep_positive, batch_format="pyarrow", batch_size=None
    )
    exact = hash_equi_join(
        positives,
        right_ds,
        left_on,
        right_on,
        how=how,
        num_partitions=num_partitions,
    )
    if how == "semi":
        return exact

    def _keep_negative(tbl: pa.Table) -> pa.Table:
        w = ray.get(w_ref)
        mask = _probe_mask(tbl, left_on, w, n_bits, n_hashes)
        # bloom-negative keys are definitely unmatched -> pass through;
        # NULL keys read as negative too, and SQL anti keeps them
        return tbl.filter(pa.array(~mask))

    negatives = left_ds.map_batches(
        _keep_negative, batch_format="pyarrow", batch_size=None
    )
    return negatives.union(exact)
