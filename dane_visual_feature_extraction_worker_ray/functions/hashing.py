"""Deterministic vectorized hashing primitives.

Everything downstream (bucket assignment, exact-dedup keys, MinHash,
SimHash, fingerprints, the scorer's pseudo-embedding) derives from one
stable 64-bit string hash so results are bit-identical across runs,
processes, and parallelism levels (required for deterministic resume —
SURVEY.md §7.4). Reference analog: ``hash_string`` (SHA-224),
``/root/reference/base_util.py:205-206`` — here vectorized.

``pandas.util.hash_pandas_object`` is a keyed SipHash-like C
implementation with a fixed default key → stable across sessions and
platforms; we use it as the base primitive instead of Python-level
``hash`` (which is salted per process) or a per-row hashlib loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MIX = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / golden ratio


def hash64(values) -> np.ndarray:
    """Stable uint64 hash of a string/bytes/int array-like (vectorized)."""
    s = values if isinstance(values, pd.Series) else pd.Series(values)
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def rehash64(h: np.ndarray, seed: int) -> np.ndarray:
    """Cheap independent-ish family member: splitmix64 finalizer over h^seed."""
    # seed mix wraps in Python-int space first: a numpy scalar multiply
    # would emit "overflow encountered in scalar multiply" (and fail -W error)
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    x = h.astype(np.uint64) ^ seed_mix
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def bucket_of(h: np.ndarray, num_buckets: int) -> np.ndarray:
    """Bucket id in [0, num_buckets) from a uint64 hash (int32 output)."""
    return (h % np.uint64(num_buckets)).astype(np.int32)


# engine-stable sentinel hash for NULL integer keys (any odd constant
# works; it only has to be the same in every block and every run)
_NULL_KEY_HASH = np.uint64(0x1F0E4DA9E4779D37)


def _column_hash(col) -> np.ndarray:
    """Stable per-value hash of one Arrow column.

    Integer columns are hashed WITHOUT a pandas float round-trip: an
    int64 column WITH nulls converts to a float64 series under
    ``to_pandas()``, and ``hash_pandas_object`` hashes float64 values
    differently from the same values as int64 — so the same key would
    land in different partitions depending on whether its block happens
    to contain a null (breaks join/groupby co-location for nullable
    keys). Nulls are filled with 0 for the exact-int hash, then
    overwritten with a fixed sentinel hash.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if pa.types.is_integer(col.type) and col.null_count:
        filled = pc.fill_null(col, 0).to_pandas()  # exact ints, no nulls
        h = hash64(filled)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        return np.where(valid, h, _NULL_KEY_HASH)
    return hash64(col.to_pandas())


def hash64_columns(tbl, keys: list[str]) -> np.ndarray:
    """Stable combined uint64 hash of one or more Arrow table columns
    (the composite shuffle key used by the exchange and groupagg).
    Value-stable under nulls: a key hashes the same whether or not its
    block contains nulls (see :func:`_column_hash`)."""
    h = _column_hash(tbl.column(keys[0]))
    for i, k in enumerate(keys[1:], start=1):
        h = rehash64(h ^ _column_hash(tbl.column(k)), seed=i)
    return h
