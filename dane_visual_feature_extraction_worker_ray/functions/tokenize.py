"""Arrow-native whitespace tokenization shared by the text operators.

``pc.utf8_split_whitespace`` + an empty-token filter is bit-identical
to Python ``str.split()`` (verified against the pandas split/explode
path in tests) and ~3x faster — it is the per-batch hot loop of every
token-level operator at corpus scale (scorer, MinHash shingles,
language-ID, quality metrics, heavy hitters).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def ws_tokens(texts) -> tuple[np.ndarray, pa.Array]:
    """Non-empty whitespace tokens of a string array/chunked array (or
    anything ``pa.array`` accepts). Returns ``(row_idx, tokens)`` —
    int64 source-row index per token (non-decreasing) and the flat
    Arrow string array, exactly the pairs Python ``str.split()`` would
    produce. Nulls tokenize as empty."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, pa.string())
    arr = (
        texts.combine_chunks()
        if isinstance(texts, pa.ChunkedArray)
        else texts
    )
    lists = pc.utf8_split_whitespace(pc.fill_null(arr, ""))
    flat = lists.flatten()
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(len(arr), dtype=np.int64), counts)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        row_idx = row_idx[keep]
    return row_idx, flat


def space_fields(texts) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Exact Python ``split(" ")`` fields — EMPTY fields kept, so
    consecutive / leading / trailing single spaces produce ``""``
    fields exactly like the ``str_split(text, ' ')`` the SQL oracles
    use (and unlike :func:`ws_tokens`, which collapses whitespace).
    Returns ``(row_idx, fields, n_fields)``; nulls field-ize as
    ``[""]`` (one empty field, matching ``fill_null("").split(" ")``).
    """
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, pa.string())
    arr = (
        texts.combine_chunks()
        if isinstance(texts, pa.ChunkedArray)
        else texts
    )
    lists = pc.split_pattern(pc.fill_null(arr, ""), " ")
    flat = lists.flatten()
    counts = (
        pc.list_value_length(lists)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    row_idx = np.repeat(np.arange(len(arr), dtype=np.int64), counts)
    return row_idx, flat, counts


def space_stopword_stats(
    texts, stop_values: pa.Array
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row ``(n_fields, n_stopword_hits)`` under ``split(" ")``
    semantics — the quality-gate pair (word count + stopword count)
    shared by ``text_quality`` and the corpus-build filters. One C++
    split + one hash-set ``is_in`` probe; no pandas explode."""
    row_idx, flat, counts = space_fields(texts)
    hits = pc.is_in(flat, value_set=stop_values).to_numpy(
        zero_copy_only=False
    )
    n_stop = np.bincount(row_idx[hits], minlength=len(counts)).astype(
        np.int64
    )
    return counts, n_stop
