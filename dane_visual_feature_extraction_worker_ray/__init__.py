"""Ray-Data-native transcript feature-engineering engine.

A from-scratch engine with the query/data-processing capabilities of the
reference DANE visual-feature-extraction worker (``/root/reference``),
re-expressed over Parquet tables of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``:

- keyed ingest with exact dedup (reference analog: path index keyed by
  timestamp, ``data_handling.py:30-33``),
- one wide shuffle: hash-bucket by ``conv_id`` + intra-bucket sort by
  ``(conv_id, turn_idx, ts)`` (analog: ``sorted(paths.keys())``,
  ``data_handling.py:33``),
- segment-vectorized per-conversation kernels: lag/lead, gap
  sessionization, sliding/tumbling window aggregates, forward-fill,
- a sorted-merge point-in-time (as-of) join against a snapshot table
  (analog: interval lookup ``data_handling.py:121-129``),
- a stateful actor-pool scorer assembling fixed-width feature vectors
  (analog: model load ``worker.py:61`` + forward pass
  ``feature_extraction.py:17-32``),
- per-partition lineage + manifest for checkpoint/resume,
- plus training-data-pipeline extensions: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding-cosine), similarity search,
  text analysis (langid, quality, tokens, fingerprints).

Everything is built on ``ray.data.Dataset`` + ``map_batches`` over
zero-copy Arrow batches; no module here calls ``ray.init()``.
"""

__version__ = "0.1.0"
