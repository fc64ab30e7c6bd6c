"""Ingest-format queries: corpora that arrive as JSONL (the standard
LLM training-data interchange format) enter the engine through
``sources/jsonl.read_jsonl_tuned`` and must reproduce the parquet
truth byte-for-byte. The reference ingests JSON metadata alongside its
binary media (io_util.py); here the whole-record JSONL round trip is
the gate."""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq


_FIXTURE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _ensure_jsonl_fixture(sf_dir: str, n_files: int = 4) -> str:
    """Write the documents table as ``n_files`` JSONL shards under /tmp
    (keyed by sf tier; atomic renames; deterministic bytes — ASCII-safe
    ``json.dumps`` with sorted keys, rows in doc_id order, round-robin
    sharding by doc_id). Returns the fixture directory."""
    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join(
        tempfile.gettempdir(), f"graft_jsonl_fixture_{tier}_v1"
    )
    done = os.path.join(d, "_SUCCESS")
    if os.path.isfile(done):
        return d
    os.makedirs(d, exist_ok=True)
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=_FIXTURE_COLS
    ).sort_by("doc_id")
    rows = tbl.to_pylist()
    pid = os.getpid()
    for s in range(n_files):
        tmp = os.path.join(d, f"part-{s:03d}.jsonl.tmp.{pid}")
        with open(tmp, "w", encoding="ascii") as f:
            for r in rows:
                if int(r["doc_id"]) % n_files == s:
                    f.write(json.dumps(r, sort_keys=True) + "\n")
        os.replace(tmp, os.path.join(d, f"part-{s:03d}.jsonl"))
    tmp = done + f".tmp.{pid}"
    with open(tmp, "w") as f:
        f.write("ok\n")
    os.replace(tmp, done)
    return d


def q_jsonl_ingest(sf_dir: str):
    """Documents round-tripped through sharded JSONL: parquet truth →
    deterministic .jsonl shards → ``read_jsonl_tuned`` with a pinned
    schema (JSON's int/str/null all survive; the schema pin keeps
    column order and types independent of pyarrow's JSON inference).
    Hash-exact against the source parquet — any byte lost in either
    direction fails the gate."""
    from ..sources.jsonl import read_jsonl_tuned

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    d = _ensure_jsonl_fixture(sf_dir)
    return read_jsonl_tuned(d, schema=schema)


QUERIES = {"jsonl_ingest": q_jsonl_ingest}
ORACLE_SQL = {
    "jsonl_ingest": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source, "
        "CAST(n_chars AS BIGINT) AS n_chars FROM documents"
    ),
}


def _ensure_csv_fixture(sf_dir: str, n_files: int = 4) -> str:
    """Write the documents table as ``n_files`` RFC-4180 CSV shards
    (same determinism contract as the JSONL fixture: doc_id order,
    round-robin sharding, atomic renames)."""
    import csv

    tier = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join(tempfile.gettempdir(), f"graft_csv_fixture_{tier}_v1")
    done = os.path.join(d, "_SUCCESS")
    if os.path.isfile(done):
        return d
    os.makedirs(d, exist_ok=True)
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=_FIXTURE_COLS
    ).sort_by("doc_id")
    rows = tbl.to_pylist()
    pid = os.getpid()
    for s in range(n_files):
        tmp = os.path.join(d, f"part-{s:03d}.csv.tmp.{pid}")
        with open(tmp, "w", encoding="utf-8", newline="") as f:
            w = csv.writer(f)
            w.writerow(_FIXTURE_COLS)
            for r in rows:
                if int(r["doc_id"]) % n_files == s:
                    w.writerow([r[c] for c in _FIXTURE_COLS])
        os.replace(tmp, os.path.join(d, f"part-{s:03d}.csv"))
    tmp = done + f".tmp.{pid}"
    with open(tmp, "w") as f:
        f.write("ok\n")
    os.replace(tmp, done)
    return d


def q_csv_ingest(sf_dir: str):
    """Documents round-tripped through sharded RFC-4180 CSV: parquet
    truth → quoted CSV shards (JSON-ish props text with braces and
    quotes exercises the quoting path) → ``read_csv_tuned`` with a
    pinned schema so numeric-looking strings stay strings. Hash-exact
    against the source parquet."""
    from ..sources.csv import read_csv_tuned

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    d = _ensure_csv_fixture(sf_dir)
    return read_csv_tuned(d, schema=schema)


QUERIES["csv_ingest"] = q_csv_ingest
ORACLE_SQL["csv_ingest"] = ORACLE_SQL["jsonl_ingest"]
