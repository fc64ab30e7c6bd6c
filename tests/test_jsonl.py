"""sources/jsonl.read_jsonl_tuned: schema pinning, heterogeneous
shards, projection, and block sizing."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from dane_visual_feature_extraction_worker_ray.sources.jsonl import (
    read_jsonl_tuned,
)


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")


@pytest.fixture()
def jsonl_dir(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    _write(d / "a.jsonl", [{"id": 1, "text": "alpha"},
                           {"id": 2, "text": "beta"}])
    # a later shard gained a column (schema evolution mid-corpus)
    _write(d / "b.jsonl", [{"id": 3, "text": "gamma", "score": 7}])
    return str(d)


def test_schema_pin_aligns_heterogeneous_shards(jsonl_dir):
    schema = pa.schema(
        [("id", pa.int64()), ("text", pa.string()),
         ("score", pa.int64())]
    )
    df = (
        read_jsonl_tuned(jsonl_dir, schema=schema)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert df["id"].tolist() == [1, 2, 3]
    assert df["text"].tolist() == ["alpha", "beta", "gamma"]
    # absent column -> typed nulls, present -> value
    assert df["score"].tolist()[:2] == [None, None] or (
        df["score"].isna().tolist()[:2] == [True, True]
    )
    assert df["score"].tolist()[2] == 7


def test_columns_projection_with_schema(jsonl_dir):
    schema = pa.schema([("id", pa.int64()), ("text", pa.string())])
    ds = read_jsonl_tuned(jsonl_dir, schema=schema, columns=["id"])
    tbl = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")]
    )
    assert tbl.column_names == ["id"]
    assert sorted(tbl.column("id").to_pylist()) == [1, 2, 3]


def test_missing_input_raises(tmp_path):
    empty = tmp_path / "nothing"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        read_jsonl_tuned(str(empty))


def test_roundtrip_text_bytes(tmp_path):
    # JSON escaping must round-trip exact strings (quotes, unicode,
    # backslashes, newlines)
    p = tmp_path / "t.jsonl"
    texts = ['he said "hi"', "tab\tand\nnewline", "café \\ slash"]
    _write(p, [{"id": i, "text": t} for i, t in enumerate(texts)])
    df = (
        read_jsonl_tuned(str(p))
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert df["text"].tolist() == texts


def test_csv_ingest_quoting_and_drift(ray_session, tmp_path):
    """CSV shards with embedded commas, quotes, and newlines round-trip
    byte-exactly; a shard missing a column aligns with typed nulls."""
    import pyarrow as pa

    from dane_visual_feature_extraction_worker_ray.sources.csv import (
        read_csv_tuned,
    )

    (tmp_path / "a.csv").write_text(
        'doc_id,text,lang\n'
        '1,"hello, world",en\n'
        '2,"she said ""hi""",de\n'
        '3,"line1\nline2",fr\n',
        encoding="utf-8",
    )
    (tmp_path / "b.csv").write_text(  # drifted shard: no lang column
        "doc_id,text\n4,plain\n", encoding="utf-8"
    )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    out = (
        read_csv_tuned(str(tmp_path), schema=schema)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == [
        "hello, world",
        'she said "hi"',
        "line1\nline2",
        "plain",
    ]
    assert out["lang"].tolist()[:3] == ["en", "de", "fr"]
    assert out["lang"].isna().tolist() == [False, False, False, True]
