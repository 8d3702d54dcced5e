"""JSONL source/sink: schema-contract reads, corrupt-line quarantine,
parquet<->jsonl round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.sources.jsonl_source import (
    CORRUPT_COL,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_roundtrip_documents(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, DOC_SCHEMA, keep_corrupt=False)
    a = sorted(tuple(r) for r in docs.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "dirty.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "fine", "lang": "de"}\n'
        '{"doc_id": 3, "text": "truncated...\n'
    )
    df = read_jsonl(spark, str(p), DOC_SCHEMA)
    clean, corrupt = split_corrupt(df)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    bad = [r[CORRUPT_COL] for r in corrupt.collect()]
    assert len(bad) == 2 and "not json" in bad[0]


def test_split_requires_quarantine_col(spark, tmp_path):
    p = tmp_path / "ok.jsonl"
    p.write_text('{"doc_id": 1, "text": "x", "lang": "en"}\n')
    df = read_jsonl(spark, str(p), DOC_SCHEMA, keep_corrupt=False)
    with pytest.raises(ValueError):
        split_corrupt(df)
