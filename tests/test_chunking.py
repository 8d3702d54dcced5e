"""Sliding-window document chunking: window/overlap semantics, edge
cases, and DuckDB parity on the documents table."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.text import chunk_documents
from tests.conftest import SF_ORACLE


def _chunks(spark, text, chunk, overlap):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = chunk_documents(df, "doc_id", "text", chunk, overlap).collect()
    return [(r.chunk_idx, r.chunk_text) for r in sorted(rows)]


def test_basic_windows(spark):
    text = "a b c d e f g h i j"  # 10 words
    assert _chunks(spark, text, 4, 0) == [
        (0, "a b c d"), (1, "e f g h"), (2, "i j"),
    ]
    assert _chunks(spark, text, 4, 2) == [
        (0, "a b c d"), (1, "c d e f"), (2, "e f g h"), (3, "g h i j"),
    ]


def test_edges(spark):
    # doc shorter than the window -> one chunk
    assert _chunks(spark, "a b", 5, 2) == [(0, "a b")]
    # window exactly the doc -> one chunk
    assert _chunks(spark, "a b c", 3, 1) == [(0, "a b c")]
    # a start that adds no unseen words is dropped: 5 words, window 4,
    # overlap 3 -> starts 0,1 (start 2 would end at min(6,5)=5 ... it
    # adds word 5? start=2,+overlap 3 = 5 >= n=5 -> dropped; start 1
    # covers words 2-5 already)
    assert _chunks(spark, "a b c d e", 4, 3) == [
        (0, "a b c d"), (1, "b c d e"),
    ]


def test_reconstruction_property(spark):
    """Concatenating chunks with the overlap removed reproduces the
    normalized document exactly."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(50)
    chunk, overlap = 12, 4
    out = chunk_documents(docs, "doc_id", "text", chunk, overlap).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)):
        words = r.chunk_text.split(" ")
        prev = by_doc.get(r.doc_id, [])
        by_doc[r.doc_id] = prev + (words[overlap:] if prev else words)
    from geoestate_etl_spark.functions.text import normalize_text

    want = {
        r.doc_id: r.norm.split(" ")
        for r in docs.select(
            "doc_id", normalize_text(F.col("text")).alias("norm")
        ).collect()
    }
    assert by_doc == want


def test_duckdb_parity(spark):
    """Same chunking rendered in SQL must agree row-for-row."""
    chunk, overlap, stride = 10, 3, 7
    got = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in chunk_documents(
            spark.read.parquet(f"{SF_ORACLE}/documents.parquet"),
            "doc_id", "text", chunk, overlap,
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_ORACLE}/documents.parquet')"
    )
    # mirror normalize_text: lower, [^a-z0-9]+ -> ' ', trim
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(f"""
WITH words AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS w
  FROM documents
), starts AS (
  SELECT doc_id, w, s, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS INT) AS chunk_idx
  FROM words, UNNEST(range(0, greatest(len(w), 1), {stride})) AS t(s)
  WHERE s = 0 OR s + {overlap} < len(w)
)
SELECT doc_id, chunk_idx, array_to_string(w[s+1:s+{chunk}], ' ') FROM starts
""").fetchall()
    }
    assert got == want
