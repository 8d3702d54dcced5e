"""Vocabulary builder + token-id encoder: DuckDB-oracled frequency
ranking on the real documents table, deterministic truncation, and an
encode→decode roundtrip that must reproduce the original token stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.vocab import (
    OOV_ID,
    build_vocab,
    encode_docs,
    tokenize,
)
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare_spark_duckdb

#: DuckDB twin of build_vocab(min_count=3) over the documents view.
VOCAB_SQL = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
         AS token
  FROM documents
), c AS (
  SELECT token, count(*) AS n FROM toks GROUP BY token HAVING count(*) >= 3
)
SELECT token, n,
       row_number() OVER (ORDER BY n DESC, token) AS vocab_id
FROM c
"""


def _docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


def test_vocab_matches_duckdb_oracle(spark, duck):
    vocab = build_vocab(_docs(spark), min_count=3).withColumn(
        "vocab_id", F.col("vocab_id").cast("long")
    )
    ok, msg = compare_spark_duckdb(vocab, duck, VOCAB_SQL)
    assert ok, msg


def test_max_size_truncation_is_deterministic(spark):
    full = build_vocab(_docs(spark), min_count=3)
    assert full.count() > 10
    top = build_vocab(_docs(spark), min_count=3, max_size=10)
    assert top.count() == 10
    want = {
        (r.token, r.n, r.vocab_id)
        for r in full.filter(F.col("vocab_id") <= 10).collect()
    }
    got = {(r.token, r.n, r.vocab_id) for r in top.collect()}
    assert got == want


def test_encode_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog! the dog?"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    vocab = build_vocab(df)
    enc = encode_docs(df, vocab)
    # decode by joining ids back to tokens and compare to tokenize()
    inv = {r.vocab_id: r.token for r in vocab.collect()}
    got = {r.doc_id: [inv[i] for i in r.token_ids] for r in enc.collect()}
    want = {
        r.doc_id: list(r.toks)
        for r in df.select("doc_id", tokenize("text").alias("toks")).collect()
    }
    assert got == want
    # empty doc encodes to an empty array, not a missing row
    assert got[3] == []


def test_oov_maps_to_reserved_id(spark):
    train = spark.createDataFrame([(1, "alpha beta gamma alpha")], ["doc_id", "text"])
    vocab = build_vocab(train, min_count=2)  # only "alpha" survives
    new = spark.createDataFrame([(9, "alpha delta")], ["doc_id", "text"])
    enc = encode_docs(new, vocab).first()
    alpha_id = vocab.first().vocab_id
    assert list(enc.token_ids) == [alpha_id, OOV_ID]
    assert OOV_ID == 0 and alpha_id >= 1
