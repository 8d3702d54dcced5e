"""Streaming corpus ingest: cross-batch fingerprint dedup, PII scrub,
epoch-keyed idempotence (retry == no-op), and the readStream wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.streaming.corpus_ingest import (
    ingest_batch,
    start_corpus_ingest,
)
from tests.test_corpus_pipeline import GOOD, OTHER, PII_DOC


def _read(spark, d):
    return spark.read.parquet(d)


def test_batch_twin_dedups_across_epochs_and_retries(spark, tmp_path):
    corpus, fps = str(tmp_path / "corpus"), str(tmp_path / "fps")

    b0 = spark.createDataFrame(
        [(1, GOOD), (2, "hi"), (3, PII_DOC)], ["doc_id", "text"]
    )
    b1 = spark.createDataFrame(
        [(4, GOOD), (5, OTHER)], ["doc_id", "text"]  # 4 = cross-epoch dup
    )
    b2 = spark.createDataFrame(
        [(6, "  " + OTHER), (7, GOOD.upper().lower()), (8, GOOD + " until dawn")],
        ["doc_id", "text"],  # 6,7 dups after normalization; 8 new
    )
    for i, b in enumerate((b0, b1, b2)):
        ingest_batch(b, i, corpus, fps)

    rows = {r.doc_id: r.text for r in _read(spark, corpus).collect()}
    assert set(rows) == {1, 3, 5, 8}
    assert "alice@example.com" not in rows[3] and "<EMAIL>" in rows[3]
    assert _read(spark, fps).select("fp").distinct().count() == 4

    # retry of epoch 1 with identical input must change nothing
    before = sorted(map(str, _read(spark, corpus).collect()))
    ingest_batch(b1, 1, corpus, fps)
    after = sorted(map(str, _read(spark, corpus).collect()))
    assert before == after


def test_stream_wiring_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    corpus, fps = str(tmp_path / "corpus"), str(tmp_path / "fps")
    docs = spark.createDataFrame(
        [(1, GOOD), (2, OTHER), (3, PII_DOC), (4, GOOD)], ["doc_id", "text"]
    )
    docs.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_corpus_ingest(
        stream, corpus, fps, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = _read(spark, corpus)
    assert out.count() == 3  # 4 collapsed into 1's fingerprint (same batch)
    assert out.filter(F.col("text").contains("alice@example.com")).count() == 0
    assert out.agg(F.min("n_tokens")).first()[0] > 0
