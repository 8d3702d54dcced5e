"""Streaming deduplication: dropDuplicatesWithinWatermark removes
re-deliveries of the same event id across micro-batches — the
at-least-once -> exactly-once repair every streaming ingest needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.sources.parquet_io import load_events
from tests.conftest import SF_SMOKE


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "dup_src")
    events = load_events(spark, SF_SMOKE).select("event_id", "ts", "value").limit(500)
    # simulate at-least-once delivery: the same events land twice
    events.repartition(2).write.parquet(src)
    events.repartition(2).write.mode("append").parquet(src)
    n_unique = events.count()

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS c FROM dedup_out").collect()[0].c
        distinct = spark.sql(
            "SELECT count(DISTINCT event_id) AS c FROM dedup_out"
        ).collect()[0].c
    finally:
        q.stop()
    assert distinct == n_unique
    assert got == n_unique  # duplicates suppressed, not just distinct-counted
