"""Structured Streaming demo path: the batch-verified tumbling plan,
run as a real readStream (file source -> memory sink) and checked
against the batch result on the same rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.sources.parquet_io import load_events
from geoestate_etl_spark.streaming.event_windows import (
    stream_tumbling_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_batch(spark, tmp_path_factory):
    # re-materialize with a us timestamp so readStream sees a plain schema
    p = str(tmp_path_factory.mktemp("stream") / "events")
    load_events(spark, SF_SMOKE).write.parquet(p)
    return p


def test_session_window_stream_matches_batch(spark, events_batch):
    from geoestate_etl_spark.streaming.event_windows import session_windows

    batch_df = spark.read.parquet(events_batch)
    expected = {
        (r.user_id, r.session_start): r.n_events
        for r in session_windows(batch_df, "5 minutes").collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(events_batch)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_start): r.n_events
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stream_static_join(spark, events_batch):
    """Streaming fact joined to a static dimension (enrichment-at-
    ingest): the stream side micro-batches, the dim broadcasts."""
    batch_df = spark.read.parquet(events_batch)
    users = batch_df.select("user_id").distinct().withColumn(
        "segment", (F.col("user_id") % 3).cast("string")
    )
    expected = (
        batch_df.join(users, "user_id")
        .groupBy("segment")
        .count()
        .collect()
    )
    expected = {r.segment: r["count"] for r in expected}

    stream = spark.readStream.schema(batch_df.schema).parquet(events_batch)
    joined = stream.join(users, "user_id").groupBy("segment").count()
    q = (
        joined.writeStream.outputMode("complete")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.segment: r["count"]
            for r in spark.sql("SELECT * FROM enrich_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stream_matches_batch(spark, events_batch):
    batch_df = spark.read.parquet(events_batch)
    expected = {
        (r.window_start, r.event_type): r.cnt
        for r in tumbling_counts(batch_df, "1 hour").select(
            "window_start", "event_type", "cnt"
        ).collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema).parquet(events_batch)
    )
    q = (
        stream_tumbling_counts(stream, "1 hour")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): r.cnt
            for r in spark.sql("SELECT * FROM stream_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stream_stream_interval_join_matches_batch(spark, events_batch):
    """Purchases attributed to a same-user click within 30 minutes:
    the stream-stream interval join emits exactly the batch join's
    rows (watermarks bound state, not inner-join output)."""
    from geoestate_etl_spark.streaming.joins import interval_join

    batch_df = spark.read.parquet(events_batch)
    clicks = batch_df.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = batch_df.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    expected = {
        (r.user_id, r.click_id, r.buy_id)
        for r in interval_join(
            clicks, buys, "user_id", "click_ts", "buy_ts"
        ).collect()
    }
    assert expected  # fixture really exercises the join

    schema = batch_df.schema
    stream = spark.readStream.schema(schema).parquet(events_batch)
    s_clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    s_buys = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"),
    )
    q = (
        interval_join(s_clicks, s_buys, "user_id", "click_ts", "buy_ts")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.click_id, r.buy_id)
            for r in spark.sql("SELECT * FROM ij_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_stream_stream_left_outer_interval_join(spark, events_batch, tmp_path):
    """Left-outer attribution: clicks that never converted must surface
    with a null buy_id. Streaming emits those rows only after the
    watermark proves no match can arrive, so a far-future sentinel pair
    (filtered from the comparison) flushes the tail state; the result
    then equals the batch left join on the same condition."""
    from geoestate_etl_spark.streaming.joins import interval_join

    batch_df = spark.read.parquet(events_batch)

    def sides(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        buys = df.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("buy_ts"),
            F.col("event_id").alias("buy_id"),
        )
        return clicks, buys

    clicks, buys = sides(batch_df)
    expected = {
        (r.user_id, r.click_id, r.buy_id)
        for r in interval_join(
            clicks, buys, "user_id", "click_ts", "buy_ts", how="left_outer"
        ).collect()
    }
    unmatched = {t for t in expected if t[2] is None}
    assert unmatched  # fixture really exercises the outer part

    # staged source: real events first, then a sentinel click+purchase
    # 2 days later (one per side) that advances both watermarks past
    # every real row's expiry, flushing unmatched state
    src = str(tmp_path / "staged")
    batch_df.write.parquet(src)
    types = dict(batch_df.dtypes)
    max_ts = batch_df.agg(F.max("ts")).collect()[0][0]
    base = (
        batch_df.limit(1)
        .withColumn("user_id", F.lit(-999).cast(types["user_id"]))
        .withColumn("ts", F.lit(max_ts) + F.expr("interval 2 days"))
    )
    sentinel = base.withColumn("event_type", F.lit("click")).withColumn(
        "event_id", F.lit(-1).cast(types["event_id"])
    ).union(
        base.withColumn("event_type", F.lit("purchase")).withColumn(
            "event_id", F.lit(-2).cast(types["event_id"])
        )
    ).select(*batch_df.columns)
    sentinel.write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    s_clicks, s_buys = sides(stream)
    q = (
        interval_join(
            s_clicks, s_buys, "user_id", "click_ts", "buy_ts", how="left_outer"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("loj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.click_id, r.buy_id)
            for r in spark.sql(
                "SELECT * FROM loj_out WHERE user_id != -999"
            ).collect()
        }
    finally:
        q.stop()
    assert got == expected


# --- kafka builders (no broker/jar in this container) ----------------------

def test_kafka_missing_connector_raises_clean_error(spark):
    from geoestate_etl_spark.streaming.kafka_source import (
        KafkaConnectorMissing,
        kafka_available,
        read_kafka_stream,
    )

    assert not kafka_available(spark)
    import pytest as _pytest

    with _pytest.raises(KafkaConnectorMissing, match="spark-sql-kafka"):
        read_kafka_stream(spark, "localhost:9092", "events")


def test_kafka_json_roundtrip_on_batch_frame(spark):
    """parse(pack(x)) == x on a batch frame shaped like the Kafka wire
    format — pins the value semantics without a broker."""
    from geoestate_etl_spark.streaming.kafka_source import (
        parse_kafka_json,
        to_kafka_frame,
    )

    rows = spark.createDataFrame(
        [(1, "click", "2024-05-01 10:00:00"), (2, "buy", "2024-05-01 10:05:00")],
        ["user_id", "event_type", "ts"],
    )
    packed = to_kafka_frame(rows, ["user_id", "event_type", "ts"], F.col("user_id"))
    wire = packed.select(
        F.lit("events").alias("topic"),
        (F.col("key").cast("long") % 4).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.col("value").cast("binary").alias("value"),
    )
    parsed = parse_kafka_json(
        wire, "user_id BIGINT, event_type STRING, ts STRING", ts_col="ts"
    )
    got = {
        (r.user_id, r.event_type, str(r.ts)) for r in parsed.collect()
    }
    assert got == {
        (1, "click", "2024-05-01 10:00:00"),
        (2, "buy", "2024-05-01 10:05:00"),
    }
    assert set(parsed.columns) >= {"topic", "partition", "offset", "kafka_ts"}


# --- rocksdb state store ---------------------------------------------------

def test_session_windows_on_rocksdb_state_store(spark, events_batch):
    """Same session-window aggregation, state held in RocksDB instead
    of the heap-backed default — results must be identical. This is
    the large-state path: heap provider = O(state) executor heap,
    RocksDB = bounded block cache + local disk."""
    from geoestate_etl_spark.session import (
        ROCKSDB_PROVIDER,
        streaming_state_conf,
    )
    from geoestate_etl_spark.streaming.event_windows import session_windows

    batch_df = spark.read.parquet(events_batch)
    expected = {
        (r.user_id, r.session_start): r.n_events
        for r in session_windows(batch_df, "5 minutes").collect()
    }

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    for k, v in streaming_state_conf().items():
        spark.conf.set(k, v)
    try:
        stream = spark.readStream.schema(batch_df.schema).parquet(events_batch)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id", F.col("w.start").alias("session_start"), "n_events"
            )
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocks_out")
            .start()
        )
        try:
            q.processAllAvailable()
            # the running query must actually be on RocksDB (its
            # provider-specific metrics only exist when it is)
            metrics = q.lastProgress["stateOperators"][0]["customMetrics"]
            assert "rocksdb" in str(metrics).lower()
            got = {
                (r.user_id, r.session_start): r.n_events
                for r in spark.sql("SELECT * FROM rocks_out").collect()
            }
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    assert got == expected
