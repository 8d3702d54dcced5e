"""Kafka source/sink builders — the production ingest path for the
streaming surface (event_windows / corpus_ingest consume any streaming
DataFrame, file- or Kafka-backed alike).

The Kafka connector lives in a separate JVM package
(``org.apache.spark:spark-sql-kafka-0-10_2.13``) that is NOT bundled
with pyspark, so this container cannot run it. The builders therefore
probe for the data source at call time and raise a clear, actionable
error instead of Spark's opaque ``Failed to find data source: kafka``
stack — while the value-parsing logic (the part with actual semantics)
is a pure DataFrame transform that tests exercise on batch frames.

Scale notes (for the real cluster):
- one Kafka partition maps to one Spark input partition; parallelism
  is fixed by the topic, so repartition after parse if the topic is
  narrow (`minPartitions` can oversplit but only within a batch);
- set ``maxOffsetsPerTrigger`` to bound batch size — an unbounded
  first batch after downtime is the classic streaming OOM;
- checkpointing + the idempotent sinks in `corpus_ingest` give
  end-to-end exactly-once from Kafka's replayable offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class KafkaConnectorMissing(RuntimeError):
    """Raised when the spark-sql-kafka JVM package is not on the
    classpath (it is not bundled with pyspark)."""

    def __init__(self) -> None:
        super().__init__(
            "The Kafka data source requires the JVM package "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 (matching your "
            "Spark version) on the classpath, e.g. "
            "spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>. "
            "It is not available in this environment."
        )


def kafka_available(spark: SparkSession) -> bool:
    """True if the `kafka` data source resolves in this JVM.

    py4j attribute access returns a lazy ``JavaPackage`` even for
    classes that don't exist, so the probe must force a real class
    load via ``Class.forName``.
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """``readStream`` from a Kafka topic with the batch-size guard on.

    Raises :class:`KafkaConnectorMissing` if the connector jar is
    absent (always, in this container).
    """
    if not kafka_available(spark):
        raise KafkaConnectorMissing()
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def parse_kafka_json(
    raw: DataFrame, schema: str, ts_col: str | None = None
) -> DataFrame:
    """Decode the Kafka wire frame (key/value binary + metadata) into
    typed columns: ``from_json(CAST(value AS STRING))`` against a DDL
    schema, keeping (topic, partition, offset) for lineage/dedup.

    Pure DataFrame logic — works identically on a batch frame with the
    same (value, topic, partition, offset, timestamp) columns, which is
    how the tests pin it without a broker.
    """
    parsed = raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
    ).select("topic", "partition", "offset", "kafka_ts", "v.*")
    if ts_col is not None:
        parsed = parsed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return parsed


def to_kafka_frame(df: DataFrame, payload_cols: list[str], key_col: Column | None = None) -> DataFrame:
    """Inverse of :func:`parse_kafka_json` for the sink side: pack
    ``payload_cols`` into a JSON ``value`` (+ optional ``key``) — the
    shape `writeStream.format("kafka")` requires."""
    value = F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    out = df.select(value.alias("value"))
    if key_col is not None:
        out = df.select(key_col.cast("string").alias("key"), value.alias("value"))
    return out


__all__ = [
    "KafkaConnectorMissing",
    "kafka_available",
    "read_kafka_stream",
    "parse_kafka_json",
    "to_kafka_frame",
]
