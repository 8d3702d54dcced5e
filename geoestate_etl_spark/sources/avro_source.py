"""Avro source/sink builders — the remaining big-data interchange
format, gated behind a JVM-package probe like Kafka.

Unlike XML (merged into Spark 4 core — :mod:`sources.xml_source`),
Avro still ships as the external ``org.apache.spark:spark-avro_2.13``
package, absent from plain pyspark installs and from this container.
The builders probe at call time and raise a clear, actionable error
instead of Spark's opaque ``Failed to find data source: avro``/
``AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE`` stacks; everything with
actual semantics here is a thin declarative wrapper, so when the jar
IS present (`spark-submit --packages org.apache.spark:spark-avro_...`)
the same calls go live unchanged — the `sources/table_formats.py`
Delta contract, applied to a format.

Why Avro matters to this engine's users: Kafka payloads and schema-
registry pipelines are overwhelmingly Avro-encoded, so the streaming
ingest path (kafka_source → from_avro(value) → corpus_ingest) is the
canonical composition. ``from_avro``/``to_avro`` are the column twins
(`pyspark.sql.avro.functions` — present in pyspark, but raising
unless the jar is loaded; the probe fronts them too).

Scale notes (real cluster): Avro is a ROW format — fine as an
interchange/ingest format, wrong as the analytical store; land it to
Parquet/ORC (`sources/parquet_io`) in the first hop so scans get
column pruning and predicate pushdown back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession


class AvroConnectorMissing(RuntimeError):
    """Raised when the spark-avro JVM package is not on the classpath
    (it is not bundled with pyspark)."""

    def __init__(self) -> None:
        super().__init__(
            "The Avro data source requires the JVM package "
            "org.apache.spark:spark-avro_2.13 (matching your Spark "
            "version) on the classpath, e.g. spark-submit --packages "
            "org.apache.spark:spark-avro_2.13:<spark-version>. "
            "It is not available in this environment."
        )


def avro_available(spark: SparkSession) -> bool:
    """True if the `avro` data source resolves in this JVM.

    A bare ``Class.forName`` (the kafka probe) is NOT enough here:
    Spark core ships some ``org.apache.spark.sql.avro`` catalyst
    classes even without the connector, so the probe must resolve the
    actual DATA SOURCE the way the reader would.
    """
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def read_avro(
    spark: SparkSession, path: str, **options: str
) -> DataFrame:
    """Read Avro files (schema comes from the files' embedded writer
    schema; pass ``avroSchema`` in options to project/evolve)."""
    if not avro_available(spark):
        raise AvroConnectorMissing()
    reader = spark.read.format("avro")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_avro(df: DataFrame, path: str, mode: str = "error", **options: str) -> None:
    """Write a DataFrame as Avro files (interchange hop — land to
    Parquet for the analytical store, see module scale notes)."""
    if not avro_available(df.sparkSession):
        raise AvroConnectorMissing()
    writer = df.write.format("avro").mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def parse_avro_column(
    spark: SparkSession, c: Column | str, json_schema: str, **options: str
) -> Column:
    """``from_avro`` over a binary column (the Kafka-value shape) —
    probed like the file reader so callers get the actionable error
    at build time, not a JVM stack at execution."""
    if not avro_available(spark):
        raise AvroConnectorMissing()
    from pyspark.sql.avro.functions import from_avro
    from pyspark.sql.functions import col

    column = col(c) if isinstance(c, str) else c
    return from_avro(column, json_schema, options or None)
