"""Parquet source/sink + managed-table sink.

Covers reference operators S2/S3 (parquet write/read between tasks,
``dags/main.py:161,175,...``), S5 (ClickHouse MergeTree DDL,
``dags/main.py:113-130``), S6 (truncate-before-load,
``dags/main.py:415-421``) and S7 (the collect()+batched-INSERT loader,
``dags/main.py:381-437``).

The scale story: the reference's serving-store load path pulls every
row to the driver and re-inserts in 2,000-row batches — a single-
process cliff (SURVEY §3.2). Here the sink is a partition-parallel
``df.write``; MergeTree's ``ORDER BY house_id`` clustering is
expressed as ``sortWithinPartitions`` before write so parquet
row-group stats give the same pruning benefit; truncate-before-load
is ``mode("overwrite")``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S3: parquet scan. Columnar, predicate-pushdown capable."""
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S2/S6: parquet sink; ``mode='overwrite'`` replaces truncate+load.

    ``partition_by`` enables partition pruning downstream (e.g. by
    region / date) — the unpartitioned reference output forfeits this.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_sorted_table(
    df: DataFrame,
    path: str,
    sort_key: str,
    mode: str = "overwrite",
) -> None:
    """S5/S7: serving-table sink ≈ MergeTree ``ORDER BY sort_key``.

    Partition-parallel write (no collect), rows clustered by the sort
    key within each file so min/max row-group stats prune point/range
    lookups — the distributed analogue of the reference's MergeTree
    primary key.
    """
    df.sortWithinPartitions(sort_key).write.mode(mode).parquet(path)


def write_zordered_table(
    df: DataFrame,
    path: str,
    zkey: F.Column,
    n_files: int = 8,
    row_group_bytes: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered sink: range-partition by the Morton key
    (``functions.zorder.morton_key_2d``), sort within each file by it,
    drop the key before writing.

    Why both steps: ``repartitionByRange`` gives each FILE a disjoint
    key range (file-level pruning via min/max), the within-partition
    sort gives each ROW GROUP inside a file a tight range (row-group
    pruning). A 2D bbox query then skips every row group whose
    (x, y) min/max envelope misses the box — on either axis — which a
    single-column sort can only do for its one column.

    ``row_group_bytes`` tunes parquet's in-file granularity: smaller
    groups prune finer but cost more metadata/seeks. Production scans
    want the default 128 MB; the tests shrink it to make pruning
    measurable at toy scale.
    """
    clustered = (
        df.withColumn("_zkey", zkey)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
    writer = clustered.write.mode(mode)
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(path)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table loader, normalizing nanosecond timestamps.

    Earlier driver testdata wrote ``ts`` as parquet TIMESTAMP(NANOS),
    which Spark 4 refuses to read natively; ``nanosAsLong`` surfaces it
    as ns-since-epoch longs and we rebuild a microsecond timestamp with
    *integer* division (ns epoch values exceed double's 2^53 exact
    range, so float division would corrupt timestamps by ±1 µs). The
    r3 testdata writes plain tz-less timestamp[us], which reads
    directly (as TIMESTAMP_NTZ); the rebuild path stays for nanos
    inputs.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    from pyspark.sql import types as T

    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # watermarks/event-time ops require TIMESTAMP; with the UTC
        # session timezone the cast preserves every wall-clock value
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver testdata tables from ``sf_dir`` as DataFrames."""
    from geoestate_etl_spark.schema import TESTDATA_TABLES

    names = names or TESTDATA_TABLES
    return {
        name: (
            load_events(spark, sf_dir)
            if name == "events"
            else spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        )
        for name in names
    }
