"""Format-generic columnar source/sink (parquet + ORC).

The reference's storage surface is parquet-between-tasks plus a
ClickHouse serving table (``dags/main.py:161,175,381-437``); the
engine's own canonical format is parquet (``parquet_io``). This module
generalizes the same read/write/sorted-table surface over Spark's
built-in columnar formats so a deployment standardized on ORC (the
other splittable, predicate-pushdown-capable columnar format Spark
ships natively) gets the identical API — no new dependencies.

Scale properties are format-independent here: both formats carry
column pruning, predicate pushdown to row-group/stripe stats, and
splittable parallel scans; ``write_sorted`` clusters rows by the sort
key within files so min/max stats prune point/range lookups either
way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc")


def _check(fmt: str) -> str:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported columnar format {fmt!r}; use one of {FORMATS}")
    return fmt


def read_columnar(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Columnar scan (S3 generalized): predicate pushdown + column
    pruning on either format."""
    return spark.read.format(_check(fmt)).load(path)


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar sink (S2/S6 generalized)."""
    writer = df.write.format(_check(fmt)).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_key: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Serving-table sink (S5/S7 generalized): partition-parallel,
    rows clustered by ``sort_key`` within each file for stats-based
    pruning — MergeTree's ORDER BY, any columnar format."""
    df.sortWithinPartitions(sort_key).write.format(_check(fmt)).mode(mode).save(path)
