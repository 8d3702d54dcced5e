"""Skew-resistant aggregation: the salting pattern, made explicit.

AQE's skew-join splitting handles joins; for *aggregations* over a
hot key, the classic fix is two-phase salted aggregation: phase 1
groups on (key, salt) — spreading one hot key over N reducers — and
phase 2 combines the N partials per key. For algebraic aggregates
(count/sum/min/max) the combine is exact, so results are identical to
the direct groupBy; only the shuffle distribution changes.

(Spark's own partial aggregation already handles *map-side* combine;
salting matters when a single reduce key still overflows one task —
e.g. one region holding 30% of 100 TB.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 16, alias: str = "cnt"
) -> DataFrame:
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_pc"))
    return partial.groupBy(*keys).agg(F.sum("_pc").alias(alias))


def salted_group_sum(
    df: DataFrame,
    keys: list[str],
    value: str,
    salt_buckets: int = 16,
    alias: str = "total",
) -> DataFrame:
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.sum(value).alias("_ps"))
    return partial.groupBy(*keys).agg(F.sum("_ps").alias(alias))
