"""Sort / limit / top-k operators (reference T1-T3, SURVEY §2.6).

``orderBy(...).limit(k)`` compiles to Catalyst's
``TakeOrderedAndProject`` — a per-partition bounded heap + driver
merge of k·num_partitions rows, NOT a full sort. That is the only
top-k shape that survives 100 TB, and it is what both reference paths
(Spark ``:322-331`` and the ClickHouse SQL ``:489-495``) mean.

Tiebreakers: the driver's oracle hash is order-insensitive but the
*membership* of a top-k set isn't stable under ties, so every declared
top-k query threads a unique tiebreaker column through the sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """T1/T3: global top-k without a full sort."""
    return df.orderBy(*order).limit(k)


def top_k_by_count(
    df: DataFrame, keys: list[str], k: int, count_alias: str = "cnt"
) -> DataFrame:
    """T1: top-k groups by descending count (dags/main.py:319-331).

    Group keys serve as the tiebreaker so the k-set is deterministic.
    """
    counted = df.groupBy(*keys).agg(F.count("*").alias(count_alias))
    order = [F.desc(count_alias)] + [F.asc(key) for key in keys]
    return counted.orderBy(*order).limit(k)


def filtered_top_k(
    df: DataFrame,
    predicate: Column,
    order: list[Column],
    k: int,
    projection: list[str] | None = None,
) -> DataFrame:
    """T3: the reference's signature serving query
    (``WHERE square > 60 ORDER BY square DESC LIMIT 25``,
    dags/main.py:489-495) as filter→top-k; the filter is pushed to the
    parquet scan by Catalyst.
    """
    out = df.filter(predicate)
    if projection:
        out = out.select(*projection)
    return out.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, part_keys: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k within each group (window + rank filter).

    Not in the reference but the canonical OLAP sibling of T1; shuffles
    once on the partition keys, then a per-partition bounded sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*part_keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
