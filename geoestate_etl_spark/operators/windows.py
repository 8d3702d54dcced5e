"""Window-function operators (reference W1, SURVEY §2.5) + the standard
ranking/analytic family.

The reference's one window op is a *global* renumbering:
``row_number().over(Window.orderBy("house_id"))`` with no partitionBy
(``dags/main.py:230-231``) — Catalyst collapses that to ONE partition,
a single-task total sort. We ship it three ways:

- ``renumber_global``   — faithful semantics (fine ≤ ~10M rows).
- ``renumber_scalable`` — identical output, computed distributed:
  sort-shuffle by the key (range partitioner), count rows per
  partition, broadcast the per-partition offsets, add to an intra-
  partition row_number. Two narrow passes, no single-task stage —
  this is the 100 TB path.
- ``rank_features``     — rank/dense_rank/lag/lead/ntile declared as
  engine capability (partitioned windows, shuffle on partition keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def renumber_global(df: DataFrame, order_key: str, id_alias: str) -> DataFrame:
    """W1 faithful: dense 1..N ids by global sort order (main.py:230-231).

    WARNING: unpartitioned window = one-task sort. Use
    ``renumber_scalable`` beyond single-node sizes.
    """
    w = Window.orderBy(order_key)
    return df.withColumn(id_alias, F.row_number().over(w))


def renumber_scalable(df: DataFrame, order_key: str, id_alias: str) -> DataFrame:
    """W1 at scale: same dense 1..N output, no global single-task sort.

    ``repartitionByRange(order_key)`` range-shuffles so partition i
    holds keys < partition i+1; ``spark_partition_id`` + a partition-
    local window computes intra-partition ranks; per-partition counts
    (a tiny aggregate, broadcast join) convert local rank → global id.
    Every stage is parallel; the only driver data is num_partitions
    rows of offsets.
    """
    parts = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(order_key)).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid").orderBy(order_key)
    local = ranged.withColumn("_local_rn", F.row_number().over(local_w))

    offsets = (
        local.groupBy("_pid")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    # offsets has ≤ num_partitions rows — broadcast, no shuffle of `local`.
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(id_alias, (F.col("_local_rn") + F.col("_offset")).cast(T.LongType()))
        .drop("_pid", "_local_rn", "_offset")
    )


def rank_features(
    df: DataFrame,
    part_keys: list[str],
    order: list[Column],
    value: str,
) -> DataFrame:
    """Ranking + analytic window family over partitioned windows.

    rank / dense_rank / row_number / lag / lead / running sum on
    ``value`` within each partition. One shuffle on the partition keys;
    frames are explicit where semantics need them.
    """
    w = Window.partitionBy(*part_keys).orderBy(*order)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        *part_keys,
        value,
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
        F.lag(value, 1).over(w).alias("prev_value"),
        F.lead(value, 1).over(w).alias("next_value"),
        F.sum(value).over(running).alias("running_sum"),
    )
