"""Column profiling: the data-quality pass every ETL engine runs
before trusting a feed (the reference's valid/invalid accounting,
generalized). One wide aggregate computes all stats in a single scan;
the output unpivots to long format (column, stat, value) so the shape
is stable regardless of how many columns are profiled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column null_count / distinct / min / max in ONE scan.

    Numeric-ish stats are rendered to strings so heterogeneous columns
    share one value column; exactness is preserved (no float formatting
    surprises — values pass through ``CAST AS STRING`` in both engines).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        for stat in ("nulls", "distinct", "min", "max"):
            stack_args.append(f"'{c}', '{stat}', CAST(`{c}__{stat}` AS STRING)")
    n = len(cols) * 4
    return wide.selectExpr(
        f"stack({n}, {', '.join(stack_args)}) AS (column, stat, value)"
    )
