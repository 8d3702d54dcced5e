"""Incremental aggregate maintenance (materialized-view-style).

Algebraic aggregates (count/sum/min/max) merge associatively, so a
standing aggregate table plus a new-batch partial can be combined
without rescanning history: ``union → groupBy → combine``. This is
the batch twin of the streaming stateful operator — same math, and
the pattern that keeps 100 TB rollups O(batch) instead of O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_count_sum(
    old: DataFrame,
    delta: DataFrame,
    keys: list[str],
    cnt_col: str = "cnt",
    sum_col: str | None = None,
) -> DataFrame:
    """Merge two (keys → count[, sum]) partial aggregates exactly."""
    aggs = [F.sum(cnt_col).alias(cnt_col)]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias(sum_col))
    return old.unionByName(delta).groupBy(*keys).agg(*aggs)
