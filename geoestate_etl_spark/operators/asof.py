"""As-of (time-travel) join and bucketized range join.

Spark has no native ASOF JOIN; the idiomatic scale-out formulations:

- ``asof_join``: union-then-window. Tag both inputs, union, sort once
  per key partition (ts, right-before-left on ties), and carry the
  last-seen right row forward with ``last(ignorenulls)``. ONE shuffle
  on the key — same cost as a regular sort-merge join, no range
  explosion, no per-group Python. (The pandas ``merge_asof``-per-group
  alternative ships bytes through Arrow and dies on skewed keys.)
- ``range_join_bucketed``: point-in-interval join without the
  nested-loop plan: explode each interval into the fixed-width buckets
  it covers, equi-join on bucket, then exact-filter. Shuffle volume is
  O(intervals × avg_buckets_per_interval + points), vs O(points ×
  intervals) for the naive theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' gives the
    earliest right row with ``right.ts >= left.ts``) within the key.

    ``payload_cols`` are the right-side columns to carry. Right rows
    must be unique per (key, ts) — pre-aggregate if not.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    collisions = set(payload_cols) & set(left.columns)
    if collisions:
        raise ValueError(
            f"payload_cols {sorted(collisions)} already exist on the left side "
            "and would be silently overwritten by the carried right-side "
            "values; rename them on one side first"
        )

    l_tag = left.withColumn("_is_left", F.lit(1))
    for c in payload_cols:
        l_tag = l_tag.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        key, ts_col, *payload_cols
    ).withColumn("_is_left", F.lit(0))

    cols = [key, ts_col, "_is_left", *payload_cols]
    extra = [c for c in l_tag.columns if c not in cols]
    unioned = l_tag.select(*cols, *extra).unionByName(
        r_tag.select(*cols), allowMissingColumns=True
    )

    if direction == "backward":
        # right rows sort before left at equal ts so ties match
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = [
            F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols
        ]
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts_col).desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = [
            F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols
        ]

    out = unioned.select(key, ts_col, "_is_left", *extra, *filled)
    return out.filter(F.col("_is_left") == 1).drop("_is_left")


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi``, via fixed-width bucket equi-join + exact filter.

    Pick ``bucket_width`` near the typical interval width: each
    interval explodes into ~(width/bucket_width + 1) bucket rows.
    """
    pb = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    # interval tables are small by construction — broadcast them so the
    # points side never shuffles (at any scale), instead of leaving the
    # build-side choice to size stats
    joined = pb.join(F.broadcast(ib), "_bucket").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")
