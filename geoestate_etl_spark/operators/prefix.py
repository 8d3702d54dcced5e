"""Scalable prefix sums and sequence packing.

A global running sum is the degenerate window case (no partitionBy →
one task holds everything). The distributed formulation mirrors
``windows.renumber_scalable``: range-partition by the order key,
partition-local cumulative sums, then add broadcast per-partition
offsets — two shuffles of the data, one tiny offsets frame, no
single-task stage.

Built on it: **sequence packing** — the concat-and-chunk step of LLM
training-data prep. Documents ordered by id are laid head-to-tail on
a token tape; chunk k owns tape interval [k·budget, (k+1)·budget).
Each document lands in the chunk where it STARTS (documents spanning
a boundary belong to their starting chunk — the downstream tokenizer
splits them; deciding that here would need per-token state, not
relational algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def scalable_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Running sum of ``value_col`` in ``order_col`` order, inclusive,
    without a global single-task window.

    Phase 1: bucket by FROZEN range boundaries on the order key (pure
    key function — see below). Phase 2: per-bucket window cumsum +
    per-bucket totals. Phase 3: broadcast the cumulative offsets of
    preceding buckets back onto each row.

    ``partition_cols`` gives a PER-GROUP running sum (cumsum restarts
    per group) that still parallelizes WITHIN each group: the window
    partitions by (group, bucket) — so a group far bigger than one
    task (one domain holding most of a 100 TB corpus) spreads across
    all buckets instead of serializing into a single window task,
    which is what a plain ``Window.partitionBy(group)`` would do. The
    offsets frame is ``groups × buckets`` rows — still broadcastable
    for any realistic group count.
    """
    from geoestate_etl_spark.operators.windows import frozen_range_bucket

    sess = df.sparkSession
    if num_partitions is None:
        num_partitions = sess.sparkContext.defaultParallelism
    grp = list(partition_cols or [])
    # FROZEN boundary buckets, not repartitionByRange: the offsets
    # aggregation and the final pass traverse the data separately, and
    # range sampling re-runs per exchange materialization — frozen
    # literal boundaries make the bucket a pure key function so both
    # passes agree by construction (see frozen_range_bucket).
    bucket, _n = frozen_range_bucket(df, order_col, num_partitions)
    parted = df.withColumn("_bkt", bucket)
    w_local = (
        Window.partitionBy("_bkt", *grp)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted.withColumn("_local", F.sum(value_col).over(w_local))
    # per-(group, bucket) totals -> offsets (tiny frame). The offsets
    # window is per-group over ≤P bucket rows — partitionBy(group)
    # (or lit(0) for the global case, which states the ≤P-row single
    # partition instead of tripping Spark's global-window warning)
    totals = parted.groupBy("_bkt", *grp).agg(F.sum(value_col).alias("_tot"))
    w_off = (
        Window.partitionBy(*(grp or [F.lit(0)]))
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select(
        F.col("_bkt").alias("_bkt_r"),
        *[F.col(g).alias(f"_grp_{i}") for i, g in enumerate(grp)],
        "_off",
    )
    # null-SAFE group equality: the window above treats a NULL group as
    # its own group (plain-window semantics), so the offsets join must
    # too — a null-unsafe equi-join would silently drop NULL-group rows
    cond = local["_bkt"] == offsets["_bkt_r"]
    for i, g in enumerate(grp):
        cond = cond & local[g].eqNullSafe(offsets[f"_grp_{i}"])
    return (
        local.join(F.broadcast(offsets), cond)
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop(
            "_bkt", "_bkt_r", "_local", "_off",
            *[f"_grp_{i}" for i in range(len(grp))],
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each document a chunk of a fixed token ``budget`` by
    concat-and-chunk order (see module docstring).

    Output adds: ``chunk_id`` (0-based), ``chunk_offset`` (token
    position of the document's first token within its chunk).
    Deterministic — a pure function of (ids, token counts, budget);
    ``num_partitions`` only shapes the cumsum's bucketing (callers
    that know the row count pass a small value for small inputs,
    skipping the boundary-sampling job entirely at ``1``).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    cum = scalable_cumsum(df, id_col, token_col, "_cum", num_partitions)
    start = F.col("_cum") - F.col(token_col)  # tape position of first token
    return (
        cum.withColumn("chunk_id", F.floor(start / budget).cast(T.LongType()))
        .withColumn(
            "chunk_offset", (start - F.col("chunk_id") * budget).cast(T.LongType())
        )
        .drop("_cum")
    )
