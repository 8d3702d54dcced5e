"""Event-sequence funnel analysis (ClickHouse ``windowFunnel``
semantics — the reference's serving engine is ClickHouse, and funnels
are its signature event-analytics primitive).

``funnel_depth(user) = max k`` such that events matching steps
``1..k`` occur at non-decreasing timestamps with the WHOLE chain
inside ``[t1, t1 + window]`` of its first event.

Scale shape: one filter to the step types (map literal), one groupBy
shuffle per entity, then an O(events-per-user) in-row fold — no self-
joins, no window-over-everything. The fold is a classic DP over the
time-sorted event list: state[j] holds the LATEST chain-start time
among chains that have reached step j (a later start leaves the most
window room), so each event updates at most one level. Set levels
always form a prefix, hence depth = count of set levels.

The registry oracle certifies this fold against an INDEPENDENT
formulation — per-depth EXISTS joins in SQL — the two-algorithm-
families pattern used for the spatial ``pip`` variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(user_col, funnel_depth)`` for every entity with at least one
    step-typed event (depth 0 = has step events but never step 1).

    Equal timestamps may progress the chain (sorted by (time, step),
    chain conditions use ``<=``) — mirrored exactly by the oracle's
    ``>=`` join conditions.
    """
    if not steps:
        raise ValueError("steps must be a non-empty ordered list")
    k = len(steps)
    if len(set(steps)) != k:
        raise ValueError(f"steps must be distinct, got {steps}")
    step_map = F.create_map(
        *[F.lit(x) for s, i in zip(steps, range(1, k + 1)) for x in (s, i)]
    )
    win_us = int(window_seconds) * 1_000_000

    e = (
        events.withColumn("_step", step_map[F.col(type_col)])
        .filter(F.col("_step").isNotNull())
        .select(
            F.col(user_col),
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("t"),
                F.col("_step").alias("s"),
            ).alias("_ev"),
        )
    )
    grouped = e.groupBy(user_col).agg(
        F.array_sort(F.collect_list("_ev")).alias("_evs")
    )

    # typed-NULL sentinel, not -1: chain times are unix_micros, so a
    # pre-1970 event has NEGATIVE t and a -1/>=0 sentinel would treat
    # real chains as absent (silent depth under-report — r3 advice).
    # F.greatest skips NULLs, so greatest(NULL, t) seeds level 1 and
    # greatest(acc_i, acc_{i-1}) keeps the latest viable chain start.
    state0 = F.array_repeat(F.lit(None).cast("long"), k)

    def advance(acc, ev):
        # level i updates only when the event IS step i and (for i>1)
        # a chain has reached i-1 with enough window room left
        return F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: F.when(i != ev["s"], F.element_at(acc, i))
            .when(i == 1, F.greatest(F.element_at(acc, 1), ev["t"]))
            .otherwise(
                F.when(
                    F.element_at(acc, i - 1).isNotNull()
                    & (ev["t"] - F.element_at(acc, i - 1) <= F.lit(win_us)),
                    F.greatest(
                        F.element_at(acc, i), F.element_at(acc, i - 1)
                    ),
                ).otherwise(F.element_at(acc, i))
            ),
        )

    final = F.aggregate(F.col("_evs"), state0, advance)
    return grouped.select(
        user_col,
        F.size(F.filter(final, lambda s: s.isNotNull()))
        .cast("long")
        .alias("funnel_depth"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix: ``(cohort, offset, n_users)`` —
    users whose FIRST event falls in ISO week ``cohort`` and who are
    active again ``offset`` weeks later (offset 0 = the cohort size).

    Pure relational shape at any scale: one min-aggregate per user
    (the cohort), one distinct over (user, activity week), an equi-
    join on the user key, and a count-distinct rollup — no windows
    over everything, no self-joins on events. Both week truncations
    are ISO-Monday (`date_trunc('week')` in Spark and DuckDB agree),
    and the offset is the exact day difference / 7 of two Monday
    stamps, so the oracle mirrors term for term.
    """
    firsts = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("_cohort")
    )
    active = events.select(
        F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("_week")
    ).distinct()
    return (
        active.join(firsts, user_col)
        .select(
            F.col("_cohort").cast("date").alias("cohort"),
            (
                F.datediff(F.col("_week").cast("date"), F.col("_cohort").cast("date"))
                / 7
            )
            .cast("long")
            .alias("offset"),
            F.col(user_col),
        )
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )
