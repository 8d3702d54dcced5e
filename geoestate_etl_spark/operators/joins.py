"""Join operators (SURVEY §2.3).

The reference is join-free (single-table pipeline), but "same query
capabilities" for any credible engine includes the full join family;
the testdata star schema is the declared surface. The scale rules:

- dimension tables (region/nation/customer-sized) → ``F.broadcast``:
  no shuffle of the fact side at all.
- fact⋈fact (lineitem⋈orders) → shuffle/sort-merge on the key; AQE
  handles skew splitting; pre-bucketing by key removes the shuffle
  entirely when both sides are bucketed (sources.write_sorted_table).
- existence checks → semi/anti joins (never ``distinct`` + inner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Fact⋈small-dim with an explicit broadcast hint — zero fact shuffle."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def sortmerge_join(
    left: DataFrame, right: DataFrame, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Fact⋈fact with a merge hint: shuffle both sides on the key once.

    AQE may still downgrade to broadcast if runtime stats allow — that
    is desired; the hint only rules out nested-loop plans.
    """
    return left.hint("merge").join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS: rows of ``left`` with a match in ``right`` — no duplication,
    right side reduced to its join key before the shuffle."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match in ``right``."""
    return left.join(right, on=on, how="left_anti")
