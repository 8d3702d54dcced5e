"""Declarative data-quality checks (Deequ/dbt-tests shape): declare
constraints on a DataFrame, get back one small report row per check —
(check, kind, column, violations, total, passed).

Execution shape, which is the point at scale:

- ALL row-level checks (not_null, matches, in_range, in_set, custom
  predicate) compile into a SINGLE aggregate pass over the table —
  one scan, no shuffle beyond the 1-row partial-agg combine,
  regardless of how many checks are declared.
- each ``unique`` check runs as its own two-column aggregate
  (count + countDistinct). Spark rewrites multiple countDistincts in
  one agg into an EXPAND (row multiplication by #distinct-aggs), so
  isolating them keeps the corpus scan multiplication-free; the tiny
  1-row results cross-join back onto the report.
- ``fk`` (referential) checks are left-anti probes against the
  dimension — broadcast when the dim is small, which is the normal
  case for reference data.

This is the generalization of the reference's hand-rolled
valid/invalid accounting (``dags/main.py:185-214`` counts rows
failing its five predicates): same numbers, declared instead of
inlined, and extensible without touching the pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declared constraint. ``kind`` ∈ {not_null, matches,
    in_range, in_set, predicate, unique, fk}."""

    name: str
    kind: str
    column: str = ""
    # kind-specific payloads
    pattern: str | None = None
    lo: float | None = None
    hi: float | None = None
    allowed: tuple | None = None
    predicate: Column | None = None  # violation rows are where this is FALSE
    ref: DataFrame | None = None  # fk: dimension frame
    ref_column: str | None = None  # fk: key column in ref


def not_null(name: str, column: str) -> Check:
    return Check(name, "not_null", column)


def matches(name: str, column: str, pattern: str) -> Check:
    return Check(name, "matches", column, pattern=pattern)


def in_range(name: str, column: str, lo: float, hi: float) -> Check:
    return Check(name, "in_range", column, lo=lo, hi=hi)


def in_set(name: str, column: str, allowed) -> Check:
    return Check(name, "in_set", column, allowed=tuple(allowed))


def satisfies(name: str, predicate: Column, column: str = "") -> Check:
    return Check(name, "predicate", column, predicate=predicate)


def unique(name: str, column: str) -> Check:
    return Check(name, "unique", column)


def fk(name: str, column: str, ref: DataFrame, ref_column: str) -> Check:
    return Check(name, "fk", column, ref=ref, ref_column=ref_column)


def _violation(c: Check) -> Column:
    col = F.col(c.column) if c.column else None
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "matches":
        # NULL never matches → counted as a violation (declare a
        # separate not_null check to tell the two apart)
        return ~F.coalesce(col.rlike(c.pattern), F.lit(False))
    if c.kind == "in_range":
        return ~F.coalesce(col.between(c.lo, c.hi), F.lit(False))
    if c.kind == "in_set":
        return ~F.coalesce(col.isin(*c.allowed), F.lit(False))
    if c.kind == "predicate":
        return ~F.coalesce(c.predicate, F.lit(False))
    raise ValueError(f"not a row-level check: {c.kind}")


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check; returns (check, kind, column, violations,
    total, passed) — one row per check, ordered as declared."""
    row_level = [c for c in checks if c.kind in
                 ("not_null", "matches", "in_range", "in_set", "predicate")]
    uniques = [c for c in checks if c.kind == "unique"]
    fks = [c for c in checks if c.kind == "fk"]

    results: dict[str, DataFrame] = {}

    if row_level:
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.sum(_violation(c).cast("long")).alias(f"_v{i}")
            for i, c in enumerate(row_level)
        ]
        # one aggregate row, EXPLODED into one report row per check —
        # a union of per-check selects would re-run the scan per branch
        one = df.agg(*aggs).select(
            F.inline(
                F.array(
                    *[
                        F.struct(
                            F.lit(checks.index(c)).alias("_pos"),
                            F.lit(c.name).alias("check"),
                            F.lit(c.kind).alias("kind"),
                            F.lit(c.column).alias("column"),
                            F.col(f"_v{i}").alias("violations"),
                            F.col("_total").alias("total"),
                        )
                        for i, c in enumerate(row_level)
                    ]
                )
            )
        )
        results["__row_level__"] = one

    for c in uniques:
        # violations = rows carrying a duplicated value (null-safe:
        # count_distinct ignores NULLs, so count non-null rows)
        one = df.agg(
            F.count(c.column).alias("_n"),
            F.count_distinct(c.column).alias("_d"),
            F.count(F.lit(1)).alias("_total"),
        )
        results[c.name] = one.select(
            F.lit(checks.index(c)).alias("_pos"),
            F.lit(c.name).alias("check"),
            F.lit(c.kind).alias("kind"),
            F.lit(c.column).alias("column"),
            (F.col("_n") - F.col("_d")).alias("violations"),
            F.col("_total").alias("total"),
        )

    for c in fks:
        total = df.agg(F.count(F.lit(1)).alias("_total"))
        orphans = (
            df.join(
                F.broadcast(
                    c.ref.select(F.col(c.ref_column).alias(c.column)).distinct()
                ),
                c.column,
                "left_anti",
            ).agg(F.count(F.lit(1)).alias("_v"))
        )
        results[c.name] = orphans.crossJoin(total).select(
            F.lit(checks.index(c)).alias("_pos"),
            F.lit(c.name).alias("check"),
            F.lit(c.kind).alias("kind"),
            F.lit(c.column).alias("column"),
            F.col("_v").alias("violations"),
            F.col("_total").alias("total"),
        )

    report = None
    for part in results.values():
        report = part if report is None else report.unionByName(part)
    return (
        report.withColumn("passed", F.col("violations") == 0)
        .orderBy("_pos")  # declared order, whatever kind each check is
        .drop("_pos")
    )
