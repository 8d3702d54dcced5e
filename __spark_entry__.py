"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``geoestate_etl_spark.plans`` — the engine's query
registry. Every declared capability (SURVEY.md §2 + extensions) is a
named :class:`QuerySpec` with an idiomatic-Spark plan and, where
SQL-expressible, a DuckDB oracle string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geoestate_etl_spark.plans import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: star-schema revenue rollup (joins + partial agg)."""
    from geoestate_etl_spark.plans.queries_join import q_star_revenue

    return q_star_revenue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
