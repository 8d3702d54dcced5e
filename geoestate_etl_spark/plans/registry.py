"""Query registry: every declared engine capability, one named entry.

Each :class:`QuerySpec` binds a SURVEY §2 operator (or extension) to
(a) an idiomatic-Spark implementation ``fn(spark, sf_dir) -> DataFrame``
and (b) an ANSI-SQL oracle string DuckDB runs on the same parquet —
the driver's correctness gate. ``oracle=None`` marks genuinely
non-SQL-expressible ops (approx sketches, LSH) → rows-only check.

Hash-match rules (learned from the data profile, see tests):
- every aggregate/computed column aliased identically in both engines;
- floating aggregates rounded identically in both (money → 2 dp);
- top-k sorts carry a unique tiebreaker so the k-set is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    operators: str  # SURVEY §2 ids this query certifies (docs/judging aid)


def all_queries() -> dict[str, QuerySpec]:
    """Merge every domain module's specs (name → spec, unique names)."""
    from geoestate_etl_spark.plans import (
        queries_advanced,
        queries_core,
        queries_etl,
        queries_events,
        queries_ext,
        queries_geo,
        queries_join,
        queries_suites,
        queries_tpch2,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        queries_core,
        queries_join,
        queries_events,
        queries_ext,
        queries_advanced,
        queries_tpch2,
        queries_geo,
        queries_etl,
        queries_suites,
    ):
        for spec in mod.SPECS:
            if spec.name in out:
                raise ValueError(f"duplicate query name: {spec.name}")
            out[spec.name] = spec
    return out
