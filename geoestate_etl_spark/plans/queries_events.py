"""Event-table queries: JSON props extraction.

The tumbling/sliding/session window queries merged into
queries_suites.event_windows_suite (r2); their operators live in
streaming/event_windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.plans.registry import QuerySpec


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geoestate_etl_spark.sources.parquet_io import load_events

    return load_events(spark, sf_dir)


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props column (semi-structured surface)."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast(T.LongType()).alias("prop_k"),
    )


# tumbling/sliding/session merged into queries_suites.event_windows_suite (r2)
SPECS = [
    QuerySpec(
        "json_props",
        q_json_props,
        "SELECT event_id, CAST(props ->> '$.k' AS BIGINT) AS prop_k FROM events",
        "json-extract",
    ),
]
