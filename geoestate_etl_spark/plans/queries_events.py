"""Event-table queries: tumbling/sliding/session windows + JSON props.

Oracles: tumbling → date_trunc; sliding → each event duplicated into
width/slide buckets via a VALUES cross join; session → gaps-and-
islands (lag + running flag sum). All checked exactly — the window
operators are deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.plans.registry import QuerySpec
from geoestate_etl_spark.streaming.event_windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geoestate_etl_spark.sources.parquet_io import load_events

    return load_events(spark, sf_dir)


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(_events(spark, sf_dir), "1 hour")


def q_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(_events(spark, sf_dir), "1 hour", "30 minutes")


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(_events(spark, sf_dir), "5 minutes")


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
