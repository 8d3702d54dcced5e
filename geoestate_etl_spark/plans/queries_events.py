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


SPECS = [
    QuerySpec(
        "tumbling_hourly",
        q_tumbling_hourly,
        "SELECT date_trunc('hour', ts) AS window_start, event_type, "
        "count(*) AS cnt, round(sum(value), 2) AS sum_value "
        "FROM events GROUP BY window_start, event_type",
        "stream-tumbling",
    ),
    QuerySpec(
        "sliding_hourly",
        q_sliding_hourly,
        # every event belongs to 2 windows: the 30-min bucket it falls in
        # and that bucket minus 30 minutes
        "SELECT time_bucket(INTERVAL '30 minutes', ts) - "
        "to_minutes(off.m) AS window_start, event_type, count(*) AS cnt "
        "FROM events CROSS JOIN (VALUES (0), (30)) AS off(m) "
        "GROUP BY window_start, event_type",
        "stream-sliding",
    ),
    QuerySpec(
        "session_windows",
        q_session_windows,
        # gaps-and-islands: new session when gap > 5 min; session_end =
        # last event + gap (session_window's end semantics)
        "WITH flagged AS ("
        "  SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER "
        "    (PARTITION BY user_id ORDER BY ts) <= INTERVAL '5 minutes' "
        "    THEN 0 ELSE 1 END AS new_session FROM events), "
        "sessions AS ("
        "  SELECT user_id, ts, sum(new_session) OVER "
        "    (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid "
        "  FROM flagged) "
        "SELECT user_id, min(ts) AS session_start, "
        "max(ts) + INTERVAL '5 minutes' AS session_end, "
        "count(*) AS n_events FROM sessions GROUP BY user_id, sid",
        "stream-session",
    ),
    QuerySpec(
        "json_props",
        q_json_props,
        "SELECT event_id, CAST(props ->> '$.k' AS BIGINT) AS prop_k FROM events",
        "json-extract",
    ),
]
