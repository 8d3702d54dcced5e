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
    """JSON extraction from the props column — all three semi-
    structured access paths the engine supports, certified by one
    hash (each column must agree with the same SQL extraction):

    - ``get_json_object`` (stringly path probe, the classic),
    - ``from_json`` with an explicit schema (the production path —
      parse once into a typed struct, prune columns),
    - Spark 4 VARIANT (``parse_json`` + ``variant_get`` — the
      shredded open-schema type for semi-structured lakes).
    """
    ev = _events(spark, sf_dir)
    props_struct = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast(T.LongType()).alias("prop_k"),
        props_struct.getField("k").alias("prop_k_struct"),
        # try_parse_json: NULL on malformed input like the two sibling
        # paths (strict parse_json would fail the whole query instead)
        F.variant_get(F.try_parse_json("props"), "$.k", "bigint").alias(
            "prop_k_variant"
        ),
    )


# tumbling/sliding/session merged into queries_suites.event_windows_suite (r2)
SPECS = [
    QuerySpec(
        "json_props",
        q_json_props,
        "SELECT event_id, CAST(props ->> '$.k' AS BIGINT) AS prop_k, "
        "CAST(props ->> '$.k' AS BIGINT) AS prop_k_struct, "
        "CAST(props ->> '$.k' AS BIGINT) AS prop_k_variant FROM events",
        "json-extract (string path + typed from_json + Spark 4 VARIANT)",
    ),
]
