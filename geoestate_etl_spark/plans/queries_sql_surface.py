"""Scalar/structural SQL surface: string & null functions, conditional
aggregation, window frames, unpivot, array explode, scalar subqueries.

These widen the "a reference user could run every query they run
today" guarantee beyond the reference's literal call list (SURVEY
§2.8 notes its scalar surface is tiny); each is an oracled one-liner
certifying a family of built-ins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.plans.registry import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.length("c_name").cast(T.LongType()).alias("ln"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("joined"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_head"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cst")).alias("repl"),
    )


def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status_x"),
        F.when(price > 200000, None).otherwise(price).alias("capped"),
        F.isnull(F.when(price > 200000, None).otherwise(price)).alias("is_capped"),
        F.nvl2(F.nullif(F.col("o_orderstatus"), F.lit("F")), F.lit(1), F.lit(0)).alias("not_f"),
    )


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("l_quantity") > 25
    return li.groupBy("l_linestatus").agg(
        F.count(F.when(high, 1)).alias("n_high"),
        F.count(F.when(~high, 1)).alias("n_low"),
        F.round(F.sum(F.when(high, F.col("l_extendedprice")).otherwise(0.0)), 2).alias("high_value"),
    )


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frame: trailing 4-row moving average per customer."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-3, Window.currentRow)
    )
    # money-as-integer-cents, all the way through: float rounding of a
    # sliding average differs across engines at half-cent boundaries
    # (Java BigDecimal shortest-repr vs raw-binary rounding), so the
    # round-half-up happens in integer arithmetic: floor((2S+C)/(2C)).
    cents = F.round(F.col("o_totalprice") * 100).cast(T.LongType())
    s = F.sum(cents).over(w)
    c = F.count(cents).over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.floor((2 * s + c) / (2 * c)).cast(T.LongType()).alias("ma4_cents"),
    )


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt) of part measure columns."""
    p = _t(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast(T.DoubleType()).alias("size"),
        F.col("p_retailprice").alias("price"),
    )
    return wide.unpivot("p_partkey", ["size", "price"], "measure", "value")


def q_explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: posexplode an embedding into (pos, value) rows."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("pos", F.col("pos").cast(T.LongType()))


def q_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance between consecutive customer names — the fuzzy
    string-matching primitive for entity resolution."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    left = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("id_a"), F.col("c_name").alias("na")
    )
    right = c.select(
        (F.col("c_custkey") - 1).alias("id_a"),
        F.col("c_custkey").alias("id_b"),
        F.col("c_name").alias("nb"),
    )
    return (
        left.join(right, "id_a")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("na", "nb").cast(T.LongType()).alias("edit_dist"),
        )
    )


def q_window_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an explicit full-partition frame."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above the global average price (scalar subquery via SQL)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_ss")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_ss
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_ss)
        """
    )


SPECS = [
]
