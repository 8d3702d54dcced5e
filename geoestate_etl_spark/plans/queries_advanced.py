"""Advanced relational surface: as-of join, range join, pivot, cube,
distinct counts, SQL-API entry point.

The as-of join oracle uses DuckDB's native ASOF JOIN — strong evidence
the union+window formulation implements the standard semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.operators.asof import asof_join, range_join_bucketed
from geoestate_etl_spark.plans.registry import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        from geoestate_etl_spark.sources.parquet_io import load_events

        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event joined to the user's latest purchase at-or-before it."""
    ev = _t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))  # unique per (key, ts)
    )
    left = ev.select("user_id", "ts", "event_id")
    out = asof_join(left, purchases, "user_id", "ts", ["purchase_id"])
    return out.select("event_id", "user_id", "purchase_id")


def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined into fixed price bands via the bucketed range join."""
    orders = _t(spark, sf_dir, "orders")
    # bands built JVM-side (spark.range): a Python createDataFrame here
    # costs seconds of py4j/serialization warm-up for 10 rows
    bands = spark.range(10).select(
        F.col("id").cast(T.IntegerType()).alias("band_id"),
        (F.col("id") * 50_000.0).alias("lo"),
        ((F.col("id") + 1) * 50_000.0).alias("hi"),
    )
    joined = range_join_bucketed(
        orders.select("o_orderkey", "o_totalprice"), bands, "o_totalprice", "lo", "hi", 50_000.0
    )
    return (
        joined.groupBy("band_id")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("band_total"))
        .orderBy("band_id")
    )


SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def q_pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer counts pivoted nation × market segment (explicit value
    list → stable output schema)."""
    cust = _t(spark, sf_dir, "customer")
    out = (
        cust.groupBy("c_nationkey")
        .pivot("c_mktsegment", SEGMENTS)
        .agg(F.count(F.lit(1)))
        .orderBy("c_nationkey")
    )
    # pivot yields nullable counts; coalesce to 0 like the SQL oracle
    return out.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in SEGMENTS],
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical wide-agg OLAP
    pattern (2 keys, 8 aggregates, one shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE emulation: every 10th customer gets an account credit;
    result = anti-join survivors + replacement rows."""
    from geoestate_etl_spark.operators.merge import upsert

    cust = _t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    return upsert(cust, updates, ["c_custkey"]).select("c_custkey", "c_acctbal")


def q_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each order attached to the customer's
    order-count "version" active at its date. The versioned dim is
    built from orders themselves (valid_from = nth order date,
    valid_to = next order date), so the whole thing is deterministic
    and SQL-expressible for the oracle."""
    from pyspark.sql import Window

    from geoestate_etl_spark.operators.temporal import (
        temporal_join,
        temporal_join_bucketed,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    dim = orders.select(
        F.col("o_custkey").alias("c_key"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.row_number().over(w).cast(T.LongType()).alias("n_orders_so_far"),
    )
    facts = orders.select(
        "o_orderkey", F.col("o_custkey").alias("c_key"), "o_orderdate"
    )
    plain = temporal_join(facts, dim, "c_key", "o_orderdate").select(
        F.lit("plain").alias("variant"), "o_orderkey", "c_key", "n_orders_so_far"
    )
    # the orders-derived dim is genuinely many-versions-per-key (one
    # version per order); the bucketed variant must reproduce the
    # plain semantics EXACTLY — both ride in one tagged union so the
    # oracle hash certifies their agreement row-for-row
    bucketed = temporal_join_bucketed(
        facts, dim, "c_key", "o_orderdate", bucket_days=365
    ).select(
        F.lit("bucketed").alias("variant"), "o_orderkey", "c_key", "n_orders_so_far"
    )
    return plain.unionByName(bucketed)


def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The S8 capability: raw SQL through spark.sql over registered
    views (replaces the reference's external ClickHouse SQL path).
    Includes an uncorrelated scalar subquery — Catalyst plans it as a
    1-row subquery broadcast, certifying the subquery surface too
    (absorbed the former scalar_subquery entry, r2)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS cnt,
               round(avg(o_totalprice), 2) AS avg_price,
               round((SELECT avg(o_totalprice) FROM orders_v), 2) AS global_avg
        FROM orders_v
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


SPECS = [
    QuerySpec(
        "asof_last_purchase",
        q_asof_last_purchase,
        "WITH purchases AS ("
        "  SELECT user_id, ts, max(event_id) AS purchase_id FROM events "
        "  WHERE event_type = 'purchase' GROUP BY user_id, ts) "
        "SELECT e.event_id, e.user_id, p.purchase_id "
        "FROM events e ASOF LEFT JOIN purchases p "
        "ON e.user_id = p.user_id AND p.ts <= e.ts",
        "asof-join",
    ),
    QuerySpec(
        "range_join_bands",
        q_range_join_bands,
        "WITH bands AS (SELECT i AS band_id, i * 50000.0 AS lo, "
        "(i + 1) * 50000.0 AS hi FROM range(10) t(i)) "
        "SELECT band_id, count(*) AS cnt, round(sum(o_totalprice), 2) AS band_total "
        "FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi "
        "GROUP BY band_id ORDER BY band_id",
        "range-join",
    ),
    QuerySpec(
        "tpch_q1",
        q_tpch_q1,
        "SELECT l_returnflag, l_linestatus, "
        "sum(l_quantity) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
        "round(avg(l_quantity), 4) AS avg_qty, "
        "round(avg(l_extendedprice), 2) AS avg_price, "
        "round(avg(l_discount), 4) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus",
        "tpch-q1-wide-agg",
    ),
    QuerySpec(
        "upsert_customers",
        q_upsert_customers,
        "SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 "
        "THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal FROM customer",
        "merge-upsert",
    ),
    QuerySpec(
        "temporal_join",
        q_temporal_join,
        "WITH f AS (SELECT o_orderkey, o_custkey AS c_key, o_orderdate FROM orders), "
        "dim AS (SELECT o_custkey AS c_key, o_orderdate AS valid_from, "
        "lead(o_orderdate) OVER w AS valid_to, row_number() OVER w AS n_orders_so_far "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate ASC, o_orderkey ASC)), "
        "j AS (SELECT f.o_orderkey, f.c_key, d.n_orders_so_far FROM f "
        "LEFT JOIN dim d ON d.c_key = f.c_key "
        "AND d.valid_from <= f.o_orderdate "
        "AND (d.valid_to IS NULL OR f.o_orderdate < d.valid_to)) "
        "SELECT 'plain' AS variant, * FROM j "
        "UNION ALL SELECT 'bucketed' AS variant, * FROM j",
        "temporal-point-in-time-join",
    ),
    QuerySpec(
        "sql_api",
        q_sql_api,
        "SELECT o_orderstatus, count(*) AS cnt, round(avg(o_totalprice), 2) "
        "AS avg_price, round((SELECT avg(o_totalprice) FROM orders), 2) "
        "AS global_avg FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
        "S8-sql-api + scalar subquery (absorbed scalar_subquery, r2)",
    ),
]
