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
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        joined.groupBy("band_id")
        .agg(F.count("*").alias("cnt"), F.sum(cents).alias("band_cents"))
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
    # money columns travel as scaled BIGINTs (cents / 1e-4 / 1e-6
    # units — each per-row value is an exact decimal rational at that
    # scale), averages as round-to-integer of the scaled mean: both
    # formulations are cross-engine hash-stable, unlike round(agg, k)
    agged = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_cents"
            ),
            F.sum(F.round(disc_price * 10_000).cast("long")).alias("sum_disc_e4"),
            F.sum(F.round(charge * 1_000_000).cast("long")).alias("sum_charge_e6"),
            F.sum(F.round(F.col("l_discount") * 10_000).cast("long")).alias("_disc_e4"),
            F.count("*").alias("count_order"),
        )
    )
    # averages derive from the EXACT integer sums (double(S)/double(n)
    # is the same computation on both engines; a raw double-sum mean
    # can differ in ulps at the .5 rounding boundary)
    n = F.col("count_order")
    return agged.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_cents",
        "sum_disc_e4",
        "sum_charge_e6",
        F.round(F.col("sum_qty") * 10_000 / n).cast("long").alias("avg_qty_e4"),
        F.round(F.col("sum_base_cents") / n).cast("long").alias("avg_price_cents"),
        F.round(F.col("_disc_e4") / n).cast("long").alias("avg_disc_e4"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


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
    # integer-cents means from exact cents sums (r3 float discipline)
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS cnt,
               CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*))
                    AS BIGINT) AS avg_cents,
               (SELECT CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                                  / count(*)) AS BIGINT)
                FROM orders_v) AS global_avg_cents
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
        "SELECT band_id, count(*) AS cnt, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS band_cents "
        "FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi "
        "GROUP BY band_id ORDER BY band_id",
        "range-join",
    ),
    QuerySpec(
        "tpch_q1",
        q_tpch_q1,
        "WITH a AS (SELECT l_returnflag, l_linestatus, "
        "sum(l_quantity) AS sum_qty, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) "
        "AS BIGINT) AS sum_disc_e4, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) "
        "AS BIGINT)) AS BIGINT) AS sum_charge_e6, "
        "sum(CAST(round(l_discount * 10000) AS BIGINT)) AS disc_e4, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus) "
        "SELECT l_returnflag, l_linestatus, sum_qty, sum_base_cents, "
        "sum_disc_e4, sum_charge_e6, "
        "CAST(round(sum_qty * 10000 / count_order) AS BIGINT) AS avg_qty_e4, "
        "CAST(round(sum_base_cents / count_order) AS BIGINT) AS avg_price_cents, "
        "CAST(round(disc_e4 / count_order) AS BIGINT) AS avg_disc_e4, "
        "count_order FROM a "
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
        "SELECT o_orderstatus, count(*) AS cnt, "
        "CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*)) "
        "AS BIGINT) AS avg_cents, "
        "(SELECT CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
        "/ count(*)) AS BIGINT) FROM orders) AS global_avg_cents "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
        "S8-sql-api + scalar subquery (absorbed scalar_subquery, r2)",
    ),
]
