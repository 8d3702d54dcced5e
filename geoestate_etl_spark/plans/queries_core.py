"""Core relational queries: scans, filter/project, aggregates, top-k,
windows, casts, cleaning — the reference's §2 operator surface mapped
onto the driver testdata (SURVEY §7.3).

Every ``fn`` builds a declarative DataFrame plan (Catalyst handles
pushdown/pruning); every oracle is the equivalent DuckDB SQL with
matching column names and rounding.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.operators import aggregates as agg
from geoestate_etl_spark.operators import topk
from geoestate_etl_spark.operators import windows as win
from geoestate_etl_spark.operators.transforms import decade_of, year_string_to_iso
from geoestate_etl_spark.plans.registry import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- S1-S4: scan + count ---------------------------------------------------


def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


# --- P1/P3/P7: projection + pushdown filter --------------------------------


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + 4-column projection; predicate and column pruning both
    reach the parquet scan (verify via .explain → PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


# --- T3: the reference's signature filtered top-k (dags/main.py:489-495) ---


def q_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return topk.filtered_top_k(
        orders,
        F.col("o_totalprice") > 100.0,
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        25,
        projection=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"],
    )


# --- A3/T1: top-10 groups by count (dags/main.py:319-331) ------------------


def q_top_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.top_k_by_count(_t(spark, sf_dir, "orders"), ["o_orderpriority"], 10)


def q_top_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.top_k_by_count(_t(spark, sf_dir, "customer"), ["c_mktsegment"], 10)


# --- A4: per-group min/max (dags/main.py:349-352) --------------------------


def q_minmax_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.group_min_max(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        "l_extendedprice",
        "max_price",
        "min_price",
    )


# --- A1/A2: global mean + median (dags/main.py:298-306) --------------------


def q_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.global_mean(_t(spark, sf_dir, "orders"), "o_totalprice", "avg_price", 2)


def q_global_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.global_median(_t(spark, sf_dir, "orders"), "o_totalprice", "median_price")


def q_median_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful percentile_approx sketch (A2) — rows-only check."""
    return agg.global_median_approx(
        _t(spark, sf_dir, "orders"), "o_totalprice", "median_price_approx"
    )


# --- A5/F10: decade histogram (dags/main.py:366-370) -----------------------


def q_decade_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return agg.histogram_by_bucket(
        orders, decade_of("o_orderdate"), "decade", "cnt"
    ).orderBy("decade")


# --- W1: global renumbering, faithful + scalable ---------------------------


def q_row_number_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "orders").select("o_orderkey")
    out = win.renumber_global(df, "o_orderkey", "rn")
    return out.withColumn("rn", F.col("rn").cast(T.LongType()))


def q_renumber_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same 1..N output as q_row_number_global, no single-task sort."""
    df = _t(spark, sf_dir, "orders").select("o_orderkey")
    return win.renumber_scalable(df, "o_orderkey", "rn")


# --- rank/analytic window family -------------------------------------------


def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    out = win.rank_features(
        cust,
        ["c_nationkey"],
        [F.desc("c_acctbal"), F.asc("c_custkey")],
        "c_acctbal",
    )
    # long-typed ranks + rounded running sum so types/values match the oracle
    return out.select(
        "c_nationkey",
        "c_acctbal",
        F.col("rn").cast(T.LongType()).alias("rn"),
        F.col("rnk").cast(T.LongType()).alias("rnk"),
        F.col("dense_rnk").cast(T.LongType()).alias("dense_rnk"),
        "prev_value",
        "next_value",
        F.round("running_sum", 2).alias("running_sum"),
    )


# --- F7-F9/F11-F13: cast / round / make_date / when projection suite -------


def q_cast_round_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast(T.LongType()).alias("price_int"),
        F.round("o_totalprice", 1).alias("price_round"),
        F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)).alias("year_start"),
        F.when(F.col("o_totalprice") > 150000.0, F.lit("big"))
        .otherwise(F.lit("small"))
        .alias("size_class"),
    )


# --- P8/F4-F6: conditional date build from string parts --------------------


def q_date_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    ystr = F.year("o_orderdate").cast(T.StringType())
    return orders.select(
        "o_orderkey",
        year_string_to_iso(ystr).alias("year_date"),
    )


# --- F1-F3: trim / regexp_replace / rlike on documents ---------------------


def q_cleaning_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.trim(F.col("text")).substr(1, 20).alias("head"),
        F.regexp_replace(F.col("text"), "[aeiou]", "").substr(1, 20).alias("novowel"),
        F.col("text").rlike("table").alias("has_table"),
    )


# --- set ops + distinct -----------------------------------------------------


def q_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.union(supp).distinct()


def q_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.intersect(supp)


def q_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.subtract(supp)  # EXCEPT DISTINCT semantics


def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# --- rollup (grouping-sets capability) -------------------------------------


def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("cnt"), F.sum("l_quantity").alias("sum_qty"))
    )


# NOTE (round 2): micro-queries that shared a surface were merged into
# plans/queries_suites.py so the whole registry fits the driver's
# 50-entry CORRECTNESS window (VERDICT r1 #1). The q_* functions above
# stay — suites and tests reuse them. Registry entries from this
# module: the five below; merged elsewhere: scan_count/global_mean/
# global_median -> global_aggs, top_* -> top_groups, renumber pair ->
# renumber_parity, rank_family -> window_rank_suite, cast_round/
# date_build -> orders_scalar_suite, set ops -> set_ops_suite,
# rollup -> grouping_suite, median_approx -> approx_sketches.
SPECS = [
    QuerySpec(
        "filter_project",
        q_filter_project,
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
        "FROM lineitem WHERE l_quantity > 30",
        "P1,P3,P7",
    ),
    QuerySpec(
        "filtered_topk",
        q_filtered_topk,
        "SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders "
        "WHERE o_totalprice > 100.0 "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25",
        "T3,S8",
    ),
    QuerySpec(
        "minmax_by_group",
        q_minmax_by_group,
        "SELECT l_returnflag, max(l_extendedprice) AS max_price, "
        "min(l_extendedprice) AS min_price FROM lineitem GROUP BY l_returnflag",
        "A4,T2",
    ),
    QuerySpec(
        "decade_histogram",
        q_decade_histogram,
        "SELECT CAST(floor(EXTRACT(year FROM o_orderdate) / 10) * 10 AS INTEGER) "
        "AS decade, count(*) AS cnt FROM orders GROUP BY decade ORDER BY decade",
        "A5,F10,F8",
    ),
    QuerySpec(
        "cleaning_normalize",
        q_cleaning_normalize,
        "SELECT doc_id, substr(trim(text), 1, 20) AS head, "
        "substr(regexp_replace(text, '[aeiou]', '', 'g'), 1, 20) AS novowel, "
        "regexp_matches(text, 'table') AS has_table FROM documents",
        "F1-F3,P4,P6",
    ),
]
