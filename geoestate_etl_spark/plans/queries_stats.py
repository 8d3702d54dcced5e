"""Statistical aggregates + ordered-collection surface.

Variance-family results are rounded to 4 dp in both engines (both use
numerically stable one-pass updates; agreement at 4 dp over this data
is verified empirically by the oracle gate). collect_list is made
deterministic by sorting the collected array.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoestate_etl_spark.plans.registry import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def q_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qd"),
    )


def q_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-valued argmin/argmax per group (unique extremum guaranteed
    by tie-breaking on the key inside a struct)."""
    o = _t(spark, sf_dir, "orders")
    # struct compare: price first, orderkey tiebreak -> deterministic
    return o.groupBy("o_orderstatus").agg(
        F.max(F.struct("o_totalprice", "o_orderkey")).getField("o_orderkey").alias("max_price_key"),
        F.min(F.struct("o_totalprice", "o_orderkey")).getField("o_orderkey").alias("min_price_key"),
    )


def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_list("n_name")).alias("nations")
    )


def q_bool_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_high_disc"),
        F.bit_and(F.col("l_linenumber")).alias("band"),
        F.bit_or(F.col("l_linenumber")).alias("bor"),
    )


def q_top3_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (window + rank filter): 3 priciest orders per
    status — the canonical 'top sellers per category' shape."""
    from geoestate_etl_spark.operators.topk import top_k_per_group

    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_totalprice"
    )
    return top_k_per_group(
        o, ["o_orderstatus"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL (finer than rollup/cube)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.add_months(d, 3).alias("plus_q"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").cast("long").alias("woy"),
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    arr = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(arr).cast("long").alias("dim"),
        # widen float32 -> double BEFORE rounding: F.round on FloatType
        # rounds in float32, which disagrees with a double-precision oracle
        F.round(F.element_at(arr, 1).cast("double"), 4).alias("first_el"),
        F.round(F.array_max(arr).cast("double"), 4).alias("mx"),
        F.round(F.array_min(arr).cast("double"), 4).alias("mn"),
        F.round(
            F.aggregate(arr, F.lit(0.0), lambda a, x: a + x.cast("double")), 4
        ).alias("total"),
        F.size(F.filter(arr, lambda x: x > 0)).cast("long").alias("n_pos"),
    )


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map column surface: build from entries, extract, size."""
    n = _t(spark, sf_dir, "nation")
    m = F.create_map(F.lit("key"), F.col("n_nationkey").cast("string"),
                     F.lit("name"), F.col("n_name"))
    return n.select(
        "n_nationkey",
        F.size(m).cast("long").alias("m_size"),
        m.getItem("name").alias("m_name"),
        F.sort_array(F.map_keys(m)).alias("m_keys"),
    )


def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"#(\d+)", 1).alias("name_num"),
        F.regexp_count("c_name", F.lit(r"\d")).cast("long").alias("n_digits"),
    )


SPECS = [
]
