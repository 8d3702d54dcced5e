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
    QuerySpec(
        "stats_aggs",
        q_stats_aggs,
        "SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty, "
        "round(var_samp(l_quantity), 4) AS var_qty, "
        "round(corr(l_quantity, l_extendedprice), 4) AS corr_qp, "
        "round(covar_samp(l_quantity, l_discount), 4) AS covar_qd "
        "FROM lineitem GROUP BY l_returnflag",
        "agg-statistics",
    ),
    QuerySpec(
        "minby_maxby",
        q_minby_maxby,
        "WITH r AS (SELECT o_orderstatus, o_orderkey, "
        "row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax, "
        "row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin FROM orders) "
        "SELECT o_orderstatus, "
        "max(CASE WHEN rmax = 1 THEN o_orderkey END) AS max_price_key, "
        "max(CASE WHEN rmin = 1 THEN o_orderkey END) AS min_price_key "
        "FROM r GROUP BY o_orderstatus",
        "agg-argminmax",
    ),
    QuerySpec(
        "collect_sorted",
        q_collect_sorted,
        "SELECT n_regionkey, list_sort(list(n_name)) AS nations "
        "FROM nation GROUP BY n_regionkey",
        "agg-collect",
    ),
    QuerySpec(
        "bool_bit_aggs",
        q_bool_bit_aggs,
        "SELECT l_linestatus, bool_and(l_quantity > 0) AS all_positive, "
        "bool_or(l_discount > 0.09) AS any_high_disc, "
        "bit_and(l_linenumber) AS band, bit_or(l_linenumber) AS bor "
        "FROM lineitem GROUP BY l_linestatus",
        "agg-bool-bit",
    ),
    QuerySpec(
        "top3_per_group",
        q_top3_per_group,
        "SELECT o_orderstatus, o_orderkey, o_totalprice FROM ("
        "SELECT o_orderstatus, o_orderkey, o_totalprice, row_number() OVER ("
        "PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC"
        ") AS rn FROM orders) WHERE rn <= 3",
        "topk-per-group",
    ),
    QuerySpec(
        "grouping_sets",
        q_grouping_sets,
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())",
        "grouping-sets",
    ),
    QuerySpec(
        "date_funcs",
        q_date_funcs,
        "SELECT o_orderkey, "
        "datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k, "
        "CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_q, "
        "last_day(CAST(o_orderdate AS DATE)) AS month_end, "
        "CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start, "
        "dayofweek(o_orderdate) + 1 AS dow, "
        "weekofyear(o_orderdate) AS woy "
        "FROM orders",
        "fn-dates",
    ),
    QuerySpec(
        "array_funcs",
        q_array_funcs,
        "SELECT vec_id, len(embedding) AS dim, "
        "round(CAST(embedding[1] AS DOUBLE), 4) AS first_el, "
        "round(CAST(list_max(embedding) AS DOUBLE), 4) AS mx, "
        "round(CAST(list_min(embedding) AS DOUBLE), 4) AS mn, "
        "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS total, "
        "len(list_filter(embedding, x -> x > 0)) AS n_pos "
        "FROM embeddings WHERE vec_id < 50",
        "fn-arrays",
    ),
    QuerySpec(
        "map_funcs",
        q_map_funcs,
        "SELECT n_nationkey, 2 AS m_size, n_name AS m_name, "
        "['key', 'name'] AS m_keys FROM nation",
        "fn-maps",
    ),
    QuerySpec(
        "regexp_extract",
        q_regexp_extract,
        "SELECT c_custkey, regexp_extract(c_name, '#(\\d+)', 1) AS name_num, "
        "len(regexp_extract_all(c_name, '\\d')) AS n_digits FROM customer",
        "fn-regexp-extract",
    ),
]
