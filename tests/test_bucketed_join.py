"""Bucketing: pre-shuffling a table by join key at write time so later
joins co-locate without any Exchange — the strongest shuffle-removal
tool for repeated fact⋈fact joins at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "li"))
            .saveAsTable("li_bucketed")
        )
        (
            orders.withColumnRenamed("o_orderkey", "l_orderkey")
            .write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "ord"))
            .saveAsTable("ord_bucketed")
        )
        a = spark.table("li_bucketed")
        b = spark.table("ord_bucketed")
        # merge hint: at this toy size Spark would broadcast instead,
        # hiding the property under test (bucket co-location)
        joined = a.hint("merge").join(b, "l_orderkey").groupBy("o_orderpriority").agg(
            F.sum("l_quantity").alias("q")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no Exchange below the join
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") <= 1  # only the final groupBy exchange
        # and it is still correct
        total = joined.agg(F.sum("q")).collect()[0][0]
        direct = (
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .agg(F.sum("l_quantity"))
            .collect()[0][0]
        )
        assert total == direct
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")
