"""Format-generic columnar IO: ORC must carry the same content,
partitioning, and pushdown behavior as parquet (no new deps — both
ship with Spark)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.sources.columnar import (
    read_columnar,
    write_columnar,
    write_sorted,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet")


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_roundtrip_content_identical(spark, tmp_path, orders, fmt):
    p = str(tmp_path / f"orders_{fmt}")
    write_columnar(orders, p, fmt=fmt)
    back = read_columnar(spark, p, fmt=fmt)
    assert sorted(map(str, orders.collect())) == sorted(map(str, back.collect()))


def test_partitioned_orc_prunes_directories(spark, tmp_path, orders):
    p = str(tmp_path / "orders_part_orc")
    write_columnar(orders, p, fmt="orc", partition_by=["o_orderstatus"])
    back = read_columnar(spark, p, fmt="orc").filter(F.col("o_orderstatus") == "O")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the status predicate is a PartitionFilter,
    # not a post-scan filter over all directories
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == orders.filter("o_orderstatus = 'O'").count()


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path, orders):
    p = str(tmp_path / "orders_orc")
    write_columnar(orders, p, fmt="orc")
    df = read_columnar(spark, p, fmt="orc").filter(F.col("o_orderkey") < 100).select(
        "o_orderkey"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(o_orderkey,100)" in plan


def test_write_sorted_orc_matches_parquet(spark, tmp_path, orders):
    po = str(tmp_path / "sorted_orc")
    pp = str(tmp_path / "sorted_parquet")
    write_sorted(orders, po, "o_orderkey", fmt="orc")
    write_sorted(orders, pp, "o_orderkey", fmt="parquet")
    a = sorted(map(str, read_columnar(spark, po, "orc").collect()))
    b = sorted(map(str, read_columnar(spark, pp, "parquet").collect()))
    assert a == b


def test_unknown_format_rejected(spark, orders, tmp_path):
    with pytest.raises(ValueError, match="unsupported columnar format"):
        write_columnar(orders, str(tmp_path / "x"), fmt="avro")
