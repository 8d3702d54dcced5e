"""JDBC serving sink/source (the reference's ClickHouse store,
``dags/main.py:381-437,489-502``): probe honesty for missing driver
jars, plus a LIVE roundtrip through the Derby embedded driver that
Spark bundles for its Hive metastore — the same code path a
ClickHouse jar would take, exercised for real in this container."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.sources.jdbc_sink import (
    CLICKHOUSE_DRIVER,
    JdbcDriverMissing,
    jdbc_driver_available,
    read_jdbc_table,
    write_jdbc_table,
    write_serving_table,
)

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/servingdb;create=true"


def test_probe_honesty(spark):
    """The ClickHouse driver is absent here and the probe must say so;
    Derby (bundled with Spark) must resolve. Every entry point raises
    the actionable error — never Spark's raw ClassNotFound stack."""
    assert not jdbc_driver_available(spark, CLICKHOUSE_DRIVER)
    assert not jdbc_driver_available(spark, "com.example.NoSuchDriver")
    assert jdbc_driver_available(spark, DERBY)

    df = spark.range(3)
    with pytest.raises(JdbcDriverMissing, match="clickhouse-jdbc"):
        write_jdbc_table(df, "jdbc:clickhouse://localhost:8123/x", "t")
    with pytest.raises(JdbcDriverMissing, match="--jars"):
        read_jdbc_table(spark, "jdbc:clickhouse://localhost:8123/x", "t")
    # explicit jdbc_url + missing driver must raise, NOT silently fall
    # back to parquet (the data would be invisible to serving queries)
    with pytest.raises(JdbcDriverMissing):
        write_serving_table(
            df, "id", jdbc_url="jdbc:clickhouse://localhost:8123/x", table="t"
        )


def test_jdbc_roundtrip_live(spark, tmp_path):
    """The branch that goes live when a driver jar ships — and Derby
    ships, so it runs HERE: executor-parallel batched INSERT, then a
    partition-split parallel read back, values exact."""
    url = _derby_url(tmp_path)
    df = spark.range(0, 1000).select(
        F.col("id").alias("house_id"),
        (F.col("id") % 7).cast("int").alias("rooms"),
        (F.col("id") * 10 + 5).cast("double").alias("price"),
    )
    write_jdbc_table(
        df, url, "houses", driver=DERBY, mode="overwrite", batchsize=200
    )
    back = read_jdbc_table(
        spark,
        url,
        "houses",
        driver=DERBY,
        partition_column="house_id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4  # the parallel-scan split
    assert back.count() == 1000
    got = back.agg(
        F.sum("house_id").alias("s"),
        F.sum("rooms").alias("r"),
        F.max("price").alias("p"),
    ).first()
    assert (got.s, got.r, got.p) == (499500, sum(i % 7 for i in range(1000)), 9995.0)


def test_jdbc_truncate_before_load_and_subquery_read(spark, tmp_path):
    """S6 twin: overwrite+truncate keeps the DDL and replaces the rows
    (retry == no dup rows); S8 twin: a pushed-down subquery read."""
    url = _derby_url(tmp_path)
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("int").alias("g")
    )
    write_jdbc_table(df, url, "t6", driver=DERBY, mode="overwrite")
    # reload the SAME rows with truncate: count must stay 100, not 200
    write_jdbc_table(
        df, url, "t6", driver=DERBY, mode="overwrite", truncate=True
    )
    sub = read_jdbc_table(
        spark,
        url,
        # Spark writes quoted (case-exact) identifiers; quote them back
        '(SELECT "g", COUNT(*) AS "n" FROM t6 GROUP BY "g") q',
        driver=DERBY,
    )
    rows = {(r.g, r.n) for r in sub.collect()}
    assert rows == {(0, 34), (1, 33), (2, 33)}


def test_jdbc_read_pushes_filters_down(spark, tmp_path):
    """Catalyst JDBC pushdown: a .filter on the returned frame becomes
    a remote WHERE (visible as PushedFilters in the scan), not a
    full-table pull filtered Spark-side."""
    url = _derby_url(tmp_path)
    spark.range(0, 50).select(F.col("id").alias("k")).write.format(
        "jdbc"
    ).mode("overwrite").option("url", url).option("dbtable", "tp").option(
        "driver", DERBY
    ).save()
    got = read_jdbc_table(spark, url, "tp", driver=DERBY).filter(F.col("k") < 10)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan" in plan
    assert got.count() == 10


def test_write_serving_table_fallback_parquet(spark, tmp_path):
    """Unconfigured environment (no jdbc_url): the serving write lands
    the sorted-parquet emulation and reports which sink ran."""
    df = spark.range(0, 64).select(
        F.col("id").alias("house_id"), (F.col("id") % 5).alias("rooms")
    )
    path = str(tmp_path / "serving")
    sink = write_serving_table(df, "house_id", path=path)
    assert sink == "parquet"
    assert spark.read.parquet(path).count() == 64

    # configured + live driver: same call shape goes to the database
    url = _derby_url(tmp_path)
    sink = write_serving_table(
        df, "house_id", jdbc_url=url, table="hs", driver=DERBY,
        mode="overwrite",
    )
    assert sink == "jdbc"
    assert read_jdbc_table(spark, url, "hs", driver=DERBY).count() == 64


def test_pipeline_serves_to_jdbc_end_to_end(spark, tmp_path):
    """The full reference pipeline (dirty CSV → validate → cast →
    serve) landing in a REAL database — the reference's ClickHouse
    load path (dags/main.py:381-437) run end-to-end through Derby."""
    from geoestate_etl_spark.plans.pipeline import run_pipeline
    from tests.houses_fixture import generate

    fixture = generate(str(tmp_path / "houses.csv"), n_rows=400, seed=7)
    url = _derby_url(tmp_path)
    res = run_pipeline(
        spark, fixture.path, jdbc_url=url, jdbc_table="houses_srv",
        jdbc_driver=DERBY,
    )
    served = read_jdbc_table(spark, url, "houses_srv", driver=DERBY)
    assert served.count() == res.clean.count() > 0
    # MergeTree-ish serving query straight off the store (S8 shape)
    top = served.orderBy(F.desc("square")).limit(1).first()
    ref = res.clean.orderBy(F.desc("square")).limit(1).first()
    assert top.square == ref.square
