"""Catalog statistics + cost-based optimization (the S5 serving-table
tier's planning half): ANALYZE TABLE feeds row/column stats to the
catalog, and CBO uses filter selectivity over those stats to flip a
join strategy that file sizes alone would get wrong.

At 100 TB this is not a nicety: a dimension table too big to
broadcast RAW but tiny after a selective filter is the bread-and-
butter star-join shape, and only column stats let the planner see it
before runtime (AQE can rescue it at the first shuffle boundary, but
stats-informed planning never materializes that shuffle at all).
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


@pytest.fixture(scope="module")
def cbo_tables(spark):
    spark.sql("DROP TABLE IF EXISTS dim_cbo_t")
    spark.sql("DROP TABLE IF EXISTS fact_cbo_t")
    # dim: ~2.4 MB on disk (over the test's 256 KB broadcast budget),
    # but any single `cat` slice is 1% of it — the shape only column
    # stats can see
    spark.range(200_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("cat"),
        F.concat(F.lit("x" * 60), F.col("id")).alias("pad"),
    ).write.saveAsTable("dim_cbo_t")
    spark.range(1_000_000).select(
        (F.col("id") % 200_000).alias("k"), F.col("id").alias("v")
    ).write.saveAsTable("fact_cbo_t")
    yield
    spark.sql("DROP TABLE IF EXISTS dim_cbo_t")
    spark.sql("DROP TABLE IF EXISTS fact_cbo_t")


Q = "SELECT sum(f.v) AS s FROM fact_cbo_t f JOIN dim_cbo_t d ON f.k = d.k WHERE d.cat = 7"


def test_analyze_records_catalog_stats(spark, cbo_tables):
    spark.sql("ANALYZE TABLE dim_cbo_t COMPUTE STATISTICS FOR ALL COLUMNS")
    stats = (
        spark.sql("DESCRIBE TABLE EXTENDED dim_cbo_t")
        .filter("col_name = 'Statistics'")
        .first()["data_type"]
    )
    assert "200000 rows" in stats
    # column-level: ndv for the filter column is recorded
    cat = (
        spark.sql("DESCRIBE EXTENDED dim_cbo_t cat")
        .filter("info_name = 'distinct_count'")
        .first()
    )
    assert int(cat["info_value"]) >= 90  # approx ndv of 100


def test_cbo_selectivity_flips_join_to_broadcast(spark, cbo_tables):
    """Without stats the 2.4 MB dim forces a sort-merge under a
    256 KB broadcast budget; with column stats, CBO prices the 1%
    `cat` slice under the budget and plans the broadcast straight
    away. AQE disabled so the STATIC plan is what's asserted —
    exactly what a 1000-executor job gets before any runtime
    correction."""
    with _confs(
        spark,
        **{
            "spark__sql__cbo__enabled": "true",
            "spark__sql__adaptive__enabled": "false",
            "spark__sql__autoBroadcastJoinThreshold": str(256 * 1024),
        },
    ):
        # fresh-analyze both (module order independence)
        spark.sql("ANALYZE TABLE dim_cbo_t COMPUTE STATISTICS FOR ALL COLUMNS")
        spark.sql("ANALYZE TABLE fact_cbo_t COMPUTE STATISTICS")
        plan = spark.sql(Q)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan
        want = spark.sql(Q).first()["s"]

    # and the un-stats'd baseline really does sort-merge under the
    # same budget: prove the flip came from stats, not thresholds
    spark.sql("DROP TABLE IF EXISTS dim_cbo_nostat")
    spark.table("dim_cbo_t").write.saveAsTable("dim_cbo_nostat")
    try:
        with _confs(
            spark,
            **{
                "spark__sql__cbo__enabled": "true",
                "spark__sql__adaptive__enabled": "false",
                "spark__sql__autoBroadcastJoinThreshold": str(256 * 1024),
            },
        ):
            q2 = Q.replace("dim_cbo_t", "dim_cbo_nostat")
            plan2 = spark.sql(q2)._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan2, plan2
            assert spark.sql(q2).first()["s"] == want  # same answer either way
    finally:
        spark.sql("DROP TABLE IF EXISTS dim_cbo_nostat")
