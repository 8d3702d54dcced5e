"""Runtime AQE evidence: the README/SURVEY claim 'AQE re-plans at
runtime (skew-join splitting, sort-merge -> broadcast downgrade)' is
asserted here against EXECUTED plans, not static ones — AQE decisions
only exist after the first stages run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _final_plan(df) -> str:
    # collect() executes THIS DataFrame's QueryExecution (a .write
    # would spawn a fresh one), so executedPlan afterwards shows the
    # AQE final plan with isFinalPlan=true
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def aqe_tuned(spark):
    """Shrink AQE thresholds so toy data triggers the same decisions
    100 TB would; restore afterwards."""
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "1MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force static SMJ
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(aqe_tuned):
    spark = aqe_tuned
    # key 0 holds ~80% of the fact side: one reducer partition far
    # beyond the (shrunk) skew threshold. NOTE: no groupBy downstream —
    # AQE declines to split skewed partitions when a later stage
    # requires the join's hash distribution (splitting would break it);
    # that case needs the explicit salted_skew_join instead, which is
    # exactly why both exist.
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 5 != 0, 0).otherwise(F.col("id")).alias("key"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(0, 50_000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("dval")
    )
    plan = _final_plan(fact.join(dim, "key"))
    assert "isFinalPlan=true" in plan
    # AQE marks the split join itself and its shuffle reads
    assert "skew=true" in plan, plan
    assert "skewed" in plan, plan  # AQEShuffleRead ... skewed


def test_aqe_downgrades_smj_to_broadcast(aqe_tuned):
    spark = aqe_tuned
    big = spark.range(0, 100_000).select(F.col("id").alias("key"))
    small = spark.range(0, 200).select(
        F.col("id").alias("key"), (F.col("id") + 1).alias("v")
    )
    joined = big.join(small, "key")
    # static plan (broadcast disabled): a sort-merge join
    static = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in static or "AdaptiveSparkPlan" in static
    plan = _final_plan(joined)
    assert "isFinalPlan=true" in plan
    # at runtime AQE sees the 200-row side's true size and broadcasts
    assert "BroadcastHashJoin" in plan, plan


def test_runtime_bloom_filter_injected_for_selective_join(spark):
    """With a selective filter on one join side, Spark injects a
    runtime Bloom filter (`might_contain`) on the probe side — at
    100 TB this prunes most of the fact scan's rows before the shuffle.
    Pinned here because the session factory leaves the feature on and
    a conf regression would silently drop it."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    )
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # force a shuffle join and drop the probe-side size floor so
        # toy data qualifies (at real scale the defaults qualify)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").filter(
            F.col("o_totalprice") > 400_000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
