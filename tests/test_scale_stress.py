"""Scale smoke tests on generated (in-memory-plan) data, ~10M rows:
the operators with bespoke distributed formulations must stay exact
when the data no longer fits one task comfortably.

These are the local[32] stand-ins for cluster-scale behavior: range
shuffle + offsets for renumbering, two-phase salted aggregation, and
the LSH self-join staying linear-ish (bounded output on unique data).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.operators.skew import salted_group_count
from geoestate_etl_spark.operators.windows import renumber_scalable

N = 10_000_000


@pytest.fixture(scope="module")
def big(spark):
    # skewed keys: key 0 holds ~half the rows (hot-key regime)
    return spark.range(N).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.col("id") % 1000)
        .alias("key"),
    )


def test_renumber_scalable_10m(spark, big):
    out = renumber_scalable(big.select("id"), "id", "rn")
    stats = out.agg(
        F.count("*").alias("n"),
        F.min("rn").alias("mn"),
        F.max("rn").alias("mx"),
        F.sum(F.when(F.col("rn") == F.col("id") + 1, 0).otherwise(1)).alias("bad"),
    ).collect()[0]
    # ids are 0..N-1 so dense renumber by id must be exactly id+1
    assert (stats.n, stats.mn, stats.mx, stats.bad) == (N, 1, N, 0)


def test_salted_count_matches_direct_10m(spark, big):
    direct = {r.key: r.cnt for r in big.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    salted = {r.key: r.cnt for r in salted_group_count(big, ["key"], 32).collect()}
    assert salted == direct
    assert direct[0] == N // 2  # the hot key really is hot
