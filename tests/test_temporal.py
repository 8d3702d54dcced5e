"""Temporal point-in-time join: plain vs bucketed equivalence on a
constructed high-version-count dimension, including every boundary
the bucketing could get wrong (open intervals, bucket-edge facts,
versions past the horizon, keys absent from the dim)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.operators.temporal import (
    temporal_join,
    temporal_join_bucketed,
)


def d(s):
    return datetime.date.fromisoformat(s)


DIM_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("valid_from", T.DateType()),
        T.StructField("valid_to", T.DateType()),
        T.StructField("v", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def many_version_dim(spark):
    # key 1: 120 one-day versions (hot key) + an open-ended tail;
    # key 2: one long-lived version spanning many buckets;
    # key 3: version starting after every fact (unmatchable)
    rows = [
        (1, d("2020-01-01") + datetime.timedelta(days=i),
         d("2020-01-01") + datetime.timedelta(days=i + 1), f"v{i}")
        for i in range(120)
    ]
    rows.append((1, d("2020-05-01"), None, "open"))
    rows.append((2, d("2019-06-15"), d("2021-02-01"), "long"))
    rows.append((3, d("2030-01-01"), None, "future"))
    return spark.createDataFrame(rows, DIM_SCHEMA)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        (100, 1, d("2020-01-01")),   # exactly at a valid_from
        (101, 1, d("2020-02-15")),   # mid one-day-version run
        (102, 1, d("2020-04-30")),   # in the gap: last closed version
                                     # ends Apr 30 EXCLUSIVE, open one
                                     # starts May 1 -> no match
        (103, 1, d("2020-07-04")),   # inside the open-ended version
        (104, 1, d("2019-12-31")),   # before the key's first version
        (105, 2, d("2020-01-01")),   # long version, bucket boundary day
        (106, 2, d("2021-01-31")),   # last day of the long version
        (107, 2, d("2021-02-01")),   # exactly at valid_to -> no match
        (108, 3, d("2020-06-01")),   # only a future version exists
        (109, 9, d("2020-06-01")),   # key absent from dim
    ]
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("fid", T.LongType()),
                T.StructField("k", T.LongType()),
                T.StructField("ts", T.DateType()),
            ]
        ),
    )


def _collect(df):
    return sorted(
        (r.fid, r.v, r.valid_from, r.valid_to)
        for r in df.select("fid", "v", "valid_from", "valid_to").collect()
    )


@pytest.mark.parametrize("bucket_days", [7, 30, 365])
def test_bucketed_equals_plain_every_bucket_size(
    spark, many_version_dim, facts, bucket_days
):
    plain = _collect(temporal_join(facts, many_version_dim, "k", "ts"))
    bucketed = _collect(
        temporal_join_bucketed(
            facts, many_version_dim, "k", "ts", bucket_days=bucket_days
        )
    )
    assert bucketed == plain
    # sanity on the semantics themselves
    by_fid = {t[0]: t[1] for t in plain}
    assert by_fid[100] == "v0" and by_fid[101] == "v45"
    assert by_fid[103] == "open" and by_fid[104] is None
    assert by_fid[106] == "long" and by_fid[107] is None
    assert by_fid[108] is None and by_fid[109] is None


def test_bucketed_inner_join_matches_plain(spark, many_version_dim, facts):
    a = _collect(temporal_join(facts, many_version_dim, "k", "ts", how="inner"))
    b = _collect(
        temporal_join_bucketed(
            facts, many_version_dim, "k", "ts", how="inner", bucket_days=30
        )
    )
    # no-match facts drop: 104 (pre-history), 107 (exactly at valid_to),
    # 108/109 (future-only / absent key), and 102 (2020-04-30 falls in
    # the [Apr30, May1) gap between the last closed version and the
    # open one — [from, to) semantics)
    assert a == b and len(a) == 5


def test_bucketed_join_group_is_bounded(spark, many_version_dim, facts):
    """The point of bucketing: a fact's equi-join group holds only the
    versions overlapping its bucket, not all versions of the key."""
    from geoestate_etl_spark.operators.temporal import temporal_join_bucketed as tb

    # reproduce the exploded dim side at bucket_days=30 and check the
    # hot key's max bucket population is far below its version count
    epoch = F.lit("1970-01-01").cast(T.DateType())
    horizon = facts.agg(F.max("ts").alias("_h"))
    exp = (
        many_version_dim.crossJoin(F.broadcast(horizon))
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.datediff("valid_from", epoch) / 30),
                    F.greatest(
                        F.floor(
                            F.datediff(
                                F.least(F.coalesce("valid_to", F.col("_h")), F.col("_h")),
                                epoch,
                            )
                            / 30
                        ),
                        F.floor(F.datediff("valid_from", epoch) / 30),
                    ),
                )
            ),
        )
    )
    biggest = (
        exp.filter(F.col("k") == 1)
        .groupBy("_bucket")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    n_versions = many_version_dim.filter(F.col("k") == 1).count()
    assert n_versions == 121
    assert biggest <= 32  # ~30 one-day versions + boundary spill + open tail
