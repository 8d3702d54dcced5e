"""Snapshot diff (operators/diff.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.diff import schema_diff, table_diff


def test_table_diff_classifies_churn_only(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (None, "x", 0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10),            # unchanged -> absent from the diff
         (2, "b", 99),            # changed
         (4, "d", 40),            # added
         (None, "y", 0)],         # null key
        ["k", "s", "v"],
    )
    got = {(r.k, r.change) for r in table_diff(old, new, ["k"]).collect()}
    assert got == {
        (2, "changed"), (3, "removed"), (4, "added"),
        (None, "null_key_old"), (None, "null_key_new"),
    }


def test_null_to_value_counts_as_change_both_ways(spark):
    schema = "k long, x string, y string"
    old = spark.createDataFrame([(1, None, "a"), (2, "a", None)], schema)
    new = spark.createDataFrame([(1, "a", None), (2, "a", None)], schema)
    got = {(r.k, r.change) for r in table_diff(old, new, ["k"]).collect()}
    assert got == {(1, "changed")}  # (NULL,"a") vs ("a",NULL) differ; row 2 equal


def test_identical_snapshots_empty_diff(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    assert table_diff(df, df, ["k"]).count() == 0


def test_compare_cols_scopes_the_comparison(spark):
    old = spark.createDataFrame([(1, "a", 1)], ["k", "s", "noise"])
    new = spark.createDataFrame([(1, "a", 2)], ["k", "s", "noise"])
    assert table_diff(old, new, ["k"]).count() == 1
    assert table_diff(old, new, ["k"], compare_cols=["s"]).count() == 0


def test_schema_diff_metadata_only(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], ["k", "gone", "retype"])
    new = spark.createDataFrame([(1, 1, "x")], ["k", "retype", "fresh"])
    got = {d["column"]: d["change"] for d in schema_diff(old, new)}
    assert got == {"gone": "removed", "retype": "retyped", "fresh": "added"}
