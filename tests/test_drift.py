"""Distribution drift detection (operators/drift.py): PSI behavior on
identical, shifted, and degenerate snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.drift import drift_report, numeric_edges


def _snap(spark, n=10_000, shift=0.0, null_frac=0.0, lang_weights=(8, 1, 1)):
    a, b, c = lang_weights
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 1000 / 100.0 + shift).alias("x"),
        F.when(F.col("id") % 100 < 100 * null_frac, None)
        .otherwise(F.col("id") % 7)
        .alias("y"),
        F.when(F.col("id") % (a + b + c) < a, "en")
        .when(F.col("id") % (a + b + c) < a + b, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    return df


def test_identical_snapshots_report_no_drift(spark):
    ref, cur = _snap(spark), _snap(spark)
    rep = drift_report(ref, cur)
    assert set(rep) == {"id", "x", "y", "lang"}
    for c, r in rep.items():
        assert r["psi"] < 0.01, c
        assert r["ref_rows"] == r["cur_rows"] == 10_000


def test_mean_shift_flags_numeric_column_only(spark):
    rep = drift_report(_snap(spark), _snap(spark, shift=4.0))
    assert rep["x"]["psi"] > 0.25          # strong drift
    assert rep["lang"]["psi"] < 0.01       # untouched columns stay quiet
    assert rep["id"]["psi"] < 0.01


def test_sudden_nulls_are_drift(spark):
    rep = drift_report(_snap(spark), _snap(spark, null_frac=0.5))
    assert rep["y"]["psi"] > 0.25  # NULL bin catches the outage


def test_category_mix_shift(spark):
    rep = drift_report(
        _snap(spark), _snap(spark, lang_weights=(1, 8, 1))
    )
    assert rep["lang"]["psi"] > 0.25
    assert rep["x"]["psi"] < 0.01


def test_unseen_category_folds_into_other(spark):
    ref = _snap(spark)
    cur = _snap(spark).withColumn(
        "lang", F.when(F.col("id") % 2 == 0, "zz").otherwise(F.col("lang"))
    )
    rep = drift_report(ref, cur, numeric_cols=[], categorical_cols=["lang"])
    assert rep["lang"]["psi"] > 0.25  # zz lands in __other__, still visible
    assert rep["lang"]["cur_rows"] == 10_000  # nothing dropped


def test_constant_column_edges_degenerate_safely(spark):
    ref = spark.range(1000).select(F.lit(5.0).alias("k"))
    cur = spark.range(1000).select(F.lit(9.0).alias("k"))
    edges = numeric_edges(ref, ["k"])
    assert edges["k"] == [5.0]  # collapsed quantiles dedupe to one edge
    rep = drift_report(ref, cur, numeric_cols=["k"], categorical_cols=[])
    assert rep["k"]["psi"] > 0.25  # everything moved above the edge
