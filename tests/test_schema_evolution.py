"""Schema-evolution tolerant reads (sources/schema_evolution.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.sources.schema_evolution import conform, read_conformed

TARGET = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("quality", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def evolved_path(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("evo") / "docs")
    # epoch 1: no quality column, lang present
    spark.createDataFrame(
        [(1, "alpha", "en"), (2, "beta", "zh")],
        "doc_id long, text string, lang string",
    ).write.mode("overwrite").parquet(d)
    # epoch 2: quality added (int, narrower than target double),
    # lang dropped, plus a column the target doesn't know
    spark.createDataFrame(
        [(3, "gamma", 7, "junk"), (4, "delta", 9, "junk")],
        "doc_id long, text string, quality int, debug string",
    ).write.mode("append").parquet(d)
    return d


def test_read_conformed_union(spark, evolved_path):
    out = read_conformed(
        spark, evolved_path, TARGET, defaults={"lang": "und", "quality": 0.0}
    )
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "text", "lang", "quality",
    ]
    assert dict(out.dtypes)["quality"] == "double"
    rows = {r.doc_id: (r.text, r.lang, r.quality) for r in out.collect()}
    assert rows[1] == ("alpha", "en", 0.0)  # missing quality → default
    assert rows[3] == ("gamma", "und", 7.0)  # missing lang → default, int→double
    assert "debug" not in out.columns


def test_defaults_optional_null(spark, evolved_path):
    out = read_conformed(spark, evolved_path, TARGET)
    rows = {r.doc_id: (r.lang, r.quality) for r in out.collect()}
    assert rows[1] == ("en", None)
    assert rows[4] == (None, 9.0)


def test_conform_composes_with_any_source(spark):
    df = spark.createDataFrame([(5, "eps")], "doc_id long, text string")
    out = conform(df, TARGET, {"lang": "und"})
    r = out.first()
    assert (r.doc_id, r.text, r.lang, r.quality) == (5, "eps", "und", None)


def test_incompatible_values_surface_as_default_not_error(spark):
    df = spark.createDataFrame(
        [(6, "zeta", "not-a-number")], "doc_id long, text string, quality string"
    )
    out = conform(df, TARGET, {"quality": -1.0})
    assert out.first().quality == -1.0
