"""The pandas_udf escape hatch must agree with the built-in Column
implementations — the safety story for migrating a metric to Python."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.functions.text import quality_score, token_count
from geoestate_etl_spark.functions.udfs import py_quality_score, py_token_count
from tests.conftest import SF_ORACLE


def test_pandas_udf_agrees_with_builtin(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(200)
    out = docs.select(
        quality_score("text").alias("q_builtin"),
        py_quality_score("text").alias("q_py"),
        token_count("text").alias("t_builtin"),
        py_token_count("text").alias("t_py"),
    ).collect()
    for r in out:
        assert r.q_builtin == r.q_py
        assert r.t_builtin == r.t_py


def test_managed_table_roundtrip(spark, tmp_path):
    """S5/S6: managed-table DDL + overwrite semantics via the catalog
    (replaces ClickHouse CREATE TABLE / truncate-before-load)."""
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    path = str(tmp_path / "tbl")
    df.write.mode("overwrite").option("path", path).saveAsTable("t_serving")
    try:
        assert spark.table("t_serving").count() == 100
        # truncate-before-load == overwrite
        spark.range(7).withColumn("v", F.col("id")).write.mode("overwrite").option(
            "path", path
        ).saveAsTable("t_serving")
        assert spark.table("t_serving").count() == 7
        assert spark.sql("SELECT count(*) AS c FROM t_serving").collect()[0].c == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS t_serving")


def test_udtf_equals_builtin_twin(spark):
    """Python UDTF (SQL LATERAL path) == the pure-Column posexplode
    twin, row for row, on real documents — the table-function sibling
    of this file's pandas_udf ≡ built-ins certifications."""
    from pyspark.sql import functions as F

    from geoestate_etl_spark.functions.udtfs import (
        sentences_relation,
        sentences_relation_udtf,
    )
    from tests.conftest import SF_ORACLE

    docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .filter(F.col("doc_id") < 80)
        .select("doc_id", "text")
    )
    a = sorted(tuple(r) for r in sentences_relation(docs, "doc_id", "text").collect())
    b = sorted(tuple(r) for r in sentences_relation_udtf(docs, "doc_id", "text").collect())
    assert a == b and len(a) > 0


def test_udtf_empty_and_null_rows(spark):
    from geoestate_etl_spark.functions.udtfs import sentences_relation_udtf

    df = spark.createDataFrame(
        [(1, "One. Two!  Three?"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    rows = sentences_relation_udtf(df, "doc_id", "text").collect()
    assert sorted((r.doc_id, r.pos, r.sentence) for r in rows) == [
        (1, 0, "One."), (1, 1, "Two!"), (1, 2, "Three?")
    ]


def test_udtf_builtin_parity_nbsp_and_tab(spark):
    """Review finding: NBSP must NOT split (ASCII \\s on both sides)
    and tabs must survive trimming identically (F.trim strips spaces
    only) — UDTF == builtin on exactly these hostile inputs."""
    from geoestate_etl_spark.functions.udtfs import (
        sentences_relation,
        sentences_relation_udtf,
    )

    df = spark.createDataFrame(
        [(1, "One. Two."), (2, "\tHello. Bye."), (3, "A!  B?   C.")],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in sentences_relation(df, "doc_id", "text").collect())
    b = sorted(tuple(r) for r in sentences_relation_udtf(df, "doc_id", "text").collect())
    assert a == b
    assert (1, 0, "One. Two.") in a  # NBSP did not split
