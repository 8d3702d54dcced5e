"""Avro source builders: jar probe honesty — a missing connector
raises the actionable error (never Spark's opaque stack), and when a
future container ships the jar, the same calls must go live unchanged
(the conditional-real-path contract table_formats uses for Delta)."""

from __future__ import annotations

import pytest

from geoestate_etl_spark.sources.avro_source import (
    AvroConnectorMissing,
    avro_available,
    parse_avro_column,
    read_avro,
    write_avro,
)


def test_probe_and_actionable_errors_or_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    p = str(tmp_path / "avro_out")
    if not avro_available(spark):
        # every builder must fail with the actionable error BEFORE any
        # JVM plan is constructed
        with pytest.raises(AvroConnectorMissing, match="spark-avro"):
            write_avro(df, p)
        with pytest.raises(AvroConnectorMissing):
            read_avro(spark, p)
        with pytest.raises(AvroConnectorMissing):
            parse_avro_column(
                spark, "v", '{"type": "string"}'
            )
    else:  # jar present (future container): the same calls go live
        write_avro(df, p)
        back = read_avro(spark, p)
        assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}
