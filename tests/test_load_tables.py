from geoestate_etl_spark.sources.parquet_io import load_tables
from tests.conftest import SF_SMOKE


def test_load_tables_all(spark):
    tables = load_tables(spark, SF_SMOKE)
    assert set(tables) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert tables["region"].count() == 5
    # events ts must land on a usable timestamp type whichever way the
    # driver generated the file: TIMESTAMP(NANOS) -> rebuilt micros
    # (TimestampType), plain tz-less timestamp[us] -> TimestampNTZType
    # (Spark 4 infers NTZ, matching DuckDB's tz-less TIMESTAMP)
    assert str(tables["events"].schema["ts"].dataType) in (
        "TimestampType()",
        "TimestampNTZType()",
    )


def test_load_tables_subset(spark):
    tables = load_tables(spark, SF_SMOKE, ["nation", "region"])
    assert set(tables) == {"nation", "region"}
