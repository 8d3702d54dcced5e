from geoestate_etl_spark.sources.parquet_io import load_tables
from tests.conftest import SF_SMOKE


def test_load_tables_all(spark):
    tables = load_tables(spark, SF_SMOKE)
    assert set(tables) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert tables["region"].count() == 5
    # events loader normalized the ns timestamp to a usable type
    assert str(tables["events"].schema["ts"].dataType) == "TimestampType()"


def test_load_tables_subset(spark):
    tables = load_tables(spark, SF_SMOKE, ["nation", "region"])
    assert set(tables) == {"nation", "region"}
