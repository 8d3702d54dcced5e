from geoestate_etl_spark.sources.columnar import (
    read_columnar,
    write_columnar,
    write_sorted,
)
from geoestate_etl_spark.sources.csv_source import read_dirty_csv
from geoestate_etl_spark.sources.jsonl_source import (
    read_jsonl,
    split_corrupt,
    write_jsonl,
)
from geoestate_etl_spark.sources.parquet_io import (
    load_tables,
    read_parquet,
    write_parquet,
    write_sorted_table,
)

__all__ = [
    "read_columnar",
    "write_columnar",
    "write_sorted",
    "read_dirty_csv",
    "read_jsonl",
    "split_corrupt",
    "write_jsonl",
    "read_parquet",
    "write_parquet",
    "write_sorted_table",
    "load_tables",
]
