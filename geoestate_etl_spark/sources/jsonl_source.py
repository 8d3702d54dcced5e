"""JSONL (newline-delimited JSON) source/sink.

The interchange format of text-corpus pipelines (one document object
per line, trivially splittable, append-friendly). Two disciplines
carried over from the CSV source:

- **explicit schema, never inference** — schema inference reads the
  data twice and silently unifies conflicting types; a corpus reader
  declares its contract (SURVEY §1.3 applies to JSON exactly as CSV).
- **corrupt lines are data, not crashes** — web-scale JSONL always
  contains truncated/garbage lines; PERMISSIVE mode lands them in a
  quarantine column for accounting, mirroring the valid/invalid split
  of the houses pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Column that captures the raw text of unparseable lines.
CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read JSONL with an explicit schema.

    With ``keep_corrupt``, unparseable lines survive as rows whose
    only non-null column is :data:`CORRUPT_COL` — split them off with
    :func:`split_corrupt` for the valid/quarantine accounting.
    """
    full = T.StructType(
        schema.fields + ([T.StructField(CORRUPT_COL, T.StringType())] if keep_corrupt else [])
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, corrupt_raw_lines)."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"{CORRUPT_COL} not present — read with keep_corrupt=True")
    # Spark requires caching/materialization before referencing the
    # corrupt column alone (it is filled lazily at parse time)
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partition-parallel JSONL write (one shard per task — at scale,
    control shard sizing with repartition upstream, not here)."""
    df.write.mode(mode).json(path)
