"""Dirty-CSV source (reference operator S1, ``dags/main.py:153-158``).

The reference reads a UTF-16 CSV with header, multiline quoted fields
and ``"`` as the escape char, letting Spark infer the (string-heavy)
schema. We keep the exact reader capability but make the schema
explicit by default: inference on 100 TB of input means an extra full
scan, so the production path takes a StructType and the
inference mode exists only for exploration parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_dirty_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    encoding: str = "UTF-16",
    infer: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_column: str | None = None,
) -> DataFrame:
    """Read a messy CSV the way the reference does (S1).

    Options mirror ``dags/main.py:153-158``: header, multiLine (quoted
    fields contain newlines), escape='"' (doubled quotes inside quoted
    fields). With ``schema`` given, every column is read as declared
    (normally all-string, cleaned later); with ``infer=True`` Spark
    scans to guess types (reference behavior — avoid at scale).

    Malformed-record policy (the layer below the reference's row
    validation): ``mode`` is PERMISSIVE (default; broken rows become
    nulls, and land in ``corrupt_column`` when given so they can be
    quarantined), DROPMALFORMED, or FAILFAST.
    """
    reader = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("encoding", encoding)
        .option("escape", '"')
        .option("mode", mode)
    )
    if corrupt_column is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
        if schema is not None:
            schema = T.StructType(
                [*schema.fields, T.StructField(corrupt_column, T.StringType())]
            )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
