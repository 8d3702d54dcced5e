"""Typed-cast and derivation operators (reference §2 P2/P8, F5-F13).

Covers the reference's cast stage (``dags/main.py:265-277``), the
year→Date build (``make_date(y,1,1)`` at ``:269``), the conditional
date fixup (``when(length==4, concat_ws(...))`` at ``:446-453``), and
the decade bucketing (``floor(year/10)*10`` at ``:368``). All pure
Column expressions — codegen-friendly, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.functions.cleaning import (
    strip_to_decimal,
    strip_to_digits,
    strip_to_signed_decimal,
)


def year_to_date(year_col: Column | str) -> Column:
    """F7: 4-digit year → Date(year, 1, 1) (dags/main.py:269)."""
    y = F.col(year_col) if isinstance(year_col, str) else year_col
    return F.make_date(y.cast(T.IntegerType()), F.lit(1), F.lit(1))


def year_string_to_iso(c: Column | str) -> Column:
    """P8/F4-F6: conditional date build (dags/main.py:446-453).

    If the value is a bare 4-char year, expand to "yyyy-01-01" with
    ``concat_ws``, else pass through; then parse with ``to_date``.
    """
    col = F.col(c) if isinstance(c, str) else c
    s = col.cast(T.StringType())
    iso = F.when(F.length(s) == 4, F.concat_ws("-", s, F.lit("01"), F.lit("01"))).otherwise(s)
    return F.to_date(iso, "yyyy-MM-dd")


def decade_of(date_col: Column | str) -> Column:
    """A5/F10: decade bucket ``floor(year/10)*10`` (dags/main.py:366-368)."""
    col = F.col(date_col) if isinstance(date_col, str) else date_col
    return (F.floor(F.year(col) / 10) * 10).cast(T.IntegerType())


def cast_houses(df: DataFrame) -> DataFrame:
    """The reference's full clean→cast stage (dags/main.py:178-183,265-277).

    Input: raw all-string houses frame (already validity-filtered).
    Output: the canonical 12-column typed schema (schema.HOUSES_SCHEMA):
    ints cast, lat/lon rounded to 6 dp, year → Date(y,1,1).
    """
    return df.select(
        strip_to_digits("house_id").cast(T.IntegerType()).alias("house_id"),
        F.round(strip_to_signed_decimal("latitude").cast(T.DoubleType()), 6).alias("latitude"),
        F.round(strip_to_signed_decimal("longitude").cast(T.DoubleType()), 6).alias("longitude"),
        year_to_date(strip_to_digits("maintenance_year")).alias("maintenance_year"),
        strip_to_decimal("square").cast(T.DoubleType()).alias("square"),
        strip_to_digits("population").cast(T.IntegerType()).alias("population"),
        F.col("region").cast(T.StringType()).alias("region"),
        F.col("locality_name").cast(T.StringType()).alias("locality_name"),
        F.col("address").cast(T.StringType()).alias("address"),
        F.col("full_address").cast(T.StringType()).alias("full_address"),
        strip_to_digits("communal_service_id").cast(T.IntegerType()).alias("communal_service_id"),
        F.col("description").cast(T.StringType()).alias("description"),
    )
