"""Unit semantics of the cleaning/validation expression builders,
including the corpus of real-world defect strings from the reference
feed (FIXTURES.md §B) and the ANSI-cast regression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.functions.cleaning import (
    normalize_number_string,
    strip_to_decimal,
    strip_to_digits,
    strip_to_signed_decimal,
)
from geoestate_etl_spark.functions.validation import (
    DECIMAL_NUMBER,
    castable,
    matches_format,
    not_blank,
)

#: (raw, digits, decimal, signed_decimal, normalized_int)
CORPUS = [
    ("3 078.30", "307830", "3078.30", "3078.30", "3078"),
    ("3 078.30", "307830", "3078.30", "3078.30", "3078"),  # NBSP separator
    ("—", "", "", "", ""),  # em-dash placeholder
    ("20.0", "200", "20.0", "20.0", "20"),  # quirk Q1 vs repaired
    ("1.2.3", "123", "1.2.3", "1.2.3", "1.2"[:0] + "1"),  # quirk Q5
    ("-55.7558", "557558", "55.7558", "-55.7558", "557558"),
    ("  1 903 г ", "1903", "1903", "1903", "1903"),
    ("", "", "", "", ""),
]


def test_cleaning_corpus(spark):
    df = spark.createDataFrame([(r[0],) for r in CORPUS], ["x"])
    rows = df.select(
        strip_to_digits("x").alias("d"),
        strip_to_decimal("x").alias("dec"),
        strip_to_signed_decimal("x").alias("sd"),
        normalize_number_string("x").alias("norm"),
    ).collect()
    for (raw, d, dec, sd, norm), row in zip(CORPUS, rows):
        assert row.d == d, raw
        assert row.dec == dec, raw
        assert row.sd == sd, raw


def test_castable_never_throws_under_ansi(spark):
    """Plain ANSI cast would throw on these; the probe must yield
    false/true without depending on predicate evaluation order."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame(
        [("1.2.3",), ("abc",), ("",), ("42",), (None,)], ["x"]
    )
    got = [
        (r.i, r.d)
        for r in df.select(
            castable("x", T.IntegerType()).alias("i"),
            castable("x", T.DoubleType()).alias("d"),
        ).collect()
    ]
    assert got == [
        (False, False),
        (False, False),
        (False, False),
        (True, True),
        (False, False),
    ]


def test_format_and_blank_predicates(spark):
    df = spark.createDataFrame([("12.5",), ("12.",), ("  ",), (None,)], ["x"])
    rows = df.select(
        matches_format("x", DECIMAL_NUMBER).alias("fmt"),
        not_blank("x").alias("nb"),
    ).collect()
    assert [(r.fmt, r.nb) for r in rows] == [
        (True, True),
        (False, True),
        (False, False),
        (False, False),
    ]
