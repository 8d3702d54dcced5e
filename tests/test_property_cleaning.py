"""Property-style tests: the cleaning/validation Column builders must
agree with straightforward Python reference implementations on
arbitrary dirty strings. Hypothesis generates one adversarial corpus
per property; Spark evaluates the whole corpus in a single pass
(running Spark per-example would be pathologically slow)."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from geoestate_etl_spark.functions.cleaning import (
    strip_to_decimal,
    strip_to_digits,
    strip_to_signed_decimal,
)
from geoestate_etl_spark.functions.validation import (
    DECIMAL_NUMBER,
    INTEGER_NUMBER,
    YEAR_4DIGIT,
)

#: dirty-string alphabet: digits, separators seen in the real feed
#: (space, NBSP, em-dash), punctuation, letters, quotes, newlines
DIRTY = st.text(
    alphabet="0123456789 . —-–,\"'абвгx\n\t",
    max_size=24,
)


def py_strip(s: str, keep: str) -> str:
    return re.sub(f"[^{keep}]", "", s.strip())


@settings(max_examples=1, deadline=None)
@given(st.lists(DIRTY, min_size=200, max_size=200))
def _collect_corpus(xs):
    global CORPUS
    CORPUS = xs


_collect_corpus()


def test_strip_builders_match_python_reference(spark):
    corpus = [c for c in CORPUS if "\n" not in c] + [
        "3 078.30",
        "3 078.30",
        "—",
        "20.0",
        "1.2.3",
        "-55.75",
        "--..--",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in corpus], ["x"])
    rows = df.select(
        strip_to_digits("x").alias("d"),
        strip_to_decimal("x").alias("dec"),
        strip_to_signed_decimal("x").alias("sd"),
    ).collect()
    for raw, row in zip(corpus, rows):
        assert row.d == py_strip(raw, "0-9"), repr(raw)
        assert row.dec == py_strip(raw, "0-9."), repr(raw)
        assert row.sd == py_strip(raw, "0-9.\\-"), repr(raw)


def test_format_regexes_match_python_reference(spark):
    from geoestate_etl_spark.functions.validation import matches_format

    corpus = [c for c in CORPUS if "\n" not in c] + [
        "1903",
        "190",
        "19033",
        "12.5",
        "12.",
        ".5",
        "1.2.3",
        "0",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in corpus], ["x"])
    rows = df.select(
        matches_format("x", YEAR_4DIGIT).alias("y"),
        matches_format("x", DECIMAL_NUMBER).alias("d"),
        matches_format("x", INTEGER_NUMBER).alias("i"),
    ).collect()
    for raw, row in zip(corpus, rows):
        assert row.y == bool(re.fullmatch(r"[0-9]{4}", raw)), repr(raw)
        assert row.d == bool(re.fullmatch(r"[0-9]+(\.[0-9]+)?", raw)), repr(raw)
        assert row.i == bool(re.fullmatch(r"[0-9]+", raw)), repr(raw)
