"""Numeric-string cleaning expression builders (reference F1/F2/P2).

The reference strips non-numeric characters from dirty numeric
strings with ``trim`` + ``regexp_replace`` (``dags/main.py:178-183``):
space/NBSP thousands separators ("3 078.30"), em-dash placeholders
("—"), float-formatted ints ("20.0"). Each builder returns a Column
expression — pure JVM-side ``regexp_replace``, whole-stage-codegen
friendly, no UDFs.

Character classes mirror the reference exactly:
- ``[^0-9]``    → year, population, communal_service_id (main.py:179-181)
- ``[^0-9.]``   → square (main.py:178)
- ``[^0-9.-]``  → latitude, longitude (main.py:182-183)

Quirk Q1 (SURVEY §2.12) is deliberate reference semantics: digit-strip
of "20.0" yields "200". We expose the *operator* faithfully;
``normalize_number_string`` is the repaired variant that truncates a
trailing ".0" float suffix first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def strip_to_digits(c: Column | str) -> Column:
    """Keep digits only: ``regexp_replace(trim(c), '[^0-9]', '')``."""
    return F.regexp_replace(F.trim(_as_col(c)), "[^0-9]", "")


def strip_to_decimal(c: Column | str) -> Column:
    """Keep digits and dots (square-style cleaning)."""
    return F.regexp_replace(F.trim(_as_col(c)), "[^0-9.]", "")


def strip_to_signed_decimal(c: Column | str) -> Column:
    """Keep digits, dots and minus (lat/lon-style cleaning)."""
    return F.regexp_replace(F.trim(_as_col(c)), "[^0-9.\\-]", "")


def normalize_number_string(c: Column | str) -> Column:
    """Repaired integer normalizer: drop a float suffix before digit-strip.

    "20.0" → "20" (not the reference's "200", quirk Q1); " 1 234 " → "1234".
    """
    no_suffix = F.regexp_replace(F.trim(_as_col(c)), "\\.[0-9]*$", "")
    return F.regexp_replace(no_suffix, "[^0-9]", "")
