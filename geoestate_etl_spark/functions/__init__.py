from geoestate_etl_spark.functions.cleaning import (
    strip_to_digits,
    strip_to_decimal,
    strip_to_signed_decimal,
    normalize_number_string,
)
from geoestate_etl_spark.functions.validation import (
    not_blank,
    castable,
    matches_format,
    houses_valid_predicate,
)

__all__ = [
    "strip_to_digits",
    "strip_to_decimal",
    "strip_to_signed_decimal",
    "normalize_number_string",
    "not_blank",
    "castable",
    "matches_format",
    "houses_valid_predicate",
]
