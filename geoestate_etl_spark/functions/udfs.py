"""Vectorized (Arrow) Python UDF surface.

The reference registers no Spark UDFs — its only per-row Python is a
driver-side loop after ``collect()`` (``dags/main.py:383-404``, gone
in this engine). Everything in our hot paths uses built-ins; this
module declares the *sanctioned* escape hatch for semantics built-ins
can't express: ``pandas_udf`` (scalar, Arrow-batched) — never
row-at-a-time ``F.udf``.

``py_quality_score`` mirrors ``functions.text.quality_score`` exactly,
as the worked example of moving a custom metric to Python when it
outgrows Column expressions; the test suite asserts the two paths
agree, which is the migration-safety story at scale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

_STOPWORDS = ("the", "and", "of", "a", "is")


@pandas_udf(T.DoubleType())
def py_quality_score(text: pd.Series) -> pd.Series:
    """Arrow-batched quality heuristic — same formula as
    functions.text.quality_score (length + punct + stopword terms)."""
    import re

    def score(s: str) -> float:
        if s is None:
            return None
        words = re.split(r"\s+", s.strip()) if s.strip() else []
        wc = len(words) or 1
        n_stop = len(re.findall(r"\b(?:the|and|of|a|is)\b", s))
        punct = len(re.sub(r"[A-Za-z0-9\s]", "", s))
        pr = round(punct / max(len(s), 1), 4)
        len_score = min(len(words) / 100.0, 1.0)
        punct_pen = max(0.0, 1.0 - pr * 5)
        stop_score = min(round(n_stop / wc, 4) * 10, 1.0)
        return round((len_score + punct_pen + stop_score) / 3, 4)

    return text.map(score)


@pandas_udf(T.LongType())
def py_token_count(text: pd.Series) -> pd.Series:
    """Arrow-batched BPE-ish token count (same regex as
    functions.text.TOKEN_PATTERN)."""
    import re

    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    return text.map(lambda s: len(pat.findall(s)) if s is not None else None)
