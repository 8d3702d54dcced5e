"""Python UDTF surface (Spark 4 table functions).

Completes the §2.10 UDF tier: scalar pandas_udfs (`functions/udfs.py`),
grouped/map Arrow ops (`operators/multimodal.py`), stateful processors
(`streaming/stateful.py`) — and here the TABLE function shape: one
input row → N output rows with their own schema, usable from both the
DataFrame API and SQL `LATERAL`.

Same discipline as the rest of the UDF tier: a UDTF is the SLOW path
(per-row Python, no codegen), so each one ships with a pure-Column
twin, and the tests pin UDTF == built-ins row-for-row. Use the builtin
twin in production plans; the UDTF exists for logic that genuinely
cannot be a Column expression (stateful generators, external lookups)
and as the certified example of the API.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

#: sentence boundary: split after ./!/? followed by whitespace
SENT_RE = r"(?<=[.!?])\s+"


@udtf(returnType="pos int, sentence string")
class SplitSentences:
    """text → (pos, sentence) rows; empty/NULL text yields no rows.

    Parity with the builtin twin is exact by construction: the regex
    compiles with ``re.ASCII`` so ``\\s`` means Java's ASCII whitespace
    set (NBSP does NOT split — same as ``F.split``), and trimming
    strips SPACES only, mirroring ``F.trim``.
    """

    _RX = re.compile(SENT_RE, re.ASCII)

    def eval(self, text: str | None):
        if not text:
            return
        pos = 0
        for part in self._RX.split(text):
            part = part.strip(" ")
            if part:
                yield pos, part
                pos += 1


def split_sentences_builtin(c: Column | str) -> Column:
    """The pure-Column twin: array of trimmed non-empty sentences (use
    with ``posexplode`` for the (pos, sentence) relation). JVM-side,
    whole-stage-codegen — the production path."""
    col = F.col(c) if isinstance(c, str) else c
    parts = F.split(col, SENT_RE)
    return F.filter(
        F.transform(parts, lambda s: F.trim(s)), lambda s: s != ""
    )


def sentences_relation(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, sentence) via the builtin twin — posexplode keeps the
    0-based position exactly as the UDTF numbers it."""
    return df.select(
        F.col(id_col),
        F.posexplode(split_sentences_builtin(text_col)).alias(
            "pos", "sentence"
        ),
    )


def sentences_relation_udtf(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, sentence) via the UDTF through SQL LATERAL — the
    table-function calling convention end to end.

    The temp view gets a per-call unique name (a fixed name would be
    clobbered by interleaved calls and rebind earlier lazy results);
    identifiers are backtick-quoted. The view is dropped before
    returning — ``spark.sql`` resolves it into the analyzed plan at
    call time, so the result stays executable and long-lived sessions
    don't accumulate catalog entries (r3 advice).
    """
    import uuid

    spark = df.sparkSession
    spark.udtf.register("split_sentences", SplitSentences)
    view = f"_udtf_docs_{uuid.uuid4().hex[:12]}"
    df.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"SELECT d.`{id_col}`, s.pos, s.sentence "
            f"FROM {view} d, LATERAL split_sentences(d.`{text_col}`) s"
        )
    finally:
        spark.catalog.dropTempView(view)
