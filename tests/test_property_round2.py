"""Property-style tests for round-2 text/packing operators, following
the corpus-batched pattern of test_property_cleaning (one Spark pass
per property, hypothesis only generates the adversarial corpus)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.text import repetition_ratios, scrub_pii
from geoestate_etl_spark.operators.prefix import pack_sequences

#: adversarial text: pii-ish fragments, digits, separators, unicode
PII_ISH = st.text(
    alphabet="abc@._-:/0123456789 +()пр漢\nhttp",
    max_size=40,
)

CORPUS = None


@settings(max_examples=1, deadline=None)
@given(st.lists(PII_ISH, min_size=300, max_size=300))
def _collect(xs):
    global CORPUS
    CORPUS = xs


def _corpus(spark):
    _collect()
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(CORPUS)], ["id", "text"]
    )


def test_scrub_pii_idempotent_and_deterministic(spark):
    """Scrubbing an already-scrubbed text changes nothing (the
    placeholder tokens contain no scrubbable substrings), on an
    adversarial corpus full of half-formed pii fragments."""
    df = _corpus(spark)
    once = df.select("id", scrub_pii("text").alias("t1"))
    twice = once.select("id", F.col("t1"), scrub_pii("t1").alias("t2"))
    diff = twice.filter(F.col("t1") != F.col("t2"))
    assert diff.count() == 0
    a = {r.id: r.t1 for r in once.collect()}
    b = {r.id: r.t1 for r in df.select("id", scrub_pii("text").alias("t1")).collect()}
    assert a == b


def test_repetition_ratios_bounded(spark):
    """Every ratio lands in [0, 1] for arbitrary text (including
    empty, whitespace-only, and single-word documents)."""
    df = _corpus(spark)
    extra = spark.createDataFrame(
        [(1000, ""), (1001, "   "), (1002, "word"), (1003, "\n\n\n")],
        ["id", "text"],
    )
    out = df.unionByName(extra).select(
        "id", repetition_ratios("text").alias("rr")
    )
    bad = out.filter(
        (F.col("rr.dup_line_frac") < 0) | (F.col("rr.dup_line_frac") > 1)
        | (F.col("rr.dup_word_frac") < 0) | (F.col("rr.dup_word_frac") > 1)
        | (F.col("rr.top_word_frac") < 0) | (F.col("rr.top_word_frac") > 1)
    )
    assert bad.count() == 0


def test_pack_sequences_matches_python_reference(spark):
    """Chunk assignment equals a sequential Python walk of the same
    token tape, for a deterministic pseudo-random size distribution."""
    sizes = [((i * 2654435761) % 997) + 1 for i in range(2000)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], ["id", "toks"]
    )
    got = {
        r.id: (r.chunk_id, r.chunk_offset)
        for r in pack_sequences(df, "id", "toks", 4096).collect()
    }
    pos = 0
    for i, s in enumerate(sizes):
        assert got[i] == (pos // 4096, pos % 4096), i
        pos += s
