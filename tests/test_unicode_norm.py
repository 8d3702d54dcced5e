"""Unicode normalization semantics: NFC folding, control/zero-width
stripping, punctuation canonicalization, mojibake repair, idempotence,
and the dedup-unification property it exists to provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.functions.unicode_norm import _norm_one, normalize_unicode


def test_pure_rules():
    # NFC: decomposed e + combining acute -> single codepoint
    assert _norm_one("café") == "café"
    # zero-width + BOM + soft hyphen stripped; tab/newline survive
    assert _norm_one("a​b﻿c\xadd\te\nf") == "abcd\te\nf"
    # exotic whitespace to plain space
    assert _norm_one("a\xa0b c　d") == "a b c d"
    # smart punctuation to ASCII
    assert _norm_one("“quoted” — it’s…") == '"quoted" - it\'s...'
    # mojibake: UTF-8 e-acute bytes shown as cp1252 chars
    assert _norm_one("caf\xc3\xa9") == "café"
    # lossy candidates stay untouched
    assert _norm_one("price \xc397") == "price \xc397"  # valid text with A-tilde
    assert _norm_one(None) is None


def test_idempotent():
    cases = ["café", "caf\xc3\xa9", "a​b", "“x”", "plain"]
    for s in cases:
        once = _norm_one(s)
        assert _norm_one(once) == once


def test_column_batch_matches_pure(spark):
    rows = [(1, "café"), (2, "caf\xc3\xa9"), (3, "a​\xa0b"), (4, None)]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r.id: r.norm
        for r in df.select("id", normalize_unicode("text").alias("norm")).collect()
    }
    assert got == {i: _norm_one(t) for i, t in rows}


def test_unifies_variants_for_dedup(spark):
    """The operational point: byte-level variants of one text must
    fingerprint identically after normalization."""
    from geoestate_etl_spark.functions.text import fingerprint_md5

    variants = [
        (1, "café — “best”"),
        (2, "café - \"best\""),          # decomposed + ASCII punct
        (3, "caf\xc3\xa9​ - \"best\""),   # mojibake + zero-width
    ]
    df = spark.createDataFrame(variants, ["id", "text"])
    fps = (
        df.select(fingerprint_md5(normalize_unicode("text")).alias("fp"))
        .distinct()
        .count()
    )
    assert fps == 1


def test_mojibake_with_continuation_rendered_as_soft_hyphen():
    """0xAD (soft hyphen) IS the cp1252 rendering of UTF-8 continuation
    byte 0xAD — 'í' (0xC3 0xAD) mis-decodes to 'Ã\\xad'. The repair
    must see the SHY before any strip (ADVICE r2)."""
    assert _norm_one("\xc3\xadndice") == "índice"
    # a FREE-STANDING SHY alongside mojibake breaks the lossless
    # round-trip (stray 0xAD is invalid UTF-8), so the repair correctly
    # declines and the SHY is stripped after
    assert _norm_one("caf\xc3\xa9 x\xady") == "cafÃ© xy"
    # plain text with a soft hyphen still just loses the SHY
    assert _norm_one("hy\xadphen") == "hyphen"
