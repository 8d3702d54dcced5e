"""Exact-substring dedup (operators/substr_dedup.py): cross-document
repeated spans are found and masked; in-document repetition and unique
content are untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.substr_dedup import (
    mask_repeated_spans,
    repeated_spans,
    window_hashes,
)

BOILER = "all rights reserved redistribution of this text is not permitted"  # 10 tokens
UNIQUE_A = "the mountain village woke early under a pale winter sky"
UNIQUE_B = "quarterly revenue exceeded guidance on strong cloud demand"


def _docs(spark):
    rows = [
        (1, UNIQUE_A + " " + BOILER),
        (2, BOILER + " " + UNIQUE_B),
        (3, UNIQUE_B.replace("cloud", "hardware")),       # unique, no span
        (4, ("repeat me now " * 5).strip()),              # in-doc repetition only
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_window_hashes_positions_and_short_docs(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], ["i", "t"])
    out = {
        r.i: r.w for r in df.select("i", window_hashes("t", 3).alias("w")).collect()
    }
    assert [s.pos for s in out[1]] == [0, 1]
    assert out[2] == []  # shorter than n
    # identical content at different positions hashes identically
    df2 = spark.createDataFrame([(1, "x y z"), (2, "p q x y z")], ["i", "t"])
    got = {
        r.i: {(s.pos, s.h) for s in r.w}
        for r in df2.select("i", window_hashes("t", 3).alias("w")).collect()
    }
    h1 = {h for _, h in got[1]}
    assert {h for p, h in got[2] if p == 2} == h1


def test_repeated_spans_cross_doc_only(spark):
    spans = repeated_spans(_docs(spark), "doc_id", "text", n=10)
    got = {(r.id, r.pos) for r in spans.collect()}
    # doc 1 carries BOILER at positions 10..10 (after 10 unique tokens);
    # doc 2 at position 0. In-doc repetition (doc 4) is NOT flagged.
    assert (1, 10) in got and (2, 0) in got
    assert all(i in (1, 2) for i, _ in got)


def test_mask_removes_boilerplate_keeps_unique(spark):
    out = mask_repeated_spans(_docs(spark), "doc_id", "text", n=10)
    got = {r.doc_id: (r.text, r.n_masked) for r in out.collect()}
    assert got[1] == (UNIQUE_A, 10)
    assert got[2] == (UNIQUE_B, 10)
    assert got[3][1] == 0 and got[3][0] == UNIQUE_B.replace("cloud", "hardware")
    assert got[4][1] == 0  # in-doc repetition untouched
    assert out.count() == 4


def test_mask_can_empty_a_document(spark):
    df = spark.createDataFrame(
        [(1, BOILER), (2, BOILER)], ["doc_id", "text"]
    )
    out = {r.doc_id: (r.text, r.n_masked) for r in
           mask_repeated_spans(df, "doc_id", "text", n=10).collect()}
    assert out[1] == ("", 10) and out[2] == ("", 10)


def test_overlapping_spans_mask_their_union(spark):
    # two docs share an 11-token run -> two overlapping 10-windows;
    # coverage is the union (11 tokens), not double-counted
    run = BOILER + " whatsoever"
    df = spark.createDataFrame(
        [(1, run + " alpha beta"), (2, "gamma " + run)], ["doc_id", "text"]
    )
    out = {r.doc_id: (r.text, r.n_masked) for r in
           mask_repeated_spans(df, "doc_id", "text", n=10).collect()}
    assert out[1] == ("alpha beta", 11)
    assert out[2] == ("gamma", 11)
