"""Decontamination semantics: known planted overlaps, short-doc and
threshold edges, and the removal join."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.decontam import (
    contamination_report,
    decontaminate,
    word_ngram_hashes,
)

LEAK = "the quick brown fox jumps over the lazy dog near the river bank"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_hashes_count_and_short_docs(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b"), (3, "")])
    got = word_ngram_hashes(df, "text", "doc_id", n=3).collect()
    # doc 1: 3 distinct trigrams; docs 2/3 shorter than n -> none
    assert {r.doc_id for r in got} == {1}
    assert len(got) == 3


def test_ngram_normalization_matches_punctuation(spark):
    df = _docs(spark, [(1, "The  QUICK, brown-fox!"), (2, "the quick brown fox")])
    g = word_ngram_hashes(df, "text", "doc_id", n=4).collect()
    hashes = {}
    for r in g:
        hashes.setdefault(r.doc_id, set()).add(r.gram_hash)
    assert hashes[1] == hashes[2]  # normalization unifies them


def test_contamination_report_counts_planted_leak(spark):
    bench = _docs(spark, [(100, LEAK)])
    train = _docs(
        spark,
        [
            (1, "prefix words here " + LEAK + " suffix words"),  # leaked
            (2, "completely different content about columnar engines"),
            (3, LEAK),  # verbatim copy
        ],
    )
    rep = {
        r.doc_id: r.n_shared
        for r in contamination_report(train, bench, n=8).collect()
    }
    assert set(rep) == {1, 3}
    # doc 3 shares every 8-gram of the 13-word leak: 13-8+1 = 6
    assert rep[3] == 6
    assert rep[1] >= 6  # contains all of them (plus none extra from affixes)


def test_decontaminate_removes_and_threshold(spark):
    bench = _docs(spark, [(100, LEAK)])
    train = _docs(
        spark,
        [
            (1, LEAK + " trailing"),
            (2, "unrelated text that stays put in the corpus forever"),
        ],
    )
    kept = decontaminate(train, bench, n=8)
    assert {r.doc_id for r in kept.collect()} == {2}
    assert kept.columns == train.columns  # full rows survive
    # a permissive threshold keeps the overlapping doc
    kept_all = decontaminate(train, bench, n=8, max_shared=100)
    assert kept_all.count() == 2


def test_registry_decontaminate_nonempty_at_smoke_scale(spark):
    from geoestate_etl_spark.plans.queries_ext import q_decontaminate

    out = q_decontaminate(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert out.columns == ["doc_id", "n_shared"]
    assert all(r.doc_id % 7 != 0 for r in rows)
