"""Char-n-gram LM scoring: DuckDB parity on the real documents table
(the repo-local oracle discipline for ops outside the 50-entry
registry), plus the gating property the op exists for — junk text
scores below corpus-typical text."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.functions.ngram_lm import char_ngram_counts, ngram_logprob
from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare_spark_duckdb

LM_SQL = """
WITH g AS (
  SELECT doc_id, substr(text, i, 3) AS gram
  FROM documents, LATERAL (
    SELECT unnest(range(1, greatest(length(text) - 2, 1) + 1)) AS i)
  WHERE text IS NOT NULL AND length(text) > 0
), model AS (
  SELECT gram, count(*) AS cnt FROM g GROUP BY gram
), tot AS (
  SELECT sum(cnt) AS total, count(*) AS vocab FROM model
)
SELECT g.doc_id, count(*) AS n_grams,
       round(avg(ln((COALESCE(m.cnt, 0) + 1.0) / (t.total + t.vocab))), 4)
         AS avg_logprob
FROM g LEFT JOIN model m ON g.gram = m.gram CROSS JOIN tot t
GROUP BY g.doc_id
"""


def _docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


def test_lm_matches_duckdb(spark, duck):
    docs = _docs(spark)
    model = char_ngram_counts(docs, "text", 3)
    out = ngram_logprob(docs, model, "doc_id", "text", 3, alpha=1.0)
    ok, msg = compare_spark_duckdb(out, duck, LM_SQL)
    assert ok, msg


def test_junk_scores_below_typical_text(spark):
    docs = _docs(spark)
    model = char_ngram_counts(docs, "text", 3)
    probe = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs on"),
            (2, "zqxj wvkq zzzz qqqq xjxj vvvv kkkk zzzz qxqx jvjv"),
        ],
        ["doc_id", "text"],
    )
    scores = {
        r.doc_id: r.avg_logprob
        for r in ngram_logprob(probe, model, "doc_id", "text").collect()
    }
    assert scores[1] > scores[2], scores


def test_micro_twin_matches_pure_python(spark):
    """ngram_logprob_micro == an independent stdlib recomputation on a
    tiny corpus: per-gram round(ln P * 1e6) summed as exact ints."""
    import math
    from collections import Counter

    from geoestate_etl_spark.functions.ngram_lm import ngram_logprob_micro

    rows = [(1, "abcabc"), (2, "abcd"), (3, "zz"), (4, "")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def grams(t):
        if not t:
            return []
        return [t[i : i + 3] for i in range(max(len(t) - 2, 1))]

    model = Counter(g for _, t in rows for g in grams(t))
    total, vocab = sum(model.values()), len(model)
    expect = {}
    for i, t in rows:
        gs = grams(t)
        if not gs:
            continue
        lps = [
            round(math.log((model[g] + 1.0) / (total + vocab)) * 1e6) for g in gs
        ]
        expect[i] = (len(gs), sum(lps))
    got = {
        r.doc_id: (r.lm_grams, r.lm_sum_micro)
        for r in ngram_logprob_micro(
            docs, char_ngram_counts(docs, "text", 3)
        ).collect()
    }
    assert got == expect, (got, expect)


def test_micro_twin_oov_floor(spark):
    """Held-out grams fall back to the smoothed alpha floor instead of
    dropping out or producing NULL sums."""
    import math

    from geoestate_etl_spark.functions.ngram_lm import ngram_logprob_micro

    train = spark.createDataFrame([(1, "abcabcabc")], ["doc_id", "text"])
    probe = spark.createDataFrame([(9, "xyz")], ["doc_id", "text"])
    model = char_ngram_counts(train, "text", 3)
    [(total, vocab)] = model.agg(F.sum("cnt"), F.count("*")).collect()
    floor = round(math.log(1.0 / (total + vocab)) * 1e6)
    [row] = ngram_logprob_micro(probe, model).collect()
    assert (row.lm_grams, row.lm_sum_micro) == (1, floor)


def test_short_and_empty_docs_do_not_crash(spark):
    probe = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    model = char_ngram_counts(_docs(spark), "text", 3)
    out = ngram_logprob(probe, model, "doc_id", "text")
    rows = {r.doc_id: r.n_grams for r in out.collect()}
    # 'ab' scores its single short gram; ''/NULL docs yield NO rows
    # (no phantom '' gram — they have nothing to score)
    assert rows == {1: 1}
