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
    assert out.columns == ["kind", "doc_id", "n_shared", "bench_id", "cos_e4"]
    assert {r.kind for r in rows} == {"ngram", "bloom", "semantic"}
    # the bloom gate's no-false-negative contract: bloom rows == ngram
    assert {(r.doc_id, r.n_shared) for r in rows if r.kind == "bloom"} == {
        (r.doc_id, r.n_shared) for r in rows if r.kind == "ngram"
    }
    assert all(r.doc_id % 7 != 0 for r in rows)
    for r in rows:
        if r.kind == "semantic":
            assert r.bench_id % 7 == 0 and r.cos_e4 >= 3500


# --- semantic (embedding-level) decontamination ------------------------------


def test_semantic_contamination_flags_paraphrase_scale_invariant(spark):
    """A benchmark vector parallel to a corpus vector (any magnitude)
    flags at cos 1.0; orthogonal vectors never flag; the closest bench
    item is kept as evidence with min-id tie-break."""
    from geoestate_etl_spark.operators.decontam import (
        semantic_contamination_report,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: never flags
        ],
        "doc_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [
            (10, [2.5, 0.0, 0.0, 0.0]),   # scaled copy of doc 1
            (11, [-1.0, 0.0, 0.0, 0.0]),  # anti-parallel: cos -1
            (12, [1.0, 0.0, 0.0, 0.0]),   # tie with 10 at cos 1.0
        ],
        "bench_id long, embedding array<double>",
    )
    got = {
        r.doc_id: (r.bench_id, r.cos_sim)
        for r in semantic_contamination_report(
            corpus, bench, threshold=0.95
        ).collect()
    }
    assert got == {1: (10, 1.0)}  # min bench id among the cos-1.0 tie


def test_semantic_contamination_matches_numpy(spark):
    """threshold=-1 keeps every pair → per-doc argmax must equal a
    numpy recomputation on the real embeddings table."""
    import numpy as np

    from geoestate_etl_spark.operators.decontam import (
        semantic_contamination_report,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corpus = emb.filter("vec_id < 40").selectExpr(
        "vec_id AS doc_id", "embedding"
    )
    bench = emb.filter("vec_id >= 480").selectExpr(
        "vec_id AS bench_id", "embedding"
    )
    got = {
        r.doc_id: (r.bench_id, r.cos_sim)
        for r in semantic_contamination_report(
            corpus, bench, threshold=-1.0
        ).collect()
    }
    C = {r.doc_id: np.array(r.embedding, dtype=np.float64) for r in corpus.collect()}
    B = {r.bench_id: np.array(r.embedding, dtype=np.float64) for r in bench.collect()}
    for d, cv in C.items():
        sims = {
            b: round(float(cv @ bv / (np.linalg.norm(cv) * np.linalg.norm(bv))), 4)
            for b, bv in B.items()
        }
        best = max(sims.values())
        want_b = min(b for b, s in sims.items() if s == best)
        assert got[d] == (want_b, best + 0.0), d


def test_semantic_contamination_plan_shape(spark):
    """Corpus side streams once through a broadcast nested-loop (the
    deliberate small-bench replication); no CartesianProduct; the only
    exchange is the per-doc reduction of the FLAGGED subset."""
    from geoestate_etl_spark.operators.decontam import (
        semantic_contamination_report,
    )
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    corpus = emb.selectExpr("vec_id AS doc_id", "embedding")
    bench = emb.limit(5).selectExpr("vec_id AS bench_id", "embedding")
    plan = (
        semantic_contamination_report(corpus, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "EvalPython" not in plan
