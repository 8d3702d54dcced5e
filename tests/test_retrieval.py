"""BM25 retrieval: hand-computed fixture scores, ranking determinism,
and plan shape (no cartesian, literal isin pushed down)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.retrieval import bm25_topk, doc_terms


def _fixture(spark):
    rows = [
        (0, "spark spark join fast"),
        (1, "join vector"),
        (2, "the quick brown fox"),
        (3, "spark"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_ref(docs: dict[int, str], query: list[str], k1=1.2, b=0.75):
    """Naive reference implementation (whitespace tokens, Lucene idf)."""
    toks = {d: (t.split(" ") if t else [""]) for d, t in docs.items()}
    # empty text normalizes to '' and splits to [''] — one token, like the op
    toks = {d: (ts if ts != [] else [""]) for d, ts in toks.items()}
    n = len(docs)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    scores = {}
    for d, ts in toks.items():
        s = 0.0
        for q in set(query):
            tf = ts.count(q)
            if tf == 0:
                continue
            df = sum(1 for ts2 in toks.values() if q in ts2)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s > 0:
            scores[d] = round(s, 4)
    return scores


def test_bm25_matches_reference(spark):
    docs = _fixture(spark)
    query = ["spark", "join", "vector"]
    got = {r.doc_id: r.score for r in bm25_topk(docs, query, k=10).collect()}
    want = _bm25_ref(
        {0: "spark spark join fast", 1: "join vector", 2: "the quick brown fox",
         3: "spark", 4: ""},
        query,
    )
    assert got == want
    # top-1 matches the reference argmax (rounded score, doc_id tiebreak)
    best = min(want.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    top = bm25_topk(docs, query, k=1).first()
    assert top.doc_id == best and top.rn == 1


def test_bm25_deterministic_ranking_and_k(spark):
    docs = _fixture(spark)
    out = bm25_topk(docs, ["spark", "join"], k=2).collect()
    assert [r.rn for r in out] == [1, 2]
    # rounded-score ordering with doc_id tiebreaker: rerun is identical
    again = bm25_topk(docs, ["spark", "join"], k=2).collect()
    assert [(r.doc_id, r.score) for r in out] == [(r.doc_id, r.score) for r in again]


def test_bm25_no_query_terms_empty(spark):
    assert bm25_topk(_fixture(spark), ["absent"], k=5).count() == 0


def test_doc_terms_empty_text_single_token(spark):
    """Empty text yields one '' token (split semantics) — consistent
    with the SQL oracle's regexp_split_to_array, so dl parity holds."""
    one = spark.createDataFrame([(7, "")], "doc_id long, text string")
    rows = doc_terms(one).collect()
    assert [(r.doc_id, r.term) for r in rows] == [(7, "")]


def test_bm25_plan_no_cartesian(spark):
    docs = _fixture(spark)
    plan = bm25_topk(docs, ["spark", "join"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def _rrf_ref(lists, k=10, c=60):
    """Naive RRF: sum 1/(c+rank) per doc, sort by (-score, id)."""
    scores = {}
    for lst in lists:
        for doc, rn in lst:
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (c + rn)
    ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
    return [(d, round(s, 9)) for d, s in ranked[:k]]


def test_rrf_fuse_matches_reference(spark):
    """Random ranked lists (overlapping doc sets) fuse exactly like
    the naive reference, including the id tie-break for docs with
    identical rank profiles."""
    import random

    from geoestate_etl_spark.operators.retrieval import rrf_fuse

    rng = random.Random(11)
    lists = []
    for _ in range(3):
        docs = rng.sample(range(30), 12)
        lists.append([(d, i + 1) for i, d in enumerate(docs)])
    dfs = [
        spark.createDataFrame(lst, "doc_id long, rn long") for lst in lists
    ]
    got = [
        (r.doc_id, r.rrf_score)
        for r in rrf_fuse(dfs, k=8).orderBy("rn").collect()
    ]
    assert got == _rrf_ref(lists, k=8)


def test_rrf_hybrid_bm25_plus_vector(spark):
    """The intended composition: a lexical BM25 top-k and a vector
    cosine top-k over the same corpus fuse into one hybrid ranking; a
    doc ranked #1 in BOTH lists must out-score every doc that appears
    in only one list at any rank (1/(c+1)·2 > 1/(c+1))."""
    from geoestate_etl_spark.operators.retrieval import bm25_topk, rrf_fuse
    from geoestate_etl_spark.operators.similarity import brute_force_topk

    docs = _fixture(spark)
    # embeddings: doc 0 is closest to the probe, then 1, 3, 2, 4
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.4]),
            (2, [0.0, 1.0]),
            (3, [0.7, 0.7]),
            (4, [-1.0, 0.2]),
        ],
        "doc_id long, embedding array<double>",
    )
    lex = bm25_topk(docs, ["spark", "join"], k=4).select("doc_id", "rn")
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("cos_sim"), F.asc("doc_id")
    )
    vec = (
        brute_force_topk(emb, [1.0, 0.0], k=4, id_col="doc_id")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .select("doc_id", "rn")
    )
    fused = rrf_fuse([lex, vec], k=5)
    rows = {r.doc_id: (r.rrf_score, r.rn) for r in fused.collect()}
    # doc 0: bm25 #1 (two 'spark' + 'join') AND cosine #1
    assert fused.orderBy("rn").first().doc_id == 0
    both = rows[0][0]
    single_best = 1.0 / 61  # rank-1 appearance in exactly one list
    assert both > single_best
    # every fused score equals the reference arithmetic
    lex_r = {r.doc_id: r.rn for r in lex.collect()}
    vec_r = {r.doc_id: r.rn for r in vec.collect()}
    for d, (s, _) in rows.items():
        exp = sum(
            1.0 / (60 + m[d]) for m in (lex_r, vec_r) if d in m
        )
        assert s == round(exp, 9), d


def test_rrf_per_query_grouping(spark):
    """query_cols: fusion is per query group; ranks from different
    queries never mix."""
    from geoestate_etl_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q2", 2, 1)],
        "q string, doc_id long, rn long",
    )
    b = spark.createDataFrame(
        [("q1", 2, 1), ("q2", 3, 1)], "q string, doc_id long, rn long"
    )
    out = rrf_fuse([a, b], k=2, query_cols=["q"])
    got = {(r.q, r.doc_id): r.rn for r in out.collect()}
    # q1: doc2 appears in both (ranks 2+1) > doc1 (rank 1 once)
    assert got[("q1", 2)] == 1 and got[("q1", 1)] == 2
    # q2: doc2 and doc3 each rank-1 in one list -> tie broken by id
    assert got[("q2", 2)] == 1 and got[("q2", 3)] == 2
