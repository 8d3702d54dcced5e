"""Deterministic negative sampling for contrastive training pairs —
given ``(query, positive)`` rows and a candidate corpus, attach k
negatives per query that are (a) drawn uniformly-by-hash from the
corpus, (b) never a positive of that query, (c) bit-reproducible:
re-runs, partitioning, and growth of data OUTSIDE the candidate
corpus cannot change a query's negatives.

Scope of the stability claim (ADVICE r4): draw positions are
``xxhash64 pmod N`` over a dense renumbering of the candidate corpus
itself, so growing the CORPUS changes ``N`` and re-shuffles every
query's positions — that is by design (a uniform draw over the new
corpus), not an accident. For negatives that stay fixed across corpus
growth, pin the renumbering once with :func:`build_negative_index`,
persist it as a versioned artifact, and pass it back via
``sample_negatives(index=...)`` — then draws depend only on the pinned
``(N, position → id)`` mapping, and ingest growth cannot touch them.

Spark shape (the 100 TB story):

- the corpus gets a dense 0..N-1 index ONCE
  (:func:`~geoestate_etl_spark.operators.windows.renumber_scalable` —
  the frozen-boundary two-phase renumber, no single-task window);
- each query explodes to ``oversample·k`` draw slots; draw j maps to
  corpus position ``xxhash64(query, j, seed) pmod N`` — an EQUI-JOIN
  against the index (draws are the left side: |queries|·oversample·k
  rows, never |corpus|-bounded);
- positives are anti-joined out, hash-duplicate draws dedup per
  query, and the first k surviving draws (by slot order — the
  deterministic tiebreak) become the negatives.

Shortfall honesty: with ``oversample·k`` draws the chance of fewer
than k distinct non-positive survivors is astronomically small for
N ≫ k (birthday bound), but it is NOT zero — callers that require
exactly-k should verify with a per-query count
(``out.groupBy(query_col).count()``) rather than assume; padding
with arbitrary rows would silently bias the distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_negative_index(
    corpus: DataFrame, corpus_id_col: str = "doc_id"
) -> DataFrame:
    """The dense ``(pos, cand_id)`` draw index over the candidate
    corpus — build once, persist as a VERSIONED artifact, and pass to
    :func:`sample_negatives` via ``index=`` for negatives that stay
    bit-stable across later corpus growth (module docstring, ADVICE
    r4). Positions are 0-based and contiguous."""
    from geoestate_etl_spark.operators.windows import renumber_scalable

    cand_ids = corpus.select(
        F.col(corpus_id_col).alias("cand_id")
    ).distinct()
    return renumber_scalable(
        cand_ids, order_key="cand_id", id_alias="pos"
    ).select((F.col("pos") - 1).alias("pos"), "cand_id")


def sample_negatives(
    pairs: DataFrame,
    corpus: DataFrame,
    k: int,
    query_col: str = "query_id",
    positive_col: str = "pos_id",
    corpus_id_col: str = "doc_id",
    seed: int = 42,
    oversample: int = 4,
    index: DataFrame | None = None,
) -> DataFrame:
    """``(query_id, neg_id, slot)`` — up to ``k`` deterministic
    negatives per query (see module docstring for the contract).
    ``slot`` is the draw order (0-based over the surviving draws).

    ``index``: a pinned ``(pos, cand_id)`` frame from
    :func:`build_negative_index` (typically re-read from a committed
    artifact). When given, ``corpus`` is ignored for the draw domain,
    so corpus growth between runs cannot re-shuffle draw positions.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if index is None:
        index = build_negative_index(corpus, corpus_id_col)
        # n from the cheap distinct count — counting the renumbered
        # index would execute the two-phase renumber twice (r4 review)
        n = (
            corpus.select(F.col(corpus_id_col).alias("cand_id"))
            .distinct()
            .count()
        )
    else:
        n = index.count()
    if n <= k:
        raise ValueError(f"corpus too small for k={k} negatives (n={n})")

    draws = (
        pairs.select(F.col(query_col).alias("q"))
        .distinct()
        .select(
            "q",
            F.explode(
                F.sequence(F.lit(0), F.lit(oversample * k - 1))
            ).alias("j"),
        )
        .select(
            "q",
            "j",
            F.pmod(
                F.xxhash64(F.col("q"), F.col("j"), F.lit(seed)), F.lit(n)
            ).alias("pos"),
        )
    )
    cand = draws.join(index, "pos").select("q", "j", "cand_id")
    # never a positive OF THAT QUERY (other queries' positives are
    # legitimate negatives here)
    not_pos = cand.join(
        pairs.select(
            F.col(query_col).alias("q"), F.col(positive_col).alias("cand_id")
        ).distinct(),
        ["q", "cand_id"],
        "left_anti",
    )
    # dedupe hash-duplicate draws per query (keep the earliest slot),
    # then take the first k by slot order — both deterministic
    w_dup = Window.partitionBy("q", "cand_id").orderBy("j")
    w_rank = Window.partitionBy("q").orderBy("j")
    return (
        not_pos.withColumn("dup_rn", F.row_number().over(w_dup))
        .filter(F.col("dup_rn") == 1)
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q").alias(query_col),
            F.col("cand_id").alias("neg_id"),
            (F.col("rn") - 1).alias("slot"),
        )
    )


def mine_hard_negatives(
    pairs: DataFrame,
    embeddings: DataFrame,
    k: int,
    query_col: str = "query_id",
    positive_col: str = "pos_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 4,
    method: str = "exact",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """``(query_id, neg_id, cos_sim)`` — the k most query-SIMILAR
    corpus vectors that are not positives: hard negatives, the
    contrastive-training complement of :func:`sample_negatives`'s
    uniform draws (random negatives teach coarse separation; hard
    negatives teach the decision boundary).

    Two candidate-generation shapes, same downstream exclusion/re-rank
    (self + positives anti-joined out, top-k by (rounded score desc,
    id asc) — the ranking discipline every serving path here uses):

    - ``method="exact"``: the batch ANN path
      (:func:`~geoestate_etl_spark.operators.similarity.
      brute_force_topk_batch` — broadcast probe batch, ONE corpus
      scan, two-phase partial top-k). Exact, but the scan is
      |corpus| × |query batch| — right for bounded query batches.
    - ``method="ivf"`` (r5 — VERDICT r4 #4): for CORPUS-SIZED query
      sets that cannot broadcast, build the IVF quantizer and run the
      shuffle-shaped :func:`~geoestate_etl_spark.operators.similarity.
      knn_join` (cell equi-join, pair volume ≈ N²·n_probe/n_cells),
      then keep the query rows. IVF's approximation contract applies:
      a true neighbor in a non-probed cell is missed;
      ``n_probe = n_cells`` is exact (pinned in test_negatives).

    Both over-fetch ``k + max positives + 1`` neighbors per query so
    exclusions cannot starve the top-k. Queries must appear in
    ``embeddings`` under their ``query_col`` ids."""
    from pyspark.sql import Window as W

    from geoestate_etl_spark.operators.similarity import brute_force_topk_batch

    if method not in ("exact", "ivf"):
        raise ValueError(f"unknown method {method!r}: use 'exact' or 'ivf'")

    max_pos = (
        pairs.groupBy(query_col)
        .agg(F.count("*").alias("n_pos"))
        .agg(F.max("n_pos"))
        .collect()[0][0]
        or 0
    )
    q_ids = pairs.select(F.col(query_col).alias(vec_id_col)).distinct()
    probes = embeddings.join(q_ids, vec_id_col, "left_semi").select(
        F.col(vec_id_col).alias("probe_id"),
        F.col(vec_col).alias("probe_vec"),
    )
    # every query must have an embedding — silently dropping a query
    # would train on missing hard negatives with no signal (r4 review)
    missing = q_ids.join(
        embeddings.select(vec_id_col), vec_id_col, "left_anti"
    )
    stranded = [r[0] for r in missing.limit(5).collect()]
    if stranded:
        raise ValueError(
            f"queries with no embedding under {vec_id_col}: {stranded}..."
        )
    if method == "ivf":
        from geoestate_etl_spark.operators.similarity import (
            ivf_build,
            knn_join,
        )

        assigned, centroids = ivf_build(
            embeddings,
            n_cells=n_cells,
            id_col=vec_id_col,
            vec_col=vec_col,
        )
        # knn_join already excludes self; keep only the query rows
        graph = (
            knn_join(
                assigned,
                centroids,
                k=k + max_pos + 1,
                n_probe=n_probe,
                id_col=vec_id_col,
                vec_col=vec_col,
                scale=scale,
            )
            .withColumnRenamed(vec_id_col, "probe_id")
            .withColumnRenamed("neighbor_id", vec_id_col)
            .join(
                q_ids.select(F.col(vec_id_col).alias("probe_id")),
                "probe_id",
                "left_semi",
            )
        )
    else:
        graph = brute_force_topk_batch(
            embeddings,
            probes,
            k=k + max_pos + 1,
            id_col=vec_id_col,
            vec_col=vec_col,
            scale=scale,
        )
    cand = graph.filter(F.col("probe_id") != F.col(vec_id_col)).join(
        pairs.select(
            F.col(query_col).alias("probe_id"),
            F.col(positive_col).alias(vec_id_col),
        ).distinct(),
        ["probe_id", vec_id_col],
        "left_anti",
    )
    w = W.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), F.asc(vec_id_col)
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("probe_id").alias(query_col),
            F.col(vec_id_col).alias("neg_id"),
            "cos_sim",
        )
    )
