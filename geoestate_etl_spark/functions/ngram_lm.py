"""Character n-gram language-model scoring — the perplexity-style
quality signal of a training-data pipeline: documents whose character
statistics diverge from the corpus (binary spill, wrong language,
boilerplate soup) score low and can be gated out.

Spark shape (all JVM-side, two shuffles):

- ``char_ngram_counts``: one explode + one hash aggregation over the
  corpus — the model is just a (gram, count) table. At 100 TB this is
  the canonical wordcount shape; the model table is many orders of
  magnitude smaller than the corpus (bounded by alphabet^n).
- ``ngram_logprob``: re-explode each document, join the model on the
  gram (broadcast when the model is small — alphabet^3 usually is;
  AQE decides), and average add-alpha-smoothed log-probabilities per
  document. OOV grams get the smoothed floor instead of -inf.

Citing the reference scope: the reference has no text-model surface
(`dags/main.py` is numeric/geo ETL); this extends the engine's
training-data toolkit alongside quality_score/lang_id
(``functions/text.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sliding_char_ngrams(c: Column | str, n: int = 3) -> Column:
    """ALL sliding character n-grams (with multiplicity — unlike
    ``text.char_ngrams``' distinct set, an LM needs counts).
    Non-empty strings shorter than ``n`` yield their whole (short)
    text as the single gram; empty or NULL text yields an EMPTY array
    (no phantom '' gram polluting the model or scoring)."""
    col = F.col(c) if isinstance(c, str) else c
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: col.substr(i, F.lit(n)))
    return F.when(
        col.isNull() | (F.length(col) == 0), F.array().cast("array<string>")
    ).otherwise(grams)


def char_ngram_counts(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Corpus n-gram model: (gram, cnt) via explode + hash agg.

    The gram build is an interpreted HOF — spread under-partitioned
    (single-file) inputs across the cluster first, guarded so already
    well-partitioned inputs are untouched (docs/TUNING.md)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    return (
        df.select(F.explode(sliding_char_ngrams(text_col, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )


def ngram_logprob(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """(id_col, n_grams, avg_logprob) per document under the corpus
    model with add-``alpha`` smoothing:

    ``P(g) = (cnt(g) + alpha) / (total + alpha * vocab)``

    Empty/NULL documents produce no rows (nothing to score). The two
    model scalars (total mass, vocab size) ride in as a broadcast
    1-row frame — no driver round-trip in the plan. The model is
    persisted here: the totals aggregate and the gram join would
    otherwise each re-evaluate its corpus-wide explode+agg lineage
    (the model table itself is small — bounded by alphabet^n).
    """
    model = model.persist()
    totals = model.agg(
        F.sum("cnt").alias("_total"), F.count("*").alias("_vocab")
    )
    grams = df.select(
        F.col(id_col), F.explode(sliding_char_ngrams(text_col, n)).alias("gram")
    )
    scored = (
        grams.join(model.withColumnRenamed("cnt", "_cnt"), "gram", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("_cnt"), F.lit(0)) + F.lit(alpha))
                / (F.col("_total") + F.lit(alpha) * F.col("_vocab"))
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.round(F.avg("_lp"), 4).alias("avg_logprob"),
    )


def ngram_logprob_micro(
    df: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """Hash-stable integer twin of :func:`ngram_logprob` —
    ``(id_col, lm_grams, lm_sum_micro)`` where each gram contributes
    ``round(ln(P(g)) * 1e6)`` as a BIGINT and the per-document score is
    the EXACT integer sum of those contributions.

    Why this shape (docs/ORACLE_NOTES.md): a double ``sum``/``avg`` of
    log-probabilities is partial-sum-order dependent at the ulp level,
    so it can never hash-match a different engine; rounding each gram's
    (irrational) log-probability to micro-units FIRST and summing the
    resulting integers is order-independent by construction.
    ``round``-to-integer of an irrational is cross-engine safe (the
    shortest decimal repr never straddles .5).

    Scale shape: one corpus explode + one equi-join on the gram
    (broadcast when the model is small — AQE decides) + one hash
    aggregation; the model scalars ride in as a broadcast 1-row frame.
    OOV grams fall back to the smoothed floor so scoring a held-out
    batch is the same plan.

    ``model=None`` (self-scoring, the registry shape) builds the model
    here with :func:`char_ngram_counts`. Either way the MODEL is what
    persists — it is bounded by alphabet^n (tiny next to the corpus,
    so the cache is scale-viable, unlike caching the exploded grams)
    and both the totals aggregate and the scoring join consume it;
    unpersisted, its corpus explode+agg lineage would run twice.
    Persist lifetime is bounded — the cache manager dedups by analyzed
    plan, so repeated registry runs reuse one entry rather than
    accumulating (docs/TUNING.md). At scale, materialize the model to
    parquet once and pass the read-back frame.

    r10 note (negative result, measured): restructuring the
    self-scored path around a persisted per-(doc, gram) count frame —
    one explode instead of two, model as a rollup of it — was BUILT
    and REVERTED: the per-(doc, gram) pre-aggregation adds a full
    high-cardinality shuffle (and a corpus-scale cache), while this
    shape never shuffles gram-level rows at all (the model join is a
    broadcast and the per-doc aggregate is map-side partial) —
    measured +75% warm / +25% cold on the swap. Two cheap map-side
    corpus explodes beat one extra wide exchange.
    """
    if model is None:
        model = char_ngram_counts(df, text_col, n)
    model = model.persist()
    totals = model.agg(
        F.sum("cnt").alias("_total"), F.count("*").alias("_vocab")
    )
    # the sliding-gram build is an interpreted HOF (the CPU stage); a
    # single-file source arrives as ONE partition — spread it first,
    # guarded so well-partitioned inputs are not collapsed (the
    # repetition/multimodal rule, docs/TUNING.md)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    grams = df.select(
        F.col(id_col), F.explode(sliding_char_ngrams(text_col, n)).alias("gram")
    )
    denom = F.col("_total") + F.lit(alpha) * F.col("_vocab")
    lp_micro = (
        F.round(
            F.log((F.coalesce(F.col("_cnt"), F.lit(0)) + F.lit(alpha)) / denom)
            * 1e6
        ).cast("long")
    )
    return (
        grams.join(model.withColumnRenamed("cnt", "_cnt"), "gram", "left")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), lp_micro.alias("_lp_micro"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("lm_grams"),
            F.sum("_lp_micro").alias("lm_sum_micro"),
        )
    )
