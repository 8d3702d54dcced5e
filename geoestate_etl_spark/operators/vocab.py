"""Vocabulary construction and token-id encoding — the step between
text cleaning and tensorization in a training-data pipeline.

Spark shapes:

- ``build_vocab`` is the canonical word-count: one explode, one
  hash aggregation (map-side partial combine for free), then dense
  frequency-ranked ids via the engine's range-partition renumbering —
  no global single-task sort, no driver-side vocabulary dict.
- ``encode_docs`` re-tokenizes with ``posexplode``, equi-joins the
  vocab on token (AQE broadcasts it when it's small; at 100 TB the
  join shuffles on `token`, whose distribution the min_count filter
  has already flattened), and reassembles per-document id arrays by
  sorting (position, id) structs inside the row — the only shuffle of
  document-sized data is the single groupBy(doc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.text import TOKEN_PATTERN
from geoestate_etl_spark.operators.windows import renumber_scalable

#: id reserved for out-of-vocabulary tokens in encode_docs
OOV_ID = 0


def tokenize(c: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """Token array via the engine's BPE-ish regex (JVM-side)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(col, F.lit(pattern), F.lit(0))


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_size: int | None = None,
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """(token, n, vocab_id) with ids 1..V dense by (count desc, token)
    — deterministic; id 0 is reserved for OOV/padding.

    ``max_size`` keeps the top-V tokens (tie-broken by token text, so
    truncation is deterministic too) via TakeOrdered, not a full sort.
    """
    counts = (
        df.select(F.explode(tokenize(text_col, pattern)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    if max_size is not None:
        counts = counts.orderBy(F.desc("n"), "token").limit(max_size)
    ranked = renumber_scalable(
        counts.withColumn("_sk", F.struct(-F.col("n"), F.col("token"))),
        "_sk",
        "vocab_id",
    )
    return ranked.drop("_sk")


def encode_docs(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """(id_col, token_ids) — each document as an array of vocab ids in
    token order; OOV tokens map to :data:`OOV_ID`."""
    # *_outer keeps empty documents (they must encode to [], not vanish);
    # their (null pos) marker row is dropped inside the aggregate by
    # collect_list ignoring null elements.
    pos = df.select(
        F.col(id_col),
        F.posexplode_outer(tokenize(text_col, pattern)).alias("pos", "token"),
    )
    joined = pos.join(vocab.select("token", "vocab_id"), "token", "left")
    element = F.when(
        F.col("pos").isNotNull(),
        F.struct(F.col("pos"), F.coalesce("vocab_id", F.lit(OOV_ID)).alias("vid")),
    )
    return joined.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(element)), lambda x: x["vid"]
        ).alias("token_ids")
    )
