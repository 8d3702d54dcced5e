"""Exact-substring deduplication — repeated-span detection + masking.

The Lee et al. 2022 result ("Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499): long token spans that
repeat ACROSS documents (licence boilerplate, templated headers,
syndicated paragraphs) should be removed even when the documents as a
whole are unique — document-level near-dup removal never sees them.
The published implementation builds a corpus-wide suffix array; the
scalable Spark re-expression here hashes every n-token window and
finds windows whose hash occurs in more than one document:

1. tokenize once; per document, one higher-order pass emits the
   rolling window hashes WITH their positions (the positional sibling
   of ``dedup.shingle_ids`` — same 31-bit word hashes, same masked
   ``acc*31+term`` combine);
2. one hash-aggregate over (window_hash) counts DISTINCT documents —
   windows repeated within a single document are repetition, not
   cross-document boilerplate, and stay (``functions.text.
   repetition_ratios`` owns that signal);
3. repeated window STARTS explode to their covered token positions
   (bounded by the volume of repeated content, not corpus size), and
   masking is an anti-join on (doc, position) + one ordered
   re-aggregation per document.

Hash collisions (64-bit over ~31·n bits of content) can only cause a
false REMOVAL at ~2^-32 rates — acceptable for corpus hygiene; the
suffix-array formulation is exact but needs a global sort the size of
the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.functions.text import normalize_text

__all__ = ["window_hashes", "repeated_spans", "mask_repeated_spans"]


def _token_arr(c: Column) -> Column:
    return F.split(normalize_text(c), " ")


def window_hashes(text_col: Column | str, n: int) -> Column:
    """``array<struct<pos:int, h:long>>`` — the hash of every n-token
    window, positions 0-based; empty array for docs shorter than n
    (a short doc cannot carry an n-token repeated span)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    words = _token_arr(col)
    wh = F.transform(words, lambda w: F.xxhash64(w).bitwiseAND(F.lit(0x7FFFFFFF)))
    m = F.size(wh)
    idx = F.when(m >= n, F.sequence(F.lit(0), m - n)).otherwise(
        F.array().cast(T.ArrayType(T.IntegerType()))
    )
    acc_mask = F.lit(0x01FFFFFFFFFFFFFF).cast(T.LongType())

    def combine(i: Column) -> Column:
        acc = F.lit(0).cast(T.LongType())
        for off in range(n):
            term = F.coalesce(
                F.try_element_at(wh, (i + off + 1).cast("int")), F.lit(0)
            )
            acc = (acc * 31 + term).bitwiseAND(acc_mask)
        return acc

    return F.transform(
        idx, lambda i: F.struct(i.cast("int").alias("pos"), combine(i).alias("h"))
    )


def repeated_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 20
) -> DataFrame:
    """``(id, pos)`` — start positions of n-token windows whose content
    occurs in MORE THAN ONE document."""
    spans = df.select(
        F.col(id_col).alias("id"),
        F.explode(window_hashes(text_col, n)).alias("s"),
    ).select("id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    # distinct docs per window content; array_distinct-free because the
    # aggregate is over (h) with countDistinct(id)
    shared = (
        spans.groupBy("h")
        .agg(F.count_distinct("id").alias("_docs"))
        .filter(F.col("_docs") > 1)
        .select("h")
    )
    return spans.join(shared, "h", "semi").select("id", "pos")


def mask_repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 20,
    spans: DataFrame | None = None,
) -> DataFrame:
    """Rewrite ``text_col`` with every cross-document repeated n-token
    span removed (whole covered tokens dropped; surviving tokens
    rejoin in order, single-spaced over the normalized text). Returns
    the input columns with ``text_col`` replaced and ``n_masked``
    (tokens removed) appended.

    Pass a precomputed ``spans`` frame (from :func:`repeated_spans`)
    to share the window scan across consumers.
    """
    if spans is None:
        spans = repeated_spans(df, id_col, text_col, n)
    covered = spans.select(
        F.col("id"),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("tpos"),
    ).distinct()
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_token_arr(F.col(text_col))).alias("tpos", "tok"),
    )
    kept = toks.join(covered, ["id", "tpos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("tpos"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("_new_text"),
        F.count("*").alias("_n_kept"),
    )
    n_toks = F.size(_token_arr(F.col(text_col)))
    out = (
        df.join(rebuilt, F.col(id_col) == F.col("id"), "left")
        .drop("id")
        .withColumn(
            "n_masked",
            (n_toks - F.coalesce(F.col("_n_kept"), F.lit(0))).cast("int"),
        )
        .withColumn(text_col, F.coalesce(F.col("_new_text"), F.lit("")))
        .drop("_new_text", "_n_kept")
    )
    return out
