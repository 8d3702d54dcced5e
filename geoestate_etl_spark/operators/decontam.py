"""Benchmark decontamination: remove training documents that overlap
an evaluation/benchmark set by shared word n-grams.

The standard LLM-corpus hygiene step (GPT-3 appendix C popularized
13-gram overlap): a training document is *contaminated* if any of its
word n-grams also occurs in the benchmark set. At corpus scale the
shape matters more than the arithmetic:

- the benchmark side is SMALL (eval sets are MBs, the corpus is TBs)
  — its distinct n-gram hash set broadcasts, so flagging the corpus
  is a map-side broadcast join over the exploded grams: no shuffle of
  corpus data at all;
- grams travel as 64-bit ``xxhash64`` values, never strings — the
  exploded corpus side is (doc_id, int64), ~16 bytes a gram instead
  of ~60+ for the text;
- the only shuffle is the per-doc hit count over matched grams
  (a tiny fraction of the corpus), then a broadcast/bloom-prunable
  left-anti join back onto the documents.

Tokenization is deliberately simple and engine-portable (lowercase,
non-alphanumeric → space, split) so the DuckDB oracle can reproduce
it exactly; swap in a real tokenizer per corpus as needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngram_hashes(
    df: DataFrame, text_col: str, id_col: str, n: int = 8
) -> DataFrame:
    """Distinct (``id_col``, gram_hash) for every word ``n``-gram.

    Grams are built JVM-side: regex normalize → split → a
    ``transform(sequence(...))`` sliding window, hashed with
    ``xxhash64`` — whole-stage-codegen friendly, no Python in the
    path. Documents shorter than ``n`` words yield no rows (they
    cannot be contaminated at this n).

    Within-document repeats are removed by ``array_distinct`` BEFORE
    the explode: a (doc_id, gram) pair can only repeat within one
    document, so deduping inside the array makes the exploded output
    globally distinct with zero shuffle — a ``.distinct()`` here would
    shuffle every gram of the corpus, the dominant cost at scale.
    """
    words = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " "), " "),
        lambda x: x != "",
    )
    # sequence() flips direction when start > stop, so guard short docs
    grams = F.when(
        F.size("_w") >= n,
        F.expr(
            f"transform(sequence(1, size(_w) - {n} + 1),"
            f" i -> xxhash64(concat_ws(' ', slice(_w, i, {n}))))"
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(F.col(id_col), words.alias("_w")).select(
        id_col, F.explode(F.array_distinct(grams)).alias("gram_hash")
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bench_text_col: str | None = None,
) -> DataFrame:
    """(``id_col``, n_shared) for every training doc sharing at least
    one word n-gram with ``benchmark`` — n_shared counts its distinct
    overlapping grams (triage signal: 1 gram may be an idiom, 50 is a
    leaked passage)."""
    bench_grams = (
        word_ngram_hashes(
            benchmark, bench_text_col or text_col, id_col, n
        )
        .select("gram_hash")
        .distinct()
    )
    doc_grams = word_ngram_hashes(docs, text_col, id_col, n)
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram_hash")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def contamination_report_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bench_text_col: str | None = None,
    num_words: int = 1 << 16,
) -> DataFrame:
    """:func:`contamination_report` with a split-block Bloom pre-gate
    (`operators/bloom.py`) between the corpus grams and the exact
    benchmark join.

    Same answer as the exact path BY CONSTRUCTION (the Bloom filter
    never drops a true member; its false positives are removed by the
    exact join that follows) — certified by the `bloom` variant of
    the `decontaminate` driver query hash-matching the exact
    variant's oracle. The point is scale headroom: the exact distinct
    gram set costs 8 bytes an entry to broadcast, the filter ~1 byte,
    so a benchmark battery too big for the exact broadcast still gets
    a map-only first pass, and only the FP-rate-bounded survivor
    stream reaches the exact (now much smaller) join.
    """
    from geoestate_etl_spark.operators.bloom import bloom_build, bloom_probe

    bench_grams = (
        word_ngram_hashes(benchmark, bench_text_col or text_col, id_col, n)
        .select("gram_hash")
        .distinct()
    )
    bf = bloom_build(bench_grams, "gram_hash", num_words)
    doc_grams = word_ngram_hashes(docs, text_col, id_col, n)
    candidates = bloom_probe(doc_grams, "gram_hash", bf, num_words)
    return (
        candidates.join(F.broadcast(bench_grams), "gram_hash")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    max_shared: int = 0,
) -> DataFrame:
    """Training docs with more than ``max_shared`` benchmark n-grams
    removed (default: any overlap removes). Left-anti join on id —
    the flagged set is small, so AQE turns it into a broadcast."""
    flagged = contamination_report(
        docs, benchmark, text_col, id_col, n
    ).filter(F.col("n_shared") > max_shared)
    return docs.join(flagged.select(id_col), id_col, "left_anti")


def semantic_contamination_report(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    scale: int = 4,
) -> DataFrame:
    """Embedding-level decontamination: ``(id_col, bench_id, cos_sim)``
    for every corpus vector within ``threshold`` cosine of SOME
    benchmark vector — the leakage class n-gram overlap cannot see
    (paraphrased eval items, translations, light rewrites).

    Same scale shape as the n-gram tier: the benchmark side is small
    and BROADCASTS (L2-normalized once, so each candidate pair costs
    one dot product — the SemDeDup norm-hoist discipline); the corpus
    streams through in ONE pass with no pre-join shuffle, and only
    pairs at/above threshold reach the per-doc reduction. Keeps the
    single closest benchmark item per flagged doc (max cos_sim,
    min bench id on ties) as review evidence. Scores are rounded to
    ``scale`` dp with -0.0 normalized, so results are deterministic
    across partitionings.

    Compose with :func:`contamination_report` the way `run_corpus`
    uses it: flag → anti-join ids out of the survivor set.
    """
    from geoestate_etl_spark.functions.vectors import to_double_array

    def _unit(c):
        x = to_double_array(c)
        n = F.sqrt(F.aggregate(x, F.lit(0.0), lambda a, v: a + v * v))
        return F.when(n == 0, x).otherwise(
            F.transform(x, lambda v: v / n)
        )

    # the per-pair dot is an interpreted HOF over |corpus|×|bench|
    # rows — spread an under-partitioned (single-file) corpus first,
    # guarded so well-partitioned production inputs are untouched
    # (the repetition/multimodal rule, docs/TUNING.md)
    parallelism = corpus_emb.sparkSession.sparkContext.defaultParallelism
    if corpus_emb.rdd.getNumPartitions() < parallelism:
        corpus_emb = corpus_emb.repartition(parallelism)
    corpus = corpus_emb.select(F.col(id_col), _unit(vec_col).alias("_u"))
    bench = bench_emb.select(F.col(bench_id_col), _unit(vec_col).alias("_bu"))
    dot = F.aggregate(
        F.zip_with("_u", "_bu", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        corpus.crossJoin(F.broadcast(bench))
        .select(
            id_col,
            bench_id_col,
            (F.round(dot, scale) + 0.0).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= F.lit(float(threshold)))
    )
    return pairs.groupBy(id_col).agg(
        F.max_by(
            bench_id_col, F.struct(F.col("cos_sim"), -F.col(bench_id_col))
        ).alias(bench_id_col),
        F.max("cos_sim").alias("cos_sim"),
    )
