"""Entity resolution: blocking → pairwise scoring → transitive
clustering → survivorship.

The classic record-linkage pipeline, composed from this engine's
dedup primitives. Structure (and the reason each stage exists at
100 TB):

1. **Blocking** — candidate pairs come from an EQUI-join on a cheap
   blocking key (default: Soundex of the normalized name — the
   standard phonetic blocker, built into Spark), never an all-pairs
   comparison. Hot blocks (e.g. a default/placeholder name shared by
   millions of records) are capped with the same audited guard the
   LSH paths use (``dedup.cap_hot_buckets``).
2. **Scoring** — exact char-n-gram Jaccard on the normalized names,
   computed only for candidates. Pure Column expressions.
3. **Clustering** — matches are transitive ("J Smith" ~ "Jon Smith" ~
   "John Smith"): pointer-jumping connected components labels each
   record with its entity (O(log diameter) rounds).
4. **Survivorship** — one golden record per entity: the most COMPLETE
   member (most non-null attributes), ties to the smallest id, chosen
   with one ``max_by`` aggregate — no window over the corpus.

The reference has no fuzzy-matching surface (its dedup is implicit in
ClickHouse keys); this is part of the added training-data/ETL tier
(SURVEY §2 extensions) built on `pair_similarity`'s primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.text import char_ngrams, normalize_text
from geoestate_etl_spark.operators.components import connected_components
from geoestate_etl_spark.operators.dedup import cap_hot_buckets

__all__ = ["candidate_pairs", "resolve_entities", "link_records"]


def candidate_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    blocking_key: Column | None = None,
    ngram: int = 3,
    threshold: float = 0.6,
    max_block_size: int | None = 1024,
) -> DataFrame:
    """Scored match candidates ``(id_a, id_b, jaccard)`` with
    ``id_a < id_b``, from a blocked equi-self-join.

    ``blocking_key`` defaults to Soundex of the normalized name; pass a
    custom Column to block on zip+initial, registered domain, etc.
    Records sharing a block are scored by char-``ngram`` Jaccard of the
    normalized names and kept at/above ``threshold``. NULL/empty names
    never match (a NULL blocking key drops out of the equi-join, the
    same convention as the LSH paths).
    """
    key = (
        F.soundex(normalize_text(F.col(name_col)))
        if blocking_key is None
        else blocking_key
    )
    base = df.select(
        F.col(id_col).alias("id"),
        normalize_text(F.col(name_col)).alias("_nm"),
        key.alias("_blk"),
    ).filter(F.col("_blk").isNotNull() & (F.length("_nm") > 0))
    base = cap_hot_buckets(base, ["_blk"], max_block_size)
    left, right = base.alias("l"), base.alias("r")
    cand = left.join(
        right,
        (F.col("l._blk") == F.col("r._blk")) & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        char_ngrams(F.col("l._nm"), ngram).alias("_ga"),
        char_ngrams(F.col("r._nm"), ngram).alias("_gb"),
    )
    inter = F.size(F.array_intersect("_ga", "_gb"))
    union = F.size(F.array_union("_ga", "_gb"))
    return (
        cand.withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .dropDuplicates(["id_a", "id_b"])  # multi-valued custom keys may
        # block the same pair twice; scores are equal, keep one
    )


def link_records(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_name: str,
    right_name: str,
    blocking_key=None,
    ngram: int = 3,
    threshold: float = 0.6,
    max_pairs_per_block: int | None = 65536,
) -> DataFrame:
    """Two-table record linkage: ``(left_id, right_id, jaccard)`` for
    every cross-table candidate at/above ``threshold``.

    Same blocked filter-and-refine as :func:`candidate_pairs`, but the
    join is LEFT-table-block vs RIGHT-table-block (the classic "match
    our customer file against the partner's counterparty file" shape)
    — no self-pairs, no id ordering. ``blocking_key`` is a FUNCTION of
    a name Column (default Soundex∘normalize) so both sides derive
    comparable keys from their own column names.

    The hot-block guard caps the PRODUCT |L_b|·|R_b| per block — the
    actual pair volume a block contributes, which one-sided occupancy
    caps miss (1 left × 1M right is as quadratic as 1k × 1k). Capped
    blocks are dropped whole; audit by recomputing the block counts.
    """
    kf = (
        (lambda c: F.soundex(normalize_text(c)))
        if blocking_key is None
        else blocking_key
    )

    def side(df, id_c, name_c, tag):
        return df.select(
            F.col(id_c).alias(f"{tag}_id"),
            normalize_text(F.col(name_c)).alias(f"_nm_{tag}"),
            kf(F.col(name_c)).alias("_blk"),
        ).filter(F.col("_blk").isNotNull() & (F.length(f"_nm_{tag}") > 0))

    ls, rs = side(left, left_id, left_name, "l"), side(right, right_id, right_name, "r")
    if max_pairs_per_block is not None:
        counts = (
            ls.groupBy("_blk").agg(F.count("*").alias("_ln"))
            .join(rs.groupBy("_blk").agg(F.count("*").alias("_rn")), "_blk")
            .filter(F.col("_ln") * F.col("_rn") > max_pairs_per_block)
            .select("_blk")
        )
        ls = ls.join(F.broadcast(counts), "_blk", "left_anti")
        rs = rs.join(F.broadcast(counts), "_blk", "left_anti")
    cand = ls.join(rs, "_blk").select(
        "l_id",
        "r_id",
        char_ngrams(F.col("_nm_l"), ngram).alias("_ga"),
        char_ngrams(F.col("_nm_r"), ngram).alias("_gb"),
    )
    inter = F.size(F.array_intersect("_ga", "_gb"))
    union = F.size(F.array_union("_ga", "_gb"))
    return (
        cand.withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1)), 4))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            "jaccard",
        )
        .dropDuplicates([left_id, right_id])
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    completeness_cols: list[str] | None = None,
    blocking_key: Column | None = None,
    ngram: int = 3,
    threshold: float = 0.6,
    max_block_size: int | None = 1024,
    pairs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(assignments, golden)``.

    ``assignments``: every input row plus ``entity_id`` — the smallest
    id reachable through the match graph (records matching nothing are
    their own entity). ``golden``: one surviving row per entity, the
    most complete member (non-null count over ``completeness_cols``,
    default: every column), ties to the smallest id — the standard
    survivorship rule, computed with a single ``max_by`` aggregate.

    Pass a precomputed ``pairs`` frame to reuse scored candidates
    across consumers (same contract as ``semantic_dedup``).
    """
    if pairs is None:
        pairs = candidate_pairs(
            df, id_col, name_col, blocking_key, ngram, threshold, max_block_size
        )
    cc = connected_components(pairs.select("id_a", "id_b"))
    assignments = df.join(
        cc.select(F.col("id").alias(id_col), F.col("component")),
        id_col,
        "left",
    ).withColumn(
        "entity_id", F.coalesce("component", F.col(id_col))
    ).drop("component")

    cols = completeness_cols or [c for c in df.columns if c != id_col]
    completeness = sum(
        (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in cols), F.lit(0)
    )
    # min_by on (−completeness, id): struct ordering is lexicographic
    # and type-agnostic, so the id tiebreaker works for string ids too
    # (negating the id column would ANSI-crash on non-numeric ids)
    ranked = assignments.withColumn(
        "_rank", F.struct((-completeness).alias("c"), F.col(id_col).alias("t"))
    )
    golden = (
        ranked.groupBy("entity_id")
        .agg(F.min_by(F.struct(*df.columns), "_rank").alias("_row"))
        .select("entity_id", "_row.*")
    )
    return assignments, golden
