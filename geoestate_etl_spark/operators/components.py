"""Connected components over near-duplicate pairs: dedup *clustering*.

Pair-finding (MinHash/SimHash/embedding LSH) yields edges; the
real-world dedup step is grouping transitive duplicates into clusters
and electing one canonical keeper per cluster. This is the engine's
iterative-algorithm surface (genuinely not single-query SQL): the
alternating small-star/large-star style label propagation —
every node repeatedly adopts the minimum label in its neighborhood
until a fixed point.

Scale shape per iteration: one groupBy (min label per node) + two
joins (propagate along edges, then pointer-jump) — all shuffles on
node id. The pointer-jump makes convergence O(log diameter), so the
default 20 iterations cover components with diameters up to ~2^20 —
plain one-hop propagation would need O(diameter) rounds and silently
under-merge long chains. ``localCheckpoint`` truncates the growing
lineage each iteration, which keeps deep iterative plans compilable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve (id_a, id_b) edges into (id, component) where component
    is the minimum id reachable from ``id`` — deterministic labels.

    Returns ONLY nodes that appear in at least one pair (singletons
    are trivially their own component; callers union them in if
    needed).
    """
    edges = (
        pairs.select(
            F.col(left_col).alias("src"), F.col(right_col).alias("dst")
        )
        .union(
            pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst"))
        )
        .distinct()
        .persist()
    )

    # start: every node labeled with the min of itself and its neighbors
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("component"))
        .withColumnRenamed("src", "id")
    )
    labels = labels.select(
        "id", F.least("id", "component").alias("component")
    ).localCheckpoint()

    for _ in range(max_iter):
        # propagate: each node adopts min(own label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
            .withColumnRenamed("src", "id")
        )
        propagated = labels.join(neighbor_labels, "id", "left").select(
            "id",
            F.least("component", F.coalesce("n_comp", "component")).alias(
                "component"
            ),
        )
        # pointer-jump (path halving): also adopt the label OF my label.
        # Neighbor propagation alone moves labels one hop per round
        # (O(diameter) rounds — a long chain would not converge within
        # max_iter); combined with jumping, convergence is O(log n).
        parents = propagated.select(
            F.col("id").alias("component"), F.col("component").alias("parent")
        )
        new_labels = (
            propagated.join(parents, "component", "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("parent", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    edges.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    scores: DataFrame | None = None,
) -> DataFrame:
    """Cluster summary from near-dup pairs: one row per component with
    the canonical keeper and member count.

    Default keeper = component min id (cheap, deterministic). With
    ``scores`` — a (id, score) frame, e.g. ``quality_score`` over the
    documents — the keeper is the member with the highest score
    (production near-dup pipelines keep the *best* copy, not the
    first); ties and unscored members fall back toward min id via
    ``max_by`` on a (score, -id) ordering, so the choice stays
    deterministic. One extra equi-join on id, still no row_number
    window over the corpus.
    """
    cc = connected_components(pairs, left_col, right_col)
    if scores is None:
        return cc.groupBy("component").agg(
            F.min("id").alias("keeper_id"), F.count("*").alias("cluster_size")
        )
    scored = cc.join(scores, "id", "left").withColumn(
        "_rank", F.struct(F.coalesce("score", F.lit(float("-inf"))), -F.col("id"))
    )
    return scored.groupBy("component").agg(
        F.max_by("id", "_rank").alias("keeper_id"),
        F.count("*").alias("cluster_size"),
    )
