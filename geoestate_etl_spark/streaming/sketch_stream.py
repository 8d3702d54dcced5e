"""Streaming frequency sketch: a standing count-min store maintained
per micro-batch epoch (heavy-hitter serving over an unbounded stream).

The CMS counter matrix is linear (:func:`operators.sketches.cms_merge`)
so the stream never updates state in place: each epoch writes its OWN
delta sketch — d·w rows regardless of batch size — to
``sketch_dir/epoch=N`` (overwrite, so a retried micro-batch replaces
its own delta and the fold stays exact: the corpus-ingest
epoch-idempotency pattern applied to sketch state). The standing
sketch is the SUM over epoch partitions, read-time merged; queries
estimate against it without touching any event history.

Scale notes: per-epoch state is d·w counters (a few KB) no matter how
many events the batch carried — the whole point of sketching the
stream instead of aggregating it; the merge is one groupBy over
epochs·d·w rows. Old epochs can be compacted into one partition with
the same ``cms_merge`` whenever the epoch count grows — linearity
makes compaction exact, not lossy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoestate_etl_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
    hll_build,
    hll_estimate,
    hll_merge,
)


def _write_meta(sketch_dir: str, depth: int, width: int) -> None:
    import json
    import os

    os.makedirs(sketch_dir, exist_ok=True)
    meta_path = os.path.join(sketch_dir, "_cms_meta.json")
    meta = {"depth": depth, "width": width}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = json.load(f)
        if existing != meta:
            raise ValueError(
                f"sketch store at {sketch_dir} was built with "
                f"{existing}, refusing to mix in deltas with {meta}"
            )
        return
    with open(meta_path, "w") as f:
        json.dump(meta, f)


def _check_meta(sketch_dir: str, depth: int | None, width: int | None) -> tuple[int, int]:
    """Read the store's (depth, width); validate the caller's params
    against them. A probe computed with the wrong width lands in the
    wrong buckets and min() returns 0 — silently DESTROYING the
    never-underestimates guarantee (r4 review finding) — so a
    mismatch must fail fast, and omitted params adopt the store's."""
    import json
    import os

    with open(os.path.join(sketch_dir, "_cms_meta.json")) as f:
        meta = json.load(f)
    for name, given in (("depth", depth), ("width", width)):
        if given is not None and given != meta[name]:
            raise ValueError(
                f"sketch store {sketch_dir} has {name}={meta[name]}, "
                f"query asked for {given}"
            )
    return meta["depth"], meta["width"]


def sketch_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    key_col: str,
    sketch_dir: str,
    depth: int = 4,
    width: int = 256,
) -> None:
    """One micro-batch: build the delta sketch, overwrite this epoch's
    partition. Idempotent on retry — the epoch's previous delta is
    replaced, never double-counted. The store's (depth, width) are
    pinned in ``_cms_meta.json`` on first write; later writers and
    readers are validated against it."""
    _write_meta(sketch_dir, depth, width)
    cms_build(batch_df, key_col, depth, width).write.mode(
        "overwrite"
    ).parquet(f"{sketch_dir}/epoch={epoch_id}")


def sketch_sink(
    events_stream: DataFrame,
    key_col: str,
    sketch_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 256,
):
    """``writeStream.foreachBatch`` wiring for :func:`sketch_epoch` —
    returns the DataStreamWriter (caller ``.start()``s it)."""

    def run(df: DataFrame, epoch_id: int) -> None:
        sketch_epoch(df, epoch_id, key_col, sketch_dir, depth, width)

    return (
        events_stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def hll_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    key_col: str,
    hll_dir: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> None:
    """Distinct-count twin of :func:`sketch_epoch`: one ~2^lg_k-byte
    HLL sketch per group per epoch, overwrite-own-epoch idempotent.
    Answers "distinct keys per group over the whole stream" without
    retaining keys — the CMS store counts frequency mass, this counts
    cardinality; both fold at read time."""
    hll_build(batch_df, key_col, group_cols, lg_k).write.mode(
        "overwrite"
    ).parquet(f"{hll_dir}/epoch={epoch_id}")


def standing_distinct(spark: SparkSession, hll_dir: str) -> DataFrame:
    """Per-group distinct estimates over every committed epoch delta.
    Accuracy is the store's lg_k rsd — the DataSketches union path is
    within-rsd of a direct build, not bit-identical (see
    :func:`operators.sketches.hll_build`); mismatched lg_k deltas
    raise inside ``hll_union_agg``."""
    deltas = spark.read.parquet(hll_dir).drop("epoch")
    return hll_estimate(hll_merge(deltas))


def standing_sketch(
    spark: SparkSession,
    sketch_dir: str,
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """The merged standing sketch over every committed epoch delta.
    Params, when given, are validated against the store's pinned
    metadata (mismatch raises)."""
    _check_meta(sketch_dir, depth, width)
    deltas = spark.read.parquet(sketch_dir).select("depth", "bucket", "cnt")
    return cms_merge(deltas)


def heavy_hitters(
    spark: SparkSession,
    sketch_dir: str,
    keys: DataFrame,
    key_col: str,
    min_count: int,
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Estimated-frequency filter over candidate ``keys`` against the
    standing sketch: ``(key, est)`` where est ≥ min_count. CMS never
    underestimates, so recall is 1.0 by construction; collisions can
    only ADD false positives (bounded by the sketch width), never drop
    a true heavy hitter — the safe direction for a candidate filter.

    ``depth``/``width`` default to the STORE's pinned parameters (and
    are validated when given): probing with the wrong width would put
    every probe in the wrong bucket and silently estimate 0.
    """
    depth, width = _check_meta(sketch_dir, depth, width)
    est = cms_estimate(
        standing_sketch(spark, sketch_dir), keys, key_col, depth, width
    )
    return est.filter(F.col("est") >= min_count)


# --- Bloom membership store (late-r4) ---------------------------------------
# The third member of the mergeable-delta family: CMS counts frequency
# mass, HLL counts cardinality, Bloom answers MEMBERSHIP ("seen this
# fingerprint in ANY epoch?") in ~1 byte/element — the standing state
# for unbounded-history streaming dedup where a watermarked state
# store would grow without bound. bit_or linearity makes the fold
# exact: merged epochs == one filter built over the union (pinned in
# test_bloom), so compaction is lossless, like the CMS store.
# Direction of error: a probe can say "seen" for a novel element at
# the filter's FP rate (novel work skipped, rate is sized by
# num_words) but NEVER says "novel" for a seen one — duplicates can't
# sneak back in.


def _bloom_meta(bloom_dir: str, num_words: int | None, k: int | None) -> tuple[int, int]:
    import json
    import os

    meta_path = os.path.join(bloom_dir, "_bloom_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        for name, given in (("num_words", num_words), ("k", k)):
            if given is not None and given != meta[name]:
                raise ValueError(
                    f"bloom store {bloom_dir} has {name}={meta[name]}, "
                    f"caller asked for {given} — a mismatched probe "
                    "hashes into the wrong words and silently loses "
                    "the no-false-negative guarantee"
                )
        return meta["num_words"], meta["k"]
    if num_words is None or k is None:
        raise FileNotFoundError(f"no bloom store at {bloom_dir}")
    os.makedirs(bloom_dir, exist_ok=True)
    with open(meta_path, "w") as f:
        json.dump({"num_words": num_words, "k": k}, f)
    return num_words, k


def bloom_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    key_col: str,
    bloom_dir: str,
    num_words: int = 1 << 16,
    k: int = 4,
) -> None:
    """One micro-batch: build this epoch's delta filter, overwrite its
    own partition (retry-idempotent, the sketch_epoch contract).
    (num_words, k) are pinned in ``_bloom_meta.json`` on first write."""
    from geoestate_etl_spark.operators.bloom import bloom_build

    num_words, k = _bloom_meta(bloom_dir, num_words, k)
    bloom_build(batch_df, key_col, num_words, k).write.mode(
        "overwrite"
    ).parquet(f"{bloom_dir}/epoch={epoch_id}")


def bloom_sink(
    stream: DataFrame,
    key_col: str,
    bloom_dir: str,
    checkpoint_dir: str,
    num_words: int = 1 << 16,
    k: int = 4,
):
    """``writeStream.foreachBatch`` wiring for :func:`bloom_epoch` —
    returns the DataStreamWriter (caller ``.start()``s it)."""

    def run(df: DataFrame, epoch_id: int) -> None:
        bloom_epoch(df, epoch_id, key_col, bloom_dir, num_words, k)

    return (
        stream.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def standing_membership(spark: SparkSession, bloom_dir: str) -> DataFrame:
    """The merged filter over every committed epoch delta — exactly
    the filter one build over all epochs' inputs would produce
    (bit_or linearity). ≤ num_words rows however long the stream has
    run; compact old epochs with the same merge whenever the epoch
    count grows."""
    from geoestate_etl_spark.operators.bloom import bloom_merge

    _bloom_meta(bloom_dir, None, None)
    return bloom_merge(spark.read.parquet(bloom_dir).select("word_idx", "bits"))


def split_seen(
    df: DataFrame,
    col: str,
    spark: SparkSession,
    bloom_dir: str,
) -> tuple[DataFrame, DataFrame]:
    """(probably_seen, definitely_novel) against the standing filter.

    ``definitely_novel`` NEVER contains an element any epoch inserted
    (the anti-join of a no-false-negative probe); ``probably_seen``
    carries the filter's FP rate of actually-novel rows — the side a
    dedup ingest drops, trading that bounded loss for O(num_words)
    standing state instead of O(history)."""
    from geoestate_etl_spark.operators.bloom import bloom_probe

    num_words, k = _bloom_meta(bloom_dir, None, None)
    standing = standing_membership(spark, bloom_dir)
    seen = bloom_probe(df, col, standing, num_words, k)
    key = F.col(col)
    novel = df.join(seen.select(key.alias("_s")), key == F.col("_s"), "left_anti")
    return seen, novel
