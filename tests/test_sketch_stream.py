"""Streaming CMS store: the standing sketch folded over real
micro-batch epochs must equal the one-pass batch build bit-for-bit,
epoch retries must be idempotent, and heavy-hitter recall must be 1.0
(CMS never underestimates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.sketches import cms_build
from geoestate_etl_spark.streaming.sketch_stream import (
    heavy_hitters,
    sketch_epoch,
    sketch_sink,
    standing_sketch,
)
from tests.conftest import SF_SMOKE


def _events(spark):
    from geoestate_etl_spark.sources.parquet_io import load_events

    return load_events(spark, SF_SMOKE).select("user_id", "event_type")


def test_stream_folds_to_batch_sketch(spark, tmp_path):
    events = _events(spark)
    src = str(tmp_path / "ev_src")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sketch_dir = str(tmp_path / "sketches")
    q = sketch_sink(
        stream,
        "event_type",
        sketch_dir,
        str(tmp_path / "ckpt"),
    ).start()
    try:
        q.processAllAvailable()
        assert q.lastProgress["batchId"] >= 2  # multiple real epochs
    finally:
        q.stop()

    merged = sorted(
        map(tuple, standing_sketch(spark, sketch_dir).collect())
    )
    full = sorted(map(tuple, cms_build(events, "event_type").collect()))
    assert merged == full  # linearity through real micro-batches

    # heavy hitters: estimates over the standing store never
    # undercount, so every key at/above the threshold is returned
    truth = {
        r.event_type: r.cnt
        for r in events.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    keys = events.select("event_type").distinct()
    thresh = sorted(truth.values())[len(truth) // 2]  # median count
    hh = {
        r.event_type: r.est
        for r in heavy_hitters(
            spark, sketch_dir, keys, "event_type", thresh
        ).collect()
    }
    for k, c in truth.items():
        if c >= thresh:
            assert k in hh and hh[k] >= c


def test_epoch_retry_idempotent(spark, tmp_path):
    events = _events(spark)
    sketch_dir = str(tmp_path / "sk")
    b0 = events.filter(F.col("user_id") % 2 == 0)
    b1 = events.filter(F.col("user_id") % 2 == 1)
    sketch_epoch(b0, 0, "event_type", sketch_dir)
    sketch_epoch(b1, 1, "event_type", sketch_dir)
    once = sorted(map(tuple, standing_sketch(spark, sketch_dir).collect()))
    # a micro-batch RETRY re-runs the same epoch: state must not
    # double-count (the overwrite-own-epoch contract)
    sketch_epoch(b1, 1, "event_type", sketch_dir)
    twice = sorted(map(tuple, standing_sketch(spark, sketch_dir).collect()))
    assert once == twice
    full = sorted(map(tuple, cms_build(events, "event_type").collect()))
    assert once == full


def test_hll_epoch_store(spark, tmp_path):
    """Distinct-count twin: per-epoch HLL deltas fold to within-rsd of
    the exact per-group distincts, and an epoch retry is idempotent."""
    from geoestate_etl_spark.streaming.sketch_stream import (
        hll_epoch,
        standing_distinct,
    )

    events = _events(spark)
    hll_dir = str(tmp_path / "hll")
    b0 = events.filter(F.col("user_id") % 2 == 0)
    b1 = events.filter(F.col("user_id") % 2 == 1)
    hll_epoch(b0, 0, "user_id", hll_dir, ["event_type"])
    hll_epoch(b1, 1, "user_id", hll_dir, ["event_type"])
    hll_epoch(b1, 1, "user_id", hll_dir, ["event_type"])  # retry
    got = {
        r.event_type: r.n_distinct
        for r in standing_distinct(spark, hll_dir).collect()
    }
    truth = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(truth)
    for k, n in truth.items():
        assert abs(got[k] - n) <= max(0.05 * n, 2)


def test_bloom_membership_store(spark, tmp_path):
    """The membership member of the delta family: per-epoch filters
    fold to the exact union filter, retry is idempotent, split_seen
    never calls an inserted element novel, and param mismatch fails
    fast."""
    import pytest as _pytest

    from geoestate_etl_spark.operators.bloom import bloom_build
    from geoestate_etl_spark.streaming.sketch_stream import (
        bloom_epoch,
        split_seen,
        standing_membership,
    )

    bloom_dir = str(tmp_path / "bloom")
    b0 = spark.range(0, 4000).select(F.col("id").alias("fp"))
    b1 = spark.range(4000, 9000).select(F.col("id").alias("fp"))
    bloom_epoch(b0, 0, "fp", bloom_dir, num_words=1 << 10)
    bloom_epoch(b1, 1, "fp", bloom_dir, num_words=1 << 10)
    bloom_epoch(b1, 1, "fp", bloom_dir, num_words=1 << 10)  # retry
    merged = {
        (r.word_idx, r.bits)
        for r in standing_membership(spark, bloom_dir).collect()
    }
    direct = {
        (r.word_idx, r.bits)
        for r in bloom_build(b0.union(b1), "fp", 1 << 10).collect()
    }
    assert merged == direct  # exact fold, retry folded once

    probe = spark.range(0, 12_000).select(F.col("id").alias("fp"))
    seen, novel = split_seen(probe, "fp", spark, bloom_dir)
    novel_ids = {r.fp for r in novel.collect()}
    # no false negatives: nothing inserted may come back novel
    assert not (novel_ids & set(range(9000)))
    # the filter is not saturated: a real novel tail survives
    assert novel_ids and novel_ids <= set(range(9000, 12_000))
    assert seen.count() + len(novel_ids) == 12_000

    with _pytest.raises(ValueError, match="num_words"):
        bloom_epoch(b0, 2, "fp", bloom_dir, num_words=1 << 12)
