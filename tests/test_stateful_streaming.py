"""applyInPandasWithState: per-user running totals over a real
micro-batched stream must converge to the batch groupBy result, and
state must actually carry across batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.sources.parquet_io import load_events
from geoestate_etl_spark.streaming.stateful import (
    running_user_totals_batch,
    running_user_totals_stream,
)
from tests.conftest import SF_SMOKE


def test_stateful_stream_converges_to_batch(spark, tmp_path):
    src = str(tmp_path / "events_batches")
    events = load_events(spark, SF_SMOKE).select("user_id", "value")
    # write as multiple files; maxFilesPerTrigger=1 forces several
    # micro-batches so state genuinely carries across batches
    events.repartition(4).write.parquet(src)

    expected = {
        r.user_id: (r.n_events, r.total_value)
        for r in running_user_totals_batch(events).collect()
    }

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_totals_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.lastProgress["batchId"] >= 2  # really ran multiple batches
        # update mode emits one row per key per batch: last emission wins
        rows = spark.sql(
            "SELECT user_id, n_events, total_value FROM stateful_out"
        ).collect()
    finally:
        q.stop()

    last = {}
    for r in rows:  # memory sink appends in batch order
        last[r.user_id] = (r.n_events, r.total_value)
    assert set(last) == set(expected)
    for uid, (n, _total) in expected.items():
        assert last[uid][0] == n
        assert last[uid][1] == pytest.approx(expected[uid][1], abs=0.02)


def test_transform_with_state_matches_batch(spark, tmp_path):
    """The Spark 4 stateful-processor API (transformWithStateInPandas,
    typed state handles on RocksDB) must converge to the same per-user
    totals as the batch groupBy — and as the older
    applyInPandasWithState operator it succeeds."""
    import pytest as _pytest

    from geoestate_etl_spark.streaming import stateful as ST

    if not ST._twst_available():
        _pytest.skip(
            "transformWithStateInPandas needs google.protobuf, absent from "
            "this container (operator gated like the multimodal codecs)"
        )

    from geoestate_etl_spark.session import streaming_state_conf

    events = load_events(spark, SF_SMOKE).select("user_id", "value")
    p = str(tmp_path / "events_tws")
    # several files + maxFilesPerTrigger=1: state must carry across
    # real micro-batches, exactly like the sibling test above
    events.repartition(4).write.parquet(p)
    batch_df = spark.read.parquet(p)

    expected = {
        r.user_id: (r.n_events, r.total_value)
        for r in running_user_totals_batch(batch_df).collect()
    }

    conf_keys = streaming_state_conf()
    prev = {k: spark.conf.get(k, None) for k in conf_keys}
    for k, v in conf_keys.items():
        spark.conf.set(k, v)
    try:
        stream = (
            spark.readStream.schema(batch_df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(p)
        )
        q = (
            ST.running_user_totals_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_out")
            .start()
        )
        try:
            q.processAllAvailable()
            assert q.lastProgress["batchId"] >= 2  # multiple batches ran
            rows = spark.sql(
                "SELECT user_id, n_events, total_value FROM tws_out"
            ).collect()
        finally:
            q.stop()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    last = {}
    for r in rows:  # memory sink appends in batch order: last wins
        last[r.user_id] = (r.n_events, r.total_value)
    assert set(last) == set(expected)
    for uid, (n, total) in expected.items():
        assert last[uid][0] == n
        # processor rounds with Python (pairwise sum, banker's) vs the
        # batch side's F.round(F.sum) — compare within a cent band
        assert last[uid][1] == pytest.approx(total, abs=0.02)
