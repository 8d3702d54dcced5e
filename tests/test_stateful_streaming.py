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
    from tests.conftest import SF_SMOKE

    from geoestate_etl_spark.sources.parquet_io import load_events

    events = load_events(spark, SF_SMOKE)
    p = str(tmp_path / "events_tws")
    events.write.parquet(p)
    batch_df = spark.read.parquet(p)

    expected = {
        (r.user_id): (r.n_events, r.total_value)
        for r in ST.running_user_totals_batch(batch_df).collect()
    }

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    for k, v in streaming_state_conf().items():
        spark.conf.set(k, v)
    try:
        stream = spark.readStream.schema(batch_df.schema).parquet(p)
        q = (
            ST.running_user_totals_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_out")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                r.user_id: (r.n_events, r.total_value)
                for r in spark.sql(
                    "SELECT * FROM tws_out ORDER BY user_id"
                ).collect()
            }
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert got == expected
