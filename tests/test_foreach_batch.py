"""foreachBatch sink: idempotent (epoch-keyed) writes — the standard
exactly-once-style pattern for sinks without native streaming support,
replacing the reference's hand-rolled 2,000-row INSERT batching
(dags/main.py:381-437) with per-micro-batch transactional writes."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from geoestate_etl_spark.sources.parquet_io import load_events
from tests.conftest import SF_SMOKE


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    src = str(tmp_path / "src")
    out_dir = tmp_path / "sink"
    out_dir.mkdir()
    events = load_events(spark, SF_SMOKE).select("event_id", "value")
    events.repartition(3).write.parquet(src)

    def write_batch(batch_df, epoch_id: int):
        # epoch-keyed target + overwrite = idempotent on retry
        target = str(out_dir / f"epoch={epoch_id}")
        batch_df.write.mode("overwrite").parquet(target)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream.writeStream.foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    epochs = [d for d in os.listdir(out_dir) if d.startswith("epoch=")]
    assert len(epochs) >= 2  # several micro-batches landed
    total = spark.read.parquet(str(out_dir / "epoch=*")).count()
    assert total == events.count()  # no loss, no duplication
