"""SparkSession factory.

The reference creates a bare local session per Airflow task
(``dags/main.py:144-145``) with zero tuning. Here the session is
created once with the knobs that matter at scale:

- AQE on (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) — our whole "physical tuning" story per SURVEY §4.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this is overridden to ~2-3x total executor cores (AQE
  coalesces down, so erring high is safe).
- UTC session timezone so event-time semantics are stable and match
  the DuckDB oracle.
- Arrow enabled for the few vectorized-Python paths (pandas_udf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def streaming_state_conf(rocksdb: bool = True) -> dict[str, str]:
    """Conf for stateful streaming queries with LARGE state (wide
    session windows, dedup maps, join buffers).

    The default HDFS-backed provider keeps every state key on the
    executor HEAP — fine for small keyed aggregates, an OOM at
    100M-session scale. RocksDB keeps state off-heap/on-local-disk
    with a bounded block cache, so state size is limited by disk, not
    heap. Changelog checkpointing uploads per-batch deltas instead of
    full snapshots, cutting checkpoint latency on big state (both are
    stock Spark; the provider ships in pyspark's JVM bundle and is
    selected per-query from the session conf at stream start).

    Apply via ``get_spark(extra_conf=streaming_state_conf())`` or
    ``spark.conf.set`` before ``writeStream.start()``.
    """
    if not rocksdb:
        return {}
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        # delta uploads instead of full-snapshot checkpoints
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        # bound memory across ALL RocksDB instances on an executor
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "512",
    }


def get_spark(
    app_name: str = "geoestate-etl-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Local-mode defaults; on a cluster the master/memory settings are
    supplied by spark-submit and everything here still applies.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
