"""Streaming multimodal ingestion: a media landing zone consumed as a
Structured Streaming source.

The production shape this models: crawl workers drop image/audio/video
files into object storage continuously; the engine tails the directory
with ``readStream.format("binaryFile")`` (schema must be given
explicitly — the file-stream source cannot infer it), decodes every
payload through the SAME Arrow-batched kernels the batch tier uses
(``operators/multimodal.decode_media_content`` — stateless row
transforms, so they run inside the streaming query with no
foreachBatch detour), and lands typed stats/metadata as parquet with
the file sink's exactly-once manifest.

Delivery semantics come from the two built-in logs, not custom code:
the SOURCE checkpoint records which input files each micro-batch
consumed (a file is never decoded twice, and new files are picked up
on the next trigger), and the parquet SINK's ``_spark_metadata``
manifest commits each batch's output files atomically (a crashed
batch leaves orphans that readers ignore). ``Trigger.AvailableNow``
turns the same query into an incremental catch-up job — the
scheduled-batch deployment mode — while an unbounded trigger gives a
resident tailer; the code is identical.

Scale notes (the 100 TB media-crawl case):

- ``pathGlobFilter`` filters at LISTING time (never opens
  non-matching files); ``maxFilesPerTrigger`` bounds a micro-batch so
  a backlog flush cannot build one giant batch.
- Binary files are non-splittable; Spark bin-packs whole files per
  task (``maxPartitionBytes`` + ``openCostInBytes``), same as the
  batch source (`sources/binary_source.py`).
- The decode kernels carry the forged-header/forged-count guards
  (`_MAX_DECODE_PIXELS`, sample-table bounds, SPS geometry bounds) —
  REQUIRED here: a streaming ingest of untrusted crawl payloads is
  exactly where an adversarial file would otherwise OOM a resident
  executor.

The reference (GeoEstate-ETL) has no streaming or media surface; this
belongs to the training-data-pipeline extension tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.operators.multimodal import (
    MEDIA_CONTENT_SCHEMA,
    decode_media_content,
)
from geoestate_etl_spark.sources.binary_source import media_table

__all__ = [
    "stream_binary_files",
    "media_stats_stream",
    "MEDIA_STATS_SINK_SCHEMA",
]

#: binaryFile's fixed schema — streaming sources cannot infer it.
BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)

#: What the stats sink persists: the decode stats PLUS the payload's
#: content hash at decode time. The file-stream source never re-reads
#: a path its checkpoint consumed, so a landing file modified IN PLACE
#: would otherwise pair fresh listing bytes with stale decoded stats
#: undetected — the stored hash lets the batch reader flag exactly
#: those rows (r8 ADVICE; see plans/media_pipeline.run_media_corpus).
MEDIA_STATS_SINK_SCHEMA = T.StructType(
    MEDIA_CONTENT_SCHEMA.fields + [T.StructField("chash", T.LongType())]
)


def stream_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over a binary landing directory: one row per
    NEW file per micro-batch, ``(path, modificationTime, length,
    content)``. ``glob`` filters at listing time;
    ``max_files_per_trigger`` bounds micro-batch size during backlog
    catch-up."""
    r = spark.readStream.format("binaryFile").schema(BINARY_FILE_SCHEMA)
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.load(path)


def media_stats_stream(
    spark: SparkSession,
    in_dir: str,
    out_path: str,
    checkpoint: str,
    glob: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming decode: landing dir → per-file content
    stats parquet (``media_id, format, n_px, px_sum, px_max,
    n_samples, pcm_sq_sum, pcm_peak, chash`` —
    ``MEDIA_STATS_SINK_SCHEMA``), exactly-once.

    The output stays a stateless row transform end-to-end — no joins,
    no aggregation, no watermark state. ``media_id`` is
    ``xxhash64(path)`` (`sources/binary_source.media_table`), so any
    static listing of the landing zone joins back to these stats
    deterministically; rejoining INSIDE the stream would make a
    stream-stream join with unbounded state for no information gain.

    ``available_now=True`` processes the current backlog and stops
    (the incremental catch-up mode — rerunning with the same
    checkpoint decodes only files that arrived since); ``False``
    leaves a resident tailer running until ``query.stop()``. Returns
    the ``StreamingQuery``.
    """
    files = stream_binary_files(
        spark,
        in_dir,
        glob=glob,
        max_files_per_trigger=max_files_per_trigger,
    )
    media = media_table(files)
    # xxhash64 runs JVM-side BEFORE the Arrow decode kernel; the hash
    # rides through as a passthrough column so every stats row records
    # which payload bytes it describes (MEDIA_STATS_SINK_SCHEMA)
    stats = decode_media_content(
        media.select(
            "media_id", "content", F.xxhash64("content").alias("chash")
        ),
        passthrough=("chash",),
    )
    writer = (
        stats.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
