"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + a typed metadata struct. The
Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signatures, partition sizing — is real and tested; the actual
codec work (image decode, resample, frame extraction) is STUBBED:
the decode libraries are not in this container, so ``decode_media``
computes deterministic fake features from the raw bytes, and
``decode_media_real`` raises ``NotImplementedError`` where a codec
would be called. Swapping the stub for PIL/ffmpeg keeps every
signature and the whole plan shape unchanged.

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` moderate and use
``mapInPandas`` (Arrow batches) so bytes cross to Python once per
batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata produced by the (stub) decoder.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha_prefix", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media: utf-8 bytes of the text as payload.

    Stands in for reading real image/audio bytes; keeps the binary
    column type and size distribution realistic enough to exercise
    the plumbing.
    """
    return df.select(
        F.col(id_col).cast(T.LongType()).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """STUB decoder over ``mapInPandas`` (Arrow-batched).

    Computes deterministic pseudo-metadata from the payload bytes
    (sizes, sha prefix, fake dimensions derived from byte content).
    Real codec integration replaces ``_fake_decode`` only.
    """

    def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            content = pdf["content"]
            n_bytes = content.map(len)
            sha = content.map(lambda b: hashlib.sha256(b).hexdigest()[:16])
            # fake dimensions: stable function of the payload hash
            h = content.map(lambda b: int.from_bytes(hashlib.sha256(b).digest()[:4], "big"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "sha_prefix": sha,
                    "width": (h % 1920 + 1).astype("int32"),
                    "height": (h // 1920 % 1080 + 1).astype("int32"),
                    "n_frames": (n_bytes % 240 + 1).astype("int32"),
                }
            )

    # spread Arrow batches across cores — media tables often arrive as
    # few large files, and decode is the CPU stage. Capped fan-out: each
    # partition spawns a Python worker, and worker spin-up dominates on
    # small inputs (at real scale, input partitioning already exceeds this)
    parallelism = min(df.sparkSession.sparkContext.defaultParallelism, 8)
    df = df.repartition(parallelism)
    return df.mapInPandas(_fake_decode, MEDIA_META_SCHEMA)


def decode_media_real(df: DataFrame) -> DataFrame:
    """Real decode path — requires PIL/av, absent in this container."""
    raise NotImplementedError(
        "image/audio codecs are not installed; use decode_media (stub) — "
        "swapping in a real codec changes only the batch fn body"
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize placeholder: passes metadata through with target dims.

    A real implementation transforms the binary payload per Arrow
    batch; the plan shape (mapInPandas over the same schema) is
    already what production would run.
    """
    return df.withColumn("width", F.lit(width).cast(T.IntegerType())).withColumn(
        "height", F.lit(height).cast(T.IntegerType())
    )


def frame_sample_stub(df: DataFrame, every_nth: int = 24) -> DataFrame:
    """Frame-sampling placeholder: derives sampled frame indices from
    the fake frame count — the explode pattern is the real plan."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    return df.select("media_id", F.explode(idx).alias("frame_idx"))
