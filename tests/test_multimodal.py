"""Multimodal plumbing: binary columns, Arrow-batched decode stub,
frame sampling — the Spark-side shapes are real even though the codec
is stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    attach_fake_media,
    decode_media,
    decode_media_real,
    frame_sample_stub,
    resize_stub,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "a" * 500), (3, "третий документ")],
        ["doc_id", "text"],
    )
    return attach_fake_media(docs, "doc_id", "text")


def test_binary_column_type(media):
    assert isinstance(media.schema["content"].dataType, T.BinaryType)


def test_decode_schema_and_determinism(media):
    a = {r.media_id: tuple(r) for r in decode_media(media).collect()}
    b = {r.media_id: tuple(r) for r in decode_media(media).collect()}
    assert a == b  # stub decode is deterministic
    assert decode_media(media).schema == MEDIA_META_SCHEMA
    assert a[2][1] == 500  # n_bytes of the ascii payload
    # utf-8 payload of cyrillic text is longer than its char count
    assert a[3][1] > len("третий документ")


def test_decode_real_is_marked_stub(media):
    with pytest.raises(NotImplementedError):
        decode_media_real(media)


def test_resize_and_frame_sample(media):
    meta = decode_media(media)
    resized = resize_stub(meta, 224, 224)
    assert {r.width for r in resized.collect()} == {224}
    frames = frame_sample_stub(meta, every_nth=10)
    rows = frames.groupBy("media_id").count().collect()
    by_id = {r.media_id: r["count"] for r in rows}
    metas = {r.media_id: r.n_frames for r in meta.collect()}
    for mid, n in metas.items():
        assert by_id[mid] == (n + 9) // 10  # ceil(n_frames / 10)
