"""binaryFile ingestion → real header decode, end to end on disk.

Writes genuinely-valid PNG/BMP/WAV files (stdlib-built payloads from
operators/multimodal.py) into a temp tree and verifies the Spark-native
binaryFile scan + glob pushdown + recursive lookup + the Arrow-batched
header decode recover the exact parameters the files were built with.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.operators.multimodal import (
    decode_media_real,
    make_bmp,
    make_jpeg,
    make_png,
    make_wav,
)
from geoestate_etl_spark.sources.binary_source import (
    media_table,
    read_binary_files,
)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "nested").mkdir()
    (d / "a.png").write_bytes(make_png(12, 7))
    (d / "b.bmp").write_bytes(make_bmp(5, 9))
    (d / "nested" / "c.wav").write_bytes(make_wav(16000, 2, 40))
    (d / "d.jpg").write_bytes(make_jpeg(24, 16))
    (d / "notes.txt").write_text("not media")
    return str(d)


def test_scan_shape_and_recursion(spark, media_dir):
    files = read_binary_files(spark, media_dir)
    rows = {os.path.basename(r.path): r for r in files.collect()}
    # recursive lookup found the nested wav; txt is listed too (no glob)
    assert set(rows) == {"a.png", "b.bmp", "c.wav", "d.jpg", "notes.txt"}
    assert rows["a.png"].length == len(make_png(12, 7))
    assert bytes(rows["b.bmp"].content) == make_bmp(5, 9)


def test_glob_filters_at_listing(spark, media_dir):
    pngs = read_binary_files(spark, media_dir, glob="*.png")
    assert [os.path.basename(r.path) for r in pngs.collect()] == ["a.png"]


def test_ingest_decode_end_to_end(spark, media_dir):
    files = read_binary_files(spark, media_dir, glob="*.{png,bmp,wav,jpg}")
    media = media_table(files)
    decoded = decode_media_real(media).join(
        media.select("media_id", "source_path"), "media_id"
    )
    by_name = {
        os.path.basename(r.source_path): r for r in decoded.collect()
    }
    assert len(by_name) == 4
    png = by_name["a.png"]
    assert (png.format, png.width, png.height) == ("png", 12, 7)
    bmp = by_name["b.bmp"]
    assert (bmp.format, bmp.width, bmp.height) == ("bmp", 5, 9)
    wav = by_name["c.wav"]
    assert (wav.format, wav.sample_rate, wav.n_channels, wav.n_frames) == (
        "wav",
        16000,
        2,
        40,
    )
    jpg = by_name["d.jpg"]
    assert (jpg.format, jpg.width, jpg.height, jpg.n_channels) == (
        "jpeg", 24, 16, 1,
    )


def test_media_id_deterministic_path_hash(spark, media_dir):
    m1 = media_table(read_binary_files(spark, media_dir))
    m2 = media_table(
        read_binary_files(spark, media_dir).repartition(5)
    )
    a = {(r.media_id, r.source_path) for r in m1.collect()}
    b = {(r.media_id, r.source_path) for r in m2.collect()}
    assert a == b  # id is content-of-path, not partition-order
    assert m1.select("media_id").distinct().count() == 5


def test_glob_is_pushed_to_listing(spark, media_dir):
    """The partitions of a globbed scan contain only matching files —
    i.e. filtering happened at listing, not as a post-scan filter."""
    df = read_binary_files(spark, media_dir, glob="*.png")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" not in plan.split("FileScan")[0]  # no row-filter above scan
    assert df.select(F.count("*")).first()[0] == 1
