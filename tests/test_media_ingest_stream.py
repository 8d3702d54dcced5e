"""Streaming multimodal ingestion (r7): a binary landing directory
tailed with readStream.format("binaryFile"), decoded through the same
Arrow-batched kernels as the batch tier, landed as parquet with the
file sink's exactly-once manifest. Asserts the three properties that
make it production-shaped: closed-form-exact decode of the backlog,
incremental pickup of NEW files only on a second AvailableNow run
(same checkpoint), and no duplicate rows across the two runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.multimodal import (
    make_mp4_avc,
    make_png,
    make_wav,
)
from geoestate_etl_spark.streaming.media_ingest import media_stats_stream


def _png_stats(w, h):
    # make_png plants gray (x+y)%256; below 64x48 it never wraps
    return w * h, w * h * (w + h - 2) // 2, w + h - 2


def _ipcm_stats(w, h, n):
    # make_mp4_avc plants gray (x + 2y + 5f) on 3 channels, never wraps
    sx, sy, sf = w * (w - 1) // 2, h * (h - 1) // 2, n * (n - 1) // 2
    return (
        n * w * h * 3,
        3 * (n * h * sx + 2 * n * w * sy + 5 * h * w * sf),
        (w - 1) + 2 * (h - 1) + 5 * (n - 1),
    )


def _write(d, name, payload):
    with open(os.path.join(d, name), "wb") as fh:
        fh.write(payload)


def test_stream_decodes_backlog_then_only_new_files(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    out = str(tmp_path / "stats")
    cp = str(tmp_path / "cp")

    _write(str(land), "a.png", make_png(10, 7))
    _write(str(land), "b.png", make_png(20, 3))
    _write(str(land), "c.mp4", make_mp4_avc(32, 16, 2))
    _write(str(land), "d.wav", make_wav(8000, 1, 5))
    _write(str(land), "skip.txt", b"not media")  # glob-filtered at listing

    q = media_stats_stream(spark, str(land), out, cp, glob="*.{png,mp4,wav}")
    assert q.awaitTermination(120)

    got = {
        r.media_id: r
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 4  # skip.txt never listed

    def mid(name):
        return spark.range(1).select(
            F.xxhash64(F.lit(f"file:{land}/{name}"))
        ).collect()[0][0]

    for name, (w, h) in [("a.png", (10, 7)), ("b.png", (20, 3))]:
        r = got[mid(name)]
        n_px, px_sum, px_max = _png_stats(w, h)
        assert (r.format, r.n_px, r.px_sum, r.px_max) == ("png", n_px, px_sum, px_max)

    r = got[mid("c.mp4")]
    n_px, px_sum, px_max = _ipcm_stats(32, 16, 2)
    assert (r.format, r.n_px, r.px_sum, r.px_max) == ("mp4", n_px, px_sum, px_max)

    r = got[mid("d.wav")]
    samples = [(j * 257) % 32768 - 16384 for j in range(5)]
    assert (r.format, r.n_samples, r.pcm_sq_sum, r.pcm_peak) == (
        "wav", 5, sum(s * s for s in samples), max(abs(s) for s in samples),
    )

    # second trigger with the SAME checkpoint: only the new file decodes
    _write(str(land), "e.png", make_png(5, 5))
    q2 = media_stats_stream(spark, str(land), out, cp, glob="*.{png,mp4,wav}")
    assert q2.awaitTermination(120)

    after = spark.read.parquet(out)
    assert after.count() == 5  # +1, no re-decode duplicates of a-d
    assert after.select("media_id").distinct().count() == 5
    r = {x.media_id: x for x in after.collect()}[mid("e.png")]
    n_px, px_sum, px_max = _png_stats(5, 5)
    assert (r.format, r.n_px, r.px_sum, r.px_max) == ("png", n_px, px_sum, px_max)
