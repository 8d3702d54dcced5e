"""Property tier for the r5 real content decoders (pure Python — no
Spark session; hypothesis drives adversarial bytes through the same
functions the mapInPandas operators call per row).

The PNG property is the strong one: the TEST implements an
independent reference encoder that picks a RANDOM filter type per
scanline and computes the filtered bytes straight from the PNG spec
(§9), so `png_pixels` must invert arbitrary filter sequences, not
just the filter-0 stream our own encoder emits.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geoestate_etl_spark.operators.multimodal import (
    _encode_gray_png,
    bmp_pixels,
    png_pixels,
    wav_samples,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def _ref_png(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference PNG encoder: 8-bit, color type from channel count,
    per-row filter type chosen by the caller, filtered bytes computed
    independently from the spec (ints mod 256, Paeth predictor)."""
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch).astype(np.int64)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        ft = ftypes[y]
        row = flat[y]
        out.append(ft)
        for i in range(w * ch):
            a = int(row[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(row[i]) - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_png_pixels_inverts_arbitrary_filter_sequences(data):
    w = data.draw(st.integers(1, 12), label="w")
    h = data.draw(st.integers(1, 10), label="h")
    ch = data.draw(st.sampled_from([1, 2, 3, 4]), label="channels")
    px = np.array(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=h * w * ch,
                max_size=h * w * ch,
            ),
            label="pixels",
        ),
        dtype=np.uint8,
    ).reshape(h, w, ch)
    ftypes = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h), label="filters"
    )
    decoded = png_pixels(_ref_png(px, ftypes))
    assert decoded is not None
    np.testing.assert_array_equal(decoded, px)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_gray_png_encoder_roundtrip(data):
    w = data.draw(st.integers(1, 16), label="w")
    h = data.draw(st.integers(1, 12), label="h")
    gray = np.array(
        data.draw(
            st.lists(st.integers(0, 255), min_size=h * w, max_size=h * w)
        ),
        dtype=np.uint8,
    ).reshape(h, w)
    decoded = png_pixels(_encode_gray_png(gray))
    assert decoded is not None
    np.testing.assert_array_equal(decoded.reshape(h, w), gray)


def _ref_bmp(px: np.ndarray, top_down: bool) -> bytes:
    """Reference 24-bit BMP: BITMAPINFOHEADER, 4-byte row padding,
    negative height for top-down rows."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    rows = px if top_down else px[::-1]
    for y in range(h):
        body += bytes(rows[y].reshape(-1)) + b"\0" * (row_bytes - w * 3)
    hdr_h = -h if top_down else h
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, hdr_h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_bmp_pixels_roundtrip_both_orientations(data):
    w = data.draw(st.integers(1, 13), label="w")  # odd widths hit padding
    h = data.draw(st.integers(1, 9), label="h")
    top_down = data.draw(st.booleans(), label="top_down")
    px = np.array(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=h * w * 3, max_size=h * w * 3
            )
        ),
        dtype=np.uint8,
    ).reshape(h, w, 3)
    decoded = bmp_pixels(_ref_bmp(px, top_down))
    assert decoded is not None
    np.testing.assert_array_equal(decoded, px)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
    st.booleans(),
)
def test_wav_samples_roundtrip(samples, extra_odd_chunk):
    """RIFF walk must survive an odd-sized unknown chunk (word-aligned
    per spec) placed before the data chunk."""
    pcm = np.array(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_odd_chunk:
        chunks += b"LIST" + struct.pack("<I", 3) + b"odd" + b"\0"  # pad byte
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    decoded = wav_samples(wav)
    assert decoded is not None
    np.testing.assert_array_equal(decoded, np.array(samples, dtype=np.int16))
