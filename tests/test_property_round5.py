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


def _ref_lzw_compress(indices, min_code_size: int) -> bytes:
    """Reference COMPRESSING GIF-LZW encoder (dictionary growth, code
    widening at table-full, 12-bit cap with mid-stream clear) — the
    stream shape real encoders emit, which the uncompressed-style
    generator never produces (no multi-pixel codes, no KwKwK)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0
    code_size = min_code_size + 1

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    cur: tuple = ()
    for v in indices:
        cand = cur + (int(v),)
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        table[cand] = next_code
        next_code += 1
        # widen AFTER registering: decoder grows when ITS table hits
        # the boundary, one entry behind the encoder's
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code - 1 == (1 << 12):
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        cur = (int(v),)
    if cur:
        emit(table[cur])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _ref_gif(px_idx: np.ndarray, palette: np.ndarray, interlace: bool) -> bytes:
    h, w = px_idx.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length() - 1)  # 2<<f entries
    table = palette.astype(np.uint8).tobytes()
    table += b"\0" * (3 * (2 << size_field) - len(table))
    lsd = struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    desc = struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    rows = px_idx
    if interlace:
        order = [
            y
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
            for y in range(start, h, step)
        ]
        rows = px_idx[order]
    mcs = max(2, (n - 1).bit_length())
    lzw = _ref_lzw_compress(rows.reshape(-1).tolist(), mcs)
    sub = b"".join(
        bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (
        b"GIF89a" + lsd + table + desc + bytes([mcs]) + sub + b"\0" + b"\x3B"
    )


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_gif_pixels_inverts_compressing_lzw_streams(data):
    from geoestate_etl_spark.operators.multimodal import gif_pixels

    w = data.draw(st.integers(1, 24), label="w")
    h = data.draw(st.integers(1, 16), label="h")
    n_colors = data.draw(st.sampled_from([2, 4, 8, 16]), label="colors")
    interlace = data.draw(st.booleans(), label="interlace")
    # low-entropy index fields exercise long dictionary chains (and the
    # KwKwK code == len(table) branch); draw from a small alphabet
    idx = np.array(
        data.draw(
            st.lists(
                st.integers(0, n_colors - 1),
                min_size=h * w,
                max_size=h * w,
            )
        ),
        dtype=np.int64,
    ).reshape(h, w)
    palette = np.array(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=3 * n_colors,
                max_size=3 * n_colors,
            )
        ),
        dtype=np.uint8,
    ).reshape(n_colors, 3)
    decoded = gif_pixels(_ref_gif(idx, palette, interlace))
    assert decoded is not None
    np.testing.assert_array_equal(decoded, palette[idx])


def test_gif_lzw_dictionary_growth_repetitive_stream():
    """A long repetitive index stream drives the reference compressor
    through many code-width increases (and, at 12 bits, a mid-stream
    clear); the decoder must track every boundary."""
    from geoestate_etl_spark.operators.multimodal import gif_pixels

    w, h = 128, 96  # 12288 px: enough to push past 2^10 dict entries
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    idx = ((x // 3 + y // 5) % 4).astype(np.int64)
    palette = np.array(
        [[0, 0, 0], [85, 10, 200], [170, 99, 7], [255, 128, 64]],
        dtype=np.uint8,
    )
    decoded = gif_pixels(_ref_gif(idx, palette, False))
    assert decoded is not None
    np.testing.assert_array_equal(decoded, palette[idx])


def _ref_lzw_compress_deferred(indices, min_code_size: int) -> bytes:
    """Deferred-clear variant: at 4096 entries the encoder simply
    STOPS adding (no clear code) and keeps emitting existing codes —
    what many real-world GIF writers do. The decoder must keep its
    table aligned (i.e. also stop resolving new KwKwK entries past the
    cap) for the remainder of the stream."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0
    code_size = min_code_size + 1

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += code_size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    cur: tuple = ()
    for v in indices:
        cand = cur + (int(v),)
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        if next_code < (1 << 12):
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        cur = (int(v),)
    if cur:
        emit(table[cur])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_deferred_clear_stream():
    """A stream long enough to fill the 12-bit table with NO clear
    code (deferred clear) must still decode exactly."""
    from geoestate_etl_spark.operators.multimodal import (
        _gif_lzw_decode,
        gif_pixels,
    )

    rng = np.random.RandomState(3)
    # high-entropy 8-color stream: dictionary fills fast (every miss
    # adds an entry), comfortably passing 4096 entries
    idx = rng.randint(0, 8, 40_000).astype(np.int64)
    enc = _ref_lzw_compress_deferred(idx.tolist(), 3)
    dec = _gif_lzw_decode(enc, 3, len(idx))
    assert dec == idx.tolist()

    # and through the full container path
    h, w = 100, 120
    grid = idx[: h * w].reshape(h, w)
    palette = np.array(
        [[i * 30 % 256, i * 50 % 256, i * 70 % 256] for i in range(8)],
        dtype=np.uint8,
    )
    decoded = gif_pixels(_ref_gif(grid, palette, False))
    assert decoded is not None
    np.testing.assert_array_equal(decoded, palette[grid])


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_decoders_never_raise_on_adversarial_bytes(data):
    """Crawl-media contract: truncations and bit-flips of valid files
    (and raw random bytes) decode to None or a valid array — NEVER an
    exception, which would kill a whole Arrow batch of good rows."""
    from geoestate_etl_spark.operators.multimodal import (
        avi_frames,
        bmp_pixels,
        gif_pixels,
        make_avi,
        make_bmp,
        make_gif,
        make_png,
        make_wav,
        png_pixels,
        wav_samples,
    )

    decoders = [png_pixels, gif_pixels, bmp_pixels, wav_samples, avi_frames]
    makers = [
        lambda: make_png(9, 7),
        lambda: make_gif(9, 7),
        lambda: make_bmp(9, 7),
        lambda: make_wav(8000, 1, 50),
        lambda: make_avi(9, 7, 3, 10),
    ]
    which = data.draw(st.integers(0, 4), label="format")
    b = makers[which]()
    mode = data.draw(st.sampled_from(["cut", "flip", "random"]), label="mode")
    if mode == "cut":
        b = b[: data.draw(st.integers(0, len(b)), label="cut")]
    elif mode == "flip":
        pos = data.draw(st.integers(0, len(b) - 1), label="pos")
        b = b[:pos] + bytes([b[pos] ^ 0xFF]) + b[pos + 1 :]
    else:
        b = bytes(
            data.draw(st.lists(st.integers(0, 255), max_size=120), label="raw")
        )
    for dec in decoders:  # every decoder must also reject foreign formats
        dec(b)  # passes iff no exception escapes


def _ref_avi(
    frames: np.ndarray, top_down: bool, fps: int, junk: bool
) -> bytes:
    """INDEPENDENT reference AVI writer (spec-derived, not the
    module's make_avi): RIFF/LIST layout by hand, dwScale=2 with
    dwRate=2·fps (the decoder must divide, not read dwRate raw),
    alternating 00db/00dc frame chunk ids, optional odd-sized JUNK
    chunk exercising word-alignment, and either DIB orientation
    (negative biHeight = top-down storage)."""
    F, h, w, _ = frames.shape
    row_bytes = (w * 3 + 3) & ~3
    frame_bytes = row_bytes * h

    def ck(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<14I", 1_000_000 // fps, 0, 0, 0, F, 0, 1, frame_bytes,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"\x00" * 4
        + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 2, 2 * fps, 0, F,
            frame_bytes, 0, 0,
        )
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        frame_bytes, 0, 0, 0, 0,
    )
    movi = []
    for f in range(F):
        ys = range(h) if top_down else range(h - 1, -1, -1)
        rows = []
        for y in ys:
            row = frames[f, y].tobytes()
            rows.append(row + b"\x00" * (row_bytes - len(row)))
        movi.append(ck(b"00dc" if f % 2 else b"00db", b"".join(rows)))
    body = b"AVI " + ck(
        b"LIST",
        b"hdrl" + ck(b"avih", avih)
        + ck(b"LIST", b"strl" + ck(b"strh", strh) + ck(b"strf", strf)),
    )
    if junk:
        body += ck(b"JUNK", b"\x00" * 13)  # odd size → pad byte
    body += ck(b"LIST", b"movi" + b"".join(movi))
    return b"RIFF" + struct.pack("<I", len(body)) + body


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_avi_frames_inverts_reference_encoder(data):
    """avi_frames must decode an INDEPENDENTLY-written AVI: random
    pixel content, both DIB orientations, non-trivial dwScale, odd
    JUNK chunks, and mixed 00db/00dc frame ids."""
    from geoestate_etl_spark.operators.multimodal import (
        avi_frames,
        sniff_media,
    )

    w = data.draw(st.integers(1, 10), label="w")
    h = data.draw(st.integers(1, 8), label="h")
    n = data.draw(st.integers(1, 5), label="frames")
    fps = data.draw(st.integers(1, 60), label="fps")
    top_down = data.draw(st.booleans(), label="top_down")
    junk = data.draw(st.booleans(), label="junk")
    flat = data.draw(
        st.lists(
            st.integers(0, 255),
            min_size=n * h * w * 3,
            max_size=n * h * w * 3,
        ),
        label="px",
    )
    frames = np.array(flat, dtype=np.uint8).reshape(n, h, w, 3)
    b = _ref_avi(frames, top_down, fps, junk)
    m = sniff_media(b)
    assert (m["format"], m["width"], m["n_frames"]) == ("avi", w, n)
    assert m["sample_rate"] == fps  # dwRate/dwScale, not dwRate raw
    got = avi_frames(b)
    assert got is not None
    np.testing.assert_array_equal(got, frames)
