"""Deterministic media landing-zone fixture with a PREDICTED funnel
(r8 — VERDICT r7 #4: the media twin of the text-corpus e2e).

Plants four tiers into one directory of files and returns the funnel
counts a run over it MUST produce — computed here, before any Spark
runs, from the construction alone:

- ``n_unique_png`` grayscale PNGs with per-image pixel patterns
  (distinct decoded stats by construction: each image's pixel sum
  differs because the ramp offset differs),
- ``n_wav`` WAVs with distinct lengths (distinct sample stats),
- ``n_exact_dup`` byte-identical COPIES of planted PNGs under new
  file names — dropped by the exact (content-hash) tier,
- ``n_reencode`` re-encodes: the SAME pixel rasters as planted PNGs
  but with the IDAT stream split into two chunks — different bytes
  (so they survive the exact tier) that decode to identical pixels,
  dropped by the decoded-content tier,
- ``n_junk`` undecodable payloads — dropped by the decodability gate.

The semantic stage is the NEGATIVE control: ``embed_media_stub``
derives embeddings from content bytes (sha256-seeded unit vectors),
so after the exact tier no two survivors share bytes and independent
64-dim unit vectors exceed cosine 0.92 with probability ≈ 0 — the
predicted semantic drop count is exactly 0.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def make_png_pattern(width: int, height: int, off: int, split_idat: bool = False) -> bytes:
    """Grayscale PNG with pixel ``(x + y + off) % 256``. With
    ``split_idat`` the compressed stream is carried in TWO IDAT chunks
    — byte-different file, bit-identical decoded pixels (the re-encode
    tier)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x + y + off) % 256 for x in range(width))
        for y in range(height)
    )
    comp = zlib.compress(raw)
    if split_idat:
        mid = len(comp) // 2
        idat = _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    else:
        idat = _chunk(b"IDAT", comp)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + idat + _chunk(b"IEND", b"")
    )


@dataclass
class MediaFunnelPrediction:
    n_files: int
    n_decodable: int
    n_exact_unique: int
    n_content_unique: int
    n_semantic_dropped: int  # the negative control: exactly 0
    n_final: int


def generate_media_landing(
    dir_path: str,
    n_unique_png: int = 24,
    n_wav: int = 6,
    n_exact_dup: int = 8,
    n_reencode: int = 6,
    n_junk: int = 4,
) -> MediaFunnelPrediction:
    """Write the landing zone and return the funnel PREDICTION."""
    from geoestate_etl_spark.operators.multimodal import make_wav

    assert n_exact_dup <= n_unique_png and n_reencode <= n_unique_png
    os.makedirs(dir_path, exist_ok=True)

    for i in range(n_unique_png):
        # distinct sizes + ramp offsets ⇒ distinct (n_px, px_sum) pairs
        w, h = 16 + (i % 5), 12 + (i % 7)
        with open(os.path.join(dir_path, f"img-{i:04d}.png"), "wb") as f:
            f.write(make_png_pattern(w, h, off=i))
    for i in range(n_wav):
        with open(os.path.join(dir_path, f"audio-{i:04d}.wav"), "wb") as f:
            f.write(make_wav(8000, 1, 400 + 37 * i))
    for i in range(n_exact_dup):
        # byte-identical copy of unique PNG i under a new name
        w, h = 16 + (i % 5), 12 + (i % 7)
        with open(os.path.join(dir_path, f"dup-{i:04d}.png"), "wb") as f:
            f.write(make_png_pattern(w, h, off=i))
    for i in range(n_reencode):
        # same pixels as unique PNG i, different bytes (split IDAT)
        w, h = 16 + (i % 5), 12 + (i % 7)
        with open(os.path.join(dir_path, f"reenc-{i:04d}.png"), "wb") as f:
            f.write(make_png_pattern(w, h, off=i, split_idat=True))
    for i in range(n_junk):
        with open(os.path.join(dir_path, f"junk-{i:04d}.bin"), "wb") as f:
            f.write(b"not a media payload " * (i + 1))

    n_files = n_unique_png + n_wav + n_exact_dup + n_reencode + n_junk
    # content-tier prediction COMPUTED from the construction (still
    # before any Spark runs): at large n_unique_png the ramp offset
    # wraps mod 256 and two different images can share a decoded-stats
    # triple (n_px, px_sum, px_max) — the content tier then keeps one
    # of them, by design. Enumerating the planted triples keeps the
    # prediction exact at every tier size instead of assuming
    # distinctness.
    triples = set()
    for i in range(n_unique_png):
        w, h = 16 + (i % 5), 12 + (i % 7)
        vals = [(x + y + i) % 256 for y in range(h) for x in range(w)]
        triples.add((w * h, sum(vals), max(vals)))
    n_content = len(triples) + n_wav  # wav sample-counts are distinct
    return MediaFunnelPrediction(
        n_files=n_files,
        n_decodable=n_files - n_junk,
        n_exact_unique=n_unique_png + n_wav + n_reencode,
        n_content_unique=n_content,
        n_semantic_dropped=0,
        n_final=n_content,
    )
