"""Deterministic media landing-zone fixture with a PREDICTED funnel
(r8 — VERDICT r7 #4; r9 adds the perceptual tier's positive controls).

Plants six tiers into one directory of files and returns the funnel
counts a run over it MUST produce — computed here, before any Spark
runs, from the construction alone:

- ``n_unique_png`` grayscale noise PNGs. r9: per-image deterministic
  NOISE patterns (integer-hash pixels in 0..191) instead of ramps —
  ramp images share their gradient structure, i.e. they genuinely ARE
  perceptual near-dups of each other, which would collapse the whole
  corpus once a perceptual tier exists. Dimensions are grid-aligned
  (width ∈ {18,27,36} divisible by 9, height ∈ {16,24,32} divisible
  by 8) so the dHash upscale invariance is EXACT, and every image's
  pixel sum is adjusted to a distinct odd target (96·n_px + 2i + 1) so
  decoded-stat triples are unique BY CONSTRUCTION across all planted
  tiers (resized sums are ≡0 mod 4; re-leveled sums only meet a base
  sum at j = i + 24·n_px, far outside any tier size).
- ``n_wav`` WAVs with distinct lengths (distinct sample stats).
- ``n_exact_dup`` byte-identical COPIES of planted PNGs under new
  file names — dropped by the exact (content-hash) tier.
- ``n_reencode`` re-encodes: the SAME pixel rasters as planted PNGs
  but with the IDAT stream split into two chunks — different bytes
  (survive the exact tier) that decode to identical pixels, dropped
  by the decoded-content tier.
- ``n_resized`` 2× nearest-neighbor UPSCALES of planted PNGs (r9):
  4× the pixel count and sum — invisible to tiers 3-4 — but an
  EXACTLY equal dHash (grid-aligned block sums scale by 4), dropped
  by the perceptual tier.
- ``n_releveled`` +48 brightness-shifted copies (r9): same pixel
  count, sum shifted by 48·n_px — invisible to tiers 3-4 — but an
  EXACTLY equal dHash (gradients are shift-invariant; base pixels
  ≤ 191 so nothing clips), dropped by the perceptual tier.
- ``n_junk`` undecodable payloads — dropped by the decodability gate.

``n_perceptual_dropped`` is predicted by an INDEPENDENT fixture-side
dHash (plain nested loops over the constructed pixel grids — no
import of the operator) plus a union-find over all Hamming-≤-6 pairs
among the content-tier survivors' hashes, so accidental near-pairs
between distinct noise images are part of the prediction, not an
assumption. The fixture also asserts no LSH band bucket exceeds the
pipeline's occupancy cap, so the banded join is provably complete on
this corpus.

The semantic stage stays the NEGATIVE control: ``embed_media_stub``
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


def _encode_gray_png(rows: list[list[int]], split_idat: bool = False) -> bytes:
    """8-bit grayscale PNG from an explicit pixel grid. With
    ``split_idat`` the compressed stream is carried in TWO IDAT chunks
    — byte-different file, bit-identical decoded pixels (the re-encode
    tier)."""
    height, width = len(rows), len(rows[0])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    comp = zlib.compress(raw)
    if split_idat:
        mid = len(comp) // 2
        idat = _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    else:
        idat = _chunk(b"IDAT", comp)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + idat + _chunk(b"IEND", b"")
    )


def make_png_pattern(width: int, height: int, off: int, split_idat: bool = False) -> bytes:
    """Grayscale PNG with pixel ``(x + y + off) % 256`` (the r8 ramp —
    kept for byte-level tests; note ramps share gradient structure, so
    they ARE perceptual near-dups of each other by design)."""
    rows = [
        [(x + y + off) % 256 for x in range(width)] for y in range(height)
    ]
    return _encode_gray_png(rows, split_idat=split_idat)


def _mix(v: int) -> int:
    """Deterministic 64-bit integer hash (xorshift-multiply)."""
    v = (v ^ (v >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    v = (v ^ (v >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    return v ^ (v >> 31)


def _noise_dims(i: int) -> tuple[int, int]:
    """Grid-aligned dims for noise image i: width divisible by 9,
    height by 8 — the exact-upscale-invariance precondition."""
    return 9 * (2 + i % 3), 8 * (2 + (i // 3) % 3)


def noise_rows(i: int) -> list[list[int]]:
    """Pixel grid of noise image ``i``: integer-hash values in 0..191
    (48 headroom for the re-level twin), with the TOTAL sum adjusted
    to the distinct odd target ``96·n_px + 2i + 1`` (see module
    docstring for the cross-tier uniqueness argument)."""
    w, h = _noise_dims(i)
    rows = [
        [_mix(i * 1_000_003 + y * 4099 + x) % 192 for x in range(w)]
        for y in range(h)
    ]
    n = w * h
    target = 96 * n + 2 * i + 1
    delta = target - sum(sum(r) for r in rows)
    for y in range(h):
        for x in range(w):
            if delta == 0:
                break
            v = rows[y][x]
            step = min(delta, 191 - v) if delta > 0 else max(delta, -v)
            rows[y][x] = v + step
            delta -= step
        if delta == 0:
            break
    assert delta == 0, "sum target unreachable — widen the value range"
    return rows


def _upscale2(rows: list[list[int]]) -> list[list[int]]:
    return [
        [v for v in r for _ in (0, 1)] for r in rows for _ in (0, 1)
    ]


def _relevel(rows: list[list[int]], d: int) -> list[list[int]]:
    out = [[v + d for v in r] for r in rows]
    assert all(0 <= v <= 255 for r in out for v in r)
    return out


def fixture_dhash(rows: list[list[int]]) -> int:
    """INDEPENDENT dHash oracle: plain nested loops over the grid —
    block sums at floor boundaries, cross-multiplied comparison, bit
    ``r*8+c`` set iff block (r, c+1) is strictly brighter. Written
    from the definition, not from the operator (which vectorizes via
    an integral image)."""
    h, w = len(rows), len(rows[0])
    bits = 0
    for r in range(8):
        y0, y1 = r * h // 8, (r + 1) * h // 8
        cells = []
        for c in range(9):
            x0, x1 = c * w // 9, (c + 1) * w // 9
            s = sum(rows[y][x] for y in range(y0, y1) for x in range(x0, x1))
            cells.append((s, (y1 - y0) * (x1 - x0)))
        for c in range(8):
            (sl, nl), (sr, nr) = cells[c], cells[c + 1]
            if sr * nl > sl * nr:
                bits |= 1 << (r * 8 + c)
    return bits


class _UnionFind:
    def __init__(self, n: int) -> None:
        self.p = list(range(n))

    def find(self, a: int) -> int:
        while self.p[a] != a:
            self.p[a] = self.p[self.p[a]]
            a = self.p[a]
        return a

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def predict_perceptual_drops(
    hashes: list[int], max_hamming: int = 6, cap: int = 1024
) -> int:
    """Drops = Σ (component size − 1) over the Hamming-≤-d graph of
    the content-tier survivors' hashes — the keeper election keeps one
    per component regardless of WHICH member wins (media_id is a path
    hash the fixture cannot predict; the count does not depend on it).
    Also asserts the banded-LSH completeness precondition: no 8-bit
    band bucket exceeds the occupancy cap."""
    from collections import Counter

    occ = Counter(
        (i, (h >> (i * 8)) & 255) for h in hashes for i in range(8)
    )
    assert max(occ.values(), default=0) <= cap, "band bucket over cap"
    uf = _UnionFind(len(hashes))
    for a in range(len(hashes)):
        for b in range(a + 1, len(hashes)):
            if bin(hashes[a] ^ hashes[b]).count("1") <= max_hamming:
                uf.union(a, b)
    roots = {uf.find(i) for i in range(len(hashes))}
    return len(hashes) - len(roots)


@dataclass
class MediaFunnelPrediction:
    n_files: int
    n_decodable: int
    n_exact_unique: int
    n_content_unique: int
    n_perceptual_dropped: int
    n_semantic_dropped: int  # the negative control: exactly 0
    n_final: int


def generate_media_landing(
    dir_path: str,
    n_unique_png: int = 24,
    n_wav: int = 6,
    n_exact_dup: int = 8,
    n_reencode: int = 6,
    n_resized: int = 5,
    n_releveled: int = 4,
    n_junk: int = 4,
) -> MediaFunnelPrediction:
    """Write the landing zone and return the funnel PREDICTION."""
    from geoestate_etl_spark.operators.multimodal import make_wav

    assert max(n_exact_dup, n_reencode, n_resized, n_releveled) <= n_unique_png
    os.makedirs(dir_path, exist_ok=True)

    grids = [noise_rows(i) for i in range(n_unique_png)]
    for i, rows in enumerate(grids):
        with open(os.path.join(dir_path, f"img-{i:04d}.png"), "wb") as f:
            f.write(_encode_gray_png(rows))
    for i in range(n_wav):
        with open(os.path.join(dir_path, f"audio-{i:04d}.wav"), "wb") as f:
            f.write(make_wav(8000, 1, 400 + 37 * i))
    for i in range(n_exact_dup):
        # byte-identical copy of unique PNG i under a new name
        with open(os.path.join(dir_path, f"dup-{i:04d}.png"), "wb") as f:
            f.write(_encode_gray_png(grids[i]))
    for i in range(n_reencode):
        # same pixels as unique PNG i, different bytes (split IDAT)
        with open(os.path.join(dir_path, f"reenc-{i:04d}.png"), "wb") as f:
            f.write(_encode_gray_png(grids[i], split_idat=True))
    for i in range(n_resized):
        # 2x nearest-neighbor upscale: 4x pixels/sum, EXACTLY equal dHash
        with open(os.path.join(dir_path, f"resz-{i:04d}.png"), "wb") as f:
            f.write(_encode_gray_png(_upscale2(grids[i])))
    for i in range(n_releveled):
        # +48 brightness shift: same count, shifted sum, equal dHash
        with open(os.path.join(dir_path, f"relv-{i:04d}.png"), "wb") as f:
            f.write(_encode_gray_png(_relevel(grids[i], 48)))
    for i in range(n_junk):
        with open(os.path.join(dir_path, f"junk-{i:04d}.bin"), "wb") as f:
            f.write(b"not a media payload " * (i + 1))

    n_files = (
        n_unique_png + n_wav + n_exact_dup + n_reencode
        + n_resized + n_releveled + n_junk
    )
    # content-tier survivors: every base (distinct odd sums by
    # construction), every wav (distinct sample counts), every resized
    # (sums ≡0 mod 4) and re-leveled (sum collision needs j = i+24·n)
    # copy — the triples are pairwise distinct, asserted here
    triples = set()
    for i, rows in enumerate(grids):
        n = len(rows) * len(rows[0])
        s = sum(sum(r) for r in rows)
        m = max(max(r) for r in rows)
        triples.add((n, s, m))
        if i < n_resized:
            triples.add((4 * n, 4 * s, m))
        if i < n_releveled:
            triples.add((n, s + 48 * n, m + 48))
    n_img_content = n_unique_png + n_resized + n_releveled
    assert len(triples) == n_img_content, "stat-triple collision"
    # perceptual prediction: base hashes, with each planted twin
    # contributing one more member at distance 0 (exact invariances)
    hashes = [fixture_dhash(g) for g in grids]
    survivor_hashes = list(hashes)
    survivor_hashes += [hashes[i] for i in range(n_resized)]
    survivor_hashes += [hashes[i] for i in range(n_releveled)]
    n_perc = predict_perceptual_drops(survivor_hashes)
    n_content = n_img_content + n_wav
    return MediaFunnelPrediction(
        n_files=n_files,
        n_decodable=n_files - n_junk,
        n_exact_unique=n_unique_png + n_wav + n_reencode
        + n_resized + n_releveled,
        n_content_unique=n_content,
        n_perceptual_dropped=n_perc,
        n_semantic_dropped=0,
        n_final=n_content - n_perc,
    )
