"""Deterministic (image, caption) pair-corpus fixture with a PREDICTED
joint funnel (r9 — VERDICT r8 #4).

Builds the keyed pair relation ``plans/paired_pipeline.run_paired_corpus``
consumes and predicts — BEFORE any Spark runs, from the construction
plus independent pure-Python reimplementations of the hash kernels —
exactly which pairs the union-closure election drops:

- ``n_base`` base pairs: unique noise image + unique caption.
- ``n_img_exact`` / ``n_img_reenc`` / ``n_img_resized`` /
  ``n_img_releveled``: a FRESH caption paired with (respectively) a
  byte-identical copy, a split-IDAT re-encode, a 2x nearest-neighbor
  upscale, and a +48 re-level of base i's image — each an image-side
  edge to base i (exact-hash, stats-fingerprint, perceptual,
  perceptual tiers).
- ``n_txt_exact`` / ``n_txt_near``: a FRESH noise image paired with
  (respectively) base i's caption verbatim, and base i's caption with
  one word appended (shingle-Jaccard 22/23 ≈ 0.956 for the 23-word
  template) — caption-side edges.
- ``n_chain`` CLOSURE triples (the semantics the joint dedup exists
  for): A = fresh image + fresh caption; B = another fresh image +
  A's caption (text edge A–B); C = byte-copy of B's image + fresh
  caption (image edge B–C). C shares NOTHING with A directly, yet the
  component {A, B, C} keeps only A — the fixture predicts 2 drops per
  triple via the same union-find.
- ``n_gate_img`` junk payloads with good captions and ``n_gate_txt``
  good images with 2-word captions: dropped at the admission gate.

Prediction machinery, all independent of the operators under test:

- image tiers: byte/stat equality from the construction, plus the
  fixture dHash (``tests/media_corpus_fixture.fixture_dhash``, plain
  nested loops) over every planted grid — ALL Hamming-<=6 pairs among
  gated images enter the union-find, so accidental near-pairs between
  distinct noise images are part of the prediction, not an assumption.
- caption near-dups: a pure-Python reimplementation of the Arrow
  MinHash kernel's construction (crc32 token hashes masked to 31
  bits, ``acc*31+term`` shingle fold masked to 57 bits, splitmix64
  per-seed permutations masked to 62 bits — plain loops, no numpy;
  drift-gated against the operator in ``tests/test_paired_pipeline``).
  A pair is predicted near iff some LSH band's 4-row signature slice
  matches exactly (band-hash equality is slice equality) AND the true
  shingle Jaccard clears the threshold — the same candidate+rescore
  semantics as ``operators/dedup.minhash_near_dups``, evaluated over
  ALL caption pairs so accidental collisions are covered too.

Captions come from a 23-word template whose static runs are at most
two words long, with every filler drawn from a per-caption-unique
synthetic vocabulary — so every 3-shingle of a caption contains at
least one caption-unique word and distinct captions share ZERO
shingles by construction (their predicted Jaccard is exactly 0). The
template's stopwords make the text gate deterministic: ~9 English
markers (lang_id = en), no punctuation, 23 tokens.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

from pyspark.sql import types as T

#: schema of the keyed pair relation the pipeline consumes
PAIR_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("caption", T.StringType()),
    ]
)

from tests.media_corpus_fixture import (
    _UnionFind,
    _encode_gray_png,
    _relevel,
    _upscale2,
    fixture_dhash,
    noise_rows,
)

# --- independent MinHash oracle (plain Python, no numpy) --------------------

_M31 = 0x7FFFFFFF
_M57 = 0x01FFFFFFFFFFFFFF
_M62 = 0x3FFFFFFFFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _mix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def fixture_minhash(
    text: str, k: int = 3, num_hashes: int = 16
) -> tuple[set[int], list[int]]:
    """(shingle-id set, signature) — the independent oracle for the
    Arrow kernel's construction (``operators/dedup._minhash_kernel``).
    Written from the definition with plain loops."""
    toks = text.lower().split()
    w = [zlib.crc32(t.encode("utf-8")) & _M31 for t in toks]
    n = len(w)
    m = max(n - k, 0) + 1
    pad = w + [0] * (m - 1 + k - n)
    sh: set[int] = set()
    for i in range(m):
        acc = 0
        for off in range(k):
            acc = (acc * 31 + pad[i + off]) & _M57
        sh.add(acc)
    seeds = [_mix64(j) for j in range(1, num_hashes + 1)]
    sig = [min(_mix64(s ^ seed) & _M62 for s in sh) for seed in seeds]
    return sh, sig


def _bands_collide(
    sig_a: list[int], sig_b: list[int], bands: int
) -> bool:
    rows = len(sig_a) // bands
    return any(
        sig_a[b * rows : (b + 1) * rows] == sig_b[b * rows : (b + 1) * rows]
        for b in range(bands)
    )


def _jaccard(a: set[int], b: set[int]) -> float:
    return len(a & b) / max(len(a | b), 1)


# --- caption generation -----------------------------------------------------

_SYL = (
    "ba", "ce", "di", "fo", "gu", "ka", "lo", "mi",
    "nu", "po", "ra", "se", "ti", "vo", "zu",
)


def _word(i: int) -> str:
    """Distinct synthetic word per index; never collides with any
    language-marker token (those are <= 3 letters or 'una'). Indexes
    below 15^3 yield 6-letter words; larger indexes grow a 4th
    syllable (8-letter words, disjoint from the 6-letter space), so
    the vocabulary scales to sweep-tier corpora."""
    a, b, c = i % 15, (i // 15) % 15, (i // 225) % 15
    w = _SYL[a] + _SYL[b] + _SYL[c]
    if i < 3375:
        return w
    return w + _SYL[(i // 3375 - 1) % 15]


#: 23-word template, 12 filler slots, static runs <= 2 words — every
#: 3-shingle includes a filler, so captions with disjoint filler sets
#: share zero shingles. ~9 'en' markers, zero de/fr/es markers.
_TEMPLATE = (
    "the {} {} and {} of the {} {} is {} near the {} {} and a {} {} "
    "of the {} {}"
)


def make_caption(idx: int) -> str:
    """Caption ``idx``: 12 fillers from the caption's own block of the
    synthetic vocabulary (no two captions share a filler). The 54,000
    distinct words are split at 36,000: captions draw below (up to
    3,000 captions), mutations above — no cross-tier word reuse."""
    assert idx < 3000, "caption vocabulary block exhausted"
    base = idx * 12
    return _TEMPLATE.format(*[_word(base + j) for j in range(12)])


def mutate_caption(caption: str, idx: int) -> str:
    """Append one caption-unique word (from the reserved top block of
    the vocabulary): 22 of 23 original shingles survive, one appears —
    true Jaccard 22/23 ≈ 0.956."""
    assert idx < 18_000
    return caption + " " + _word(36_000 + idx)


# --- fixture ----------------------------------------------------------------


@dataclass
class PairedFunnelPrediction:
    n_pairs: int
    n_gated: int
    n_image_edges: int
    n_text_edges: int
    n_joint_dropped: int
    n_final: int
    #: diagnostic: predicted caption-near pairs that band-collide (the
    #: positive control the e2e test asserts is nonzero)
    n_txt_near_detected: int


def generate_paired_rows(
    n_base: int = 24,
    n_img_exact: int = 5,
    n_img_reenc: int = 4,
    n_img_resized: int = 4,
    n_img_releveled: int = 3,
    n_txt_exact: int = 5,
    n_txt_near: int = 4,
    n_chain: int = 2,
    n_gate_img: int = 3,
    n_gate_txt: int = 2,
    jaccard_threshold: float = 0.7,
    bands: int = 4,
    num_hashes: int = 16,
    max_hamming: int = 6,
) -> tuple[list[tuple[int, bytes, str]], PairedFunnelPrediction]:
    """Build ``(pair_id, image_bytes, caption)`` rows + the prediction.

    Pair ids are sequential (0, 1, 2, ...) in planting order, so the
    min-id election is predictable: bases precede their twins.
    """
    mx = max(n_img_exact, n_img_reenc, n_img_resized, n_img_releveled,
             n_txt_exact, n_txt_near)
    assert mx <= n_base

    rows: list[tuple[int, bytes, str]] = []
    #: per gated pair: (grid, caption) for prediction
    gated: list[tuple[int, list[list[int]], str]] = []
    next_img = 0  # global noise index — every fresh image is distinct
    next_cap = 0

    def fresh_grid():
        nonlocal next_img
        g = noise_rows(next_img)
        next_img += 1
        return g

    def fresh_caption() -> str:
        nonlocal next_cap
        c = make_caption(next_cap)
        next_cap += 1
        return c

    def add(grid, caption, png: bytes | None = None) -> None:
        pid = len(rows)
        rows.append((pid, png if png is not None else _encode_gray_png(grid), caption))
        gated.append((pid, grid, caption))

    base_grids, base_caps = [], []
    for _ in range(n_base):
        g, c = fresh_grid(), fresh_caption()
        base_grids.append(g)
        base_caps.append(c)
        add(g, c)
    for i in range(n_img_exact):
        add(base_grids[i], fresh_caption())  # byte-identical encode
    for i in range(n_img_reenc):
        add(base_grids[i], fresh_caption(),
            png=_encode_gray_png(base_grids[i], split_idat=True))
    for i in range(n_img_resized):
        add(_upscale2(base_grids[i]), fresh_caption())
    for i in range(n_img_releveled):
        add(_relevel(base_grids[i], 48), fresh_caption())
    for i in range(n_txt_exact):
        add(fresh_grid(), base_caps[i])
    for i in range(n_txt_near):
        add(fresh_grid(), mutate_caption(base_caps[i], i))
    for j in range(n_chain):
        ga, ca = fresh_grid(), fresh_caption()
        add(ga, ca)  # A
        gb = fresh_grid()
        add(gb, ca)  # B: text edge to A
        add(gb, fresh_caption())  # C: image edge to B (byte-identical)
    # gate failures (never enter `gated`)
    for i in range(n_gate_img):
        rows.append((len(rows), b"not an image payload " * (i + 2),
                     fresh_caption()))
    for i in range(n_gate_txt):
        g = fresh_grid()
        rows.append((len(rows), _encode_gray_png(g), "po ra"))

    # --- prediction: edges over gated pairs, then union-find --------
    ids = [pid for pid, _, _ in gated]
    idx_of = {pid: i for i, pid in enumerate(ids)}
    image_edges: set[tuple[int, int]] = set()
    text_edges: set[tuple[int, int]] = set()

    def star(groups: dict) -> set[tuple[int, int]]:
        out = set()
        for members in groups.values():
            if len(members) > 1:
                root = min(members)
                out |= {(root, m) for m in members if m != root}
        return out

    # image exact (byte equality) and stats fingerprint
    by_bytes: dict[bytes, list[int]] = {}
    by_stats: dict[tuple, list[int]] = {}
    dhashes: list[int] = []
    for pid, grid, _ in gated:
        png = rows[pid][1]
        by_bytes.setdefault(png, []).append(pid)
        n_px = len(grid) * len(grid[0])
        s = sum(sum(r) for r in grid)
        m = max(max(r) for r in grid)
        by_stats.setdefault((n_px, s, m), []).append(pid)
        dhashes.append(fixture_dhash(grid))
    image_edges |= star(by_bytes)
    image_edges |= star(by_stats)
    # perceptual: ALL Hamming<=max_hamming pairs among gated images
    for a in range(len(gated)):
        for b in range(a + 1, len(gated)):
            if bin(dhashes[a] ^ dhashes[b]).count("1") <= max_hamming:
                image_edges.add((ids[a], ids[b]))
    # phash LSH band-bucket occupancy must stay under the pipeline cap
    # for the banded join to be provably complete on this corpus
    occ: dict[tuple[int, int], int] = {}
    for h in dhashes:
        for bnd in range(8):
            key = (bnd, (h >> (bnd * 8)) & 255)
            occ[key] = occ.get(key, 0) + 1
    assert max(occ.values()) <= 1024, "phash band bucket over cap"

    # caption exact (normalized md5 == identity here: captions are
    # already lowercase single-spaced) and MinHash near tier
    by_cap: dict[str, list[int]] = {}
    mh = []
    for pid, _, cap in gated:
        by_cap.setdefault(cap, []).append(pid)
        mh.append(fixture_minhash(cap, num_hashes=num_hashes))
    text_edges |= star(by_cap)
    n_txt_near_detected = 0
    for a in range(len(gated)):
        for b in range(a + 1, len(gated)):
            if gated[a][2] == gated[b][2]:
                continue  # exact tier (and its C(g,2) candidate pairs
                # add nothing beyond the star edges in the union-find)
            if _bands_collide(mh[a][1], mh[b][1], bands) and _jaccard(
                mh[a][0], mh[b][0]
            ) >= jaccard_threshold:
                text_edges.add((ids[a], ids[b]))
                n_txt_near_detected += 1
    # text band occupancy under the pipeline cap (trivial here, but
    # asserted so the capped join is provably complete on this corpus)
    tocc: dict[tuple[int, tuple], int] = {}
    rows_pb = num_hashes // bands
    for _, sig in mh:
        for bnd in range(bands):
            key = (bnd, tuple(sig[bnd * rows_pb : (bnd + 1) * rows_pb]))
            tocc[key] = tocc.get(key, 0) + 1
    assert max(tocc.values()) <= 256, "minhash band bucket over cap"

    # NOTE on exact-caption groups and the near tier: identical
    # captions also band-collide (identical signatures), so the
    # pipeline's near tier emits all C(g,2) pairs of an exact group.
    # Those pairs connect nodes the exact star edges already connect —
    # identical component structure — but they DO count in the
    # pipeline's distinct-text-edge diagnostic. Add them here so the
    # edge-count prediction is exact, not just the drop count.
    for members in by_cap.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                text_edges.add((ms[x], ms[y]))

    uf = _UnionFind(len(gated))
    for a, b in image_edges | text_edges:
        uf.union(idx_of[a], idx_of[b])
    roots = {uf.find(i) for i in range(len(gated))}
    n_gated = len(gated)
    n_final = len(roots)
    pred = PairedFunnelPrediction(
        n_pairs=len(rows),
        n_gated=n_gated,
        n_image_edges=len(image_edges),
        n_text_edges=len(text_edges),
        n_joint_dropped=n_gated - n_final,
        n_final=n_final,
        n_txt_near_detected=n_txt_near_detected,
    )
    return rows, pred
