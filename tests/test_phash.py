"""Perceptual dHash operator (r9 — VERDICT r8 #1): integer-exact
invariances, agreement with the independent fixture oracle through the
REAL decoders, and completeness of the banded Hamming LSH join against
brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.operators.phash import (
    dhash64_pixels,
    phash_media,
    phash_near_dups,
)

U64 = (1 << 64) - 1


def _rand_img(rng, w=18, h=16):
    return rng.randint(0, 192, size=(h, w)).astype(np.uint8)


def test_relevel_invariance_exact():
    rng = np.random.RandomState(11)
    img = _rand_img(rng)
    for d in (1, 17, 48, 63):
        shifted = (img.astype(np.int16) + d).astype(np.uint8)
        assert dhash64_pixels(shifted) == dhash64_pixels(img)


def test_integer_upscale_invariance_exact_when_grid_aligned():
    rng = np.random.RandomState(12)
    img = _rand_img(rng, w=27, h=24)  # 9|27, 8|24
    for k in (2, 3, 4):
        up = np.kron(img, np.ones((k, k), dtype=np.uint8))
        assert dhash64_pixels(up) == dhash64_pixels(img)


def test_non_aligned_upscale_stays_within_hamming_budget():
    """For non-aligned dims, boundaries shift by <1 source pixel per
    block; on images with SMOOTH large-scale structure (the realistic
    perceptual case — pure noise has no structure to preserve and is
    the documented worst case) that flips at most a few bits."""
    w, h = 20, 15  # 9∤20, 8∤15
    img = np.array(  # smooth radial blob
        [
            [
                max(0, 200 - ((x - 10) ** 2 * 3 + (y - 7) ** 2 * 5))
                for x in range(w)
            ]
            for y in range(h)
        ],
        dtype=np.uint8,
    )
    up = np.kron(img, np.ones((2, 2), dtype=np.uint8))
    d = bin(((dhash64_pixels(img) ^ dhash64_pixels(up)) & U64)).count("1")
    assert d <= 6


def test_video_uses_first_frame_and_channels_fold():
    rng = np.random.RandomState(14)
    rgb = rng.randint(0, 192, size=(16, 18, 3)).astype(np.uint8)
    vid = np.stack([rgb, rgb[::-1]])
    assert dhash64_pixels(vid) == dhash64_pixels(rgb)


def test_sub_grid_and_none_yield_none():
    assert dhash64_pixels(None) is None
    assert dhash64_pixels(np.zeros((4, 4), np.uint8)) is None
    assert dhash64_pixels(np.zeros((0, 16, 18, 3), np.uint8)) is None


def test_matches_independent_fixture_oracle_through_real_png_decode():
    """fixture_dhash (plain loops, written from the definition) must
    agree with the operator THROUGH the real PNG encode→decode path —
    the cross-implementation check that certifies both."""
    from geoestate_etl_spark.operators.multimodal import png_pixels
    from tests.media_corpus_fixture import (
        _encode_gray_png,
        fixture_dhash,
        noise_rows,
    )

    for i in (0, 7, 19):
        rows = noise_rows(i)
        px = png_pixels(_encode_gray_png(rows))
        assert (dhash64_pixels(px) & U64) == fixture_dhash(rows)


def test_phash_media_over_payload_frame(spark):
    from geoestate_etl_spark.operators.multimodal import make_wav
    from tests.media_corpus_fixture import _encode_gray_png, noise_rows

    rows_a, rows_b = noise_rows(1), noise_rows(2)
    data = [
        (1, bytearray(_encode_gray_png(rows_a))),
        (2, bytearray(_encode_gray_png(rows_b))),
        (3, bytearray(make_wav(8000, 1, 100))),  # audio: NULL
        (4, bytearray(b"junk")),  # undecodable: NULL
    ]
    df = spark.createDataFrame(data, "media_id long, content binary")
    got = {r.media_id: r.phash for r in phash_media(df).collect()}
    from tests.media_corpus_fixture import fixture_dhash

    assert (got[1] & U64) == fixture_dhash(rows_a)
    assert (got[2] & U64) == fixture_dhash(rows_b)
    assert got[3] is None and got[4] is None


def _brute_pairs(hashes: dict[int, int], d: int) -> set[tuple[int, int, int]]:
    ids = sorted(hashes)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin((hashes[a] ^ hashes[b]) & U64).count("1")
            if ham <= d:
                out.add((a, b, ham))
    return out


def test_banded_join_complete_vs_brute_force(spark):
    """Pigeonhole: 8 bands of 8 bits catch EVERY pair within distance
    ≤ 7 — the LSH join must equal brute force exactly, including
    signed-wrap hashes (top bit set)."""
    rng = np.random.RandomState(21)
    hashes: dict[int, int] = {}
    for i in range(60):
        hashes[i] = int(rng.randint(0, 1 << 62)) | (
            (1 << 63) if i % 3 == 0 else 0
        )
    # plant near twins at controlled distances 0..7
    for j, d in enumerate([0, 1, 3, 5, 6, 7]):
        base = hashes[j]
        flipped = base
        for bit in range(d):
            flipped ^= 1 << (bit * 9 % 64)
        hashes[100 + j] = flipped

    def to_signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    df = spark.createDataFrame(
        [(k, to_signed(v)) for k, v in hashes.items()], "id long, phash long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_dups(df, max_hamming=6).collect()
    }
    assert got == _brute_pairs(hashes, 6)


def test_hot_bucket_cap_drops_flat_color_pileup(spark):
    """1000 flat images all hash to 0 — without the cap that band
    bucket alone is a ~500k-pair self-join. With cap < pileup the
    bucket is skipped entirely (the documented completeness trade)."""
    rows = [(i, 0) for i in range(1000)] + [(2000, 1), (2001, 1)]
    df = spark.createDataFrame(rows, "id long, phash long")
    got = phash_near_dups(df, max_hamming=6, bucket_cap=100).collect()
    # the distance-1 pair (hash 0 vs 1) also dies with the hot bucket:
    # every band of both values is either the pileup bucket or unique
    assert {(r.id_a, r.id_b) for r in got} == {(2000, 2001)}


def test_max_hamming_validation():
    with pytest.raises(ValueError):
        phash_near_dups(None, max_hamming=8)


def test_null_hashes_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 5), (3, None)], "id long, phash long"
    )
    got = phash_near_dups(df).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(1, 2, 0)]


def test_full_width_hash_survives_mixed_batch_exactly(spark):
    """Regression (r9): a pandas batch mixing int hashes and None rows
    infers float64, and astype('Int64') silently rounds values above
    2^53 — the low bits of a 64-bit hash. Both kernels now build the
    column with pd.array; this pins a >2^53 hash flowing EXACTLY
    through a single mixed batch (coalesce(1) forces co-batching)."""
    from geoestate_etl_spark.operators.multimodal import (
        decode_media_content,
        png_pixels,
    )
    from tests.media_corpus_fixture import _encode_gray_png, noise_rows

    rows_px = noise_rows(1)  # hash 7767691586975978858 > 2^53
    expected = dhash64_pixels(
        png_pixels(_encode_gray_png(rows_px))
    )
    assert abs(expected) > (1 << 53)
    df = spark.createDataFrame(
        [
            (1, bytearray(_encode_gray_png(rows_px))),
            (2, bytearray(b"junk, forces a None hash in the batch")),
        ],
        "media_id long, content binary",
    ).coalesce(1)
    got_media = {r.media_id: r.phash for r in phash_media(df).collect()}
    assert got_media[1] == expected and got_media[2] is None
    got_decode = {
        r.media_id: r.phash for r in decode_media_content(df).collect()
    }
    assert got_decode[1] == expected and got_decode[2] is None
