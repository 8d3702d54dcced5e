"""Product quantization (PQ) for embedding columns — the memory-side
scale path for ANN serving.

Reference parity: the reference (``/root/reference/dags/main.py``) has
no vector search at all; this extends the engine's similarity tier
(SURVEY §2 "beyond", north-star ops). Public-knowledge basis: Jégou,
Douze & Schmid, "Product Quantization for Nearest Neighbor Search"
(IEEE TPAMI 2011) — split each d-dim vector into ``m`` subvectors,
vector-quantize each subspace to ``k`` centroids, store only the m
centroid ids (m bytes at k≤256 vs 4·d bytes of float32: 32× at
d=64, m=8).

Why it matters at 100 TB: a 10B-row float32 embedding table at d=768
is ~30 TB — too big to keep hot. Its PQ codes at m=96 are ~1 TB, and
asymmetric-distance (ADC) scoring against the codes never touches
Python at serve time:

- **train** (driver, bounded): deterministic k-means per subspace on a
  capped, id-ordered sample. Codebooks are small literals
  (m·k·(d/m) = k·d floats — the same "frozen literal" lifecycle as
  the IVF centroid artifact, ``similarity.ivf_build``).
- **encode** (one Arrow-batched pass): numpy argmin per subspace over
  the broadcast codebooks; output ``array<int>`` codes. Map-only — no
  shuffle, embarrassingly parallel.
- **serve** (pure Columns): the probe expands driver-side into an
  m×k lookup table of partial inner products; the row score is m
  ``element_at`` picks + a sum — whole-stage-codegen arithmetic over
  the codes table, `TakeOrderedAndProject` top-k, no Python, no
  shuffle. Composes with IVF cell pruning (encode within cells) the
  same way ``ivf_probe`` composes with the quantized int8 path.

Determinism: seeded LCG-free numpy ``default_rng(seed)``, id-ordered
sample, fixed iteration count — same codebooks on every run/cluster
size, so codes tables are reproducible artifacts (the discipline that
let ``similarity_ann`` be driver-oracled).
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "train_codebooks_np",
    "encode_np",
    "pq_train",
    "pq_encode",
    "pq_adc_topk",
    "pq_adc_scores",
    "adc_lut_e6",
    "pq_recall_table",
    "pq_bytes_per_vector",
]


def _kmeans_1d(sub: np.ndarray, k: int, seed: int, iters: int = 12) -> np.ndarray:
    """Deterministic k-means on one subspace (n × d_sub) → (k × d_sub).

    Greedy kmeans++-style seeding from a seeded RNG, then ``iters``
    Lloyd steps; empty clusters re-seeded to the farthest point
    (deterministic argmax). Ties in argmin break to the lowest id —
    numpy's documented behavior — so encode is reproducible."""
    rng = np.random.default_rng(seed)
    n = sub.shape[0]
    k = min(k, n)
    # kmeans++ seeding
    first = int(rng.integers(0, n))
    cents = [sub[first]]
    d2 = ((sub - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(d2))  # farthest-point variant: deterministic
        cents.append(sub[nxt])
        d2 = np.minimum(d2, ((sub - cents[-1]) ** 2).sum(axis=1))
    c = np.stack(cents)
    for _ in range(iters):
        # n×k distance, argmin assignment
        dist = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = dist.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                c[j] = sub[mask].mean(axis=0)
            else:
                c[j] = sub[int(dist.min(axis=1).argmax())]
    return c


def train_codebooks_np(
    x: np.ndarray, m: int, k: int, seed: int
) -> list[list[list[float]]]:
    """numpy core of :func:`pq_train` — shared verbatim by the Spark
    wrapper and the committed-artifact generator/oracle builder, so
    cross-surface parity holds by construction (the ``gen_houses_raw``
    single-source rule)."""
    d = x.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    books = []
    for j in range(m):
        sub = x[:, j * ds : (j + 1) * ds]
        c = _kmeans_1d(sub, k, seed=seed + j)
        books.append([[float(v) for v in row] for row in c])
    return books


def encode_np(x: np.ndarray, codebooks: list[list[list[float]]]) -> np.ndarray:
    """numpy core of :func:`pq_encode`: (n × d) float64 → (n × m)
    int64 centroid ids. Argmin over ``||c||² − 2·s·c`` (the ``||s||²``
    term is constant per row); ties break to the lowest centroid id
    (numpy's documented argmin rule)."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    codes = np.empty((x.shape[0], m), dtype=np.int64)
    for j in range(m):
        book = np.asarray(codebooks[j], dtype=np.float64)
        sub = x[:, j * ds : (j + 1) * ds]
        dots = sub @ book.T
        cn = (book**2).sum(axis=1)
        codes[:, j] = (cn[None, :] - 2.0 * dots).argmin(axis=1)
    return codes


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    sample_limit: int = 16384,
) -> list[list[list[float]]]:
    """Train PQ codebooks on a bounded, deterministic sample.

    Returns ``codebooks[m][k][d_sub]`` as plain python floats (a
    literal-sized artifact: k·d floats total, independent of corpus
    size). The sample is the first ``sample_limit`` rows in ``id_col``
    order — deterministic across partitionings, bounded on the driver
    (the ivf_build sampling rule)."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast(T.ArrayType(T.DoubleType())))
        .orderBy(F.col(id_col).asc())
        .limit(sample_limit)
        .collect()
    )
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    return train_codebooks_np(x, m, k, seed)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """One Arrow-batched map-only pass: vector → m centroid ids.

    numpy argmin per subspace against the broadcast codebooks; codes
    come back as ``array<int>`` (0-based). Spread an under-partitioned
    single-file source before calling in hot paths (docs/TUNING.md)."""
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _enc(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in s])
        codes = encode_np(x, codebooks)
        return pd.Series([[int(c) for c in row] for row in codes])

    return df.withColumn(out_col, _enc(F.col(vec_col)))


def adc_lut_e6(
    codebooks: list[list[list[float]]], probe: list[float]
) -> list[list[int]]:
    """ADC lookup table in integer micro-units:
    ``lut[j][c] = round(probe_j · codebook[j][c] · 1e6)`` — the
    inner-product partial per (subspace, centroid), an exact BIGINT.
    Integer partials make the m-term score sum exactly reproducible on
    any engine/partitioning (ORACLE_NOTES: micro-units over
    round-the-float-sum), which is what lets the ADC path be
    hash-oracled."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    p = np.asarray(probe, dtype=np.float64)
    lut = []
    for j in range(m):
        pj = p[j * ds : (j + 1) * ds]
        lut.append([int(round(float(np.dot(pj, c)) * 1e6)) for c in codebooks[j]])
    return lut


def _score_e6(codebooks, probe, code_col: str) -> Column:
    lut_ints = adc_lut_e6(codebooks, probe)
    lut = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in lut_ints]
    )
    terms = [
        F.element_at(F.element_at(lut, j + 1), F.element_at(F.col(code_col), j + 1) + 1)
        for j in range(len(lut_ints))
    ]
    return reduce(lambda a, b: a + b, terms)


def pq_adc_scores(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    probe: list[float],
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Every row's ADC score (no cutoff) — the certify surface:
    ``(id, pq_score_e6)`` with the score an exact integer sum of m
    micro-unit partials. Map-only, pure codegen Columns."""
    return codes_df.select(
        F.col(id_col),
        _score_e6(codebooks, probe, code_col).cast("long").alias("pq_score_e6"),
    )


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes — pure Columns.

    Score = Σ_j lut[j][code_j]: m ``element_at`` picks and an exact
    integer sum, all inside whole-stage codegen; ``orderBy().limit(k)``
    plans as TakeOrderedAndProject (per-partition heaps). Ties break
    to the lower id, like every top-k in the engine."""
    return (
        pq_adc_scores(codes_df, codebooks, probe, id_col, code_col)
        .orderBy(F.desc("pq_score_e6"), F.asc(id_col))
        .limit(k)
    )


def pq_recall_table(
    exact_ids: list[int], approx_ids: list[int]
) -> float:
    """Recall@k of an approximate id list against the exact one."""
    if not exact_ids:
        return 1.0
    return len(set(exact_ids) & set(approx_ids)) / len(exact_ids)


def pq_bytes_per_vector(dim: int, m: int, k: int) -> tuple[int, int]:
    """(raw float32 bytes, PQ code bytes) per vector — the compression
    headline. Codes need ceil(log2 k) bits each; byte-aligned here."""
    code_bits = max(1, (k - 1).bit_length())
    return 4 * dim, m * ((code_bits + 7) // 8)
