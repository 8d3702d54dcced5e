"""Johnson-Lindenstrauss sign random projection (functions/vectors.py).

What JL honestly promises is bounded DISTANCE distortion — not top-k
recall on near-random data, where true neighbor gaps are microscopic
(same caveat as the LSH paths, docs/ROADMAP.md). So these tests pin:
(a) Spark == numpy bit-parity of the projection itself, (b) measured
mean relative distance error on the real testdata embeddings with
margin over the observed value, (c) the actual use case — planted
near-duplicates stay near under projection while unrelated pairs stay
far — and (d) determinism of the stateless matrix.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.vectors import (
    cosine,
    project,
    projection_matrix,
)
from tests.conftest import SF_SMOKE


def _np_matrix(out_dim: int, in_dim: int, seed: int = 42) -> np.ndarray:
    return np.array(projection_matrix(out_dim, in_dim, seed))


def test_matrix_shape_and_determinism():
    m1 = projection_matrix(16, 64)
    m2 = projection_matrix(16, 64)
    assert m1 == m2
    assert len(m1) == 16 and len(m1[0]) == 64
    s = 1.0 / math.sqrt(16)
    vals = {v for row in m1 for v in row}
    assert vals == {s, -s}
    # rows differ from each other (the LCG streams are independent)
    assert len({tuple(r) for r in m1}) == 16


def test_spark_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(50)
    M = projection_matrix(8, 64)
    got = {
        r.vec_id: np.array(r.proj)
        for r in emb.select(
            "vec_id", project("embedding", M).alias("proj")
        ).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    Mn = np.array(M)
    for r in rows:
        want = Mn @ np.array(r.embedding, dtype=np.float64)
        assert np.allclose(got[r.vec_id], want, atol=1e-12)


def test_distance_distortion_bounded(spark):
    """Measured on this data: mean relative pairwise-distance error
    0.130 at k=16, 0.092 at k=32 — asserted with ~50% margin."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.array(
        [r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    for k, bound in ((16, 0.20), (32, 0.14)):
        Y = X @ _np_matrix(k, X.shape[1]).T
        idx = np.arange(0, len(X), 7)
        da = np.linalg.norm(X[idx, None, :] - X[None, idx, :], axis=2)
        db = np.linalg.norm(Y[idx, None, :] - Y[None, idx, :], axis=2)
        m = da > 0
        rel = np.abs(db[m] - da[m]) / da[m]
        assert rel.mean() < bound, f"k={k}: {rel.mean():.3f}"


def test_near_dups_stay_near_under_projection(spark):
    """The ANN-prefilter contract: a planted near-copy keeps high
    projected cosine; an unrelated random pair stays clearly lower."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=64)
    near = base + rng.normal(scale=0.02, size=64)
    other = rng.normal(size=64)
    df = spark.createDataFrame(
        [
            (1, [float(v) for v in base]),
            (2, [float(v) for v in near]),
            (3, [float(v) for v in other]),
        ],
        "vec_id long, embedding array<double>",
    )
    M = projection_matrix(16, 64)
    p = df.select("vec_id", project("embedding", M).alias("p"))
    a = p.alias("a")
    b = p.alias("b")
    sims = {
        (r.ia, r.ib): r.c
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            cosine(F.col("a.p"), F.col("b.p")).alias("c"),
        )
        .collect()
    }
    assert sims[(1, 2)] > 0.95
    assert abs(sims[(1, 3)]) < 0.6
    assert abs(sims[(2, 3)]) < 0.6


def test_projected_lsh_prefilter_composes(spark):
    """project → hyperplane bucketize composes: bucketing in the
    16-dim projected space still puts the planted near-copy pair in
    the same bucket (the cheap-space index shape)."""
    from geoestate_etl_spark.operators.similarity import (
        bucketize,
        make_hyperplanes,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=64)
    rows = [(1, base), (2, base + rng.normal(scale=0.01, size=64))] + [
        (i, rng.normal(size=64)) for i in range(3, 40)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    M = projection_matrix(16, 64)
    proj = df.select("vec_id", project("embedding", M).alias("embedding"))
    b = bucketize(proj, make_hyperplanes(6, 16))
    buckets = {r.vec_id: r.bucket for r in b.collect()}
    assert buckets[1] == buckets[2]
