"""Hashing-trick featurizer: index/sign determinism, collision
summing, NULL handling, sparse dot correctness vs dense numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.functions.feature_hash import feature_hash, sparse_dot


def _vecs(spark, rows, dims=64):
    df = spark.createDataFrame(rows, "id long, country string, lang string")
    return df.select(
        "id",
        feature_hash({"country": "country", "lang": "lang"}, dims=dims).alias("v"),
    )


def test_deterministic_and_schema(spark):
    rows = [(1, "US", "en"), (2, "DE", "de"), (3, "US", "en")]
    out = {r.id: (tuple(r.v.indices), tuple(r.v.values)) for r in _vecs(spark, rows).collect()}
    assert out[1] == out[3]  # same features -> same vector
    assert out[1] != out[2]
    idxs, vals = out[1]
    assert list(idxs) == sorted(set(idxs))  # strictly increasing
    assert all(v in (-1.0, 1.0) for v in vals)
    assert len(idxs) == len(vals) == 2


def test_null_features_contribute_nothing(spark):
    rows = [(1, "US", None), (2, None, None)]
    out = {r.id: list(r.v.indices) for r in _vecs(spark, rows).collect()}
    assert len(out[1]) == 1 and out[2] == []


def test_collision_sums_and_cancellation(spark):
    """At dims=1 every feature collides on index 0. Fixed tokens probe
    BOTH branches: (x=v3, y=v3) have equal sign bits (probed) -> the
    values SUM to ±2; (x=v2, y=v2) have opposite bits -> exact
    cancellation yields an EMPTY vector (the 0.0 entry is dropped)."""
    df = spark.createDataFrame(
        [(1, "v3", "v3"), (2, "v2", "v2")], "id long, x string, y string"
    )
    out = {
        r.id: r.v
        for r in df.select(
            "id", feature_hash({"x": "x", "y": "y"}, dims=1).alias("v")
        ).collect()
    }
    assert list(out[1].indices) == [0] and out[1].values[0] in (-2.0, 2.0)
    assert list(out[2].indices) == [] and list(out[2].values) == []
    with pytest.raises(ValueError):
        feature_hash({"x": "x"}, dims=0)
    with pytest.raises(ValueError):
        feature_hash({"x": "x"}, dims=1 << 31)
    with pytest.raises(ValueError):
        feature_hash({})


def test_sparse_dot_matches_dense(spark):
    dims = 32
    rows = [(i, f"c{i % 5}", f"l{i % 3}") for i in range(40)]
    vecs = _vecs(spark, rows, dims=dims)
    a = vecs.filter(F.col("id") < 20).select(F.col("id").alias("ia"), F.col("v").alias("va"))
    b = vecs.filter(F.col("id") >= 20).select((F.col("id") - 20).alias("ia"), F.col("v").alias("vb"))
    got = {
        r.ia: r.dot
        for r in a.join(b, "ia").select("ia", sparse_dot("va", "vb").alias("dot")).collect()
    }

    def dense(v):
        d = np.zeros(dims)
        for i, x in zip(v.indices, v.values):
            d[i] = x
        return d

    va = {r.ia: dense(r.va) for r in a.collect()}
    vb = {r.ia: dense(r.vb) for r in b.collect()}
    for k in got:
        assert got[k] == pytest.approx(float(va[k] @ vb[k])), k
