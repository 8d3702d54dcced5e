"""Product quantization: encode parity vs numpy, ADC serve-path plan
shape (pure Columns, TakeOrderedAndProject), determinism across
partitionings, recall floor on clustered data, compression ratio."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.pq import (
    pq_adc_topk,
    pq_bytes_per_vector,
    pq_encode,
    pq_recall_table,
    pq_train,
)
from geoestate_etl_spark.operators.similarity import brute_force_topk

SF = "/root/testdata/sf0.01"
DIM = 64
M, K = 8, 16


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        # unit-normalize so inner product == cosine (the ADC metric)
        .withColumn("_n", F.sqrt(F.aggregate(
            "embedding", F.lit(0.0), lambda a, x: a + x * x)))
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: x / F.col("_n")),
        )
        .drop("_n")
    )
    df.persist().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m=M, k=K, seed=7)


def test_train_shape_and_determinism(emb, books):
    assert len(books) == M and len(books[0]) == K and len(books[0][0]) == DIM // M
    again = pq_train(emb.repartition(13), m=M, k=K, seed=7)
    assert books == again  # id-ordered bounded sample → partitioning-proof


def test_encode_matches_numpy(emb, books):
    rows = emb.orderBy("vec_id").collect()
    got = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(emb, books).select("vec_id", "pq_code").collect()
    }
    ds = DIM // M
    for r in rows:
        x = np.asarray(r["embedding"])
        want = [
            int(
                (((np.asarray(books[j]) - x[j * ds : (j + 1) * ds]) ** 2).sum(axis=1))
                .argmin()
            )
            for j in range(M)
        ]
        assert got[r["vec_id"]] == want


def test_adc_topk_plan_is_jvm_side(emb, books):
    codes = pq_encode(emb, books).select("vec_id", "pq_code")
    probe = emb.orderBy("vec_id").first()["embedding"]
    top = pq_adc_topk(codes, books, list(probe), k=10)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # serve path must not re-enter Python: the only Arrow/python eval
    # belongs to the encode stage feeding it
    serve_only = plan.split("ArrowEvalPython")[0]
    assert "element_at" in serve_only


def test_adc_deterministic_across_partitionings(emb, books):
    probe = list(emb.orderBy("vec_id").first()["embedding"])
    codes = pq_encode(emb, books).select("vec_id", "pq_code")
    a = [tuple(r) for r in pq_adc_topk(codes, books, probe, k=10).collect()]
    b = [
        tuple(r)
        for r in pq_adc_topk(codes.repartition(17), books, probe, k=10).collect()
    ]
    assert a == b


def test_recall_floor_on_clustered_data(spark):
    # synthetic clustered vectors: 100 centers × 10 points, mild noise —
    # the regime PQ is built for (real embeddings cluster; the sf
    # tables' near-uniform vectors are the known worst case). Cluster
    # size == k, so recall@10 measures "did ADC retrieve the right
    # cluster" — PQ cannot (and need not) rank noise-scale differences
    # WITHIN a cluster, which is what a 50-point cluster would test.
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(100, DIM))
    pts = []
    for i in range(1000):
        c = centers[i % 100]
        v = c + 0.05 * rng.normal(size=DIM)
        v = v / np.linalg.norm(v)
        pts.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    books = pq_train(df, m=M, k=32, seed=3)
    codes = pq_encode(df, books).select("vec_id", "pq_code")
    recalls = []
    for pid in [0, 7, 13]:
        probe = pts[pid][1]
        exact = [
            r["vec_id"]
            for r in brute_force_topk(df, probe, k=10, vec_col="embedding").collect()
        ]
        approx = [r["vec_id"] for r in pq_adc_topk(codes, books, probe, k=10).collect()]
        recalls.append(pq_recall_table(exact, approx))
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_compression_ratio():
    raw, code = pq_bytes_per_vector(dim=768, m=96, k=256)
    assert raw == 3072 and code == 96  # 32×
    raw, code = pq_bytes_per_vector(dim=DIM, m=M, k=K)
    assert raw == 256 and code == 8  # 32× at the test shape too
