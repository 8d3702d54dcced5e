"""Int8 embedding quantization: roundtrip error bound, cosine recall
parity on the real embeddings table, and the at-rest size win."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from geoestate_etl_spark.functions.vectors import (
    cosine,
    cosine_int8,
    dequantize_int8,
    quantize_int8,
)
from tests.conftest import SF_ORACLE


def test_roundtrip_error_bounded(spark):
    rows = [(1, [0.5, -2.0, 3.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0]), (3, [-1e-3, 1e-3, 5e-4, 0.0])]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = df.select(
        "id",
        F.col("v"),
        dequantize_int8(quantize_int8("v")).alias("rt"),
        quantize_int8("v").getField("scale").alias("scale"),
    ).collect()
    for r in out:
        # symmetric rounding: per-coordinate error <= scale/2
        for a, b in zip(r.v, r.rt):
            assert abs(a - b) <= r.scale / 2 + 1e-12
    zero = [r for r in out if r.id == 2][0]
    assert zero.scale == 0.0 and list(zero.rt) == [0.0, 0.0, 0.0, 0.0]


def test_int8_cosine_recall_vs_float(spark):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    probe = [float(x) for x in emb.filter(F.col("vec_id") == 0).first().embedding]
    pcol = F.array(*[F.lit(v) for v in probe])
    exact = [
        r.vec_id
        for r in emb.select(
            "vec_id", F.round(cosine("embedding", pcol), 6).alias("c")
        ).orderBy(F.desc("c"), "vec_id").limit(10).collect()
    ]
    # quantize the probe driver-side with the same symmetric rule
    mx = max(abs(v) for v in probe)
    scale = mx / 127.0
    pstruct = F.struct(
        F.lit(scale).alias("scale"),
        F.array(*[F.lit(int(round(v / scale))).cast("tinyint") for v in probe]).alias("q"),
    )
    approx = [
        r.vec_id
        for r in emb.select(
            "vec_id",
            F.round(cosine_int8(quantize_int8("embedding"), pstruct), 6).alias("c"),
        ).orderBy(F.desc("c"), "vec_id").limit(10).collect()
    ]
    # measured on this table: top-9 identical, 9/10 overlap; pin a
    # safety margin under that (deterministic data -> stable anyway)
    assert approx[:5] == exact[:5]
    assert len(set(exact) & set(approx)) >= 8


def test_quantized_at_rest_size(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    f32 = str(tmp_path / "f32")
    q8 = str(tmp_path / "q8")
    emb.select("vec_id", "embedding").write.parquet(f32)
    emb.select("vec_id", quantize_int8("embedding").alias("qe")).write.parquet(q8)

    def size(p):
        return sum(os.path.getsize(f) for f in glob.glob(p + "/*.parquet"))

    # measured 0.29 on sf0.1 (parquet encodes the tinyint codes tightly
    # even though its physical type is INT32); generous ceiling
    assert size(q8) < 0.45 * size(f32)
