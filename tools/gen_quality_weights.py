"""Provenance generator for ``functions/quality_weights.py``.

Run from the repo root: ``python tools/gen_quality_weights.py``.
Retrains the frozen token-weight quality model EXACTLY as documented
there — labels self-distilled from the heuristic gate
(``quality_score(text) >= 0.5``) over the sf0.01 ``documents`` table,
one TF feature per distinct corpus token, pyspark.ml
LogisticRegression (maxIter=100, regParam=1e-4, L2,
standardization=False) — and prints the micro-unit literal dict +
intercept for comparison against the committed module.

NOT run in tests (LBFGS convergence is only reproducible to
optimizer tolerance, and the committed literals — not the trainer —
are the serving contract, exactly like the LSH hyperplane literals).
Re-run this when the driver's documents fixture changes materially
and update the module if the separation quality degrades.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors, VectorUDT
    from pyspark.sql.types import DoubleType, StructField, StructType

    from geoestate_etl_spark.functions.text import (
        TOKEN_PATTERN,
        normalize_text,
        quality_score,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lab = docs.select(
        "doc_id",
        "text",
        (quality_score("text") >= 0.5).cast("double").alias("label"),
    )
    toks = lab.select(
        "doc_id",
        "label",
        F.explode(
            F.regexp_extract_all(normalize_text("text"), F.lit(TOKEN_PATTERN), 0)
        ).alias("tok"),
    )
    vocab = sorted(r.tok for r in toks.select("tok").distinct().collect())
    vidx = {t: i for i, t in enumerate(vocab)}
    tf = toks.groupBy("doc_id", "label", "tok").count().toPandas()
    rows: dict[tuple, dict[int, float]] = {}
    for r in tf.itertuples():
        rows.setdefault((r.doc_id, r.label), {})[vidx[r.tok]] = float(r.count)
    schema = StructType(
        [StructField("label", DoubleType()), StructField("features", VectorUDT())]
    )
    train = spark.createDataFrame(
        [
            (lbl, Vectors.sparse(len(vocab), sorted(d.items())))
            for (_, lbl), d in rows.items()
        ],
        schema,
    )
    m = LogisticRegression(
        maxIter=100, regParam=1e-4, elasticNetParam=0.0, standardization=False
    ).fit(train)
    ws = {vocab[i]: int(round(float(w) * 1e6)) for i, w in enumerate(m.coefficients)}
    print("TOKEN_WEIGHTS_MICRO =", dict(sorted(ws.items())))
    print("INTERCEPT_MICRO =", int(round(m.intercept * 1e6)))

    from geoestate_etl_spark.functions.quality_weights import (
        INTERCEPT_MICRO,
        TOKEN_WEIGHTS_MICRO,
    )

    drift = {
        t: (TOKEN_WEIGHTS_MICRO.get(t), ws.get(t))
        for t in set(ws) | set(TOKEN_WEIGHTS_MICRO)
        if TOKEN_WEIGHTS_MICRO.get(t) != ws.get(t)
    }
    print("drift vs committed module:", drift or "none",
          "| intercept delta:", INTERCEPT_MICRO - int(round(m.intercept * 1e6)))


if __name__ == "__main__":
    main()
