"""Extension queries: text analysis, dedup, similarity, multimodal.

Exact/deterministic ops carry DuckDB oracles; sketch/LSH ops are
rows-only (their unit tests pin semantics on constructed fixtures
instead — see tests/test_dedup.py, tests/test_similarity.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.functions import text as TX
from geoestate_etl_spark.operators import dedup as DD
from geoestate_etl_spark.operators import multimodal as MM
from geoestate_etl_spark.operators import similarity as SIM
from geoestate_etl_spark.plans.registry import QuerySpec

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- similarity -------------------------------------------------------------


def _probe(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


def q_similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(emb, _probe(spark, sf_dir), k=10)


def _ivf_index_path(sf_dir: str, n_cells: int) -> str:
    """Cache location for the materialized IVF index of one source
    table: keyed by absolute path + file stats + cell count, so a
    regenerated or different-scale source rebuilds instead of serving
    a stale index."""
    import hashlib

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_size}|{int(st.st_mtime)}|{n_cells}".encode()
    ).hexdigest()[:16]
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "spark-warehouse", "ivf_index", key)


def ensure_warehouse_index(spark: SparkSession, sf_dir: str, n_cells: int = 16) -> str:
    """Build the cell-partitioned serving index in spark-warehouse if
    missing (keyed by source stats — see :func:`_ivf_index_path`) and
    return its path. This is the ``ivf_write_index`` lifecycle the
    bench times as ``similarity_index_build``; ``ann_certify`` probes
    it. The ORACLE checkpoint is separate (:func:`ensure_ivf_artifact`
    — committed, drift-gated)."""
    path = _ivf_index_path(sf_dir, n_cells)
    if not os.path.exists(os.path.join(path, "centroids.json")):
        emb = _t(spark, sf_dir, "embeddings")
        SIM.ivf_write_index(emb, path, n_cells=n_cells)
    return path


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the build/probe split a serving system uses: the
    quantizer + cell-assigned table materialize ONCE per source
    (partitioned by cell → probe-time partition pruning); every query
    after that is probe-only. Rebuilding k-means per probe query was
    round 1's scale anti-pattern (VERDICT r1 #2)."""
    path = ensure_warehouse_index(spark, sf_dir, 16)
    assigned, centroids = SIM.ivf_read_index(spark, path)
    return SIM.ivf_probe(assigned, centroids, _probe(spark, sf_dir), k=10, n_probe=4)


def ivf_assign_path(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(_repo_root(), "data", "derived", f"ivf_assign_{tag}.parquet")


def ivf_centroids_path(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(_repo_root(), "data", "derived", f"ivf_centroids_{tag}.parquet")


def ensure_ivf_artifact(spark: SparkSession, sf_dir: str, n_cells: int = 16) -> None:
    """The committed ORACLE checkpoint for the IVF serving path: the
    deterministic Lloyd assignment ``(vec_id, cell)`` plus the trained
    centroids ``(cell, centroid)``, written ONCE per sf and reused —
    the same write-once contract as the dedup-pair / semantic-cluster
    artifacts (drift vs current ``ivf_build`` is caught by
    ``tests/test_derived_artifacts.py``). The k-means itself is
    deterministic but iterative (not SQL-expressible); everything
    downstream of this file — cell pruning, exact rescoring, top-k —
    IS, which is what upgrades ``similarity_ann`` from rows-only to a
    full hash-match row (r3 verdict #1)."""
    apath, cpath = ivf_assign_path(sf_dir), ivf_centroids_path(sf_dir)
    if os.path.exists(apath) and os.path.exists(cpath):
        return
    emb = _t(spark, sf_dir, "embeddings")
    assigned, centroids = SIM.ivf_build(emb, n_cells=n_cells)
    assigned.select("vec_id", "cell").write.mode("overwrite").parquet(apath)
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(cpath)


def read_ivf_artifact(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[list[float]]]:
    """(assignment frame, centroids in cell order) from the committed
    artifact — both engines' common input for the oracled IVF path."""
    ensure_ivf_artifact(spark, sf_dir)
    assign = spark.read.parquet(ivf_assign_path(sf_dir))
    cent_rows = spark.read.parquet(ivf_centroids_path(sf_dir)).collect()
    centroids = [
        [float(x) for x in r.centroid]
        for r in sorted(cent_rows, key=lambda r: r.cell)
    ]
    return assign, centroids




#: fixed bag-of-words retrieval query for the bm25 variant — literal in
#: both the plan and the SQL oracle, present at every test scale
BM25_QUERY = ["spark", "hash", "join", "vector"]


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text-statistics suite, a tagged union of two variants:

    - ``tfidf``: tokenize → explode → per-(doc,term) TF, per-term DF,
      idf = ln((N+1)/(df+1)); top-3 terms per doc (first 50 docs).
    - ``bm25`` (r5): lexical top-10 retrieval for a fixed bag-of-words
      query (:data:`BM25_QUERY`) over the WHOLE corpus — the curation
      workhorse (decontamination sweeps, targeted corpus slicing). See
      :mod:`geoestate_etl_spark.operators.retrieval` for the scale
      shape; ranked on the ROUNDED score + doc_id tiebreaker so the
      ordering is engine- and partitioning-reproducible.

    One explode + chained hash aggregations — the canonical scale
    shape for corpus statistics. DF derives from TF (one row per
    (doc, term) already) instead of a second explode+distinct, and the
    term join is left to AQE: vocabulary is unbounded, so a forced
    broadcast would OOM on a real corpus.
    """
    from pyspark.sql import Window

    from geoestate_etl_spark.operators.retrieval import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar, one job — the corpus size
    terms = docs.select(
        "doc_id", F.explode(F.split(TX.normalize_text("text"), " ")).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((F.lit(float(n_docs)) + 1) / (F.col("df") + 1)), 4
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    tfidf = (
        scored.filter(F.col("doc_id") < 50)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.lit("tfidf").alias("variant"),
            "doc_id",
            "term",
            "score",
            F.col("rn").cast("long").alias("rn"),
        )
    )
    bm25 = bm25_topk(docs, BM25_QUERY, k=10, terms=terms).select(
        F.lit("bm25").alias("variant"),
        "doc_id",
        F.lit(None).cast("string").alias("term"),
        "score",
        "rn",
    )
    return tfidf.unionByName(bm25)


def q_char_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 3-gram Jaccard between consecutive doc pairs —
    set ops on the gram arrays, exact.

    Per-row ``array_distinct`` BEFORE the pair ops: array_intersect/
    array_union return distinct elements regardless, so dedup'ing each
    row once (N rows) instead of inside every pair op (2 ops × pairs)
    is pure savings with identical semantics. The gram frame persists
    at prepare — per-doc rows, the text_metrics treatment."""
    docs = _t(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.array_distinct(TX.char_ngrams("text", 3)).alias("g")
    ).persist()
    left = grams.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("id_a"), F.col("g").alias("ga")
    )
    right = grams.select(
        (F.col("doc_id") - 1).alias("id_a"), F.col("doc_id").alias("id_b"), F.col("g").alias("gb")
    )
    pairs = left.join(right, "id_a")
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
    )


def q_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier→nation graph. Oracled since r3 via
    six unrolled CTE iterations (:func:`_pagerank_sql`); semantics
    additionally pinned against a numpy reference in test_pagerank.
    The fixpoint frame is disk-backed (r6 — VERDICT r5 #3): the six
    iterations run once per source table, not once per session."""
    from geoestate_etl_spark.operators.pagerank import pagerank
    from geoestate_etl_spark.plans.prepared import prepared_frame

    def build() -> DataFrame:
        supp = _t(spark, sf_dir, "supplier")
        edges = supp.select(
            F.col("s_suppkey").alias("src"),
            (F.col("s_nationkey").cast("long") + 1_000_000).alias("dst"),
        )
        return pagerank(edges, iters=6)

    ranks = prepared_frame(
        spark, sf_dir, "pagerank_supplier_nation", build, sources=["supplier"]
    )
    return ranks.select("id", F.round("pr", 6).alias("pr"))


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop-distance histogram from supplier 0 over the bipartite
    supplier↔order graph (edges = distinct lineitem (suppkey,
    orderkey); order nodes offset by 1e7 into a disjoint id range).

    The frontier-expansion family's registry row: level-synchronous
    Pregel-style BFS (:func:`~geoestate_etl_spark.operators.paths.
    bfs_distances` — one keyed shuffle per LEVEL, early-stop, per-level
    lineage truncation) vs the oracle's declarative recursive-CTE +
    ``min(d)`` rebuild of the same fixpoint — independent formulations,
    one hash over the (dist, n_nodes) histogram. Capped at 6 hops;
    the co-purchase graph is small-world, so the loop early-stops.
    The label frame is disk-backed (r6 — VERDICT r5 #3): the level
    iteration runs once per source table, not once per session."""
    from geoestate_etl_spark.operators.paths import bfs_distances
    from geoestate_etl_spark.plans.prepared import prepared_frame

    def build() -> DataFrame:
        li = _t(spark, sf_dir, "lineitem")
        edges = li.select(
            F.col("l_suppkey").cast("long").alias("src"),
            (F.col("l_orderkey").cast("long") + 10_000_000).alias("dst"),
        ).distinct()
        return bfs_distances(edges, source=0, max_hops=6)

    dists = prepared_frame(
        spark, sf_dir, "bfs_supplier_order", build, sources=["lineitem"]
    )
    return (
        dists.groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(F.count("*").alias("n_nodes"))
        .orderBy("dist")
    )


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 2-itemsets over order baskets (basket = order, item =
    part): exact pair co-occurrence support via the within-basket
    self-join (:func:`~geoestate_etl_spark.operators.itemsets.
    frequent_pairs` — pair explosion bounded by basket size, shuffle
    keyed on the basket id). All pairs with support ≥ 2; output is
    3-4k rows at every test scale. FPGrowth's k=2 slice is pinned
    equal in tests (the pyspark.ml bridge certified against this
    oracled path)."""
    from geoestate_etl_spark.operators.itemsets import frequent_pairs

    li = _t(spark, sf_dir, "lineitem")
    return frequent_pairs(li, "l_orderkey", "l_partkey", min_support=2).select(
        F.col("item_a").cast("long").alias("item_a"),
        F.col("item_b").cast("long").alias("item_b"),
        F.col("support"),
    )


def q_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection with ZERO float in the
    predicate: flag orders whose |price − mean| > 1.5σ within their
    priority group, decided by the exact cross-multiplied integer
    inequality ``4·(x·n − S)² > 9·(n·Σx² − S²)`` over DECIMAL(38,0)
    cents (σ and mean never materialize as floats — the micro-unit
    doctrine applied to second moments; Σx² of cents exceeds int64 at
    sf0.1, hence DECIMAL). One grouped aggregate broadcast back into a
    scan-side filter: two passes over orders, no per-row UDF, exact on
    any partitioning."""
    orders = _t(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    c = orders.select(
        "o_orderpriority", cents.cast(d38).alias("cents")
    )
    a = c.groupBy("o_orderpriority").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("cents").cast(d38).alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast(d38).alias("s2"),
    )
    dev = F.col("cents") * F.col("n") - F.col("s1")
    flagged = (
        c.join(F.broadcast(a), "o_orderpriority")
        .filter(
            dev * dev * F.lit(4).cast(d38)
            > (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            * F.lit(9).cast(d38)
        )
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_out"),
        F.min("cents").cast("long").alias("min_out_cents"),
        F.max("cents").cast("long").alias("max_out_cents"),
    )


_OUTLIER_SQL = (
    "WITH c AS (SELECT o_orderpriority, "
    "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0)) AS cents "
    "FROM orders), "
    "a AS (SELECT o_orderpriority, CAST(count(*) AS DECIMAL(38,0)) AS n, "
    "CAST(sum(cents) AS DECIMAL(38,0)) AS s1, "
    "CAST(sum(cents * cents) AS DECIMAL(38,0)) AS s2 "
    "FROM c GROUP BY o_orderpriority) "
    "SELECT c.o_orderpriority, count(*) AS n_out, "
    "CAST(min(c.cents) AS BIGINT) AS min_out_cents, "
    "CAST(max(c.cents) AS BIGINT) AS max_out_cents "
    "FROM c JOIN a USING (o_orderpriority) "
    "WHERE 4 * (c.cents * n - s1) * (c.cents * n - s1) "
    "> 9 * (n * s2 - s1 * s1) "
    "GROUP BY c.o_orderpriority"
)


_BASKET_SQL = (
    "WITH base AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i "
    "FROM lineitem) "
    "SELECT CAST(a.i AS BIGINT) AS item_a, CAST(c.i AS BIGINT) AS item_b, "
    "count(*) AS support "
    "FROM base a JOIN base c ON a.b = c.b AND a.i < c.i "
    "GROUP BY a.i, c.i HAVING count(*) >= 2"
)


_BFS_SQL = (
    "WITH RECURSIVE e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS u, "
    "CAST(l_orderkey AS BIGINT) + 10000000 AS v FROM lineitem), "
    "e2 AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e), "
    "r(id, d) AS ("
    "SELECT CAST(0 AS BIGINT) AS id, 0 AS d "
    "UNION "
    "SELECT e2.v AS id, r.d + 1 AS d FROM r JOIN e2 ON e2.u = r.id "
    "WHERE r.d < 6), "
    "m AS (SELECT id, min(d) AS dist FROM r GROUP BY id) "
    "SELECT CAST(dist AS BIGINT) AS dist, count(*) AS n_nodes FROM m "
    "GROUP BY dist ORDER BY dist"
)


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def oracle_sf_dir() -> str:
    """The scale the DuckDB oracles run at (the driver's sf0.01),
    overridable for relocated testdata — kept in ONE place so every
    committed-artifact oracle tracks the same scale (r4 review)."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def dedup_pairs_path(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(_repo_root(), "data", "derived", f"dedup_pairs_{tag}.parquet")


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over the MinHash pair graph (keeper + size).

    The pair graph itself is not SQL-expressible (xxhash64 minhash),
    but it IS deterministic — so the pairs are materialized to a
    parquet table that BOTH engines read: Spark runs iterative label
    propagation over it, the DuckDB oracle runs a recursive CTE over
    the same file. That upgrades the clustering from rows-only to a
    full hash-match gate (round-1 verdict #4), exactly like
    ``graph_components`` but on the real near-dup graph.

    The committed artifact is written ONCE and then reused (a blind
    per-run overwrite would let the green row certify whatever the
    current code emits, and dirty the tree on every driver run —
    VERDICT r2 #6). Drift between the committed pairs and the current
    MinHash code is caught by
    ``tests/test_derived_artifacts.py::test_committed_pairs_match_current_code``.
    """
    from geoestate_etl_spark.operators.components import dedup_clusters

    path = dedup_pairs_path(sf_dir)
    if not os.path.exists(path):
        pairs = DD.minhash_near_dups(
            _t(spark, sf_dir, "documents"), "text", "doc_id", jaccard_threshold=0.2
        )
        pairs.select("id_a", "id_b").write.mode("overwrite").parquet(path)
    return dedup_clusters(spark.read.parquet(path))


def neardup_sigs_path(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        _repo_root(), "data", "derived", f"neardup_sigs_{tag}.parquet"
    )


#: PQ certify constants — ONE definition feeding the Spark variant,
#: the committed-codes artifact, and the import-time oracle LUT
#: (drift between surfaces is impossible by construction)
PQ_M, PQ_K, PQ_SEED = 8, 16, 7


def pq_codes_path(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(_repo_root(), "data", "derived", f"pq_codes_{tag}.parquet")


def media_phash_path(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        _repo_root(), "data", "derived", f"media_phash_{tag}.parquet"
    )


def ensure_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized perceptual-hash table ``(id, phash)`` for the
    phash variant of ``near_dup_pairs`` (r9 — VERDICT r8 #1): one
    grayscale NOISE image per document id, hashed through the REAL
    PNG encode → decode → dHash path (``operators/phash.phash_media``).
    Written ONCE per sf and reused (same write-once contract as the
    signature artifacts; drift vs current kernels is caught by
    ``tests/test_derived_artifacts.py``).

    Why synthesized noise instead of ``attach_real_media`` payloads:
    those are ramp/flat patterns by design (closed-form pixel sums),
    which are all perceptual near-dups of EACH OTHER — the pair set
    would grow quadratically with corpus size. Noise patterns keep
    distinct ids far apart in Hamming space, and the planted twins —
    ``id % 8 == 5`` is the 2× nearest-neighbor UPSCALE of id−1's
    pattern, ``id % 8 == 6`` is id−2's pattern re-leveled +48 (both
    exact dHash invariances; grid-aligned dims) — give a linear,
    deterministic positive-pair population at every scale."""
    import numpy as np
    import pandas as pd

    from geoestate_etl_spark.operators.phash import phash_media

    path = media_phash_path(sf_dir)
    if not os.path.exists(path):
        from geoestate_etl_spark.operators.multimodal import _encode_gray_png

        def _grid(seed: int) -> "np.ndarray":
            w, h = 9 * (2 + seed % 3), 8 * (2 + (seed // 3) % 3)
            idx = (
                np.uint64(seed * 1_000_003 % (1 << 64))
                + np.arange(h, dtype=np.uint64)[:, None] * np.uint64(4099)
                + np.arange(w, dtype=np.uint64)[None, :]
            )
            v = idx
            v ^= v >> np.uint64(30)
            v *= np.uint64(0xBF58476D1CE4E5B9)
            v ^= v >> np.uint64(27)
            v *= np.uint64(0x94D049BB133111EB)
            v ^= v >> np.uint64(31)
            return (v % np.uint64(192)).astype(np.uint8)

        def _gen(batches):
            for pdf in batches:
                rows = []
                for i in pdf["media_id"].astype("int64"):
                    i = int(i)
                    if i % 8 == 5:
                        g = np.kron(
                            _grid(i - 1), np.ones((2, 2), dtype=np.uint8)
                        )
                    elif i % 8 == 6:
                        g = _grid(i - 2) + np.uint8(48)
                    else:
                        g = _grid(i)
                    rows.append((i, _encode_gray_png(g)))
                yield pd.DataFrame(rows, columns=["media_id", "content"])

        ids = _t(spark, sf_dir, "documents").select(
            F.col("doc_id").cast(T.LongType()).alias("media_id")
        )
        par = min(spark.sparkContext.defaultParallelism, 8)
        payloads = ids.repartition(par).mapInPandas(
            _gen, "media_id long, content binary"
        )
        phash_media(payloads).select(
            F.col("media_id").alias("id"), "phash"
        ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def ensure_neardup_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized near-dup signature table
    ``(id, sh shingle-ids, sig minhash, simhash)`` — written ONCE per
    sf and reused (same write-once contract as the dedup-pair and
    semantic-cluster artifacts; drift vs current kernels is caught by
    ``tests/test_derived_artifacts.py``). This is the checkpoint that
    lets the DuckDB oracle certify the LSH band join, the hot-bucket
    cap, the exact-Jaccard rescore, and the SimHash block join —
    everything downstream of the (Python-kernel, non-SQL) hashing —
    as full hash-match rows instead of rows-only."""
    path = neardup_sigs_path(sf_dir)
    if not os.path.exists(path):
        docs = _t(spark, sf_dir, "documents")
        sigs = DD.minhash_signatures(docs, "text", "doc_id")
        sh = docs.select(
            F.col("doc_id").alias("id"), DD.simhash_batch("text").alias("simhash")
        )
        sigs.join(sh, "id").write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


# --- multimodal (REAL container-header decode) ------------------------------


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize real PNG/BMP/WAV/MP4/JPEG/GIF/AVI payloads
    (id-derived parameters) and decode them back with the real header
    parser (JPEG since r5 — VERDICT r4 #2: SOF marker walk) AND the
    real content decoder (r5: PNG/BMP/GIF pixels via stdlib
    zlib/unfilter/LZW, WAV PCM samples, and AVI video frames — exact
    integer pixel/sample statistics over every decoded byte, video
    stats spanning every frame; r6: baseline-JPEG entropy decode and
    Motion-JPEG AVI frames, so the jpeg rows and the odd avi ids now
    carry real pixel stats too; r7: avc1 H.264 I_PCM tracks on
    doc_id%14==10 decode through the real bitstream layer in
    operators/h264.py). Every decoded field is a pure function of
    doc_id, so a SQL oracle predicts the exact output — both decode
    tiers are hash-match-gated, not rows-only."""
    docs = _t(spark, sf_dir, "documents")
    # persisted: the header tier and the pixel/sample tier both decode
    # the same synthesized payloads; without this the Arrow-batched
    # synthesis pass runs twice
    media = MM.attach_real_media(docs, "doc_id").persist()
    meta = MM.decode_media_real(media).select(
        "media_id", "format", "width", "height", "n_channels", "sample_rate", "n_frames"
    )
    content = MM.decode_media_content(media).select(
        "media_id", "n_px", "px_sum", "px_max",
        "n_samples", "pcm_sq_sum", "pcm_peak",
    )
    return meta.join(content, "media_id")


def semantic_clusters_path(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(
        _repo_root(), "data", "derived", f"semantic_clusters_{tag}.parquet"
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table (semantic near-dup removal).

    The k-means cluster assignment is deterministic but iterative
    (Lloyd) — not SQL-expressible — so like the MinHash pair graph it
    is materialized ONCE to a committed parquet both engines read:
    Spark joins it back to the vectors and runs the within-cluster
    pair scan + greedy keeper rule; the DuckDB oracle reproduces both
    from the same file with ``list_cosine_similarity``. Drift between
    the committed clusters and the current k-means code is caught by
    ``tests/test_derived_artifacts.py``.

    The threshold (0.40) is calibrated to the synthetic testdata —
    near-random embeddings top out around cos 0.51, so the paper's
    0.9x would certify an empty relation. Semantics are
    threshold-independent; production defaults stay in the operator.
    """
    from geoestate_etl_spark.operators.semantic_dedup import (
        cluster_embeddings,
        semantic_dedup,
        semantic_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = semantic_clusters_path(sf_dir)
    if not os.path.exists(path):
        cluster_embeddings(emb).write.mode("overwrite").parquet(path)
    clustered = spark.read.parquet(path).join(emb, "vec_id")
    # persisted: the 'pair' branch and the keep/drop decisions both
    # consume the pair scan — the operator's cost center (one
    # interpreted vector fold per candidate pair); without this the
    # union runs it twice. Lifetime: bounded at ONE cache entry per
    # sf — the cacheManager deduplicates by analyzed-plan equality, so
    # repeated registry runs REUSE the entry (the cross-run hit is
    # ~4× on this line) rather than accumulate. NOT localCheckpoint:
    # checkpoint materializes through the RDD path, which bypasses
    # AQE — the cluster self-join then runs with every uncoalesced
    # reducer and the query measured 0.6s → 2.3s (r4).
    pairs = semantic_pairs(clustered, cosine_threshold=0.40).persist()
    _, decisions = semantic_dedup(clustered, cosine_threshold=0.40, pairs=pairs)
    nl = F.lit(None).cast("bigint")
    p = pairs.select(
        F.lit("pair").alias("variant"),
        "id_a",
        "id_b",
        "cell",
        "cos_e4",
        nl.alias("kept"),
    )
    d = decisions.select(
        F.lit("keep").alias("variant"),
        F.col("vec_id").alias("id_a"),
        nl.alias("id_b"),
        "cell",
        nl.alias("cos_e4"),
        F.col("kept").cast("bigint").alias("kept"),
    )
    return p.unionByName(d)


# artifact path built by the same helper the Spark side uses, at the
# oracle scale — survives a relocated checkout and tracks
# SPARK_GRAFT_ORACLE_SF_DIR like the other committed-artifact oracles
_SEMANTIC_DEDUP_SQL = (
    "WITH cl AS (SELECT vec_id, cell FROM read_parquet("
    f"'{semantic_clusters_path(oracle_sf_dir())}/*.parquet')), "
    "e AS (SELECT cl.vec_id, cl.cell, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
    "FROM cl JOIN embeddings USING (vec_id)), "
    "p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
    "CAST(a.cell AS BIGINT) AS cell, "
    "CAST(round(list_cosine_similarity(a.v, b.v) * 10000) AS BIGINT) AS cos_e4 "
    "FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id), "
    "pp AS (SELECT * FROM p WHERE cos_e4 >= 4000) "
    "SELECT 'pair' AS variant, id_a, id_b, cell, cos_e4, "
    "CAST(NULL AS BIGINT) AS kept FROM pp "
    "UNION ALL SELECT 'keep', e.vec_id, NULL, CAST(e.cell AS BIGINT), NULL, "
    "CAST(e.vec_id NOT IN (SELECT id_b FROM pp) AS BIGINT) FROM e"
)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over `documents`: docs where
    ``doc_id % 7 == 0`` stand in for the eval set; every other doc is
    training corpus. Output = the contamination report (doc_id +
    distinct shared 8-gram count) — the removal itself is the
    left-anti join in :func:`operators.decontam.decontaminate`,
    covered by tests. Grams travel as xxhash64; the oracle counts the
    same grams as strings (hash is injective absent 64-bit collisions,
    deterministic either way)."""
    from geoestate_etl_spark.operators.decontam import (
        contamination_report,
        contamination_report_bloom,
        semantic_contamination_report,
    )

    docs = _t(spark, sf_dir, "documents")
    # r6 (scale-sweep finding): the eval set is CAPPED at the first
    # 500 doc ids — an eval benchmark is O(1) size in production, and
    # the uncapped %7 framing made the bench side grow with the
    # corpus, turning both the gram join and the semantic cosine scan
    # quadratic (measured exponent 1.33 over sf0.1→1.0; 0.64 capped,
    # 21.2s → 8.7s at sf1.0).
    # The cap exceeds every id at the ORACLE scale (sf0.01 has 500
    # docs), so the certified slice is unchanged there.
    bench = docs.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 500))
    train = docs.filter(F.col("doc_id") % 7 != 0)
    _nl = lambda: F.lit(None).cast("long")  # noqa: E731
    ng = contamination_report(train, bench, "text", "doc_id", n=8).select(
        F.lit("ngram").alias("kind"),
        "doc_id",
        F.col("n_shared").cast("long").alias("n_shared"),
        _nl().alias("bench_id"),
        _nl().alias("cos_e4"),
    )
    # r4 `bloom` variant: the SAME report through the split-block
    # Bloom pre-gate (operators/bloom.py). Oracled against the exact
    # variant's SQL — a filter false NEGATIVE (the only way bloom can
    # be wrong) would drop a shared gram and flip the hash. num_words
    # is deliberately undersized (4096 words for ~100k bench grams at
    # sf0.1) so the gate runs at a high load factor and real false
    # positives flow through the exact join — the regime the
    # certification must cover.
    bl = contamination_report_bloom(
        train, bench, "text", "doc_id", n=8, num_words=1 << 12
    ).select(
        F.lit("bloom").alias("kind"),
        "doc_id",
        F.col("n_shared").cast("long").alias("n_shared"),
        _nl().alias("bench_id"),
        _nl().alias("cos_e4"),
    )
    # r4 `semantic` variant: the same eval-set framing over the
    # embeddings table — corpus vectors within cosine 0.35 of some
    # benchmark vector (paraphrase-leakage tier). Scores travel as
    # scaled BIGINT (cos_e4, the semantic_dedup discipline).
    emb = _t(spark, sf_dir, "embeddings")
    # same O(1)-eval-set cap as the gram tier: 200 = the embeddings
    # row count at the oracle scale, so sf0.01 certification is
    # unchanged while the brute-force bench side stops growing
    bench_e = emb.filter((F.col("vec_id") % 7 == 0) & (F.col("vec_id") < 200)).select(
        F.col("vec_id").alias("bench_id"), "embedding"
    )
    corp_e = emb.filter(F.col("vec_id") % 7 != 0).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    sem = semantic_contamination_report(
        corp_e, bench_e, threshold=0.35, id_col="doc_id",
        bench_id_col="bench_id",
    ).select(
        F.lit("semantic").alias("kind"),
        "doc_id",
        _nl().alias("n_shared"),
        F.col("bench_id").cast("long").alias("bench_id"),
        F.round(F.col("cos_sim") * 10000).cast("long").alias("cos_e4"),
    )
    return ng.unionByName(bl).unionByName(sem)


_WC_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)

def _pagerank_sql(iters: int = 6) -> str:
    """The same 6 fixed PageRank iterations, unrolled as chained CTEs.

    Float discipline: the damping constants are CAST to DOUBLE so
    DuckDB performs the same IEEE ops as the Spark plan's Python-
    computed literals (bare ``(1.0 - 0.85)`` would be a DECIMAL
    subtraction — exactly 0.15, a DIFFERENT double than Python's
    0.15000000000000002). Association order matches the Column
    expressions. Residual divergence (summation order, the r0
    ``1.0/n`` DECIMAL division) is ~1e-16 relative and absorbed by
    round(pr, 6) — pr values are messy-repr quotient sums, never
    short decimals (see ORACLE_NOTES).
    """
    head = (
        "WITH e AS (SELECT s_suppkey AS src, s_nationkey + 1000000 AS dst "
        "FROM supplier), "
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e), "
        "p AS (SELECT count(*) AS n FROM nodes), "
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src), "
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM p) AS pr FROM nodes)"
    )
    its = []
    for k in range(1, iters + 1):
        prev = f"r{k-1}"
        its.append(
            f", c{k} AS (SELECT e.dst AS id, sum(r.pr / d.deg) AS contrib "
            f"FROM e JOIN {prev} r ON r.id = e.src "
            "JOIN deg d ON d.src = e.src GROUP BY e.dst)"
            f", d{k} AS (SELECT COALESCE(sum(pr), 0.0) AS dm FROM {prev} "
            "WHERE id NOT IN (SELECT src FROM deg))"
            f", r{k} AS (SELECT nodes.id, "
            "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM p) "
            f"+ CAST(0.85 AS DOUBLE) * (SELECT dm FROM d{k}) / (SELECT n FROM p) "
            f"+ CAST(0.85 AS DOUBLE) * COALESCE(c{k}.contrib, 0.0) AS pr "
            f"FROM nodes LEFT JOIN c{k} ON c{k}.id = nodes.id)"
        )
    return (
        head
        + "".join(its)
        + f" SELECT id, round(pr, 6) AS pr FROM r{iters}"
    )


SPECS = [
    QuerySpec(
        "pagerank_suppliers",
        q_pagerank_suppliers,
        _pagerank_sql(6),
        "iterative-pagerank (r3: oracled via 6 unrolled CTE iterations)",
    ),
    QuerySpec(
        "graph_bfs",
        q_graph_bfs,
        _BFS_SQL,
        "bfs-sssp (r4: Pregel-style frontier expansion vs "
        "recursive-CTE min-distance rebuild)",
    ),
    QuerySpec(
        "basket_pairs",
        q_basket_pairs,
        _BASKET_SQL,
        "frequent-itemsets (r4: exact pair support via within-basket "
        "self-join; FPGrowth k=2 slice pinned equal in tests)",
    ),
    QuerySpec(
        "outlier_orders",
        q_outlier_orders,
        _OUTLIER_SQL,
        "outlier-detection (r4: per-group 1.5-sigma gate via the exact "
        "cross-multiplied DECIMAL(38,0) second-moment inequality — "
        "no float in the predicate)",
    ),
    QuerySpec(
        "tfidf_top_terms",
        q_tfidf_top_terms,
        "WITH terms AS ("
        "  SELECT doc_id, unnest(regexp_split_to_array("
        f"    {_NORM_SQL}, ' ')) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms "
        "  GROUP BY doc_id, term), "
        "df_ AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms "
        "  GROUP BY term), "
        "n AS (SELECT count(*) AS n_docs FROM documents), "
        "scored AS (SELECT doc_id, tf.term, "
        "  round(tf * ln((n_docs + 1.0) / (df + 1)), 4) AS score "
        "  FROM tf JOIN df_ ON tf.term = df_.term CROSS JOIN n), "
        "ranked AS (SELECT doc_id, term, score, row_number() OVER ("
        "  PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn "
        "  FROM scored WHERE doc_id < 50), "
        # bm25: Okapi/Lucene idf over the fixed 4-term query, ranked on
        # the rounded score (doc_id tiebreak) exactly like the plan
        "dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id), "
        "st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl), "
        "qtf AS (SELECT doc_id, term, count(*) AS tf FROM terms "
        "  WHERE term IN ('spark', 'hash', 'join', 'vector') "
        "  GROUP BY doc_id, term), "
        "qdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms "
        "  WHERE term IN ('spark', 'hash', 'join', 'vector') GROUP BY term), "
        "bscore AS (SELECT qtf.doc_id, round(sum("
        "  ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * "
        "  (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 4) AS score "
        "  FROM qtf JOIN qdf ON qtf.term = qdf.term "
        "  JOIN dl ON qtf.doc_id = dl.doc_id CROSS JOIN st "
        "  GROUP BY qtf.doc_id), "
        "btop AS (SELECT doc_id, score, row_number() OVER ("
        "  ORDER BY score DESC, doc_id ASC) AS rn FROM bscore "
        "  ORDER BY score DESC, doc_id ASC LIMIT 10) "
        "SELECT 'tfidf' AS variant, doc_id, term, score, rn "
        "FROM ranked WHERE rn <= 3 "
        "UNION ALL SELECT 'bm25', doc_id, NULL, score, rn FROM btop",
        "ext-tfidf+bm25-retrieval",
    ),
    # similarity_bruteforce folded into queries_suites.q_similarity_ann
    # as method='exact' (r5, VERDICT r4 #1 — 50-entry driver window)
    QuerySpec(
        "multimodal_meta",
        q_multimodal_meta,
        # every decoded field is a pure function of doc_id (see
        # attach_real_media): the oracle predicts what the real header
        # parser must recover from the actual PNG/BMP/WAV/MP4/JPEG/GIF
        # bytes, AND what the real pixel/sample decoders must sum over
        # every decoded byte. PNG values are (x+y), BMP row bytes are
        # (t+y) with t=x*3+c — both < 256 at these sizes so the %256
        # never wraps and the pixel sums have closed forms; GIF pixel
        # (x, y) carries palette index x%4 with colors (10i, 20i, 30i)
        # → per-pixel channel sum 60·(x%4), row sum 60·S(w) with
        # S(w) = 6·(w//4) + {0,0,1,3}[w%4]; WAV samples
        # (i*257)%32768-16384 DO wrap, so the oracle rebuilds them with
        # a correlated UNNEST(range(n)) (n = channels·frames ≤ 200).
        # avi (k=6): w2×h2, vf frames. Codec alternates (r6):
        # doc_id%14==6 → uncompressed DIB, pixel (f,x,y) = f+x+y on
        # all 3 channels (< 256 at these sizes, never wraps) → px_sum
        # = 3·(h·w·Σf + F·h·Σx + F·w·Σy) with Σn = n(n-1)/2 triangles;
        # doc_id%14==13 → Motion-JPEG, frame f's MCU m decodes to the
        # flat value 128 + 2·(((m+f)%11)−5) replicated to 3 channels
        # (the jpeg closed form per frame) — summed over the frame×MCU
        # grid via UNNEST(range(vf·nb)) with f = i//nb, m = i%nb.
        # mp4 (k=3) codec alternates (r7): doc_id%14==3 →
        # metadata-only container (NULL pixel stats — no track);
        # doc_id%14==10 → avc1 H.264 I_PCM track, REAL bitstream
        # decode (operators/h264.py): frame f's pixel (x,y) is gray
        # (x + 2y + 5f) on 3 channels, < 256 at wa≤48/ha≤32/vfa≤4 so
        # the sum is 3·(F·h·Σx + 2·F·w·Σy + 5·h·w·Σf) in triangle
        # numbers; metadata n_frames stays DURATION TICKS (vfa·100),
        # the mvhd-tier semantics every mp4 row reports.
        # jpeg (k=4, r6 — real baseline entropy decode): MCU m
        # (row-major over a ceil(w/8)×ceil(h/8) grid) is DC-only with
        # coefficient (m%11)-5 and flat q=16, so every sample in block
        # m decodes to exactly 128 + 2·((m%11)-5); edge blocks crop to
        # LEAST(8, w-8·bx)×LEAST(8, h-8·by) pixels — the oracle sums
        # the block grid via a correlated UNNEST(range(n_blocks))
        "WITH m AS (SELECT doc_id, doc_id % 7 AS k, "
        "doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h, "
        "doc_id % 2 + 1 AS ch, doc_id % 100 + 1 AS fr, "
        "doc_id % 16 + 4 AS w2, doc_id % 12 + 4 AS h2, "
        "doc_id % 8 + 2 AS vf, doc_id % 10 + 5 AS fps, "
        "2 * (doc_id % 17) + 16 AS wa, 2 * (doc_id % 9) + 16 AS ha, "
        "doc_id % 3 + 2 AS vfa FROM documents), "
        "wavs AS (SELECT doc_id, "
        "CAST(sum(s * s) AS BIGINT) AS sq, CAST(max(abs(s)) AS INT) AS pk "
        "FROM (SELECT doc_id, ((i * 257) % 32768) - 16384 AS s "
        "FROM m, UNNEST(range(ch * fr)) AS t(i) WHERE k = 2) "
        "GROUP BY doc_id), "
        "jpegs AS (SELECT doc_id, "
        "CAST(sum((128 + 2 * ((i % 11) - 5)) "
        "* LEAST(8, w - 8 * (i % mcw)) * LEAST(8, h - 8 * (i // mcw))) "
        "AS BIGINT) AS psum, "
        "CAST(max(128 + 2 * ((i % 11) - 5)) AS INT) AS pmax "
        "FROM (SELECT doc_id, w, h, (w + 7) // 8 AS mcw, "
        "((w + 7) // 8) * ((h + 7) // 8) AS nb FROM m WHERE k = 4), "
        "UNNEST(range(nb)) AS t(i) GROUP BY doc_id), "
        "mjp AS (SELECT doc_id, "
        "CAST(3 * sum((128 + 2 * (((i % nb + i // nb) % 11) - 5)) "
        "* LEAST(8, w2 - 8 * ((i % nb) % mcw)) "
        "* LEAST(8, h2 - 8 * ((i % nb) // mcw))) AS BIGINT) AS psum, "
        "CAST(max(128 + 2 * (((i % nb + i // nb) % 11) - 5)) AS INT) AS pmax "
        "FROM (SELECT doc_id, w2, h2, vf, (w2 + 7) // 8 AS mcw, "
        "((w2 + 7) // 8) * ((h2 + 7) // 8) AS nb FROM m "
        "WHERE k = 6 AND doc_id % 14 = 13), "
        "UNNEST(range(nb * vf)) AS t(i) GROUP BY doc_id) "
        "SELECT m.doc_id AS media_id, "
        "CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' WHEN 2 THEN 'wav' "
        "WHEN 3 THEN 'mp4' WHEN 4 THEN 'jpeg' WHEN 5 THEN 'gif' "
        "ELSE 'avi' END AS format, "
        "CASE WHEN k IN (0, 1, 4, 5) THEN CAST(w AS INT) "
        "WHEN k = 3 THEN CAST(CASE WHEN m.doc_id % 14 = 10 THEN wa "
        "ELSE m.doc_id % 128 + 16 END AS INT) "
        "WHEN k = 6 THEN CAST(w2 AS INT) END AS width, "
        "CASE WHEN k IN (0, 1, 4, 5) THEN CAST(h AS INT) "
        "WHEN k = 3 THEN CAST(CASE WHEN m.doc_id % 14 = 10 THEN ha "
        "ELSE m.doc_id % 96 + 16 END AS INT) "
        "WHEN k = 6 THEN CAST(h2 AS INT) END AS height, "
        "CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 5 THEN 3 "
        "WHEN 6 THEN 3 WHEN 2 THEN ch ELSE 1 END AS INT) AS n_channels, "
        "CASE WHEN k = 2 THEN CAST(8000 + (m.doc_id % 8) * 1000 AS INT) "
        "WHEN k = 3 THEN CAST(CASE WHEN m.doc_id % 14 = 10 THEN 1000 "
        "ELSE 1000 * (m.doc_id % 5 + 1) END AS INT) "
        "WHEN k = 6 THEN CAST(fps AS INT) END AS sample_rate, "
        "CAST(CASE k WHEN 2 THEN fr "
        "WHEN 3 THEN (CASE WHEN m.doc_id % 14 = 10 THEN vfa * 100 "
        "ELSE m.doc_id % 5000 + 1 END) WHEN 6 THEN vf "
        "ELSE 1 END AS INT) AS n_frames, "
        "CASE WHEN k IN (0, 4) THEN CAST(w * h AS BIGINT) "
        "WHEN k IN (1, 5) THEN CAST(w * h * 3 AS BIGINT) "
        "WHEN k = 3 AND m.doc_id % 14 = 10 "
        "THEN CAST(vfa * wa * ha * 3 AS BIGINT) "
        "WHEN k = 6 THEN CAST(vf * w2 * h2 * 3 AS BIGINT) END AS n_px, "
        "CASE WHEN k = 0 THEN CAST(w * h * (w + h - 2) / 2 AS BIGINT) "
        "WHEN k = 1 THEN CAST(h * (3 * w) * (3 * w - 1) / 2 "
        "+ 3 * w * h * (h - 1) / 2 AS BIGINT) "
        "WHEN k = 5 THEN CAST(h * 60 * (6 * (w // 4) "
        "+ CASE w % 4 WHEN 2 THEN 1 WHEN 3 THEN 3 ELSE 0 END) AS BIGINT) "
        "WHEN k = 6 THEN (CASE WHEN m.doc_id % 14 = 13 THEN mjp.psum "
        "ELSE CAST(3 * (h2 * w2 * (vf * (vf - 1) / 2) "
        "+ vf * h2 * (w2 * (w2 - 1) / 2) "
        "+ vf * w2 * (h2 * (h2 - 1) / 2)) AS BIGINT) END) "
        "WHEN k = 3 AND m.doc_id % 14 = 10 "
        "THEN CAST(3 * (vfa * ha * (wa * (wa - 1) / 2) "
        "+ 2 * vfa * wa * (ha * (ha - 1) / 2) "
        "+ 5 * ha * wa * (vfa * (vfa - 1) / 2)) AS BIGINT) "
        "WHEN k = 4 THEN jpegs.psum "
        "END AS px_sum, "
        "CASE WHEN k = 0 THEN CAST(w + h - 2 AS INT) "
        "WHEN k = 1 THEN CAST(3 * w + h - 2 AS INT) "
        "WHEN k = 5 THEN CAST(30 * LEAST(3, w - 1) AS INT) "
        "WHEN k = 6 THEN (CASE WHEN m.doc_id % 14 = 13 THEN mjp.pmax "
        "ELSE CAST(vf + w2 + h2 - 3 AS INT) END) "
        "WHEN k = 3 AND m.doc_id % 14 = 10 "
        "THEN CAST(wa - 1 + 2 * (ha - 1) + 5 * (vfa - 1) AS INT) "
        "WHEN k = 4 THEN jpegs.pmax END AS px_max, "
        "CASE WHEN k = 2 THEN CAST(ch * fr AS BIGINT) END AS n_samples, "
        "wavs.sq AS pcm_sq_sum, wavs.pk AS pcm_peak "
        "FROM m LEFT JOIN wavs ON m.doc_id = wavs.doc_id "
        "LEFT JOIN jpegs ON m.doc_id = jpegs.doc_id "
        "LEFT JOIN mjp ON m.doc_id = mjp.doc_id",
        "ext-multimodal (png/bmp/wav/mp4 late-r4; jpeg r5 — real "
        "baseline-SOF0 files, SOF0/SOF2 marker-walk header decode; r5 "
        "content tier: REAL PNG/BMP pixel decode [zlib + filter 0-4 "
        "unfilter], GIF LZW+palette decode (late r5), WAV PCM decode, "
        "and AVI video frame decode (late r5 — uncompressed DIB "
        "frames, stats over every pixel of every frame); r6: REAL "
        "baseline-JPEG entropy decode [canonical Huffman + numpy "
        "IDCT], jpeg rows now carry hash-oracled pixel stats, and "
        "odd avi ids are Motion-JPEG — compressed video entropy-"
        "decoded frame by frame, oracled over the frame×MCU grid; "
        "r7: doc_id%14==10 mp4 rows carry avc1 H.264 I_PCM tracks — "
        "real NAL/Exp-Golomb/SPS/PPS/slice-header bitstream decode "
        "with closed-form pixel sums; "
        "exact integer pixel/sample stats vs closed-form/UNNEST "
        "oracle)",
    ),
    QuerySpec(
        "decontaminate",
        q_decontaminate,
        # identical tokenization: lowercase, non-alnum -> space, split,
        # drop empties; 8-word grams; count distinct shared grams
        "WITH words AS (SELECT doc_id, list_filter(string_split("
        "regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' '), "
        "x -> x <> '') AS w FROM documents), "
        "grams AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g "
        "FROM words, UNNEST(range(1, len(w) - 6)) AS t(i) "
        "WHERE len(w) >= 8), "
        # r6: eval sets are O(1) — caps mirror the plan (doc_id < 500 /
        # vec_id < 200, both ≥ every id at the sf0.01 oracle scale)
        "bench AS (SELECT DISTINCT g FROM grams "
        "WHERE doc_id % 7 = 0 AND doc_id < 500), "
        "train AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 7 != 0), "
        # semantic variant: float32 widened to DOUBLE before the cosine
        # (list_cosine_similarity on FLOAT[] would compute in float32),
        # scores as scaled BIGINT, per-doc argmax with min-bench tie
        "emb2 AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
        "sb AS (SELECT vec_id AS bench_id, v FROM emb2 "
        "WHERE vec_id % 7 = 0 AND vec_id < 200), "
        "sc2 AS (SELECT vec_id AS doc_id, v FROM emb2 WHERE vec_id % 7 != 0), "
        "sp AS (SELECT doc_id, bench_id, "
        "CAST(round(list_cosine_similarity(c.v, b.v) * 10000) AS BIGINT) "
        "AS cos_e4 FROM sc2 c, sb b), "
        "sfl AS (SELECT doc_id, max(cos_e4) AS cos_e4 FROM sp "
        "WHERE cos_e4 >= 3500 GROUP BY doc_id), "
        "sev AS (SELECT p.doc_id, min(p.bench_id) AS bench_id, f.cos_e4 "
        "FROM sp p JOIN sfl f ON p.doc_id = f.doc_id AND p.cos_e4 = f.cos_e4 "
        "GROUP BY p.doc_id, f.cos_e4) "
        "SELECT 'ngram' AS kind, t.doc_id, count(*) AS n_shared, "
        "CAST(NULL AS BIGINT) AS bench_id, CAST(NULL AS BIGINT) AS cos_e4 "
        "FROM train t JOIN bench b USING (g) GROUP BY t.doc_id "
        # bloom variant: Spark runs the Bloom-gated pipeline; the
        # oracle is the EXACT computation again (the no-false-negative
        # contract makes them equal by construction)
        "UNION ALL SELECT 'bloom' AS kind, t.doc_id, count(*) AS n_shared, "
        "CAST(NULL AS BIGINT) AS bench_id, CAST(NULL AS BIGINT) AS cos_e4 "
        "FROM train t JOIN bench b USING (g) GROUP BY t.doc_id "
        "UNION ALL SELECT 'semantic', doc_id, CAST(NULL AS BIGINT), "
        "bench_id, cos_e4 FROM sev",
        "llm-decontamination ngram-overlap + bloom-gated + semantic "
        "(embedding cosine) variants",
    ),
    QuerySpec(
        "semantic_dedup",
        q_semantic_dedup,
        _SEMANTIC_DEDUP_SQL,
        "llm-semantic-dedup (SemDeDup: k-means clusters + within-cluster "
        "cosine pairs + greedy min-id keeper)",
    ),
]
