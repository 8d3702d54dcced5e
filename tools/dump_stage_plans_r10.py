"""r10 stage-plan evidence for pipeline/build-internal rewrites.

The r10 optimizations live INSIDE iterative builds and e2e pipelines,
not in registry query text, so — like r9's tar/star-edge evidence —
this captures before/after `.explain("formatted")` of the exact stage
shapes that changed, with the OLD shape reconstructed inline (it is a
few lines each; the commit diff is the authority for what the old code
was).

Join-shape note: the per-round/level joins are captured with
``spark.sql.autoBroadcastJoinThreshold=-1`` so the plan shows the
sort-merge shape those joins take AT SCALE (at sf0.1 the tiny
frontier/rank side broadcasts and neither shape exchanges the edge
relation — the removed Exchange+Sort is an at-scale claim and the
evidence must show the at-scale join strategy). Everything else is
captured with the bench session defaults.

    python tools/dump_stage_plans_r10.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from geoestate_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
)


def dump(spark, df, name: str) -> None:
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(OUT_DIR, f"{name}.txt"), "w") as fh:
        fh.write(plan)
    print(name, flush=True)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump-stage-plans-r10")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    supp = spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))

    # ---- BFS edge-relation build: distinct cache (r9) vs ONE keyed
    # exchange carrying dedup + sort (r10) --------------------------------
    bedges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_orderkey").cast("long") + 10_000_000).alias("dst"),
    )
    mirrored = bedges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    mirrored = mirrored.union(
        mirrored.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    e_before = mirrored.distinct()
    e_after = (
        mirrored.repartition(F.col("u")).dropDuplicates().sortWithinPartitions("u")
    )
    dump(spark, e_before, "bfs_edges_build_before")
    dump(spark, e_after, "bfs_edges_build_after")

    # ---- BFS level join at scale (broadcast off → the SMJ shape):
    # unkeyed cache re-exchanges+re-sorts the full edge relation every
    # level; the keyed+sorted cache satisfies the join's requirements ----
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    eb = e_before.persist()
    eb.count()
    ea = e_after.persist()
    ea.count()
    frontier = spark.range(600).select(F.col("id"))
    lvl_before = (
        frontier.join(eb, frontier["id"] == eb["u"])
        .select(F.col("v").alias("id"))
        .distinct()
    )
    lvl_after = (
        frontier.join(ea, frontier["id"] == ea["u"])
        .select(F.col("v").alias("id"))
        .distinct()
    )
    dump(spark, lvl_before, "bfs_level_join_before")
    dump(spark, lvl_after, "bfs_level_join_after")
    eb.unpersist()

    # ---- PageRank contrib round at scale: unkeyed edge cache (r9) vs
    # keyed+sorted cache + degree rollup riding its partitioning (r10) ---
    pedges = supp.select(
        F.col("s_suppkey").alias("src"),
        (F.col("s_nationkey").cast("long") + 1_000_000).alias("dst"),
    )
    pe_before = pedges.persist()
    pe_before.count()
    pe_after = (
        pedges.repartition(F.col("src")).sortWithinPartitions("src").persist()
    )
    pe_after.count()
    ranks = (
        pe_before.select(F.col("src").alias("id"))
        .union(pe_before.select(F.col("dst").alias("id")))
        .distinct()
        .withColumn("pr", F.lit(0.001))
        .localCheckpoint()
    )

    def contribs(edges):
        out_deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        return (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )

    dump(spark, contribs(pe_before), "pagerank_contribs_before")
    dump(spark, contribs(pe_after), "pagerank_contribs_after")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    pe_before.unpersist()
    pe_after.unpersist()

    # ---- text_grams build: two scans + two explodes + full join (r9)
    # vs ONE tagged explode + pivot (r10); LM: corpus exploded twice
    # (model + scoring) vs one per-(doc, gram) pass (r10) ----------------
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    from geoestate_etl_spark.functions.ngram_lm import (
        char_ngram_counts,
        ngram_logprob_micro,
        sliding_char_ngrams,
    )
    from geoestate_etl_spark.operators.repetition import ngram_repetition

    merged = None
    for n in (2, 3):
        rep = ngram_repetition(docs, n).select(
            "doc_id",
            F.col("n_grams").alias(f"n_grams{n}"),
            F.col("top_gram").alias(f"top{n}_gram"),
            F.col("top_n").alias(f"top{n}_n"),
            F.col("dup_occ").alias(f"dup{n}"),
        )
        merged = rep if merged is None else merged.join(rep, "doc_id", "full")
    # old LM shape (r9): model from one corpus explode, scoring from a
    # SECOND corpus explode joined per gram occurrence
    model = char_ngram_counts(docs, "text", 3).persist()
    totals = model.agg(
        F.sum("cnt").alias("_total"), F.count("*").alias("_vocab")
    )
    grams = docs.select(
        F.col("doc_id"), F.explode(sliding_char_ngrams("text", 3)).alias("gram")
    )
    denom = F.col("_total") + F.lit(1.0) * F.col("_vocab")
    lp_micro = (
        F.round(
            F.log((F.coalesce(F.col("_cnt"), F.lit(0)) + F.lit(1.0)) / denom)
            * 1e6
        ).cast("long")
    )
    lm_old = (
        grams.join(model.withColumnRenamed("cnt", "_cnt"), "gram", "left")
        .crossJoin(F.broadcast(totals))
        .select(F.col("doc_id"), lp_micro.alias("_lp_micro"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("lm_grams"),
            F.sum("_lp_micro").alias("lm_sum_micro"),
        )
    )
    dump(spark, merged.join(lm_old, "doc_id", "full"), "text_grams_build_before")
    model.unpersist()

    # new shape = the committed builder, bypassing the prepared store
    from geoestate_etl_spark.plans.queries_suites import q_text_metrics  # noqa: F401
    from geoestate_etl_spark.operators.repetition import _grams, _tokens

    toks = _tokens("text")

    def tag(n: int):
        return F.transform(
            _grams(toks, n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    gc = (
        docs.select("doc_id", F.explode(F.concat(tag(2), tag(3))).alias("t"))
        .select("doc_id", F.col("t.n").alias("n"), F.col("t.g").alias("g"))
        .groupBy("doc_id", "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = F.max(F.struct(F.col("c"), F.col("g")))
    per_n = gc.groupBy("doc_id", "n").agg(
        F.sum("c").alias("n_grams"),
        top.getField("g").alias("top_gram"),
        top.getField("c").alias("top_n"),
        F.sum(F.col("c") - 1).alias("dup_occ"),
    )
    merged_new = (
        per_n.groupBy("doc_id")
        .pivot("n", [2, 3])
        .agg(
            F.first("n_grams").alias("n_grams"),
            F.first("top_gram").alias("top_gram"),
            F.first("top_n").alias("top_n"),
            F.first("dup_occ").alias("dup_occ"),
        )
        .select(
            "doc_id",
            F.col("2_n_grams").alias("n_grams2"),
            F.col("2_top_gram").alias("top2_gram"),
            F.col("2_top_n").alias("top2_n"),
            F.col("2_dup_occ").alias("dup2"),
            F.col("3_n_grams").alias("n_grams3"),
            F.col("3_top_gram").alias("top3_gram"),
            F.col("3_top_n").alias("top3_n"),
            F.col("3_dup_occ").alias("dup3"),
        )
    )
    lm_new = ngram_logprob_micro(docs, None, "doc_id", "text", 3)
    dump(
        spark, merged_new.join(lm_new, "doc_id", "full"), "text_grams_build_after"
    )

    # ---- paired equality edge tiers: three windows + per-side
    # distincts + pre-CC distinct (r9) vs ONE stacked window + ONE
    # distinct (r10) ------------------------------------------------------
    from pyspark.sql import Window

    from geoestate_etl_spark.plans.paired_pipeline import (
        _STAT_COLS,
        _star_edges_tagged,
    )

    gated = (
        li.limit(2000)
        .select(
            F.col("l_orderkey").cast("long").alias("pair_id"),
            F.xxhash64(F.col("l_shipdate").cast("string")).alias("_chash"),
            F.concat(F.col("l_returnflag"), F.col("l_shipdate").cast("string")).alias("caption"),
        )
        .withColumn("n_px", F.lit(1))
        .withColumn("px_sum", F.lit(1))
        .withColumn("px_max", F.lit(1))
        .withColumn("n_samples", F.lit(None).cast("long"))
        .withColumn("pcm_sq_sum", F.lit(None).cast("long"))
        .withColumn("pcm_peak", F.lit(None).cast("long"))
        .persist()
    )
    gated.count()
    fp = F.xxhash64(*[F.coalesce(F.col(c), F.lit(-1)) for c in _STAT_COLS])

    def star_old(df, key_col):
        w = Window.partitionBy(key_col)
        return (
            df.select(F.col(key_col), F.col("pair_id"))
            .withColumn("_root", F.min("pair_id").over(w))
            .filter(F.col("pair_id") != F.col("_root"))
            .select(
                F.col("_root").alias("id_a"), F.col("pair_id").alias("id_b")
            )
        )

    img_exact = star_old(gated, "_chash")
    img_reenc = star_old(gated.withColumn("_fp", fp), "_fp")
    txt_exact = star_old(
        gated.withColumn("_tfp", F.md5(F.col("caption").cast("binary"))), "_tfp"
    )
    tagged_before = (
        img_exact.unionByName(img_reenc)
        .distinct()
        .withColumn("_src", F.lit("i"))
        .unionByName(txt_exact.distinct().withColumn("_src", F.lit("t")))
    )
    dump(
        spark,
        tagged_before.select("id_a", "id_b").distinct(),
        "paired_edges_before",
    )
    tagged_after = _star_edges_tagged(
        gated.withColumn("_fp", fp).withColumn(
            "_tfp", F.md5(F.col("caption").cast("binary"))
        ),
        [("i", "_chash"), ("i", "_fp"), ("t", "_tfp")],
        "pair_id",
    ).withColumnRenamed("tag", "_src")
    dump(
        spark,
        tagged_after.distinct().select("id_a", "id_b"),
        "paired_edges_after",
    )
    gated.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
