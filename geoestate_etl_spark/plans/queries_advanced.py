"""Advanced relational surface: as-of join, range join, pivot, cube,
distinct counts, SQL-API entry point.

The as-of join oracle uses DuckDB's native ASOF JOIN — strong evidence
the union+window formulation implements the standard semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoestate_etl_spark.operators.asof import asof_join, range_join_bucketed
from geoestate_etl_spark.plans.registry import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        from geoestate_etl_spark.sources.parquet_io import load_events

        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event joined to the user's latest purchase at-or-before it."""
    ev = _t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))  # unique per (key, ts)
    )
    left = ev.select("user_id", "ts", "event_id")
    out = asof_join(left, purchases, "user_id", "ts", ["purchase_id"])
    return out.select("event_id", "user_id", "purchase_id")


def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders joined into fixed price bands via the bucketed range join."""
    orders = _t(spark, sf_dir, "orders")
    # bands built JVM-side (spark.range): a Python createDataFrame here
    # costs seconds of py4j/serialization warm-up for 10 rows
    bands = spark.range(10).select(
        F.col("id").cast(T.IntegerType()).alias("band_id"),
        (F.col("id") * 50_000.0).alias("lo"),
        ((F.col("id") + 1) * 50_000.0).alias("hi"),
    )
    joined = range_join_bucketed(
        orders.select("o_orderkey", "o_totalprice"), bands, "o_totalprice", "lo", "hi", 50_000.0
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        joined.groupBy("band_id")
        .agg(F.count("*").alias("cnt"), F.sum(cents).alias("band_cents"))
        .orderBy("band_id")
    )


SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def q_pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer counts pivoted nation × market segment (explicit value
    list → stable output schema)."""
    cust = _t(spark, sf_dir, "customer")
    out = (
        cust.groupBy("c_nationkey")
        .pivot("c_mktsegment", SEGMENTS)
        .agg(F.count(F.lit(1)))
        .orderBy("c_nationkey")
    )
    # pivot yields nullable counts; coalesce to 0 like the SQL oracle
    return out.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in SEGMENTS],
    )


def _tpch_null_pad(df: DataFrame, used: list[str]) -> DataFrame:
    """Pad a variant's frame to the suite's normalized schema
    (kind, k1, k2, v1..v8 — keys string, values long)."""
    cols = []
    for c in ["kind", "k1", "k2"] + [f"v{i}" for i in range(1, 9)]:
        if c in used:
            cols.append(F.col(c))
        elif c in ("k1", "k2"):
            cols.append(F.lit(None).cast(T.StringType()).alias(c))
        else:
            cols.append(F.lit(None).cast(T.LongType()).alias(c))
    return df.select(*cols)


def _rev_e4(price: str = "l_extendedprice", disc: str = "l_discount"):
    """Per-row revenue in exact 1e-4 units (ORACLE_NOTES float rule:
    round each row at the scale, sum exact BIGINTs)."""
    return F.round(F.col(price) * (1 - F.col(disc)) * 10_000).cast("long")


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H suite (entry name kept for driver-history continuity;
    absorbed q3/q5/q6/q10 variants in r4 — tagged union normalized to
    (kind, k1, k2, v1..v8)).

    - ``q1``  wide agg: 2 keys, 8 aggregates, one shuffle.
    - ``q3``  shipping-priority: customer⋈orders⋈lineitem, top-10
      unshipped orders by revenue (two shuffle joins + TopK).
    - ``q5``  local-supplier volume: 6-way join with the
      c_nationkey = s_nationkey co-location constraint; region and
      nation dims explicitly broadcast (at 100 TB they stay tiny —
      the only scan-sized shuffles are the fact-side equi-joins).
    - ``q6``  forecast-revenue: pure scan+filter+scalar agg — the
      predicate-pushdown showcase (integer-scaled discount band
      avoids double-literal comparison ambiguity cross-engine).
    - ``q10`` returned-item reporting: quarter of orders, R-flag
      lineitems, top-20 customers by lost revenue.

    r4 late-session additions (adapted where the slimmed testdata
    schema lacks a TPC-H column — noted per variant):

    - ``q7``  volume shipping between two nations: symmetric
      disjunctive pair predicate over supp/cust nation, revenue by
      (supp_nation, cust_nation, ship-year). No l_commitdate in the
      data, so the year comes from l_shipdate (as in spec).
    - ``q13`` customer order-count distribution: LEFT join survives
      into a two-level aggregation (count per customer → histogram
      of counts). Orders restricted to status 'F' (no o_comment
      column for the NOT LIKE filter) so zero-order customers exist.
    - ``q14`` promo revenue ratio: conditional aggregate over a
      broadcast part join; ratio derived from the two exact integer
      sums in micro-units.
    - ``q15`` top supplier: revenue view + scalar max subquery,
      equality join back (all maxima returned — deterministic
      without a tiebreak).
    - ``q17`` small-quantity-order revenue: the correlated per-part
      average-quantity subquery, expressed as a grouped twin joined
      back (quantities are integers, so avg = exact-int-sum/count is
      bit-identical across engines). Brand filter stands in for the
      missing p_container.
    - ``q18`` large-volume customers: HAVING-subquery semi join
      (sum(l_quantity) > 320) back into orders × customer.
    - ``q22`` dormant rich customers: exact-integer cross-multiplied
      global-average threshold (cents·n > Σcents — zero FP in the
      predicate) + anti join on 'F' orders (every customer has SOME
      order in this data; no c_phone for the prefix filter), grouped
      by nation.

    Money travels as scaled BIGINTs (cents / 1e-4 / 1e-6 per-row
    rounds, exact integer sums); averages derive from the exact sums
    (double(S)/double(n) matches across engines, raw double-sum means
    do not). Reference parity: the reference has no joins at all —
    this suite is engine-declared surface (SURVEY §2 'beyond')."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    # --- q1: pricing summary -------------------------------------
    agged = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_cents"
            ),
            F.sum(F.round(disc_price * 10_000).cast("long")).alias("sum_disc_e4"),
            F.sum(F.round(charge * 1_000_000).cast("long")).alias("sum_charge_e6"),
            F.sum(F.round(F.col("l_discount") * 10_000).cast("long")).alias("_disc_e4"),
            F.count("*").alias("count_order"),
        )
    )
    n = F.col("count_order")
    q1 = _tpch_null_pad(
        agged.select(
            F.lit("q1").alias("kind"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            F.round(F.col("sum_qty")).cast("long").alias("v1"),
            F.col("sum_base_cents").alias("v2"),
            F.col("sum_disc_e4").alias("v3"),
            F.col("sum_charge_e6").alias("v4"),
            F.round(F.col("sum_qty") * 10_000 / n).cast("long").alias("v5"),
            F.round(F.col("sum_base_cents") / n).cast("long").alias("v6"),
            F.round(F.col("_disc_e4") / n).cast("long").alias("v7"),
            F.col("count_order").alias("v8"),
        ),
        ["kind", "k1", "k2", "v1", "v2", "v3", "v4", "v5", "v6", "v7", "v8"],
    )

    # --- q3: unshipped orders, top-10 by revenue ------------------
    cutoff = F.lit("1998-03-15")
    q3_base = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(
            orders.filter(F.col("o_orderdate") < cutoff).select(
                "o_orderkey", "o_custkey", "o_orderdate"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            li.filter(F.col("l_shipdate") > cutoff).select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
        .orderBy(F.desc("rev_e4"), F.asc("o_orderkey"))
        .limit(10)
    )
    odate_int = (
        F.year("o_orderdate") * 10_000
        + F.month("o_orderdate") * 100
        + F.dayofmonth("o_orderdate")
    ).cast("long")
    q3 = _tpch_null_pad(
        q3_base.select(
            F.lit("q3").alias("kind"),
            F.col("o_orderkey").cast("string").alias("k1"),
            F.col("rev_e4").alias("v1"),
            odate_int.alias("v2"),
        ),
        ["kind", "k1", "v1", "v2"],
    )

    # --- q5: local supplier volume (ASIA, 1996) -------------------
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    sup = _t(spark, sf_dir, "supplier")
    asia_nat = F.broadcast(
        nat.join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    q5_base = (
        cust.select("c_custkey", "c_nationkey")
        .join(asia_nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ).select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            sup.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
    )
    q5 = _tpch_null_pad(
        q5_base.select(
            F.lit("q5").alias("kind"),
            F.col("n_name").alias("k1"),
            F.col("rev_e4").alias("v1"),
        ),
        ["kind", "k1", "v1"],
    )

    # --- q6: forecast revenue (scan + scalar agg) -----------------
    disc_pct = F.round(F.col("l_discount") * 100).cast("int")
    q6_base = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & disc_pct.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 10_000).cast(
                    "long"
                )
            ).alias("rev_e4"),
            F.count("*").alias("n_rows"),
        )
    )
    q6 = _tpch_null_pad(
        q6_base.select(
            F.lit("q6").alias("kind"),
            F.col("rev_e4").alias("v1"),
            F.col("n_rows").alias("v2"),
        ),
        ["kind", "v1", "v2"],
    )

    # --- q10: returned items, top-20 customers by lost revenue ----
    q10_base = (
        cust.select("c_custkey", "c_name")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-07-01"))
                & (F.col("o_orderdate") < F.lit("1997-10-01"))
            ).select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            li.filter(F.col("l_returnflag") == "R").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
        .orderBy(F.desc("rev_e4"), F.asc("c_custkey"))
        .limit(20)
    )
    q10 = _tpch_null_pad(
        q10_base.select(
            F.lit("q10").alias("kind"),
            F.col("c_name").alias("k1"),
            F.col("rev_e4").alias("v1"),
            F.col("c_custkey").alias("v2"),
        ),
        ["kind", "k1", "v1", "v2"],
    )

    # --- q7: volume shipping between NATION_1 and NATION_2 --------
    q7_base = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .filter(
            ((F.col("s_nationkey") == 1) & (F.col("c_nationkey") == 2))
            | ((F.col("s_nationkey") == 2) & (F.col("c_nationkey") == 1))
        )
        .groupBy("s_nationkey", "c_nationkey", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
    )
    q7 = _tpch_null_pad(
        q7_base.select(
            F.lit("q7").alias("kind"),
            F.concat(F.lit("NATION_"), F.col("s_nationkey")).alias("k1"),
            F.concat(F.lit("NATION_"), F.col("c_nationkey")).alias("k2"),
            F.col("rev_e4").alias("v1"),
            F.col("l_year").cast("long").alias("v2"),
        ),
        ["kind", "k1", "k2", "v1", "v2"],
    )

    # --- q13: order-count distribution (LEFT join → histogram) ----
    q13_counts = (
        cust.select("c_custkey")
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    q13 = _tpch_null_pad(
        q13_counts.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select(
            F.lit("q13").alias("kind"),
            F.col("c_count").alias("v1"),
            F.col("custdist").alias("v2"),
        ),
        ["kind", "v1", "v2"],
    )

    # --- q14: promo revenue share (conditional agg, e6 ratio) -----
    part = _t(spark, sf_dir, "part")
    q14_base = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-02-01"))
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", _rev_e4()).otherwise(F.lit(0))
            ).alias("promo_e4"),
            F.sum(_rev_e4()).alias("total_e4"),
        )
    )
    q14 = _tpch_null_pad(
        q14_base.select(
            F.lit("q14").alias("kind"),
            F.col("promo_e4").alias("v1"),
            F.col("total_e4").alias("v2"),
            # share in micro-units, derived from the two exact sums
            F.round(F.col("promo_e4") * 1_000_000.0 / F.col("total_e4"))
            .cast("long")
            .alias("v3"),
        ),
        ["kind", "v1", "v2", "v3"],
    )

    # --- q15: top supplier (scalar max subquery over an agg view) -
    q15_rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
    )
    q15_max = q15_rev.agg(F.max("rev_e4").alias("max_rev"))
    q15 = _tpch_null_pad(
        q15_rev.join(F.broadcast(q15_max), F.col("rev_e4") == F.col("max_rev"))
        .join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.lit("q15").alias("kind"),
            F.col("s_name").alias("k1"),
            F.col("rev_e4").alias("v1"),
            F.col("s_suppkey").cast("long").alias("v2"),
        ),
        ["kind", "k1", "v1", "v2"],
    )

    # --- q17: small-quantity orders vs per-part average -----------
    # The correlated avg-quantity subquery as a grouped twin joined
    # back. Quantities are small integers: the per-part avg is an
    # exact-integer sum over an exact count, so 0.2·avg compares
    # bit-identically across engines and partitionings.
    from pyspark.sql import Window as _W

    q17_li = li.join(
        F.broadcast(
            part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    # correlated avg as a window over the part key: ONE scan + one
    # shuffle (vs the textbook agg + join-back's two scans). Exact
    # across engines: quantities are small integers, so the per-part
    # avg is exact-int-sum / exact count.
    q17_base = (
        q17_li.select("l_partkey", "l_quantity", "l_extendedprice")
        .withColumn(
            "avg_qty", F.avg("l_quantity").over(_W.partitionBy("l_partkey"))
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_cents"
            ),
            F.count("*").alias("n_rows"),
        )
    )
    q17 = _tpch_null_pad(
        q17_base.select(
            F.lit("q17").alias("kind"),
            F.col("sum_cents").alias("v1"),
            F.col("n_rows").alias("v2"),
        ),
        ["kind", "v1", "v2"],
    )

    # --- q18: large-volume customers (HAVING-subquery semi join) --
    q18_big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 320)
    )
    q18 = _tpch_null_pad(
        orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .join(q18_big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            cust.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.lit("q18").alias("kind"),
            F.col("c_name").alias("k1"),
            F.col("o_orderkey").alias("v1"),
            odate_int.alias("v2"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v3"),
            F.round(F.col("sum_qty")).cast("long").alias("v4"),
            F.col("c_custkey").alias("v5"),
        ),
        ["kind", "k1", "v1", "v2", "v3", "v4", "v5"],
    )

    # --- q22: dormant rich customers (anti join + exact-int avg) --
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    q22_thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(cents).alias("sum_cents"),
            F.count("*").alias("n_pos"),
        )
    )
    q22 = _tpch_null_pad(
        cust.select("c_custkey", "c_nationkey", cents.alias("bal_cents"))
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .crossJoin(F.broadcast(q22_thresh))
        # cents·n > Σcents — the avg threshold with zero FP involved
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents"))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), F.sum("bal_cents").alias("tot_cents"))
        .select(
            F.lit("q22").alias("kind"),
            F.col("c_nationkey").cast("long").alias("v1"),
            F.col("numcust").alias("v2"),
            F.col("tot_cents").alias("v3"),
        ),
        ["kind", "v1", "v2", "v3"],
    )

    out = q1
    for v in (q3, q5, q6, q10, q7, q13, q14, q15, q17, q18, q22):
        out = out.unionByName(v)
    return out


def q_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE emulation: every 10th customer gets an account credit;
    result = anti-join survivors + replacement rows."""
    from geoestate_etl_spark.operators.merge import upsert

    cust = _t(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    return upsert(cust, updates, ["c_custkey"]).select("c_custkey", "c_acctbal")


def q_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each order attached to the customer's
    order-count "version" active at its date. The versioned dim is
    built from orders themselves (valid_from = nth order date,
    valid_to = next order date), so the whole thing is deterministic
    and SQL-expressible for the oracle."""
    from pyspark.sql import Window

    from geoestate_etl_spark.operators.temporal import (
        temporal_join,
        temporal_join_bucketed,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    dim = orders.select(
        F.col("o_custkey").alias("c_key"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.row_number().over(w).cast(T.LongType()).alias("n_orders_so_far"),
    )
    facts = orders.select(
        "o_orderkey", F.col("o_custkey").alias("c_key"), "o_orderdate"
    )
    plain = temporal_join(facts, dim, "c_key", "o_orderdate").select(
        F.lit("plain").alias("variant"), "o_orderkey", "c_key", "n_orders_so_far"
    )
    # the orders-derived dim is genuinely many-versions-per-key (one
    # version per order); the bucketed variant must reproduce the
    # plain semantics EXACTLY — both ride in one tagged union so the
    # oracle hash certifies their agreement row-for-row
    bucketed = temporal_join_bucketed(
        facts, dim, "c_key", "o_orderdate", bucket_days=365
    ).select(
        F.lit("bucketed").alias("variant"), "o_orderkey", "c_key", "n_orders_so_far"
    )
    return plain.unionByName(bucketed)


def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The S8 capability: raw SQL through spark.sql over registered
    views (replaces the reference's external ClickHouse SQL path).
    Includes an uncorrelated scalar subquery — Catalyst plans it as a
    1-row subquery broadcast, certifying the subquery surface too
    (absorbed the former scalar_subquery entry, r2)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    # integer-cents means from exact cents sums (r3 float discipline)
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS cnt,
               CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*))
                    AS BIGINT) AS avg_cents,
               (SELECT CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                                  / count(*)) AS BIGINT)
                FROM orders_v) AS global_avg_cents
        FROM orders_v
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


SPECS = [
    QuerySpec(
        "asof_last_purchase",
        q_asof_last_purchase,
        "WITH purchases AS ("
        "  SELECT user_id, ts, max(event_id) AS purchase_id FROM events "
        "  WHERE event_type = 'purchase' GROUP BY user_id, ts) "
        "SELECT e.event_id, e.user_id, p.purchase_id "
        "FROM events e ASOF LEFT JOIN purchases p "
        "ON e.user_id = p.user_id AND p.ts <= e.ts",
        "asof-join",
    ),
    QuerySpec(
        "range_join_bands",
        q_range_join_bands,
        "WITH bands AS (SELECT i AS band_id, i * 50000.0 AS lo, "
        "(i + 1) * 50000.0 AS hi FROM range(10) t(i)) "
        "SELECT band_id, count(*) AS cnt, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS band_cents "
        "FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi "
        "GROUP BY band_id ORDER BY band_id",
        "range-join",
    ),
    QuerySpec(
        "tpch_q1",
        q_tpch_q1,
        "WITH a AS (SELECT l_returnflag, l_linestatus, "
        "sum(l_quantity) AS sum_qty, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) "
        "AS BIGINT) AS sum_disc_e4, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) "
        "AS BIGINT)) AS BIGINT) AS sum_charge_e6, "
        "sum(CAST(round(l_discount * 10000) AS BIGINT)) AS disc_e4, "
        "count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus), "
        "q1 AS (SELECT 'q1' AS kind, l_returnflag AS k1, l_linestatus AS k2, "
        "CAST(round(sum_qty) AS BIGINT) AS v1, sum_base_cents AS v2, "
        "sum_disc_e4 AS v3, sum_charge_e6 AS v4, "
        "CAST(round(sum_qty * 10000 / count_order) AS BIGINT) AS v5, "
        "CAST(round(sum_base_cents / count_order) AS BIGINT) AS v6, "
        "CAST(round(disc_e4 / count_order) AS BIGINT) AS v7, "
        "count_order AS v8 FROM a), "
        "q3 AS (SELECT 'q3' AS kind, CAST(o_orderkey AS VARCHAR) AS k1, "
        "CAST(NULL AS VARCHAR) AS k2, rev_e4 AS v1, odate_int AS v2, "
        "CAST(NULL AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4, "
        "CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 FROM ("
        "SELECT o_orderkey, "
        "CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100 "
        "+ day(o_orderdate) AS BIGINT) AS odate_int, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS rev_e4 "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1998-03-15' "
        "AND l_shipdate > TIMESTAMP '1998-03-15' "
        "GROUP BY o_orderkey, o_orderdate "
        "ORDER BY rev_e4 DESC, o_orderkey ASC LIMIT 10)), "
        "q5 AS (SELECT 'q5' AS kind, n_name AS k1, CAST(NULL AS VARCHAR) AS k2, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS v1, "
        "CAST(NULL AS BIGINT) AS v2, CAST(NULL AS BIGINT) AS v3, "
        "CAST(NULL AS BIGINT) AS v4, CAST(NULL AS BIGINT) AS v5, "
        "CAST(NULL AS BIGINT) AS v6, CAST(NULL AS BIGINT) AS v7, "
        "CAST(NULL AS BIGINT) AS v8 "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "WHERE r_name = 'ASIA' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name), "
        "q6 AS (SELECT 'q6' AS kind, CAST(NULL AS VARCHAR) AS k1, "
        "CAST(NULL AS VARCHAR) AS k2, "
        "CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS v1, "
        "count(*) AS v2, "
        "CAST(NULL AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4, "
        "CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND CAST(round(l_discount * 100) AS INT) BETWEEN 5 AND 7 "
        "AND l_quantity < 24), "
        "q10 AS (SELECT 'q10' AS kind, c_name AS k1, CAST(NULL AS VARCHAR) AS k2, "
        "rev_e4 AS v1, c_custkey AS v2, "
        "CAST(NULL AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4, "
        "CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 FROM ("
        "SELECT c_custkey, c_name, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS rev_e4 "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE o_orderdate >= TIMESTAMP '1997-07-01' "
        "AND o_orderdate < TIMESTAMP '1997-10-01' "
        "AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name "
        "ORDER BY rev_e4 DESC, c_custkey ASC LIMIT 20)) "
        ", q7 AS (SELECT 'q7' AS kind, 'NATION_' || s_nationkey AS k1, "
        "'NATION_' || c_nationkey AS k2, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS v1, "
        "CAST(year(l_shipdate) AS BIGINT) AS v2, "
        "CAST(NULL AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4, "
        "CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE (s_nationkey = 1 AND c_nationkey = 2) "
        "OR (s_nationkey = 2 AND c_nationkey = 1) "
        "GROUP BY s_nationkey, c_nationkey, year(l_shipdate)), "
        "q13 AS (SELECT 'q13' AS kind, CAST(NULL AS VARCHAR) AS k1, "
        "CAST(NULL AS VARCHAR) AS k2, c_count AS v1, count(*) AS v2, "
        "CAST(NULL AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4, "
        "CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 FROM ("
        "SELECT c_custkey, count(o_custkey) AS c_count "
        "FROM customer LEFT JOIN (SELECT o_custkey FROM orders "
        "WHERE o_orderstatus = 'F') o ON c_custkey = o_custkey "
        "GROUP BY c_custkey) GROUP BY c_count), "
        "q14 AS (SELECT 'q14' AS kind, CAST(NULL AS VARCHAR) AS k1, "
        "CAST(NULL AS VARCHAR) AS k2, promo_e4 AS v1, total_e4 AS v2, "
        "CAST(round(promo_e4 * 1000000.0 / total_e4) AS BIGINT) AS v3, "
        "CAST(NULL AS BIGINT) AS v4, "
        "CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 FROM ("
        "SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN "
        "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) "
        "ELSE 0 END) AS BIGINT) AS promo_e4, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_e4 "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-02-01')), "
        "q15r AS (SELECT l_suppkey, "
        "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS rev_e4 "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey), "
        "q15 AS (SELECT 'q15' AS kind, s_name AS k1, "
        "CAST(NULL AS VARCHAR) AS k2, rev_e4 AS v1, "
        "CAST(s_suppkey AS BIGINT) AS v2, "
        "CAST(NULL AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4, "
        "CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 "
        "FROM q15r JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE rev_e4 = (SELECT max(rev_e4) FROM q15r)), "
        "q17 AS (SELECT 'q17' AS kind, CAST(NULL AS VARCHAR) AS k1, "
        "CAST(NULL AS VARCHAR) AS k2, "
        "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS v1, "
        "count(*) AS v2, "
        "CAST(NULL AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4, "
        "CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand = 'Brand#12' "
        "AND l_quantity < 0.2 * (SELECT avg(l2.l_quantity) "
        "FROM lineitem l2 JOIN part p2 ON l2.l_partkey = p2.p_partkey "
        "WHERE p2.p_brand = 'Brand#12' AND l2.l_partkey = part.p_partkey)), "
        "q18 AS (SELECT 'q18' AS kind, c_name AS k1, "
        "CAST(NULL AS VARCHAR) AS k2, o_orderkey AS v1, "
        "CAST(year(o_orderdate) * 10000 + month(o_orderdate) * 100 "
        "+ day(o_orderdate) AS BIGINT) AS v2, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS v3, "
        "CAST(round(sum_qty) AS BIGINT) AS v4, c_custkey AS v5, "
        "CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 "
        "FROM orders JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty "
        "FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 320) b "
        "ON o_orderkey = l_orderkey "
        "JOIN customer ON o_custkey = c_custkey), "
        "q22t AS (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents, "
        "count(*) AS n_pos FROM customer WHERE c_acctbal > 0), "
        "q22 AS (SELECT 'q22' AS kind, CAST(NULL AS VARCHAR) AS k1, "
        "CAST(NULL AS VARCHAR) AS k2, CAST(c_nationkey AS BIGINT) AS v1, "
        "count(*) AS v2, "
        "CAST(sum(bal_cents) AS BIGINT) AS v3, CAST(NULL AS BIGINT) AS v4, "
        "CAST(NULL AS BIGINT) AS v5, CAST(NULL AS BIGINT) AS v6, "
        "CAST(NULL AS BIGINT) AS v7, CAST(NULL AS BIGINT) AS v8 FROM ("
        "SELECT c_custkey, c_nationkey, "
        "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer "
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderstatus = 'F')) c, q22t "
        "WHERE bal_cents * n_pos > sum_cents "
        "GROUP BY c_nationkey) "
        "SELECT * FROM q1 UNION ALL SELECT * FROM q3 "
        "UNION ALL SELECT * FROM q5 UNION ALL SELECT * FROM q6 "
        "UNION ALL SELECT * FROM q10 UNION ALL SELECT * FROM q7 "
        "UNION ALL SELECT * FROM q13 UNION ALL SELECT * FROM q14 "
        "UNION ALL SELECT * FROM q15 UNION ALL SELECT * FROM q17 "
        "UNION ALL SELECT * FROM q18 UNION ALL SELECT * FROM q22",
        "tpch-suite (q1 wide-agg + q3/q5/q6/q10 + "
        "q7/q13/q14/q15/q17/q18/q22 variants, r4)",
    ),
    QuerySpec(
        "upsert_customers",
        q_upsert_customers,
        "SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 "
        "THEN c_acctbal + 1000.0 ELSE c_acctbal END AS c_acctbal FROM customer",
        "merge-upsert",
    ),
    QuerySpec(
        "temporal_join",
        q_temporal_join,
        "WITH f AS (SELECT o_orderkey, o_custkey AS c_key, o_orderdate FROM orders), "
        "dim AS (SELECT o_custkey AS c_key, o_orderdate AS valid_from, "
        "lead(o_orderdate) OVER w AS valid_to, row_number() OVER w AS n_orders_so_far "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate ASC, o_orderkey ASC)), "
        "j AS (SELECT f.o_orderkey, f.c_key, d.n_orders_so_far FROM f "
        "LEFT JOIN dim d ON d.c_key = f.c_key "
        "AND d.valid_from <= f.o_orderdate "
        "AND (d.valid_to IS NULL OR f.o_orderdate < d.valid_to)) "
        "SELECT 'plain' AS variant, * FROM j "
        "UNION ALL SELECT 'bucketed' AS variant, * FROM j",
        "temporal-point-in-time-join",
    ),
    QuerySpec(
        "sql_api",
        q_sql_api,
        "SELECT o_orderstatus, count(*) AS cnt, "
        "CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / count(*)) "
        "AS BIGINT) AS avg_cents, "
        "(SELECT CAST(round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
        "/ count(*)) AS BIGINT) FROM orders) AS global_avg_cents "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus",
        "S8-sql-api + scalar subquery (absorbed scalar_subquery, r2)",
    ),
]
