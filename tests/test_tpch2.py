"""Unit tier for the TPC-H completion suite (queries_tpch2).

The suite's value-level correctness is driven by the registry oracle
(textbook EXISTS/correlated-subquery DuckDB twins, tri-scale) — these
tests pin the STRUCTURAL invariants the oracle compare can't see:
the derived-partsupp contract, rerun determinism, and the q21
join-rewrite's equivalence to a hand-computed micro case.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.plans.queries_tpch2 import (
    PS_SUPPLIERS_PER_PART,
    derived_partsupp,
    q_tpch_suite2,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_partsupp_contract(spark):
    """Exactly 4 rows AND 4 DISTINCT suppliers per part (the i=0..3
    keys are consecutive mod S — r4 review: the dbgen stride formula
    collided at small S); suppkey in [0, S); availqty in [1, 9999];
    cost in [100, 99999] cents."""
    ps = derived_partsupp(spark, SF_SMOKE)
    n_parts = spark.read.parquet(f"{SF_SMOKE}/part.parquet").count()
    n_supp = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").count()
    per_part = ps.groupBy("ps_partkey").agg(
        F.count("*").alias("count"),
        F.countDistinct("ps_suppkey").alias("n_distinct"),
    )
    assert per_part.filter(F.col("count") != PS_SUPPLIERS_PER_PART).count() == 0
    assert (
        per_part.filter(F.col("n_distinct") != PS_SUPPLIERS_PER_PART).count()
        == 0
    )
    assert per_part.count() == n_parts
    bad = ps.filter(
        (F.col("ps_suppkey") < 0)
        | (F.col("ps_suppkey") >= n_supp)
        | ~F.col("ps_availqty").between(1, 9999)
        | ~F.col("ps_cost_cents").between(100, 99999)
    )
    assert bad.count() == 0


def test_partsupp_rerun_deterministic(spark):
    """Two independent builds produce the identical relation — the
    property that lets the oracle rebuild partsupp from scratch in SQL
    instead of reading a committed artifact."""
    a = derived_partsupp(spark, SF_SMOKE)
    b = derived_partsupp(spark, SF_SMOKE)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_q21_rewrite_micro(spark):
    """The per-order distinct-aggregate rewrite of q21's double
    EXISTS, checked against a hand-enumerated micro case:

    - order 1: late lines from supplier 1 only, supplier 2 present
      not-late → s1 waits (counted TWICE: two late lines).
    - order 2: late lines from suppliers 1 AND 2 → nobody counted
      (the NOT EXISTS kills both).
    - order 3: single-supplier order, late → not counted (no other
      supplier involved).
    - order 4: not status 'F' → excluded entirely.
    """
    li = spark.createDataFrame(
        [
            (1, 1, "R"),
            (1, 1, "R"),
            (1, 2, "N"),
            (2, 1, "R"),
            (2, 2, "R"),
            (3, 3, "R"),
            (4, 1, "R"),
            (4, 2, "N"),
        ],
        "l_orderkey int, l_suppkey int, l_returnflag string",
    )
    orders = spark.createDataFrame(
        [(1, "F"), (2, "F"), (3, "F"), (4, "O")],
        "o_orderkey int, o_orderstatus string",
    )
    li_f = li.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    per_order = li_f.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    got = (
        li_f.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("lo"), "l_suppkey")
        .join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
            ).select("l_orderkey"),
            F.col("lo") == F.col("l_orderkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .collect()
    )
    assert {(r.l_suppkey, r.numwait) for r in got} == {(1, 2)}


def test_suite_kinds_complete(spark):
    """All ten variants emit rows at the oracle scale's smoke subset
    — a missing kind means a silently-empty branch (q11-at-sf0.001
    style) went unnoticed."""
    kinds = {
        r.kind
        for r in q_tpch_suite2(spark, SF_ORACLE)
        .select("kind")
        .distinct()
        .collect()
    }
    assert kinds == {
        "q2", "q4", "q8", "q9", "q11", "q12", "q16", "q19", "q20", "q21"
    }
