"""Declarative data-quality checks: planted-violation semantics,
DuckDB parity on real tables, and the one-scan plan guarantee."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from geoestate_etl_spark.operators.expectations import (
    fk,
    in_range,
    in_set,
    matches,
    not_null,
    run_checks,
    satisfies,
    unique,
)
from tests.conftest import SF_ORACLE


def test_planted_violations(spark):
    rows = [
        (1, "a@x.com", 10.0, "gold"),
        (2, None, 5.0, "gold"),          # null email
        (3, "bad-email", -1.0, "iron"),  # bad pattern, range, set
        (3, "c@x.com", 7.5, "silver"),   # dup id
    ]
    df = spark.createDataFrame(rows, ["id", "email", "score", "tier"])
    dim = spark.createDataFrame([("gold",), ("silver",)], ["tier"])
    rep = {
        r.check: (r.violations, r.total, r.passed)
        for r in run_checks(
            df,
            [
                not_null("email_present", "email"),
                matches("email_shape", "email", r"^[^@]+@[^@]+$"),
                in_range("score_range", "score", 0.0, 100.0),
                in_set("tier_known", "tier", ["gold", "silver"]),
                satisfies("score_gt_tier_floor", F.col("score") > 0, "score"),
                unique("id_unique", "id"),
                fk("tier_in_dim", "tier", dim, "tier"),
            ],
        ).collect()
    }
    assert rep["email_present"] == (1, 4, False)
    assert rep["email_shape"] == (2, 4, False)   # null + bad-email
    assert rep["score_range"] == (1, 4, False)
    assert rep["tier_known"] == (1, 4, False)
    assert rep["score_gt_tier_floor"] == (1, 4, False)
    assert rep["id_unique"] == (1, 4, False)
    assert rep["tier_in_dim"] == (1, 4, False)   # iron


def test_all_pass_on_clean_frame(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "s"])
    rep = run_checks(df, [not_null("s_nn", "s"), unique("id_u", "id")])
    assert all(r.passed for r in rep.collect())


def test_duckdb_parity_on_orders(spark):
    """The same constraints computed by plain SQL in DuckDB must agree
    exactly on the real orders table."""
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    rep = {
        r.check: (r.violations, r.total)
        for r in run_checks(
            orders,
            [
                not_null("okey_nn", "o_orderkey"),
                in_range("price_range", "o_totalprice", 0.0, 1e6),
                in_set("status_set", "o_orderstatus", ["F", "O", "P"]),
                matches("prio_shape", "o_orderpriority", r"^\d-[A-Z ]+$"),
                unique("okey_unique", "o_orderkey"),
                fk("cust_fk", "o_custkey", customer, "c_custkey"),
            ],
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_ORACLE}/orders.parquet')"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF_ORACLE}/customer.parquet')"
    )
    want = con.execute(
        """
SELECT
  count(*) FILTER (o_orderkey IS NULL),
  count(*) FILTER (NOT coalesce(o_totalprice BETWEEN 0.0 AND 1e6, FALSE)),
  count(*) FILTER (NOT coalesce(o_orderstatus IN ('F','O','P'), FALSE)),
  count(*) FILTER (NOT coalesce(regexp_matches(o_orderpriority, '^\\d-[A-Z ]+$'), FALSE)),
  count(o_orderkey) - count(DISTINCT o_orderkey),
  count(*) FILTER (o_custkey NOT IN (SELECT c_custkey FROM customer)),
  count(*)
FROM orders
"""
    ).fetchone()
    total = want[6]
    assert rep["okey_nn"] == (want[0], total)
    assert rep["price_range"] == (want[1], total)
    assert rep["status_set"] == (want[2], total)
    assert rep["prio_shape"] == (want[3], total)
    assert rep["okey_unique"] == (want[4], total)
    assert rep["cust_fk"] == (want[5], total)
    # the real table should be clean on all of these
    assert all(v == 0 for v, _ in rep.values())


def test_row_level_checks_single_scan(spark):
    """However many row-level checks are declared, the plan must scan
    the table exactly once (they all fold into one aggregate)."""
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    rep = run_checks(
        orders,
        [
            not_null(f"nn_{c}", c)
            for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
        ]
        + [in_range("pr", "o_totalprice", 0.0, 1e6)],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
