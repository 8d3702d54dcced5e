"""Entity resolution (operators/entity_resolution.py): blocking,
scoring, transitive clustering, survivorship."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.entity_resolution import (
    candidate_pairs,
    resolve_entities,
)

PEOPLE = [
    # (id, name, email, phone) — 1/2/3 are one person with typos and
    # varying completeness; 4/5 one company; 6 a singleton; 7 null name
    (1, "Jon Smith", None, None),
    (2, "John Smith", "js@x.com", None),
    (3, "John Smyth", "js@x.com", "555-0100"),
    (4, "ACME Corporation", None, "555-0200"),
    (5, "ACME Corporatian", "info@acme.com", "555-0200"),
    (6, "Zelda Quux", "z@q.org", None),
    (7, None, "mystery@x.com", None),
]


def _df(spark):
    return spark.createDataFrame(PEOPLE, ["pid", "name", "email", "phone"])


def test_candidate_pairs_score_and_block(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in candidate_pairs(_df(spark), "pid", "name", threshold=0.4).collect()
    }
    assert (1, 2) in pairs and (2, 3) in pairs and (4, 5) in pairs
    assert all(a < b for a, b in pairs)
    # singleton and NULL-name rows pair with nothing
    assert not any(6 in p or 7 in p for p in pairs)


def test_resolve_entities_transitive_and_golden(spark):
    df = _df(spark)
    assignments, golden = resolve_entities(df, "pid", "name", threshold=0.4)
    ent = {r.pid: r.entity_id for r in assignments.collect()}
    # typo chain clusters transitively to the min id
    assert ent[1] == ent[2] == ent[3] == 1
    assert ent[4] == ent[5] == 4
    assert ent[6] == 6 and ent[7] == 7  # unmatched rows are their own entity
    assert assignments.count() == len(PEOPLE)  # nothing dropped

    g = {r.entity_id: r for r in golden.collect()}
    assert set(g) == {1, 4, 6, 7}
    assert g[1].pid == 3  # most complete member wins (email + phone)
    assert g[4].pid == 5
    assert g[6].pid == 6


def test_completeness_tie_breaks_to_min_id(spark):
    rows = [(10, "Ann Lee", "a@x.com"), (11, "Anne Lee", "b@x.com")]
    df = spark.createDataFrame(rows, ["pid", "name", "email"])
    _, golden = resolve_entities(df, "pid", "name", threshold=0.3)
    assert [r.pid for r in golden.collect()] == [10]


def test_blocking_is_equi_join_and_capped(spark):
    df = _df(spark)
    pairs = candidate_pairs(df, "pid", "name", threshold=0.4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # a degenerate block (every record named alike) under a tiny cap
    # produces no pairs instead of a quadratic blowup
    same = spark.createDataFrame(
        [(i, "placeholder name") for i in range(50)], ["pid", "name"]
    )
    assert candidate_pairs(same, "pid", "name", max_block_size=10).count() == 0


def test_custom_blocking_key(spark):
    # block on the name's first character instead of soundex: 1/2/3
    # share 'j', 4/5 share 'a' — same clusters, different blocker
    df = _df(spark)
    key = F.substring(F.lower(F.col("name")), 1, 1)
    assignments, _ = resolve_entities(
        df, "pid", "name", blocking_key=key, threshold=0.4
    )
    ent = {r.pid: r.entity_id for r in assignments.collect()}
    assert ent[1] == ent[2] == ent[3] == 1 and ent[4] == ent[5] == 4


def test_string_ids_survive_ansi_mode(spark):
    """Survivorship must not negate the id column — string ids crash
    under ANSI casting (review finding, repro'd on Spark 4.1)."""
    rows = [
        ("cust-1001", "Jon Smith", None),
        ("cust-1002", "John Smith", "js@x.com"),
        ("cust-0999", "John Smith", "js@x.com"),  # tie -> lexicographic min id
    ]
    df = spark.createDataFrame(rows, ["pid", "name", "email"])
    assignments, golden = resolve_entities(df, "pid", "name", threshold=0.4)
    ent = {r.pid: r.entity_id for r in assignments.collect()}
    assert len(set(ent.values())) == 1
    assert [r.pid for r in golden.collect()] == ["cust-0999"]


def test_link_records_two_tables(spark):
    """A-B linkage: customer file vs partner counterparty file."""
    from geoestate_etl_spark.operators.entity_resolution import link_records

    ours = spark.createDataFrame(
        [(1, "Jon Smith"), (2, "ACME Corporation"), (3, "Zelda Quux")],
        ["cust_id", "cust_name"],
    )
    theirs = spark.createDataFrame(
        [(90, "John Smith"), (91, "ACME Corporatian"), (92, "Totally Else")],
        ["cp_id", "cp_name"],
    )
    got = {
        (r.cust_id, r.cp_id): r.jaccard
        for r in link_records(
            ours, theirs, "cust_id", "cp_id", "cust_name", "cp_name",
            threshold=0.4,
        ).collect()
    }
    assert set(got) == {(1, 90), (2, 91)}
    plan = link_records(
        ours, theirs, "cust_id", "cp_id", "cust_name", "cp_name"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_link_records_product_cap(spark):
    """The guard caps |L|x|R| per block: 2x30=60 pairs over a cap of
    50 drops the block entirely; under the cap it links."""
    from geoestate_etl_spark.operators.entity_resolution import link_records

    ours = spark.createDataFrame(
        [(i, "placeholder name") for i in range(2)], ["cust_id", "cust_name"]
    )
    theirs = spark.createDataFrame(
        [(i, "placeholder name") for i in range(30)], ["cp_id", "cp_name"]
    )
    kw = dict(threshold=0.9)
    over = link_records(
        ours, theirs, "cust_id", "cp_id", "cust_name", "cp_name",
        max_pairs_per_block=50, **kw,
    )
    under = link_records(
        ours, theirs, "cust_id", "cp_id", "cust_name", "cp_name",
        max_pairs_per_block=60, **kw,
    )
    assert over.count() == 0
    assert under.count() == 60
