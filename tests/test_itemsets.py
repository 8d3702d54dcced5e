"""Frequent-itemset mining (operators/itemsets.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.itemsets import (
    frequent_itemsets_fp,
    frequent_pairs,
)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, i long")


def test_pairs_hand_computed(spark):
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20),
        (4, 30), (4, 40),
    ]
    got = {
        (r.item_a, r.item_b): r.support
        for r in frequent_pairs(_baskets(spark, rows), "b", "i", 2).collect()
    }
    assert got == {(10, 20): 3}
    # support=1 pairs appear when the threshold allows
    all_pairs = {
        (r.item_a, r.item_b): r.support
        for r in frequent_pairs(_baskets(spark, rows), "b", "i", 1).collect()
    }
    assert all_pairs[(10, 30)] == 1 and all_pairs[(30, 40)] == 1


def test_duplicate_items_count_once(spark):
    rows = [(1, 10), (1, 10), (1, 20)]
    got = {
        (r.item_a, r.item_b): r.support
        for r in frequent_pairs(_baskets(spark, rows), "b", "i", 1).collect()
    }
    assert got == {(10, 20): 1}


def test_fpgrowth_k2_slice_matches_exact_pairs(spark):
    """FPGrowth's 2-itemsets == the oracled self-join path, exactly
    (same baskets, support threshold expressed as a fraction)."""
    import random

    rnd = random.Random(13)
    rows = [
        (b, rnd.randrange(15))
        for b in range(60)
        for _ in range(rnd.randrange(2, 6))
    ]
    df = _baskets(spark, rows)
    n_baskets = df.select("b").distinct().count()
    min_support = 3
    exact = {
        (r.item_a, r.item_b): r.support
        for r in frequent_pairs(df, "b", "i", min_support).collect()
    }
    fp = frequent_itemsets_fp(
        df, "b", "i", min_support_frac=min_support / n_baskets
    )
    fp_pairs = {
        tuple(sorted(int(x) for x in r["items"])): r.freq
        for r in fp.filter(F.size("items") == 2).collect()
    }
    assert fp_pairs == exact


def test_fpgrowth_singletons_and_triples(spark):
    rows = [
        (b, i) for b in range(10) for i in (1, 2, 3)
    ]  # every basket = {1,2,3}
    fp = frequent_itemsets_fp(_baskets(spark, rows), "b", "i", 0.9)
    by_size = {}
    for r in fp.collect():
        by_size.setdefault(len(r["items"]), set()).add(
            tuple(sorted(int(x) for x in r["items"]))
        )
    assert by_size[1] == {(1,), (2,), (3,)}
    assert by_size[2] == {(1, 2), (1, 3), (2, 3)}
    assert by_size[3] == {(1, 2, 3)}
