"""Label propagation (operators/label_prop.py): planted two-community
graph, seed clamping, weighted majority, hop radius, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.label_prop import propagate_labels

# two 4-cliques bridged by one edge; seeds at 1 ("good") and 10 ("bad")
CLIQUE_A = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
CLIQUE_B = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
BRIDGE = [(4, 10)]


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["id_a", "id_b"])


def _seeds(spark, rows):
    return spark.createDataFrame(rows, ["id", "label"])


def test_two_communities_take_their_seed_labels(spark):
    out = propagate_labels(
        _edges(spark, CLIQUE_A + CLIQUE_B + BRIDGE),
        _seeds(spark, [(1, "good"), (10, "bad")]),
        iters=3,
    )
    got = {r.id: (r.label, r.is_seed) for r in out.collect()}
    assert got[1] == ("good", True) and got[10] == ("bad", True)
    for n in (2, 3, 4):
        assert got[n][0] == "good"
    for n in (11, 12, 13):
        assert got[n][0] == "bad"


def test_seeds_are_clamped_even_when_outvoted(spark):
    # seed 1 has three "bad"-labeled neighbors after round 1, but its
    # own label never changes
    edges = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 9), (3, 9), (4, 9)])
    out = propagate_labels(
        edges, _seeds(spark, [(1, "good"), (9, "bad")]), iters=4
    )
    got = {r.id: r.label for r in out.collect()}
    assert got[1] == "good" and got[9] == "bad"


def test_weights_decide_majority(spark):
    # node 5 hears "good" with weight 0.9 and "bad" with 0.3+0.3
    edges = spark.createDataFrame(
        [(1, 5, 0.9), (2, 5, 0.3), (3, 5, 0.3)], ["id_a", "id_b", "w"]
    )
    seeds = _seeds(spark, [(1, "good"), (2, "bad"), (3, "bad")])
    out = propagate_labels(edges, seeds, iters=1, weight_col="w")
    assert {r.id: r.label for r in out.collect()}[5] == "good"
    # flip the weights, the majority flips
    edges2 = spark.createDataFrame(
        [(1, 5, 0.4), (2, 5, 0.3), (3, 5, 0.3)], ["id_a", "id_b", "w"]
    )
    out2 = propagate_labels(edges2, seeds, iters=1, weight_col="w")
    assert {r.id: r.label for r in out2.collect()}[5] == "bad"


def test_hop_radius_bounds_reach(spark):
    chain = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = _seeds(spark, [(1, "good")])
    got1 = {r.id for r in propagate_labels(chain, seeds, iters=1).collect()}
    got3 = {r.id for r in propagate_labels(chain, seeds, iters=3).collect()}
    assert got1 == {1, 2}
    assert got3 == {1, 2, 3, 4}  # node 5 is 4 hops out, unreached


def test_tie_breaks_to_smallest_label(spark):
    edges = _edges(spark, [(1, 5), (2, 5)])
    seeds = _seeds(spark, [(1, "zzz"), (2, "aaa")])
    out = propagate_labels(edges, seeds, iters=1)
    assert {r.id: r.label for r in out.collect()}[5] == "aaa"


def test_composes_with_knn_graph(spark):
    """Curation shape: embeddings -> kNN graph -> propagate quality
    labels from a few seeds."""
    from geoestate_etl_spark.operators.similarity import ivf_build, knn_join

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, cents = ivf_build(emb, n_cells=4)
    graph = knn_join(assigned, cents, k=3, n_probe=4)
    seeds = _seeds(spark, [(0, "keep"), (1, "drop")])
    out = propagate_labels(
        graph, seeds, iters=2,
        id_a="vec_id", id_b="neighbor_id", weight_col="cos_sim",
    )
    got = {r.id: r.label for r in out.collect()}
    assert got[0] == "keep" and got[1] == "drop"
    assert len(got) > 2  # labels actually spread over the graph
