"""Deterministic random-walk sampling (operators/walks.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.walks import build_adjacency, random_walks


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_adjacency_contract(spark):
    e = _edges(spark, [(0, 1), (0, 2), (1, 2)])
    adj = {
        (r.u, r.v): (r.idx, r.deg) for r in build_adjacency(e).collect()
    }
    # node 0: neighbors 1,2 indexed by id order; degree 2
    assert adj[(0, 1)] == (0, 2)
    assert adj[(0, 2)] == (1, 2)
    # symmetrized: node 2 sees 0 and 1
    assert adj[(2, 0)][1] == 2 and adj[(2, 1)][1] == 2


def test_walks_are_valid_paths(spark):
    import random

    rnd = random.Random(5)
    pairs = [(rnd.randrange(20), rnd.randrange(20)) for _ in range(40)]
    pairs = [(u, v) for u, v in pairs if u != v]
    e = _edges(spark, pairs)
    sym = set()
    for u, v in pairs:
        sym.add((u, v))
        sym.add((v, u))
    for r in random_walks(e, walk_len=4, walks_per_node=2).collect():
        p = list(r.path)
        assert p[0] == r.start
        assert len(p) == 5
        for a, b in zip(p, p[1:]):
            assert (a, b) in sym, (p, a, b)


def test_walks_deterministic(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)])
    a = {r.walk_id: list(r.path) for r in random_walks(e, 6, 3, seed=9).collect()}
    b = {r.walk_id: list(r.path) for r in random_walks(e, 6, 3, seed=9).collect()}
    assert a == b
    c = {r.walk_id: list(r.path) for r in random_walks(e, 6, 3, seed=10).collect()}
    assert c != a  # a different seed moves at least one step


def test_directed_dead_end_freezes(spark):
    e = _edges(spark, [(0, 1), (1, 2)])  # 2 is a sink when directed
    rows = {r.start: list(r.path) for r in
            random_walks(e, walk_len=5, directed=True).collect()}
    assert rows[0] == [0, 1, 2]  # froze at the sink
    assert rows[2] == [2]  # started stranded


def test_neighbor_choice_spreads(spark):
    """A hub with 4 neighbors and many walks: every neighbor gets
    chosen at least once at step 1 (hash spread sanity)."""
    e = _edges(spark, [(0, i) for i in (1, 2, 3, 4)])
    rows = random_walks(e, walk_len=1, walks_per_node=32).filter(
        F.col("start") == 0
    ).collect()
    first_steps = {list(r.path)[1] for r in rows}
    assert first_steps == {1, 2, 3, 4}


def test_node_embeddings_geometry_and_ann_compose(spark):
    """DeepWalk e2e: two well-separated cliques bridged by one edge —
    within-clique cosine must beat cross-clique on average, and the
    vectors must flow through the existing ANN tier unchanged."""
    from geoestate_etl_spark.operators.walks import node_embeddings

    clique_a = [(i, j) for i in range(6) for j in range(6) if i < j]
    clique_b = [(i, j) for i in range(10, 16) for j in range(10, 16) if i < j]
    e = _edges(spark, clique_a + clique_b + [(0, 10)])
    emb = node_embeddings(e, dim=8, walk_len=6, walks_per_node=8, seed=1)
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    assert set(vecs) == set(range(6)) | set(range(10, 16))
    assert all(len(v) == 8 for v in vecs.values())

    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        return num / den if den else 0.0

    within = [cos(vecs[1], vecs[j]) for j in range(2, 6)]
    across = [cos(vecs[1], vecs[j]) for j in range(11, 16)]
    assert sum(within) / len(within) > sum(across) / len(across), (
        within, across,
    )

    # composes with the similarity tier: brute-force top-k runs on it
    from geoestate_etl_spark.operators.similarity import brute_force_topk

    top = brute_force_topk(emb, vecs[1], k=3).collect()
    assert len(top) == 3
