"""Triangle counting: planted cliques, triangle-free graphs, the
degree-oriented == naive id-ordered equivalence on random graphs, and
the 3x-global-count identity."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.graph_metrics import (
    triangle_counts,
    triangles,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_k4_counts(spark):
    k4 = _edges(spark, list(itertools.combinations(range(4), 2)))
    # K4 has C(4,3)=4 triangles; every node sits in C(3,2)=3 of them
    assert triangles(k4).count() == 4
    got = {r.id: r.n_tri for r in triangle_counts(k4).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_free(spark):
    # path + star + bipartite: no triangles anywhere
    path = [(i, i + 1) for i in range(10)]
    star = [(100, 200 + i) for i in range(8)]
    assert triangle_counts(_edges(spark, path + star)).count() == 0


def test_duplicate_and_reversed_edges_collapse(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    noisy = tri + [(b, a) for a, b in tri] + tri + [(5, 5)]
    got = {r.id: r.n_tri for r in triangle_counts(_edges(spark, noisy)).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_matches_naive_on_random_graph(spark):
    """Degree-oriented wedge close == brute-force id-ordered count,
    including around a hot hub (node 0 connects to everyone)."""
    rng = random.Random(3)
    n = 40
    edges = {(0, i) for i in range(1, n)}  # celebrity hub
    while len(edges) < 150:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    naive = {}
    for x, y, z in itertools.combinations(range(n), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                naive[v] = naive.get(v, 0) + 1
    got = {
        r.id: r.n_tri
        for r in triangle_counts(_edges(spark, sorted(edges))).collect()
    }
    assert got == naive
    total = triangles(_edges(spark, sorted(edges))).count()
    assert sum(naive.values()) == 3 * total


def test_clique_density_identity(spark):
    """A k-clique of near-duplicates is C(k,3) triangles with each
    member in C(k-1,2) — the dedup-QA density signal."""
    k = 6
    clique = list(itertools.combinations(range(k), 2))
    chain = [(100 + i, 101 + i) for i in range(5)]  # same edge count class
    df = _edges(spark, clique + chain)
    assert triangles(df).count() == 20  # C(6,3)
    got = {r.id: r.n_tri for r in triangle_counts(df).collect()}
    assert all(got[i] == 10 for i in range(k))  # C(5,2)
    assert not any(i >= 100 for i in got)


def test_k_core_peels_chains_keeps_cycles(spark):
    """2-core drops tree/chain appendages and keeps cyclic structure
    with in-core degrees; a pendant hanging off a triangle goes too."""
    from geoestate_etl_spark.operators.graph_metrics import k_core

    tri = [(1, 2), (2, 3), (1, 3)]
    chain = [(10, 11), (11, 12), (12, 13)]
    pendant = [(3, 99)]
    got = {
        r.id: r.core_deg
        for r in k_core(_edges(spark, tri + chain + pendant), k=2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_higher_k_and_fixpoint_uniqueness(spark):
    """k=3 on K4-plus-appendage isolates exactly the K4; running the
    peel with different max_iter budgets (past convergence) yields the
    identical set — the uniqueness the SQL-unroll oracle rides on."""
    import itertools

    from geoestate_etl_spark.operators.graph_metrics import k_core

    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    tail = [(4, 5), (5, 6), (6, 4)]  # a 2-core triangle, not a 3-core
    df = _edges(spark, k4 + tail)
    core3 = {r.id: r.core_deg for r in k_core(df, k=3).collect()}
    assert core3 == {1: 3, 2: 3, 3: 3, 4: 3}
    again = {r.id: r.core_deg for r in k_core(df, k=3, max_iter=7).collect()}
    assert again == core3
