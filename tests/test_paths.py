"""BFS hop-distance tier (operators/paths.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.paths import bfs_distances


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_known_distances_path_graph(spark):
    # 0-1-2-3-4 chain plus a 0-5 shortcut to 5-3: dist(3) = min(3, 2+1)
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 3)])
    got = {r.id: r.dist for r in bfs_distances(e, 0, max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 5: 1, 2: 2, 3: 2, 4: 3}


def test_undirected_by_default(spark):
    # edge points 1 -> 0 only; undirected BFS from 0 still reaches 1
    e = _edges(spark, [(1, 0)])
    got = {r.id: r.dist for r in bfs_distances(e, 0).collect()}
    assert got == {0: 0, 1: 1}


def test_directed_respects_orientation(spark):
    e = _edges(spark, [(1, 0), (0, 2)])
    got = {r.id: r.dist for r in bfs_distances(e, 0, directed=True).collect()}
    assert got == {0: 0, 2: 1}  # 1 unreachable along direction


def test_unreachable_and_early_stop(spark):
    # two components; BFS must early-stop after exhausting component 0
    e = _edges(spark, [(0, 1), (10, 11)])
    out = bfs_distances(e, 0, max_hops=50)
    got = {r.id: r.dist for r in out.collect()}
    assert got == {0: 0, 1: 1}


def test_max_hops_truncates(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    got = {r.id: r.dist for r in bfs_distances(e, 0, max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_cycle_terminates_with_min_distance(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    got = {r.id: r.dist for r in bfs_distances(e, 0, max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 2: 1}


def test_matches_networkx_free_reference(spark):
    """Random sparse graph vs a dict-based pure-python BFS."""
    import random

    rnd = random.Random(7)
    pairs = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(80)]
    e = _edges(spark, pairs)
    got = {r.id: r.dist for r in bfs_distances(e, 0, max_hops=40).collect()}

    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want, frontier, d = {0: 0}, {0}, 0
    while frontier:
        d += 1
        frontier = {
            v for u in frontier for v in adj.get(u, ()) if v not in want
        }
        for v in frontier:
            want[v] = d
    assert got == want


def test_registry_histogram_is_connected_smallworld(spark):
    """The supplier↔order graph at smoke scale: supplier 0 reaches a
    large fraction of the graph within the 6-hop cap, and level sizes
    are positive through the reached depth."""
    from geoestate_etl_spark.plans.queries_ext import q_graph_bfs

    hist = {
        r.dist: r.n_nodes
        for r in q_graph_bfs(spark, "/root/testdata/sf0.001").collect()
    }
    assert hist[0] == 1
    assert all(n > 0 for n in hist.values())
    assert len(hist) >= 3  # at least source, its orders, co-suppliers


# ---- weighted hop-bounded Bellman-Ford --------------------------------


def _wedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, w long")


def test_sssp_prefers_cheap_long_path(spark):
    from geoestate_etl_spark.operators.paths import sssp_distances

    # 0->3 direct costs 10; 0->1->2->3 costs 3 — more hops, cheaper
    e = _wedges(spark, [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)])
    got = {r.id: r.cost for r in sssp_distances(e, 0, max_hops=5).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_sssp_hop_bound_truncates(spark):
    from geoestate_etl_spark.operators.paths import sssp_distances

    e = _wedges(spark, [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)])
    got = {r.id: r.cost for r in sssp_distances(e, 0, max_hops=2).collect()}
    # within 2 hops the direct edge wins for node 3
    assert got == {0: 0, 1: 1, 2: 2, 3: 10}


def test_sssp_cycle_terminates(spark):
    from geoestate_etl_spark.operators.paths import sssp_distances

    e = _wedges(spark, [(0, 1, 2), (1, 2, 2), (2, 0, 2)])
    got = {r.id: r.cost for r in sssp_distances(e, 0, max_hops=10).collect()}
    assert got == {0: 0, 1: 2, 2: 2}  # undirected: 2 reachable both ways


def test_sssp_matches_reference_bellman_ford(spark):
    from geoestate_etl_spark.operators.paths import sssp_distances

    import random

    rnd = random.Random(11)
    triples = [
        (rnd.randrange(30), rnd.randrange(30), rnd.randrange(1, 20))
        for _ in range(60)
    ]
    e = _wedges(spark, triples)
    H = 8
    got = {r.id: r.cost for r in sssp_distances(e, 0, max_hops=H).collect()}

    # pure-python hop-bounded Bellman-Ford on the symmetrized edges
    adj = triples + [(v, u, w) for u, v, w in triples]
    INF = float("inf")
    want = {0: 0}
    for _ in range(H):
        new = dict(want)
        for u, v, w in adj:
            if want.get(u, INF) + w < new.get(v, INF):
                new[v] = want[u] + w
        if new == want:
            break
        want = new
    assert got == want


def test_sssp_equals_bfs_on_unit_weights(spark):
    from geoestate_etl_spark.operators.paths import bfs_distances, sssp_distances

    import random

    rnd = random.Random(3)
    pairs = [(rnd.randrange(25), rnd.randrange(25)) for _ in range(50)]
    e = _wedges(spark, [(u, v, 1) for u, v in pairs])
    sp = {r.id: r.cost for r in sssp_distances(e, 0, max_hops=25).collect()}
    bf = {
        r.id: r.dist
        for r in bfs_distances(
            spark.createDataFrame(pairs, "src long, dst long"), 0, max_hops=25
        ).collect()
    }
    assert sp == {k: v for k, v in bf.items()}
