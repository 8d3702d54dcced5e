"""PageRank semantics vs a dense numpy power-iteration reference on
known graphs (cycle, star, dangling node)."""

from __future__ import annotations

import numpy as np
import pytest

from geoestate_etl_spark.operators.pagerank import pagerank


def reference_pagerank(n, edge_list, iters=10, d=0.85):
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[s] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edge_list:
            contrib[t] += pr[s] / out_deg[s]
        dangling = pr[out_deg == 0].sum()
        pr = (1 - d) / n + d * dangling / n + d * contrib
    return pr


def run(spark, edge_list, n, iters=10):
    df = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {r.id: r.pr for r in pagerank(df, iters=iters).collect()}
    ref = reference_pagerank(n, edge_list, iters=iters)
    return got, ref


def test_two_cycle_symmetric(spark):
    got, ref = run(spark, [(0, 1), (1, 0)], 2)
    assert got[0] == pytest.approx(0.5, abs=1e-12)
    assert got[1] == pytest.approx(0.5, abs=1e-12)


def test_star_graph(spark):
    # all leaves point at the hub; hub points back to leaf 1.
    # 40 iterations: enough for the hub<->leaf1 oscillation to damp out
    # (at even low counts the mass sits on whichever side was updated last)
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)]
    got, ref = run(spark, edges, 5, iters=40)
    for i in range(5):
        assert got[i] == pytest.approx(ref[i], abs=1e-9)
    assert got[0] == max(got.values())  # the hub dominates at convergence
    # analytic fixed point: pr0 = 0.1065 + 0.85*pr1, pr1 = 0.03 + 0.85*pr0
    assert got[0] == pytest.approx(0.132 / (1 - 0.7225), abs=1e-3)


def test_dangling_node_mass_conserved(spark):
    # node 2 has no out-edges: its mass must be redistributed
    edges = [(0, 1), (1, 2)]
    got, ref = run(spark, edges, 3)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for i in range(3):
        assert got[i] == pytest.approx(ref[i], abs=1e-9)
