"""Concurrent serving: the prepared-plan registry under simultaneous
requests from multiple driver threads — the shape a query-serving
deployment actually runs (Spark schedules jobs from concurrent driver
threads; the suites already use this pattern INSIDE one query, this
certifies it ACROSS queries and for repeated calls to one query).

Covers two races a serving system hits:

- cache population: N threads requesting the SAME query before it is
  prepared must each get a correct result (worst case the plan builds
  twice — benign; wrong case would be a half-built plan escaping);
- mixed load: different queries served concurrently share the session,
  the cacheManager, and the shuffle service without cross-talk.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from geoestate_etl_spark.plans import all_queries
from tests.conftest import SF_ORACLE

#: Small, shuffle-bearing, cache-bearing queries — cheap but real.
NAMES = ["top_groups", "minmax_by_group", "global_aggs", "filtered_topk"]


def _serve(spark, name):
    fn = all_queries()[name].fn
    return sorted(map(str, (tuple(r) for r in fn(spark, SF_ORACLE).collect())))


def test_same_query_served_from_racing_threads(spark):
    expected = _serve(spark, "top_groups")
    from geoestate_etl_spark.plans.registry import invalidate_prepared

    invalidate_prepared("top_groups")  # force the population race
    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(
            ex.map(lambda _: _serve(spark, "top_groups"), range(8))
        )
    assert all(r == expected for r in results)


def test_mixed_queries_served_concurrently(spark):
    expected = {n: _serve(spark, n) for n in NAMES}
    jobs = NAMES * 3  # 12 requests, 4 distinct plans, interleaved
    with ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(lambda n: (n, _serve(spark, n)), jobs))
    for name, rows in results:
        assert rows == expected[name], name
