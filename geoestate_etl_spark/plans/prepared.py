"""Disk-backed prepare artifacts for the serving cold path (r6 —
VERDICT r5 #3).

Registry queries are served as prepared plans (``plans/registry.py``):
the first call per session pays any eager prepare-time work — the
iterative BFS label frame, the PageRank fixpoint, the corpus gram
frames behind ``text_metrics``. Until r6 that cost was re-paid in
EVERY fresh session (BENCH ``cold_first_run``: graph_bfs 8.8s,
pagerank 4.8s, text_metrics 7.7s at sf0.1 while their serving times
were ≤0.5s). This module gives that work the lifecycle the
materialized IVF index already has (``queries_ext.ensure_warehouse_
index``): the prepared frame is written ONCE per (source table stats,
builder version) under ``spark-warehouse/prepared/<name>/<key>/`` and
every later session pays a parquet scan instead of the iteration.

Keying (r7): the key directory is ``<srcid>-<statskey>`` — ``srcid``
hashes the source tables' absolute paths (stable identity across
regeneration), ``statskey`` hashes each source's size + ``mtime_ns``
(nanosecond resolution, ADVICE r6: whole-second ``st_mtime`` let a
same-second same-size regeneration serve stale state) plus the
per-name builder ``version``. A regenerated source table or a changed
builder gets a fresh ``statskey`` and rebuilds; nothing can serve
stale state silently. Writes are atomic (write to a pid+uuid-tagged
temp dir, ``os.rename`` into place, temp removed on any failure) so a
concurrent second session — same-process thread or separate process —
never observes a half-written artifact.

Retention (r7 — VERDICT r6 #2): a successful build garbage-collects
every SUPERSEDED sibling key — same ``srcid`` (same source identity,
older stats/version) — so a regenerated source leaves exactly one
live key per (name, source identity); artifacts for OTHER sf dirs
(different ``srcid``) coexist untouched. In-flight ``.tmp-`` dirs are
never GC'd. Dependent prepared plans are dropped whenever GC removes
anything, keeping the ARTIFACT_QUERIES invalidation coupling honest.

Correctness does not depend on the cache: every builder is the same
deterministic computation the query ran inline before, and
``tests/test_prepared_artifacts.py`` drift-gates artifact content
against a fresh rebuild per name. The DuckDB oracle gate certifies
the downstream queries either way.

At 100 TB this is the standard serving split: expensive derived state
(graph labels, corpus statistics, ANN indexes) lives in storage with
explicit build/refresh lifecycle; request-path queries only scan it.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _warehouse_root() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "spark-warehouse", "prepared")


def _source_paths(sf_dir: str, sources: list[str]) -> list[str]:
    return [
        os.path.abspath(os.path.join(sf_dir, f"{t}.parquet")) for t in sources
    ]


def prepared_path(sf_dir: str, name: str, sources: list[str], version: int) -> str:
    """Cache directory for one prepared frame: ``<srcid>-<statskey>``.
    ``srcid`` is the stable identity of the source tables (paths
    only); ``statskey`` rotates with any source's size/mtime_ns or the
    builder version, so regeneration or a builder change rebuilds."""
    paths = _source_paths(sf_dir, sources)
    srcid = hashlib.md5("||".join(paths).encode()).hexdigest()[:10]
    parts = [f"v{version}"]
    for src in paths:
        st = os.stat(src)
        parts.append(f"{src}|{st.st_size}|{st.st_mtime_ns}")
    statskey = hashlib.md5("||".join(parts).encode()).hexdigest()[:16]
    return os.path.join(_warehouse_root(), name, f"{srcid}-{statskey}")


#: GC grace period (seconds) measured FROM SUPERSESSION, not from the
#: key's build time: when a build finds a superseded sibling it first
#: drops a ``_SUPERSEDED`` tombstone inside it (Spark readers ignore
#: underscore-prefixed files) and deletes only keys whose tombstone is
#: older than the grace. Two protections (ADVICE r7, sharpened by the
#: r8 review): (a) a racing stale-stat build's fresh output survives
#: one cycle; (b) a concurrent session's lazily-evaluated DataFrame
#: over a key that was just superseded — however OLD that key is —
#: gets a full grace window before its files vanish. The store stays
#: bounded: any later successful build of the same (name, srcid)
#: reaps tombstoned keys past the grace.
GC_GRACE_SECONDS = 300.0

_TOMBSTONE = "_SUPERSEDED"


def _gc_superseded(path: str, name: str) -> None:
    """Two-phase GC of superseded sibling keys of a just-built
    artifact — same ``srcid`` (source identity), different
    stats/version, plus legacy pre-r7 keys (no ``srcid-`` prefix):
    phase 1 tombstones a newly-noticed superseded key; phase 2 (a
    later build) deletes keys tombstoned longer than
    :data:`GC_GRACE_SECONDS` ago. In-flight ``.tmp-`` build dirs are
    left alone. Bounds the store at one live key per (name, source
    identity), eventually."""
    import time

    parent = os.path.dirname(path)
    key = os.path.basename(path)
    srcid = key.split("-", 1)[0]
    removed = False
    try:
        siblings = os.listdir(parent)
    except OSError:
        return
    now = time.time()
    for d in siblings:
        if d == key or ".tmp-" in d:
            continue
        if d.startswith(f"{srcid}-") or "-" not in d:
            full = os.path.join(parent, d)
            marker = os.path.join(full, _TOMBSTONE)
            try:
                if not os.path.exists(marker):
                    with open(marker, "w") as fh:
                        fh.write(str(now))
                    continue  # phase 1: grace starts now
                if now - os.stat(marker).st_mtime < GC_GRACE_SECONDS:
                    continue
            except OSError:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed = True
    if removed:
        # a cached plan may pin the deleted files (ARTIFACT_QUERIES)
        _drop_dependent_plans(name)


def prepared_frame(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
    sources: list[str],
    version: int = 1,
) -> DataFrame:
    """Serve ``build()``'s result from the per-machine prepared store,
    building and persisting it exactly once per (source stats,
    version). Returns a plain parquet-scan DataFrame — cold cost in a
    fresh session is a file read, not the prepare iteration."""
    path = prepared_path(sf_dir, name, sources, version)
    if os.path.exists(path):
        # a source that reverted to earlier stats can make a
        # tombstoned key CURRENT again — clear the marker so a later
        # sibling GC never reaps the live key
        try:
            os.remove(os.path.join(path, _TOMBSTONE))
        except OSError:
            pass
    if not os.path.exists(path):
        # uuid component: two threaded builders in ONE process must not
        # share a temp dir (ADVICE r6); try/finally: a build() that
        # raises must not strand its temp output forever
        tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        try:
            build().write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, path)
            except OSError:
                # another session won the race; its artifact is equivalent
                pass
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        _gc_superseded(path, name)
    return spark.read.parquet(path)


#: artifact name → registry queries whose PREPARED PLANS list its
#: files. Invalidation must drop both: a rebuilt artifact reuses the
#: same directory with fresh part-file names, so a cached plan's
#: pinned file listing would read deleted paths (r6 full-suite
#: finding: drift tests invalidating smoke-scale artifacts crashed
#: the later determinism tests' cached plans).
ARTIFACT_QUERIES = {
    "bfs_supplier_order": ("graph_bfs",),
    "pagerank_supplier_nation": ("pagerank_suppliers",),
    "text_grams": ("text_metrics",),
}


def _drop_dependent_plans(name: str | None) -> None:
    from geoestate_etl_spark.plans.registry import invalidate_prepared

    if name is None:
        for queries in ARTIFACT_QUERIES.values():
            for q in queries:
                invalidate_prepared(q)
    else:
        for q in ARTIFACT_QUERIES.get(name, ()):
            invalidate_prepared(q)


def invalidate_artifact_key(
    sf_dir: str, name: str, sources: list[str], version: int = 1
) -> None:
    """Delete ONE (name, source-stats, version) artifact — the scoped
    form tests use so drilling one scale never forces other scales to
    rebuild their (expensive) prepare state. Also drops this
    session's prepared plans over the artifact (see
    :data:`ARTIFACT_QUERIES`)."""
    shutil.rmtree(prepared_path(sf_dir, name, sources, version), ignore_errors=True)
    _drop_dependent_plans(name)


def invalidate_artifacts(name: str | None = None) -> None:
    """Delete prepared artifacts (all, or one name's every key) so the
    next call rebuilds; dependent prepared PLANS are dropped too — a
    cached plan's file listing would otherwise point at deleted
    paths."""
    root = _warehouse_root()
    target = root if name is None else os.path.join(root, name)
    shutil.rmtree(target, ignore_errors=True)
    _drop_dependent_plans(name)
