"""Connected components over near-duplicate pairs: dedup *clustering*.

Pair-finding (MinHash/SimHash/embedding LSH) yields edges; the
real-world dedup step is grouping transitive duplicates into clusters
and electing one canonical keeper per cluster. This is the engine's
iterative-algorithm surface (genuinely not single-query SQL): the
alternating small-star/large-star style label propagation —
every node repeatedly adopts the minimum label in its neighborhood
until a fixed point.

Scale shape per iteration: one groupBy (min label per node) + two
joins (propagate along edges, then pointer-jump) — all shuffles on
node id. The pointer-jump makes convergence O(log diameter), so the
default 20 iterations cover components with diameters up to ~2^20 —
plain one-hop propagation would need O(diameter) rounds and silently
under-merge long chains. ``localCheckpoint`` truncates the growing
lineage each iteration, which keeps deep iterative plans compilable.
"""

from __future__ import annotations

import threading
import weakref
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Guard for the iteration's shuffle-partition window: callers run CC
#: on CONCURRENT driver threads (components_suite builds its variants
#: that way), and a naive per-call save/set/restore races two ways —
#: the second thread can save the first's TEMPORARY value and
#: "restore" the session to 1 partition permanently, or size its own
#: window from that temporary value and run a large iteration
#: single-task. Every entrant therefore sizes from the ORIGINAL value
#: (saved once by the first entrant), the session conf holds the MAX
#: over all active windows (a big concurrent CC is never shrunk by a
#: tiny one), and the last exit restores the original. State is keyed
#: PER SparkSession (weakly, so a stopped session's entry is
#: collectable): ``spark.sql.shuffle.partitions`` is a session-scoped
#: conf, and a process-global saved value would let a second session's
#: window size itself from — and "restore" — the FIRST session's
#: setting (r8 ADVICE, medium). Residuals, documented: a concurrent
#: NON-CC query planned inside someone else's active window sees the
#: reduced setting, and a user conf change made mid-window is
#: overwritten on exit — both performance-only, bounded by the
#: window's duration, and impossible at scale (a big edge set sizes
#: to the original, making the window a no-op).
_conf_lock = threading.Lock()


class _WindowState:
    __slots__ = ("saved", "active")

    def __init__(self) -> None:
        self.saved: str | None = None
        self.active: list[int] = []


_conf_state: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


@contextmanager
def _iteration_shuffle_window(sess, n_edges: int):
    """Temporarily size ``spark.sql.shuffle.partitions`` from the
    measured edge count (≥100k edges per partition; never raised above
    the session setting — at scale this is a no-op)."""
    key = "spark.sql.shuffle.partitions"
    entered = False
    npart = 0
    with _conf_lock:
        st = _conf_state.get(sess)
        if st is None:
            st = _WindowState()
            _conf_state[sess] = st
        try:
            original = int(
                sess.conf.get(key) if st.saved is None else st.saved
            )
        except ValueError:  # non-numeric conf (e.g. "auto")
            original = None
        if original is not None:
            # enter even when npart == original: a LARGE concurrent CC
            # must push its full size into the active set so a tiny
            # window running beside it cannot hold the conf at 1 while
            # the large iteration plans its rounds
            npart = max(1, min(original, n_edges // 100_000 + 1))
            saved_before = st.saved
            if st.saved is None:
                st.saved = str(original)
            st.active.append(npart)
            try:
                sess.conf.set(key, str(max(st.active)))
            except Exception:
                # undo the bookkeeping so a failed set cannot pin
                # max(active) for every future window (r8 ADVICE, low)
                st.active.remove(npart)
                st.saved = saved_before
                raise
            entered = True
    try:
        yield
    finally:
        if entered:
            with _conf_lock:
                st.active.remove(npart)
                if st.active:
                    sess.conf.set(key, str(max(st.active)))
                elif st.saved is not None:
                    sess.conf.set(key, st.saved)
                    st.saved = None


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iter: int = 20,
    driver_max_edges: int | None = 100_000,
) -> DataFrame:
    """Resolve (id_a, id_b) edges into (id, component) where component
    is the minimum id reachable from ``id`` — deterministic labels.

    Returns ONLY nodes that appear in at least one pair (singletons
    are trivially their own component; callers union them in if
    needed).

    ``driver_max_edges`` (r9): an edge set at or below this bound is
    solved with driver-side union-find instead of the iterative
    distributed loop. The bound is exactly the iteration window's
    one-shuffle-partition clamp (≥100k edges per partition): below
    it every distributed round would run as a SINGLE task anyway, so
    the loop's per-round scheduling (one localCheckpoint job per
    round, O(log diameter) rounds) is pure overhead over a graph
    whose deduped edges are ≤ ~1.6 MB of longs — the same
    driver-bounded-metadata class as the k-means centroids and range
    boundaries. Labels are the identical unique fixed point (min
    reachable id), pinned by ``tests/test_components.py`` parity.
    ``None`` forces the distributed loop.
    """
    # symmetrize in ONE pass over the pair plan: explode each pair into
    # both directions instead of `pairs UNION pairs-reversed`, which
    # executes the (often expensive, e.g. full MinHash-LSH) pair plan
    # TWICE on first materialization — measured as the dominant fixed
    # cost of corpus_pipeline's CC stage at sf0.1 (r8)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(left_col).alias("src"),
                        F.col(right_col).alias("dst"),
                    ),
                    F.struct(
                        F.col(right_col).alias("src"),
                        F.col(left_col).alias("dst"),
                    ),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
        .persist()
    )

    # Materialize the (possibly expensive) pair plan into the cache
    # now and size the ITERATION's shuffles from the measured edge
    # count: localCheckpoint bypasses AQE (docs/TUNING.md §traps), so
    # without this every tiny iteration round pays the session's full
    # shuffle-partition fan-out in empty-task scheduling — measured as
    # ~3s of corpus_pipeline's fixed cost at sf0.1 (r8). At scale the
    # clamp leaves the session setting untouched (≥100k edges per
    # partition keeps npart == default long before memory matters).
    n_edges = edges.count()
    if driver_max_edges is not None and n_edges <= driver_max_edges:
        out = _cc_driver(pairs.sparkSession, edges)
        if out is not None:  # None = NULL ids seen; use the loop
            edges.unpersist()
            return out
    # Truncate the edge lineage AFTER the cache is materialized: the
    # checkpoint scans cached partitions (cheap, and the expensive
    # upstream already executed WITH AQE via the count above), and the
    # iteration plans stop embedding the whole upstream logical tree —
    # Catalyst re-analyzed the full MinHash-LSH lineage once per round
    # otherwise, the other measured fixed cost of corpus_pipeline's CC
    # stage (r8).
    cached = edges
    edges = cached.localCheckpoint(eager=True)
    cached.unpersist()

    # start: every node labeled with the min of itself and its
    # neighbors. NOT checkpointed — it is one hash-agg over the cached
    # edges, so iteration 0's checkpoint materializes it along with its
    # own work (one fewer action/barrier per call)
    labels = (
        edges.groupBy("src")
        .agg(F.least(F.min("dst"), F.first("src")).alias("component"))
        .select(
            F.col("src").alias("id"),
            F.least("src", "component").alias("component"),
        )
    )

    # the loop plans (and eagerly executes) each round inside the
    # sized-shuffle window (thread-safe, see _iteration_shuffle_window)
    with _iteration_shuffle_window(pairs.sparkSession, n_edges):
        return _cc_iterate(edges, labels, max_iter)


def _cc_driver(spark, edges: DataFrame) -> "DataFrame | None":
    """Union-find over a driver-collected (small, deduped, symmetric)
    edge set — same (id, component=min reachable id) contract as the
    distributed loop. Union-by-min keeps every set's root at its
    minimum member; path halving keeps finds near-constant at this
    size. Returns None when a NULL id is present (Python cannot order
    None against values; the caller falls back to the distributed
    loop, whose null-key groupBy semantics are the contract)."""
    from pyspark.sql import types as T

    id_type = edges.schema["src"].dataType
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    try:
        for a, b in edges.collect():
            if a is None or b is None:
                return None
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra  # min id stays the root
    except TypeError:
        # ids Python can't hash or order consistently with Spark
        # (BinaryType collects as bytearray → unhashable; float NaN
        # breaks the min-root invariant) — fall back to the
        # distributed loop, mirroring the NULL-id fallback (r9 ADVICE)
        return None

    rows = [(x, find(x)) for x in parent]
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("component", id_type),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _cc_iterate(edges: DataFrame, labels: DataFrame, max_iter: int) -> DataFrame:
    from pyspark.sql import Observation

    for _ in range(max_iter):
        # propagate: each node adopts min(own label, neighbors' labels)
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
            .withColumnRenamed("src", "id")
        )
        propagated = labels.join(neighbor_labels, "id", "left").select(
            "id",
            F.col("component").alias("_old"),
            F.least("component", F.coalesce("n_comp", "component")).alias(
                "component"
            ),
        )
        # pointer-jump (path halving): also adopt the label OF my label.
        # Neighbor propagation alone moves labels one hop per round
        # (O(diameter) rounds — a long chain would not converge within
        # max_iter); combined with jumping, convergence is O(log n).
        parents = propagated.select(
            F.col("id").alias("component"), F.col("component").alias("parent")
        )
        # convergence check rides the checkpoint's materialization via
        # the Observation API — no separate join+count job per round
        obs = Observation()
        new_labels = (
            propagated.join(parents, "component", "left")
            .select(
                "id",
                "_old",
                F.least(
                    "component", F.coalesce("parent", "component")
                ).alias("component"),
            )
            .observe(
                obs,
                F.sum(
                    (F.col("component") != F.col("_old")).cast("long")
                ).alias("changed"),
            )
            .drop("_old")
            .localCheckpoint()
        )
        try:
            changed = int(obs.get["changed"] or 0)
        except Exception:
            # Spark 4.1 quirk: metrics rows over driver-local relations
            # trip PythonSQLUtils.toPyRow (see corpus_pipeline); such
            # inputs are tiny test frames, so the direct join costs ~0
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
        labels = new_labels
        if changed == 0:
            break
    return labels


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of each node to the
    minimum of its neighborhood (Kiveris et al., MR-CC). One symmetric
    groupBy + one equi-join, all shuffled on node id."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Direct each edge large→small, then connect all smaller neighbors
    (and the center) to the neighborhood minimum."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    spokes = (
        directed.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    centers = mins.select("u", F.col("m").alias("v"))
    return spokes.union(centers).distinct()


def connected_components_star(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Alternating large-star/small-star contraction — same (id,
    component=min reachable id) contract as :func:`connected_components`,
    different scale profile.

    Label propagation carries a (node, label) row per node every round
    regardless of progress; star contraction rewrites the EDGE set,
    which shrinks geometrically as components collapse into stars, so
    per-round shuffle volume decays. On skewed pair graphs (one huge
    near-dup cluster plus many small ones — the common corpus shape)
    that makes later rounds nearly free, and high-degree hubs flatten
    in O(1) rounds instead of feeding the same wide neighborhood back
    through every iteration. Convergence is O(log² n) worst case,
    ~log n in practice (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14 — public algorithm).

    Prefer this for very large / skewed pair graphs; the label-prop
    variant keeps singleton bookkeeping simpler for modest inputs.
    """
    # One materialization of the (possibly expensive) pair plan: the
    # node set and the edge set both derive from the checkpointed raw
    # frame instead of each re-executing the pair lineage (same
    # double-compute fix as connected_components' symmetrize, r8)
    raw = pairs.select(
        F.col(left_col).alias("u"), F.col(right_col).alias("v")
    ).localCheckpoint()
    # node set from the RAW pairs: a self-loop-only node is its own
    # (singleton) component and must still get a label
    all_nodes = (
        raw.select(F.explode(F.array("u", "v")).alias("id"))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    )
    for _ in range(max_iter):
        new_edges = _small_star(_large_star(edges)).localCheckpoint()
        # converged when the (distinct) edge set is unchanged:
        # equal cardinality + empty one-sided difference
        if (
            new_edges.count() == edges.count()
            and new_edges.exceptAll(edges).limit(1).count() == 0
        ):
            edges = new_edges
            break
        edges = new_edges
    # fixed point is a forest of stars (u → component root); roots
    # appear only on the right, so union them back as self-labeled
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = all_nodes.join(
        labels.select("id"), "id", "left_anti"
    ).select("id", F.col("id").alias("component"))
    return labels.union(roots)


def dedup_clusters(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    scores: DataFrame | None = None,
) -> DataFrame:
    """Cluster summary from near-dup pairs: one row per component with
    the canonical keeper and member count.

    Default keeper = component min id (cheap, deterministic). With
    ``scores`` — a (id, score) frame, e.g. ``quality_score`` over the
    documents — the keeper is the member with the highest score
    (production near-dup pipelines keep the *best* copy, not the
    first); ties and unscored members fall back toward min id via
    ``max_by`` on a (score, -id) ordering, so the choice stays
    deterministic. One extra equi-join on id, still no row_number
    window over the corpus.
    """
    cc = connected_components(pairs, left_col, right_col)
    if scores is None:
        return cc.groupBy("component").agg(
            F.min("id").alias("keeper_id"), F.count("*").alias("cluster_size")
        )
    scored = cc.join(scores, "id", "left").withColumn(
        "_rank", F.struct(F.coalesce("score", F.lit(float("-inf"))), -F.col("id"))
    )
    return scored.groupBy("component").agg(
        F.max_by("id", "_rank").alias("keeper_id"),
        F.count("*").alias("cluster_size"),
    )
