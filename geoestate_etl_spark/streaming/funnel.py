"""Incremental windowFunnel over a stream (r3 verdict #8).

The batch operator (:mod:`geoestate_etl_spark.operators.funnel`) is a
left fold of a DP state vector over each user's time-sorted step
events — which makes it PERFECTLY incremental: the state is just the
k chain-start times (state[j] = latest chain start that has reached
step j, or NULL), so a micro-batch folds its events into the carried
state in O(batch) with O(k) state per user, and the emitted depth
after batch N equals the batch operator over batches 1..N concatenated.

Contract: event time must be non-decreasing per user ACROSS
micro-batches (the standard in-order-stream assumption — enforce with
a watermark + drop upstream); WITHIN a batch events are sorted by
(time, step) exactly like the batch operator, so intra-batch disorder
is absorbed. A late event that time-travels behind an already-folded
batch would need the full event list to replay — that's the batch
operator's job, not per-key streaming state.

The fold transition is duplicated from the batch operator's Column
expression in plain Python; ``tests/test_stream_funnel.py`` pins the
two implementations equal on multi-batch splits AND on randomized
event sets so they cannot silently diverge.

Scale shape: one shuffle on the user key into the state store
(RocksDB-capable — ``session.streaming_state_conf``), Arrow-batched
grouped-pandas execution, O(k) longs of state per user — no event
buffering, no re-sorting of history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _fold_events(
    state: list[int | None], evs: list[tuple[int, int]], k: int, win_us: int
) -> list[int | None]:
    """The batch DP transition (operators/funnel.py ``advance``) in
    plain Python: level 1 keeps the LATEST step-1 time; level i>1
    advances when a chain at i-1 still has window room, carrying that
    chain's start. NULL (None) sentinel — pre-1970 micros participate.
    ``evs`` must be (t, s) sorted ascending."""
    st = list(state)
    for t, s in evs:
        if s == 1:
            st[0] = t if st[0] is None else max(st[0], t)
        else:
            prev = st[s - 2]
            if prev is not None and t - prev <= win_us:
                st[s - 1] = prev if st[s - 1] is None else max(st[s - 1], prev)
    return st


def _depth(st: list[int | None]) -> int:
    # set levels always form a prefix; depth = count of set levels
    return sum(1 for v in st if v is not None)


def window_funnel_stream(
    events_stream: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming ``(user, funnel_depth)``, updated every micro-batch.

    Same step mapping and event pre-filter as the batch operator
    (JVM-side — only step events cross the Arrow boundary), then
    per-user stateful fold. Output mode: update (one row per touched
    user per batch; the latest emission is the current depth).
    """
    if not steps:
        raise ValueError("steps must be a non-empty ordered list")
    k = len(steps)
    if len(set(steps)) != k:
        raise ValueError(f"steps must be distinct, got {steps}")
    win_us = int(window_seconds) * 1_000_000
    step_map = F.create_map(
        *[F.lit(x) for s, i in zip(steps, range(1, k + 1)) for x in (s, i)]
    )
    e = (
        events_stream.withColumn("_step", step_map[F.col(type_col)])
        .filter(F.col("_step").isNotNull())
        .select(
            F.col(user_col),
            F.unix_micros(F.col(ts_col)).alias("_t"),
            F.col("_step").alias("_s"),
        )
    )

    # the key keeps its INPUT type (string session ids, int32 users, …)
    # — hardcoding LongType broke the "same semantics as batch"
    # contract for non-long keys at the Arrow boundary (r4 review)
    out_schema = T.StructType(
        [
            T.StructField(user_col, events_stream.schema[user_col].dataType),
            T.StructField("funnel_depth", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField(f"c{i}", T.LongType()) for i in range(k)]
    )

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = list(state.get) if state.exists else [None] * k
        evs: list[tuple[int, int]] = []
        for pdf in pdfs:
            evs.extend(
                zip(
                    (int(t) for t in pdf["_t"]),
                    (int(s) for s in pdf["_s"]),
                )
            )
        evs.sort()  # (t, s) — the batch operator's array_sort order
        st = _fold_events(st, evs, k, win_us)
        state.update(tuple(st))
        yield pd.DataFrame(
            {user_col: [key[0]], "funnel_depth": [_depth(st)]}
        )

    return e.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
