"""Incremental streaming funnel == batch windowFunnel (r3 verdict #8):
state carries the DP vector across real micro-batches, and the final
per-user depth matches the batch operator on the full event set."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from geoestate_etl_spark.operators.funnel import window_funnel
from geoestate_etl_spark.streaming.funnel import (
    _depth,
    _fold_events,
    window_funnel_stream,
)

T0 = datetime(2024, 1, 1)
STEPS = ["view", "click", "purchase"]
WINDOW = 120


def _events_df(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + timedelta(seconds=s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def _run_stream(spark, tmp_path, batches):
    """Write each batch as one parquet file; maxFilesPerTrigger=1
    replays them as separate micro-batches IN ORDER (file mtime)."""
    src = str(tmp_path / "funnel_batches")
    schema = "user_id long, ts timestamp, event_type string"
    import time as _time

    for i, rows in enumerate(batches):
        _events_df(spark, rows).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)  # distinct mtimes -> deterministic file order
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        window_funnel_stream(stream, STEPS, WINDOW)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_out")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = q.lastProgress["batchId"] + 1
        rows = spark.sql("SELECT user_id, funnel_depth FROM funnel_out").collect()
    finally:
        q.stop()
    last = {}
    for r in rows:  # memory sink appends in batch order; last wins
        last[r.user_id] = r.funnel_depth
    return last, n_batches


def test_stream_matches_batch_multi_batch(spark, tmp_path):
    # time-split batches (the in-order contract): chains cross batch
    # boundaries, so state must genuinely carry
    b1 = [
        (1, 0, "view"),
        (2, 5, "view"), (2, 6, "click"),
        (3, 0, "click"),            # step-2 first: depth 0 until a view
        (4, 0, "view"), (4, 1, "click"),
    ]
    b2 = [
        (1, 30, "click"),           # continues u1's batch-1 chain
        (2, 50, "purchase"),        # completes u2
        (3, 60, "view"),            # u3 finally starts
        (4, 200, "purchase"),       # outside window of u4's chain start
    ]
    b3 = [
        (1, 100, "purchase"),       # completes u1 inside the window
        (3, 70, "click"), (3, 80, "purchase"),
        (5, 300, "view"),           # new user in the last batch
    ]
    got, n_batches = _run_stream(spark, tmp_path, [b1, b2, b3])
    assert n_batches >= 3  # really ran as separate micro-batches

    expected = {
        r.user_id: r.funnel_depth
        for r in window_funnel(
            _events_df(spark, b1 + b2 + b3), STEPS, WINDOW
        ).collect()
    }
    assert got == expected
    assert expected == {1: 3, 2: 3, 3: 3, 4: 2, 5: 1}


def test_fold_matches_batch_randomized(spark):
    """Property drill at the fold level: any in-order batch split of a
    random event set folds to the batch operator's depth (the two
    transition implementations cannot silently diverge)."""
    rng = random.Random(11)
    rows = []
    for u in range(25):
        for _ in range(rng.randint(1, 10)):
            rows.append(
                (u, rng.randint(0, 400),
                 rng.choice(["view", "click", "purchase", "error"]))
            )
    expected = {
        r.user_id: r.funnel_depth
        for r in window_funnel(_events_df(spark, rows), STEPS, WINDOW).collect()
    }
    win_us = WINDOW * 1_000_000
    t0_us = int(T0.timestamp()) * 1_000_000
    smap = {"view": 1, "click": 2, "purchase": 3}
    for u, depth in expected.items():
        evs = sorted(
            (t0_us + s * 1_000_000, smap[t])
            for uu, s, t in rows
            if uu == u and t in smap
        )
        # every split point: fold prefix, then suffix, compare depth
        for cut in range(0, len(evs) + 1, max(1, len(evs) // 3)):
            st = _fold_events([None] * 3, evs[:cut], 3, win_us)
            st = _fold_events(st, evs[cut:], 3, win_us)
            assert _depth(st) == depth, (u, cut, evs)


def test_stream_pre_epoch(spark, tmp_path):
    """The streaming fold inherits the NULL sentinel: pre-1970 chains
    (negative unix micros) count, split across batches."""
    t69 = datetime(1969, 12, 31, 23, 0, 0)

    def mk(rows):
        return [(u, (t69 + timedelta(seconds=s) - T0).total_seconds(), t)
                for u, s, t in rows]

    b1 = mk([(1, 0, "view")])
    b2 = mk([(1, 10, "click"), (1, 20, "purchase")])
    got, _ = _run_stream(spark, tmp_path, [b1, b2])
    assert got == {1: 3}


def test_stream_string_keys(spark, tmp_path):
    """Non-long entity keys (string session ids) must work — the
    output schema mirrors the input key type (r4 review finding)."""
    from geoestate_etl_spark.streaming.funnel import window_funnel_stream

    rows = [("s1", T0, "view"), ("s1", T0 + timedelta(seconds=5), "click"),
            ("s2", T0, "click")]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    src = str(tmp_path / "strkeys")
    df.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        window_funnel_stream(stream, STEPS, WINDOW)
        .writeStream.outputMode("update")
        .format("memory").queryName("funnel_str").start()
    )
    try:
        q.processAllAvailable()
        got = {r.user_id: r.funnel_depth
               for r in spark.sql("SELECT * FROM funnel_str").collect()}
    finally:
        q.stop()
    assert got == {"s1": 2, "s2": 0}
