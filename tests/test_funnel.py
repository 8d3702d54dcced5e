"""windowFunnel: hand-built chains, window cutoffs, order violations,
tie progression, and a naive brute-force cross-check on random data."""

from __future__ import annotations

import itertools
from datetime import datetime, timedelta

import pytest

from geoestate_etl_spark.operators.funnel import window_funnel

T0 = datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + timedelta(seconds=s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


STEPS = ["view", "click", "purchase"]


def _depths(spark, rows, window=100):
    df = _df(spark, rows)
    return {
        r.user_id: r.funnel_depth
        for r in window_funnel(df, STEPS, window).collect()
    }


def test_chain_semantics(spark):
    rows = [
        # u1: full chain inside the window
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
        # u2: purchase BEFORE click — order violation, depth 2
        (2, 0, "view"), (2, 30, "purchase"), (2, 40, "click"),
        # u3: click outside the window from the only view
        (3, 0, "view"), (3, 200, "click"),
        # u4: step-2/3 events only — depth 0
        (4, 0, "click"), (4, 1, "purchase"),
        # u5: LATER view restarts the window and rescues the chain
        (5, 0, "view"), (5, 150, "view"), (5, 160, "click"), (5, 170, "purchase"),
        # u6: non-step events ignored entirely
        (6, 0, "view"), (6, 1, "error"), (6, 2, "click"),
    ]
    d = _depths(spark, rows)
    assert d == {1: 3, 2: 2, 3: 1, 4: 0, 5: 3, 6: 2}


def test_equal_timestamps_progress(spark):
    rows = [(1, 0, "view"), (1, 0, "click"), (1, 0, "purchase")]
    assert _depths(spark, rows) == {1: 3}


def test_window_is_from_chain_start(spark):
    # click at 90 fits; purchase at 110 is 110s from the chain START
    # (> window) even though it's only 20s after the click
    rows = [(1, 0, "view"), (1, 90, "click"), (1, 110, "purchase")]
    assert _depths(spark, rows, window=100) == {1: 2}


def test_guards(spark):
    df = _df(spark, [(1, 0, "view")])
    with pytest.raises(ValueError):
        window_funnel(df, [], 10)
    with pytest.raises(ValueError):
        window_funnel(df, ["a", "a"], 10)


def _brute_depth(evs, window):
    """Max k over all increasing index chains (exponential; tiny n)."""
    best = 0
    by_step = [[t for t, s in evs if s == j] for j in (1, 2, 3)]
    for k in (3, 2, 1):
        for chain in itertools.product(*by_step[:k]):
            if all(chain[i] <= chain[i + 1] for i in range(k - 1)) and (
                chain[-1] - chain[0] <= window
            ):
                best = max(best, k)
                break
        if best:
            return best
    return 0 if any(evs) else None


def test_matches_bruteforce_on_random(spark):
    import random

    rng = random.Random(7)
    rows = []
    for u in range(30):
        for _ in range(rng.randint(1, 8)):
            rows.append(
                (u, rng.randint(0, 300),
                 rng.choice(["view", "click", "purchase", "error"]))
            )
    got = _depths(spark, rows, window=120)
    for u in got:
        evs = sorted(
            (s, {"view": 1, "click": 2, "purchase": 3}[t])
            for uu, s, t in rows
            if uu == u and t in ("view", "click", "purchase")
        )
        assert got[u] == _brute_depth(evs, 120), (u, evs)


def test_cohort_retention_semantics(spark):
    """Hand-built cohorts: offset 0 counts the cohort; later weeks
    count only returning members; a user's cohort is their FIRST
    event's ISO week."""
    from geoestate_etl_spark.operators.funnel import cohort_retention

    W = 7 * 24 * 3600
    rows = [
        (1, 0, "view"), (1, W, "view"), (1, 2 * W, "view"),  # w0, returns w1,w2
        (2, 0, "view"),                                       # w0 only
        (3, W, "view"), (3, 2 * W, "view"),                   # w1, returns w2
    ]
    df = _df(spark, rows)
    got = {
        (str(r.cohort), r.offset): r.n_users
        for r in cohort_retention(df).collect()
    }
    # T0 = Mon 2024-01-01, so weeks are exactly cohort boundaries
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1, ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1, ("2024-01-08", 1): 1,
    }


def test_pre_epoch_timestamps(spark):
    """Negative unix time must participate like any other instant —
    the r3 advice: a -1 sentinel silently reported depth 0/absent for
    chains whose events predate 1970 (unix_micros < 0)."""
    t69 = datetime(1969, 12, 31, 23, 0, 0)  # one hour pre-epoch
    rows = [
        (1, t69, "view"),
        (1, t69 + timedelta(seconds=10), "click"),
        (1, t69 + timedelta(seconds=20), "purchase"),
        # u2 straddles the epoch: view pre-1970, click after
        (2, t69 + timedelta(minutes=59), "view"),
        (2, t69 + timedelta(minutes=61), "click"),
        # u3: pre-epoch chain broken by the window, depth 1
        (3, t69, "view"),
        (3, t69 + timedelta(seconds=200), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r.user_id: r.funnel_depth
        for r in window_funnel(df, STEPS, 150).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1}
