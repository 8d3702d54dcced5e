"""Stream-stream interval join (event correlation within a time
window) — the streaming sibling of the batch range join
(``operators/asof.py``), e.g. attributing purchases to the click that
preceded them by at most N minutes.

Semantics and state bounds:

- inner join; matches are emitted as soon as both rows have arrived
  (watermarks do NOT delay inner-join output — they bound the buffered
  state: each side keeps rows only until the other side's watermark
  passes ``left_ts + within``, so state is O(rate × within), not
  O(stream));
- the time bound MUST appear in the join condition, otherwise Spark
  has no way to evict state and the query is rejected/unbounded.

The same builder works on batch DataFrames (no watermark applied) —
that twin is how the tests pin the join's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Rows of ``right`` that occur in ``[left_ts, left_ts + within]``
    for the same ``key``. ``left_ts``/``right_ts`` (and all non-key
    columns) must have distinct names across the two frames.

    Streaming inputs get ``watermark`` applied to their own event-time
    column; batch inputs are joined as-is with the identical condition.

    ``how`` extends the correlation to non-matches: ``left_outer``
    keeps left rows that never matched (e.g. clicks that never
    converted), ``right_outer``/``full_outer`` symmetrically. Outer
    semantics in streaming: a null-padded row is emitted only when the
    watermark guarantees no future match (state for the row expired),
    so unmatched rows arrive delayed by the watermark — and a finite
    source's final rows emit only after a later event advances the
    watermark past them (tests append a far-future sentinel for this).
    The key column is coalesced across sides so outer rows keep it.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    # Both sides often derive from the SAME parent (click/purchase
    # splits of one stream) — explicit aliases keep every column
    # reference unambiguous under Spark's self-join analysis.
    l, r = left.alias("__ij_l"), right.alias("__ij_r")
    lc = lambda c: F.col(f"__ij_l.{c}")  # noqa: E731
    rc = lambda c: F.col(f"__ij_r.{c}")  # noqa: E731
    cond = (
        (lc(key) == rc(key))
        & (rc(right_ts) >= lc(left_ts))
        & (rc(right_ts) <= lc(left_ts) + F.expr(f"interval {within}"))
    )
    joined = l.join(r, cond, how)
    lcols = [lc(c) for c in left.columns if c != key]
    rcols = [rc(c) for c in right.columns if c != key]
    return joined.select(
        F.coalesce(lc(key), rc(key)).alias(key), *lcols, *rcols
    )
