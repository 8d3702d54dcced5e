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
) -> DataFrame:
    """Rows of ``right`` that occur in ``[left_ts, left_ts + within]``
    for the same ``key``. ``left_ts``/``right_ts`` (and all non-key
    columns) must have distinct names across the two frames.

    Streaming inputs get ``watermark`` applied to their own event-time
    column; batch inputs are joined as-is with the identical condition.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"interval {within}"))
    )
    return left.join(right, cond, "inner").drop(right[key])
