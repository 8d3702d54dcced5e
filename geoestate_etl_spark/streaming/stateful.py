"""Custom stateful streaming operators (applyInPandasWithState).

The built-in windows (event_windows.py) cover time bucketing; this
module is the arbitrary-state path: per-key state carried across
micro-batches with explicit timeout handling. The worked operator is
a per-user running counter with session value totals — the canonical
shape for per-entity feature accumulation over an event stream.

Scale notes: state lives in the state store partitioned by the
grouping key (one shuffle); the Arrow boundary is batch-wise. The
same grouped-pandas function also runs in batch via applyInPandas
(minus the state), which is how tests pin semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _fold(n: int, total: float, pdfs) -> tuple[int, float]:
    """Shared accumulation semantics for BOTH stateful APIs — one
    definition so they cannot silently diverge."""
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    return n, round(total, 2)


def _out_row(key: tuple, n: int, total: float) -> pd.DataFrame:
    return pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def _accumulate(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    n, total = _fold(n, total, pdfs)
    state.update((n, total))
    yield _out_row(key, n, total)


def running_user_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit state."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _accumulate,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent (same output on a single batch) — the oracle
    for the streaming operator and a plain groupBy in disguise."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# --- transformWithStateInPandas (Spark 4 stateful-processor API) -----------


def _twst_available() -> bool:
    """transformWithStateInPandas needs BOTH the Spark 4 API and the
    protobuf wire library its state-server protocol uses. protobuf is
    not in this container (same policy as the multimodal pixel codecs:
    the operator code is real, the environment gap is declared)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        return True
    except ImportError:  # older Spark or no protobuf in the container
        return False


if _twst_available():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-user running totals on the Spark 4 stateful-processor
        API — the successor of applyInPandasWithState with typed state
        handles (ValueState/ListState/MapState), timers, and TTL.
        Same semantics as :func:`running_user_totals_stream`, so the
        two APIs certify each other in tests."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, total = self._agg.get()
            else:
                n, total = 0, 0.0
            n, total = _fold(n, total, rows)
            self._agg.update((n, total))
            yield _out_row(key, n, total)

        def close(self) -> None:
            pass

    def running_user_totals_tws(events_stream: DataFrame) -> DataFrame:
        """Streaming per-user running totals via
        ``transformWithStateInPandas``. Requires the RocksDB state
        store provider (set by ``session.streaming_state_conf``)."""
        return (
            events_stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=RunningTotalsProcessor(),
                outputStructType=RUNNING_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
        )
