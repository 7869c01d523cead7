"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps per-analysis in-flight state (processed counters,
in-progress markers: mongodb_to_rdf.py:490-497,534-536) in worker
memory. The streaming engine's equivalent is a keyed state store:
``running_user_totals`` maintains per-user running counters across
micro-batches with a processing-time timeout — state survives batches,
is checkpointed with the query, and scales per-key across executors.

Arrow moves batches between JVM and Python, so the per-key hook costs
one vectorized pandas pass per micro-batch, not per row.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this batch's events into the running (count, sum) state and
    emit the updated totals for the key."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running event count + value sum, maintained as keyed
    streaming state. Each micro-batch emits one updated row per user
    seen in that batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithStateInPandas (Spark 4 stateful processor API) -------------


def _twsp_available() -> bool:
    """transformWithStateInPandas needs BOTH the Spark 4 API and
    protobuf (its state-server wire protocol —
    pyspark/sql/streaming/proto/StateMessage_pb2 imports
    google.protobuf at runtime). Gate on both so environments without
    protobuf fall back to applyInPandasWithState
    (running_user_totals) instead of crashing the driver worker."""
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def make_minmax_tracker():
    """StatefulProcessor tracking per-user (min, max, count) of event
    values across micro-batches — the Spark 4 ``transformWithState``
    successor to applyInPandasWithState: named state variables with
    individual schemas/TTLs instead of one monolithic state tuple, and
    explicit init/close hooks.

    Kept in a factory so importing this module never requires the new
    API (the class body references StatefulProcessor).
    """
    import pandas as pd  # local: worker-side import must be self-contained

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MinMaxTracker(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "minmax", "vmin double, vmax double, n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            vmin, vmax, n = None, None, 0
            if self._state.exists():
                vmin, vmax, n = self._state.get()
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                lo, hi = float(pdf["value"].min()), float(pdf["value"].max())
                vmin = lo if vmin is None else min(vmin, lo)
                vmax = hi if vmax is None else max(vmax, hi)
                n += len(pdf)
            self._state.update((vmin, vmax, n))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "vmin": [vmin],
                    "vmax": [vmax],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    return MinMaxTracker()


def running_user_minmax(events: DataFrame) -> DataFrame:
    """Per-user running (min, max, count) of ``value`` via
    transformWithStateInPandas. Same keyed-state scaling story as
    running_user_totals; this one exercises the Spark 4 processor API
    (named ValueState, init/close lifecycle)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_minmax_tracker(),
            outputStructType=StructType(
                [
                    StructField("user_id", LongType()),
                    StructField("vmin", DoubleType()),
                    StructField("vmax", DoubleType()),
                    StructField("n_events", LongType()),
                ]
            ),
            outputMode="Update",
            timeMode="None",
        )
    )
