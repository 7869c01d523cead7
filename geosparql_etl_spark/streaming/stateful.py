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
