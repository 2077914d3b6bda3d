"""Custom stateful streaming operator via applyInPandasWithState.

Beyond the reference (which has no streaming state at all): a running
per-user accumulator, the canonical "custom stateful operator" shape —
arbitrary Python state per key, Arrow-batched, checkpoint-recoverable.
Emits one updated row per key per micro-batch (update semantics).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming: per-user lifetime event count + value sum, updated each
    micro-batch. State lives in the state store (RocksDB/HDFS-backed on a
    cluster), so cardinality scales with distinct users, not event volume."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
