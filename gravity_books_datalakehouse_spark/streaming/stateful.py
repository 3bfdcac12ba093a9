"""Custom stateful streaming operator via applyInPandasWithState.

The brief's "custom stateful operators" slot (SURVEY.md §2.7 — streaming
is ABSENT in the reference; this is engine-native extension surface):
a per-key running aggregator that Structured Streaming's built-in
aggregations can't express directly — here, per event_type state holding
(count, value sum, max single gap between events) maintained across
micro-batches with timeout-free GroupState.

Used by tests/test_streaming.py to prove state survives across
micro-batches (two-file source, maxFilesPerTrigger=1 ⇒ ≥2 batches).

Scale: state lives in the state store keyed by event_type (bounded
cardinality); swap HDFS-backed store for RocksDB at large key counts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_us long"


def _update_type_state(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum, latest ts) per event_type across batches."""
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            batch_last = pdf["ts"].max()
            last_us = max(last_us, int(batch_last.value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000)],
        }
    )


def running_type_totals(events: DataFrame) -> DataFrame:
    """Streaming per-type running totals with explicit GroupState."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_type_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
