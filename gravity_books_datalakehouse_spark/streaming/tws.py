"""Custom stateful streaming via transformWithStateInPandas (Spark 4).

The successor API to applyInPandasWithState (streaming/stateful.py
keeps the classic form): a StatefulProcessor object with TYPED state
variables (value/list/map), optional per-key timers and state TTL,
running on the RocksDB state store. This module implements per-user
running spend — the same cross-micro-batch accumulation contract as
stateful.running_type_totals, so the two APIs are testable against the
same batch oracle.

Scale: state is keyed by user_id (high cardinality is exactly what the
RocksDB provider exists for); each micro-batch touches only the keys
present in the batch, and TTL (configurable on the state var) bounds
state for churned users.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


class UserSpendProcessor(StatefulProcessor):
    """Running (count, value sum) per user across micro-batches."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._spend = handle.getValueState("spend", "n long, total double")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        if self._spend.exists():
            n, total = self._spend.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._spend.update((n, float(total)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [float(total)],
            }
        )

    def close(self) -> None:
        pass


def running_user_spend(events: DataFrame) -> DataFrame:
    """Streaming per-user running spend with typed ValueState (requires
    the RocksDB state store provider — see tests for the session conf)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserSpendProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
