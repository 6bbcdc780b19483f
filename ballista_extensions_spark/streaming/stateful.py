"""Custom stateful streaming operators via applyInPandasWithState —
the arbitrary-state mechanism for operators Spark's built-in windowing
can't express (SURVEY.md §7: 'applyInPandasWithState for custom stateful
operators').

State is per group key, Arrow-batched, persisted in the state store and
bounded by timeouts — the streaming analogue of the reference's
extension-operator pattern: you supply the per-partition kernel, Spark
supplies distribution, fault tolerance and state management.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_counts(events: DataFrame) -> DataFrame:
    """Cumulative per-user event counts and value sums, maintained in
    custom state across micro-batches; emits the updated totals for every
    user seen in each batch.

    State: (n_events, total_value_micros) — value is stored as integer
    micro-units so state math is exact across batches.
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        n, micros = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            micros += int(round(pdf["value"].sum() * 1_000_000))
        state.update((n, micros))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [micros / 1_000_000],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, micros long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
