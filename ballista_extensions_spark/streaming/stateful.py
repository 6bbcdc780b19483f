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


def funnel_stages_stream(events: DataFrame) -> DataFrame:
    """Incremental conversion-funnel tracking — the streaming twin of the
    batch ``event_funnel`` query: per-user state holds the earliest
    view/click/purchase timestamps (integer µs; -1 = not seen) and each
    micro-batch emits the user's updated funnel stage (0-3, counting
    stages completed IN ORDER by first occurrence).

    State is three longs per user — bounded, skew-safe (user-keyed), and
    exactly the aggregation the batch twin computes, so replaying the
    full history through micro-batches converges to the batch answer
    (pytest-asserted)."""

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        v, c, p = state.get if state.exists else (-1, -1, -1)
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("int64") // 1000  # ns -> µs

            def first_seen(etype: str, prev: int) -> int:
                sel = ts_us[pdf["event_type"] == etype]
                if not len(sel):
                    return prev
                m = int(sel.min())
                return m if prev < 0 else min(prev, m)

            v = first_seen("view", v)
            c = first_seen("click", c)
            p = first_seen("purchase", p)
        state.update((v, c, p))
        stage = 0
        if v >= 0:
            stage = 1
            if c >= 0 and v < c:
                stage = 2
                if p >= 0 and c < p:
                    stage = 3
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "t_view_us": [v],
                "t_click_us": [c],
                "t_buy_us": [p],
                "stage": [stage],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, t_view_us long, t_click_us long, "
            "t_buy_us long, stage long"
        ),
        stateStructType="v long, c long, p long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_first_occurrence(
    df: DataFrame, key_col: str, id_col: str
) -> DataFrame:
    """First-occurrence flagging with cross-batch state — the streaming
    dedup-routing primitive: for every row, ``is_first`` is true iff no
    row with the same ``key_col`` value appeared EARLIER in the stream
    (earlier micro-batch, or smaller ``id_col`` within the same batch —
    the deterministic tiebreak an id-ordered replay pins down).

    State per key is ONE value of the id's own type (the minimum id
    seen — 8 B/key for long ids), so a billion-key corpus stays cheap
    in the state store — the streaming analogue of the batch
    ``MIN(id) OVER (PARTITION BY key)`` and the decision point of a
    dedup-at-ingest pipeline (first occurrence flows on, repeats route
    to the duplicate sink). Emits every input row exactly once (append
    semantics). Key and id types are propagated from ``df``'s schema
    (string URLs, binary digests and numeric ids all work); the id
    type must be orderable (min semantics)."""
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    id_type, key_type = types[id_col], types[key_col]

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        # concat the group's batch chunks: the first-occurrence flag
        # belongs to the min id across the WHOLE batch, which a
        # chunk-at-a-time pass could hand to the wrong chunk's min.
        # (single-chunk groups — the overwhelmingly common case —
        # skip the concat: this kernel runs once per KEY, so per-call
        # pandas overhead is the stateful stage's unit cost)
        chunks = list(pdfs)
        pdf = (
            chunks[0]
            if len(chunks) == 1
            else pd.concat(chunks, ignore_index=True)
        )
        seen = state.get[0] if state.exists else None
        ids = pdf[id_col]
        batch_min = ids.min()
        if hasattr(batch_min, "item"):  # numpy scalar -> plain python
            batch_min = batch_min.item()
        first_id = batch_min if seen is None else None
        state.update((batch_min if seen is None else min(seen, batch_min),))
        yield pd.DataFrame(
            {
                id_col: ids,
                key_col: pdf[key_col],
                "is_first": [
                    first_id is not None and i == first_id for i in ids
                ],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{id_col} {id_type}, {key_col} {key_type}, is_first boolean"
        ),
        stateStructType=f"min_id {id_type}",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
