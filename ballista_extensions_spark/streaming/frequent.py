"""Streaming heavy hitters — bounded Misra–Gries state per item shard.

The streaming twin of operators/frequent.py: an unbounded stream of
items whose exact running counts would need unbounded state gets a
bounded per-shard Misra–Gries summary instead, maintained across
micro-batches in the state store via ``applyInPandasWithState``.

Sharding is BY ITEM HASH, so each distinct item lives in exactly one
shard and the batch operator's guarantee carries over per shard: an
emitted count is a lower bound, ``cnt <= true <= cnt + err`` with
``err`` the shard's total decrement, and any item whose true count
exceeds its shard's ``err`` is guaranteed present in that shard's
summary. Consumers merge the (item, cnt, err) rows downstream — the
same candidate arithmetic as the batch operator's verification phase.

State is one JSON blob + decrement counter per shard, bounded at
``4 x counters`` entries by the compaction rule — O(shards x counters)
total state regardless of stream cardinality, and each shard's state
row stays well inside the state store's per-key limits.

Scale: ``shards`` sets the parallelism of the stateful stage (state
keys = shards); size it to the cluster like any keyed-state operator.
The kernel is Arrow-batched pandas ``value_counts`` per micro-batch —
no per-row Python.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["mg_summary_stream"]


def mg_summary_stream(
    df: DataFrame, col: str, shards: int = 64, counters: int = 1024
) -> DataFrame:
    """Maintain per-shard Misra–Gries summaries of ``col`` across
    micro-batches; each batch emits every updated shard's current
    summary rows (shard, item, cnt, err). ``outputMode`` must be
    ``update`` — the latest emission per shard supersedes earlier ones.
    """
    if counters < 1:
        raise ValueError(f"counters must be >= 1, got {counters}")
    if shards < 1:
        # pmod(x, 0) is NULL in Spark: every row would silently funnel
        # through one null-keyed state entry — the exact hotspot the
        # shard design exists to prevent
        raise ValueError(f"shards must be >= 1, got {shards}")
    compact_at = 4 * counters
    items = df.select(
        F.col(col).cast("string").alias("item"),
        F.pmod(F.xxhash64(F.col(col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
    ).filter(F.col("item").isNotNull())

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            blob, err = state.get
            acc: dict[str, int] = json.loads(blob)
        else:
            acc, err = {}, 0
        for pdf in pdfs:
            for it, c in pdf["item"].value_counts().items():
                acc[it] = acc.get(it, 0) + int(c)
            if len(acc) > compact_at:
                # d = (counters+1)-th largest; keep v > d, subtract d
                d = sorted(acc.values(), reverse=True)[counters]
                acc = {k: v - d for k, v in acc.items() if v > d}
                err += d
        state.update((json.dumps(acc), err))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(acc),
                "item": list(acc.keys()),
                "cnt": [int(v) for v in acc.values()],
                "err": [err] * len(acc),
            }
        )

    return items.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType="shard int, item string, cnt long, err long",
        stateStructType="blob string, err long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
