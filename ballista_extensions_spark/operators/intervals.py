"""Interval concurrency — the distributed sweep line.

"How many orders were open on each day?" / "peak concurrent sessions"
is an interval-overlap aggregation: each row contributes +1 over
``[start, end)`` and the answer is the running sum of boundary deltas
in time order. The naive SQL — ``SUM(delta) OVER (ORDER BY t)`` — is
exactly the unpartitioned global window this repo bans on fact-scale
data (every boundary row through one task).

This operator keeps the classic sweep line but swaps the global window
for :func:`~ballista_extensions_spark.operators.prefix.distributed_cumsum`
(range partition by time -> per-partition running sums -> O(partitions)
driver offsets broadcast back):

1. emit ``(start, +1)`` and ``(end, -1)`` per interval — narrow, no
   shuffle;
2. collapse deltas per distinct boundary timestamp — ONE keyed shuffle,
   map-side combined, output bounded by distinct boundaries;
3. distributed prefix-sum the deltas in time order — integer math, so
   parity with a SQL oracle is exact by construction.

The result is the full concurrency step function: ``concurrent`` holds
on ``[t, next boundary)``. Peak concurrency, percent-of-time-above-N,
or per-window maxima are ordinary aggregates over it.

End semantics are half-open (``end`` exclusive): an interval ending at
``t`` and one starting at ``t`` do NOT overlap. Callers wanting
inclusive ends add one unit to ``end`` upstream (the registry query
does exactly that for day-granular order intervals).

NULL starts/ends are rejected loudly rather than silently dropped — an
open-ended interval (NULL end = "still open") is a different query,
and a sweep line that quietly ignores it undercounts forever after.

Reference scope note: the reference's wire surface (SURVEY.md §2)
declares no interval/window operators; this module extends the engine
the way its extension planner pattern intends — a new operator built
from the platform's primitives (here operators/prefix.py's distributed
prefix sums instead of a custom physical node).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ballista_extensions_spark.operators.prefix import distributed_cumsum

__all__ = ["interval_concurrency"]


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    weight: Column | None = None,
    out_col: str = "concurrent",
) -> DataFrame:
    """Concurrency step function of ``[start_col, end_col)`` intervals.

    Returns one row per distinct boundary time ``t`` with the net
    ``delta`` at that instant and ``out_col`` = number of intervals
    covering ``[t, next boundary)``. ``weight`` (default 1 per
    interval) must be integral for exact-parity guarantees.
    """
    w = F.lit(1) if weight is None else weight
    starts = df.select(
        F.col(start_col).alias("t"), w.cast("long").alias("d")
    )
    ends = df.select(F.col(end_col).alias("t"), (-w).cast("long").alias("d"))
    per_t = starts.unionAll(ends).groupBy("t").agg(
        F.sum("d").alias("delta")
    )
    out = distributed_cumsum(per_t, ["t"], "delta", out_col=out_col)
    # NULL-boundary check AFTER the group-by: groupBy keeps NULL as its
    # own group, so probing the result costs one tiny job over the
    # distinct-boundary frame (already materialized inside the prefix
    # operator) instead of a second full scan of the input.
    if out.filter(F.col("t").isNull()).limit(1).count():
        raise ValueError(
            f"NULL boundary in {start_col!r}/{end_col!r}; open-ended "
            "intervals must be closed (or filtered) before the sweep"
        )
    return out
