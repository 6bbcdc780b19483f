"""2-D skyline (Pareto frontier) — non-dominated points at scale.

A point dominates another when it is no worse in both dimensions and
strictly better in one. The naive skyline is the quadratic NOT EXISTS
self-join — unusable beyond toy sizes. In 2-D the frontier has a
monotone structure that turns it into a LINEAR scan: group to one
(minimize_value, best_maximize) row per minimize level, order by the
minimize dimension, and a level is on the frontier iff its best
maximize value strictly exceeds every earlier level's — an exclusive
prefix-max, which :func:`..prefix.distributed_cummax` computes with
range partitioning + O(partitions) driver offsets instead of a
single-task global window.

Scale: one hash shuffle for the per-level reduction (map-side
combined), one range shuffle for the prefix — both on the reduced
frame (distinct minimize levels, never raw rows). No all-pairs
comparison anywhere; the SQL oracle CAN use the quadratic NOT EXISTS
form precisely because the driver only checks small SFs.

Reference scope: no skyline surface in the reference wire format
(SURVEY.md §2); this belongs to the §7 analytics mandate (price/
quality frontiers over corpus or catalog tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballista_extensions_spark.operators.prefix import distributed_cummax

__all__ = ["skyline_2d"]


def skyline_2d(
    df: DataFrame, minimize_col: str, maximize_col: str
) -> DataFrame:
    """Frontier points of (``minimize_col`` low, ``maximize_col`` high):
    one row per non-dominated (minimize value, best maximize value)
    pair, columns ``(<minimize_col>, <maximize_col>)``. Rows with NULL
    (or, for float/double dimensions, NaN) in either dimension are
    excluded — dominance is undefined on both, and an unfiltered NaN
    would become a level's MAX (Spark orders NaN greatest) and then
    suppress every later frontier level, since ``x > NaN`` is false.
    """
    from pyspark.sql.types import DoubleType, FloatType

    keep = F.col(minimize_col).isNotNull() & F.col(maximize_col).isNotNull()
    for c in (minimize_col, maximize_col):
        if isinstance(df.schema[c].dataType, (DoubleType, FloatType)):
            keep = keep & ~F.isnan(F.col(c))
    per = (
        df.filter(keep)
        .groupBy(minimize_col)
        .agg(F.max(maximize_col).alias(maximize_col))
    )
    pref = distributed_cummax(
        per,
        [minimize_col],
        maximize_col,
        out_col="__bx_prev",
        inclusive=False,
    )
    return pref.filter(
        F.col("__bx_prev").isNull()
        | (F.col(maximize_col) > F.col("__bx_prev"))
    ).drop("__bx_prev")
