"""Grouped ordinary least squares — closed-form, exact-parity trends.

Per-group trend fitting ("is this segment's revenue growing?") is a
one-pass closed form, not an ML job: with sufficient statistics
``n, Σx, Σy, Σxy, Σx²`` per group,

    slope     = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
    intercept = (Σy − slope·Σx) / n

Spark 4 ships ``regr_slope``/``regr_intercept``, but they accumulate in
doubles, so the result depends on partition-merge order — unusable for
this repo's bit-exact oracle discipline AND genuinely nondeterministic
run-to-run at scale. Here the five sufficient statistics are summed as
DECIMAL (associative/commutative — any shuffle order gives identical
digits; the same trick as functions/exact.py), each CAST to double
once, and the closed form evaluated in doubles in a fixed operation
order. A SQL oracle computing the identical expression tree gets the
identical IEEE result, bit for bit.

Reference scope note: no regression surface in the reference's wire
format (SURVEY.md §2) — this belongs to the §7 analytics mandate, and
the exactness discipline is this repo's oracle-parity contract.

Scale: one map-side-combined aggregation (the only shuffle), group
cardinality rows out. Decimal headroom: with x bounded (|x| <= B) and
Σ|y| <= S at DECIMAL(38, s), the n·Σxy product needs n·B·S < 10^(38−s)
— for year-index regressors (B < 10²) that holds far past 100 TB row
counts; ANSI mode fails loudly, never silently wraps, if exceeded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["group_ols"]


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    x_dec: str = "decimal(10,0)",
    y_dec: str = "decimal(18,6)",
) -> DataFrame:
    """Per-group OLS fit of ``y ~ x``.

    ``x`` and ``y`` are cast to ``x_dec`` / ``y_dec`` before summation,
    so pass integral or fixed-point expressions (a year index, a
    price). The defaults keep the x·y product at DECIMAL(29,6) —
    inside precision 38 in BOTH Spark and the oracle engine, so the
    product is exact, never scale-truncated (two precision-38 operands
    would force lossy downscaling in Spark and a bind error in DuckDB).
    Rows where either is NULL are excluded (the regr_* contract).

    Returns ``group_cols + (n, slope, intercept)``; slope/intercept are
    NULL for degenerate groups (constant x or a single point).
    """
    xd = x.cast(x_dec).alias("__x")
    yd = y.cast(y_dec).alias("__y")
    pairs = df.select(*group_cols, xd, yd).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    stats = pairs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__x").cast("double").alias("__sx"),
        F.sum("__y").cast("double").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).cast("double").alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).cast("double").alias("__sxx"),
    )
    num = F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = F.when(den != 0, num / den)
    return stats.select(
        *group_cols,
        F.col("__n").cast("long").alias("n"),
        slope.alias("slope"),
        F.when(
            den != 0,
            (F.col("__sy") - slope * F.col("__sx")) / F.col("__n"),
        ).alias("intercept"),
    )
