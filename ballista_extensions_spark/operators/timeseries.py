"""Time-bucket gapfill + interpolation — the hypertable-style rollup.

Time-series rollups over event streams have holes: buckets with no
events simply don't appear in a GROUP BY, which breaks charts,
window-over-time math, and downstream joins that assume a dense time
axis. The TimescaleDB/InfluxDB answer is ``time_bucket_gapfill`` +
``locf()``; Spark has neither built in. This operator composes them
from DataFrame primitives:

1. bucket event time with ``date_trunc`` and aggregate per
   (series, bucket) — one shuffle, map-side partial agg;
2. build the dense per-series spine with
   ``sequence(min_bucket, max_bucket, interval)`` + ``explode`` — no
   shuffle beyond the tiny per-series bounds agg;
3. left-join the aggregate onto the spine on (series, bucket) — Spark
   co-partitions both sides on the same keys;
4. fill: zero-fill count-like columns with ``coalesce``; carry
   last-observation-forward (LOCF) with ``last(col, ignorenulls=True)``
   over a window PARTITIONED BY the series — never an unpartitioned
   global window.

Scale: every stage is keyed by the series, so parallelism is the series
cardinality; the spine explode is bounded by buckets-per-series (hours
over a decade ~ 90k rows — fine per task). A single series spanning the
whole retention window is the unit of work by definition, same as any
per-entity timeline operator. For bucket counts beyond ~1M per series,
split the spine by year first (documented, not needed at this scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["time_bucket_gapfill"]

_BUCKETS = {"hour": "1 hour", "day": "1 day", "week": "7 day",
            "minute": "1 minute", "month": None, "year": None}


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    series_cols: list[str],
    aggs: list[Column],
    bucket: str = "hour",
    zero_cols: list[str] | None = None,
    locf_cols: list[str] | None = None,
    bucket_alias: str = "bucket",
) -> DataFrame:
    """Dense per-series time buckets from ``min`` to ``max`` observed
    bucket, with per-column fill policy.

    ``aggs`` are aggregate Columns (already aliased) applied per
    (series, bucket). ``zero_cols`` are coalesced to 0 on gap rows
    (count/sum semantics); ``locf_cols`` carry the last non-null value
    forward (gauge semantics). Columns in neither list stay NULL on gap
    rows. ``bucket`` must be a fixed-width unit (hour/day/week/minute) —
    calendar units (month/year) need a date-arithmetic spine and are
    rejected explicitly rather than silently misbucketed.
    """
    step = _BUCKETS.get(bucket)
    if step is None:
        raise ValueError(
            f"bucket {bucket!r} is not a fixed-width unit; "
            f"supported: {[b for b, s in _BUCKETS.items() if s]}"
        )
    b = F.date_trunc(bucket, F.col(ts_col)).alias("__bucket")
    per = df.groupBy(*series_cols, b).agg(*aggs)
    bounds = per.groupBy(*series_cols).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    spine = bounds.select(
        *series_cols,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {step}"))
        ).alias("__bucket"),
    )
    out = spine.join(per, on=[*series_cols, "__bucket"], how="left")
    for c in zero_cols or []:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if locf_cols:
        w = (
            Window.partitionBy(*series_cols)
            .orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in locf_cols:
            out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out.withColumnRenamed("__bucket", bucket_alias)
