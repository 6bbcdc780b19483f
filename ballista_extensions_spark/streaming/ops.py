"""Structured Streaming operators — the streaming twins of the batch ops.

The reference has no streaming surface (SURVEY.md §2 'explicit
non-inventory'); these are part of our §7 extensions: an events pipeline
at 100 TB is a stream first and a table second. Each op takes a streaming
DataFrame (readStream source) and returns a transformed streaming
DataFrame; sinks are the caller's choice (tests use the memory sink).

Scale notes: watermarks bound state (late rows beyond the watermark are
dropped); tumbling windows aggregate with partial aggregation per
micro-batch; session windows use Spark's native session_window (state
store backed, watermark-expired)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(
    events: DataFrame,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """Streaming twin of queries/relational.py:events_hourly_rollup:
    watermarked tumbling-window counts/sums per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming gap-sessionization with Spark's native session_window —
    the stateful-operator counterpart of the batch events_sessionize
    query (which uses lag/cumsum). State per (user, open session) only;
    watermark closes and emits sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def view_purchase_join_stream(
    events: DataFrame,
    within_minutes: int = 10,
    watermark: str = "20 minutes",
) -> DataFrame:
    """Stream-stream interval join: each 'purchase' matched to the same
    user's preceding 'view' events within N minutes (attribution join).

    Both sides carry watermarks and the join has a two-sided time bound,
    so state is evicted once the watermark passes view_ts + N — bounded
    state, the requirement for an unbounded-runtime join at scale."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")
        )
    )
    return views.join(purchases, cond).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
        "value",
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    dropDuplicatesWithinWatermark bounds state (the unbounded-state
    dropDuplicates is a 100 TB anti-pattern)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (batch) dimension table — the canonical lookup-enrichment pattern.

    Scale: Spark plans stream-static joins with the static side as the
    build side; a broadcast-sized dim means zero shuffle of the stream.
    The static side is re-read per micro-batch, so point it at a compact
    table (or cache it) rather than a raw 100 TB fact path. No watermark
    needed — stream-static joins are stateless."""
    return events.join(dim, key, how)
