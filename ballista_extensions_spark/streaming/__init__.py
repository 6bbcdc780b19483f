"""Structured Streaming operators (streaming twins of the batch ops)."""

from ballista_extensions_spark.streaming.ops import (
    hourly_rollup_stream,
    sessionize_stream,
    dedup_stream,
    enrich_stream,
    view_purchase_join_stream,
)
from ballista_extensions_spark.streaming.frequent import mg_summary_stream
from ballista_extensions_spark.streaming.gapfill import locf_gapfill_stream

__all__ = [
    "hourly_rollup_stream",
    "sessionize_stream",
    "dedup_stream",
    "enrich_stream",
    "view_purchase_join_stream",
    "mg_summary_stream",
    "locf_gapfill_stream",
]
