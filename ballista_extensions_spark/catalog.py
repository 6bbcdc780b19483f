"""Catalog & statistics — the Tier-C table-statistics surface
(SURVEY.md §2: proto/datafusion_common.proto:552-574 declares row count /
byte size / per-column min-max-null-distinct stats with exact-vs-inexact
precision; Spark's CBO gathers the same via ANALYZE TABLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_as_table(df: DataFrame, name: str) -> None:
    """Persist as a managed parquet table (stats need catalog tables)."""
    df.write.mode("overwrite").format("parquet").saveAsTable(name)


def analyze_table(
    spark: SparkSession, name: str, columns: list[str] | None = None
) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...] — feeds the
    cost-based optimizer (join reordering, broadcast decisions)."""
    if columns:
        spark.sql(
            f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")


def table_stats(spark: SparkSession, name: str) -> dict:
    """Extract the gathered stats (rowCount/sizeInBytes) — the engine-side
    equivalent of the proto's Statistics message."""
    rows = spark.sql(f"DESCRIBE EXTENDED {name}").collect()
    out: dict = {}
    for r in rows:
        if r.col_name == "Statistics":
            # e.g. "12345 bytes, 1500 rows"
            for part in r.data_type.split(","):
                part = part.strip()
                if part.endswith("bytes"):
                    out["size_bytes"] = int(part.split()[0])
                elif part.endswith("rows"):
                    out["row_count"] = int(part.split()[0])
    return out


def column_stats(spark: SparkSession, name: str, column: str) -> dict:
    """Per-column stats (min/max/null count/distinct estimate) after
    ANALYZE ... FOR COLUMNS — proto fields :560-574."""
    rows = spark.sql(f"DESCRIBE EXTENDED {name} {column}").collect()
    return {r.info_name: r.info_value for r in rows}
