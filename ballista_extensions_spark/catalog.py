"""Catalog & statistics — the Tier-C table-statistics surface
(SURVEY.md §2: proto/datafusion_common.proto:552-574 declares row count /
byte size / per-column min-max-null-distinct stats with exact-vs-inexact
precision; Spark's CBO gathers the same via ANALYZE TABLE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _q(identifier: str) -> str:
    """Backtick-quote a (possibly dotted) identifier: names needing
    quoting ('my-db.events', a column named 'order') would otherwise
    fail to parse — and an unquoted f-string interpolation would let a
    crafted name inject arbitrary SQL."""
    return ".".join(
        "`" + part.replace("`", "``") + "`" for part in identifier.split(".")
    )


def register_as_table(df: DataFrame, name: str) -> None:
    """Persist as a managed parquet table (stats need catalog tables)."""
    df.write.mode("overwrite").format("parquet").saveAsTable(name)


def analyze_table(
    spark: SparkSession, name: str, columns: list[str] | None = None
) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...] — feeds the
    cost-based optimizer (join reordering, broadcast decisions)."""
    if columns:
        cols = ", ".join(_q(c) for c in columns)
        spark.sql(
            f"ANALYZE TABLE {_q(name)} COMPUTE STATISTICS FOR COLUMNS {cols}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {_q(name)} COMPUTE STATISTICS")


def table_stats(spark: SparkSession, name: str) -> dict:
    """Extract the gathered stats (rowCount/sizeInBytes) — the engine-side
    equivalent of the proto's Statistics message."""
    rows = spark.sql(f"DESCRIBE EXTENDED {_q(name)}").collect()
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
    rows = spark.sql(f"DESCRIBE EXTENDED {_q(name)} {_q(column)}").collect()
    return {r.info_name: r.info_value for r in rows}


def declare_constraints(
    df: DataFrame,
    primary_key: list[str] | None = None,
    unique: list[list[str]] | None = None,
) -> DataFrame:
    """Attach PK/unique constraint declarations as column metadata.

    The reference wire format carries constraints (proto
    datafusion_common.proto:59-76) but no engine enforcement exists
    there; Spark likewise doesn't enforce — per SURVEY.md §1.2 the
    mapping is *metadata only*. Declarations survive schema round-trips
    and are readable by planners/tools via ``constraints_of``."""
    from pyspark.sql import functions as F

    pk = set(primary_key or [])
    uq = {c for grp in (unique or []) for c in grp}
    cols = []
    for field in df.schema.fields:
        meta = dict(field.metadata or {})
        if field.name in pk:
            meta["constraint"] = "primary_key"
        elif field.name in uq:
            meta["constraint"] = "unique"
        else:
            # a re-declaration REPLACES the constraint set: stale
            # markers on columns no longer declared must clear, or two
            # successive declarations leave two "primary keys"
            meta.pop("constraint", None)
        cols.append(F.col(field.name).alias(field.name, metadata=meta))
    return df.select(*cols)


def constraints_of(df: DataFrame) -> dict[str, str]:
    """Read back declared constraints: {column: 'primary_key'|'unique'}."""
    return {
        f.name: f.metadata["constraint"]
        for f in df.schema.fields
        if f.metadata and "constraint" in f.metadata
    }
