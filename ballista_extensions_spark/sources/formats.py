"""File formats: CSV (full dialect options), Parquet, NDJSON, Avro,
Arrow IPC; compression codecs GZIP/BZIP2/XZ/ZSTD/none.

Reference surface: these formats *transit* the reference's codec layer by
delegation (SURVEY.md §2 Tier C — the repo itself only ever scans parquet,
examples/datafusion.rs:26). Spark provides csv/json/parquet natively and
avro via the bundled spark-avro module when present; Arrow IPC goes
through the pyarrow bridge (Arrow is also Spark's interchange format at
the pandas boundary).

Scale notes: CSV/JSON scans parallelize by file split (gz is
non-splittable — prefer zstd/bzip2 or many files at 100 TB); schema
inference costs one extra pass, so production readers should pass an
explicit schema — every reader here accepts one.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: compression option values accepted by Spark writers, mirroring the
#: proto's CompressionTypeVariant (:372-378)
COMPRESSIONS = ("none", "gzip", "bzip2", "xz", "zstd")


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    *,
    header: bool = True,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = "\\",
    comment: str | None = None,
    null_value: str = "",
    timestamp_format: str | None = None,
    infer_max_records: int = 1000,
    **options: Any,
) -> DataFrame:
    """CSV with the dialect knobs CsvOptions declares (delimiter/quote/
    escape/comment/null/timestamp_format/schema_infer_max_rec — proto
    :411-429). Explicit schema skips the inference pass."""
    reader = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("quote", quote)
        .option("escape", escape)
        .option("nullValue", null_value)
        .option("samplingRatio", 1.0)
    )
    if comment is not None:
        reader = reader.option("comment", comment)
    if timestamp_format is not None:
        reader = reader.option("timestampFormat", timestamp_format)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True).option(
            "maxRowsForSchemaInference", infer_max_records
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: Any,
) -> DataFrame:
    """Newline-delimited JSON (NdJsonFormat, proto :54-56)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_parquet_dir(spark: SparkSession, path: str, **options: Any) -> DataFrame:
    """Directory-of-parquet scan (the reference's only exercised source,
    examples/datafusion.rs:26): schema from footers, predicate pushdown,
    row-group pruning."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(path)


def avro_supported(spark: SparkSession) -> bool:
    """True when the spark-avro module is on the classpath. Core pyspark
    distributions may omit it; callers must gate (AvroFormat is declared
    by the reference wire format but never exercised there either)."""
    try:
        spark.read.format("avro").load(os.devnull)
    except Exception as e:  # noqa: BLE001 — classify by message
        msg = str(e)
        if "Failed to find" in msg and "avro" in msg.lower():
            return False
        # any other error (e.g. empty/invalid file) means the source exists
        return True
    return True


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC (Feather V2) file -> DataFrame via the pyarrow bridge.
    Arrow is Spark's pandas-interchange format, so the conversion is
    zero-copy batches -> Arrow -> Spark. Driver-side read: intended for
    small reference tables; large IPC data should be converted to parquet
    (documented limitation, matching the reference where ArrowFormat is
    transit-only)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    with pa.memory_map(path, "r") as source:
        table = ipc.open_file(source).read_all()
    return spark.createDataFrame(table.to_pandas())


def write_arrow_ipc(df: DataFrame, path: str) -> None:
    """DataFrame -> Arrow IPC file (driver-side; small results)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    table = pa.Table.from_pandas(df.toPandas())
    with ipc.new_file(path, table.schema) as writer:
        writer.write_table(table)


_READERS = {
    "csv": read_csv,
    "json": read_ndjson,
    "ndjson": read_ndjson,
    "parquet": read_parquet_dir,
    "arrow": read_arrow_ipc,
}


def read_any(
    spark: SparkSession, fmt: str, path: str, **kwargs: Any
) -> DataFrame:
    """Dispatch by format name (csv/json/ndjson/parquet/arrow/avro)."""
    fmt = fmt.lower()
    if fmt == "avro":
        if not avro_supported(spark):
            raise NotImplementedError(
                "spark-avro module not on the classpath in this deployment; "
                "AvroFormat is wire-declared but optional (SURVEY.md §2 Tier C)"
            )
        return spark.read.format("avro").load(path)
    if fmt not in _READERS:
        raise ValueError(f"unknown format {fmt!r}")
    return _READERS[fmt](spark, path, **kwargs)


def write_any(
    df: DataFrame,
    fmt: str,
    path: str,
    *,
    mode: str = "overwrite",
    compression: str = "none",
    partition_by: list[str] | None = None,
    **options: Any,
) -> None:
    """Write with explicit compression (COMPRESSIONS mirrors the proto's
    codec enum) and optional partitioning — partitioned layout is what
    enables partition pruning on later scans (100 TB posture: partition
    fact tables by date-like keys; avoid high-cardinality partition
    columns)."""
    fmt = fmt.lower()
    if compression not in COMPRESSIONS:
        raise ValueError(f"compression must be one of {COMPRESSIONS}")
    if fmt == "arrow":
        write_arrow_ipc(df, path)
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression != "none" or fmt != "parquet":
        writer = writer.option(
            "compression", compression if compression != "none" else "none"
        )
    for k, v in options.items():
        writer = writer.option(k, v)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt in ("json", "ndjson"):
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "avro":
        writer.format("avro").save(path)
    else:
        raise ValueError(f"unknown format {fmt!r}")
