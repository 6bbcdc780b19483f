"""File formats: CSV (full dialect options), Parquet, NDJSON, Avro,
Arrow IPC; compression codecs GZIP/BZIP2/XZ/ZSTD/none.

Reference surface: these formats *transit* the reference's codec layer by
delegation (SURVEY.md §2 Tier C — the repo itself only ever scans parquet,
examples/datafusion.rs:26). Spark provides csv/json/parquet natively;
avro uses the spark-avro module when on the classpath and otherwise
falls back to the spec-conformant pure-Python OCF codec in avro_py.py
(executor-side, one container file per partition); Arrow IPC is
distributed through ``mapInArrow`` (one .arrow part file per partition
on write, one task per file on read).

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
    :411-429). Explicit schema skips the inference pass.

    ``infer_max_records`` BOUNDS the inference scan for real: Spark CSV
    has no row-capped inference option (only samplingRatio), so the
    schema is inferred from a probe over the first N text lines and
    then pinned on the main reader — the full-data pass never infers.
    Caveats of the line-based probe: it assumes records are single-line
    (quoted embedded newlines in the first N records would truncate the
    probe's view, not the data), and for a DIRECTORY of part files it
    samples ~N lines in unspecified file order — Spark packs input
    files into splits largest-first, so ``spark.read.text(dir).limit(n)``
    is "some N records", not "the first N of the lexicographically
    first file". That is the right behavior for dialect/type inference
    over homogeneous part files (any N records are as representative as
    any other); a directory whose part files have HETEROGENEOUS schemas
    needs an explicit ``schema=``. xz-compressed inputs infer over the
    full decompressed text.
    """

    def _dialect(r):
        r = (
            r.option("header", header)
            .option("sep", delimiter)
            .option("quote", quote)
            .option("escape", escape)
            .option("nullValue", null_value)
        )
        if comment is not None:
            r = r.option("comment", comment)
        if timestamp_format is not None:
            r = r.option("timestampFormat", timestamp_format)
        return r

    reader = _dialect(spark.read.option("samplingRatio", 1.0))
    if schema is not None:
        reader = reader.schema(schema)
    elif _is_xz(path):
        reader = reader.option("inferSchema", True)
    else:
        n = int(infer_max_records) + (1 if header else 0)
        lines = spark.read.text(path).limit(n)
        inferred = (
            _dialect(spark.read.option("inferSchema", True))
            .csv(lines.rdd.map(lambda r: r[0]))
            .schema
        )
        reader = reader.schema(inferred)
    for k, v in options.items():
        reader = reader.option(k, v)
    if _is_xz(path):
        return reader.csv(read_text_xz(spark, path))
    return reader.csv(path)


def _is_xz(path: str) -> bool:
    """True when path is an .xz file or a directory of .xz part files
    (Hadoop's XZ codec is unavailable without native libs — these route
    through the executor-side lzma path)."""
    if path.endswith(".xz"):
        return True
    import glob as _glob

    return os.path.isdir(path) and bool(
        _glob.glob(os.path.join(path, "*.xz"))
    )


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
    if _is_xz(path):
        return reader.json(read_text_xz(spark, path))
    return reader.json(path)


def read_parquet_dir(spark: SparkSession, path: str, **options: Any) -> DataFrame:
    """Directory-of-parquet scan (the reference's only exercised source,
    examples/datafusion.rs:26): schema from footers, predicate pushdown,
    row-group pruning."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(path)


def read_text_xz(spark: SparkSession, path: str):
    """Executor-side XZ decode for line-oriented formats: Hadoop's XZ
    codec needs native libs absent from many deployments (this one
    included), but CPython ships ``lzma``. One task per .xz file —
    xz is non-splittable anyway, so this matches the parallelism Spark's
    own codec path would give. Returns an RDD[str] of lines for
    ``spark.read.csv/json(rdd)``."""
    import glob as _glob

    files = (
        sorted(_glob.glob(os.path.join(path, "*.xz")))
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"no .xz files under {path!r}")

    def _load(paths):
        import lzma

        for p in paths:
            with lzma.open(p, "rt", encoding="utf-8") as f:
                for line in f:
                    yield line.rstrip("\n")

    return spark.sparkContext.parallelize(files, len(files)).mapPartitions(_load)


def write_text_xz(df: DataFrame, path: str, fmt: str = "csv") -> int:
    """XZ write for csv/json: render lines executor-side with Spark's own
    writers-to-string (to_csv struct / to_json), then lzma-compress one
    .xz file per partition. CSV output carries a header per file (same as
    Spark's csv writer with header=true). Returns part-file count."""
    import glob as _glob

    os.makedirs(path, exist_ok=True)
    for old in _glob.glob(os.path.join(path, "*.xz")):
        os.remove(old)
    from pyspark.sql import functions as F

    header = ",".join(df.columns) if fmt == "csv" else None
    if fmt == "csv":
        lines = df.select(F.to_csv(F.struct(*df.columns)).alias("l"))
    elif fmt in ("json", "ndjson"):
        lines = df.select(F.to_json(F.struct(*df.columns)).alias("l"))
    else:
        raise ValueError("xz text write supports csv/json only")
    ext = "csv" if fmt == "csv" else "json"

    def _part(pid: int, rows):
        import lzma

        out = os.path.join(path, f"part-{pid:05d}.{ext}.xz")
        with lzma.open(out, "wt", encoding="utf-8") as f:
            if header is not None:
                f.write(header + "\n")
            for r in rows:
                f.write(r[0] + "\n")
        return iter([out])

    files = lines.rdd.mapPartitionsWithIndex(_part).collect()
    return len(files)


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
    """Arrow IPC (Feather V2) -> DataFrame, distributed.

    ``path`` is a single .arrow file or a directory written by
    ``write_arrow_ipc`` (one part file per partition + a zero-row
    ``_schema.arrow`` sidecar). The driver reads ONE footer for the
    schema (a metadata-only read); the data itself is read on executors
    — one task per file — via ``mapInArrow`` over the file list, so no
    table ever materializes on the driver. Files must be reachable from
    executors (shared FS / object store at cluster scale — same
    requirement as any Spark source)."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.ipc as ipc

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.arrow")))
        if not files:
            raise FileNotFoundError(f"no .arrow files under {path!r}")
    else:
        files = [path]
    with pa.memory_map(files[0], "r") as src:
        arrow_schema = ipc.open_file(src).schema
    from pyspark.sql.pandas.types import from_arrow_schema

    spark_schema = from_arrow_schema(arrow_schema)
    data_files = [f for f in files if os.path.basename(f) != "_schema.arrow"]
    if not data_files:
        return spark.createDataFrame([], spark_schema)
    paths = spark.createDataFrame(
        [(f,) for f in data_files], "p string"
    ).repartition(len(data_files), "p")

    def _read(batches):
        for b in batches:
            for p in b.column(0).to_pylist():
                with pa.memory_map(p, "r") as src:
                    rd = ipc.open_file(src)
                    for i in range(rd.num_record_batches):
                        yield rd.get_batch(i)

    return paths.mapInArrow(_read, spark_schema)


def write_arrow_ipc(df: DataFrame, path: str) -> int:
    """DataFrame -> directory of Arrow IPC files, one per partition,
    written BY THE EXECUTORS via ``mapInArrow`` — nothing materializes on
    the driver (the old ``toPandas`` bridge was a driver-OOM scale
    killer). A zero-row ``_schema.arrow`` sidecar (written driver-side
    from the plan schema alone) makes empty frames round-trippable.
    Returns the number of part files written. Overwrite semantics: any
    existing .arrow files under ``path`` are removed first."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.ipc as ipc
    from pyspark.sql.pandas.types import to_arrow_schema

    os.makedirs(path, exist_ok=True)
    for old in _glob.glob(os.path.join(path, "*.arrow")):
        os.remove(old)
    arrow_schema = to_arrow_schema(df.schema)
    with ipc.new_file(os.path.join(path, "_schema.arrow"), arrow_schema):
        pass

    out_schema = pa.schema([("file", pa.string()), ("rows", pa.int64())])

    def _write(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = os.path.join(path, f"part-{pid:05d}.arrow")
        writer = None
        n = 0
        for b in batches:
            if writer is None:
                writer = ipc.new_file(out, b.schema)
            writer.write_batch(b)
            n += b.num_rows
        if writer is not None:
            writer.close()
            yield pa.RecordBatch.from_pydict(
                {"file": [out], "rows": [n]}, schema=out_schema
            )

    written = df.mapInArrow(_write, "file string, rows long").collect()
    return len(written)


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
        if avro_supported(spark):
            return spark.read.format("avro").load(path)
        # no spark-avro jar in this deployment: fall back to the
        # spec-conformant pure-Python OCF codec (sources/avro_py.py)
        from ballista_extensions_spark.sources.avro_py import read_avro

        return read_avro(spark, path)
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
    if compression == "xz":
        if fmt not in ("csv", "json", "ndjson"):
            raise ValueError("xz compression is supported for csv/json here")
        write_text_xz(df, path, fmt)
        return
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    # ALWAYS set the codec: parquet's default is snappy, so skipping the
    # option for compression='none' would silently write snappy when the
    # caller explicitly asked for uncompressed (parquet accepts "none").
    writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt in ("json", "ndjson"):
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "avro":
        if avro_supported(df.sparkSession):
            writer.format("avro").save(path)
        else:
            from ballista_extensions_spark.sources.avro_py import write_avro

            # Avro's own codec enum: none -> null, gzip family -> deflate
            codec = {"none": "null", "gzip": "deflate"}.get(compression)
            if codec is None:
                raise ValueError(
                    f"avro bridge supports none/gzip(deflate), not {compression!r}"
                )
            write_avro(df, path, codec=codec)
    else:
        raise ValueError(f"unknown format {fmt!r}")
