"""SparkSession factory with pinned configs.

Spark-side equivalent of the reference's session wiring: the Ballista
scheduler installs a session builder with extension planner + codecs
(reference examples/ballista_scheduler.rs:27-56, examples/datafusion.rs:18-25).
In Spark nothing needs injecting — our operators compose Catalyst built-ins —
so the factory only pins configs that matter for correctness and scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "ballista_extensions_spark") -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Local test/bench mode uses ``local[$SPARK_GRAFT_CPUS]`` (default 32
    threads). On a real cluster the same configs apply; AQE re-plans
    shuffles at runtime (partition coalescing + skew-join splitting), and
    the broadcast threshold keeps dimension joins shuffle-free.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        # One shuffle partition per core locally; a real cluster would use
        # 2-3x total cores — AQE coalesces either way.
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the pandas-UDF boundary (similarity / multimodal ops).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep timestamp semantics stable across engines (oracle parity).
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no ns type —
        # read as long and convert in io.load_table (µs truncation, same
        # as DuckDB's ns->µs narrowing).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ANSI off: TPC-H-ish doubles; we validate explicitly in operators.
        .config("spark.sql.ansi.enabled", "false")
        # Local mode: the driver JVM is also the executor, so it holds
        # every localCheckpoint block of every concurrently-live frame
        # plus broadcast build memory. 16g of the box's 128 GiB is the
        # honest local sizing; on a real cluster blocks live on
        # executors and the driver needs far less.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    return builder.getOrCreate()
