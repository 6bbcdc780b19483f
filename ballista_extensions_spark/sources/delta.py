"""Delta table read — parity stub for the reference's sibling showcase
``ballista_delta`` (Delta table read support for Ballista; referenced by
README.md:13 of the reference repo, not contained in it).

Spark reads Delta via the delta-spark package (`format("delta")`); this
container ships neither the JVM jars nor the python bindings, so the
reader is gated: it detects availability and raises a documented
NotImplementedError otherwise (same policy as Avro in formats.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_supported(spark: SparkSession) -> bool:
    """True when the delta-spark data source is on the classpath."""
    try:
        spark.read.format("delta").load("/nonexistent-delta-probe")
    except Exception as e:  # noqa: BLE001 — classify by message
        msg = str(e)
        if "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            return False
        return True  # source resolved; path error means delta exists
    return True


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table (optionally time-traveling to a version)."""
    if not delta_supported(spark):
        raise NotImplementedError(
            "delta-spark is not installed in this deployment; Delta read "
            "support mirrors the reference's ballista_delta sibling "
            "showcase and activates when the package is present"
        )
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", version)
    return reader.load(path)
