"""Source/sink round-trips: CSV dialects, NDJSON, parquet partitioning,
Arrow IPC, compression codecs; Avro gated on classpath presence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.sources import (
    avro_supported,
    read_any,
    write_any,
)


@pytest.fixture(scope="module")
def small_df(spark):
    return spark.createDataFrame(
        [(1, "a,comma", 1.5), (2, 'b"quote', -2.0), (3, None, 0.0)],
        ["id", "s", "v"],
    )


def _roundtrip(spark, df, fmt, path, **kw):
    write_any(df, fmt, path, **kw)
    back = read_any(spark, fmt, path)
    assert back.count() == df.count()
    return back


def test_csv_roundtrip_dialect(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csv") / "data")
    back = _roundtrip(spark, small_df, "csv", path)
    got = {r.id: r.s for r in back.collect()}
    assert got[1] == "a,comma"
    assert got[2] == 'b"quote'


def test_csv_custom_delimiter(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("csv2")
    p = d / "t.csv"
    p.write_text("id|name\n1|x\n2|y\n# trailer\n")
    df = read_any(spark, "csv", str(p), delimiter="|", comment="#")
    rows = {r.id: r.name for r in df.collect()}
    assert rows == {1: "x", 2: "y"}


def test_ndjson_roundtrip(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("json") / "data")
    back = _roundtrip(spark, small_df, "json", path)
    assert set(back.columns) == {"id", "s", "v"}


def test_parquet_partitioned_pruning(spark, sf_dir, tmp_path_factory):
    from ballista_extensions_spark.io import load_table

    path = str(tmp_path_factory.mktemp("pq") / "orders")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    write_any(o, "parquet", path, partition_by=["status"])
    back = read_any(spark, "parquet", path).filter(F.col("status") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the status predicate must land in PartitionFilters
    assert "PartitionFilters: [" in plan
    assert back.count() > 0


@pytest.mark.parametrize("codec", ["gzip", "bzip2", "none"])
def test_csv_compression(spark, small_df, tmp_path_factory, codec):
    """Text-codec coverage (proto GZIP/BZIP2; XZ/ZSTD need Hadoop-native
    libs absent from this container — documented gap)."""
    path = str(tmp_path_factory.mktemp(f"c_{codec}") / "data")
    write_any(small_df, "csv", path, compression=codec)
    assert read_any(spark, "csv", path).count() == 3


def test_parquet_zstd(spark, small_df, tmp_path_factory):
    """ZSTD via parquet's own codec (independent of Hadoop natives)."""
    path = str(tmp_path_factory.mktemp("c_pq_zstd") / "data")
    write_any(small_df, "parquet", path, compression="zstd")
    assert read_any(spark, "parquet", path).count() == 3


def test_arrow_ipc_roundtrip(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("arrow") / "t.arrow")
    write_any(small_df.fillna({"s": ""}), "arrow", path)
    back = read_any(spark, "arrow", path)
    assert back.count() == 3
    assert set(back.columns) == {"id", "s", "v"}


def test_avro_gated(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("avro") / "data")
    if avro_supported(spark):
        write_any(small_df, "avro", path)
        assert read_any(spark, "avro", path).count() == 3
    else:
        with pytest.raises(NotImplementedError, match="avro"):
            read_any(spark, "avro", path)


def test_bad_compression_rejected(small_df):
    with pytest.raises(ValueError, match="compression"):
        write_any(small_df, "csv", "/tmp/never", compression="snappy7")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown format"):
        read_any(spark, "orc2", "/tmp/never")
