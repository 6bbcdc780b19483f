"""Type-surface fixtures (SURVEY.md §1.2): the reference's wire format
declares the full Arrow type system; this test scans an alltypes-style
parquet (FIXTURES.md §2 shape) plus nested list/struct/map columns and
asserts the documented Spark mappings."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def alltypes_path(spark, tmp_path_factory):
    """Reproduce the Impala 'alltypes' fixture shape (FIXTURES.md §2:
    8 rows = 4 months x 2; even ids all-zero/true, odd ids the
    (1, 10, 1.1, 10.1, false) pattern) plus nested types."""
    rows = []
    for month in range(1, 5):
        for j, rid in enumerate((2 * (month - 1), 2 * (month - 1) + 1)):
            odd = rid % 2 == 1
            rows.append(
                Row(
                    id=rid,
                    bool_col=not odd,
                    tinyint_col=1 if odd else 0,
                    smallint_col=1 if odd else 0,
                    int_col=1 if odd else 0,
                    bigint_col=10 if odd else 0,
                    float_col=1.1 if odd else 0.0,
                    double_col=10.1 if odd else 0.0,
                    date_string_col=f"0{month}/01/09".encode(),
                    string_col=str(int(odd)).encode(),
                    timestamp_col=datetime.datetime(2009, month, 1, 0, int(odd)),
                    arr_col=[1, 2, 3],
                    struct_col=Row(x=1, y="s"),
                    map_col={"k": 1},
                    dec_col=None,
                )
            )
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("bool_col", T.BooleanType()),
            T.StructField("tinyint_col", T.ByteType()),
            T.StructField("smallint_col", T.ShortType()),
            T.StructField("int_col", T.IntegerType()),
            T.StructField("bigint_col", T.LongType()),
            T.StructField("float_col", T.FloatType()),
            T.StructField("double_col", T.DoubleType()),
            T.StructField("date_string_col", T.BinaryType()),
            T.StructField("string_col", T.BinaryType()),
            T.StructField("timestamp_col", T.TimestampType()),
            T.StructField("arr_col", T.ArrayType(T.IntegerType())),
            T.StructField(
                "struct_col",
                T.StructType(
                    [T.StructField("x", T.IntegerType()), T.StructField("y", T.StringType())]
                ),
            ),
            T.StructField("map_col", T.MapType(T.StringType(), T.IntegerType())),
            T.StructField("dec_col", T.DecimalType(20, 4)),
        ]
    )
    path = str(tmp_path_factory.mktemp("alltypes") / "part_0.parquet")
    spark.createDataFrame(rows, schema).write.parquet(path)
    return path


def test_alltypes_scan_roundtrip(spark, alltypes_path):
    df = spark.read.parquet(alltypes_path)
    assert df.count() == 8
    by_name = {f.name: f.dataType for f in df.schema.fields}
    # §1.2 mappings survive the parquet round-trip
    assert isinstance(by_name["bool_col"], T.BooleanType)
    assert isinstance(by_name["tinyint_col"], T.ByteType)
    assert isinstance(by_name["smallint_col"], T.ShortType)
    assert isinstance(by_name["bigint_col"], T.LongType)
    assert isinstance(by_name["float_col"], T.FloatType)
    assert isinstance(by_name["date_string_col"], T.BinaryType)
    assert isinstance(by_name["timestamp_col"], T.TimestampType)
    assert isinstance(by_name["arr_col"], T.ArrayType)
    assert isinstance(by_name["struct_col"], T.StructType)
    assert isinstance(by_name["map_col"], T.MapType)
    assert by_name["dec_col"] == T.DecimalType(20, 4)


def test_alltypes_row_pattern(spark, alltypes_path):
    df = spark.read.parquet(alltypes_path)
    odd = df.filter(F.col("id") % 2 == 1)
    assert odd.filter(~F.col("bool_col")).count() == 4
    assert odd.agg(F.sum("bigint_col")).collect()[0][0] == 40
    # binary cols are string-coercible (FIXTURES.md note)
    decoded = df.select(F.decode("string_col", "UTF-8").alias("s")).collect()
    assert {r.s for r in decoded} == {"0", "1"}


def test_nested_ops_through_scan(spark, alltypes_path):
    df = spark.read.parquet(alltypes_path)
    got = df.select(
        F.element_at("arr_col", 2).alias("a2"),
        F.col("struct_col.y").alias("sy"),
        F.element_at("map_col", "k").alias("mk"),
    ).first()
    assert (got.a2, got.sy, got.mk) == (2, "s", 1)


def test_ns_timestamp_handling(spark, sf_dir):
    """TIMESTAMP(NANOS) parquet (events.ts) reads via io.load_table with
    exact ns->µs truncation (§1.2 'ns truncates to µs')."""
    from ballista_extensions_spark.io import load_table

    e = load_table(spark, sf_dir, "events")
    assert isinstance(e.schema["ts"].dataType, T.TimestampType)
    assert e.filter(F.col("ts").isNull()).count() == 0


@pytest.fixture(scope="module")
def edge_types_dir(tmp_path_factory):
    """Parquet fixtures for the documented-lossy §1.2 mappings, written
    with pyarrow (Spark can't author these types itself)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_types")
    pq.write_table(
        pa.table(
            {
                "u8": pa.array([0, 255], pa.uint8()),
                "u16": pa.array([0, 65535], pa.uint16()),
                "u32": pa.array([0, 2**32 - 1], pa.uint32()),
                "u64": pa.array([0, 2**64 - 1], pa.uint64()),
            }
        ),
        str(d / "unsigned.parquet"),
    )
    pq.write_table(
        pa.table({"d256": pa.array([1], pa.decimal256(50, 2))}),
        str(d / "decimal256.parquet"),
    )
    pq.write_table(
        pa.table(
            {"t64": pa.array([datetime.time(1, 2, 3, 123456)], pa.time64("us"))}
        ),
        str(d / "time64.parquet"),
    )
    pq.write_table(
        pa.table(
            {"t32": pa.array([datetime.time(1, 2, 3)], pa.time32("ms"))}
        ),
        str(d / "time32.parquet"),
    )
    return d


def test_unsigned_widening(spark, edge_types_dir):
    """§1.2: unsigned ints widen to the next signed type that holds the
    full range; UINT64 (no wider long) becomes Decimal(20,0). Values at
    the unsigned max must survive exactly."""
    df = spark.read.parquet(str(edge_types_dir / "unsigned.parquet"))
    by_name = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(by_name["u8"], T.ShortType)
    assert isinstance(by_name["u16"], T.IntegerType)
    assert isinstance(by_name["u32"], T.LongType)
    assert by_name["u64"] == T.DecimalType(20, 0)
    mx = df.agg(
        F.max("u8"), F.max("u16"), F.max("u32"), F.max("u64")
    ).first()
    assert (mx[0], mx[1], mx[2], int(mx[3])) == (
        255, 65535, 2**32 - 1, 2**64 - 1,
    )


def test_decimal256_rejected(spark, edge_types_dir):
    """§1.2: precision > 38 (Arrow Decimal256 territory) is REJECTED at
    scan time with DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION — a documented
    hard boundary, not silent truncation."""
    with pytest.raises(Exception, match="DECIMAL_PRECISION_EXCEEDS_MAX"):
        spark.read.parquet(str(edge_types_dir / "decimal256.parquet")).collect()


def test_time_types_rejected(spark, edge_types_dir):
    """§1.2: Spark has no TIME type; TIME(MILLIS)/TIME(MICROS) parquet
    columns fail loudly with PARQUET_TYPE_ILLEGAL (documented: carry
    times as int64 µs-since-midnight instead)."""
    for f in ("time32.parquet", "time64.parquet"):
        with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL"):
            spark.read.parquet(str(edge_types_dir / f)).collect()
