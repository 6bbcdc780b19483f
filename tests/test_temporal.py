"""As-of and range join unit tests on constructed timelines."""

from __future__ import annotations

import datetime as dt

import pytest

from ballista_extensions_spark.operators.temporal import asof_join, range_join_pairs


def _t(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _t(0), 100.0),
            ("A", _t(5), 101.0),
            ("A", _t(10), 102.0),
            ("B", _t(7), 50.0),
        ],
        ["sym", "ts", "px"],
    )
    trades = spark.createDataFrame(
        [
            ("A", _t(3), 1),    # after quote@0
            ("A", _t(5), 2),    # exactly at quote@5 -> matches it
            ("A", _t(20), 3),   # after quote@10
            ("B", _t(1), 4),    # before any B quote -> NULL
            ("C", _t(9), 5),    # key with no right rows -> NULL
        ],
        ["sym", "ts", "trade_id"],
    )
    return quotes, trades


def test_asof_backward_semantics(quotes_trades):
    quotes, trades = quotes_trades
    out = {
        r.trade_id: (r.px_matched, r.ts_matched)
        for r in asof_join(trades, quotes, by="sym").collect()
    }
    assert out[1] == (100.0, _t(0))
    assert out[2] == (101.0, _t(5))      # equal timestamps match
    assert out[3] == (102.0, _t(10))
    assert out[4] == (None, None)        # no prior quote
    assert out[5] == (None, None)        # unseen key


def test_asof_preserves_left_rowcount(spark, sf_dir):
    from ballista_extensions_spark.io import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    right = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    assert asof_join(left, right, by="user_id").count() == left.count()


def test_range_join_matches_naive(spark, sf_dir):
    """Banded decomposition equals the naive inequality join."""
    from ballista_extensions_spark.io import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "events").limit(2000)
    banded = {
        (r.id_a, r.id_b)
        for r in range_join_pairs(e, by="user_id", within_seconds=120).collect()
    }
    a = e.select(
        F.col("user_id"), F.col("event_id").alias("id_a"),
        F.unix_micros("ts").alias("us_a"),
    )
    b = e.select(
        F.col("user_id"), F.col("event_id").alias("id_b"),
        F.unix_micros("ts").alias("us_b"),
    )
    naive = {
        (r.id_a, r.id_b)
        for r in a.join(b, "user_id")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= 120 * 1_000_000)
        )
        .collect()
    }
    assert banded == naive


def test_range_join_no_self_pairs(spark, sf_dir):
    from ballista_extensions_spark.io import load_table

    e = load_table(spark, sf_dir, "events").limit(500)
    for r in range_join_pairs(e, by="user_id", within_seconds=3600).collect():
        assert r.id_a < r.id_b
