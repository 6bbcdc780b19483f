"""Round-6 operators: exact heavy hitters (Misra–Gries two-phase),
time-bucket gapfill + LOCF, bloom-filter join pruning.

Each operator is checked against the naive DataFrame formulation on the
same data (the registry oracle repeats the check against DuckDB), plus
the structural claims that make it the scale path: bounded summaries,
no unpartitioned windows, a strictly smaller pre-join frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.functions.bloom import (
    bloom_build,
    bloom_filtered_join,
    bloom_prefilter,
)
from ballista_extensions_spark.operators.frequent import (
    exact_top_k,
    mg_partition_summaries,
)
from ballista_extensions_spark.operators.timeseries import time_bucket_gapfill


# ---------------------------------------------------------------- frequent

def _naive_topk(df, col, k):
    return (
        df.select(F.col(col).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("item"))
        .limit(k)
    )


def test_exact_top_k_matches_naive_on_tokens(spark, documents):
    toks = documents.select(
        F.explode(F.split("text", r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    got = exact_top_k(toks, "tok", k=25, counters=512).collect()
    want = _naive_topk(toks, "tok", 25).collect()
    assert [(r["item"], r["cnt"]) for r in got] == [
        (r["item"], r["cnt"]) for r in want
    ]


def test_exact_top_k_tiny_counters_still_exact(spark):
    # Zipf-ish synthetic: value v repeated (101 - v) times, v in 1..100.
    df = spark.range(1, 101).select(
        F.explode(F.sequence(F.lit(1), F.lit(101) - F.col("id"))).alias("rep"),
        F.col("id").alias("v"),
    ).repartition(16)
    got = exact_top_k(df, "v", k=5, counters=8).collect()
    # top-5 by count: v=1 (100x) .. v=5 (96x)
    assert [(r["item"], r["cnt"]) for r in got] == [
        ("1", 100), ("2", 99), ("3", 98), ("4", 97), ("5", 96)
    ]


def test_mg_summaries_bounded_and_error_rows(spark):
    df = spark.range(0, 20000).select(
        (F.col("id") % 3000).cast("string").alias("v")
    ).repartition(8)
    summ = mg_partition_summaries(df, "v", counters=64).collect()
    err_rows = [r for r in summ if r["item"] is None]
    kept = [r for r in summ if r["item"] is not None]
    assert len(err_rows) == 8  # one per partition
    # each partition keeps at most the compaction ceiling of items
    assert len(kept) <= 8 * 4 * 64
    # lower bounds never exceed true counts (true count per key ~ 6-7)
    assert all(r["cnt"] <= 7 for r in kept)


def test_exact_top_k_empty_input(spark):
    df = spark.range(0).select(F.col("id").cast("string").alias("v"))
    assert exact_top_k(df, "v", k=3).collect() == []


# -------------------------------------------------------------- timeseries

def test_gapfill_dense_zero_and_locf(spark):
    rows = [
        ("a", "2024-01-01 00:10:00", 10.0),
        ("a", "2024-01-01 03:20:00", 30.0),
        ("b", "2024-01-01 01:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "s string, ts string, v double").select(
        "s", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = time_bucket_gapfill(
        df,
        ts_col="ts",
        series_cols=["s"],
        aggs=[
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("v").alias("gauge"),
        ],
        bucket="hour",
        zero_cols=["n"],
        locf_cols=["gauge"],
    )
    got = {
        (r["s"], str(r["bucket"])): (r["n"], r["gauge"])
        for r in out.collect()
    }
    # series a spans 4 hourly buckets: 00,01,02,03 — gaps zero/LOCF-filled
    assert got[("a", "2024-01-01 00:00:00")] == (1, 10.0)
    assert got[("a", "2024-01-01 01:00:00")] == (0, 10.0)
    assert got[("a", "2024-01-01 02:00:00")] == (0, 10.0)
    assert got[("a", "2024-01-01 03:00:00")] == (1, 30.0)
    # series b: single bucket, no gap rows
    assert got[("b", "2024-01-01 01:00:00")] == (1, 5.0)
    assert len(got) == 5


def test_gapfill_rejects_calendar_buckets(spark):
    df = spark.range(1).select(F.current_timestamp().alias("ts"))
    with pytest.raises(ValueError, match="fixed-width"):
        time_bucket_gapfill(
            df, "ts", [], [F.count(F.lit(1)).alias("n")], bucket="month"
        )


def test_gapfill_windows_are_partitioned(spark, sf_dir):
    from ballista_extensions_spark.queries import get_queries

    df = get_queries()["events_gapfill_hourly"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "No Partition Defined" not in plan


# -------------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_and_prunes(spark):
    big = spark.range(0, 50000).select(F.col("id").alias("k"))
    small = spark.range(0, 100).select((F.col("id") * 7).alias("k"))
    bloom = bloom_build(small, "k", num_bits=1 << 14, num_hashes=3)
    kept = bloom_prefilter(big, bloom, "k", num_bits=1 << 14, num_hashes=3)
    kept_keys = {r["k"] for r in kept.collect()}
    true_keys = {r["k"] for r in small.collect()}
    assert true_keys <= kept_keys  # no false negatives, ever
    # and the prune actually prunes (fpp at this sizing is << 1%)
    assert len(kept_keys) < 1000


def test_bloom_filtered_join_equals_plain_join(spark, lineitem, sf_dir):
    from ballista_extensions_spark.io import load_table

    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 3)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    got = (
        bloom_filtered_join(
            lineitem.select("l_orderkey", "l_linenumber", "l_suppkey"),
            supp,
            key="l_suppkey",
            how="left_semi",
        )
        .orderBy("l_orderkey", "l_linenumber")
        .collect()
    )
    want = (
        lineitem.select("l_orderkey", "l_linenumber", "l_suppkey")
        .join(supp, on="l_suppkey", how="left_semi")
        .orderBy("l_orderkey", "l_linenumber")
        .collect()
    )
    assert got == want


def test_bloom_rejects_outer_how(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="unmatched"):
        bloom_filtered_join(df, df, key="k", how="left")


def test_bloom_rejects_bad_bits(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(df, "k", num_bits=100)
