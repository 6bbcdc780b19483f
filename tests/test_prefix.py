"""Distributed prefix aggregation: row-for-row parity with the global
window, determinism across runs, and the no-single-partition-window plan
contract (the whole point of the operator)."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window

from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.operators.prefix import (
    distributed_cumsum,
    distributed_row_number,
    ntile_from_rank,
)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        )
        .repartition(8)  # scramble so range partitioning has real work
        .localCheckpoint()
    )


ORDER = ["l_orderkey", "l_linenumber"]


def test_cumsum_matches_global_window(lineitem):
    got = distributed_cumsum(lineitem, ORDER, "v", out_col="cum")
    w = Window.orderBy(*ORDER).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = lineitem.withColumn("cum", F.sum("v").over(w))
    key = lambda r: (r["l_orderkey"], r["l_linenumber"])
    g = {key(r): r["cum"] for r in got.collect()}
    e = {key(r): r["cum"] for r in want.collect()}
    assert g == e


def test_row_number_matches_global_window(lineitem):
    got = distributed_row_number(lineitem, ORDER, out_col="rn")
    w = Window.orderBy(*ORDER)
    want = lineitem.withColumn("rn", F.row_number().over(w).cast("long"))
    key = lambda r: (r["l_orderkey"], r["l_linenumber"])
    g = {key(r): r["rn"] for r in got.collect()}
    e = {key(r): r["rn"] for r in want.collect()}
    assert g == e


def test_cumsum_deterministic_across_runs(lineitem):
    a = distributed_cumsum(lineitem, ORDER, "v", out_col="cum").collect()
    b = distributed_cumsum(lineitem, ORDER, "v", out_col="cum").collect()
    key = lambda r: (r["l_orderkey"], r["l_linenumber"])
    assert {key(r): r["cum"] for r in a} == {key(r): r["cum"] for r in b}


def test_no_unpartitioned_window_in_plan(lineitem):
    """The operator exists to avoid WindowExec's all-to-one path: every
    Window node in the physical plan must carry a partition spec."""
    df = distributed_cumsum(lineitem, ORDER, "v", out_col="cum")
    phys = df._jdf.queryExecution().executedPlan().toString()
    for line in phys.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__bx_pid" in line, line


def test_row_number_dense_and_total(lineitem):
    n = lineitem.count()
    got = distributed_row_number(lineitem, ORDER, out_col="rn")
    rns = [r["rn"] for r in got.select("rn").collect()]
    assert sorted(rns) == list(range(1, n + 1))


def test_cumsum_null_values_match_global_window(spark):
    """SUM OVER semantics for NULLs: NULL contributes nothing; a prefix
    that has seen only NULLs is NULL. Exercises the degenerate cases the
    offset machinery must survive: an all-NULL partition (total None) and
    a partition whose local prefix starts all-NULL."""
    rows = [(i, None if i % 3 == 0 or i < 20 else i * 10) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "k int, v long").repartition(7)
    got = distributed_cumsum(df, ["k"], "v", out_col="cum", num_partitions=5)
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    g = {r["k"]: r["cum"] for r in got.collect()}
    e = {r["k"]: r["cum"] for r in want.collect()}
    assert g == e


def test_cumsum_all_null_column(spark):
    df = spark.createDataFrame(
        [(i, None) for i in range(1, 50)], "k int, v long"
    ).repartition(4)
    got = distributed_cumsum(df, ["k"], "v", out_col="cum", num_partitions=3)
    assert all(r["cum"] is None for r in got.collect())


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (10, 4), (11, 4), (97, 4), (7, 3), (100, 7)])
def test_ntile_from_rank_matches_ntile(spark, n, k):
    """ntile_from_rank must reproduce NTILE(k) exactly, including the
    unequal fill when n % k != 0 and the degenerate n < k case."""
    df = spark.createDataFrame([(i,) for i in range(1, n + 1)], "rn long")
    got = {
        r["rn"]: r["t"]
        for r in df.withColumn("n_total", F.lit(n).cast("long"))
        .withColumn("t", ntile_from_rank("rn", "n_total", k))
        .collect()
    }
    w = Window.orderBy("rn")
    want = {
        r["rn"]: r["t"]
        for r in df.withColumn("t", F.ntile(k).over(w)).collect()
    }
    assert got == want


def test_percentile_disc_matches_sql(spark):
    """distributed_percentile_disc equals Spark's own percentile_disc
    (single-reducer path) on data with duplicates and odd sizes."""
    from ballista_extensions_spark.operators.prefix import (
        distributed_percentile_disc,
    )

    rows = [(i, float((i * 7) % 23)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "k int, v double").repartition(6)
    got = {
        r["prob"]: (r["v"], r["rank"], r["n"])
        for r in distributed_percentile_disc(
            df, "v", [0.25, 0.5, 0.75, 0.9, 0.999], tiebreak_cols=("k",)
        ).collect()
    }
    df.createOrReplaceTempView("bx_pctl_t")
    for p in (0.25, 0.5, 0.75, 0.9, 0.999):
        want = spark.sql(
            f"SELECT percentile_disc({p}) WITHIN GROUP (ORDER BY v) "
            "FROM bx_pctl_t"
        ).first()[0]
        assert got[p][0] == want, (p, got[p], want)
    assert got[0.25][2] == 100


def test_percentile_disc_empty_and_tiny(spark):
    from ballista_extensions_spark.operators.prefix import (
        distributed_percentile_disc,
    )

    empty = spark.createDataFrame([], "k int, v double")
    assert distributed_percentile_disc(empty, "v", [0.5]).count() == 0
    one = spark.createDataFrame([(1, 42.0)], "k int, v double")
    r = distributed_percentile_disc(one, "v", [0.25, 0.9]).collect()
    assert {(x["prob"], x["v"]) for x in r} == {(0.25, 42.0), (0.9, 42.0)}


def test_cumsum_respects_explicit_partitions(lineitem):
    got = distributed_cumsum(
        lineitem, ORDER, "v", out_col="cum", num_partitions=3
    )
    w = Window.orderBy(*ORDER).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = lineitem.withColumn("cum", F.sum("v").over(w))
    key = lambda r: (r["l_orderkey"], r["l_linenumber"])
    g = {key(r): r["cum"] for r in got.collect()}
    e = {key(r): r["cum"] for r in want.collect()}
    assert g == e
