"""Mergeable HLL sketch rollups: error bound vs exact distinct counts,
and the persist-then-merge contract that justifies the pattern."""

from __future__ import annotations

import pyspark.sql.functions as F

from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.operators.sketches import hll_rollup


def test_rollup_estimates_within_bound(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").alias("order_year"),
        "o_custkey",
    )
    fine, coarse = hll_rollup(
        o, ["o_orderpriority", "order_year"], ["o_orderpriority"], "o_custkey"
    )
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    got = {r["o_orderpriority"]: r["est_distinct"] for r in coarse.collect()}
    assert set(got) == set(exact)
    for k, est in got.items():
        # lg_k=12 -> ~1.6% relative standard error; 5% is >3 sigma
        assert abs(est - exact[k]) / exact[k] <= 0.05, (k, est, exact[k])


def test_sketches_survive_parquet_roundtrip(spark, sf_dir, tmp_path):
    """The production claim: fine sketches persist as binary columns and
    later rollups union the STORED sketches — the estimate after a
    write/read round-trip equals the estimate from live sketches."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").alias("order_year"),
        "o_custkey",
    )
    fine, coarse = hll_rollup(
        o, ["o_orderpriority", "order_year"], ["o_orderpriority"], "o_custkey"
    )
    live = {r["o_orderpriority"]: r["est_distinct"] for r in coarse.collect()}
    path = str(tmp_path / "sketches")
    fine.select("o_orderpriority", "order_year", "sketch").write.parquet(path)
    stored = (
        spark.read.parquet(path)
        .groupBy("o_orderpriority")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias("est"))
    )
    got = {r["o_orderpriority"]: r["est"] for r in stored.collect()}
    assert got == live


def test_rollup_rejects_bad_keys(spark, sf_dir):
    import pytest

    o = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="subset"):
        hll_rollup(o, ["o_orderpriority"], ["o_orderstatus"], "o_custkey")
