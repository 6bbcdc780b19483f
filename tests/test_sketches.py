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


def test_kll_merged_quantiles_rank_error(spark, sf_dir):
    """Merged KLL quantile estimates must land within 5% NORMALIZED RANK
    of the requested quantile (the sketch's contract is rank error, not
    value error)."""
    from ballista_extensions_spark.operators.sketches import (
        kll_quantile_rollup,
    )

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    _fine, coarse = kll_quantile_rollup(
        l,
        ["l_returnflag", "l_linestatus"],
        ["l_returnflag"],
        "l_extendedprice",
        [0.25, 0.5, 0.75],
    )
    rows = {r["l_returnflag"]: r for r in coarse.collect()}
    for flag, r in rows.items():
        vals = [
            x["l_extendedprice"]
            for x in l.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        ]
        vals.sort()
        n = len(vals)
        assert r["n_values"] == n
        for p, col in ((0.25, "q_0_25"), (0.5, "q_0_5"), (0.75, "q_0_75")):
            est = r[col]
            import bisect

            true_rank = bisect.bisect_right(vals, est) / n
            assert abs(true_rank - p) <= 0.05, (flag, p, est, true_rank)


def test_theta_overlap_matches_exact(spark, sf_dir):
    """Theta-sketch pairwise intersections within 5% of the exact
    distinct-set overlaps; containment ratio consistent."""
    from ballista_extensions_spark.operators.sketches import theta_overlap

    o = load_table(spark, sf_dir, "orders")
    got = {
        (r["g_a"], r["g_b"]): r for r in theta_overlap(
            o, "o_orderpriority", "o_custkey"
        ).collect()
    }
    sets = {
        r["o_orderpriority"]: set() for r in o.select("o_orderpriority").distinct().collect()
    }
    for r in o.select("o_orderpriority", "o_custkey").collect():
        sets[r["o_orderpriority"]].add(r["o_custkey"])
    assert len(got) == len(sets) * (len(sets) - 1) // 2
    for (ga, gb), r in got.items():
        exact = len(sets[ga] & sets[gb])
        assert exact > 0
        assert abs(r["n_overlap"] - exact) / exact <= 0.05, (ga, gb, r, exact)
        assert 0.0 <= r["containment"] <= 1.05
