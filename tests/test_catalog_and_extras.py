"""Tests: catalog statistics, delta gating, stratified sampling, HLL
sketch bounds, fluent DataFrame extension installation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.catalog import (
    analyze_table,
    column_stats,
    register_as_table,
    table_stats,
)
from ballista_extensions_spark.errors import PlanError
from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.operators.sample import (
    install_dataframe_extensions,
    sample_by,
)
from ballista_extensions_spark.sources.delta import delta_supported, read_delta


def test_table_statistics_cycle(spark, sf_dir):
    """Tier-C statistics surface: ANALYZE gathers row/byte counts and
    per-column min/max (proto :552-574 equivalents)."""
    c = load_table(spark, sf_dir, "customer")
    register_as_table(c, "bx_stats_customer")
    try:
        analyze_table(spark, "bx_stats_customer", ["c_custkey", "c_acctbal"])
        stats = table_stats(spark, "bx_stats_customer")
        assert stats["row_count"] == c.count()
        assert stats["size_bytes"] > 0
        cs = column_stats(spark, "bx_stats_customer", "c_custkey")
        assert int(cs["distinct_count"]) > 0
        assert cs["min"] is not None and cs["max"] is not None
    finally:
        spark.sql("DROP TABLE IF EXISTS bx_stats_customer")


def test_delta_gated(spark):
    if delta_supported(spark):
        pytest.skip("delta available in this deployment")
    with pytest.raises(NotImplementedError, match="delta"):
        read_delta(spark, "/tmp/never-a-delta-table")


class TestSampleBy:
    def test_validation(self, spark, sf_dir):
        c = load_table(spark, sf_dir, "customer")
        with pytest.raises(PlanError, match="at least one"):
            sample_by(c, "c_mktsegment", {})
        with pytest.raises(PlanError, match="must be in"):
            sample_by(c, "c_mktsegment", {"BUILDING": 1.2})
        with pytest.raises(PlanError, match="negative"):
            sample_by(c, "c_mktsegment", {"BUILDING": 0.5}, seed=-3)

    def test_strata_fractions(self, spark, sf_dir):
        c = load_table(spark, sf_dir, "customer")
        frac = {"BUILDING": 0.5, "MACHINERY": 0.2}
        got = sample_by(c, "c_mktsegment", frac, seed=1)
        counts = {
            r.c_mktsegment: r.n
            for r in got.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
        }
        base = {
            r.c_mktsegment: r.n
            for r in c.groupBy("c_mktsegment").agg(F.count("*").alias("n")).collect()
        }
        # unlisted strata are dropped entirely
        assert set(counts) <= set(frac)
        for k, f in frac.items():
            n, kept = base[k], counts.get(k, 0)
            sigma = math.sqrt(n * f * (1 - f))
            assert abs(kept - n * f) < 6 * sigma + 1

    def test_deterministic(self, spark, sf_dir):
        c = load_table(spark, sf_dir, "customer")
        a = sorted(r.c_custkey for r in sample_by(c, "c_mktsegment", {"BUILDING": 0.4}, 9).collect())
        b = sorted(r.c_custkey for r in sample_by(c, "c_mktsegment", {"BUILDING": 0.4}, 9).collect())
        assert a == b


def test_sketch_error_bound(spark, sf_dir):
    from ballista_extensions_spark.queries import get_queries

    rows = get_queries()["sketch_distinct_users"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.1, f"{r.event_type}: {rel_err}"


def test_fluent_extension_injection(spark, sf_dir):
    """The reference's DataFrameExt trait pattern as monkey-patched
    methods (SURVEY.md §2 Tier D)."""
    install_dataframe_extensions()
    l = load_table(spark, sf_dir, "lineitem")
    assert l.bx_sample(1.0).count() == l.count()
    with pytest.raises(PlanError):
        l.bx_sample(1.5)
    got = l.bx_sample(0.3, 5).count()
    assert got == l.bx_sample(0.3, 5).count()


def test_table_cache_invalidation(spark, sf_dir):
    """invalidate_table_cache drops scan handles so in-place rewrites
    are picked up on the next load (io.py documents the immutable-input
    assumption; this is the escape hatch)."""
    from ballista_extensions_spark import io as bio

    a = bio.load_table(spark, sf_dir, "nation")
    assert bio.load_table(spark, sf_dir, "nation") is a
    bio.invalidate_table_cache(sf_dir)
    b = bio.load_table(spark, sf_dir, "nation")
    assert b is not a
    bio.invalidate_table_cache()
    assert bio.load_table(spark, sf_dir, "nation") is not b
