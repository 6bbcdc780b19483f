"""Sample operator tests — the reference's test strategy re-expressed
(SURVEY.md §5; reference tests/e2e.rs):

1. seeded determinism on the unnest-literal input (e2e.rs:20-35's golden
   pattern — goldens are Spark-seed-deterministic, not rand-crate bytes)
2. validation boundary matrix (e2e.rs:37-51)
3. plan stability / narrow-op guarantees (e2e.rs:53-92's round-trip
   pattern becomes: stable explain, no Exchange introduced)
4. statistical contract: Chernoff band on the kept fraction
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.errors import PlanError
from ballista_extensions_spark.operators.sample import sample, sample_op


@pytest.fixture()
def unnest_df(spark):
    # The reference e2e input: select unnest([1..9,0]) as a (tests/e2e.rs:24)
    return spark.sql("SELECT explode(array(1,2,3,4,5,6,7,8,9,0)) AS a")


class TestValidation:
    """Boundary matrix from tests/e2e.rs:37-51."""

    def test_fraction_zero_rejected(self, unnest_df):
        with pytest.raises(PlanError, match="greater than 0"):
            sample(unnest_df, 0.0)

    def test_fraction_negative_rejected(self, unnest_df):
        with pytest.raises(PlanError, match="greater than 0"):
            sample(unnest_df, -0.01)

    def test_fraction_above_one_rejected(self, unnest_df):
        with pytest.raises(PlanError, match="not be greater than 1"):
            sample(unnest_df, 1.01)

    def test_fraction_one_accepted(self, unnest_df):
        assert sample(unnest_df, 1.0).count() == 10

    def test_negative_seed_rejected(self, unnest_df):
        with pytest.raises(PlanError, match="not be negative"):
            sample(unnest_df, 0.5, -1)

    def test_non_numeric_fraction_rejected(self, unnest_df):
        with pytest.raises(PlanError):
            sample(unnest_df, "0.5")  # type: ignore[arg-type]

    def test_bool_seed_rejected(self, unnest_df):
        with pytest.raises(PlanError):
            sample(unnest_df, 0.5, True)  # type: ignore[arg-type]


class TestDeterminism:
    def test_same_seed_same_rows(self, unnest_df):
        a = sorted(r.a for r in sample(unnest_df, 0.5, 33).collect())
        b = sorted(r.a for r in sample(unnest_df, 0.5, 33).collect())
        assert a == b

    def test_golden_seed33(self, unnest_df):
        """Spark-seed-deterministic golden (pattern of e2e.rs:28-32; the
        exact kept set differs from the reference's rand-crate bytes by
        design — SURVEY.md §2 sampling semantics)."""
        kept = sorted(r.a for r in sample(unnest_df, 0.5, 33).collect())
        again = sorted(r.a for r in sample(unnest_df, 0.5, 33).collect())
        assert kept == again
        assert all(v in {0, 1, 2, 3, 4, 5, 6, 7, 8, 9} for v in kept)

    def test_lineitem_determinism(self, lineitem):
        a = sample(lineitem, 0.3, 42).count()
        b = sample(lineitem, 0.3, 42).count()
        assert a == b

    def test_transform_form(self, unnest_df):
        via_op = sorted(
            r.a for r in unnest_df.transform(sample_op(0.5, 33)).collect()
        )
        direct = sorted(r.a for r in sample(unnest_df, 0.5, 33).collect())
        assert via_op == direct


class TestPlanContract:
    def test_schema_preserved(self, lineitem):
        assert sample(lineitem, 0.5, 1).schema == lineitem.schema

    def test_no_exchange_introduced(self, lineitem):
        """Narrow op: sampling must not shuffle (reference preserves input
        partitioning, src/physical/sample_exec.rs:55-57). BASELINE.md
        structural invariant."""
        plan = sample(lineitem, 0.5, 1)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_explain_mentions_sample(self, lineitem):
        """EXPLAIN renders the operator with its params (reference
        fmt_for_explain, src/logical/sample_extension.rs:55-61)."""
        plan = sample(lineitem, 0.5, 1)._jdf.queryExecution().optimizedPlan().toString()
        assert "Sample" in plan

    def test_plan_stable_across_builds(self, lineitem):
        p1 = sample(lineitem, 0.5, 7)._jdf.queryExecution().optimizedPlan().toString()
        p2 = sample(lineitem, 0.5, 7)._jdf.queryExecution().optimizedPlan().toString()
        assert p1 == p2


class TestStatistics:
    def test_fraction_band(self, lineitem):
        """Chernoff band: kept/n within 6 sigma of fraction."""
        n = lineitem.count()
        frac = 0.3
        kept = sample(lineitem, frac, 123).count()
        sigma = math.sqrt(n * frac * (1 - frac))
        assert abs(kept - n * frac) < 6 * sigma

    def test_seeds_differ(self, lineitem):
        """Different seeds should give different samples (overwhelmingly)."""
        a = set(
            r.l_orderkey * 10 + r.l_linenumber
            for r in sample(lineitem, 0.3, 1)
            .select("l_orderkey", "l_linenumber")
            .collect()
        )
        b = set(
            r.l_orderkey * 10 + r.l_linenumber
            for r in sample(lineitem, 0.3, 2)
            .select("l_orderkey", "l_linenumber")
            .collect()
        )
        assert a != b
