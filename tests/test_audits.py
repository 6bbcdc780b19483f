"""Contract-audit queries (VERDICT r7 directives #4 and #8): every
(check_name, passed) row must be TRUE at pytest's sf, mirroring the
driver's constant-oracle hash check at its sf."""

from __future__ import annotations

from pyspark.sql import functions as F


def _all_pass(df):
    rows = df.collect()
    failed = [r["check_name"] for r in rows if not r["passed"]]
    return rows, failed


def test_sample_contract_audit_all_pass(spark, sf_dir):
    from ballista_extensions_spark.queries.audits import (
        _SAMPLE_AUDIT_CHECKS,
        sample_contract_audit,
    )

    rows, failed = _all_pass(sample_contract_audit(spark, sf_dir))
    assert not failed, f"failed checks: {failed}"
    assert {r["check_name"] for r in rows} == set(_SAMPLE_AUDIT_CHECKS)


def test_sketch_contract_audit_all_pass(spark, sf_dir):
    from ballista_extensions_spark.queries.audits import (
        _SKETCH_AUDIT_CHECKS,
        sketch_contract_audit,
    )

    rows, failed = _all_pass(sketch_contract_audit(spark, sf_dir))
    assert not failed, f"failed checks: {failed}"
    assert {r["check_name"] for r in rows} == set(_SKETCH_AUDIT_CHECKS)


def test_sketch_measured_errors(spark, orders):
    """The raw relative errors behind sketch_contract_audit's booleans —
    measured, not asserted-from-docs (BASELINE.md records the sf0.1
    values). Bounds here are the audit's own thresholds."""
    est = orders.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("o_custkey", F.lit(12))
        ).cast("double").alias("est"),
        F.countDistinct("o_custkey").cast("double").alias("exact"),
    ).first()
    hll_rel = abs(est["est"] - est["exact"]) / est["exact"]
    assert hll_rel <= 0.049

    q = orders.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double(F.col("o_totalprice").cast("double")),
            F.lit(0.5),
        ).alias("q")
    ).first()["q"]
    n = orders.count()
    below = orders.filter(F.col("o_totalprice").cast("double") <= q).count()
    kll_rank_err = abs(below / n - 0.5)
    assert kll_rank_err <= 2 * 0.0165


def test_ann_contract_audit_all_pass(spark, sf_dir):
    from ballista_extensions_spark.queries.audits import (
        _ANN_AUDIT_CHECKS,
        ann_contract_audit,
    )

    rows, failed = _all_pass(ann_contract_audit(spark, sf_dir))
    assert not failed, f"failed checks: {failed}"
    assert {r["check_name"] for r in rows} == set(_ANN_AUDIT_CHECKS)


def test_dedup_probabilistic_audit_all_pass(spark, sf_dir):
    from ballista_extensions_spark.queries.audits import (
        _DEDUP_AUDIT_CHECKS,
        dedup_probabilistic_audit,
    )

    rows, failed = _all_pass(dedup_probabilistic_audit(spark, sf_dir))
    assert not failed, f"failed checks: {failed}"
    assert {r["check_name"] for r in rows} == set(_DEDUP_AUDIT_CHECKS)
