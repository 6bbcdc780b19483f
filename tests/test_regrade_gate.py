"""The plan-fingerprint regrade gate (tools/plan_fingerprint.py):
round-6's manual discipline — remove a query from PRIOR_DRIVER_GRADED
whenever its implementation changes — enforced mechanically."""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_extensions_spark.queries import registry
from tools.plan_fingerprint import drifted_graded_names


def _some_graded_name() -> str:
    """A deterministic currently-graded name with a recorded stable
    fingerprint — rotation-proof (round 8 taught us not to hardcode a
    name that the next rotation removes from PRIOR_DRIVER_GRADED)."""
    from tools.plan_fingerprint import UNSTABLE, load_recorded

    recorded = load_recorded()
    candidates = sorted(
        n
        for n in registry.PRIOR_DRIVER_GRADED
        if recorded.get(n) not in (None, UNSTABLE)
    )
    assert candidates, "no graded name with a recorded fingerprint"
    return candidates[0]


def test_gate_green_at_head(spark):
    """Every query still marked driver-graded must plan exactly as it
    did when its grade was recorded. A failure here means an
    implementation changed without the name being removed from
    PRIOR_DRIVER_GRADED for re-grading — fix the rotation, never the
    fingerprint file alone."""
    assert drifted_graded_names(spark) == []


def test_gate_red_on_missing_fingerprint(spark, monkeypatch):
    """A graded name with NO recorded fingerprint (rotation forgot
    `plan_fingerprint.py record`) must be flagged, not silently
    skipped — that is the gate's own blind spot."""
    import tools.plan_fingerprint as pf

    name = _some_graded_name()
    recorded = {k: v for k, v in pf.load_recorded().items() if k != name}
    monkeypatch.setattr(pf, "load_recorded", lambda: recorded)
    assert name in pf.drifted_graded_names(spark, names={name})


def test_gate_red_on_injected_change(spark):
    """Injecting a behavior change into a graded query must trip the
    gate."""
    name = _some_graded_name()
    orig = registry.QUERIES[name]
    registry.QUERIES[name] = lambda s, d: orig(s, d).filter(
        F.lit(True)
    ).limit(3)
    try:
        assert name in drifted_graded_names(spark, names={name})
    finally:
        registry.QUERIES[name] = orig


def test_fixed_evidence_tier_names_are_registered():
    """Every name in the bench cost-tier classification must be a
    registered query — a renamed replay/audit must not silently fall
    back to the per_row tier."""
    unknown = registry.FIXED_EVIDENCE - set(registry.QUERIES)
    assert not unknown, f"FIXED_EVIDENCE names not registered: {sorted(unknown)}"
    # the classifier is total over the registry
    for name in registry.QUERIES:
        assert registry.query_tier(name) in ("fixed_evidence", "per_row")
    # spot-check both tiers
    assert registry.query_tier("streaming_sigstore_replay") == "fixed_evidence"
    assert registry.query_tier("q1_pricing_summary") == "per_row"
