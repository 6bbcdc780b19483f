"""Bernoulli ``sample`` — the reference's one custom operator, Spark-first.

Reference implementation (all cites relative to /root/reference):
- API + validation: src/dataframe/sample.rs:11-52 — ``sample(fraction: f32,
  seed: Option<i64>)``; rejects fraction <= 0.0 (:28-32), fraction > 1.0,
  and negative seed (:34-38).
- Logical node: src/logical/sample_extension.rs:12-77 — schema passthrough,
  no expressions, EXPLAIN text "Sample: fraction: .., seed: ..".
- Physical node: src/physical/sample_exec.rs:19-122 — per-partition
  Bernoulli keep (uniform draw < fraction per row, :104-106), vectorized
  filter (:108-112), input partitioning/ordering preserved (:55-57).

Spark mapping: Catalyst has a native ``Sample`` logical operator surfaced
as ``DataFrame.sample(withReplacement=False, fraction, seed)`` — the same
Bernoulli-without-replacement semantics, executed inside whole-stage
codegen. What stock PySpark does NOT reproduce is the reference's stricter
validation (PySpark silently accepts fraction > 1), so this wrapper
pre-validates exactly like src/dataframe/sample.rs:28-38 and tests/
e2e.rs:37-51 demand.

Semantics notes (SURVEY.md §2):
- Narrow op: no shuffle; partitioning and ordering of the input are
  preserved (assert: no Exchange appears in the plan below Sample).
- Deterministic given (plan, fraction, seed). Spark seeds per-partition as
  ``seed + partitionIndex``; the reference seeds every partition with the
  same value (src/physical/sample_exec.rs:94-97). Both are deterministic;
  exact kept-row sets are RNG-stream-specific and NOT part of the contract
  (the reference's golden rows encode the Rust rand crate's stream).
- 100 TB posture: O(n) single pass, no materialization — cost is one
  uniform draw per row inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ballista_extensions_spark.errors import PlanError


def sample(df: DataFrame, fraction: float, seed: int | None = None) -> DataFrame:
    """Bernoulli row sample without replacement.

    Validation is reference-exact (src/dataframe/sample.rs:28-38, proven by
    tests/e2e.rs:44-48): fraction must be in (0.0, 1.0]; seed, if given,
    must be non-negative.
    """
    if not isinstance(fraction, (int, float)) or isinstance(fraction, bool):
        raise PlanError(f"sample fraction must be a number, got {fraction!r}")
    if fraction <= 0.0:
        raise PlanError(
            f"invalid fraction {fraction}: fraction should be greater than 0"
        )
    if fraction > 1.0:
        raise PlanError(
            f"invalid fraction {fraction}: fraction should not be greater than 1"
        )
    if seed is not None:
        if not isinstance(seed, int) or isinstance(seed, bool):
            raise PlanError(f"sample seed must be an int, got {seed!r}")
        if seed < 0:
            raise PlanError(f"invalid seed {seed}: seed should not be negative")
    return df.sample(withReplacement=False, fraction=float(fraction), seed=seed)


def sample_op(fraction: float, seed: int | None = None):
    """Curried form for ``df.transform(sample_op(0.3, 42))`` — the
    ``df.transform``-friendly equivalent of the reference's fluent trait
    method injection (src/dataframe/sample.rs:11-13)."""

    def _apply(df: DataFrame) -> DataFrame:
        return sample(df, fraction, seed)

    return _apply


def sample_by(
    df: DataFrame,
    key: str,
    fractions: dict,
    seed: int | None = None,
) -> DataFrame:
    """Stratified Bernoulli sampling: per-key fractions (the natural
    extension of the reference's single-fraction operator). Same
    validation contract applied to every fraction; missing keys default
    to fraction 0 (dropped), matching ``DataFrame.sampleBy``."""
    if not fractions:
        raise PlanError("sample_by requires at least one key fraction")
    for k, frac in fractions.items():
        if not isinstance(frac, (int, float)) or isinstance(frac, bool):
            raise PlanError(f"fraction for key {k!r} must be a number")
        if frac < 0.0 or frac > 1.0:
            # sampleBy permits 0 (drop stratum) — only >1 and <0 invalid
            raise PlanError(
                f"invalid fraction {frac} for key {k!r}: must be in [0, 1]"
            )
    if seed is not None:
        if not isinstance(seed, int) or isinstance(seed, bool):
            raise PlanError(f"sample seed must be an int, got {seed!r}")
        if seed < 0:
            raise PlanError(f"invalid seed {seed}: seed should not be negative")
    return df.sampleBy(key, {k: float(v) for k, v in fractions.items()}, seed=seed)


def install_dataframe_extensions() -> None:
    """Monkey-patch the operators onto ``DataFrame`` as fluent methods —
    the literal Spark equivalent of the reference's ``DataFrameExt``
    trait injection (src/dataframe/sample.rs:11-26): after calling this,
    ``df.bx_sample(0.3, 42)`` and ``df.bx_sample_by(...)`` work exactly
    like the module functions. Namespaced with the ``bx_`` prefix so no
    stock PySpark API is shadowed."""
    DataFrame.bx_sample = sample
    DataFrame.bx_sample_by = sample_by
