"""Plan inspection — the engine's EXPLAIN contract (SURVEY.md §2 Tier D).

The reference requires every operator to render its parameters in plan
output (fmt_for_explain, src/logical/sample_extension.rs:55-61) and
proves plan round-trip stability (tests/e2e.rs:53-92). The Spark-native
form of that contract: operators must produce *stable* plans whose scale
posture is *checkable* — these helpers extract the facts our tests and
scale reviews assert on (exchange count, pushed filters, read schema,
broadcast vs shuffle joins, codegen coverage)."""

from ballista_extensions_spark.plans.inspect import (
    executed_plan,
    optimized_plan,
    shuffle_exchanges,
    pushed_filters,
    read_columns,
    join_strategies,
    codegen_stage_count,
    plan_summary,
    assert_no_exchange,
    assert_plan_stable,
)

__all__ = [
    "executed_plan",
    "optimized_plan",
    "shuffle_exchanges",
    "pushed_filters",
    "read_columns",
    "join_strategies",
    "codegen_stage_count",
    "plan_summary",
    "assert_no_exchange",
    "assert_plan_stable",
]
