"""Plan-fact extraction from Spark query executions.

Works on the physical plan string (the same artifact `explain` prints);
string-level extraction keeps us off private JVM APIs while asserting
the properties that matter at 100 TB: where the shuffles are, what
reached the scan, which joins broadcast.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Full formatted physical plan (same text as df.explain('formatted');
    plain toString() truncates node lines, losing ReadSchema/PushedFilters)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def shuffle_exchanges(df: DataFrame) -> int:
    """Count of shuffle (non-broadcast) exchanges in the executed plan
    (formatted mode lists each node once as '(n) Exchange')."""
    return len(re.findall(r"\(\d+\) Exchange\b", executed_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_columns(df: DataFrame) -> list[list[str]]:
    """Columns actually read by each scan (ReadSchema) — column-pruning
    evidence."""
    plan = executed_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Physical join operator histogram (BroadcastHashJoin /
    SortMergeJoin / ShuffledHashJoin / BroadcastNestedLoopJoin)."""
    plan = executed_plan(df)
    out = {}
    for op in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        n = plan.count(op)
        if n:
            out[op] = n
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen span count — wider spans mean more of the
    query runs as generated JVM loops. EXECUTES the query (collect):
    AQE wraps stages in codegen only at runtime, and the execution must
    happen on this DataFrame's own QueryExecution (a noop write would
    execute a separate command QE). Intended for tests/audits, not hot
    paths."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    spans = set(re.findall(r"\*\((\d+)\)", plan))  # '*(n) Op' = codegen'd
    spans |= set(re.findall(r"\[codegen id : (\d+)\]", plan))
    return len(spans)


def plan_summary(df: DataFrame) -> dict:
    """One-call scale audit for a query plan."""
    return {
        "shuffle_exchanges": shuffle_exchanges(df),
        "joins": join_strategies(df),
        "codegen_stages": codegen_stage_count(df),
        "pushed_filters": pushed_filters(df),
        "read_columns": read_columns(df),
    }


def assert_no_exchange(df: DataFrame) -> None:
    """Narrow-op contract (sample, per-row transforms): no shuffle."""
    n = shuffle_exchanges(df)
    if n:
        raise AssertionError(f"expected narrow plan, found {n} shuffle exchange(s)")


def assert_plan_stable(build_df, times: int = 2) -> None:
    """Same plan from repeated construction — the Spark-native form of
    the reference's serialization round-trip test (tests/e2e.rs:53-92).
    Expression ids (#123) and generated subexpression aliases
    (_common_expr_N from FILTER/count_if rewrites, _groupingexpression_N)
    are globally monotonic allocation counters, not plan structure, so
    they are normalized away before comparing."""
    plans = {
        re.sub(
            r"(_common_expr_|_groupingexpression_?)\d+",
            r"\1",
            re.sub(r"#\d+", "#", optimized_plan(build_df())),
        )
        for _ in range(times)
    }
    if len(plans) != 1:
        raise AssertionError("plan text differs across constructions")
