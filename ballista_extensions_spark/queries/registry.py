"""Registration mechanism for queries + oracles.

This is our Tier-D "extension mechanism" (SURVEY.md §2): where the
reference registers custom nodes with codecs and an extension planner
(src/codec/extension.rs:39-198, src/planner/extension_planner.rs:31-52),
we register named plan-constructor functions; Spark handles planning,
serialization and execution.
"""

from __future__ import annotations

from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under
    ``name`` with an optional DuckDB oracle SQL string. Ops without an
    oracle get the driver's weaker rows-only check (randomized ops like
    sample, or ops whose hash functions aren't ANSI-expressible)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def get_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)
