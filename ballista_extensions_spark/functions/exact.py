"""Exact (oracle-reproducible) aggregation helpers.

Summing IEEE doubles is order-dependent, and Spark's shuffle order differs
from DuckDB's scan order — so a naive ``sum(double)`` can differ in the
last ulps between engine and oracle and break value-hash comparison.

The driver's tables store money-like columns as doubles whose true values
have <= 2 decimal digits (TPC-H convention). Casting to DECIMAL before
summing makes the aggregation exact and order-independent in BOTH engines;
casting the final sum back to double is exact as long as value*10^scale
fits in 2^53 (true at any sf we run). The same trick in the oracle SQL
(``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``) yields bit-identical
doubles.

Note the cast double->decimal is itself deterministic across engines:
a binary double is never exactly halfway between two scale-s decimals for
s >= 1 (a decimal ending in 5 at scale s+1 has a factor 5 in the
denominator, hence no finite binary representation), so round-to-nearest
gives the same digits everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, alias: str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent sum of a money-like double: sum over
    DECIMAL(precision, scale), result cast back to double."""
    return (
        F.sum(col.cast(f"decimal({precision},{scale})"))
        .cast("double")
        .alias(alias)
    )


def dsum_expr(sql_expr: str, alias: str, precision: int = 18, scale: int = 2) -> Column:
    """Like :func:`dsum` but over a SQL expression string."""
    return dsum(F.expr(sql_expr), alias, precision, scale)


def davg(col: Column, alias: str, precision: int = 18, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum divided by count, both
    cast to double before the division so engine and oracle divide the
    same two doubles."""
    num = F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")
    den = F.count(col).cast("double")
    return (num / den).alias(alias)


def lcount(alias: str = "count_order") -> Column:
    """count(*) as bigint (DuckDB returns BIGINT; Spark returns long)."""
    return F.count(F.lit(1)).cast("long").alias(alias)
