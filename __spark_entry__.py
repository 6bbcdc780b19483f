"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline; ``queries()`` /
``oracle_sql()`` expose the registered operator surface of
:mod:`ballista_extensions_spark.queries` (one entry per implemented
operator from SURVEY.md §2 + the §7 LLM-pipeline additions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# The engine package lives next to this file; make the import robust to
# however the driver loads this module (cwd-independent).
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: scan lineitem ->
    sample(0.3, seed=42) (the reference's Tier-A operator with its exact
    validation, src/dataframe/sample.rs:28-38) -> filter -> aggregate
    by return flag/status — the SURVEY.md §7 step-1 end-to-end slice."""
    from ballista_extensions_spark.functions.exact import davg, dsum, lcount
    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.operators.sample import sample

    l = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    return (
        sample(l, 0.3, seed=42)
        .filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            davg(F.col("l_discount"), "avg_disc"),
            lcount("count_order"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registered operator queries; each callable is (spark, sf_dir) ->
    DataFrame with oracle-aligned column names."""
    from ballista_extensions_spark.queries import get_queries

    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query where ANSI-expressible; hash-based ops
    (sample / MinHash / SimHash / LSH) are intentionally absent -> the
    driver's rows-only check applies (their statistical and recall
    contracts are pytest-enforced, see tests/)."""
    from ballista_extensions_spark.queries import get_oracles

    return get_oracles()
