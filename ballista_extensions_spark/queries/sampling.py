"""Round-5 sampling/curation wave: deterministic weighted sampling,
exact-k stratified draws, SCD2 history compaction, and shuffle-skew
diagnostics.

All randomness is md5-derived (operators/weighted.py) so every query
here carries a bit-exact DuckDB oracle — unlike the xxhash64-based
`sample` family, these draws are ANSI-replayable. The uniform is
(h + 1) / 2^60 with h the first 15 md5 hex digits: h + 1 can need up
to 60 significant bits (more than a double's 53), but both engines
apply the same IEEE round-to-nearest when casting the integer to
double, so the quotient agrees bit-for-bit anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.queries.registry import register

# DuckDB twin of operators/weighted.uniform_from_hash (seed 42).
_U_SQL = (
    "(CAST(('0x' || substr(md5('42|' || {key}), 1, 15)) AS BIGINT) + 1)"
    " / 1152921504606846976.0"
)


@register(
    "weighted_sample_parts",
    oracle=f"""
    SELECT p_partkey, p_name,
           CAST(p_retailprice AS DOUBLE) AS weight
    FROM part
    WHERE p_retailprice > 0
    ORDER BY pow({_U_SQL.format(key="CAST(p_partkey AS VARCHAR)")},
                 1.0 / CAST(p_retailprice AS DOUBLE)) DESC,
             p_partkey
    LIMIT 200
    """,
)
def weighted_sample_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus draw: 200 parts, inclusion odds
    proportional to retail price, via A-Res priorities pow(u, 1/w)
    (operators/weighted.py:weighted_sample). The oracle replays the
    identical md5 draw and pow ordering — a weighted sampler you can
    AUDIT in SQL. Caveat: the md5 uniform is exact in both engines, but
    pow is not a correctly-rounded operation, so a 1-ulp libm divergence
    could in principle reorder priorities at the k boundary; ties on the
    priority are already broken by key order.

    Scale: TakeOrderedAndProject top-k (per-partition heaps, O(k)
    driver merge), no global sort."""
    from ballista_extensions_spark.operators.weighted import weighted_sample

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.col("p_retailprice").cast("double").alias("weight"),
    )
    return weighted_sample(p, "weight", 200, "p_partkey", seed=42)


@register(
    "group_sample_customers",
    oracle=f"""
    SELECT c_custkey, c_mktsegment
    FROM (
      SELECT c_custkey, c_mktsegment,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY {_U_SQL.format(key="CAST(c_custkey AS VARCHAR)")},
                        c_custkey) AS rn
      FROM customer)
    WHERE rn <= 20
    """,
)
def group_sample_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k stratified draw: 20 customers per market segment,
    uniform-without-replacement inside each stratum via the hash
    uniform (operators/weighted.py:group_sample_exact_k). The
    fixed-size complement of the fraction-based `sample_by_segment` —
    eval-set construction wants exact strata, not expected fractions.

    Scale: one shuffle on the segment key; partitioned window, rank
    truncates to k before anything downstream."""
    from ballista_extensions_spark.operators.weighted import (
        group_sample_exact_k,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return group_sample_exact_k(
        c, ["c_mktsegment"], 20, "c_custkey", seed=42
    )


@register(
    "orders_priority_scd2",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             CASE WHEN LAG(o_orderpriority) OVER w IS NOT DISTINCT FROM
                       o_orderpriority
                  THEN 0 ELSE 1 END AS chg
      FROM orders
      WHERE o_custkey % 50 = 3
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)),
    runs AS (
      SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM seq),
    islands AS (
      SELECT o_custkey, island, o_orderpriority,
             MIN(o_orderdate) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM runs GROUP BY o_custkey, island, o_orderpriority)
    SELECT o_custkey, o_orderpriority, valid_from,
           LEAD(valid_from) OVER (PARTITION BY o_custkey
                                  ORDER BY island) AS valid_to,
           n_rows
    FROM islands
    """,
)
def orders_priority_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history compaction (operators/weighted.py:scd2_compact):
    each customer's order-priority sequence collapses into validity
    intervals [valid_from, valid_to) — the incremental-metadata pattern
    for corpus snapshots (license, source status, quality tier over
    time). The %50 probe keeps the graded output bounded; the plan is
    identical without it.

    Scale: key-partitioned windows only (no global sort); one shuffle
    on (key, island) for the aggregate."""
    from ballista_extensions_spark.operators.weighted import scd2_compact

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 50 == 3)
        .select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    )
    return scd2_compact(
        o, "o_custkey", ["o_orderdate", "o_orderkey"], "o_orderpriority"
    )


@register(
    "key_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem GROUP BY l_suppkey),
    tot AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(n_rows) AS BIGINT) AS max_rows
      FROM per_key)
    SELECT suppkey, n_rows,
           CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           CAST(n_rows AS DOUBLE) * CAST(n_keys AS DOUBLE)
             / CAST(total AS DOUBLE) AS skew_factor
    FROM per_key, tot
    ORDER BY n_rows DESC, suppkey
    LIMIT 20
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnostics: the top-20 heaviest join/agg keys with
    their row share and skew factor (rows / mean-rows-per-key). This is
    the pre-flight check before picking salting (functions/skew.py) or
    AQE skew-join on a 100 TB fact: skew_factor >> 1 keys are the ones
    that stall a 1000-executor stage.

    Scale: one map-side-combined count per key, a 1-row broadcast of
    totals, top-k heap — nothing global."""
    l = load_table(spark, sf_dir, "lineitem")
    per_key = l.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = per_key.agg(
        F.sum("n_rows").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "suppkey",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total").cast("double"))
            .alias("share"),
            (
                F.col("n_rows").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("total").cast("double")
            ).alias("skew_factor"),
        )
        .orderBy(F.col("n_rows").desc(), "suppkey")
        .limit(20)
    )
