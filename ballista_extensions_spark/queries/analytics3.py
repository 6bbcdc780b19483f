"""Round-6 wave: exact distributed heavy hitters, hypertable-style
gapfill + LOCF, and bloom-pruned joins.

Each query is the registry face of an operator module
(operators/frequent.py, operators/timeseries.py, functions/bloom.py);
the oracle states the *semantic* contract in ANSI SQL while the engine
side uses the scale-shaped plan (bounded summaries, per-series spines,
pre-shuffle pruning). Exactness discipline as everywhere: currency and
gauge sums ride DECIMAL, counts are BIGINT, deterministic tie-breaks on
every ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.functions.bloom import bloom_filtered_join
from ballista_extensions_spark.functions.exact import davg, dsum, lcount
from ballista_extensions_spark.io import ensure_parallelism, load_table
from ballista_extensions_spark.operators import text as T
from ballista_extensions_spark.operators.frequent import exact_top_k
from ballista_extensions_spark.operators.timeseries import time_bucket_gapfill
from ballista_extensions_spark.queries.registry import register

_DD_TOKS = r"string_split_regex(text, '\s+')"


@register(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_DD_TOKS}) AS t FROM documents)
    SELECT t AS item, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks WHERE length(t) > 0
    GROUP BY t
    ORDER BY cnt DESC, item
    LIMIT 30
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus top-30 tokens via the two-phase Misra–Gries operator
    (operators/frequent.py): bounded per-partition summaries, candidate
    prune, exact verification count of candidates only. The oracle is
    the naive full-cardinality GROUP BY — identical output, different
    shuffle volume (summaries + candidate keys vs every distinct
    token)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        F.explode(F.expr(T.TOKENS_SQL.format(col="text"))).alias("tok")
    ).filter(F.length("tok") > 0)
    return exact_top_k(toks, "tok", k=30, counters=4096).select(
        F.col("item"), F.col("cnt")
    )


@register(
    "events_gapfill_hourly",
    oracle="""
    WITH per AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(value) AS DOUBLE) AS avg_value
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM per GROUP BY 1),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM bounds),
    j AS (
      SELECT s.event_type, s.bucket,
             COALESCE(p.n_events, 0) AS n_events,
             COALESCE(p.sum_value, 0) AS sum_value,
             p.avg_value
      FROM spine s LEFT JOIN per p
        ON p.event_type = s.event_type AND p.bucket = s.bucket)
    SELECT event_type, bucket,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(sum_value AS DOUBLE) AS sum_value,
           last_value(avg_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS UNBOUNDED PRECEDING) AS avg_value_locf
    FROM j
    """,
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly rollup per event type with TimescaleDB-style
    semantics: count/sum zero-filled on empty hours, the hourly average
    carried forward (LOCF) as a gauge. Built on
    operators/timeseries.time_bucket_gapfill — per-series spine from
    sequence+explode, co-partitioned left join, PARTITIONED window for
    the carry (never a global window)."""
    e = load_table(spark, sf_dir, "events")
    out = time_bucket_gapfill(
        e,
        ts_col="ts",
        series_cols=["event_type"],
        aggs=[
            lcount("n_events"),
            dsum(F.col("value"), "sum_value", 18, 6),
            davg(F.col("value"), "avg_value", 18, 6),
        ],
        bucket="hour",
        zero_cols=["n_events", "sum_value"],
        locf_cols=["avg_value"],
    )
    return out.select(
        "event_type",
        F.col("bucket"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("avg_value").alias("avg_value_locf"),
    )


@register(
    "bloom_prejoin_revenue",
    oracle="""
    SELECT l_suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_suppkey
    """,
)
def bloom_prejoin_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by one nation's suppliers with the fact side bloom-pruned BEFORE
    the join (functions/bloom.py): the ~1/25 of lineitem rows whose
    suppkey hashes into the selected suppliers' bitmap are all that reach
    the exchange; the exact join then clears bloom false positives, so
    the result is bit-identical to the plain three-way join the oracle
    runs. At 100 TB the prune removes ~96% of the probe-side shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    joined = bloom_filtered_join(li, supp, key="l_suppkey", how="left_semi")
    return joined.groupBy("l_suppkey").agg(
        dsum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)"),
            "revenue",
            22,
            4,
        ),
        lcount("n_items"),
    )
