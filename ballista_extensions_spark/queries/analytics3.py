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
from ballista_extensions_spark.operators.intervals import interval_concurrency
from ballista_extensions_spark.operators.mixing import resample_to_mixture
from ballista_extensions_spark.operators.regression import group_ols
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


# DuckDB twin of operators/weighted.uniform_from_hash (seed 42).
_U_SQL = (
    "(CAST(('0x' || substr(md5('42|' || {key}), 1, 15)) AS BIGINT) + 1)"
    " / 1152921504606846976.0"
)

_MIX_WEIGHTS = {"en": 0.5, "de": 0.125, "fr": 0.125, "es": 0.125, "zh": 0.125}


@register(
    "domain_mix_resample",
    oracle=f"""
    WITH w(lang, wt) AS (VALUES
      ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.125 AS DOUBLE)),
      ('fr', CAST(0.125 AS DOUBLE)), ('es', CAST(0.125 AS DOUBLE)),
      ('zh', CAST(0.125 AS DOUBLE))),
    c AS (
      SELECT d.lang, wt, CAST(COUNT(*) AS DOUBLE) AS n
      FROM documents d JOIN w ON d.lang = w.lang
      GROUP BY d.lang, wt),
    cap AS (SELECT MIN(n / wt) AS cap FROM c),
    q AS (
      SELECT lang, CAST(floor(wt * cap) AS BIGINT) AS k
      FROM c CROSS JOIN cap),
    r AS (
      SELECT d.lang, d.doc_id, d.source,
             ROW_NUMBER() OVER (
               PARTITION BY d.lang
               ORDER BY {_U_SQL.format(key="CAST(d.doc_id AS VARCHAR)")},
                        d.doc_id) AS mix_rank
      FROM documents d JOIN w ON d.lang = w.lang)
    SELECT r.lang, r.doc_id, r.source, r.mix_rank
    FROM r JOIN q ON r.lang = q.lang
    WHERE r.mix_rank <= q.k
    """,
)
def domain_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thin the corpus to a 50/12.5×4 language mixture with
    operators/mixing.resample_to_mixture: largest total the scarcest
    language supports, exact per-language quotas, md5-deterministic
    row selection. The oracle replays quota arithmetic AND the draw
    order with a partitioned window; the engine derives the same rank
    from a GLOBAL distributed row_number (operators/prefix.py) minus
    per-group offsets, so no corpus-sized group ever funnels through
    one task (mixture groups are the canonical huge-partition case)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents")).select(
        "lang", "doc_id", "source"
    )
    out = resample_to_mixture(d, "lang", _MIX_WEIGHTS, key_col="doc_id")
    return out.select(
        "lang", "doc_id", "source", F.col("__mix_rank").alias("mix_rank")
    )


@register(
    "concurrent_open_orders",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, o_orderdate AS s,
             MAX(l_shipdate) + INTERVAL 1 DAY AS e
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderkey, o_orderdate),
    d AS (
      SELECT s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT e AS t, -1 AS d FROM iv),
    g AS (SELECT t, CAST(SUM(d) AS BIGINT) AS delta FROM d GROUP BY t)
    SELECT t, delta,
           CAST(SUM(delta) OVER (
             ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrent
    FROM g
    """,
)
def concurrent_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in flight over time: each order occupies
    [o_orderdate, last shipment + 1 day) and the result is the full
    concurrency step function via the distributed sweep line
    (operators/intervals.py — range-partitioned prefix sums, never the
    oracle's single-task global window). Integer deltas make parity
    exact at any scale."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("__last"))
        .select(
            F.col("o_orderdate").alias("s"),
            (F.col("__last") + F.expr("INTERVAL 1 DAY")).alias("e"),
        )
    )
    out = interval_concurrency(iv, "s", "e")
    return out.select("t", F.col("delta").cast("long").alias("delta"),
                      F.col("concurrent").cast("long").alias("concurrent"))


def _dd_shingles3(toks: str) -> str:
    """DuckDB 3-gram shingle fragment (mirrors operators/text.shingle_expr)."""
    joined = " || ' ' || ".join(f"{toks}[i + {k}]" for k in range(3))
    return (
        f"CASE WHEN len({toks}) >= 3 THEN "
        f"list_distinct(list_transform(generate_series(1, len({toks}) - 2), "
        f"i -> {joined})) ELSE [] END"
    )


@register(
    "ngram_novelty_scores",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_dd_shingles3(_DD_TOKS)} AS shingles FROM documents),
    post AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    dfreq AS (SELECT s, COUNT(*) AS df FROM post GROUP BY s)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM post JOIN dfreq USING (s)
    GROUP BY doc_id
    """,
)
def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus novelty (fraction of distinct 3-gram shingles
    with global document frequency 1) via operators/text.ngram_novelty —
    the cross-document boilerplate signal. The ratio divides two exact
    integers in double, so parity is bit-exact."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return T.ngram_novelty(d, "text", "doc_id", n=3)


@register(
    "ab_test_value_by_type",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS sx,
             SUM(CAST(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6)) AS DECIMAL(27,6)))
               AS sxx
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type),
    tot AS (
      SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sxx) AS tsxx FROM s),
    w AS (
      SELECT event_type,
             n,
             CAST(sx AS DOUBLE) AS sxd,
             CAST(sxx AS DOUBLE) AS sxxd,
             tn - n AS n2,
             CAST(tsx - sx AS DOUBLE) AS sxd2,
             CAST(tsxx - sxx AS DOUBLE) AS sxxd2
      FROM s CROSS JOIN tot),
    m AS (
      SELECT event_type, n,
             sxd / n AS mean,
             (sxxd - sxd * sxd / n) / (n - 1) AS var1,
             sxd2 / n2 AS mean2,
             (sxxd2 - sxd2 * sxd2 / n2) / (n2 - 1) AS var2,
             n2
      FROM w)
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           mean,
           CASE WHEN n > 1 AND n2 > 1 AND var1 / n + var2 / n2 > 0
                THEN (mean - mean2) / sqrt(var1 / n + var2 / n2)
           END AS t_stat,
           CASE WHEN n > 1 AND n2 > 1 AND var1 / n + var2 / n2 > 0
                THEN (var1 / n + var2 / n2) * (var1 / n + var2 / n2)
                     / ((var1 / n) * (var1 / n) / (n - 1)
                        + (var2 / n2) * (var2 / n2) / (n2 - 1))
           END AS welch_df
    FROM m
    """,
)
def ab_test_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic of each event type's mean value against the
    rest of the stream — the A/B-significance primitive, computed as a
    closed form over decimal sufficient statistics (exact, shuffle-
    order-proof sums; rest-of-stream stats by exact decimal subtraction
    from the broadcast one-row total) with the double expression tree
    evaluated in the same operation order as the oracle, so t and the
    Welch–Satterthwaite df match bit-for-bit. One map-combined
    aggregation + one broadcast of a single total row.

    p-values need an incomplete-beta special function (no closed form);
    consumers threshold |t| directly or post-process driver-side."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vdec = F.col("value").cast("decimal(18,6)")
    # The squares are rescaled 12 -> 6 BEFORE summing: exact while the
    # data has <= 3 fractional digits (true here), and it keeps the
    # final sum's unscaled integer below 2^53 — DuckDB casts DECIMAL to
    # DOUBLE as unscaled/10^scale (two roundings), so a scale-12 sum
    # whose unscaled part tops 2^53 lands 1 ulp off Spark's correctly
    # rounded BigDecimal.doubleValue; at scale 6 both conversions are
    # exact and the engines agree bit-for-bit.
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(vdec).alias("sx"),
        F.sum((vdec * vdec).cast("decimal(27,6)")).alias("sxx"),
    )
    # One materialization of the tiny per-type stats frame: the totals
    # aggregate and the final select otherwise each re-run the full
    # events scan (frequent.py uses the same pattern).
    s = s.localCheckpoint(eager=False)
    tot = s.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sxx").alias("tsxx"),
    )
    w = s.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        F.col("sx").cast("double").alias("sxd"),
        F.col("sxx").cast("double").alias("sxxd"),
        (F.col("tn") - F.col("n")).alias("n2"),
        (F.col("tsx") - F.col("sx")).cast("double").alias("sxd2"),
        (F.col("tsxx") - F.col("sxx")).cast("double").alias("sxxd2"),
    )
    mean = F.col("sxd") / F.col("n")
    m = w.select(
        "event_type",
        "n",
        mean.alias("mean"),
        ((F.col("sxxd") - F.col("sxd") * F.col("sxd") / F.col("n"))
         / (F.col("n") - 1)).alias("var1"),
        (F.col("sxd2") / F.col("n2")).alias("mean2"),
        ((F.col("sxxd2") - F.col("sxd2") * F.col("sxd2") / F.col("n2"))
         / (F.col("n2") - 1)).alias("var2"),
        "n2",
    )
    se2 = F.col("var1") / F.col("n") + F.col("var2") / F.col("n2")
    ok = (F.col("n") > 1) & (F.col("n2") > 1) & (se2 > 0)
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        "mean",
        F.when(ok, (F.col("mean") - F.col("mean2")) / F.sqrt(se2)).alias(
            "t_stat"
        ),
        F.when(
            ok,
            (se2 * se2)
            / (
                (F.col("var1") / F.col("n")) * (F.col("var1") / F.col("n"))
                / (F.col("n") - 1)
                + (F.col("var2") / F.col("n2")) * (F.col("var2") / F.col("n2"))
                / (F.col("n2") - 1)
            ),
        ).alias("welch_df"),
    )


@register(
    "shipping_delay_deciles_by_priority",
    oracle="""
    WITH d AS (
      SELECT o_orderpriority AS pri,
             CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)
               AS delay,
             l_orderkey, l_linenumber
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    r AS (
      SELECT pri, delay,
             ROW_NUMBER() OVER (
               PARTITION BY pri
               ORDER BY delay, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY pri) AS n
      FROM d),
    t(p) AS (VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.25 AS DOUBLE)),
                    (CAST(0.5 AS DOUBLE)), (CAST(0.75 AS DOUBLE)),
                    (CAST(0.9 AS DOUBLE)))
    SELECT pri, p, MIN(delay) AS delay_days
    FROM r JOIN t ON rn = CAST(ceil(p * n) AS BIGINT)
    GROUP BY pri, p
    """,
)
def shipping_delay_deciles_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT per-group quantiles (SQL-standard PERCENTILE_DISC
    semantics: the value at rank ceil(p*n)) of shipping delay per order
    priority — grouped quantiles without approximation, the exact twin
    of the KLL sketch rollup (price_quantile_sketch_rollup). Built on
    operators/prefix.grouped_percentile_disc: ONE global distributed
    rank over (pri, delay, tiebreaks) with parallelism = range
    partitions, per-group ranks recovered by subtracting broadcast
    group offsets — NOT a Window.partitionBy(pri), which would funnel
    ~1/5 of the orders-lineitem join through each of 5 tasks. The
    tie-break (delay, orderkey, linenumber) totals the order, so rank
    selection is deterministic in both engines."""
    from ballista_extensions_spark.operators.prefix import (
        grouped_percentile_disc,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    d = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("pri"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("delay"),
        "l_orderkey",
        "l_linenumber",
    )
    res = grouped_percentile_disc(
        d,
        "pri",
        "delay",
        [0.1, 0.25, 0.5, 0.75, 0.9],
        tiebreak_cols=("l_orderkey", "l_linenumber"),
    )
    return res.select(
        "pri", F.col("prob").alias("p"), F.col("delay").alias("delay_days")
    )


def _dd_spans(toks: str, n: int) -> str:
    """DuckDB n-token span fragment WITHOUT list_distinct — occurrence
    semantics (every position yields a span), unlike _dd_shingles3's set
    semantics."""
    joined = " || ' ' || ".join(f"{toks}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> {joined}) ELSE [] END"
    )


@register(
    "span_dedup_report",
    oracle=f"""
    WITH sp AS (
      SELECT doc_id, unnest({_dd_spans(_DD_TOKS, 10)}) AS s
      FROM documents),
    dup AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM sp GROUP BY s
      HAVING COUNT(DISTINCT doc_id) >= 2)
    SELECT md5(s) AS span_hash, n_occurrences, n_docs
    FROM dup
    ORDER BY n_occurrences DESC, span_hash
    LIMIT 50
    """,
)
def span_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication report: the top 10-token spans that
    appear in >= 2 documents, with occurrence and document counts — the
    fixed-length approximation of suffix-array substring dedup
    [Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"], the signal used to cut verbatim boilerplate that
    document-level near-dup misses. Span text leaves the executors only
    as md5 hashes.

    Scale: occurrence spans (not per-doc sets) explode ~len(doc) rows
    per doc, but the span groupBy partial-aggregates map-side and only
    (hash, counts) shuffle; the report is top-k via
    TakeOrderedAndProject. One shuffle keyed by span."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks_sql = T.TOKENS_SQL.format(col="text")
    spans = d.select(
        "doc_id",
        F.explode(T.shingle_expr(toks_sql, 10)).alias("s"),
    )
    dup = (
        spans.groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    return (
        dup.select(
            F.md5("s").alias("span_hash"), "n_occurrences", "n_docs"
        )
        .orderBy(F.desc("n_occurrences"), F.asc("span_hash"))
        .limit(50)
    )


@register(
    "pretrain_mixture_pipeline",
    oracle=f"""
    WITH w(lang, wt) AS (VALUES
      ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.125 AS DOUBLE)),
      ('fr', CAST(0.125 AS DOUBLE)), ('es', CAST(0.125 AS DOUBLE)),
      ('zh', CAST(0.125 AS DOUBLE))),
    st AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len({_DD_TOKS}) AS BIGINT) AS n_tokens,
             CAST(len(list_filter({_DD_TOKS},
                  t -> list_contains(['the','a','of','and','to','in','is'],
                                     t))) AS BIGINT) AS n_stop,
             CAST(len(list_distinct({_DD_TOKS})) AS BIGINT) AS n_dist
      FROM documents),
    kept AS (
      SELECT d.doc_id, d.lang, d.text, s.n_tokens
      FROM documents d JOIN st s USING (doc_id)
      WHERE s.n_tokens >= 20 AND s.n_chars <= 450
        AND CAST(s.n_stop AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) >= 0.02
        AND CAST(s.n_dist AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) >= 0.5),
    ded AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
    surv AS (
      SELECT k.doc_id, k.lang, k.n_tokens
      FROM kept k JOIN ded USING (doc_id)),
    c AS (
      SELECT s.lang, wt, CAST(COUNT(*) AS DOUBLE) AS n
      FROM surv s JOIN w ON s.lang = w.lang GROUP BY s.lang, wt),
    cap AS (SELECT MIN(n / wt) AS cap FROM c),
    q AS (
      SELECT lang, CAST(floor(wt * cap) AS BIGINT) AS k
      FROM c CROSS JOIN cap),
    r AS (
      SELECT s.lang, s.doc_id, s.n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY s.lang
               ORDER BY {_U_SQL.format(key="CAST(s.doc_id AS VARCHAR)")},
                        s.doc_id) AS rn
      FROM surv s JOIN w ON s.lang = w.lang),
    sel AS (SELECT r.lang, r.n_tokens FROM r JOIN q ON r.lang = q.lang
            WHERE r.rn <= q.k),
    agg AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM sel GROUP BY lang)
    SELECT lang, n_docs, n_tokens,
           CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE)
             AS doc_share
    FROM agg
    """,
)
def pretrain_mixture_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE pretraining-data curation pipeline as one plan:
    quality gate (the quality_filter_chain rule set over text_stats) ->
    exact dedup (min-id per md5) -> mixture resample to the 50/12.5x4
    language targets (operators/mixing.py, distributed-rank path) ->
    per-language corpus summary (docs, tokens, document share). Every
    stage is ANSI-expressible, so the WHOLE chain is hash-verified
    against DuckDB end to end — the composition twin of
    curation_pipeline_summary (which chains near-dup instead of
    mixing). Scale: text never shuffles after the gate (md5 + ids do),
    the mixture stage is the no-corpus-sized-window path, the summary
    is dimension-sized."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    stats = T.text_stats(docs)
    kept_ids = stats.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("n_chars") <= 450)
        & (F.col("stopword_ratio") >= 0.02)
        & (F.col("distinct_ratio") >= 0.5)
    ).select("doc_id", "n_tokens")
    surv_base = docs.select("doc_id", "lang", "text").join(kept_ids, "doc_id")
    ded_keep = (
        surv_base.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv = surv_base.join(ded_keep, "doc_id").select(
        "lang", "doc_id", "n_tokens"
    )
    mixed = resample_to_mixture(surv, "lang", _MIX_WEIGHTS, key_col="doc_id")
    agg = mixed.groupBy("lang").agg(
        lcount("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    tot = agg.agg(F.sum("n_docs").alias("__t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_docs").cast("double") / F.col("__t").cast("double")).alias(
            "doc_share"
        ),
    )


@register(
    "embedding_dup_clusters",
    oracle="""
    WITH RECURSIVE
    e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id % 5 = 0),
    n AS (SELECT vec_id, v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(v, x -> x * x)), (acc, x) -> acc + x))
                   AS nrm
          FROM e),
    edges AS (
      SELECT a.vec_id AS u, b.vec_id AS w
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(list_zip(a.v, b.v), s -> s[1] * s[2])),
              (acc, x) -> acc + x) / (a.nrm * b.nrm) >= 0.4),
    sym AS (SELECT u, w FROM edges UNION SELECT w, u FROM edges),
    reach(node, label) AS (
      SELECT vec_id, vec_id FROM e
      UNION
      SELECT s.w, r.label FROM reach r JOIN sym s ON s.u = r.node),
    comp AS (SELECT node AS vec_id, MIN(label) AS component
             FROM reach GROUP BY node),
    csize AS (SELECT component, COUNT(*) AS sz FROM comp GROUP BY component)
    SELECT c.vec_id, CAST(c.component AS BIGINT) AS component,
           CAST(s.sz AS BIGINT) AS cluster_size
    FROM comp c JOIN csize s USING (component)
    """,
)
def embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space duplicate clustering, oracle-exact end to end:
    exact cosine pairs >= 0.4 within a probe subset
    (operators/similarity.cosine_pairs_exact — the O(n^2) correctness
    twin; embedding_cosine_near_dup's LSH buckets are the corpus-scale
    path), large-star/small-star connected components over the edges,
    and each vector labeled with its component and cluster size. The
    oracle replays the identical double-fold cosine and the closure as
    a recursive CTE — the embedding-side mirror of the text curation
    chain's dedup stage."""
    from ballista_extensions_spark.operators.components import (
        connected_components,
    )
    from ballista_extensions_spark.operators.similarity import (
        cosine_pairs_exact,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    sub = emb.filter(F.col("vec_id") % 5 == 0)
    pairs = cosine_pairs_exact(sub, threshold=0.4)
    comp = connected_components(
        sub.select("vec_id"), pairs, id_col="vec_id", src="id_a", dst="id_b"
    )
    csize = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    return comp.join(csize, on="component").select(
        "vec_id",
        F.col("component").cast("long").alias("component"),
        F.col("sz").cast("long").alias("cluster_size"),
    )


@register(
    "revenue_trend_by_segment",
    oracle="""
    WITH p AS (
      SELECT c_mktsegment,
             CAST(year(o_orderdate) - 1995 AS DECIMAL(10,0)) AS x,
             CAST(o_totalprice AS DECIMAL(18,6)) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey),
    s AS (
      SELECT c_mktsegment,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM p GROUP BY c_mktsegment)
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
           CASE WHEN n * sxx - sx * sx != 0
                THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
           CASE WHEN n * sxx - sx * sx != 0
                THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                     / n END AS intercept
    FROM s
    """,
)
def revenue_trend_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly order-value trend per market segment via the closed-form
    grouped OLS (operators/regression.py): decimal sufficient
    statistics (shuffle-order-proof), double closed form in the same
    operation order as the oracle — bit-exact slopes without Spark's
    double-accumulating regr_slope. One map-combined aggregation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(c, o.o_custkey == c.c_custkey)
    return group_ols(
        j,
        ["c_mktsegment"],
        x=F.year("o_orderdate") - F.lit(1995),
        y=F.col("o_totalprice"),
    )
