"""Round-8 wave: corpus-curation economics (mixture temperature
weights, dedup shrinkage, split leakage, PII density, language
diversity) and order-stream temporal statistics (seasonality index,
inter-order gaps, grouped token-length quartiles).

Parity discipline (the verify-skill rules): counts are BIGINT, currency
sums ride DECIMAL, every floating-point output is either a single
division / sqrt of exactly-aggregated integers-or-decimals (one
correctly-rounded IEEE op — never a SUM over doubles, whose result is
partition-order-dependent), and every ordering is totalized with a key
tie-break. Window functions only ever partition by a natural key
(customer, language); global order statistics ride the distributed
prefix machinery (operators/prefix.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.operators import text as T
from ballista_extensions_spark.queries.registry import register

_DD_TOKS = r"string_split_regex(text, '\s+')"


@register(
    "temperature_sampling_weights",
    oracle=f"""
    WITH per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len({_DD_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT SUM(n_docs) AS total FROM per)
    SELECT source, n_docs, n_tokens,
           CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           sqrt(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE)) AS weight
    FROM per, tot
    """,
)
def temperature_sampling_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled mixture weights per source — the sampling
    policy behind multilingual/multi-domain pretraining mixes: raw
    share p_i = n_i/N and the alpha=0.5 up-weighting w_i = p_i^alpha
    (sqrt — smaller sources sampled more than proportionally). Weights
    are emitted UN-normalized: sqrt and the share division are single
    correctly-rounded IEEE ops, while a normalizing SUM over double
    weights would be partition-order-dependent — the consumer
    (operators/mixing.resample_to_mixture) normalizes internally.
    Scale: one map-side-combined aggregate over sources + an O(sources)
    broadcast of the total."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).cast("long").alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_docs").alias("total"))
    share = F.col("n_docs").cast("double") / F.col("total").cast("double")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("share"),
        F.sqrt(share).alias("weight"),
    )


@register(
    "split_leakage_audit",
    oracle="""
    WITH t AS (
      SELECT doc_id, md5(text) AS h, (doc_id % 10 < 8) AS is_train
      FROM documents),
    fam AS (
      SELECT h,
             SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS n_tr,
             SUM(CASE WHEN is_train THEN 0 ELSE 1 END) AS n_te
      FROM t GROUP BY h)
    SELECT CAST(SUM(n_tr) AS BIGINT) AS n_train,
           CAST(SUM(n_te) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN n_tr > 0 AND n_te > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked_hashes,
           CAST(SUM(CASE WHEN n_tr > 0 AND n_te > 0 THEN n_te ELSE 0 END)
                AS BIGINT) AS n_test_docs_leaked
    FROM fam
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split leakage: with the deterministic 80/20 split
    (doc_id % 10), how many exact-duplicate text families straddle the
    boundary, and how many test documents are thereby contaminated —
    the audit every eval-set construction must pass (a leaked test doc
    measures memorization, not generalization). One md5-keyed shuffle
    carrying two small counters per family; the text column never
    shuffles. Complements contamination_check (n-gram overlap) with
    the exact-dup criterion."""
    d = load_table(spark, sf_dir, "documents")
    fam = (
        d.select(
            F.md5("text").alias("h"),
            F.when(F.col("doc_id") % 10 < 8, 1).otherwise(0).alias("tr"),
        )
        .groupBy("h")
        .agg(
            F.sum("tr").alias("n_tr"),
            F.sum(1 - F.col("tr")).alias("n_te"),
        )
    )
    leaked = (F.col("n_tr") > 0) & (F.col("n_te") > 0)
    return fam.agg(
        F.sum("n_tr").cast("long").alias("n_train"),
        F.sum("n_te").cast("long").alias("n_test"),
        F.sum(F.when(leaked, 1).otherwise(0)).cast("long").alias(
            "n_leaked_hashes"
        ),
        F.sum(F.when(leaked, F.col("n_te")).otherwise(0))
        .cast("long")
        .alias("n_test_docs_leaked"),
    )


_EMAIL_RE = r"[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
_SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"


@register(
    "pii_density_by_source",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{_EMAIL_RE}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_email_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{_SSN_RE}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_ssn_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{_EMAIL_RE}')
                    THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS email_frac
    FROM documents GROUP BY source
    """,
)
def pii_density_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure report per source: document counts matching the
    email / SSN patterns (the dialect-portable regex subset proven by
    pii_scrub) and the email fraction — the triage view that decides
    which sources need the scrubbing pass before the corpus ships.
    Narrow single-aggregate scan; the regex runs JVM-side inside
    codegen."""
    d = load_table(spark, sf_dir, "documents")
    email = F.when(F.col("text").rlike(_EMAIL_RE), 1).otherwise(0)
    ssn = F.when(F.col("text").rlike(_SSN_RE), 1).otherwise(0)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(email).cast("long").alias("n_email_docs"),
        F.sum(ssn).cast("long").alias("n_ssn_docs"),
        (
            F.sum(email).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("email_frac"),
    )


@register(
    "lang_diversity_by_source",
    oracle="""
    WITH per AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang),
    agg AS (
      SELECT source,
             CAST(SUM(n) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_langs,
             SUM(CAST(n AS DECIMAL(38,0)) * n) AS sumsq
      FROM per GROUP BY source)
    SELECT source, n_docs, n_langs,
           1.0 - CAST(sumsq AS DOUBLE)
                 / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))
             AS simpson
    FROM agg
    """,
)
def lang_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson diversity of languages within each source (1 - sum of
    squared language shares) — the mix-health metric for a multilingual
    crawl. Computed EXACTLY: the squared counts accumulate in
    DECIMAL(38,0) (integer adds, order-free; a SUM over double shares
    would be partition-order-dependent) and only the final
    1 - sumsq/n^2 runs in IEEE doubles, identically in both engines.
    Two map-side-combined aggregates over (source, lang) — dimension-
    bounded."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    agg = per.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.sum(F.col("n").cast("decimal(38,0)") * F.col("n")).alias("sumsq"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_langs",
        (
            F.lit(1.0)
            - F.col("sumsq").cast("double")
            / (
                F.col("n_docs").cast("double")
                * F.col("n_docs").cast("double")
            )
        ).alias("simpson"),
    )


@register(
    "orders_seasonality_index",
    oracle="""
    WITH m AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(month FROM o_orderdate) AS mon,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2),
    y AS (
      SELECT yr AS y_yr, SUM(rev) AS yr_rev,
             CAST(COUNT(*) AS BIGINT) AS n_months
      FROM m GROUP BY yr)
    SELECT CAST(yr AS BIGINT) AS yr, CAST(mon AS BIGINT) AS mon,
           CAST(rev AS DOUBLE) AS rev,
           CAST(rev AS DOUBLE) * n_months / CAST(yr_rev AS DOUBLE)
             AS seasonality_index
    FROM m JOIN y ON yr = y_yr
    """,
)
def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly seasonality index: each month's revenue relative to its
    year's average month (index 1.0 = an average month) — the demand
    profile a capacity planner reads. Revenue aggregates ride DECIMAL
    (exact, order-free); the index is double multiply-then-divide in
    the same literal order in both engines. Two dimension-bounded
    aggregates + a broadcast join on year — no windows at all."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    y = m.groupBy(F.col("yr").alias("y_yr")).agg(
        F.sum("rev").alias("yr_rev"),
        F.count(F.lit(1)).cast("long").alias("n_months"),
    )
    return m.join(F.broadcast(y), m["yr"] == y["y_yr"]).select(
        "yr",
        "mon",
        F.col("rev").cast("double").alias("rev"),
        (
            F.col("rev").cast("double")
            * F.col("n_months")
            / F.col("yr_rev").cast("double")
        ).alias("seasonality_index"),
    )


@register(
    "customer_order_gap_stats",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap
      FROM orders),
    per AS (
      SELECT c_mktsegment, o_custkey,
             CAST(COUNT(gap) AS BIGINT) AS n_gaps,
             CAST(SUM(gap) AS BIGINT) AS sum_gap,
             CAST(MAX(gap) AS BIGINT) AS max_gap
      FROM g JOIN customer ON c_custkey = o_custkey
      GROUP BY 1, 2)
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN n_gaps > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat_customers,
           CAST(SUM(n_gaps) AS BIGINT) AS n_gaps,
           CAST(SUM(sum_gap) AS DOUBLE) / CAST(SUM(n_gaps) AS DOUBLE)
             AS avg_gap_days,
           CAST(MAX(max_gap) AS BIGINT) AS max_gap_days
    FROM per GROUP BY c_mktsegment
    """,
)
def customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics per market segment: repeat-customer
    counts, mean days between consecutive orders, and the longest gap —
    the reorder-cadence profile. The LAG window partitions by customer
    (parallelism = customers, never a global sort); gap sums stay in
    long integers so the mean is ONE double division. Customer
    dimension joins broadcast-side."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap"),
    )
    per = (
        g.join(F.broadcast(c), g["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.count("gap").cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("sum_gap"),
            F.max("gap").cast("long").alias("max_gap"),
        )
    )
    return per.groupBy("c_mktsegment").agg(
        F.sum(F.when(F.col("n_gaps") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_repeat_customers"),
        F.sum("n_gaps").cast("long").alias("n_gaps"),
        (
            F.sum("sum_gap").cast("double")
            / F.sum("n_gaps").cast("double")
        ).alias("avg_gap_days"),
        F.max("max_gap").cast("long").alias("max_gap_days"),
    )


@register(
    "token_len_quartiles_by_lang",
    oracle=f"""
    WITH s AS (
      SELECT lang, CAST(len({_DD_TOKS}) AS BIGINT) AS n_tokens, doc_id
      FROM documents),
    n AS (SELECT lang AS n_lang, CAST(COUNT(n_tokens) AS BIGINT) AS n
          FROM s GROUP BY lang),
    q AS (
      SELECT lang, 0.25 AS p,
             percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tokens)
               AS n_tokens
      FROM s GROUP BY lang
      UNION ALL
      SELECT lang, 0.5,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)
      FROM s GROUP BY lang
      UNION ALL
      SELECT lang, 0.75,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY n_tokens)
      FROM s GROUP BY lang)
    SELECT q.lang, CAST(p AS DOUBLE) AS prob, q.n_tokens, n.n
    FROM q JOIN n ON q.lang = n.n_lang
    """,
)
def token_len_quartiles_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-length quartiles per language — the length profile that
    drives per-language chunking and packing policy. Rides
    grouped_percentile_disc (operators/prefix.py): ONE global
    distributed rank over (lang, n_tokens) minus broadcast group
    offsets, target ranks in DECIMAL-exact arithmetic — never a
    per-language sort task. Values are integer token counts, so
    cross-engine parity is exact regardless of tie-break."""
    from ballista_extensions_spark.operators.prefix import (
        grouped_percentile_disc,
    )

    d = load_table(spark, sf_dir, "documents")
    s = d.select(
        "lang", T.token_count(F.col("text")).alias("n_tokens"), "doc_id"
    )
    res = grouped_percentile_disc(
        s, "lang", "n_tokens", [0.25, 0.5, 0.75], tiebreak_cols=("doc_id",)
    )
    return res.select("lang", "prob", "n_tokens", "n")


@register(
    "orders_interarrival_median",
    oracle="""
    WITH g AS (
      SELECT date_diff('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS gap
      FROM orders),
    v AS (SELECT gap FROM g WHERE gap IS NOT NULL)
    SELECT 0.5 AS prob,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY gap) AS gap_days,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM v
    """,
)
def orders_interarrival_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global median of customer inter-order gaps: per-customer
    LAG (partitioned window) feeds distributed_percentile_disc — the
    global order statistic comes from the range-partitioned rank, never
    a single-task sort over all gaps. The selected VALUE at rank
    ceil(0.5*n) is tie-break-independent, so parity with DuckDB's
    percentile_disc is exact."""
    from ballista_extensions_spark.operators.prefix import (
        distributed_percentile_disc,
    )

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    res = distributed_percentile_disc(
        g, "gap", [0.5], tiebreak_cols=("o_custkey", "o_orderkey")
    )
    return res.select(
        "prob", F.col("gap").alias("gap_days"), F.col("n")
    )


@register(
    "dedup_shrinkage_by_source",
    oracle=f"""
    WITH t AS (
      SELECT source, md5(text) AS h,
             CAST(len({_DD_TOKS}) AS BIGINT) AS nt
      FROM documents),
    fam AS (
      SELECT source, h, CAST(COUNT(*) AS BIGINT) AS c,
             MIN(nt) AS nt
      FROM t GROUP BY source, h)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(c * nt) AS BIGINT) AS tokens_total,
           CAST(SUM(nt) AS BIGINT) AS tokens_unique,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS retention
    FROM fam GROUP BY source
    """,
)
def dedup_shrinkage_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup shrinkage report: per source, how many documents and
    tokens survive within-source exact dedup — the cost/benefit view
    that prioritizes which sources to dedup first at 100 TB. Exact-dup
    family members share identical text (hence identical token counts:
    MIN is 'any'), so family aggregates carry two longs, the text never
    shuffles, and retention is one double division of exact counts.
    One md5 shuffle + one dimension-bounded rollup."""
    d = load_table(spark, sf_dir, "documents")
    fam = (
        d.select(
            "source",
            F.md5("text").alias("h"),
            T.token_count(F.col("text")).alias("nt"),
        )
        .groupBy("source", "h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.min("nt").alias("nt"),
        )
    )
    return fam.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum(F.col("c") * F.col("nt")).cast("long").alias("tokens_total"),
        F.sum("nt").cast("long").alias("tokens_unique"),
        (
            F.count(F.lit(1)).cast("double") / F.sum("c").cast("double")
        ).alias("retention"),
    )


@register(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(last_value(o_totalprice) OVER w AS DOUBLE) AS last_price,
           CAST(nth_value(o_totalprice, 2) OVER w AS DOUBLE) AS second_price,
           CAST(COALESCE(
             lag(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey),
             -1.0) AS DOUBLE) AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-window-function library surface (FIRST_VALUE /
    LAST_VALUE / NTH_VALUE / LAG-with-default) over per-customer order
    history — completing the window coverage next to the rank family
    (window_rank_family) and running totals. The frame is explicitly
    UNBOUNDED-to-UNBOUNDED so LAST_VALUE means the partition's last row
    in BOTH engines (the default frame would stop at CURRENT ROW).
    Every window partitions by customer — parallelism grows with keys;
    ordering totalized by (date, orderkey)."""
    o = load_table(spark, sf_dir, "orders")
    wf = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wl = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.first("o_totalprice").over(wf).cast("double").alias("first_price"),
        F.last("o_totalprice").over(wf).cast("double").alias("last_price"),
        F.nth_value("o_totalprice", 2)
        .over(wf)
        .cast("double")
        .alias("second_price"),
        F.coalesce(
            F.lag("o_totalprice").over(wl), F.lit(-1.0)
        )
        .cast("double")
        .alias("prev_price"),
    )


@register(
    "customer_repeat_rate_by_nation",
    oracle="""
    WITH per AS (
      SELECT c_nationkey, c_custkey,
             CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY 1, 2)
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat,
           CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS repeat_rate,
           CAST(SUM(n_orders) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_orders
    FROM per JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name
    """,
)
def customer_repeat_rate_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase rate and order intensity per nation (customers
    with zero orders count in the base via the LEFT join — the retention
    denominator must include the inactive). Long-integer counters all
    the way; the two rates are single double divisions. One key shuffle
    for the per-customer rollup, then a dimension-bounded aggregate
    with the nation dimension broadcast."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    rep = F.when(F.col("n_orders") >= 2, 1).otherwise(0)
    return (
        per.join(F.broadcast(n), per["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(rep).cast("long").alias("n_repeat"),
            (
                F.sum(rep).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("repeat_rate"),
            (
                F.sum("n_orders").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_orders"),
        )
    )


@register(
    "cdc_two_batch_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             o_orderkey % 10 AS last
      FROM orders),
    snapshot AS (SELECT o_orderkey, price FROM base
                 WHERE last NOT IN (8, 9)),
    b1 AS (
      SELECT o_orderkey AS ck,
             CASE WHEN last = 8 THEN 'I' WHEN last = 0 THEN 'U'
                  ELSE 'D' END AS op,
             CASE WHEN last = 8 THEN price
                  WHEN last = 0 THEN price * CAST(1.1 AS DECIMAL(3,1))
                  ELSE NULL END AS nv
      FROM base WHERE last IN (8, 0, 1)),
    m1 AS (
      SELECT COALESCE(s.o_orderkey, c.ck) AS o_orderkey,
             CASE WHEN c.op IN ('I','U') THEN c.nv ELSE s.price END
               AS price
      FROM snapshot s FULL OUTER JOIN b1 c ON s.o_orderkey = c.ck
      WHERE c.op IS NULL OR c.op != 'D'),
    b2 AS (
      SELECT o_orderkey AS ck,
             CASE WHEN last = 9 THEN 'I' WHEN last = 3 THEN 'U'
                  ELSE 'D' END AS op,
             CASE WHEN last = 9 THEN price
                  WHEN last = 3 THEN price * CAST(1.1 AS DECIMAL(3,1))
                  ELSE NULL END AS nv
      FROM base WHERE last IN (9, 3, 2))
    SELECT COALESCE(m.o_orderkey, c.ck) AS o_orderkey,
           CAST(CASE WHEN c.op IN ('I','U') THEN c.nv
                     ELSE m.price END AS DOUBLE) AS price,
           COALESCE(c.op, 'K') AS op
    FROM m1 m FULL OUTER JOIN b2 c ON m.o_orderkey = c.ck
    WHERE c.op IS NULL OR c.op != 'D'
    """,
)
def cdc_two_batch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two consecutive CDC batches applied through operators/cdc.py —
    the incremental-snapshot lifecycle (batch 1: insert 8s, uplift 0s,
    delete 1s; batch 2: insert 9s, uplift 3s, delete 2s). Each merge is
    one full-outer key shuffle; chaining composes linearly (and goes
    exchange-free on bucketed layouts — the plan evidence in
    tests/test_round8_ops.py). The op column reports the LAST batch's
    action per row ('K' for rows batch 2 left alone). Prices stay in
    DECIMAL through both merges so the 1.1x uplifts are exact."""
    from ballista_extensions_spark.operators.cdc import cdc_merge

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    last = F.col("o_orderkey") % 10

    def batch(ins: int, upd: int, dele: int) -> DataFrame:
        return o.filter(last.isin(ins, upd, dele)).select(
            F.col("o_orderkey").alias("c_orderkey"),
            F.when(last == ins, F.lit("I"))
            .when(last == upd, F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("op"),
            F.when(last == ins, F.col("price"))
            .when(
                last == upd,
                F.col("price") * F.lit("1.1").cast("decimal(3,1)"),
            )
            .alias("new_price"),
        )

    snapshot = o.filter(~last.isin(8, 9))
    # merges chain DIRECTLY: cdc_merge's change-side references are
    # frame-qualified, so m1's op column needs no manual drop
    m1 = cdc_merge(
        snapshot, batch(8, 0, 1), "o_orderkey", "c_orderkey",
        {"price": "new_price"},
    )
    m2 = cdc_merge(
        m1, batch(9, 3, 2), "o_orderkey", "c_orderkey",
        {"price": "new_price"},
    )
    return m2.select(
        "o_orderkey",
        F.col("price").cast("double").alias("price"),
        "op",
    )


@register(
    "events_user_p95_value",
    oracle="""
    WITH v AS (
      SELECT user_id, value, event_id FROM events
      WHERE value IS NOT NULL)
    SELECT user_id,
           percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM v GROUP BY user_id
    """,
)
def events_user_p95_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user p95 event value over a HIGH-cardinality group key —
    the complement of grouped_percentile_disc (which exists for
    FEW-groups-over-many-rows, where a partitioned window caps
    parallelism at the group count). With thousands-to-billions of
    users, PARTITION BY user_id is the scale-correct plan: parallelism
    grows with keys, per-key state is one partition's rows. The target
    rank ceil(0.95*n) is selected in exact integer arithmetic
    (20*rn >= 19*n strictly first), so the picked VALUE matches
    PERCENTILE_DISC bit-for-bit."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "value", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    wn = Window.partitionBy("user_id")
    r = ev.select(
        "user_id",
        "value",
        # row_number() is IntegerType: cast to LONG before the 20x
        # multiply, which would otherwise wrap (non-ANSI) for a user
        # with >2^31/20 ~ 107M events — the same overflow class
        # grouped_percentile_disc guards with DECIMAL
        F.row_number().over(w).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    # smallest rn with 20*rn >= 19*n  <=>  rn = ceil(0.95*n)
    return r.filter(
        (20 * F.col("rn") >= 19 * F.col("n"))
        & (20 * (F.col("rn") - 1) < 19 * F.col("n"))
    ).select(
        "user_id",
        F.col("value").alias("p95"),
        F.col("n").cast("long").alias("n"),
    )
