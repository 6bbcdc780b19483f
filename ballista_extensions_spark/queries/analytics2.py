"""Round-5 analytics wave: customer segmentation (RFM), exact-moment
outlier detection, pivoted revenue matrices, cumulative shares, and
event-stream order statistics.

Exactness discipline (same as the rest of the surface): counts and
currency sums ride DECIMAL so no float ever accumulates in a
shuffle-order-dependent way; doubles appear only as final casts of
exact rationals or through IEEE-correctly-rounded ops (sqrt, a single
division), which are bit-identical across engines. Window orderings
always carry a unique tie-break key so ntile/rank assignment is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_extensions_spark.functions.exact import dsum, lcount
from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.queries.registry import register

_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
)


@register(
    "customer_rfm_segments_demo",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(o_orderkey) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey)
    SELECT c_custkey,
           CAST(NTILE(4) OVER (ORDER BY last_order, c_custkey) AS INT) AS r_bucket,
           CAST(NTILE(4) OVER (ORDER BY freq, c_custkey) AS INT) AS f_bucket,
           CAST(NTILE(4) OVER (ORDER BY monetary, c_custkey) AS INT) AS m_bucket,
           CAST(freq AS BIGINT) AS n_orders,
           CAST(monetary AS DOUBLE) AS total_spend
    FROM base
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic curation-adjacent scoring join:
    recency/frequency/monetary per customer, each quartiled by a
    deterministic (value, custkey) window. One shuffle for the
    aggregate; the three ntiles share one global sort (same partition:
    Catalyst computes all three windows in a single Window node chain).

    Registered under the ``_demo`` suffix DELIBERATELY (VERDICT r7):
    the global ntile is a single-task sort — of one row per customer
    (the aggregate, not the fact table), so it survives far longer
    than a fact-table window, but the customer dimension itself is
    billions of rows at 100 TB. The undecorated name
    ``customer_rfm_segments_scalable`` reconstructs the same quartiles
    from distributed_row_number + ntile_from_rank with no single-task
    stage and is the form to copy at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    base = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("o_orderkey").alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
    )
    wr = Window.orderBy("last_order", "c_custkey")
    wf = Window.orderBy("freq", "c_custkey")
    wm = Window.orderBy("monetary", "c_custkey")
    return base.select(
        "c_custkey",
        F.ntile(4).over(wr).cast("int").alias("r_bucket"),
        F.ntile(4).over(wf).cast("int").alias("f_bucket"),
        F.ntile(4).over(wm).cast("int").alias("m_bucket"),
        F.col("freq").cast("long").alias("n_orders"),
        F.col("monetary").cast("double").alias("total_spend"),
    )


@register(
    "customer_rfm_segments_scalable",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(o_orderkey) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey)
    SELECT c_custkey,
           CAST(NTILE(4) OVER (ORDER BY last_order, c_custkey) AS INT) AS r_bucket,
           CAST(NTILE(4) OVER (ORDER BY freq, c_custkey) AS INT) AS f_bucket,
           CAST(NTILE(4) OVER (ORDER BY monetary, c_custkey) AS INT) AS m_bucket,
           CAST(freq AS BIGINT) AS n_orders,
           CAST(monetary AS DOUBLE) AS total_spend
    FROM base
    """,
)
def customer_rfm_segments_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation with NO single-task window: the scale twin of
    customer_rfm_segments_demo. Each of the three quartile dimensions gets a
    global rank from distributed_row_number (operators/prefix.py —
    range partition, parallel per-partition rank, O(partitions) offset
    stitch), and NTILE(4) is reconstructed exactly from (rank, total)
    via ntile_from_rank, so the output is row-identical to the
    global-window form at any customer-dimension size. The per-customer
    aggregate materializes once (lazy localCheckpoint) and feeds all
    three rank passes; the three rank frames join back on c_custkey —
    three bounded key-shuffles of one row per customer."""
    from ballista_extensions_spark.operators.prefix import (
        distributed_row_number,
        ntile_from_rank,
    )

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    base = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("o_orderkey").alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
        .localCheckpoint(eager=False)
    )
    r = distributed_row_number(
        base.select("c_custkey", "last_order"),
        ["last_order", "c_custkey"],
        out_col="rn_r",
    ).select("c_custkey", "rn_r")
    f = distributed_row_number(
        base.select("c_custkey", "freq"), ["freq", "c_custkey"], out_col="rn_f"
    ).select("c_custkey", "rn_f")
    m = distributed_row_number(
        base.select("c_custkey", "monetary"),
        ["monetary", "c_custkey"],
        out_col="rn_m",
    ).select("c_custkey", "rn_m")
    totals = r.agg(F.max("rn_r").alias("n_total"))
    return (
        base.join(r, "c_custkey")
        .join(f, "c_custkey")
        .join(m, "c_custkey")
        .crossJoin(F.broadcast(totals))
        .select(
            "c_custkey",
            ntile_from_rank("rn_r", "n_total", 4).cast("int").alias("r_bucket"),
            ntile_from_rank("rn_f", "n_total", 4).cast("int").alias("f_bucket"),
            ntile_from_rank("rn_m", "n_total", 4).cast("int").alias("m_bucket"),
            F.col("freq").cast("long").alias("n_orders"),
            F.col("monetary").cast("double").alias("total_spend"),
        )
    )


@register("sketch_rollup_custkeys")  # HLL sketches -> rows-only check
def sketch_rollup_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority answered from MERGED HLL
    sketches (operators/sketches.py:hll_rollup): sketches are built per
    (priority, order year) — the persistable fine pre-aggregate — and
    the priority-level rollup unions them WITHOUT re-reading the fact
    table. The 100 TB distinct-count pattern: COUNT(DISTINCT) cannot be
    pre-aggregated, mergeable sketches can. Estimates are deterministic
    (max-register sketches are order-insensitive) but engine-specific,
    so the driver applies the rows-only check; pytest bounds the
    relative error against the exact count (~1.6% expected at
    lg_k=12)."""
    from ballista_extensions_spark.operators.sketches import hll_rollup

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").alias("order_year"),
        "o_custkey",
    )
    _fine, coarse = hll_rollup(
        o,
        ["o_orderpriority", "order_year"],
        ["o_orderpriority"],
        "o_custkey",
    )
    return coarse


@register("price_quantile_sketch_rollup")  # KLL sketches -> rows-only
def price_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag price quartiles answered from MERGED KLL sketches
    (operators/sketches.py:kll_quantile_rollup): sketches built per
    (returnflag, linestatus) — the persistable fine pre-aggregate —
    merge up to returnflag level without re-reading lineitem. The
    approximate, re-aggregatable complement of
    price_percentiles_scalable (exact, but one pass per question).
    Deterministic merge, engine-specific estimates -> rows-only;
    pytest bounds the rank error vs exact quantiles."""
    from ballista_extensions_spark.operators.sketches import (
        kll_quantile_rollup,
    )

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    _fine, coarse = kll_quantile_rollup(
        l,
        ["l_returnflag", "l_linestatus"],
        ["l_returnflag"],
        "l_extendedprice",
        [0.25, 0.5, 0.75],
    )
    return coarse


@register("custkey_overlap_sketch")  # theta sketches -> rows-only
def custkey_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-set overlap between order priorities via theta-sketch
    set algebra (operators/sketches.py:theta_overlap): one pass builds
    a sketch per priority; intersections and containment come from the
    sketches, not from N^2 distinct-joins over orders — the
    cross-source contamination / audience-overlap primitive at corpus
    scale. Rows-only (estimates are engine-specific); pytest bounds
    the error vs exact intersections."""
    from ballista_extensions_spark.operators.sketches import theta_overlap

    o = load_table(spark, sf_dir, "orders")
    return theta_overlap(o, "o_orderpriority", "o_custkey")


@register(
    "price_percentiles_scalable",
    oracle="""
    WITH q AS (
      SELECT quantile_disc(l_extendedprice, [0.25, 0.5, 0.75, 0.9]) AS qs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem),
    p AS (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS prob,
                 unnest([1, 1, 3, 9]) AS num,
                 unnest([4, 2, 4, 10]) AS den,
                 unnest([1, 2, 3, 4]) AS i)
    SELECT CAST(p.prob AS DOUBLE) AS prob, q.qs[p.i] AS l_extendedprice,
           CAST((p.num * q.n + p.den - 1) // p.den AS BIGINT) AS rank,
           q.n AS n
    FROM q, p
    """,
)
def price_percentiles_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact whole-fact-table discrete percentiles with no single-task
    sort or single-reducer percentile buffer
    (operators/prefix.py:distributed_percentile_disc): the global rank
    comes from the range-partitioned two-phase scan, the SQL-standard
    target rank ceil(p*n) is exact integer arithmetic on both sides
    (the oracle's rank uses integer num/den division, never a float
    p*n), and the result is the tiny rank-filter join. DuckDB's
    quantile_disc shares the ceil(p*n) convention, so values are
    identical."""
    from ballista_extensions_spark.operators.prefix import (
        distributed_percentile_disc,
    )

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return distributed_percentile_disc(
        l,
        "l_extendedprice",
        [0.25, 0.5, 0.75, 0.9],
        tiebreak_cols=("l_orderkey", "l_linenumber"),
    )


@register(
    "acctbal_zscore_outliers",
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))
                 * CAST(c_acctbal AS DECIMAL(18,2))) AS ss
      FROM customer)
    SELECT c_custkey, c_acctbal,
           CAST(n * CAST(c_acctbal AS DECIMAL(18,2)) - s AS DOUBLE)
             / sqrt(CAST(n * ss - s * s AS DOUBLE)
                    * CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1))
             AS zscore
    FROM customer, m
    WHERE abs(CAST(n * CAST(c_acctbal AS DECIMAL(18,2)) - s AS DOUBLE)
              / sqrt(CAST(n * ss - s * s AS DOUBLE)
                     * CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1)))
          > 1.5
    """,
)
def acctbal_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier detection with EXACT moments: sum and sum-of-squares
    accumulate in DECIMAL (order-independent, no float drift across
    shuffle orders). z = (x - mean)/stddev is algebraically rescaled by
    n to (n*x - s) / sqrt((n*ss - s^2) * n/(n-1)) so the EXACT integers
    n*x - s and n*ss - s^2 are formed in decimal (no decimal DIVISION —
    engines round division scales differently) and every division/sqrt
    happens in IEEE doubles on identical inputs — bit-identical in any
    engine. Two-pass shape: tiny moment aggregate broadcast back over
    the scan, the textbook distributed z-score."""
    c = load_table(spark, sf_dir, "customer")
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    m = c.agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("ss"),
    )
    n_d = F.col("n").cast("double")
    num = (F.col("n") * dec - F.col("s")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
        * n_d
        / (n_d - 1)
    )
    z = num / den
    return (
        c.crossJoin(F.broadcast(m))
        .select("c_custkey", "c_acctbal", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > 1.5)
    )


@register(
    "brand_year_revenue",
    oracle=f"""
    SELECT p_brand,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand, EXTRACT(year FROM l_shipdate)
    """,
)
def brand_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand x ship-year revenue matrix: fact-to-dimension broadcast
    join (part is small per brand cardinality) then a two-key decimal
    aggregate — the pre-pivot long form, which is the scalable shape
    (a wide pivot materializes one column per brand; the long form
    shuffles one row per group and pivots at presentation time)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand", F.year("l_shipdate").cast("int").alias("ship_year")
        )
        .agg(
            F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"),
            lcount("n_items"),
        )
    )


@register(
    "orders_running_share",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment AS segment, o_orderkey, o_orderdate,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders JOIN customer ON o_custkey = c_custkey),
    tot AS (SELECT segment, SUM(price) AS seg_total FROM seg GROUP BY segment)
    SELECT s.segment, o_orderkey,
           CAST(SUM(price) OVER (PARTITION BY s.segment
                                 ORDER BY o_orderdate, o_orderkey)
                AS DOUBLE) AS cum_spend,
           CAST(CAST(SUM(price) OVER (PARTITION BY s.segment
                                      ORDER BY o_orderdate, o_orderkey)
                     AS DOUBLE)
                / CAST(seg_total AS DOUBLE) AS DOUBLE) AS cum_share
    FROM seg s JOIN tot t ON s.segment = t.segment
    WHERE o_orderdate < TIMESTAMP '1996-01-01'
    """,
)
def orders_running_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue share per market segment: decimal running sum
    over a deterministic (date, orderkey) window divided by the
    segment total (broadcast). The early-date filter keeps the demo
    window small; the plan shape — partitioned cumulative window +
    tiny-aggregate broadcast join — is the scalable one (no global
    sort; each segment sorts independently)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_mktsegment").alias("segment"),
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    tot = seg.groupBy("segment").agg(F.sum("price").alias("seg_total"))
    w = (
        Window.partitionBy("segment")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("price").over(w).cast("double")
    return (
        seg.join(F.broadcast(tot), "segment")
        .select(
            "segment",
            "o_orderkey",
            cum.alias("cum_spend"),
            (cum / F.col("seg_total").cast("double")).alias("cum_share"),
            "o_orderdate",
        )
        .filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        .drop("o_orderdate")
    )


@register(
    "events_top_hour_per_user",
    oracle="""
    WITH hourly AS (
      SELECT user_id, CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
             COUNT(*) AS n
      FROM events GROUP BY user_id, EXTRACT(hour FROM ts))
    SELECT user_id, hour AS top_hour, CAST(n AS BIGINT) AS n_events
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY n DESC, hour) AS rn
          FROM hourly)
    WHERE rn = 1
    """,
)
def events_top_hour_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user argmax over an hour-of-day histogram (most active hour;
    earliest hour wins ties — deterministic). Two map-side-combined
    aggregates and one small window; nothing global."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "user_id", F.hour("ts").cast("int").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("hour")
    )
    return (
        hourly.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("hour").alias("top_hour"),
            F.col("n").cast("long").alias("n_events"),
        )
    )


@register(
    "events_out_of_order_stats",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_ts > ts THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inversions
    FROM seq GROUP BY user_id
    """,
)
def events_out_of_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disorder profile of the event stream: per user, how many events
    arrived (by event_id sequence) with a timestamp EARLIER than their
    predecessor — the quantity a streaming watermark must absorb. One
    keyed window + aggregate; this is the batch twin of the
    watermark-lateness accounting in streaming/ops.py."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = e.select(
        "user_id", "event_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    return seq.groupBy("user_id").agg(
        lcount("n_events"),
        F.sum(
            F.when(F.col("prev_ts") > F.col("ts"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_inversions"),
    )


@register(
    "year_over_year_revenue",
    oracle=f"""
    WITH yearly AS (
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
             SUM({_DISC_PRICE}) AS rev
      FROM lineitem GROUP BY EXTRACT(year FROM l_shipdate))
    SELECT ship_year,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(CAST(rev AS DOUBLE)
                / CAST(LAG(rev) OVER (ORDER BY ship_year) AS DOUBLE)
                AS DOUBLE) AS yoy_ratio
    FROM yearly
    """,
)
def year_over_year_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth: decimal yearly revenue, then a lag window
    over the handful of year rows. The ratio divides two exactly-cast
    doubles — bit-stable. First year's ratio is NULL by construction."""
    l = load_table(spark, sf_dir, "lineitem")
    yearly = l.groupBy(
        F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(F.sum(F.expr(_DISC_PRICE)).alias("rev"))
    w = Window.orderBy("ship_year")
    rev_d = F.col("rev").cast("double")
    return yearly.select(
        "ship_year",
        rev_d.alias("revenue"),
        (rev_d / F.lag(F.col("rev")).over(w).cast("double")).alias(
            "yoy_ratio"
        ),
    )


@register(
    "cumulative_revenue_scalable",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (ORDER BY o_orderdate, o_orderkey)
                AS DOUBLE) AS cum_revenue
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1995
    """,
)
def cumulative_revenue_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL cumulative revenue with NO single-partition window: the
    two-phase distributed prefix sum (operators/prefix.py) — range
    partition on (date, orderkey), per-partition running decimal sum,
    O(num_partitions) driver offsets broadcast back. The oracle is the
    textbook global window; results are bit-identical because decimal
    addition is order-free. This is the plan shape that survives a
    100 TB fact table — WindowExec's \"No Partition Defined\" all-to-one
    path never appears."""
    from ballista_extensions_spark.operators.prefix import distributed_cumsum

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
    )
    out = distributed_cumsum(
        o, ["o_orderdate", "o_orderkey"], "price", out_col="cum"
    )
    return out.select(
        "o_orderkey", F.col("cum").cast("double").alias("cum_revenue")
    )


@register(
    "customer_rank_scalable",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey)
                AS BIGINT) AS wealth_rank
    FROM customer
    """,
)
def customer_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ROW_NUMBER with per-partition parallelism: range partition
    on the (-acctbal, custkey) total order, per-partition row_number,
    exclusive prefix of partition COUNTS added back as offsets. Driver
    state is one count per partition. Deterministic because the order is
    total (custkey tiebreak)."""
    from ballista_extensions_spark.operators.prefix import (
        distributed_row_number,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        (-F.col("c_acctbal")).alias("__neg_bal"),
    )
    out = distributed_row_number(
        c, ["__neg_bal", "c_custkey"], out_col="wealth_rank"
    )
    return out.select("c_custkey", "c_acctbal", "wealth_rank")
