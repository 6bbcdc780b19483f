"""Advanced analytics surface: multi-dimensional aggregation (ROLLUP/
CUBE — the hypertable-rollup pattern), correlated subqueries, disjunctive
predicate pushdown, pivot, and the scalar string/date function library.

These extend the Tier-B/C operator coverage with plan shapes the TPC-H
set doesn't exercise; every query here is oracle-checked.
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
    "rollup_revenue",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation — subtotals per flag and the grand total (the
    hypertable-rollup pattern: one scan produces every granularity;
    Spark expands grouping sets in a single Expand+Aggregate, no rescan).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"),
        lcount("n_items"),
    )


@register(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — all 2^2 grouping sets in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        lcount("n_orders"),
        dsum(F.col("o_totalprice"), "total"),
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) with grouping()
    indicator columns — disambiguates data NULLs from subtotal NULLs."""
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("bx_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM bx_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "price_buckets",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice >= 500000 THEN 11
                     WHEN o_totalprice < 0 THEN 0
                     ELSE 1 + floor(o_totalprice / 50000.0) END AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket histogram of order prices (equi-width bins; the
    oracle spells out the same floor arithmetic — DuckDB 1.0 has no
    width_bucket function)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.expr("CAST(width_bucket(o_totalprice, 0, 500000, 10) AS BIGINT)").alias(
            "bucket"
        )
    ).agg(
        lcount("n_orders"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


@register(
    "null_safe_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_extendedprice / NULLIF(l_discount, 0.0) AS DOUBLE)
             AS price_per_discount,
           CAST(COALESCE(TRY_CAST(l_returnflag AS BIGINT), -1) AS BIGINT)
             AS flag_as_int,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
)
def null_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe arithmetic: try_divide semantics (NULL on zero), failed
    casts to NULL with a default, modulo."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.nullif(F.col("l_discount"), F.lit(0.0))
        )
        .cast("double")
        .alias("price_per_discount"),
        F.coalesce(F.col("l_returnflag").try_cast("long"), F.lit(-1))
        .cast("long")
        .alias("flag_as_int"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                                       / CAST(COUNT(l2.l_quantity) AS DOUBLE))
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (avg per part) — Catalyst
    decorrelates into an aggregate + join; the per-part average uses the
    exact decimal-sum/count form on both sides."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("l_quantity").cast("double")
        ).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS total,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 170)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY total DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: HAVING-filtered semi join (large-quantity orders).

    Scale: the semi join applies to ``orders`` BEFORE the customer and
    lineitem joins — at fact scale the big-order filter is ~1e-4
    selective, so filtering first shrinks both subsequent shuffles
    instead of filtering the widest intermediate at the end."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 170)
        .select("l_orderkey")
    )
    o_big = o.join(
        big.withColumnRenamed("l_orderkey", "big_key"),
        F.col("o_orderkey") == F.col("big_key"),
        "left_semi",
    )
    return (
        c.join(o_big, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), "sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("total"),
            "sum_qty",
        )
        .orderBy(F.col("total").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted: disjunctive multi-clause predicates — Catalyst
    extracts the common p_partkey join and pushes the OR-of-ANDs below
    the join where possible."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"),
            lcount("n_items"),
        )
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year — two aliases of the same
    dimension joined under a symmetric disjunction."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    cond = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        s.join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(cond)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(F.expr(_DISC_PRICE)).cast("double").alias("revenue"))
    )


@register(
    "pivot_segment_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'  THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS building,
           CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS machinery,
           CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS automobile
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def pivot_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-nation account balance by market segment (fixed pivot
    values -> stable schema; Spark's groupBy().pivot(values=...) plans a
    single aggregate, no per-value rescan)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    piv = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .pivot("c_mktsegment", ["BUILDING", "MACHINERY", "AUTOMOBILE"])
        .agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"))
    )
    return piv.select(
        "n_name",
        F.col("BUILDING").alias("building"),
        F.col("MACHINERY").alias("machinery"),
        F.col("AUTOMOBILE").alias("automobile"),
    )


@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up_name,
           lower(c_mktsegment) AS lo_seg,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, '#', '-') AS name_dash,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           reverse(c_mktsegment) AS rev_seg,
           concat(c_mktsegment, ':', c_name) AS seg_name,
           CAST(strpos(c_name, '1') AS BIGINT) AS pos_one,
           trim(concat('  ', c_name, '  ')) AS trimmed
    FROM customer
    WHERE c_custkey <= 200
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function library parity (upper/lower/length/substr/
    replace/lpad/reverse/concat/instr/trim)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("c_name", "#", "-").alias("name_dash"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.reverse("c_mktsegment").alias("rev_seg"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.instr(F.col("c_name"), "1").cast("long").alias("pos_one"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(day(o_orderdate) AS BIGINT) AS d,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
             AS days_since_95
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time function library parity (year/month/day/quarter/
    dayofyear/date_trunc/interval arithmetic/datediff)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("long").alias("days_since_95"),
    )


@register(
    "window_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS moving3_spend,
           CAST(LAG(o_orderkey) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS prev_order,
           CAST(LEAD(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS next_order,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS first_order
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: running + moving-window decimal-exact sums,
    lag/lead with default, first_value — one shuffle on the partition
    key, per-partition ordered evaluation (deterministic tie-break via
    o_orderkey in the ORDER BY)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    wb = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = wb.rowsBetween(-2, Window.currentRow)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(run).cast("double").alias("running_spend"),
        F.sum(dec).over(mov).cast("double").alias("moving3_spend"),
        F.lag("o_orderkey").over(wb).cast("long").alias("prev_order"),
        F.lead("o_orderkey", 1, -1).over(wb).cast("long").alias("next_order"),
        F.first("o_orderkey").over(wb).alias("first_order"),
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id AS last_event_id, ts AS last_ts,
           event_type AS last_type
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax dedup — keep each user's latest event (the canonical
    compaction/upsert-read pattern; QUALIFY semantics via row_number)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
        )
    )


@register(
    "unpivot_balances",
    oracle="""
    WITH agg AS (
      SELECT n_name,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS customer_bal,
             CAST(0.0 AS DOUBLE) AS placeholder
      FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name)
    SELECT n_name, kind, amount
    FROM agg UNPIVOT (amount FOR kind IN (customer_bal, placeholder))
    """,
)
def unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-nation aggregates to long (kind, amount)
    rows — Spark's unpivot == DuckDB's UNPIVOT (both drop NULL cells by
    default; none exist here)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    agg = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("customer_bal"),
            F.lit(0.0).alias("placeholder"),
        )
    )
    return agg.unpivot(
        ids=["n_name"],
        values=["customer_bal", "placeholder"],
        variableColumnName="kind",
        valueColumnName="amount",
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                'max') AS DOUBLE) AS max_val,
           round(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[1], 4)
             AS smallest1,
           round(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[2], 4)
             AS smallest2,
           round(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[3], 4)
             AS smallest3,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function library parity over real vector data: element
    access (1-based both engines), sort, slice, filter, max — rounded
    where float->double formatting could differ textually (round(x,4) on
    exact doubles is deterministic). The three smallest elements are
    emitted as SCALAR columns, not an array: the driver's canonicalizer
    sorts collected values with pandas, and list cells are unhashable
    there (CORRECTNESS_r03 `array_functions` failure)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    dbl = "transform(embedding, x -> CAST(x AS DOUBLE))"
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.expr("CAST(element_at(embedding, 1) AS DOUBLE)").alias("first_val"),
        F.expr(f"array_max({dbl})").alias("max_val"),
        F.expr(f"round(array_sort({dbl})[0], 4)").alias("smallest1"),
        F.expr(f"round(array_sort({dbl})[1], 4)").alias("smallest2"),
        F.expr(f"round(array_sort({dbl})[2], 4)").alias("smallest3"),
        F.expr("size(filter(embedding, x -> x > 0))").cast("long").alias(
            "n_positive"
        ),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT o_orderkey,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS prank,
           cume_dist() OVER w AS cdist
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family: dense_rank / ntile / percent_rank /
    cume_dist (exact small-int ratios -> engine-identical doubles)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "median_order_price",
    oracle="""
    SELECT o_orderpriority,
           CAST(median(o_totalprice) AS DOUBLE) AS med_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def median_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (Spark `median` == DuckDB `median`:
    midpoint interpolation of two exact 2-decimal doubles is exact)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").cast("double").alias("med_price"),
        lcount("n"),
    )


@register(
    "stats_corr_covar",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           (sxy - sx * sy / n) / (n - 1) AS covar_samp,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty
    FROM s
    """,
)
def stats_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr/covar_samp/stddev) with bit-exact
    cross-engine parity: built-in corr()/covar() use streaming algorithms
    whose floating-point accumulation order differs between engines, so
    both sides compute the moment sums EXACTLY (decimal, order-free) and
    derive the statistics with the same double-arithmetic expression tree
    — identical IEEE operations on identical inputs give identical bits.
    Scale: one map-side-combined shuffle, same as any groupBy."""
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(d).cast("double").alias("sy"),
        F.sum(q * d).cast("double").alias("sxy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(d * d).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_samp"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
    )


@register(
    "percentile_disc_prices",
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.25) AS p25,
           quantile_disc(o_totalprice, 0.50) AS p50,
           quantile_disc(o_totalprice, 0.75) AS p75,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles per group: percentile_disc picks an
    ACTUAL data value (no interpolation), so engine/oracle agreement is
    value-identity, immune to floating-point interpolation differences.
    Scale: Spark evaluates grouped percentiles with a sort-based agg —
    one shuffle on the group key."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("bx_pctl_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS p50,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS p75,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM bx_pctl_orders GROUP BY o_orderpriority
        """
    )


@register(
    "ntile_customer_quartiles",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT)
             AS quartile
    FROM customer
    """,
)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing over a TOTAL order (acctbal, custkey tiebreak) —
    the deterministic-parity requirement for rank-family functions.
    Computed at scale: TPC-H customer grows with SF (billions of rows at
    100 TB), so the rank comes from distributed_row_number
    (operators/prefix.py — range partition + per-partition window +
    O(partitions) offsets), and the quartile is reconstructed from
    (rank, total) with the exact NTILE fill rule (ntile_from_rank) —
    row-identical to ``NTILE(4) OVER (ORDER BY ...)`` with NO
    single-task global sort."""
    from ballista_extensions_spark.operators.prefix import (
        distributed_row_number,
        ntile_from_rank,
    )

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = distributed_row_number(
        c, ["c_acctbal", "c_custkey"], out_col="__rn"
    )
    totals = ranked.agg(F.max("__rn").alias("__n_total"))
    return (
        ranked.crossJoin(F.broadcast(totals))
        .select(
            "c_custkey",
            "c_acctbal",
            ntile_from_rank("__rn", "__n_total", 4).cast("long").alias("quartile"),
        )
    )


@register(
    "events_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           lag(event_id) OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def events_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead neighbor access per user timeline; the gap is computed in
    integer microseconds (unix_micros == DuckDB epoch_us) so timestamps
    never round-trip through doubles. Scale: one shuffle on user_id; the
    per-user sort rides the same exchange."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return e.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (us - F.lag(us).over(w)).cast("long").alias("gap_us"),
    )


@register(
    "filtered_agg_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 250000) AS BIGINT)
             AS n_big,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
    FROM orders GROUP BY o_orderpriority
    """,
)
def filtered_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (ANSI FILTER clause == count_if/sum(when)):
    conditional counts and sums plus a distinct count in one pass — one
    shuffle, map-side partials; count-distinct expands to a two-phase
    agg on (group, custkey)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("count_if(o_totalprice > 250000)").cast("long").alias("n_big"),
        F.sum(
            F.when(
                F.col("o_orderstatus") == "F",
                F.col("o_totalprice").cast("decimal(18,2)"),
            )
        )
        .cast("double")
        .alias("sum_f"),
        F.countDistinct("o_custkey").cast("long").alias("n_cust"),
    )


@register(
    "salted_join_revenue",
    oracle="""
    SELECT s_nationkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join (functions/skew.py:salted_join): the fact side
    is salted into 8 buckets, the dim side replicated once per salt, so a
    hot supplier key spreads over 8 tasks. The oracle is the PLAIN join —
    salting must preserve multiplicity exactly, and this query proves it
    against the oracle. At local test scale AQE would broadcast this join
    anyway; the salted shape is the 100 TB fallback when the dim side is
    modest but the fact side has pathological hot keys."""
    from ballista_extensions_spark.functions.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_nationkey"
    )
    return (
        salted_join(l, s, "suppkey", salt_buckets=8)
        .groupBy("s_nationkey")
        .agg(
            dsum(F.col("l_extendedprice"), "revenue"),
            lcount("n_items"),
        )
    )


@register(
    "event_funnel",
    oracle="""
    WITH u AS (SELECT user_id,
                      min(ts) FILTER (WHERE event_type = 'view') AS t_view,
                      min(ts) FILTER (WHERE event_type = 'click') AS t_click,
                      min(ts) FILTER (WHERE event_type = 'purchase') AS t_buy
               FROM events GROUP BY user_id),
         c AS (SELECT
                 CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT)
                   AS s1,
                 CAST(COUNT(*) FILTER (WHERE t_view < t_click) AS BIGINT)
                   AS s2,
                 CAST(COUNT(*) FILTER (WHERE t_view < t_click
                                         AND t_click < t_buy) AS BIGINT)
                   AS s3
               FROM u)
    SELECT 'view' AS stage, s1 AS n_users FROM c
    UNION ALL SELECT 'view>click', s2 FROM c
    UNION ALL SELECT 'view>click>purchase', s3 FROM c
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-stage conversion funnel (view -> click -> purchase) by
    first-occurrence ordering per user — the canonical product-analytics
    rollup. One shuffle (groupBy user) with map-side-combined conditional
    mins, then a driver-free global fold; NULL min comparisons are
    three-valued in both engines, so no-stage users drop out identically.
    Scale: user-keyed pre-aggregation is the skew-safe shape (no per-event
    window)."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_buy"
        ),
    )
    c = u.agg(
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("t_view") < F.col("t_click"), 1).otherwise(0))
        .cast("long")
        .alias("s2"),
        F.sum(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_buy")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("s3"),
    )
    return c.selectExpr(
        "stack(3, 'view', s1, 'view>click', s2, 'view>click>purchase', s3) "
        "AS (stage, n_users)"
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH wk AS (SELECT user_id,
                       (epoch_us(ts) // 86400000000) // 7 AS week_idx
                FROM events),
         cohort AS (SELECT user_id, MIN(week_idx) AS cohort_week
                    FROM wk GROUP BY user_id)
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(week_idx - cohort_week AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT wk.user_id) AS BIGINT) AS n_users
    FROM wk JOIN cohort ON wk.user_id = cohort.user_id
    GROUP BY cohort_week, week_idx - cohort_week
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: cohort = week of a user's first
    event, cell = distinct users from that cohort active k weeks later.
    Week index is integer µs arithmetic (unix_micros DIV), not
    date_trunc, so engine week-start conventions can't diverge. Two
    shuffles (per-user min, then cohort-cell distinct count); the cohort
    table is user-keyed and joins back broadcast-or-shuffle per AQE's
    size call."""
    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        "user_id",
        F.expr("unix_micros(ts) DIV 86400000000 DIV 7").alias("week_idx"),
    )
    cohort = wk.groupBy("user_id").agg(
        F.min("week_idx").alias("cohort_week")
    )
    return (
        wk.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            (F.col("week_idx") - F.col("cohort_week"))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@register(
    "lateral_top_customers",
    oracle="""
    SELECT n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal
    FROM nation,
    LATERAL (SELECT c_name, c_acctbal FROM customer
             WHERE c_nationkey = n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 3) c
    """,
)
def lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — top-3 customers per nation, the
    per-group-top-k shape expressed as a lateral join rather than a
    window (Spark 4 supports LATERAL with correlation in WHERE; Catalyst
    decorrelates it into the same ranked-window plan, so there is no
    nested-loop at execution). Deterministic via the (acctbal DESC,
    c_name) tie-break; TPC-H customer names are unique."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    n.createOrReplaceTempView("bx_lat_nation")
    c.createOrReplaceTempView("bx_lat_customer")
    return spark.sql(
        """
        SELECT n_name, c.c_name, CAST(c.c_acctbal AS DOUBLE) AS acctbal
        FROM bx_lat_nation,
        LATERAL (SELECT c_name, c_acctbal FROM bx_lat_customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 3) c
        """
    )


@register(
    "year_spine_order_counts",
    oracle="""
    WITH RECURSIVE years(y) AS (
      SELECT CAST(MIN(year(o_orderdate)) AS INT) FROM orders
      UNION ALL
      SELECT y + 1 FROM years
      WHERE y < (SELECT MAX(year(o_orderdate)) FROM orders)),
    counts AS (
      SELECT year(o_orderdate) AS y, COUNT(*) AS n
      FROM orders GROUP BY 1)
    SELECT CAST(yr.y AS BIGINT) AS year,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
    FROM years yr LEFT JOIN counts c ON yr.y = c.y
    """,
)
def year_spine_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling date spine via RECURSIVE CTE (Spark 4's WITH
    RECURSIVE): generate every year between the corpus min and max and
    left-join per-year order counts, so empty years surface as explicit
    zero rows — the canonical time-series densification shape.

    Granularity is deliberately YEARS, not months: Spark executes one
    job per recursion step (~0.25 s each on local[*] regardless of data
    size — measured 19 s for an 80-step month spine vs ~2 s for the
    7-step year spine), so spine depth, not data volume, is the cost
    driver. For fine-grained spines use sequence()+explode (constant
    jobs); the recursive form is registered to exercise the SQL
    surface."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("bx_spine_orders")
    return spark.sql(
        """
        WITH RECURSIVE years(y) AS (
          SELECT CAST(MIN(year(o_orderdate)) AS INT) FROM bx_spine_orders
          UNION ALL
          SELECT y + 1 FROM years
          WHERE y < (SELECT MAX(year(o_orderdate)) FROM bx_spine_orders)),
        counts AS (
          SELECT year(o_orderdate) AS y, COUNT(*) AS n
          FROM bx_spine_orders GROUP BY 1)
        SELECT CAST(yr.y AS BIGINT) AS year,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_orders
        FROM years yr LEFT JOIN counts c ON yr.y = c.y
        """
    )


@register(
    "pagerank_trade_graph",
    oracle="""
    WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                WHERE o_custkey <= 200),
    edges AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM edges GROUP BY u),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
    s1 AS (SELECT e.v AS node, SUM(r0.pr // d.d) AS m
           FROM edges e JOIN r0 ON r0.node = e.u JOIN deg d ON d.node = e.u
           GROUP BY e.v),
    r1 AS (SELECT n.node,
                  CAST(150000 + (850000 * COALESCE(s1.m, 0)) // 1000000
                       AS BIGINT) AS pr
           FROM nodes n LEFT JOIN s1 ON n.node = s1.node),
    s2 AS (SELECT e.v AS node, SUM(r1.pr // d.d) AS m
           FROM edges e JOIN r1 ON r1.node = e.u JOIN deg d ON d.node = e.u
           GROUP BY e.v),
    r2 AS (SELECT n.node,
                  CAST(150000 + (850000 * COALESCE(s2.m, 0)) // 1000000
                       AS BIGINT) AS pr
           FROM nodes n LEFT JOIN s2 ON n.node = s2.node),
    s3 AS (SELECT e.v AS node, SUM(r2.pr // d.d) AS m
           FROM edges e JOIN r2 ON r2.node = e.u JOIN deg d ON d.node = e.u
           GROUP BY e.v),
    r3 AS (SELECT n.node,
                  CAST(150000 + (850000 * COALESCE(s3.m, 0)) // 1000000
                       AS BIGINT) AS pr
           FROM nodes n LEFT JOIN s3 ON n.node = s3.node)
    SELECT node, pr AS pr_millionths FROM r3
    """,
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three PageRank steps over the (undirected) customer-supplier
    trade graph (operators/components.py:pagerank_integer) — iterative
    graph analytics with integer-exact arithmetic, so the driver-loop
    schedule cross-checks bit-for-bit against the oracle's unrolled
    CTE chain. Customer nodes are 2k, supplier nodes 2k+1 (disjoint id
    spaces); o_custkey <= 200 bounds the demo graph."""
    from ballista_extensions_spark.operators.components import (
        pagerank_integer,
    )

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    l = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return pagerank_integer(edges, iterations=3)


@register(
    "edit_distance_neighbors",
    oracle="""
    SELECT a.doc_id,
           CAST(levenshtein(substring(a.text, 1, 80),
                            substring(b.text, 1, 80)) AS BIGINT) AS edit_80,
           CAST(length(a.text) AS BIGINT) AS len_a,
           CAST(length(b.text) AS BIGINT) AS len_b
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
)
def edit_distance_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance between consecutive documents' 80-char
    prefixes — the character-level verification stage a near-dup
    pipeline runs on candidate pairs (bounded prefix keeps the O(m*n)
    DP cost constant per pair; unweighted edit distance is
    engine-identical integer semantics). Self-join on adjacent ids is
    an equi-join — broadcast-or-shuffle per AQE."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select("doc_id", F.expr("substring(text, 1, 80)").alias("pa"),
                 F.length("text").cast("long").alias("len_a"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"),
                 F.expr("substring(text, 1, 80)").alias("pb"),
                 F.length("text").cast("long").alias("len_b"))
    return a.join(b, "doc_id").select(
        "doc_id",
        F.levenshtein("pa", "pb").cast("long").alias("edit_80"),
        "len_a",
        "len_b",
    )


@register(
    "sliding_hour_value_sums",
    oracle="""
    SELECT event_id,
           user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                  PARTITION BY user_id ORDER BY epoch_us(ts)
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS hour_sum
    FROM events
    WHERE user_id <= 200
    """,
)
def sliding_hour_value_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based sliding aggregate via a RANGE window frame over
    integer microseconds (trailing 1 hour per user) — the time-series
    rolling-sum shape; RANGE frames over µs integers sidestep engine
    interval-arithmetic differences, and the decimal cast makes the
    windowed double sum order-independent. One shuffle on the partition
    key."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 200)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(ts)"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("hour_sum"),
    )


@register(
    "bitwise_agg_keys",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_orderkey) AS BIGINT) AS key_and,
           CAST(bit_or(l_orderkey) AS BIGINT) AS key_or,
           CAST(bit_xor(l_orderkey) AS BIGINT) AS key_xor,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def bitwise_agg_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate functions (bit_and/or/xor) — order-independent
    integer folds, map-side combinable; XOR aggregation is the classic
    set-difference checksum for reconciling two copies of a keyset."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("bit_and(l_orderkey)").cast("long").alias("key_and"),
        F.expr("bit_or(l_orderkey)").cast("long").alias("key_or"),
        F.expr("bit_xor(l_orderkey)").cast("long").alias("key_xor"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "explode_outer_tokens",
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN NULL
                  WHEN doc_id % 10 = 1 THEN []
                  ELSE string_split_regex(substring(text, 1, 30), '\s+')
             END AS arr
      FROM documents WHERE doc_id < 100)
    SELECT doc_id,
           unnest(CASE WHEN arr IS NULL OR len(arr) = 0
                       THEN [NULL] ELSE arr END) AS token
    FROM base
    """,
)
def explode_outer_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: NULL and empty arrays keep their parent
    row (one null token) instead of vanishing — the outer-unnest
    behavior ETL needs to not silently drop records; the oracle emulates
    it with a CASE-wrapped unnest. Narrow fan-out, no shuffle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    base = d.select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 10 = 0 THEN NULL "
            "WHEN doc_id % 10 = 1 THEN array() "
            r"ELSE split(substring(text, 1, 30), '\\s+') END"
        ).alias("arr"),
    )
    return base.select("doc_id", F.explode_outer("arr").alias("token"))


@register(
    "hourly_anomaly_flags",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS hour_idx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, hour_idx, n,
             CAST(SUM(n) OVER w AS BIGINT) AS sum_n,
             CAST(SUM(n * n) OVER w AS BIGINT) AS sum_n2,
             CAST(COUNT(*) OVER w AS BIGINT) AS w_n
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type, hour_idx, n,
           sum_n, w_n,
           (CAST(n AS DOUBLE) - CAST(sum_n AS DOUBLE) / CAST(w_n AS DOUBLE))
             AS deviation,
           (CAST(w_n AS DOUBLE) * n - sum_n) * (CAST(w_n AS DOUBLE) * n - sum_n)
             > 4.0 * (CAST(w_n AS DOUBLE) * sum_n2 - CAST(sum_n AS DOUBLE) * sum_n)
             AS is_anomaly
    FROM stats WHERE w_n >= 6
    """,
)
def hourly_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection on hourly event volumes: flag
    hours where the count deviates more than ~2 sigma from the prior
    24 hours. The test is algebraically rearranged to avoid sqrt and
    division — (w*n - sum)^2 > 4*(w*sum2 - sum^2) is z^2 > 4 scaled by
    w^2*var denominators — so every comparison is double arithmetic on
    exact integers, bit-identical across engines. Two shuffles: the
    hourly rollup (map-side combined) and the per-type window sort.
    Warm-up hours (fewer than 6 prior samples) are excluded."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            F.expr("unix_micros(ts) DIV 3600000000").alias("hour_idx"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(-24, -1)
    )
    stats = hourly.select(
        "event_type",
        "hour_idx",
        "n",
        F.sum("n").over(w).cast("long").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("long").alias("sum_n2"),
        F.count(F.lit(1)).over(w).cast("long").alias("w_n"),
    ).filter(F.col("w_n") >= 6)
    wn_d = F.col("w_n").cast("double")
    n_d = F.col("n").cast("double")
    sum_d = F.col("sum_n").cast("double")
    lhs = (wn_d * n_d - sum_d) * (wn_d * n_d - sum_d)
    rhs = 4.0 * (wn_d * F.col("sum_n2").cast("double") - sum_d * sum_d)
    return stats.select(
        "event_type",
        "hour_idx",
        "n",
        "sum_n",
        "w_n",
        (n_d - sum_d / wn_d).alias("deviation"),
        (lhs > rhs).alias("is_anomaly"),
    )


@register(
    "null_safe_join_segments",
    oracle="""
    WITH a AS (SELECT c_custkey,
                      CASE WHEN c_custkey % 7 = 0 THEN NULL
                           ELSE c_mktsegment END AS seg
               FROM customer WHERE c_custkey <= 300),
         b AS (SELECT DISTINCT CASE WHEN n_nationkey % 5 = 0 THEN NULL
                                    ELSE 'BUILDING' END AS seg
               FROM nation)
    SELECT a.c_custkey, a.seg,
           CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    GROUP BY a.c_custkey, a.seg
    """,
)
def null_safe_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe join equality: Spark's <=> operator == SQL's IS NOT
    DISTINCT FROM — NULL keys match each other instead of silently
    dropping, the semantics dimension-join ETL needs when 'unknown' is a
    legitimate bucket. The injected NULLs make the behavior observable:
    null-seg customers match the null-seg dim row."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    a = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    n = load_table(spark, sf_dir, "nation")
    b = n.select(
        F.when(F.col("n_nationkey") % 5 == 0, None)
        .otherwise(F.lit("BUILDING"))
        .alias("seg")
    ).distinct()
    return (
        a.join(b, a["seg"].eqNullSafe(b["seg"]))
        .groupBy("c_custkey", a["seg"].alias("seg"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_matches"))
    )


@register(
    "phrase_locate_spans",
    oracle="""
    SELECT doc_id,
           CAST(strpos(text, 'data') AS BIGINT) AS first_pos,
           CAST(len(regexp_extract_all(text, 'data')) AS BIGINT) AS n_hits,
           CAST(length(text) AS BIGINT) AS doc_len
    FROM documents
    WHERE strpos(text, 'data') > 0
    """,
)
def phrase_locate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span location for annotation pipelines: 1-based first offset and
    occurrence count of a phrase per document (locate == strpos, both
    1-based; count via literal-regexp extraction). The narrow scan shape
    QA-span and redaction tooling runs over a corpus."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("locate('data', text)").cast("long").alias("first_pos"),
        F.size(F.expr("regexp_extract_all(text, 'data', 0)"))
        .cast("long")
        .alias("n_hits"),
        F.length("text").cast("long").alias("doc_len"),
    ).filter(F.col("first_pos") > 0)


@register(
    "session_funnel",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w <= 1800000000
                  THEN 0 ELSE 1 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked),
    per_session AS (
      SELECT user_id, session_id,
             min(ts) FILTER (WHERE event_type = 'view') AS t_view,
             min(ts) FILTER (WHERE event_type = 'click') AS t_click,
             min(ts) FILTER (WHERE event_type = 'purchase') AS t_buy
      FROM sess GROUP BY user_id, session_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT)
             AS s_view,
           CAST(COUNT(*) FILTER (WHERE t_view < t_click) AS BIGINT)
             AS s_click,
           CAST(COUNT(*) FILTER (WHERE t_view < t_click AND t_click < t_buy)
                AS BIGINT) AS s_purchase
    FROM per_session
    """,
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session conversion funnel: gap-sessionize (30-minute
    inactivity), then require view -> click -> purchase ordering INSIDE
    one session — stricter than the per-user funnel (event_funnel),
    which credits conversions across days. Sessionization is the
    running-sum-of-new-session-flags window; ties broken by event_id.
    Two shuffles (user window, then the global count fold)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            <= 1_800_000_000,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(ws))
    per = sess.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        ),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_buy"
        ),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("s_view"),
        F.sum(F.when(F.col("t_view") < F.col("t_click"), 1).otherwise(0))
        .cast("long")
        .alias("s_click"),
        F.sum(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_buy")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("s_purchase"),
    )


@register(
    "mad_order_prices",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             quantile_disc(o_totalprice, 0.5) AS med_price
      FROM orders GROUP BY o_orderpriority),
    dev AS (
      SELECT o.o_orderpriority,
             abs(o.o_totalprice - m.med_price) AS adev,
             m.med_price
      FROM orders o JOIN med m USING (o_orderpriority))
    SELECT o_orderpriority,
           CAST(ANY_VALUE(med_price) AS DOUBLE) AS median_price,
           CAST(quantile_disc(adev, 0.5) AS DOUBLE) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev GROUP BY o_orderpriority
    """,
)
def mad_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    statistic outlier-resistant pipelines use instead of stddev. Both
    medians are DISCRETE (actual data values, no interpolation), so
    engine parity is value-identity; two grouped sort-aggregations plus
    one broadcast-or-shuffle join of the (tiny) median table."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("bx_mad_orders")
    return spark.sql(
        """
        WITH med AS (
          SELECT o_orderpriority,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                   AS med_price
          FROM bx_mad_orders GROUP BY o_orderpriority),
        dev AS (
          SELECT o.o_orderpriority,
                 abs(o.o_totalprice - m.med_price) AS adev,
                 m.med_price
          FROM bx_mad_orders o JOIN med m USING (o_orderpriority))
        SELECT o_orderpriority,
               CAST(ANY_VALUE(med_price) AS DOUBLE) AS median_price,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)
                    AS DOUBLE) AS mad,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dev GROUP BY o_orderpriority
        """
    )


@register(
    "deterministic_mode_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
      SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                 ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority)
    WHERE rn = 1
    """,
)
def deterministic_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: the most frequent value per group with an
    explicit (count DESC, value ASC) tie-break — built-in mode()
    functions leave ties engine-defined, which can never hash-match;
    this is the portable formulation. One grouped count plus a tiny
    ranked window over the group x value table."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@register(
    "orderkey_islands",
    oracle="""
    SELECT MIN(o_orderkey) AS island_start,
           MAX(o_orderkey) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM (
      SELECT o_orderkey,
             o_orderkey - ROW_NUMBER() OVER (ORDER BY o_orderkey) AS grp
      FROM orders WHERE o_totalprice >= 150000)
    GROUP BY grp
    """,
)
def orderkey_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: contiguous o_orderkey ranges among high-value
    orders via the classic value-minus-row_number grouping (the filter
    makes the key sequence sparse, so real islands emerge). The global
    rank comes from distributed_row_number (operators/prefix.py), which
    IS the bucket-and-stitch recipe — range-partition by key, rank each
    contiguous bucket in parallel, stitch with O(partitions) offsets —
    so no row ever passes through a single-task window. Rows of one
    island share a key-range bucket except at partition boundaries,
    which the offset add stitches exactly; the island aggregate is one
    shuffle on grp."""
    from ballista_extensions_spark.operators.prefix import (
        distributed_row_number,
    )

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 150000
    )
    ranked = distributed_row_number(
        o.select("o_orderkey"), ["o_orderkey"], out_col="rn"
    )
    grouped = ranked.select(
        "o_orderkey",
        (F.col("o_orderkey") - F.col("rn")).alias("grp"),
    )
    return grouped.groupBy("grp").agg(
        F.min("o_orderkey").alias("island_start"),
        F.max("o_orderkey").alias("island_end"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    ).drop("grp")
