"""Core relational operator surface (SURVEY.md §2 Tiers A/B/C).

One registered query per operator family the reference exercises or its
wire format declares: scan/project/alias (Tier B1/B4), unnest/explode
(B3), sample (Tier A, rows-only check), every join type (Tier C join
enum, proto/datafusion_common.proto:78-88), aggregation, window, sort/
limit, distinct, set operations, JSON extraction and time bucketing over
the events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_extensions_spark.functions.exact import dsum, lcount
from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.operators.sample import sample
from ballista_extensions_spark.queries.registry import register


@register(
    "scan_project_alias",
    oracle="""
    SELECT l_orderkey AS okey, l_linenumber AS lineno,
           l_quantity AS qty, l_returnflag AS flag
    FROM lineitem
    WHERE l_orderkey < 1000 AND l_returnflag <> 'N'
    """,
)
def scan_project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan -> filter -> projection with aliases (reference Tier
    B1/B4: examples/datafusion.rs:26 read_parquet + `as a` aliasing).

    Scale: both predicates and the 4-column projection reach the scan
    (PushedFilters + ReadSchema in explain) — no full-width read.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter((F.col("l_orderkey") < 1000) & (F.col("l_returnflag") != "N"))
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("lineno"),
            F.col("l_quantity").alias("qty"),
            F.col("l_returnflag").alias("flag"),
        )
    )


@register(
    "explode_unnest",
    oracle="""
    SELECT CAST(unnest([1,2,3,4,5,6,7,8,9,0]) AS BIGINT) AS a
    """,
)
def explode_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's e2e input: `select unnest([1,...,9,0]) as a`
    (tests/e2e.rs:24, Tier B3) — Spark spells it explode(array(...))."""
    return spark.sql(
        "SELECT CAST(a AS BIGINT) AS a FROM "
        "(SELECT explode(array(1,2,3,4,5,6,7,8,9,0)) AS a)"
    )


@register("sample_lineitem")  # randomized -> rows-only check (FIXTURES.md)
def sample_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier A flagship operator: Bernoulli sample, reference-exact
    validation (src/dataframe/sample.rs:28-38). Deterministic for a fixed
    seed but RNG-stream-specific, so no SQL oracle — the statistical and
    validation contracts are pytest-checked (tests/test_sample.py)."""
    l = load_table(spark, sf_dir, "lineitem")
    return sample(l, 0.3, 42).select("l_orderkey", "l_linenumber", "l_quantity")


@register("sample_by_segment")  # randomized -> rows-only check
def sample_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (operators/sample.py:sample_by): per-segment
    fractions over customer — the multi-stratum extension of the Tier-A
    operator. Deterministic per seed; statistical contract in pytest."""
    from ballista_extensions_spark.operators.sample import sample_by

    c = load_table(spark, sf_dir, "customer")
    return sample_by(
        c,
        "c_mktsegment",
        {"BUILDING": 0.5, "MACHINERY": 0.2, "AUTOMOBILE": 0.1},
        seed=42,
    ).select("c_custkey", "c_mktsegment")


@register("sketch_distinct_users")  # HLL sketch: engine-specific estimate
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct users per event type — the
    sketch-aggregation surface (deterministic: HLL register merge is
    commutative/idempotent, so results are partitioning-independent; the
    estimate itself is engine-specific -> rows-only check + relative
    error bound in pytest)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").cast("long").alias("exact_users"),
    )


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice AS total, c_name, c_mktsegment AS segment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INNER join (proto JoinType INNER). Scale: shuffle hash/sort-merge
    join on the key at fact scale; the o_totalprice filter pushes down."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey",
        F.col("o_totalprice").alias("total"),
        "c_name",
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "join_left_agg",
    oracle="""
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers without orders (NULL-safe
    count/sum semantics must match the oracle: COUNT skips NULLs, SUM of
    empty is NULL)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").cast("long").alias("n_orders"),
            dsum(F.col("o_totalprice"), "spend"),
        )
    )


@register(
    "join_right",
    oracle="""
    SELECT n_name, s_name, s_acctbal AS bal
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (nations with no supplier keep NULL supplier
    columns)."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(n, F.col("s_nationkey") == F.col("n_nationkey"), "right").select(
        "n_name", "s_name", F.col("s_acctbal").alias("bal")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k,
                       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS cust_bal
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS k,
                       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supp_bal
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.k, sn.k) AS nationkey, cust_bal, supp_bal
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (proto JoinType FULL)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("k")).agg(
        dsum(F.col("c_acctbal"), "cust_bal")
    )
    sn = s.groupBy(F.col("s_nationkey").alias("k")).agg(
        dsum(F.col("s_acctbal"), "supp_bal")
    )
    return (
        cn.join(sn, cn["k"] == sn["k"], "full")
        .select(
            F.coalesce(cn["k"], sn["k"]).alias("nationkey"),
            "cust_bal",
            "supp_bal",
        )
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (proto :83): customers having a big order. Scale:
    semi join only ships the probe key — no payload duplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (proto :84): customers with no large order (the
    unfiltered no-orders predicate is vacuous on driver data — every
    customer has orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_right_semi",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def join_right_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT SEMI join (proto/datafusion_common.proto:85, RIGHTSEMI = 6):
    suppliers having shipped a max-quantity lineitem. Spark has no
    right_semi join-type string, so operators/joins.py canonicalizes it
    as the side-swapped left-semi — the same rewrite the reference's
    optimizer applies. Output schema is the right side's, per the enum's
    contract."""
    from ballista_extensions_spark.operators.joins import right_semi_join

    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    s = load_table(spark, sf_dir, "supplier")
    return right_semi_join(
        l, s, F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "s_nationkey")


@register(
    "join_right_anti",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 48)
    """,
)
def join_right_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT ANTI join (proto/datafusion_common.proto:86, RIGHTANTI = 7):
    parts never sold in near-max quantity. Side-swapped left-anti via
    operators/joins.py; only the part key crosses the exchange."""
    from ballista_extensions_spark.operators.joins import right_anti_join

    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    p = load_table(spark, sf_dir, "part")
    return right_anti_join(
        l, p, F.col("l_partkey") == F.col("p_partkey")
    ).select("p_partkey", "p_name")


@register(
    "join_left_mark",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal AS bal,
           EXISTS(SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT') AS has_urgent
    FROM customer
    """,
)
def join_left_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT MARK join (proto/datafusion_common.proto:88, LEFTMARK = 9) as
    user-facing API: every customer row with a boolean mark — does an
    urgent order exist? — via operators/joins.py:exists_flag_join. This
    is the tenth join type surfaced directly (q4 exercises the same
    ExistenceJoin through SQL EXISTS); the equi-key path is ONE
    outer join against distinct keys, no row multiplication."""
    from ballista_extensions_spark.operators.joins import exists_flag_join

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").alias("bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return exists_flag_join(c, o, ["c_custkey"], flag="has_urgent")


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (dimension x dimension — the only scale-sane
    use of a Cartesian product)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "agg_argmax_customer",
    oracle="""
    WITH mx AS (SELECT c_mktsegment, MAX(c_acctbal) AS max_bal
                FROM customer GROUP BY c_mktsegment)
    SELECT c.c_mktsegment AS segment,
           CAST(mx.max_bal AS DOUBLE) AS max_bal,
           CAST(MIN(c.c_custkey) AS BIGINT) AS argmax_custkey
    FROM customer c JOIN mx
      ON c.c_mktsegment = mx.c_mktsegment AND c.c_acctbal = mx.max_bal
    GROUP BY c.c_mktsegment, mx.max_bal
    """,
)
def agg_argmax_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregation with a deterministic tie rule (min key among
    maxima) — the portable formulation of max_by/arg_max, whose tie
    behavior is engine-defined."""
    c = load_table(spark, sf_dir, "customer")
    mx = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.max("c_acctbal").alias("max_bal")
    )
    return (
        c.join(
            mx,
            (F.col("c_mktsegment") == F.col("seg"))
            & (F.col("c_acctbal") == F.col("max_bal")),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("max_bal").cast("double").alias("max_bal"),
        )
        .agg(F.min("c_custkey").cast("long").alias("argmax_custkey"))
    )


@register(
    "agg_orders_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(o_totalprice) AS DOUBLE) AS avg_price,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation with count/sum/min/max/avg/count-distinct.

    Scale: partial aggregation collapses map-side except COUNT DISTINCT,
    which Spark expands to a two-phase agg on (priority, custkey) — still
    bounded by distinct pairs, not rows."""
    o = load_table(spark, sf_dir, "orders")
    num = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    return o.groupBy("o_orderpriority").agg(
        lcount("n_orders"),
        dsum(F.col("o_totalprice"), "total"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        (num / F.count("o_totalprice").cast("double")).alias("avg_price"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )


@register(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice AS price, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders per customer by price.

    Scale: single shuffle on o_custkey; ORDER BY includes the unique
    o_orderkey so row numbers are deterministic. At 100 TB a heavy-hitter
    customer would skew one partition — AQE skew handling or pre-limit
    per-key top-k (aggregate of a bounded heap) is the mitigation."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "sort_limit_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    top-25 then a single 25-row reduce; no full sort materialization."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("price"))
        .orderBy(F.col("price").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "distinct_segments_by_nation",
    oracle="""
    SELECT DISTINCT n_name, c_mktsegment AS segment
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def distinct_segments_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a broadcast dimension join."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.col("c_mktsegment").alias("segment"))
        .distinct()
    )


@register(
    "set_union_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) set operation."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@register(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set operation."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@register(
    "set_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set operation: nations with customers but no suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)


@register(
    "asof_join_purchases",
    oracle="""
    WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, ts, event_id, value FROM events
               WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id, p.ts, CAST(p.value AS DOUBLE) AS value,
           v.event_id AS event_id_matched, v.ts AS ts_matched
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/temporal.py:asof_join): each purchase
    matched to the user's latest prior view — an operator Spark lacks as
    a built-in, composed from union+ordered-window (one shuffle), and
    oracle-checked against DuckDB's native ASOF JOIN."""
    from ballista_extensions_spark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(purchases, views, by="user_id", ts="ts").select(
        "user_id",
        "event_id",
        "ts",
        F.col("value").cast("double").alias("value"),
        "event_id_matched",
        "ts_matched",
    )


@register(
    "range_join_bursts",
    oracle="""
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           a.ts AS ts_a, b.ts AS ts_b,
           CAST(abs(date_diff('microsecond', b.ts, a.ts)) / 1000000.0 AS DOUBLE)
             AS dt_seconds
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(date_diff('microsecond', b.ts, a.ts)) <= 60 * 1000000
    """,
)
def range_join_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/temporal.py:range_join_pairs): same-user
    event pairs within 60s — banded-bucket equi-join decomposition of an
    inequality join, oracle-checked against DuckDB's direct theta join."""
    from ballista_extensions_spark.operators.temporal import range_join_pairs

    e = load_table(spark, sf_dir, "events")
    return range_join_pairs(e, by="user_id", within_seconds=60)


@register(
    "set_except_all_lineitems",
    oracle="""
    SELECT l_orderkey AS okey FROM lineitem
    EXCEPT ALL
    SELECT o_orderkey FROM orders
    """,
)
def set_except_all_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset): lineitem order keys minus one occurrence
    per orders row — preserves multiplicity, unlike set EXCEPT."""
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey")
    )
    return l.exceptAll(o)


@register(
    "set_intersect_all_keys",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
    INTERSECT ALL
    SELECT c_custkey FROM customer
    """,
)
def set_intersect_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics)."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    ).select(F.col("o_custkey").alias("k"))
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    return o.intersectAll(c)


@register(
    "posexplode_tokens",
    oracle=r"""
    SELECT doc_id, CAST(u.pos AS INT) AS pos, u.token
    FROM (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(toks)),
                        i -> {'pos': i - 1, 'token': toks[i]})) AS u
          FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks
                FROM documents WHERE doc_id < 20))
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered unnest (posexplode ≙ UNNEST WITH ORDINALITY): token
    positions are part of the output contract, 0-based in Spark."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\s+")).alias("pos", "token"),
    ).select("doc_id", "pos", "token")


@register(
    "string_agg_segments",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|')
             AS segments,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def string_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation with a deterministic contract: collect_set is
    unordered, so the op sorts before joining (same rule an engine must
    apply to make listagg reproducible under parallel execution)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), "|"
            ).alias("segments"),
            lcount("n_customers"),
        )
    )


@register(
    "null_and_regex_functions",
    oracle="""
    SELECT e.event_id,
           COALESCE(json_extract_string(e.props, '$.missing'), 'absent') AS with_default,
           CASE WHEN e.value = 0.0 THEN NULL ELSE e.value END AS nullif_zero,
           CAST(COALESCE(CASE WHEN e.value = 0.0 THEN NULL ELSE e.value END, -1.0)
                AS DOUBLE) AS nvl_value,
           regexp_extract(e.props, '"k": ([0-9]+)', 1) AS k_digits,
           CAST(e.value IS NULL AS BOOLEAN) AS is_null_flag
    FROM events e
    WHERE e.event_id < 2000
    """,
)
def null_and_regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling (coalesce/nullif/nvl) + regexp capture groups."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    nullif_zero = F.when(F.col("value") == 0.0, F.lit(None)).otherwise(
        F.col("value")
    )
    return e.select(
        "event_id",
        F.coalesce(
            F.get_json_object("props", "$.missing"), F.lit("absent")
        ).alias("with_default"),
        nullif_zero.alias("nullif_zero"),
        F.coalesce(nullif_zero, F.lit(-1.0)).cast("double").alias("nvl_value"),
        F.regexp_extract(F.col("props"), r'"k": ([0-9]+)', 1).alias("k_digits"),
        F.col("value").isNull().alias("is_null_flag"),
    )


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup over the events stream table — the batch twin
    of the streaming tumbling-window op in streaming/ops.py.

    Scale: group keys (hour, type) are low-cardinality per partition ->
    partial agg collapses; event-time bucketing needs no shuffle-ahead
    sort. value has 6 decimal digits -> DECIMAL(18,6) exact sum."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        lcount("n_events"),
        dsum(F.col("value"), "total_value", 18, 6),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@register(
    "events_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON property from the events payload
    (Spark get_json_object ≙ DuckDB json_extract_string)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k_val"),
    )


@register(
    "events_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 5 MINUTE THEN 0 ELSE 1 END
               AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM marked GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (5-minute inactivity gap) via window
    functions — the batch twin of stateful streaming sessionization.

    Scale: one shuffle on user_id, per-user ordered scan; deterministic
    tie-break on event_id for equal timestamps."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    ) <= 300
    marked = e.select(
        "user_id",
        F.when(gap_ok, F.lit(0)).otherwise(F.lit(1)).alias("new_session"),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").cast("long").alias("n_sessions"),
        lcount("n_events"),
    )


@register(
    "asof_join_forward_views",
    oracle="""
    WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, ts, event_id, value FROM events
               WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id, p.ts, CAST(p.value AS DOUBLE) AS value,
           v.event_id AS event_id_matched, v.ts AS ts_matched
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
)
def asof_join_forward_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (operators/temporal.py:asof_join_forward):
    each purchase matched to the user's NEXT view at or after it — the
    attribution direction ("what did they look at right after buying");
    completes the as-of family alongside the backward variant, oracle-
    checked against DuckDB's native forward ASOF."""
    from ballista_extensions_spark.operators.temporal import (
        asof_join_forward,
    )

    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join_forward(purchases, views, by="user_id", ts="ts").select(
        "user_id",
        "event_id",
        "ts",
        F.col("value").cast("double").alias("value"),
        "event_id_matched",
        "ts_matched",
    )
