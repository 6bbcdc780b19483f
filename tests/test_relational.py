"""Relational query surface tests: results sane at sf0.001 + structural
plan assertions (pushdown, broadcast, top-k) per BASELINE.md invariants."""

from __future__ import annotations

import pytest

from ballista_extensions_spark.queries import get_oracles, get_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_registry_complete():
    qs = get_queries()
    oracles = get_oracles()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)
    # every no-oracle query is intentionally hash-based/randomized
    no_oracle = set(qs) - set(oracles)
    assert no_oracle == {
        "sample_lineitem",
        "sample_by_segment",
        "sketch_distinct_users",
        "dedup_near_minhash",
        "dedup_simhash",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "embedding_near_dup",
        "ann_recall_report",
        # sketch rollups: estimates are deterministic but engine-specific
        # (DataSketches internals), so no ANSI oracle by design
        "sketch_rollup_custkeys",
        "price_quantile_sketch_rollup",
        "custkey_overlap_sketch",
        # DEFLATE is not ANSI-SQL-expressible; the operator's contract
        # is graded hash-exactly by compression_contract_audit instead
        "compression_quality_stats",
        # Gumbel noise derives from xxhash64 (no DuckDB twin); the
        # invariants are graded hash-exactly by dsir_gumbel_audit
        "dsir_resample_gumbel",
        # DuckDB cannot replay 4096 sequential merges (binder's 128-deep
        # recursion cap); the applier is hash-graded at 384 merges by
        # bpe_contract_audit and 4k[:384] prefix is pytest-pinned
        "bpe_tokenize_4k_vocab",
    }


@pytest.mark.parametrize(
    "name,min_rows",
    [
        ("q1_pricing_summary", 1),
        ("q6_forecast_revenue", 1),
        ("scan_project_alias", 1),
        ("explode_unnest", 10),
        ("join_inner", 0),
        ("agg_orders_by_priority", 1),
        ("window_top3_orders_per_customer", 1),
        ("sort_limit_expensive_orders", 25),
        ("set_union_nations", 1),
        ("events_hourly_rollup", 1),
        ("events_sessionize", 1),
    ],
)
def test_query_runs(spark, sf_dir, name, min_rows):
    df = get_queries()[name](spark, sf_dir)
    assert len(df.collect()) >= min_rows


def test_scan_pushdown(spark, sf_dir):
    """Filters and projection must reach the parquet scan."""
    df = get_queries()["scan_project_alias"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "l_orderkey" in plan.split("ReadSchema")[1][:200]
    # only the 4 needed columns are read
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_extendedprice" not in read_schema


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(get_queries()["q5_local_supplier_volume"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_sort_limit_is_topk(spark, sf_dir):
    """Global top-k must plan as TakeOrdered, not a full sort."""
    plan = _plan(get_queries()["sort_limit_expensive_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_semi_join_planned(spark, sf_dir):
    plan = _plan(get_queries()["join_left_semi"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    """Partial (map-side) aggregation before the exchange."""
    plan = _plan(get_queries()["q1_pricing_summary"](spark, sf_dir))
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_exists_decorrelates_to_semi(spark, sf_dir):
    """The EXISTS form must decorrelate (Catalyst ExistenceJoin/semi) —
    Spark's LEFT MARK equivalent (proto/datafusion_common.proto:86)."""
    plan = _plan(get_queries()["q4_order_priority_exists"](spark, sf_dir))
    assert "LeftSemi" in plan or "ExistenceJoin" in plan


def test_exists_flag_join_paths_agree(spark, sf_dir):
    """exists_flag_join: the one-pass equi-key path and the semi/anti
    union path must produce identical marks, the left side must never
    multiply, and the flag must be non-null."""
    from pyspark.sql import functions as F

    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.operators.joins import exists_flag_join

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    eq = exists_flag_join(
        c, o.select(F.col("o_custkey").alias("c_custkey")), ["c_custkey"]
    )
    cond = exists_flag_join(
        c, o, F.col("c_custkey") == F.col("o_custkey")
    )
    a = {r.c_custkey: r.exists for r in eq.collect()}
    b = {r.c_custkey: r.exists for r in cond.collect()}
    assert a == b
    assert len(a) == c.count()  # no multiplication, no drops
    assert all(v is not None for v in a.values())
    assert any(a.values()) and not all(a.values())
