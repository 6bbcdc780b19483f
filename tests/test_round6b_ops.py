"""Round-6 second wave: mixture resampling, interval sweep line,
grouped closed-form OLS.

Checks: equivalence to the naive single-task formulation on the same
data (the registry oracle repeats this against DuckDB), the structural
scale claims (no unpartitioned window in the executed plan), and the
loud-failure contracts.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_extensions_spark.operators.intervals import interval_concurrency
from ballista_extensions_spark.operators.mixing import resample_to_mixture
from ballista_extensions_spark.operators.regression import group_ols


# ---------------------------------------------------------------- mixing

def test_mixture_quotas_and_selection_match_naive(spark, documents):
    from ballista_extensions_spark.operators.weighted import uniform_from_hash

    weights = {"en": 0.5, "de": 0.25, "fr": 0.25}
    d = documents.select("lang", "doc_id")
    out = resample_to_mixture(d, "lang", weights, key_col="doc_id")

    # quotas: k_g = floor(w_g * min(n_g / w_g)) for weighted groups
    counts = {
        r["lang"]: r["n"]
        for r in d.filter(F.col("lang").isin(*weights))
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cap = min(counts[g] / w for g, w in weights.items())
    got_counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_counts == {
        g: math.floor(w * cap) for g, w in weights.items()
    }

    # selection identical to the naive partitioned-window formulation
    w_rank = Window.partitionBy("lang").orderBy("__u", "doc_id")
    naive = (
        d.filter(F.col("lang").isin(*weights))
        .withColumn("__u", uniform_from_hash(F.col("doc_id").cast("string")))
        .withColumn("rn", F.row_number().over(w_rank))
    )
    naive_sel = {
        (r["lang"], r["doc_id"], r["rn"])
        for r in naive.collect()
        if r["rn"] <= math.floor(weights[r["lang"]] * cap)
    }
    got_sel = {
        (r["lang"], r["doc_id"], r["__mix_rank"]) for r in out.collect()
    }
    assert got_sel == naive_sel


def test_mixture_drops_unweighted_groups(spark, documents):
    out = resample_to_mixture(
        documents.select("lang", "doc_id"), "lang", {"en": 1.0}, "doc_id"
    )
    assert {r["lang"] for r in out.select("lang").distinct().collect()} == {
        "en"
    }


def test_mixture_rejects_empty_or_nonpositive_weights(spark, documents):
    d = documents.select("lang", "doc_id")
    with pytest.raises(ValueError, match="at least one"):
        resample_to_mixture(d, "lang", {}, "doc_id")
    with pytest.raises(ValueError, match="<= 0"):
        resample_to_mixture(d, "lang", {"en": 0.0}, "doc_id")


def test_mixture_plan_has_no_global_window(spark, sf_dir):
    from ballista_extensions_spark.queries import get_queries

    df = get_queries()["domain_mix_resample"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "No Partition Defined" not in plan


# -------------------------------------------------------------- intervals

def test_interval_concurrency_step_function(spark):
    rows = [(1, 5), (2, 6), (4, 7), (6, 8)]
    df = spark.createDataFrame(rows, "s long, e long")
    got = {
        r["t"]: (r["delta"], r["concurrent"])
        for r in interval_concurrency(df, "s", "e").collect()
    }
    # boundaries: 1:+1=1, 2:+1=2, 4:+1=3, 5:-1=2, 6:+1-1=2, 7:-1=1, 8:-1=0
    assert got == {
        1: (1, 1), 2: (1, 2), 4: (1, 3), 5: (-1, 2),
        6: (0, 2), 7: (-1, 1), 8: (-1, 0),
    }


def test_interval_concurrency_matches_global_window(spark, orders):
    iv = orders.select(
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("e"),
    )
    got = interval_concurrency(iv, "s", "e")
    deltas = (
        iv.select(F.col("s").alias("t"), F.lit(1).alias("d"))
        .unionAll(iv.select(F.col("e").alias("t"), F.lit(-1).alias("d")))
        .groupBy("t")
        .agg(F.sum("d").cast("long").alias("delta"))
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    want = deltas.withColumn("concurrent", F.sum("delta").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_interval_concurrency_weighted(spark):
    df = spark.createDataFrame([(0, 10, 3), (5, 15, 4)], "s long, e long, w long")
    got = {
        r["t"]: r["concurrent"]
        for r in interval_concurrency(
            df, "s", "e", weight=F.col("w")
        ).collect()
    }
    assert got == {0: 3, 5: 7, 10: 4, 15: 0}


def test_interval_concurrency_rejects_null_bounds(spark):
    df = spark.createDataFrame([(1, None)], "s long, e long")
    with pytest.raises(ValueError, match="NULL boundary"):
        interval_concurrency(df, "s", "e")


def test_concurrent_orders_plan_has_no_global_window(spark, sf_dir):
    from ballista_extensions_spark.queries import get_queries

    df = get_queries()["concurrent_open_orders"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "No Partition Defined" not in plan


# ------------------------------------------------------------- regression

def test_group_ols_recovers_known_line(spark):
    # y = 3x + 7 exactly, two groups with different noise-free lines
    rows = [("a", x, 3 * x + 7) for x in range(10)] + [
        ("b", x, -2 * x + 1) for x in range(10)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"])
        for r in group_ols(
            df, ["g"], F.col("x"), F.col("y"), y_dec="decimal(18,0)"
        ).collect()
    }
    assert got["a"][0] == 10 and abs(got["a"][1] - 3) < 1e-12
    assert abs(got["a"][2] - 7) < 1e-12
    assert abs(got["b"][1] + 2) < 1e-12 and abs(got["b"][2] - 1) < 1e-12


def test_group_ols_degenerate_groups_null(spark):
    rows = [("const_x", 5, 1), ("const_x", 5, 9), ("single", 1, 2)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: (r["slope"], r["intercept"])
        for r in group_ols(df, ["g"], F.col("x"), F.col("y")).collect()
    }
    assert got["const_x"] == (None, None)
    assert got["single"] == (None, None)


def test_group_ols_excludes_nulls(spark):
    rows = [("g", 1, 1.0), ("g", 2, 2.0), ("g", None, 99.0), ("g", 3, None)]
    df = spark.createDataFrame(rows, "g string, x int, y double")
    out = group_ols(df, ["g"], F.col("x"), F.col("y")).collect()
    assert out[0]["n"] == 2
    assert abs(out[0]["slope"] - 1.0) < 1e-12


def test_ngram_novelty_known_small(spark):
    from ballista_extensions_spark.operators.text import ngram_novelty

    rows = [
        (1, "a b c d"),      # shingles {a b c, b c d}
        (2, "a b c x"),      # shingles {a b c, b c x}
        (3, "too short"),    # < 3 tokens -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(df).collect()
    }
    # "a b c" appears in both docs (df=2); the other shingle of each is novel
    assert got == {1: (2, 1, 0.5), 2: (2, 1, 0.5)}


def test_ngram_novelty_matches_python_reference(spark, documents):
    from ballista_extensions_spark.operators.text import ngram_novelty

    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"])
        for r in ngram_novelty(documents).collect()
    }
    # pure-Python reference with the documented ASCII-whitespace contract
    import re
    from collections import Counter

    docs = {
        r["doc_id"]: [
            t for t in re.split(r"[ \t\n\r\f\v]+", r["text"])
        ]
        for r in documents.select("doc_id", "text").collect()
    }
    sets = {
        d: {
            " ".join(toks[i : i + 3])
            for i in range(len(toks) - 2)
        }
        for d, toks in docs.items()
        if len(toks) >= 3
    }
    dfreq = Counter(s for ss in sets.values() for s in ss)
    want = {
        d: (len(ss), sum(1 for s in ss if dfreq[s] == 1))
        for d, ss in sets.items()
    }
    assert got == want


def test_welch_t_matches_python(spark, sf_dir):
    from ballista_extensions_spark.queries import get_queries

    got = {
        r["event_type"]: r
        for r in get_queries()["ab_test_value_by_type"](spark, sf_dir).collect()
    }
    from ballista_extensions_spark.io import load_table

    vals = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).collect()
    by_type: dict = {}
    for r in vals:
        if r["value"] is not None:
            by_type.setdefault(r["event_type"], []).append(r["value"])
    import statistics

    for et, xs in by_type.items():
        rest = [v for k, g in by_type.items() if k != et for v in g]
        m1, m2 = statistics.fmean(xs), statistics.fmean(rest)
        v1, v2 = statistics.variance(xs), statistics.variance(rest)
        se2 = v1 / len(xs) + v2 / len(rest)
        t = (m1 - m2) / se2 ** 0.5
        assert got[et]["n"] == len(xs)
        assert abs(got[et]["mean"] - m1) < 1e-9 * max(1, abs(m1))
        assert abs(got[et]["t_stat"] - t) < 1e-6 * max(1, abs(t))


def test_group_ols_matches_numpy(spark, orders):
    import numpy as np

    sample = orders.select(
        (F.year("o_orderdate") - F.lit(1995)).alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    got = group_ols(
        sample.withColumn("g", F.lit("all")),
        ["g"],
        F.col("x"),
        F.col("y"),
    ).collect()[0]
    pdf = sample.toPandas()
    slope, intercept = np.polyfit(pdf["x"], pdf["y"], 1)
    assert abs(got["slope"] - slope) < 1e-6 * max(1.0, abs(slope))
    assert abs(got["intercept"] - intercept) < 1e-6 * abs(intercept)


# ------------------------------------------------------------- similarity

def test_cosine_pairs_exact_matches_python(spark, embeddings):
    from ballista_extensions_spark.operators.similarity import (
        cosine_pairs_exact,
    )

    sub = embeddings.filter(F.col("vec_id") % 10 == 0)
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_exact(sub, threshold=0.3).collect()
    }
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in sub.collect()
    }

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (na ** 0.5 * nb ** 0.5)

    ids = sorted(vecs)
    want = {
        (i, j): cos(vecs[i], vecs[j])
        for i in ids
        for j in ids
        if i < j and cos(vecs[i], vecs[j]) >= 0.3
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_pretrain_pipeline_plan_and_shares(spark, sf_dir):
    from ballista_extensions_spark.queries import get_queries

    df = get_queries()["pretrain_mixture_pipeline"](spark, sf_dir)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "No Partition Defined" not in plan
    # shares sum to 1 over the selected mixture and langs are weighted ones
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-12
    assert {r["lang"] for r in rows} <= {"en", "de", "fr", "es", "zh"}


def test_shipping_deciles_monotone_and_partitioned(spark, sf_dir):
    from ballista_extensions_spark.queries import get_queries

    df = get_queries()["shipping_delay_deciles_by_priority"](spark, sf_dir)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # windows are partitioned by the dimension key, never global
    assert "No Partition Defined" not in plan
    by_pri: dict = {}
    for r in rows:
        by_pri.setdefault(r["pri"], []).append((r["p"], r["delay_days"]))
    for pri, pairs in by_pri.items():
        pairs.sort()
        delays = [d for _, d in pairs]
        assert delays == sorted(delays), f"non-monotone deciles for {pri}"
        assert len(pairs) == 5
