"""Unit tests for the round-4 training-pipeline operators: repetition
filters, rare-token quality scoring, int8 quantization, and the events
funnel/retention rollups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import similarity as S
from ballista_extensions_spark.operators import text as T


def test_repetition_stats_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # fully repetitive
            (2, "a b c d"),          # fully distinct
            (3, "a b a b a"),        # alternating: bigrams repeat
            (4, "x y"),              # < 3 tokens -> dropped
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in T.repetition_stats(df).collect()}
    assert set(got) == {1, 2, 3}
    r1 = got[1]
    assert r1["n_tokens"] == 4
    assert r1["distinct_ratio"] == 0.25
    # bigrams: ['a a','a a','a a'] -> 1 distinct of 3
    assert r1["dup_bigram_frac"] == pytest.approx(1 - 1 / 3)
    assert r1["top_token_frac"] == 1.0
    r2 = got[2]
    assert r2["distinct_ratio"] == 1.0
    assert r2["dup_bigram_frac"] == 0.0
    assert r2["dup_trigram_frac"] == 0.0
    assert r2["top_token_frac"] == 0.25
    r3 = got[3]
    # bigrams: ab ba ab ba -> 2 distinct of 4
    assert r3["dup_bigram_frac"] == 0.5
    assert r3["top_token_frac"] == pytest.approx(3 / 5)


def test_repetition_stats_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    plan = (
        T.repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_rare_token_fraction_known_values(spark):
    # corpus: 'a' x4, 'b' x2, 'c' x1, 'd' x1 -> total=8, vocab=4, mean=2
    # rare (freq*4 < 8) => freq < 2: c, d
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a a b d")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in T.rare_token_fraction(df).collect()}
    assert got[1]["n_tokens"] == 4 and got[1]["n_rare"] == 1
    assert got[1]["rare_frac"] == 0.25
    assert got[2]["n_rare"] == 1


def test_quantize_int8_known_vector(spark):
    df = spark.createDataFrame(
        [(1, [2.0, -4.0, 1.0]), (2, [0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: r for r in S.quantize_int8(df).collect()}
    r1 = got[1]
    # scale = 4/127; q = [64, -127, 32] (floor(x/scale + .5))
    assert r1["scale"] == pytest.approx(4.0 / 127.0)
    assert r1["checksum"] == 64 - 127 + 32
    assert r1["l1_norm"] == 64 + 127 + 32
    assert r1["n_saturated"] == 1
    r2 = got[2]  # zero vector guard: scale 0, all-zero q
    assert r2["checksum"] == 0 and r2["l1_norm"] == 0
    assert r2["n_saturated"] == 0


def test_quantize_int8_bounded(spark, sf_dir):
    from ballista_extensions_spark.io import load_table

    q = S.quantize_int8(load_table(spark, sf_dir, "embeddings"))
    bad = q.filter(
        (F.col("l1_norm") < F.abs(F.col("checksum")))
        | (F.col("l1_norm") > 127 * 64)
    ).count()
    assert bad == 0


def test_event_funnel_monotone(spark, sf_dir):
    from ballista_extensions_spark.queries.analytics import event_funnel

    rows = {r["stage"]: r["n_users"] for r in event_funnel(spark, sf_dir).collect()}
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
    assert rows["view"] > 0


def test_retention_cohorts_offsets_nonnegative(spark, sf_dir):
    from ballista_extensions_spark.queries.analytics import retention_cohorts

    df = retention_cohorts(spark, sf_dir)
    assert df.filter(F.col("week_offset") < 0).count() == 0
    # offset-0 cell must contain every cohort member's first week
    assert df.filter(F.col("week_offset") == 0).count() >= 1


def test_bpe_merge_candidates_deterministic_topk(spark, sf_dir):
    from ballista_extensions_spark.queries.llm import bpe_merge_candidates

    a = bpe_merge_candidates(spark, sf_dir).collect()
    b = bpe_merge_candidates(spark, sf_dir).collect()
    assert a == b                      # tie-break makes top-k stable
    assert len(a) == 20
    counts = [r["n"] for r in a]
    assert counts == sorted(counts, reverse=True)


def test_bigram_lm_probabilities_normalize(spark, sf_dir):
    from ballista_extensions_spark.queries.llm import bigram_lm_counts

    df = bigram_lm_counts(spark, sf_dir)
    # all retained pairs: 0 < P(w2|w1) <= 1, and per-prefix mass never
    # exceeds 1 (it is < 1 when the min-count floor pruned siblings)
    assert df.filter(
        (F.col("cond_prob") <= 0) | (F.col("cond_prob") > 1)
    ).count() == 0
    over = (
        df.groupBy("w1")
        .agg(F.sum("cond_prob").alias("mass"))
        .filter(F.col("mass") > 1.0000001)
        .count()
    )
    assert over == 0


def test_token_budget_select_scale_path_matches_exact(spark, sf_dir):
    """The no-global-sort cutoff path must agree with the exact
    windowed path ROW-IDENTICALLY: since round 12 the binary search's
    undecided band is ordered by the distributed prefix, so boundary
    ties resolve exactly like the global running total (the old
    contract tolerated a boundary symmetric difference — that slack
    under-filled 5 docs at sf0.001 and is gone)."""
    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.operators.text import token_budget_select

    docs = load_table(spark, sf_dir, "documents")
    for budget in (2000, 20000):
        exact = token_budget_select(docs, budget, exact=True)
        fast = token_budget_select(docs, budget, exact=False)
        e = {r["doc_id"]: r["score"] for r in exact.collect()}
        f = {r["doc_id"]: r["score"] for r in fast.collect()}
        assert e == f
        assert sum(r["n_tokens"] for r in exact.collect()) <= budget


def test_token_budget_select_giant_tie_block(spark):
    """Degenerate input: every doc shares one score and the tie block
    alone overflows the budget — the prefix must fill in id order and
    both paths must agree exactly."""
    from ballista_extensions_spark.operators.text import token_budget_select

    rows = [(i, "alpha beta gamma delta") for i in range(50)]  # 4 tokens
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = token_budget_select(df, 30, exact=True)
    fast = token_budget_select(df, 30, exact=False)
    e = sorted(r["doc_id"] for r in exact.collect())
    f = sorted(r["doc_id"] for r in fast.collect())
    assert e == f == list(range(7))  # 7 docs x 4 tokens = 28 <= 30


def test_token_budget_select_null_text_excluded(spark):
    """Code-review r12: NULL-text docs must be excluded from BOTH
    paths — under the non-ANSI session size(null) is -1, which made
    the scale path overshoot the budget and diverge from exact."""
    from ballista_extensions_spark.operators.text import token_budget_select

    rows = [(0, "a b c d e f g h i j"), (1, None), (2, "k l m")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # both real docs score 1.0; prefix order is (score DESC, id) so
    # doc 0 (10 tokens) leads and doc 2's running total includes it.
    # Before the fix the NULL doc contributed n_tokens = -1 to the
    # scale path's histogram and made it overshoot/diverge.
    for budget, want in ((9, []), (10, [0]), (13, [0, 2])):
        exact = token_budget_select(df, budget, exact=True)
        fast = token_budget_select(df, budget, exact=False)
        e = sorted(r["doc_id"] for r in exact.collect())
        f = sorted(r["doc_id"] for r in fast.collect())
        assert e == f == want, (budget, e, f)
        assert sum(r["n_tokens"] for r in fast.collect()) <= budget


def test_budget_prefix_select_arbitrary_scores(spark):
    """The generalized budget prefix (round 13) must match a naive
    (score DESC, id) running-total prefix for arbitrary-range scores:
    negative values, non-[0,1] magnitudes, and a tie block straddling
    the boundary."""
    from ballista_extensions_spark.operators.text import (
        budget_prefix_select,
    )

    rows = [
        # (doc_id, cost, score) — scores deliberately negative/large,
        # with a 5-way tie at -2.5 that straddles any small budget
        (0, 5, 12.75), (1, 3, -0.5), (2, 4, 12.75), (3, 2, 100.0),
        (4, 6, -2.5), (5, 1, -2.5), (6, 2, -2.5), (7, 3, -2.5),
        (8, 2, -2.5), (9, 4, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, n_tokens long, score double"
    ).repartition(4)
    order = sorted(rows, key=lambda r: (-r[2], r[0]))
    for budget in (2, 11, 14, 18, 33):
        got = sorted(
            r["doc_id"]
            for r in budget_prefix_select(df, budget, buckets=8).collect()
        )
        want, acc = [], 0
        for i, c, _ in order:
            if acc + c > budget:
                break
            want.append(i)
            acc += c
        assert got == sorted(want), (budget, got, want)


def test_budget_prefix_select_degenerate_and_empty(spark):
    """All-tie scores (hi == lo) fall into one band ordered by id;
    an empty input returns empty without erroring on the min/max
    collect."""
    from ballista_extensions_spark.operators.text import (
        budget_prefix_select,
    )

    df = spark.createDataFrame(
        [(i, 4, 7.5) for i in range(20)],
        "doc_id long, n_tokens long, score double",
    )
    got = sorted(
        r["doc_id"] for r in budget_prefix_select(df, 10).collect()
    )
    assert got == [0, 1]  # 2 docs x 4 <= 10, id order within the tie
    empty = budget_prefix_select(df.filter("doc_id < 0"), 10)
    assert empty.count() == 0


def test_budget_prefix_select_rejects_null_nan_inf_scores(spark):
    """NULL/NaN/inf scores would silently misorder the prefix (NaN
    defeats hi > lo; NULL crashes the histogram sort) — the operator
    must fail fast instead (code-review r13)."""
    import pytest

    from ballista_extensions_spark.operators.text import (
        budget_prefix_select,
    )

    for bad in (None, float("nan"), float("inf"), float("-inf")):
        df = spark.createDataFrame(
            [(0, 4, 1.0), (1, 4, bad), (2, 4, 2.0)],
            "doc_id long, n_tokens long, score double",
        )
        with pytest.raises(ValueError, match="NULL/NaN"):
            budget_prefix_select(df, 10)
