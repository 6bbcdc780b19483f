"""DSIR importance resampling + hashed-LM CE scorer
(operators/dsir.py): frozen-table reproduction from the deterministic
trainer, three-engine fold parity, top-k selection vs a naive Python
oracle, edge cases, and the no-shuffle / TakeOrderedAndProject plan
shapes the 100 TB story depends on."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import dsir as D

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "a",
    "",
    None,
    "hello hello world 123 foo-bar baz",
    "the the the the of and to in is",
    "zzz qqq xxx vvv kkk jjj unseen tokens here",
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_frozen_tables_reproduce():
    """The shipped constants ARE the trainer's output on sf0.01 — the
    oracles replay these literals, so drift here would silently
    decouple query from oracle."""
    if not os.path.exists("/root/testdata/sf0.01/documents.parquet"):
        pytest.skip("sf0.01 testdata absent")
    from tools.train_dsir import (
        bucket_counts,
        logprobs,
        quality_passes,
    )

    texts = [
        r[0] or ""
        for r in duckdb.sql(
            "SELECT text FROM read_parquet("
            "'/root/testdata/sf0.01/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    target = [t for t in texts if quality_passes(t)]
    # the target slice is a real split, not degenerate
    assert 0.2 < len(target) / len(texts) < 0.8
    c_raw = bucket_counts(texts)
    c_tgt = bucket_counts(target)
    lp_raw = logprobs(c_raw)
    lp_tgt = logprobs(c_tgt)
    ratios = tuple(
        0.0 if cr == 0 and ct == 0 else round(t - r, 6)
        for t, r, cr, ct in zip(lp_tgt, lp_raw, c_raw, c_tgt)
    )
    assert ratios == D.FROZEN_DSIR_RATIOS
    assert tuple(round(v, 6) for v in lp_tgt) == D.FROZEN_LM_LOGPROBS
    # cutoffs are CE terciles under the frozen LM: ordered, finite
    lo, hi = D.FROZEN_CE_CUTOFFS
    assert 0.0 < lo <= hi


def test_fold_parity_python_spark_duckdb(spark):
    """Bit-exact fold parity across all three engines — the property
    every oracle in queries/analytics13.py rests on."""
    df = _df(spark)
    got_spark = [
        (r["w"], r["nf"])
        for r in df.select(
            "doc_id", F.expr(D.words_sql("text")).alias("ws")
        )
        .select(
            "doc_id",
            F.expr(
                D.feature_fold_sql("ws", D.FROZEN_DSIR_RATIOS)
            ).alias("w"),
            F.expr(D.n_feats_sql("ws")).alias("nf"),
        )
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if x is None else repr(x)})"
            for i, x in enumerate(TEXTS)
        )
        + ") v(doc_id, text)"
    )
    got_duck = con.execute(
        f"WITH w AS (SELECT doc_id, {D.words_sql_duckdb('text')} AS ws"
        f" FROM t) SELECT"
        f" {D.feature_fold_sql_duckdb('ws', D.FROZEN_DSIR_RATIOS)},"
        f" {D.n_feats_sql_duckdb('ws')} FROM w ORDER BY doc_id"
    ).fetchall()
    for (sw, snf), (dw, dnf), txt in zip(got_spark, got_duck, TEXTS):
        pw = D.py_feature_fold(txt, D.FROZEN_DSIR_RATIOS)
        pn = D.py_n_feats(txt)
        assert sw == dw == pw, (txt, sw, dw, pw)
        assert snf == dnf == pn, (txt, snf, dnf, pn)


def test_select_topk_matches_naive(spark):
    """dsir_select == sort-by-(weight desc, doc_id) head-k in Python."""
    df = _df(spark)
    got = [
        r["doc_id"] for r in D.dsir_select(df, 3).collect()
    ]
    naive = sorted(
        range(len(TEXTS)),
        key=lambda i: (
            -D.py_feature_fold(TEXTS[i], D.FROZEN_DSIR_RATIOS),
            i,
        ),
    )[:3]
    assert sorted(got) == sorted(naive)
    with pytest.raises(ValueError, match="k must be >= 1"):
        D.dsir_select(df, 0)


def test_empty_and_null_documents(spark):
    """No tokens — no evidence: weight exactly 0.0; CE pegs to the
    OOV ceiling so empty docs land in the worst bucket."""
    df = _df(spark)
    rows = {
        r["doc_id"]: r
        for r in D.dsir_logweights(df).collect()
    }
    assert rows[2]["logweight"] == 0.0 and rows[2]["n_feats"] == 0
    assert rows[3]["logweight"] == 0.0 and rows[3]["n_feats"] == 0
    ces = {r["doc_id"]: r["ce"] for r in D.lm_ce_scores(df).collect()}
    ceiling = -min(D.FROZEN_LM_LOGPROBS)
    assert ces[2] == ceiling and ces[3] == ceiling
    # the ceiling IS the worst bucket under the frozen cutoffs
    assert ceiling > D.FROZEN_CE_CUTOFFS[1]


def test_stopword_heavy_doc_outranks_junk(spark):
    """Direction check: the model must rank the stopword-dense
    document (the quality gate's own notion of clean) above the
    all-unseen-token document."""
    w = {
        r["doc_id"]: r["logweight"]
        for r in D.dsir_logweights(_df(spark)).collect()
    }
    assert w[5] > w[6]


def test_plan_shapes(spark):
    """Scoring is projection-only (zero operator Exchange); selection
    is TakeOrderedAndProject (per-partition top-k, no global sort
    shuffle); and the tokenization runs ONCE — CollapseProject must
    NOT re-inline the non-cheap split into its multiple downstream
    references (the re-inlined indexed-lambda form was the round-13
    60x quadratic)."""
    df = _df(spark).repartition(4)
    scored = D.dsir_logweights(df)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    # the repartition Exchange is the input's, not the operator's:
    # everything above the scan is projection-only
    assert plan.count("Exchange") <= 1
    opt = scored._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("regexp_replace") == 1
    sel = D.dsir_select(df, 5)
    splan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan


def test_gumbel_select_contracts(spark):
    """Gumbel-top-k resampler: exact k, deterministic per seed,
    seed-sensitive, and selected-set keys dominate unselected keys
    (the Gumbel-max-trick invariant)."""
    df = _df(spark)
    a = D.dsir_gumbel_select(df, 3, seed=7)
    b = D.dsir_gumbel_select(df, 3, seed=7)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert len(ids_a) == 3 and ids_a == ids_b
    keys = {
        r["doc_id"]: r["gumbel_key"]
        for r in D.dsir_logweights(df)
        .withColumn("gumbel_key", D.gumbel_key_col("doc_id", 7))
        .collect()
    }
    worst_sel = min(keys[i] for i in ids_a)
    best_unsel = max(
        v for i, v in keys.items() if i not in ids_a
    )
    assert worst_sel >= best_unsel
    # a different seed reshuffles the noise; with 7 docs choose 3 the
    # sets differ for at least one of several seeds
    assert any(
        sorted(
            r["doc_id"]
            for r in D.dsir_gumbel_select(df, 3, seed=s).collect()
        )
        != ids_a
        for s in (8, 9, 10, 11)
    )
    with pytest.raises(ValueError, match="k must be >= 1"):
        D.dsir_gumbel_select(df, 0)
