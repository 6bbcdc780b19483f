"""BM25 keyword retrieval + reciprocal-rank fusion
(operators/retrieval.py — VERDICT r15 directives #3/#4)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from ballista_extensions_spark.operators.retrieval import (
    bm25_topk,
    rrf_fuse,
)

TERMS = ("vector", "spark", "merge", "filter")


def test_bm25_validation(documents):
    with pytest.raises(ValueError, match="empty query term set"):
        bm25_topk(documents, ())
    with pytest.raises(ValueError, match="duplicate query terms"):
        bm25_topk(documents, ("a", "a"))
    # Spark resolves identifiers case-insensitively: s_Filter/s_filter
    # would collide at resolution — rejected up front
    with pytest.raises(ValueError, match="duplicate query terms"):
        bm25_topk(documents, ("Filter", "filter"))
    with pytest.raises(ValueError, match="not ASCII-alphanumeric"):
        bm25_topk(documents, ("ok", "bad term"))
    with pytest.raises(ValueError, match="not ASCII-alphanumeric"):
        bm25_topk(documents, ("café",))
    with pytest.raises(ValueError, match="k must be positive"):
        bm25_topk(documents, TERMS, k=0)


def test_bm25_shape_and_determinism(documents):
    out = bm25_topk(documents, TERMS, k=15)
    rows = out.collect()
    assert len(rows) == 15
    assert [r["rank"] for r in rows] == list(range(1, 16))
    # scores non-increasing; doc_id breaks ties ascending
    for a, b in zip(rows, rows[1:]):
        assert a["bm25"] > b["bm25"] or (
            a["bm25"] == b["bm25"] and a["doc_id"] < b["doc_id"]
        )
    assert all(1 <= r["n_terms"] <= len(TERMS) for r in rows)
    again = bm25_topk(documents, TERMS, k=15).collect()
    assert rows == again  # bit-identical doubles, same order


def test_bm25_matches_python_reference(spark):
    """Tiny corpus: the operator's doubles equal a Python float replay
    of the same fixed-order formula (IEEE-754 + - * / parity)."""
    docs = [
        (0, "cat dog cat fish"),
        (1, "dog dog dog"),
        (2, "cat whale"),
        (3, "fish fish cat dog whale heron"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    terms = ("cat", "dog")
    out = {
        r["doc_id"]: (r["n_terms"], r["bm25"])
        for r in bm25_topk(df, terms, k=4).collect()
    }

    toks = {i: t.split(" ") for i, t in docs}
    n = float(len(docs))
    avgdl = float(sum(len(v) for v in toks.values())) / float(len(docs))
    dfreq = {
        t: float(sum(1 for v in toks.values() if t in v)) for t in terms
    }
    k1, b = 1.2, 0.75

    def score(tf, dfr, dl):
        idf = ((n - dfr) + 0.5) / (dfr + 0.5)
        return idf * (
            (tf * (k1 + 1.0))
            / (tf + (k1 * ((1.0 - b) + (b * (dl / avgdl)))))
        )

    for i, tv in toks.items():
        per = [
            score(float(tv.count(t)), dfreq[t], float(len(tv)))
            for t in terms
            if t in tv
        ]
        want = 0.0
        for t in terms:  # fixed written order, as the template
            if t in tv:
                want = want + score(
                    float(tv.count(t)), dfreq[t], float(len(tv))
                )
        if per:
            got_n, got = out[i]
            assert got_n == len(per)
            assert got == want  # EXACT double equality, not approx


def test_bm25_length_normalization(spark):
    """Same tf, longer document -> strictly lower score (the b/dl
    term), and more matching terms -> higher total."""
    df = spark.createDataFrame(
        [
            (0, "spark merge"),
            (1, "spark merge pad pad pad pad pad pad"),
            (2, "spark only here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(df, ("spark", "merge"), k=3).collect()
    }
    assert out[0] > out[1]  # length-normalized
    assert out[1] > out[2]  # two matching terms beat one


def test_bm25_ignores_null_text(spark):
    df = spark.createDataFrame(
        [(0, "spark spark"), (1, None), (2, "spark")],
        ["doc_id", "text"],
    )
    rows = bm25_topk(df, ("spark",), k=10).collect()
    assert {r["doc_id"] for r in rows} == {0, 2}


def test_bm25_plan_scale_posture(documents):
    """The corpus-wide explode is filtered to the query terms before
    the exchange (postings, not corpus, shuffle); the df table joins
    broadcast; no cartesian product anywhere."""
    import re

    from ballista_extensions_spark import plans as P

    out = bm25_topk(documents, TERMS, k=20)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the TERM filter itself (not just the isNotNull gate) runs inside
    # a whole-stage-codegen span — i.e. the same stage as the explode,
    # before any exchange; postings, not the corpus, hit the shuffle
    assert re.search(
        r"\*\(\d+\) Filter term#\d+ IN \(" + ",".join(TERMS) + r"\)",
        plan,
    ), plan
    # exchange budget: postings agg + df agg + pivot agg + TakeOrdered
    # partials (6 at HEAD) — a regression that shuffles the raw corpus
    # explode adds to this count
    assert P.shuffle_exchanges(out) <= 6


def test_rrf_fusion_arithmetic(spark):
    lex = spark.createDataFrame(
        [Row(doc_id=1, rank=1), Row(doc_id=2, rank=2)]
    )
    sem = spark.createDataFrame(
        [Row(doc_id=2, rank=1), Row(doc_id=3, rank=2)]
    )
    rows = {
        r["doc_id"]: r for r in rrf_fuse(lex, sem, k=3).collect()
    }
    # doc 2 in both systems: 1/62 + 1/61
    assert rows[2]["rrf"] == (1.0 / 62.0) + (1.0 / 61.0)
    assert rows[2]["lex_rank"] == 2 and rows[2]["sem_rank"] == 1
    # doc 1 lexical-only, doc 3 semantic-only
    assert rows[1]["rrf"] == 1.0 / 61.0 and rows[1]["sem_rank"] is None
    assert rows[3]["rrf"] == 1.0 / 62.0 and rows[3]["lex_rank"] is None
    # fused order: 2 (both), then 1 (1/61 > 1/62), then 3
    order = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in order] == [2, 1, 3]


def test_rrf_k_bounds(spark):
    lex = spark.createDataFrame([Row(doc_id=1, rank=1)])
    with pytest.raises(ValueError, match="k must be positive"):
        rrf_fuse(lex, lex, k=0)
    assert rrf_fuse(lex, lex, k=5).count() == 1  # union smaller than k


def test_hybrid_query_contains_both_signals(spark, sf_dir):
    """The registered hybrid query surfaces documents from both
    systems: at least one fused row carries a semantic rank and at
    least one a lexical rank."""
    from ballista_extensions_spark.queries.analytics16 import (
        hybrid_retrieval_rrf,
    )

    rows = hybrid_retrieval_rrf(spark, sf_dir).collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert any(r["sem_rank"] is not None for r in rows)
    assert any(r["lex_rank"] is not None for r in rows)
    # rrf within the only possible band: each term <= 1/61
    assert all(0.0 < r["rrf"] <= 2.0 / 61.0 + 1e-15 for r in rows)
    assert all(
        not math.isnan(r["rrf"]) for r in rows
    )
