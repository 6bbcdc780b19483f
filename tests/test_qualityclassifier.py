"""Quality classifier (operators/qualityclassifier.py): frozen-weight
reproduction from the deterministic trainer, non-degenerate accuracy
vs the distilled heuristic, Spark/DuckDB/Python hash+logit parity, and
the funnel-integration gate."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import qualityclassifier as QC


def test_frozen_weights_reproduce():
    """The shipped constants ARE the trainer's output on sf0.01 — the
    oracles replay these weights, so drift here would silently
    decouple query from oracle."""
    if not os.path.exists("/root/testdata/sf0.01/documents.parquet"):
        pytest.skip("sf0.01 testdata absent")
    import numpy as np

    from tools.train_quality_weights import featurize, train

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM read_parquet("
            "'/root/testdata/sf0.01/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    xs, ys = featurize(texts)
    w, b = train(xs, ys)
    assert tuple(np.round(w, 6)) == QC.FROZEN_QUALITY_WEIGHTS
    assert round(float(b), 6) == QC.FROZEN_QUALITY_BIAS
    # the model is a real classifier, not noise: it reproduces the
    # stopword-density heuristic it distills on its training corpus
    acc = float(
        (((xs @ np.asarray(QC.FROZEN_QUALITY_WEIGHTS)
           + QC.FROZEN_QUALITY_BIAS) >= 0) == (ys == 1.0)).mean()
    )
    assert acc >= 0.95


def test_hash_parity_python_spark_duckdb(spark):
    toks = ["the", "a", "customer", "q7", "x" * 40]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got_spark = {
        r["t"]: r["h"]
        for r in df.select(
            "t",
            F.expr(
                f"CAST(aggregate(transform(split(t, ''), c -> ascii(c)), "
                f"0L, (a2, x) -> (a2 * {QC.BASE} + x) % {QC.PRIME}) "
                f"% {QC.N_FEATURES} AS INT)"
            ).alias("h"),
        ).collect()
    }
    for t in toks:
        duck = duckdb.sql(
            f"SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(generate_series(1, length('{t}')), "
            f"i -> CAST(ascii(('{t}')[i]) AS BIGINT))), "
            f"(a2, x) -> (a2 * {QC.BASE} + x) % {QC.PRIME}) "
            f"% {QC.N_FEATURES}"
        ).fetchone()[0]
        assert got_spark[t] == duck == QC.hash_token(t), t


def test_scores_hand_checked_and_edge_cases(spark):
    """A one-word doc scores bias + w[h(word)] exactly; empty/NULL
    docs score the bare bias."""
    w = QC.FROZEN_QUALITY_WEIGHTS
    b = QC.FROZEN_QUALITY_BIAS
    df = spark.createDataFrame(
        [(1, "the"), (2, ""), (3, None), (4, "the the a")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["logit"], r["passes"])
        for r in QC.quality_scores(df).collect()
    }
    assert got[1] == (1, b + w[QC.hash_token("the")], True)
    assert got[2] == (0, b, b >= 0)
    assert got[3] == (0, b, b >= 0)
    exp4 = b + (2 * w[QC.hash_token("the")] + w[QC.hash_token("a")]) / 3
    assert got[4][1] == pytest.approx(exp4, abs=0)
    assert got[4][0] == 3


def test_funnel_classifier_gate_tightens_the_funnel(spark):
    """With the classifier stage enabled the funnel can only shrink,
    and it shrinks by exactly the gated-out extracted texts."""
    if not os.path.exists("/root/testdata/sf0.001/documents.parquet"):
        pytest.skip("testdata absent")
    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.operators.webprep import (
        crawl_curation_funnel,
        docs_fixture_frontier_key,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = {
        r["source"]: (r["n_gated"], r["n_kept"])
        for r in crawl_curation_funnel(
            d, docs_fixture_frontier_key()
        ).collect()
    }
    gate = F.expr(QC.quality_logit_sql("txt")) >= 0
    gated = {
        r["source"]: (r["n_gated"], r["n_kept"])
        for r in crawl_curation_funnel(
            d, docs_fixture_frontier_key(), classifier_gate=gate
        ).collect()
    }
    assert sum(v[0] for v in gated.values()) < sum(
        v[0] for v in base.values()
    )
    for src, (ng, nk) in gated.items():
        assert ng <= base[src][0] and nk <= base[src][1]
