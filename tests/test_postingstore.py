"""Persisted BM25 posting store (operators/postingstore.py): probe
equals the inline bm25_topk bit-for-bit, increment ingest never scans
stored postings, and the probe's scan is bucket-pruned to the query
terms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import postingstore as PS
from ballista_extensions_spark.operators.retrieval import bm25_topk

TERMS = ("data", "model", "training", "quality")
K = 15


def test_probe_equals_inline_bm25(spark, documents):
    """The store's core contract: bm25_from_store over a built index
    is BIT-identical (rows, doubles and all) to the corpus-exploding
    inline path."""
    table = "postings_test_probe"
    try:
        PS.build_posting_store(documents, table, buckets=8)
        inline = bm25_topk(documents, TERMS, K).collect()
        stored = PS.bm25_from_store(spark, table, TERMS, K).collect()
        assert stored == inline and len(stored) == K
    finally:
        PS.drop_posting_store(spark, table)


def test_extend_matches_full_build(spark, documents):
    """build(2/3) + extend(1/3) serves the same ranking as
    build(all): postings and corpus scalars both compose across
    ingests."""
    base_t, full_t = "postings_test_ext", "postings_test_full"
    try:
        base = documents.filter(F.col("doc_id") % 3 != 0)
        inc = documents.filter(F.col("doc_id") % 3 == 0)
        PS.build_posting_store(base, base_t, buckets=8)
        PS.extend_posting_store(inc, base_t, buckets=8)
        PS.build_posting_store(documents, full_t, buckets=8)
        got = PS.bm25_from_store(spark, base_t, TERMS, K).collect()
        want = PS.bm25_from_store(spark, full_t, TERMS, K).collect()
        assert got == want and len(got) == K
        # the stats side table holds one row per ingest
        assert spark.table(f"{base_t}_stats").count() == 2
    finally:
        PS.drop_posting_store(spark, base_t)
        PS.drop_posting_store(spark, full_t)


def test_extend_never_scans_stored_postings(spark, documents):
    """Ingest cost ∝ increment: the increment's posting plan reads
    only the new documents — the store table appears nowhere in it."""
    table = "postings_test_incplan"
    try:
        base = documents.filter(F.col("doc_id") % 2 == 0)
        inc = documents.filter(F.col("doc_id") % 2 == 1)
        PS.build_posting_store(base, table, buckets=8)
        plan = (
            PS.posting_frame(inc)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert table not in plan
    finally:
        PS.drop_posting_store(spark, table)


def test_probe_scan_is_bucket_pruned(spark, documents):
    """The 100 TB posture: the probe's IN-filter on the bucket column
    prunes the scan to <= |terms| buckets (SelectedBucketsCount
    evidence in the plan), so a query reads posting lists, never the
    index."""
    from ballista_extensions_spark.plans.inspect import executed_plan

    table = "postings_test_prune"
    buckets = 8
    try:
        PS.build_posting_store(documents, table, buckets=buckets)
        probe = PS.bm25_from_store(spark, table, TERMS, K)
        plan = executed_plan(probe)
        import re

        m = re.search(
            r"SelectedBucketsCount: (\d+) out of (\d+)", plan
        )
        assert m, "no bucket-pruning evidence in probe plan"
        selected, total = int(m.group(1)), int(m.group(2))
        assert total == buckets
        assert 0 < selected <= min(len(TERMS), buckets)
    finally:
        PS.drop_posting_store(spark, table)


def test_batch_equals_single_probes(spark, documents):
    """One batch job reproduces per-query single probes bit-for-bit
    (doubles included): both fold per-term scores in sorted-term
    order when the single probe is handed sorted terms."""
    table = "postings_test_batch"
    qsets = {
        1: ("data", "model"),
        2: ("quality", "training", "vector"),
        3: ("zzznothing",),  # no-hit query
    }
    try:
        PS.build_posting_store(documents, table, buckets=8)
        queries = spark.createDataFrame(
            [(qid, list(ts)) for qid, ts in qsets.items()],
            "query_id long, terms array<string>",
        )
        batch = PS.bm25_batch_topk(spark, table, queries, k=7)
        got = {}
        for r in batch.collect():
            got.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["n_terms"], r["bm25"], r["rank"])
            )
        assert 3 not in got  # no-hit query yields no rows
        for qid in (1, 2):
            single = [
                (r["doc_id"], r["n_terms"], r["bm25"], r["rank"])
                for r in PS.bm25_from_store(
                    spark, table, qsets[qid], 7
                ).collect()
            ]
            assert got[qid] == single and len(single) == 7
    finally:
        PS.drop_posting_store(spark, table)


def test_batch_null_term_and_cross_query_case(spark, documents):
    """A NULL inside a terms array fails fast with a targeted error;
    case-variant terms ACROSS queries are legal in the batch path
    (no pivot columns to collide — each is just a distinct
    case-sensitive term)."""
    table = "postings_test_batchval"
    try:
        PS.build_posting_store(documents, table, buckets=4)
        bad = spark.createDataFrame(
            [(1, ["data", None])], "query_id long, terms array<string>"
        )
        with pytest.raises(ValueError, match="NULL term"):
            PS.bm25_batch_topk(spark, table, bad, k=3)
        cased = spark.createDataFrame(
            [(1, ["Data"]), (2, ["data"])],
            "query_id long, terms array<string>",
        )
        rows = PS.bm25_batch_topk(spark, table, cased, k=3).collect()
        # "Data" (capitalized) matches nothing in the lowercase
        # corpus; "data" ranks normally — and nothing raises
        assert {r["query_id"] for r in rows} == {2}
    finally:
        PS.drop_posting_store(spark, table)


def test_batch_duplicate_terms_scored_once(spark, documents):
    """Query-side term multiplicity is ignored (set-of-terms BM25):
    a query with a repeated term equals the deduplicated query."""
    table = "postings_test_batchdup"
    try:
        PS.build_posting_store(documents, table, buckets=8)
        queries = spark.createDataFrame(
            [(1, ["data", "data", "model"]), (2, ["data", "model"])],
            "query_id long, terms array<string>",
        )
        rows = PS.bm25_batch_topk(spark, table, queries, k=5).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["n_terms"], r["bm25"], r["rank"])
            )
        assert by_q[1] == by_q[2]
    finally:
        PS.drop_posting_store(spark, table)


def test_batch_df_cap_equals_term_removal(spark, documents):
    """The scale control's semantics: capping out high-df terms is
    EXACTLY querying with those terms removed — and a cap above
    every df is a no-op."""
    from pyspark.sql import functions as SF

    table = "postings_test_cap"
    try:
        PS.build_posting_store(documents, table, buckets=8)
        dfs = {
            r["term"]: r["df"]
            for r in spark.table(table)
            .groupBy("term")
            .agg(SF.count(SF.lit(1)).alias("df"))
            .collect()
        }
        cap = (min(dfs.values()) + max(dfs.values())) // 2
        keep = sorted(t for t in dfs if dfs[t] <= cap)
        drop = sorted(t for t in dfs if dfs[t] > cap)
        if not keep or not drop:
            import pytest

            pytest.skip("corpus dfs too uniform to split")

        def key(r):
            return (r["query_id"], r["doc_id"], r["n_terms"],
                    r["bm25"], r["rank"])

        mixed_terms = sorted({keep[0], drop[0], keep[-1]})
        mixed = spark.createDataFrame(
            [(1, mixed_terms)], "query_id long, terms array<string>"
        )
        reduced = spark.createDataFrame(
            [(1, sorted({keep[0], keep[-1]}))],
            "query_id long, terms array<string>",
        )
        capped = [key(r) for r in PS.bm25_batch_topk(
            spark, table, mixed, k=9, df_cap=cap
        ).collect()]
        removed = [key(r) for r in PS.bm25_batch_topk(
            spark, table, reduced, k=9
        ).collect()]
        assert capped == removed and len(capped) > 0
        uncapped = [key(r) for r in PS.bm25_batch_topk(
            spark, table, mixed, k=9
        ).collect()]
        noop = [key(r) for r in PS.bm25_batch_topk(
            spark, table, mixed, k=9, df_cap=max(dfs.values())
        ).collect()]
        assert noop == uncapped
    finally:
        PS.drop_posting_store(spark, table)


def test_validation(spark, documents):
    table = "postings_test_val"
    try:
        PS.build_posting_store(documents, table, buckets=4)
        with pytest.raises(ValueError, match="empty query term set"):
            PS.bm25_from_store(spark, table, ())
        with pytest.raises(ValueError, match="k must be positive"):
            PS.bm25_from_store(spark, table, TERMS, 0)
        with pytest.raises(ValueError, match="not ASCII-alphanumeric"):
            PS.bm25_from_store(spark, table, ("ok", "bad term"))
    finally:
        PS.drop_posting_store(spark, table)


def test_empty_store_raises(spark):
    table = "postings_test_empty"
    empty = spark.createDataFrame([], "doc_id long, text string")
    try:
        PS.build_posting_store(empty, table, buckets=4)
        with pytest.raises(ValueError, match="is empty"):
            PS.bm25_from_store(spark, table, TERMS, K)
    finally:
        PS.drop_posting_store(spark, table)


def test_null_text_excluded_from_stats(spark):
    """NULL-text rows contribute to neither postings nor (N, Σdl) —
    matching the inline path's isNotNull gate."""
    table = "postings_test_null"
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, None), (2, "alpha")],
        ["doc_id", "text"],
    )
    try:
        PS.build_posting_store(df, table, buckets=4)
        stats = spark.table(f"{table}_stats").collect()[0]
        assert stats["n_docs"] == 2 and stats["sum_dl"] == 3
        rows = {
            (r["term"], r["doc_id"], r["tf"], r["dl"])
            for r in spark.table(table).collect()
        }
        assert rows == {
            ("alpha", 0, 1, 2),
            ("beta", 0, 1, 2),
            ("alpha", 2, 1, 1),
        }
    finally:
        PS.drop_posting_store(spark, table)
