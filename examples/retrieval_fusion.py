"""Runnable example — the round-16 retrieval + score-store surfaces:

  1. lexical      BM25 top-k over the corpus for a query term set
  2. semantic     exact-cosine top-k for a query embedding
  3. fusion       reciprocal-rank fusion (K=60) of the two rankings
  4. score store  classifier logits persisted once at gate time
  5. curriculum   shard schedule joining the store (never re-folding)
  6. index store  postings persisted once; probe == inline, cheaper
  7. batch        a whole query suite against the index in one job

Usage: python examples/retrieval_fusion.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_extensions_spark import get_session, load_table
    from ballista_extensions_spark.operators import similarity as S
    from ballista_extensions_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from ballista_extensions_spark.operators.scorestore import (
        build_score_store,
        curriculum_from_scores,
        drop_score_store,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("retrieval-fusion-example")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. lexical: BM25 top-20 for a keyword query
    terms = ("vector", "spark", "merge", "filter")
    lex = bm25_topk(docs, terms, k=20)
    print(f"\nBM25 top-5 for {terms}:")
    lex.limit(5).show(truncate=False)

    # 2. semantic: exact cosine top-20 for query vector 0
    sem = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=20
    ).select(F.col("c_id").alias("doc_id"), F.col("rn").alias("rank"))

    # 3. hybrid: reciprocal-rank fusion of the two rankings
    fused = rrf_fuse(lex, sem, k=10)
    print("hybrid top-10 (RRF, K=60):")
    fused.show(truncate=False)

    # 4. score once at gate time, persist bucketed by doc_id
    table = "example_qscore_store"
    try:
        store = build_score_store(docs, table, buckets=8)
        print(f"score store '{table}': {store.count()} rows")

        # 5. curriculum ordering joins the store — the classifier
        # fold is never re-paid (exponent 0.15 vs 0.82 inline)
        sched = curriculum_from_scores(docs, store, 1024, 7)
        print("curriculum schedule (easy -> hard):")
        sched.show(10, truncate=False)
    finally:
        drop_score_store(spark, table)

    # 6. the lexical index persisted once (the score-store pattern
    # for retrieval): later probes bucket-prune to the query terms
    # and never re-tokenize the corpus
    from ballista_extensions_spark.operators.postingstore import (
        bm25_batch_topk,
        bm25_from_store,
        build_posting_store,
        drop_posting_store,
    )

    index = "example_posting_store"
    try:
        build_posting_store(docs, index, buckets=8)
        from_store = bm25_from_store(spark, index, terms, k=20)
        same = from_store.collect() == lex.collect()
        print(f"store probe == inline BM25: {same}")

        # 7. decontamination shape: a benchmark suite of queries in
        # ONE batch job against the index
        suite = spark.createDataFrame(
            [
                (1, ["vector", "spark"]),
                (2, ["merge", "filter", "data"]),
                (3, ["join", "stream"]),
            ],
            "query_id long, terms array<string>",
        )
        hits = bm25_batch_topk(spark, index, suite, k=3)
        print("batch top-3 per benchmark query:")
        hits.show(truncate=False)
    finally:
        drop_posting_store(spark, index)


if __name__ == "__main__":
    main()
