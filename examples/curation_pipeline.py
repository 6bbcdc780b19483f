"""Runnable example — a full training-data curation pipeline composing
the engine's operators end-to-end, the way a 100 TB corpus run would
(each stage is lazy DataFrame algebra; one action at the end drives the
whole DAG, so Catalyst optimizes across stage boundaries):

  1. quality gate    repetition_stats + text_stats thresholds
  2. exact dedup     md5 fingerprint, keep min doc_id
  3. near-dup dedup  word-shingle Jaccard pairs -> connected components
                     -> keep the component representative
  4. scoring         rare-token fraction (corpus-frequency quality)
  5. budget select   best-scoring prefix under a token budget
  6. packing         first-fit token bins for sequence packing

Usage: python examples/curation_pipeline.py [sf_dir] [token_budget]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_extensions_spark import get_session, load_table
    from ballista_extensions_spark.operators import dedup as D
    from ballista_extensions_spark.operators import text as T
    from ballista_extensions_spark.operators.components import (
        dedup_by_components,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_session("curation-pipeline")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate: drop degenerate/boilerplate documents
    rep = T.repetition_stats(docs)
    keep_ids = rep.filter(
        (F.col("distinct_ratio") >= 0.2)
        & (F.col("dup_trigram_frac") <= 0.5)
        & (F.col("top_token_frac") <= 0.5)
    ).select("doc_id")
    gated = docs.join(keep_ids, "doc_id", "left_semi")
    n1 = gated.count()

    # 2. exact dedup: one row per distinct content hash
    reps = D.dedup_exact(gated).select(F.col("keep_id").alias("doc_id"))
    exact = gated.join(reps, "doc_id", "left_semi")
    n2 = exact.count()

    # 3. near-dup closure: Jaccard pairs -> components -> representatives
    pairs = D.near_dup_pairs_exact(exact, threshold=0.35, probe_mod=1)
    comp = dedup_by_components(exact, pairs)
    survivors = exact.join(
        comp.filter(F.col("is_representative")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    n3 = survivors.count()

    # 4-5. score by rare-token fraction and select under the budget
    scored = T.rare_token_fraction(survivors).select(
        "doc_id",
        "n_tokens",
        # mid-range rare fraction reads as natural text: score peaks at 0.5
        (0.5 - F.abs(F.col("rare_frac") - 0.5)).alias("score"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    selected = (
        scored.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= budget)
        .select("doc_id", "n_tokens")
    )
    n4 = selected.count()

    # 6. pack into 512-token bins (first-fit by id order)
    packed = selected.withColumn(
        "bin",
        F.floor(
            (F.sum("n_tokens").over(
                Window.orderBy("doc_id").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ) - 1) / 512
        ).cast("long"),
    )
    n_bins = packed.agg(F.countDistinct("bin")).first()[0]

    print(f"corpus           : {n0} docs")
    print(f"quality gate     : {n1} kept")
    print(f"exact dedup      : {n2} kept")
    print(f"near-dup closure : {n3} representatives")
    print(f"budget {budget:>6}    : {n4} docs selected")
    print(f"packed           : {n_bins} x 512-token bins")
    spark.stop()


if __name__ == "__main__":
    main()
