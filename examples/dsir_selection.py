"""Runnable example — model-based data selection the way a 2023+
pretraining pipeline runs it (DCLM / CCNet / DSIR stage order), all
lazy DataFrame algebra over the engine's operators:

  1. model gate     frozen hashed-BoW quality classifier (logit >= 0)
  2. exact dedup    md5 fingerprint, keep min doc_id
  3. LM buckets     cross-entropy under the frozen hashed-ngram LM,
                    CCNet head/middle/tail (keep head+middle)
  4. DSIR scoring   importance log-weights vs the target distribution
  5. budget select  best importance-weighted prefix under a token
                    budget (histogram + boundary band — no global sort)

Usage: python examples/dsir_selection.py [sf_dir] [token_budget]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_extensions_spark import get_session, load_table
    from ballista_extensions_spark.operators import dsir as DS
    from ballista_extensions_spark.operators.qualityclassifier import (
        quality_logit_sql,
    )
    from ballista_extensions_spark.operators.text import (
        budget_prefix_select,
        tokens,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 15_000

    spark = get_session("dsir-selection-example")
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )

    # 1. model gate — one codegen'd projection, no shuffle
    gated = docs.filter(F.expr(quality_logit_sql("text")) >= 0)

    # 2. exact dedup — hash groupBy, keep min id
    keep = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = gated.join(keep.select("doc_id"), "doc_id")

    # 3. LM quality buckets — drop the tail third (CCNet keeps
    #    head, optionally middle)
    ce = DS.lm_ce_scores(deduped).select("doc_id", "ce")
    kept = deduped.join(ce, "doc_id").filter(
        F.col("ce") <= DS.FROZEN_CE_CUTOFFS[1]
    )

    # 4 + 5. DSIR importance weights -> budget-prefix selection
    scored = DS.dsir_logweights(kept).drop("n_feats").join(
        kept.select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        ),
        "doc_id",
    )
    selected = budget_prefix_select(
        scored, budget, cost_col="n_tokens", score_col="logweight"
    )

    out = selected.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("logweight").alias("worst_kept_weight"),
    ).collect()[0]
    print(
        f"selected {out['n_docs']} docs / {out['n_tokens']} tokens "
        f"(budget {budget}), worst kept logweight "
        f"{out['worst_kept_weight']:.4f}"
    )


if __name__ == "__main__":
    main()
