"""Runnable example — the LAST stage of a pretraining data pipeline:
after curation/selection, emit deterministic training shards with a
seeded global shuffle, a fixed token budget per shard, and a manifest
the trainer (and an auditor) can verify byte-for-byte. Composes the
round-14 operators:

  1. selection    DSIR top-k importance weights (frozen models)
  2. shards       seeded hash-shuffle -> greedy token-budget shards
  3. write        one parquet file per shard + manifest
  4. extend       a later batch continues the shard set from two
                  manifest scalars — history is never re-read
  5. pack         fixed-context token-ID sequences over the frozen
                  BPE vocab (one EOS per doc), the trainer's input

Usage: python examples/training_shards.py [sf_dir] [capacity] [seed]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def main() -> None:
    from ballista_extensions_spark import get_session, load_table
    from ballista_extensions_spark.operators.dsir import dsir_logweights
    from ballista_extensions_spark.operators.shards import (
        extend_training_shards,
        training_shard_manifest,
        write_training_shards,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    capacity = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7

    spark = get_session("training-shards-example")
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )

    # 1. selection: keep the 60% of documents most like the target
    k = int(docs.count() * 0.6)
    selected = (
        dsir_logweights(docs, keep=("text",))
        .orderBy(F.col("logweight").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "text")
    )

    # 2+3. shard and write
    out = tempfile.mkdtemp(prefix="shards_")
    manifest = write_training_shards(selected, out, capacity, seed)
    print(f"\nshards written under {out}/shards, manifest:")
    manifest.orderBy("shard_id").show(10, truncate=False)

    # 4. a later batch (pretend: the docs selection rejected) extends
    # the shard set without touching what was written
    batch2 = docs.join(selected.select("doc_id"), "doc_id", "left_anti")
    increment = extend_training_shards(
        batch2.select("doc_id", "text"), manifest, capacity, seed + 1
    )
    print("increment manifest (continues the last partial shard):")
    increment.show(5, truncate=False)

    # determinism receipt: same seed, same manifest — bit for bit
    again = training_shard_manifest(selected, capacity, seed)
    a = [tuple(r) for r in manifest.orderBy("shard_id").collect()]
    b = [tuple(r) for r in again.orderBy("shard_id").collect()]
    print(f"re-run byte-identical: {a == b}")

    # 5. the trainer handoff: fixed-context token-ID sequences over
    # the frozen vocab — every doc's BPE ids + EOS, concatenated in
    # the same seeded order and cut at context_len
    from ballista_extensions_spark.operators.bpe_stream import (
        FROZEN_STREAM_MERGES,
    )
    from ballista_extensions_spark.operators.packing import (
        emit_packed_sequences,
    )

    seqs = emit_packed_sequences(
        selected, FROZEN_STREAM_MERGES, 256, seed
    )
    print("packed training sequences (ids truncated for display):")
    seqs.select(
        "seq_id",
        F.expr("slice(ids, 1, 8)").alias("ids_head"),
        "n_tokens",
        "padding",
    ).show(5, truncate=False)


if __name__ == "__main__":
    main()
