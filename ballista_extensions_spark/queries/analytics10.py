"""Round-11 operator-surface queries (VERDICT r10 directive #8): the
persisted perceptual-hash signature store — production media-dedup
state at the STORE level, unifying the sigstore (text) / annstore
(embeddings) pattern with the perceptual-hash family so streaming
media dedup survives restarts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.io import ensure_parallelism, load_table
from ballista_extensions_spark.queries.analytics7 import _DHASH_CTE
from ballista_extensions_spark.queries.registry import register


@register(
    "image_signature_store_incremental",
    oracle=f"""
    WITH {_DHASH_CTE}
    SELECT a.doc_id AS stored_id, b.doc_id AS new_id,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming,
           CAST(1 AS INT) AS phase
    FROM dh a JOIN dh b
      ON a.doc_id % 2 = 0 AND b.doc_id % 4 = 1
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
    UNION ALL
    SELECT a.doc_id, b.doc_id,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT),
           CAST(2 AS INT)
    FROM dh a JOIN dh b
      ON (a.doc_id % 2 = 0 OR a.doc_id % 4 = 1) AND b.doc_id % 4 = 3
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
    """,
)
def image_signature_store_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-run media dedup via the persisted perceptual-hash store
    (operators/phashstore.py): half the corpus (even doc_ids) plays
    the ACCEPTED store — PNG media fixtures, REAL codec decode,
    64-bit dHash — and the odd half arrives as TWO crawl increments
    (doc_id % 4 == 1, then % 4 == 3). Phase 1 probes increment 1
    against the store (banded pigeonhole candidates over DISTINCT
    hashes + exact xor/bit_count verification, threshold 6); the
    increment is then compacted in (append members, band only
    never-seen hashes); phase 2 probes increment 2 against the GROWN
    store, so its matches legitimately include increment-1 items —
    the restart-survivable semantics the store exists for. The oracle
    replays both phases as brute-force Hamming over the dHash
    arithmetic, so a hash match proves candidate recall exactly 1.0
    and bit-exact verification for BOTH probe rounds, including the
    compaction boundary. Scale: probe cost ∝ increment × bucket
    collisions; with the store persisted bucketed by h / slice
    (tests/test_phashstore.py proves the exchange-free store side),
    per-increment cost never rescans the corpus."""
    from ballista_extensions_spark.operators.imagedup import image_dhash
    from ballista_extensions_spark.operators.multimodal import (
        docs_as_png_media,
    )
    from ballista_extensions_spark.operators.phashstore import (
        build_phash_store,
        compact_into_phash_store,
        probe_phash_store,
    )

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    hashes = image_dhash(
        docs_as_png_media(d)
    ).localCheckpoint(eager=False)
    stored = hashes.filter(F.col("id") % 2 == 0)
    inc1 = hashes.filter(F.col("id") % 4 == 1)
    inc2 = hashes.filter(F.col("id") % 4 == 3)

    store = build_phash_store(stored, bands=8, hash_col="dhash")
    p1 = probe_phash_store(store, inc1, threshold=6, hash_col="dhash")
    grown = compact_into_phash_store(store, inc1, hash_col="dhash")
    p2 = probe_phash_store(grown, inc2, threshold=6, hash_col="dhash")
    return p1.withColumn("phase", F.lit(1)).unionByName(
        p2.withColumn("phase", F.lit(2))
    )
