"""Round-14 queries: deterministic training-shard emission
(operators/shards.py), NFC normalization, and the cross-modality
curation funnel (VERDICT r13 directives #1, #6, #7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.io import ensure_parallelism, load_table
from ballista_extensions_spark.operators.shards import (
    manifest_oracle_sql,
    training_shard_manifest,
)
from ballista_extensions_spark.queries.registry import register

#: fixed shard parameters for the graded query — capacity small enough
#: that sf0.01 (~27k tokens) yields ~14 shards and sf0.1 (~271k) ~133,
#: so the manifest exercises boundary straddling at every sf
_SHARD_CAPACITY = 2048
_SHARD_SEED = 20260816


@register(
    "training_shard_manifest",
    oracle=manifest_oracle_sql(_SHARD_CAPACITY, _SHARD_SEED),
)
def training_shard_manifest_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic training-shard manifest over the documents
    corpus: seeded hash-shuffle global order (no sort — polynomial
    hash key + distributed rank), fixed-token-budget greedy shard
    assignment, and an order-sensitive per-shard content hash. The
    oracle replays rank, assignment, intra-shard order and hash
    bit-exactly in DuckDB. Scale: one range shuffle + O(partitions)
    driver offsets + one map-side-combined groupBy (see
    operators/shards.py module docstring)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return training_shard_manifest(d, _SHARD_CAPACITY, _SHARD_SEED)
