"""Round-15 queries: sequence packing (operators/packing.py), the
shard read-side/epoch-replay contract, curriculum shard ordering, and
the byte-level pretokenizer (VERDICT r14 directives #2, #3, #5, #7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.io import ensure_parallelism, load_table
from ballista_extensions_spark.queries.registry import register

#: packing parameters for the graded query — context length small
#: enough that sf0.001 (~2.7k BPE tokens) already yields several
#: sequences and sf0.1 (~271k) a few hundred, exercising both the
#: many-docs-per-sequence and the doc-spans-sequences directions
_PACK_LEN = 1024
_PACK_SEED = 20260816


def _packing_oracle() -> str:
    from ballista_extensions_spark.operators.bpe_stream import (
        FROZEN_STREAM_MERGES,
        chain_cte_duckdb,
    )
    from ballista_extensions_spark.operators.packing import (
        PACKING_SELECT_DUCKDB,
        packing_ctes_duckdb,
    )
    from ballista_extensions_spark.operators.shards import (
        manifest_ctes_duckdb,
    )

    chain = chain_cte_duckdb(
        FROZEN_STREAM_MERGES,
        from_sql="(SELECT doc_id, text FROM documents "
        "WHERE text IS NOT NULL)",
    )
    # capacity is irrelevant to packing — the manifest CTE chain is
    # reused only for its ranked CTE (seeded order + running totals)
    return f"""
    WITH {chain},
    bpedocs AS (
      SELECT d.doc_id, d.text,
             CAST((length(c.s) - length(replace(c.s, ' ', ''))) / 2
                  AS BIGINT) AS bpe_tokens
      FROM documents d JOIN __bpe_chain c ON c.doc_id = d.doc_id
      WHERE d.text IS NOT NULL),
    {manifest_ctes_duckdb(1 << 40, _PACK_SEED, "bpedocs",
                          cost_sql="bpe_tokens + 1")},
    {packing_ctes_duckdb(_PACK_LEN)}
    {PACKING_SELECT_DUCKDB.format(L=_PACK_LEN)}
    """


@register("sequence_packing_manifest", oracle=_packing_oracle())
def sequence_packing_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trainer-ready sequence packing (operators/packing.py, VERDICT
    r14 directive #2): the frozen-vocab BPE token stream of every
    document (+1 EOS sentinel each), concatenated in the seeded shard
    order and cut into fixed 1024-token training sequences — one
    manifest row per sequence with its document count, boundary count,
    rank range, order-sensitive boundary hash, and padding waste
    (nonzero only on the tail). The oracle replays the ENTIRE
    composition: the staged merge chain for every document's token
    count, the seeded shuffle + fused rank/cumsum, and the span
    arithmetic, bit-for-bit. Scale: arithmetic over ranked_stream
    (one range shuffle) + a span explode that multiplies rows by
    spans-per-doc (output rows = n_docs + n_sequences, never
    per-token) + one map-side-combined groupBy."""
    from ballista_extensions_spark.operators.bpe_stream import (
        FROZEN_STREAM_MERGES,
        bpe_stream_token_counts,
    )
    from ballista_extensions_spark.operators.packing import (
        pack_sequences_manifest,
    )

    d = ensure_parallelism(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    counts = bpe_stream_token_counts(d, FROZEN_STREAM_MERGES).select(
        "doc_id", (F.col("n_tokens") + 1).alias("bpe_cost")
    )
    with_cost = d.select("doc_id", "text").join(counts, "doc_id")
    return pack_sequences_manifest(
        with_cost, _PACK_LEN, _PACK_SEED, cost_col="bpe_cost"
    )
