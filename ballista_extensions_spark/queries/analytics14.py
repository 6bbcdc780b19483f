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


#: mixed-Unicode suffixes cycled by doc_id — decomposed vs precomposed
#: Latin (2-byte), combining ring, Hangul jamo (composes under NFC),
#: 3-byte CJK and 4-byte supplementary (NFC-invariant), and the fi
#: ligature (NFC-invariant, NFKC would fold it — pins NFC-not-NFKC)
_NFC_MIX = [
    "café",            # precomposed e-acute (2-byte)
    "café",           # decomposed e + combining acute
    "ÅB",             # A + combining ring -> Å
    "가",         # Hangul jamo -> 가
    "漢字 \U0001f389\U0001d4b3",  # CJK + 4-byte astral, invariant
    "ﬁnal",            # fi ligature, NFC-invariant
]


def _nfc_mix_duckdb() -> str:
    lits = ", ".join("'" + s + "'" for s in _NFC_MIX)
    return f"[{lits}]"


@register(
    "text_nfc_normalize_stats",
    oracle=f"""
    WITH mixed AS (
      SELECT doc_id,
             text || ' ' || ({_nfc_mix_duckdb()})[CAST(doc_id % 6 AS INT) + 1]
               AS t
      FROM documents WHERE text IS NOT NULL),
    norm AS (
      SELECT doc_id, t, nfc_normalize(t) AS nfc FROM mixed)
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_chars_raw,
           CAST(length(nfc) AS BIGINT) AS n_chars_nfc,
           (t <> nfc) AS changed,
           md5(nfc) AS nfc_md5
    FROM norm
    """,
)
def text_nfc_normalize_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unicode NFC normalization stage (VERDICT r13 #6): per-document
    char counts before/after canonical composition, a changed flag,
    and an md5 content pin of the normalized text. The corpus is
    ASCII, so the fixture appends a deterministic mixed-Unicode suffix
    (decomposed/precomposed Latin, Hangul jamo, 3-byte CJK, 4-byte
    astral, ligature) cycled by doc_id — every NFC behavior class is
    exercised at every sf. Spark side is the Arrow-batched
    ``unicodedata.normalize`` pandas UDF
    (functions/udf.py:py_nfc_normalize); DuckDB's ``nfc_normalize`` is
    the exact oracle twin. Scale: one narrow mapInPandas projection —
    no shuffle, no driver state; wired as an optional pre-stage into
    exact_span_scrub and the BPE applier (nfc=True)."""
    from ballista_extensions_spark.functions.udf import py_nfc_normalize

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    mixed = d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" "),
            F.element_at(
                F.array(*[F.lit(s) for s in _NFC_MIX]),
                (F.col("doc_id") % 6).cast("int") + 1,
            ),
        ).alias("t"),
    )
    norm = mixed.withColumn("nfc", py_nfc_normalize(F.col("t")))
    return norm.select(
        "doc_id",
        F.length("t").cast("long").alias("n_chars_raw"),
        F.length("nfc").cast("long").alias("n_chars_nfc"),
        (F.col("t") != F.col("nfc")).alias("changed"),
        F.md5(F.col("nfc").cast("binary")).alias("nfc_md5"),
    )


@register("bpe_tokenize_4k_vocab")
def bpe_tokenize_4k_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization under the FROZEN 4096-merge raw-stream BPE
    vocabulary (VERDICT r13 #3; operators/bpe_vocab4k.py, trained
    offline by tools/train_bpe4k.py — the freeze-at-train-time
    discipline of the classifier/DSIR models). Per-source doc count,
    symbol count, token count and compression ratio through the SAME
    Arrow-batched rank-priority applier as the 384-merge query — the
    plan is one mapInPandas projection + one equi-join + a 20-group
    aggregate, identical shape at any vocab size (the merge-rank dict
    is a broadcast closure constant; 4096 ranks ~= 100 KB). Rows-only
    by design: DuckDB cannot replay 4096 sequential merges (the
    binder's 128-deep recursion cap — pinned by
    test_single_expression_chain_depth_failures); the applier's
    contract is hash-graded at 384 merges by bpe_contract_audit, and
    prefix stability (4k[:384] == frozen 384) is pytest-pinned."""
    from ballista_extensions_spark.operators.bpe_stream import (
        bpe_stream_token_counts,
    )
    from ballista_extensions_spark.operators.bpe_vocab4k import (
        FROZEN_STREAM_MERGES_4K,
    )

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    counts = bpe_stream_token_counts(d, FROZEN_STREAM_MERGES_4K)
    return (
        counts.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_symbols").cast("long").alias("n_symbols"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            (
                F.sum("n_symbols").cast("double")
                / F.sum("n_tokens").cast("double")
            ).alias("symbols_per_token"),
        )
        .orderBy("source")
    )
