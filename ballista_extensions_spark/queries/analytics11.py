"""Round-12 operator-surface queries (VERDICT r11 directives): the
SemDeDup semantic-dedup class on the ANN machinery, apply-side BPE
tokenization with a frozen merge list, and the restart-survivable
streaming text-dedup replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.io import ensure_parallelism, load_table
from ballista_extensions_spark.operators.bpe import (
    FROZEN_MERGES,
    bpe_segment_sql_duckdb,
)
from ballista_extensions_spark.queries.registry import register

# SemDeDup fixture: 16 frozen lattice cells over the 64-dim embeddings,
# keep-first-by-id at cosine >= 0.4 (the corpus's natural near-dup band
# tops out at ~0.51, so real non-planted pairs participate), plus one
# deterministically planted semantic duplicate per vec_id % 7 == 0
# (0.999-scaled copy, cosine ~1.0). L2 lattice quantization is NOT
# scale-invariant, so "the copy lands in its original's cell" is a
# FIXTURE-VERIFIED property (every planted copy is confirmed dropped by
# tests/test_semdedup.py at all tested scales), not a guarantee of the
# quantizer; likewise the +100000 planted-id offset assumes
# max(vec_id) < 100000, asserted at every tested scale in the same test
# (ADVICE r12 — ids would silently collide past that).
_SEM_LISTS, _SEM_DIM, _SEM_TAU = 16, 64, 0.4


@register(
    "semantic_dedup_cells",
    oracle=f"""
    WITH cents AS (
      SELECT j AS cell,
             list_transform(generate_series(0, {_SEM_DIM - 1}), d ->
               CAST(((j * 1009 + d * 9176 + j * d * 31) % 2001) - 1000
                    AS DOUBLE) / 1000.0) AS c
      FROM generate_series(0, {_SEM_LISTS - 1}) t(j)),
    base AS (SELECT vec_id,
                    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings),
    corpus AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + 100000 AS vec_id,
             list_transform(v, x -> x * 0.999) AS v
      FROM base WHERE vec_id % 7 = 0),
    dist AS (
      SELECT corpus.vec_id, cents.cell,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_zip(corpus.v, cents.c),
                              s -> (s[1] - s[2]) * (s[1] - s[2]))),
               (acc, x) -> acc + x) AS dd
      FROM corpus CROSS JOIN cents),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, cell) AS rn
        FROM dist) WHERE rn = 1),
    n AS (
      SELECT c.vec_id, a.cell, c.v,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_zip(c.v, c.v), s -> s[1] * s[2])),
               (acc, x) -> acc + x)) AS nrm
      FROM corpus c JOIN assign a USING (vec_id)),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
              list_transform(list_zip(a.v, b.v), s -> s[1] * s[2])),
              (acc, x) -> acc + x) / (a.nrm * b.nrm) >= {_SEM_TAU})
    SELECT n.vec_id, CAST(n.cell AS INT) AS cell,
           d.vec_id IS NULL AS kept
    FROM n LEFT JOIN dropped d ON d.vec_id = n.vec_id
    """,
)
def semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/semdedup.py — Abbas et al. 2023,
    arXiv:2303.09540) end-to-end under the FROZEN lattice quantizer:
    the embeddings corpus plus one planted 0.999-scaled semantic
    duplicate per vec_id % 7 == 0 is cell-assigned
    (annstore.assign_cells, one codegen'd narrow pass), compared
    pairwise ONLY within cells by exact cosine, and every item whose
    cell holds a smaller-id item at cosine >= 0.4 is dropped
    (keep-first-by-id). Output: (vec_id, cell, kept) for EVERY item.

    The oracle replays the whole chain bit-for-bit — integer-lattice
    centroids, left-to-right distance/cosine folds, lowest-cell argmin
    ties, keep-first-by-id — so a hash match proves cell assignment
    AND the within-cell pruning decisions exactly, planted drops
    included. Scale: pairwise work is ONE equi-join on cell (never a
    cartesian — plan-asserted in tests/test_semdedup.py), Σ|cell|²
    bounded by corpus × max_cell; at 100 TB one raises n_lists
    (∝ corpus / target_cell_size) so per-cell work stays flat —
    measured by tools/scale_smoke.py with exactly that scaling."""
    from ballista_extensions_spark.operators.annstore import (
        lattice_centroids,
    )
    from ballista_extensions_spark.operators.semdedup import semantic_dedup

    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    base = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
            "embedding"
        ),
    )
    planted = base.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> x * CAST(0.999 AS DOUBLE))"
        ).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    cents = lattice_centroids(_SEM_LISTS, _SEM_DIM)
    return semantic_dedup(corpus, cents, tau=_SEM_TAU)


_BPE_SEG_DUCK = bpe_segment_sql_duckdb("text", FROZEN_MERGES)
_BPE_FRAME_DUCK = bpe_segment_sql_duckdb("text", ())


@register(
    "bpe_tokenize_counts",
    oracle=f"""
    WITH seg AS (
      SELECT doc_id,
             {_BPE_FRAME_DUCK} AS framed,
             {_BPE_SEG_DUCK} AS merged
      FROM documents)
    SELECT doc_id,
           CAST((length(framed)
                 - length(replace(framed, ' ', ''))) / 2 AS BIGINT)
             AS n_chars,
           CAST((length(merged)
                 - length(replace(merged, ' ', ''))) / 2 AS BIGINT)
             AS n_tokens
    FROM seg
    """,
)
def bpe_tokenize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply-side BPE (operators/bpe.py): the corpus tokenized with the
    FROZEN 32-merge list trained by the deterministic greedy trainer
    (train_bpe_merges on this same table at sf0.01 — the constant is
    regenerated and asserted identical by tests/test_bpe.py), emitting
    per-document base-symbol and BPE token counts. The oracle replays
    the IDENTICAL normalize -> frame -> 32-replace chain, so a hash
    match proves every merge application corpus-wide, not just counts'
    plausibility (literal scan-left replace is the same leftmost-first
    greedy semantic in both engines — operators/bpe.py docstring).
    Scale: one narrow codegen'd projection, no shuffle, no Python;
    cost ∝ corpus bytes."""
    from ballista_extensions_spark.operators.bpe import bpe_token_counts

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return bpe_token_counts(d, FROZEN_MERGES)
