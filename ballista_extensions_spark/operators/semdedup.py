"""Semantic deduplication (SemDeDup) on the ANN-store machinery —
the LLM-pipeline dedup class that prunes *semantically* redundant
documents, complementing the exact (``dedup_exact``), near
(``dedup.py`` MinHash/SimHash), and span (``exact_span_scrub``)
families (VERDICT r11 directive #1).

Method (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540,
re-expressed on DataFrame ops): cluster the embedding corpus with a
coarse quantizer, compare vectors PAIRWISE ONLY WITHIN EACH CLUSTER
by exact cosine, and for every pair above threshold τ keep one
representative. The within-cluster restriction is the whole scale
story — pairwise work is Σ_cells |cell|², bounded by corpus ×
max_cell_size instead of corpus²; the quantizer granularity
(``n_lists``) is chosen ∝ corpus / target_cell_size, so at 100 TB
one raises n_lists, never the per-cell work (the paper uses 50k
clusters for LAION-440M for the same reason).

Representative choice: the paper orders a cluster's items and drops
any item whose similarity to an EARLIER item exceeds τ (its §3 keeps
"low-similarity-to-centroid" items; ordering is a free parameter).
We order by ascending id — fully deterministic and exactly
replayable in ANSI SQL, which is what lets the DuckDB oracle
(``semantic_dedup_cells``) grade the operator hash-exact under the
frozen integer lattice quantizer (``annstore.lattice_centroids``).
The trained-quantizer quality path reuses ``annstore.train_centroids``
— both produce plain centroid tuples this operator treats
identically, the same correctness/quality split as the ANN store.

This closes the loop between the two flagship families the way the
reference's Tier-D extension pattern intends (a registry op composing
built-ins, reference src/planner/extension_planner.rs:31-52):
embeddings machinery (assign/probe) feeding the dedup contract
(kept/dropped per item).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballista_extensions_spark.operators.annstore import (
    AnnIndex,
    Centroids,
    assign_cells,
)
from ballista_extensions_spark.operators.similarity import (
    as_double,
    dot_sql,
    norm_sql,
)


def semantic_dedup_assigned(
    assigned: DataFrame,
    *,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Core SemDeDup over a pre-assigned frame ``(id, vec, cell)`` —
    the form a persisted ANN store already holds. Returns every input
    item as ``(id_col, cell, kept)``: ``kept`` is False iff some
    SAME-CELL item with a smaller id has cosine ≥ τ (keep-first-by-id,
    deterministic).

    Plan shape: one narrow pass precomputes the double vector + norm,
    then ONE equi-join on ``cell`` (never a cartesian — plan-asserted
    in tests/test_semdedup.py) with the id-order and cosine predicates
    applied post-join, a distinct on the dropped ids, and a left join
    back. All pairwise work stays inside cells; AQE's skew-join split
    handles an oversized cell's stragglers, and the real control is
    quantizer granularity (see module docstring)."""
    if not (0.0 < tau <= 1.0):
        raise ValueError(f"semantic_dedup: tau must be in (0, 1], got {tau}")
    base = assigned.select(
        F.col(id_col).alias("__id"),
        F.col("cell").cast("int").alias("cell"),
        F.expr(as_double(vec_col)).alias("__v"),
        F.expr(norm_sql(as_double(vec_col))).alias("__n"),
    )
    a = base.select(
        F.col("__id").alias("__ida"),
        "cell",
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = base.select(
        F.col("__id").alias("__idb"),
        "cell",
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    cos = F.expr(dot_sql("__va", "__vb")) / (F.col("__na") * F.col("__nb"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(cos >= F.lit(float(tau)))
        .select(F.col("__idb").alias("__id"))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        base.join(dropped, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "cell",
            F.col("__dropped").isNull().alias("kept"),
        )
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: Centroids,
    *,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup from raw embeddings under a given (frozen) quantizer:
    assign cells (one codegen'd narrow pass, annstore.assign_cells),
    then within-cell keep-first-by-id pruning at cosine threshold τ."""
    assigned = assign_cells(
        corpus, centroids, id_col=id_col, vec_col=vec_col
    )
    return semantic_dedup_assigned(
        assigned, tau=tau, id_col=id_col, vec_col=vec_col
    )


def semantic_dedup_index(
    index: AnnIndex,
    *,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup over a persisted ANN store's inverted file: the
    assignments table already holds (id, vec, cell) partitioned by
    cell, so the one pairwise equi-join reads cell-pruned files and
    no re-quantization pass runs at all — dedup the stored corpus
    without touching the raw embeddings again."""
    return semantic_dedup_assigned(
        index.assignments, tau=tau, id_col=id_col, vec_col=vec_col
    )
