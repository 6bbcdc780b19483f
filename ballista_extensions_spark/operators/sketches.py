"""Mergeable sketches — the re-aggregatable pattern for 100 TB
distinct counts, quantiles, and set overlap.

``COUNT(DISTINCT x)``, exact quantiles, and set intersections all need
a pass over the fact data per question and cannot be pre-aggregated.
Apache DataSketches sketches (built into Spark 4) merge losslessly, so
the production shape is: build sketches once at a fine granularity
(per day / per source / per shard), persist them as binary columns,
and answer any coarser question by MERGING sketches — no second pass:

- HLL (hll_sketch_agg / hll_union_agg): distinct counts, relative
  error ~1.04/sqrt(2^lg_k) (~1.6% at the default lg_k=12);
- KLL (kll_sketch_agg_double / kll_merge_agg_double): quantiles,
  normalized-rank error ~1.65% at the default k, size- and
  skew-independent;
- theta (theta_sketch_agg / theta_intersection / theta_difference):
  distinct-set ALGEBRA — overlap and containment between groups
  without N^2 distinct-joins.

Reference scope note: the reference's wire format declares no sketch
surface (SURVEY.md §2 Tier C); this module belongs to the §7
LLM-pipeline mandate (corpus-scale distinct counting, quantile
dashboards, cross-source audience/contamination overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_rollup", "kll_quantile_rollup", "theta_overlap"]


def hll_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Build HLL sketches per ``fine_keys`` group, then answer the
    ``coarse_keys`` distinct-count rollup by sketch union.

    Returns (fine, coarse): fine carries (fine_keys..., sketch,
    est_distinct) — the persistable pre-aggregate; coarse carries
    (coarse_keys..., est_distinct) derived ONLY from fine's sketches,
    never from the base data. ``coarse_keys`` must be a subset of
    ``fine_keys``.

    Scale: the fine aggregate is one map-side-combined shuffle sized by
    the group count (sketches are ~2^lg_k bytes, combined per partition
    before the exchange); the coarse union shuffles one sketch per fine
    group. Estimate error is the DataSketches HLL bound
    (~1.04/sqrt(2^lg_k) relative standard error).
    """
    missing = [k for k in coarse_keys if k not in fine_keys]
    if missing:
        raise ValueError(
            f"coarse_keys must be a subset of fine_keys; extra: {missing}"
        )
    fine = df.groupBy(*fine_keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )
    fine = fine.withColumn(
        "est_distinct", F.hll_sketch_estimate("sketch").cast("long")
    )
    coarse = (
        fine.groupBy(*coarse_keys)
        .agg(F.hll_union_agg("sketch").alias("sk"))
        .select(
            *coarse_keys,
            F.hll_sketch_estimate("sk").cast("long").alias("est_distinct"),
        )
    )
    return fine, coarse


def kll_quantile_rollup(
    df: DataFrame,
    fine_keys: list[str],
    coarse_keys: list[str],
    value_col: str,
    probs: list[float],
) -> tuple[DataFrame, DataFrame]:
    """Mergeable QUANTILES: KLL sketches built per ``fine_keys`` group,
    merged to answer ``coarse_keys``-level (or global, with
    ``coarse_keys=[]``) quantiles without re-reading the fact data —
    the approximate, re-aggregatable complement of
    operators/prefix.distributed_percentile_disc (which is exact but
    needs a pass over the data per query).

    Returns (fine, coarse). fine: (fine_keys..., sketch) — persistable.
    coarse: (coarse_keys..., q_<i> one column per prob, n_values). The
    KLL rank error is ~1.65% at the default k=200 (normalized rank,
    two-sided), independent of data size or skew.

    Scale: same two-shuffle shape as hll_rollup; merged sketches are
    O(k log n) bytes.
    """
    missing = [k for k in coarse_keys if k not in fine_keys]
    if missing:
        raise ValueError(
            f"coarse_keys must be a subset of fine_keys; extra: {missing}"
        )
    fine = df.groupBy(*fine_keys).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias(
            "sketch"
        )
    )
    merged = fine.groupBy(*coarse_keys).agg(
        F.kll_merge_agg_double("sketch").alias("sk")
    )
    qcols = [
        F.kll_sketch_get_quantile_double("sk", F.lit(float(p))).alias(
            f"q_{str(p).replace('.', '_')}"
        )
        for p in probs
    ]
    coarse = merged.select(
        *coarse_keys,
        *qcols,
        F.kll_sketch_get_n_double("sk").cast("long").alias("n_values"),
    )
    return fine, coarse


def theta_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Pairwise distinct-set OVERLAP between groups via theta sketches:
    for every group pair (a < b), estimated |values(a)|, |values(b)|,
    |values(a) ∩ values(b)| and the containment ratio — the
    cross-source contamination / audience-overlap primitive. Exact set
    intersection across N groups needs N^2 distinct-joins over the fact
    table; theta sketches support set ALGEBRA on the sketches
    themselves, so the fact table is read once.

    Scale: one sketch-building shuffle sized by the group count; the
    pairwise stage is a self-join over ONE ROW PER GROUP (sketches of
    ~2^lg_k bytes), trivially broadcastable for any realistic group
    count.
    """
    sk = df.groupBy(F.col(group_col).alias("g")).agg(
        F.theta_sketch_agg(value_col, F.lit(lg_k)).alias("sk")
    )
    a = sk.select(F.col("g").alias("g_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("g").alias("g_b"), F.col("sk").alias("sk_b"))
    inter = F.theta_sketch_estimate(
        F.theta_intersection("sk_a", "sk_b")
    ).cast("long")
    return (
        a.join(b, F.col("g_a") < F.col("g_b"))
        .select(
            "g_a",
            "g_b",
            F.theta_sketch_estimate("sk_a").cast("long").alias("n_a"),
            F.theta_sketch_estimate("sk_b").cast("long").alias("n_b"),
            inter.alias("n_overlap"),
        )
        .withColumn(
            "containment",
            F.col("n_overlap").cast("double")
            / F.least("n_a", "n_b").cast("double"),
        )
    )
