"""Mergeable distinct-count sketches — the re-aggregatable rollup
pattern for 100 TB distinct counts.

``COUNT(DISTINCT x)`` needs a full shuffle of x per query and cannot be
pre-aggregated: distinct counts don't add. Apache DataSketches HLL
sketches (built into Spark 4: hll_sketch_agg / hll_union_agg /
hll_sketch_estimate) DO merge losslessly, so the production shape is:
build sketches once at a fine granularity (per day / per source /
per shard), persist them as binary columns, and answer any coarser
distinct-count rollup by UNIONING sketches — no second pass over the
fact data, error ~1.04/sqrt(2^lg_k) (~1.6% at the default lg_k=12).

Reference scope note: the reference's wire format declares no sketch
surface (SURVEY.md §2 Tier C); this module belongs to the §7
LLM-pipeline mandate (corpus-scale distinct counting: unique users,
unique documents per source, vocabulary growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_rollup"]


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
