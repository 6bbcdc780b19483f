"""Domain-mixture resampling — thin a corpus to TARGET group proportions.

Pretraining pipelines rarely consume a crawl as-is: the mixture is
re-weighted ("40% web, 30% code, ...", or per-language targets) before
tokenization. The operator here is the deterministic, auditable version
of that step:

given per-group target weights ``w_g`` (summing to anything; only
ratios matter), find the LARGEST total ``T`` the corpus can supply at
exactly those ratios — ``T = min_g(n_g / w_g)`` (the scarcest group
binds) — and keep exactly ``k_g = floor(w_g * T)`` rows of each group,
chosen by an md5-derived uniform so the draw is stable across runs,
partitionings, and engines (the same (h+1)/2^60 convention as
operators/weighted.py, so a SQL oracle can replay the selection
bit-for-bit).

Scale design: the obvious implementation —
``ROW_NUMBER() OVER (PARTITION BY group ORDER BY u)`` — funnels each
group through ONE task, and mixture groups are the worst case for that
(a handful of corpus-sized partitions: "English" is billions of rows).
Instead the per-group rank is derived from a GLOBAL distributed rank
over ``(group, u, key)`` (operators/prefix.py: range partition +
per-partition ranks + O(partitions) driver offsets) minus each group's
starting rank (one tiny aggregate, broadcast back):

    rank_within_group(r) = global_rank(r) - min_global_rank(group) + 1

which equals the partitioned window's row_number exactly, with
parallelism = partitions instead of = groups. The group-count and
group-offset frames are bounded by the group cardinality (a dimension,
by construction of a mixture spec).

Reference scope note: the reference's wire surface (SURVEY.md §2) has
no resampling beyond Bernoulli ``sample``; this module belongs to the
§7 LLM-pipeline mandate (data mixing), alongside operators/weighted.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballista_extensions_spark.operators.prefix import distributed_row_number
from ballista_extensions_spark.operators.weighted import uniform_from_hash

__all__ = ["resample_to_mixture"]


def resample_to_mixture(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Resample ``df`` so group sizes sit at exactly the ``weights``
    ratios (floor-rounded), keeping as many rows as the scarcest group
    allows. Groups absent from ``weights`` (or weighted <= 0) are
    dropped. Rows are selected in md5-uniform order with ``key_col`` as
    the tiebreak, so the output set is a deterministic function of
    (data, weights, seed).

    Returns the input columns plus ``__mix_rank`` (the 1-based rank of
    the row within its group's draw order) — callers usually drop it,
    the registry query keeps it for oracle comparability.
    """
    if not weights:
        raise ValueError("weights must name at least one group")
    spark = df.sparkSession
    pos = {g: float(w) for g, w in weights.items() if float(w) > 0}
    if not pos:
        raise ValueError("all weights are <= 0")
    wdf = spark.createDataFrame(
        list(pos.items()), schema=f"{group_col} string, __w double"
    )

    # One lazy materialization: the quota pass (counts -> cap -> k_g)
    # and the ranking pass otherwise each re-run the ENTIRE upstream
    # plan — for a caller like pretrain_mixture_pipeline that is the
    # full gate+dedup chain, recomputed per pass at 100 TB. Blocks are
    # freed by the ContextCleaner when the frame goes unreferenced.
    base = df.join(F.broadcast(wdf), on=group_col, how="inner").localCheckpoint(
        eager=False
    )
    # k_g = floor(w_g * min_g(n_g / w_g)); all-double arithmetic in the
    # same operation order as the SQL oracle, so floors agree bit-exactly.
    counts = base.groupBy(group_col, "__w").agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    cap = counts.agg(
        F.min(F.col("__n") / F.col("__w")).alias("__cap")
    )
    quotas = (
        counts.crossJoin(F.broadcast(cap))
        .select(
            group_col,
            F.floor(F.col("__w") * F.col("__cap")).cast("long").alias("__k"),
        )
    )

    u = uniform_from_hash(F.col(key_col).cast("string"), seed)
    ranked = distributed_row_number(
        base.withColumn("__u", u), [group_col, "__u", key_col], out_col="__grn"
    )
    starts = ranked.groupBy(group_col).agg(F.min("__grn").alias("__g0"))
    within = (
        ranked.join(F.broadcast(starts), on=group_col)
        .withColumn("__mix_rank", F.col("__grn") - F.col("__g0") + F.lit(1))
    )
    return (
        within.join(F.broadcast(quotas), on=group_col)
        .filter(F.col("__mix_rank") <= F.col("__k"))
        .drop("__w", "__u", "__grn", "__g0", "__k")
    )
