"""Exact distributed heavy hitters (top-k frequent items).

The naive top-k — ``GROUP BY item ORDER BY count DESC LIMIT k`` — is
correct but shuffles the FULL key cardinality: at 100 TB a token-level
group-by exchanges billions of distinct keys to answer a question about
the top 30. The classic fix is a two-phase Misra–Gries scheme
[Misra & Gries 1982, "Finding repeated elements"]:

1. **Candidate pass** — each input partition maintains a bounded
   Misra–Gries summary of at most ``counters`` items (Arrow-batched
   ``mapInPandas``; pandas ``value_counts`` per batch, decrement-compact
   when the accumulator overflows). Each partition emits its kept
   (item, cnt) pairs plus one error row carrying its total decrement
   ``D_p``. Only ``partitions x counters`` rows shuffle — independent of
   the true key cardinality.
2. **Exact verification pass** — candidates are the items whose summed
   lower bound can still reach the top-k once the global slack
   ``total_D = sum(D_p)`` is granted; ONE more scan counts exactly the
   candidate items (broadcast semi-join keeps the shuffle to candidate
   keys only) and takes the final top-k.

Exactness proof (docstring-checkable): per partition the MG invariant
gives ``stored <= true_p <= stored + D_p`` (absent => ``true_p <= D_p``),
so globally ``lb(x) <= true(x) <= lb(x) + total_D``. With ``kth_lb`` =
k-th largest lower bound, any non-candidate x has
``true(x) <= lb(x) + total_D < kth_lb``, while at least k candidates
have ``true >= lb >= kth_lb`` — so every true top-k item is a candidate
REGARDLESS of tie-breaks (non-candidates are strictly below the
boundary), and the verification pass orders exactly. The proof needs
``total_D < kth_lb``: otherwise an item decremented out of EVERY
summary (lb = 0, true <= total_D) could still reach the top-k while
being invisible to the candidate set. When the data is too flat for the
configured ``counters`` to separate the head, the operator detects
exactly that condition and falls back to the naive full group-by — the
result is ALWAYS exact; only the shuffle volume is adaptive.

Reference scope note: the reference's wire format declares no frequent-
items surface (SURVEY.md §2); this module belongs to the §7 LLM-pipeline
mandate (vocabulary heads, stop-word discovery, skew diagnostics).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_top_k", "mg_partition_summaries"]

_SUMMARY_SCHEMA = "item string, cnt long"


def mg_partition_summaries(
    df: DataFrame, col: str, counters: int = 4096
) -> DataFrame:
    """Per-partition Misra–Gries summaries of ``col`` (cast to string).

    Returns rows (item, cnt): kept items with their lower-bound counts,
    plus ONE row per partition with ``item IS NULL`` whose ``cnt`` is the
    partition's total decrement ``D_p`` (0 if the partition never
    compacted). Arrow-batched; the accumulator is a pandas Series so the
    merge is vectorized; compaction triggers at ``4 x counters`` distinct
    items and decrements by the (counters+1)-th largest count.

    Canonical string form: the column is cast to string ON THE SPARK SIDE
    before entering Arrow, so summary items use the exact same rendering
    (``true``/``false`` booleans, Spark timestamp/decimal formatting) as
    the phase-2 verification scan's ``cast("string")`` — a pandas-side
    ``astype(str)`` would render e.g. Python ``True`` and never match.
    """
    if counters < 1:
        raise ValueError(f"counters must be >= 1, got {counters}")
    compact_at = 4 * counters

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.Series | None = None
        err = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            if vc.empty:
                continue
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > compact_at:
                # d = (counters+1)-th largest; keep v > d, subtract d
                d = int(acc.nlargest(counters + 1).iloc[-1])
                acc = acc[acc > d] - d
                err += d
        items = [] if acc is None else acc.index.to_list()
        cnts = [] if acc is None else [int(v) for v in acc.to_list()]
        yield pd.DataFrame(
            {"item": items + [None], "cnt": cnts + [err]}
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        summarize, schema=_SUMMARY_SCHEMA
    )


def exact_top_k(
    df: DataFrame, col: str, k: int = 20, counters: int = 4096
) -> DataFrame:
    """EXACT top-``k`` most frequent values of ``col`` without shuffling
    the full key cardinality (see module docstring for the proof).

    Returns (item string, cnt long) ordered by (cnt DESC, item ASC) —
    the deterministic tie-break an ANSI oracle can reproduce.

    Scale: pass 1 shuffles ``partitions x counters`` summary rows; the
    two scalar pulls (total_D, kth_lb) are O(1) driver values; pass 2
    shuffles only candidate keys after a broadcast semi-join prune. The
    candidate set is bounded by the summary size, and in skewed (Zipfian)
    data collapses to ~k items.
    """
    summ = mg_partition_summaries(df, col, counters)
    # One deliberate materialization: both scalar pulls and the candidate
    # frame reuse it instead of re-scanning the base data three times.
    summ = summ.localCheckpoint(eager=False)

    total_d = (
        summ.filter(F.col("item").isNull())
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("d"))
        .collect()[0]["d"]
    )
    lowers = (
        summ.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("lb"))
    )
    kth_row = (
        lowers.orderBy(F.desc("lb"), F.asc("item"))
        .limit(k)
        .agg(F.min("lb").alias("kth"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    # Fewer than k surviving lower bounds means the true k-th largest
    # lower bound is 0 (implicit fully-decremented items pad the top-k)
    # — taking min over the <k survivors would overstate it and let the
    # candidate path silently drop true ranks (survivors+1)..k.
    kth_lb = kth_row["kth"] if kth_row["n"] >= k and kth_row["kth"] is not None else 0

    base = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    if total_d >= kth_lb:
        # Guarantee hole (see module docstring): a fully-decremented item
        # could be top-k yet invisible. Only the full group-by is exact
        # here — the data is too flat for `counters` to separate the head.
        exact = base.groupBy("item").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
    else:
        candidates = lowers.filter(
            F.col("lb") >= F.lit(kth_lb - total_d)
        ).select("item")
        exact = (
            base.join(F.broadcast(candidates), on="item", how="left_semi")
            .groupBy("item")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
    return exact.orderBy(F.desc("cnt"), F.asc("item")).limit(k)
