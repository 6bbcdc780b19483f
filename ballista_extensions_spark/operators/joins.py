"""Right-semi / right-anti joins.

The reference wire format declares nine join types
(proto/datafusion_common.proto:78-88); Spark's join() exposes seven of
them directly plus EXISTS/IN subqueries for LEFTMARK. RIGHTSEMI and
RIGHTANTI have no Spark join-type string — they are exactly the left
variants with the inputs swapped, which is how every engine (including
the reference's DataFusion core) canonicalizes them during optimization.
These helpers make the swap explicit and keep the declared type at the
call site.

Scale note: semi/anti joins ship only the probe-side KEYS to the build
side — no payload duplication, no row multiplication — so they are the
cheapest of the join family at fact-table scale; Catalyst picks
broadcast/hash/sort-merge per side statistics as usual (AQE re-plans at
runtime).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def right_semi_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """Rows of ``right`` with at least one match in ``left``
    (proto JoinType RIGHTSEMI = 6). Output schema = right's schema."""
    return right.join(left, on, "left_semi")


def right_anti_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """Rows of ``right`` with no match in ``left``
    (proto JoinType RIGHTANTI = 7). Output schema = right's schema."""
    return right.join(left, on, "left_anti")


def exists_flag_join(
    left: DataFrame,
    right: DataFrame,
    on: Column | list[str],
    flag: str = "exists",
) -> DataFrame:
    """LEFT MARK join (proto JoinType LEFTMARK): every ``left`` row,
    unchanged, plus a boolean ``flag`` column — true iff at least one
    ``right`` row matches. This is the user-facing form of the
    ExistenceJoin Catalyst plans for EXISTS/IN subqueries (q4 uses the
    SQL spelling); here it's first-class DataFrame API.

    Two shapes:

    - equi keys (``on`` = list of column names): ONE left-outer join
      against the distinct right keys with a literal mark, then
      ``coalesce(mark, false)``. The distinct collapses the build side
      to unique keys, so no left row can multiply — exactly the
      ExistenceJoin contract — and the single hash join (broadcast when
      small) is the cheapest possible plan.
    - arbitrary ``Column`` condition: semi/anti decomposition —
      ``left ⋉ right`` tagged true unioned with ``left ▷ right`` tagged
      false. Two passes over ``left``, but both are semi-class joins
      (keys only shipped, no payload duplication) and it is the
      canonical rewrite every engine uses when a mark join with a
      non-equi predicate must be expressed with standard join types.

    Output schema: left's columns + ``flag`` (non-null boolean).
    """
    from pyspark.sql import functions as F

    if isinstance(on, list):
        keys = right.select(*on).distinct().withColumn("__bx_mark", F.lit(True))
        out = left.join(keys, on, "left")
        return out.select(
            *[left[c] for c in left.columns],
            F.coalesce(F.col("__bx_mark"), F.lit(False)).alias(flag),
        )
    hit = left.join(right, on, "left_semi").withColumn(flag, F.lit(True))
    miss = left.join(right, on, "left_anti").withColumn(flag, F.lit(False))
    return hit.unionByName(miss)
