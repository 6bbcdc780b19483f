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
