"""Change-data-capture merge — the MERGE INTO / upsert primitive.

Reference context: the reference engine (a single-operator showcase,
/root/reference/src/physical/sample_exec.rs) has no merge operator; this
module is part of the LLM-pipeline mandate — incremental snapshot
maintenance is how a 100 TB corpus absorbs a crawl increment without
rewriting the corpus.

Semantics (the Delta/Iceberg MERGE lowering): apply a change batch with
per-row ops I(nsert) / U(pdate) / D(elete) to a snapshot via ONE
full-outer equi-join on the key —
- D: the snapshot row is dropped;
- I/U: the change row's values win;
- unmatched snapshot rows pass through flagged 'K'(eep).

Scale posture: the single full-outer join is the whole cost — one key
shuffle of snapshot + changes (measured exponent 0.50 at 1x->10x,
BASELINE.md — that IS the exchange). At 100 TB the exchange is elided
entirely by bucketing BOTH sides on the key at write time
(``io.write_bucketed``): SparkSQL's bucketed sort-merge join needs no
Exchange when bucket counts match, so the merge cost collapses to a
per-bucket zipper scan. ``tests/test_round8_ops.py::
test_cdc_merge_bucketed_elides_shuffle`` proves the plan is
exchange-free on bucketed tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_merge(
    snapshot: DataFrame,
    changes: DataFrame,
    snap_key: str,
    change_key: str,
    updates: dict[str, str],
    op_col: str = "op",
) -> DataFrame:
    """Merge ``changes`` into ``snapshot`` on the key.

    ``updates`` maps each snapshot value column to the change-side
    column carrying its new value (applied for ops I and U). The change
    frame must carry ``change_key``, ``op_col`` in {'I','U','D'}, and
    the mapped value columns; key column names must differ between the
    two frames (the full-outer join needs both sides addressable).

    Returns (snap_key, *updates.keys(), op_col) with op='K' for
    untouched snapshot rows. Deletes are filtered BEFORE the projection
    so a 'D' never materializes merged values.

    All change-side references are frame-QUALIFIED, so the output of
    one merge (which carries ``op_col``) feeds directly into the next
    merge as its snapshot — the incremental chaining lifecycle
    (``cdc_merge(cdc_merge(snap, b1, ...), b2, ...)``) composes without
    the caller having to drop the op column between batches.
    """
    if snap_key == change_key:
        raise ValueError(
            "snapshot and change key columns must have distinct names "
            f"(both {snap_key!r}); alias one side"
        )
    op = changes[op_col]
    merged = snapshot.join(
        changes, snapshot[snap_key] == changes[change_key], "full_outer"
    ).filter(op.isNull() | (op != "D"))
    cols = [
        F.coalesce(snapshot[snap_key], changes[change_key]).alias(snap_key)
    ]
    for scol, ccol in updates.items():
        cols.append(
            F.when(op.isin("I", "U"), changes[ccol])
            .otherwise(snapshot[scol])
            .alias(scol)
        )
    cols.append(F.coalesce(op, F.lit("K")).alias(op_col))
    return merged.select(*cols)
