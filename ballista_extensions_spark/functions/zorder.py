"""Z-order (Morton) clustering for multi-column data skipping.

Sorting a table by one column makes parquet row-group min/max stats
selective for that column only; interleaving the bits of several key
columns into one Morton key and range-partition-sorting by it makes the
stats selective for EVERY key column at once — the standard layout
technique (Delta/Iceberg OPTIMIZE ZORDER) for 100 TB tables that are
filtered on more than one dimension.

The bit-interleave is a single codegen'd integer expression (shifts and
masks — no UDF); the sort is Spark's regular repartitionByRange +
sortWithinPartitions, so the whole op is one range-exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: str | Column, b: str | Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative int columns into
    a Morton key (a's bit i -> position 2i, b's -> 2i+1). Values are
    clamped into [0, 2^bits - 1] from BOTH ends (a negative input would
    otherwise wrap to the top of the range via the bit mask), and NULLs
    clamp LOW (least() skips NULLs, which would silently send NULL rows
    to the maximum key and widen the top row groups' stats); 16+16 bits
    fit comfortably in a long."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    mask = (1 << bits) - 1

    def _clamp(c):
        c = F.coalesce(c.cast("long"), F.lit(0).cast("long"))
        return F.least(F.greatest(c, F.lit(0).cast("long")), F.lit(mask))

    ca = _clamp(ca)
    cb = _clamp(cb)
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def zorder_by(
    df: DataFrame, col_a: str, col_b: str, partitions: int = 8, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` by the Morton key of (col_a, col_b): one range
    exchange + in-partition sort. Writing the result to parquet yields
    row groups whose min/max stats are narrow in BOTH columns, so scans
    filtered on either dimension skip most of the file
    (tests/test_scale_helpers.py measures the stat narrowing directly
    from the written footer)."""
    keyed = df.withColumn("__z", morton_key(col_a, col_b, bits))
    return (
        keyed.repartitionByRange(partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
