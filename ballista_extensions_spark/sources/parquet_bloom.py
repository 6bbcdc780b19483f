"""Parquet write-side bloom filters + row-group pruning evidence.

The reference's wire format declares parquet bloom-filter options
(`/root/reference/proto/datafusion_common.proto:496` — ParquetOptions
``bloom_filter_on_read`` / ``bloom_filter_on_write``); this is the
Spark twin. Write-side is pure configuration: parquet-mr honors
``parquet.bloom.filter.enabled#<col>`` / ``parquet.bloom.filter.
expected.ndv#<col>`` as per-column write options, and every row group
gets a block-split xxhash bloom filter for that column in the footer.

Read-side pruning: for a point predicate ``col = v``, parquet-mr's
RowGroupFilter drops any row group whose bloom filter reports "absent"
— the scan never touches those pages. The helpers here surface that
decision for verification: :func:`bloom_filter_offsets` proves the
footer carries the filters, and :func:`row_groups_surviving` replays
the exact membership test RowGroupFilter runs (hash the plain-encoded
value, probe the block-split bitset) and counts how many row groups a
scan must actually read. False positives only — a surviving row group
may still contain no matches; a dropped one provably cannot.

100 TB posture: bloom filters complement min/max stats exactly where
stats fail — high-cardinality keys with full-range row groups (uuids,
hashes, user ids after a shuffle). A point lookup on a 100 TB table
laid out this way prunes to the handful of row groups whose filter
fires, independent of sort order. Cost is the write-side bitset
(~1.2 MB per row group at NDV=1M, FPP 1%).

Hash discipline: parquet-mr hashes the PLAIN encoding of the value
(xxhash64 of little-endian bytes for int32/int64/double, of the UTF-8
bytes for BYTE_ARRAY strings). The py4j bridge collapses Python ints to
java int, which would silently call ``hash(int)`` for an INT64 column —
so every probe here goes through ``hash(Binary)`` with the explicit
plain encoding, which is bit-identical to the typed overloads.
"""

from __future__ import annotations

import struct
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_parquet_bloom",
    "bloom_filter_offsets",
    "row_groups_surviving",
]


def write_parquet_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: dict[str, int],
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``df`` as parquet with a write-side bloom filter on each
    column in ``bloom_cols`` (column -> expected NDV, which sizes the
    bitset for ~1% FPP). Note parquet-mr OMITS the bloom filter for a
    column whose every page ends up dictionary-encoded (the dictionary
    is already an exact membership structure); low-cardinality columns
    therefore show no footer offset — pass
    ``**{"parquet.enable.dictionary": "false"}`` to force one."""
    w = df.write.mode(mode)
    for col, ndv in bloom_cols.items():
        w = w.option(f"parquet.bloom.filter.enabled#{col}", "true")
        w = w.option(f"parquet.bloom.filter.expected.ndv#{col}", str(int(ndv)))
    for k, v in options.items():
        w = w.option(k, v)
    w.parquet(path)


def _open_reader(spark: SparkSession, file_path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(file_path), conf
    )
    return jvm, jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)


def _part_files(path: str) -> list[str]:
    files = sorted(str(p) for p in Path(path).glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet part files under {path}")
    return files


def bloom_filter_offsets(
    spark: SparkSession, file_path: str
) -> dict[str, list[int | None]]:
    """Footer-level evidence: per column, the bloom-filter offset of
    each row group (None where no filter was written)."""
    _, reader = _open_reader(spark, file_path)
    try:
        blocks = reader.getFooter().getBlocks()
        out: dict[str, list[int | None]] = {}
        for bi in range(blocks.size()):
            cols = blocks.get(bi).getColumns()
            for ci in range(cols.size()):
                c = cols.get(ci)
                off = c.getBloomFilterOffset()
                out.setdefault(c.getPath().toDotString(), []).append(
                    None if off < 0 else int(off)
                )
        return out
    finally:
        reader.close()


def _plain_encode(value, physical: str) -> bytes:
    """The parquet PLAIN encoding parquet-mr's bloom hash consumes, for
    the column's ACTUAL physical type (read from the footer — guessing
    from the Python value would hash an INT32 column's probe as 8
    little-endian bytes and report every row group 'provably'
    match-free)."""
    if physical == "INT64":
        return struct.pack("<q", int(value))
    if physical == "INT32":
        return struct.pack("<i", int(value))
    if physical == "DOUBLE":
        return struct.pack("<d", float(value))
    if physical == "FLOAT":
        return struct.pack("<f", float(value))
    if physical == "BINARY":
        return value.encode("utf-8") if isinstance(value, str) else bytes(value)
    raise TypeError(
        f"unsupported physical type {physical} for a bloom probe "
        "(BOOLEAN columns get no bloom filters; INT96/FIXED are unhandled)"
    )


def row_groups_surviving(
    spark: SparkSession, path: str, col: str, value
) -> tuple[int, int]:
    """Replay RowGroupFilter's bloom decision for the point predicate
    ``col = value`` over every row group of every part file under
    ``path``: returns (surviving, total). A row group without a bloom
    filter on ``col`` always survives (no evidence to drop it); one
    whose filter reports absent is provably match-free and a scan
    skips it. The probe hashes the plain encoding of the column's
    physical type AS READ FROM THE FOOTER (INT32/INT64/FLOAT/DOUBLE/
    BINARY), so it is bit-identical to what the writer hashed."""
    surviving = total = 0
    for f in _part_files(path):
        jvm, reader = _open_reader(spark, f)
        try:
            Binary = jvm.org.apache.parquet.io.api.Binary
            blocks = reader.getFooter().getBlocks()
            for bi in range(blocks.size()):
                block = blocks.get(bi)
                total += 1
                cols = block.getColumns()
                chunk = None
                for ci in range(cols.size()):
                    if cols.get(ci).getPath().toDotString() == col:
                        chunk = cols.get(ci)
                        break
                if chunk is None or chunk.getBloomFilterOffset() < 0:
                    surviving += 1
                    continue
                bloom = reader.getBloomFilterDataReader(block).readBloomFilter(
                    chunk
                )
                if bloom is None:
                    surviving += 1
                    continue
                physical = (
                    chunk.getPrimitiveType().getPrimitiveTypeName().name()
                )
                b = Binary.fromConstantByteArray(
                    _plain_encode(value, physical)
                )
                if bloom.findHash(bloom.hash(b)):
                    surviving += 1
        finally:
            reader.close()
    return surviving, total
