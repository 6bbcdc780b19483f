"""Custom Python data source (Spark 4 DataSource API) — the engine's
Tier-D "add a source the host engine lacks" showcase, expressed the way
Spark 4 intends extensions to be written.

Where the reference threads ONE custom operator through logical node ->
protobuf codec -> extension planner -> physical node (its entire repo,
src/logical/sample_extension.rs through src/physical/sample_exec.rs),
Spark 4's `pyspark.sql.datasource.DataSource` collapses the same
extension surface to three methods: schema(), partitions(), read() —
the scheduler ships the reader to executors, partition planning is the
physical-plan hook, and `pushFilters` is the optimizer hook (predicate
pushdown reaching a PYTHON source).

`SyntheticDocsDataSource` generates a documents-table-shaped corpus
deterministically from (seed, doc_id) — no stored data, any size, any
partition count: the standard synthetic-benchmark source (a dbgen
equivalent) every engine needs. Scale: partitions are independent id
ranges (one task each, no shuffle, no driver data), and a pushed
doc_id range prunes work before generation.
"""

from __future__ import annotations

from collections.abc import Iterator

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

#: Same word list the driver's synthetic documents draw from — keeps the
#: generated corpus compatible with the text operators' assumptions
#: (whitespace-tokenizable, ASCII).
_WORDS = (
    "key agg row scan slow fast table value part hash join small line "
    "customer query data batch window spark order column dedup token "
    "filter merge sort group index cache"
).split()

_LANGS = ("en", "de", "fr", "es", "zh")


def _doc_text(seed: int, doc_id: int) -> str:
    """Deterministic word salad from a 64-bit mix of (seed, doc_id) —
    a splitmix64-style sequence, stable across engines/runs."""
    x = (seed * 0x9E3779B97F4A7C15 + doc_id * 0xBF58476D1CE4E5B9) & (
        2**64 - 1
    )
    words = []
    n = 20 + (x % 61)  # 20..80 words
    for _ in range(n):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & (2**64 - 1)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & (2**64 - 1)
        x ^= x >> 31
        words.append(_WORDS[x % len(_WORDS)])
    return " ".join(words)


class _DocsPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _DocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("n_partitions", 8))
        self.lo = 0
        self.hi = self.n_docs

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Optimizer hook: doc_id range predicates narrow the generated
        id range (pruning work BEFORE generation); everything else is
        returned as unsupported so Spark re-applies it post-scan."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("doc_id",):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_parts)
        step = max(1, (hi - lo + n - 1) // n)
        return [
            _DocsPartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ] or [_DocsPartition(lo, lo)]

    def read(self, partition: _DocsPartition):
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(self.seed, doc_id)
            yield (
                doc_id,
                text,
                _LANGS[(doc_id * 7 + self.seed) % len(_LANGS)],
                f"src{doc_id % 20}",
                len(text),
            )


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` after
    ``spark.dataSource.register(SyntheticDocsDataSource)``. Options:
    n_docs, seed, n_partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )

    def reader(self, schema: StructType) -> _DocsReader:
        return _DocsReader(schema, self.options)


def register(spark) -> None:
    """Idempotent registration of the engine's Python data sources.
    Also enables Python-source filter pushdown (off by default in
    Spark 4.1; runtime-settable SQL conf)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
    spark.dataSource.register(SyntheticDocsStreamDataSource)
    spark.dataSource.register(NdjsonPartsDataSource)


class _DocsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream of synthetic documents: the offset is just the
    next doc_id, so batches are exactly reproducible — `read` advances
    by batch_size, `readBetweenOffsets` regenerates any past range on
    replay (the determinism that makes exactly-once sinks possible
    with no write-ahead data, only offsets)."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, start: int, end: int) -> list:
        # a LIST, not a generator: the streaming runner deep-copies the
        # prefetched batch into its offset cache, and generators don't
        # pickle. Batches are bounded by batch_size, so materializing is
        # safe by construction.
        out = []
        for doc_id in range(start, end):
            text = _doc_text(self.seed, doc_id)
            out.append(
                (
                    doc_id,
                    text,
                    _LANGS[(doc_id * 7 + self.seed) % len(_LANGS)],
                    f"src{doc_id % 20}",
                    len(text),
                )
            )
        return out

    def read(self, start: dict):
        lo = start["next"]
        hi = lo + self.batch_size
        return self._rows(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["next"], end["next"])


class SyntheticDocsStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_docs_stream")`` — the
    streaming twin of :class:`SyntheticDocsDataSource`; same schema,
    same deterministic generator, offset-only state."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs_stream"

    def schema(self) -> str:
        return (
            "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )

    def simpleStreamReader(self, schema: StructType) -> _DocsStreamReader:
        return _DocsStreamReader(self.options)


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    rows: int


class _NdjsonPartWriter(DataSourceWriter):
    """Per-task NDJSON part writer with a two-phase commit: tasks write
    to `.inprogress` files and report them in commit messages; the
    driver's commit() renames all parts atomically-enough (rename per
    part + a _SUCCESS marker), abort() removes strays — the same
    task-commit/job-commit protocol Hadoop committers implement, in
    ~40 lines of Python."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ndjson_parts writer requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> _PartFile:
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        _os.makedirs(self.path, exist_ok=True)
        tmp = _os.path.join(
            self.path, f".part-{pid:05d}-{_uuid.uuid4().hex}.inprogress"
        )
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _PartFile(path=tmp, rows=n)

    def commit(self, messages) -> None:
        import os as _os

        if self.overwrite:
            # mode("overwrite") contract: the committed directory holds
            # ONLY this job's parts. Clear stale parts before renaming
            # the new ones in, else overwrite silently behaves as append
            # and a read-back returns the union of both writes.
            # messages carry `.inprogress` temp names (renamed below), so
            # every existing committed `.ndjson` is stale by definition
            for name in _os.listdir(self.path):
                if name.endswith(".ndjson") or name == "_SUCCESS":
                    try:
                        _os.remove(_os.path.join(self.path, name))
                    except FileNotFoundError:
                        pass
        for m in messages:
            d, base = _os.path.split(m.path)
            final = _os.path.join(
                d, base.lstrip(".").replace(".inprogress", ".ndjson")
            )
            _os.rename(m.path, final)
        with open(_os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(sum(m.rows for m in messages)))

    def abort(self, messages) -> None:
        import os as _os

        for m in messages:
            try:
                _os.remove(m.path)
            except FileNotFoundError:
                pass


class NdjsonPartsDataSource(DataSource):
    """``df.write.format("ndjson_parts").option("path", ...)`` — the
    writer half of the Python DataSource extension surface, with the
    task-commit/job-commit protocol made explicit."""

    @classmethod
    def name(cls) -> str:
        return "ndjson_parts"

    def writer(self, schema: StructType, overwrite: bool):
        return _NdjsonPartWriter(self.options, overwrite)
