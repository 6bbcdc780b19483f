"""Delta table read — parity for the reference's sibling showcase
``ballista_delta`` (Delta table read support for Ballista; referenced by
README.md:13 of the reference repo, not contained in it).

Two paths:

- When the delta-spark package is on the classpath, ``read_delta``
  delegates to ``format("delta")`` (full feature surface).
- Otherwise it falls back to a minimal READ-ONLY implementation of the
  public Delta transaction-log protocol (delta.io PROTOCOL.md):
  replay ``_delta_log/<version>.json`` commits (one JSON action per
  line — add / remove / metaData / protocol), starting from the newest
  parquet checkpoint at or below the requested version when one exists,
  maintain the live-file set (a remove drops a previously added path),
  and scan the surviving parquet parts with the schema pinned from the
  latest ``metaData.schemaString``.

Scale note: the log replay is DRIVER-side metadata work — the log is
KB-to-MB of JSON/parquet regardless of table size (that is Delta's
design point), and the data files are then read by a normal distributed
parquet scan with pushdown/pruning intact. Unsupported protocol
features (reader version > 1: column mapping, deletion vectors) raise
NotImplementedError rather than silently mis-reading."""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")


def delta_supported(spark: SparkSession) -> bool:
    """True when the delta-spark data source is on the classpath."""
    try:
        spark.read.format("delta").load("/nonexistent-delta-probe")
    except Exception as e:  # noqa: BLE001 — classify by message
        msg = str(e)
        if "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg:
            return False
        return True  # source resolved; path error means delta exists
    return True


def _replay_log(
    path: str, version: int | None
) -> tuple[list[dict], dict, int]:
    """Replay the transaction log up to ``version`` (inclusive; None =
    latest). Returns (live add-actions, latest metaData, last version
    applied)."""
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {path}")
    commits: dict[int, str] = {}
    checkpoints: dict[int, str] = {}
    for name in os.listdir(log_dir):
        if m := _COMMIT_RE.match(name):
            commits[int(m.group(1))] = os.path.join(log_dir, name)
        elif m := _CHECKPOINT_RE.match(name):
            checkpoints[int(m.group(1))] = os.path.join(log_dir, name)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log in {path}")
    last = max(list(commits) + list(checkpoints))
    target = last if version is None else version
    if target not in commits and target not in checkpoints:
        raise ValueError(
            f"version {target} does not exist (log has 0..{last})"
        )

    live: dict[str, dict] = {}  # path -> add action
    meta: dict = {}
    start = 0
    ckpt_versions = [v for v in checkpoints if v <= target]
    if ckpt_versions:
        ckpt_v = max(ckpt_versions)
        import pyarrow.parquet as pq

        tbl = pq.read_table(checkpoints[ckpt_v]).to_pylist()
        for row in tbl:
            _apply_action(
                {k: v for k, v in row.items() if v is not None}, live, meta
            )
        start = ckpt_v + 1
    for v in range(start, target + 1):
        if v not in commits:
            raise ValueError(
                f"missing commit {v} in _delta_log (no contiguous chain "
                f"to version {target})"
            )
        with open(commits[v]) as f:
            for line in f:
                line = line.strip()
                if line:
                    _apply_action(json.loads(line), live, meta)
    return list(live.values()), meta, target


def _apply_action(action: dict, live: dict[str, dict], meta: dict) -> None:
    if "protocol" in action:
        mrv = action["protocol"].get("minReaderVersion", 1)
        if mrv > 1:
            raise NotImplementedError(
                f"Delta minReaderVersion {mrv} requires features (column "
                "mapping / deletion vectors) this minimal reader does not "
                "implement; install delta-spark"
            )
    if "metaData" in action:
        meta.clear()
        meta.update(action["metaData"])
    if "add" in action:
        live[action["add"]["path"]] = action["add"]
    if "remove" in action:
        live.pop(action["remove"]["path"], None)


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table (optionally time-traveling to a version),
    via delta-spark when present, else the built-in log reader."""
    if delta_supported(spark):
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(path)
    return read_delta_log(spark, path, version)


def read_delta_log(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Pure-protocol Delta read: replay the log, scan the live files.

    Partitioned tables: Delta stores partition column values in each
    add action's ``partitionValues`` (the columns are absent from the
    parquet parts), so files are grouped per partition tuple and each
    group's scan gets the partition columns attached as literals —
    the same reconstruction the real reader performs. Nulls use the
    protocol's null-partition encoding (absent/None value)."""
    adds, meta, _v = _replay_log(path, version)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns") or []
    if not adds:
        return spark.createDataFrame([], schema)
    data_schema = StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )

    def _file(a: dict) -> str:
        # add.path is RFC 2396 URL-encoded in the Delta log (PROTOCOL.md:
        # a partition dir `col=a b` is logged as `col=a%20b`); decode
        # before touching the filesystem.
        from urllib.parse import unquote

        return os.path.join(path, unquote(a["path"]))

    if not part_cols:
        return spark.read.schema(data_schema).parquet(*[_file(a) for a in adds])

    groups: dict[tuple, list[str]] = {}
    for a in adds:
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(_file(a))
    out: DataFrame | None = None
    by_name = {f.name: f.dataType for f in schema.fields}
    for key, files in groups.items():
        df = spark.read.schema(data_schema).parquet(*files)
        for c, raw in zip(part_cols, key):
            # protocol: partition values are strings (None = null);
            # cast back to the declared column type
            df = df.withColumn(c, F.lit(raw).cast(by_name[c]))
        df = df.select(*[f.name for f in schema.fields])
        out = df if out is None else out.unionByName(df)
    return out
