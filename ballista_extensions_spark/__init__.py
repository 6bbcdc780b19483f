"""ballista_extensions_spark — a PySpark-native analytics operator engine.

A from-scratch re-expression of the capability surface of the reference
repo ``milenkovicm/ballista_extensions`` (a Ballista/DataFusion extension
showcase implementing a distributed ``sample`` operator), built Spark-first:

- operators are plain functions ``op(df, ...) -> DataFrame`` composing
  Catalyst built-ins (the idiomatic equivalent of the reference's custom
  logical node + extension planner + protobuf codec stack — Spark already
  ships plan serialization and physical planning, so our "extension
  mechanism" is DataFrame-level plan construction; see SURVEY.md §2 Tier D,
  reference src/logical/sample_extension.rs:12-77, src/planner/
  extension_planner.rs:54-83, src/codec/extension.rs:39-198);
- every operator is registered in :mod:`ballista_extensions_spark.queries`
  with a DuckDB oracle where ANSI-SQL-expressible;
- beyond the reference surface, LLM-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) built the same way.

Design rules (100 TB posture):
- DataFrame/SQL only, no RDDs; no ``collect()`` inside operator bodies.
- Narrow ops stay narrow (sample preserves partitioning, reference
  src/physical/sample_exec.rs:55-57); wide ops document their exchanges.
- Small dimension tables are broadcast; aggregations rely on partial
  (map-side) aggregation; AQE is enabled by the session factory.
"""

from ballista_extensions_spark.session import get_session
from ballista_extensions_spark.io import load_table, load_tables, TABLES

__all__ = ["get_session", "load_table", "load_tables", "TABLES"]

__version__ = "0.1.0"
