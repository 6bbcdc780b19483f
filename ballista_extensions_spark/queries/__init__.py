"""Query registry — the engine's declared capability surface.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
additions of §7) registers here as a named query with, where
SQL-expressible, a DuckDB oracle. ``__spark_entry__.py`` exposes this
registry to the driver.
"""

from ballista_extensions_spark.queries.registry import (
    QUERIES,
    ORACLES,
    register,
    get_queries,
    get_oracles,
)

# Importing the modules populates the registry.
from ballista_extensions_spark.queries import relational  # noqa: E402,F401
from ballista_extensions_spark.queries import tpch  # noqa: E402,F401
from ballista_extensions_spark.queries import llm  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics  # noqa: E402,F401
from ballista_extensions_spark.queries import pyudf  # noqa: E402,F401
from ballista_extensions_spark.queries import tpch2  # noqa: E402,F401
from ballista_extensions_spark.queries import tpch3  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics2  # noqa: E402,F401
from ballista_extensions_spark.queries import sampling  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics3  # noqa: E402,F401
from ballista_extensions_spark.queries import streaming_replay  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics4  # noqa: E402,F401
from ballista_extensions_spark.queries import audits  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics5  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics6  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics7  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics8  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics9  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics10  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics11  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics12  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics13  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics14  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics15  # noqa: E402,F401
from ballista_extensions_spark.queries import analytics16  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register", "get_queries", "get_oracles"]
