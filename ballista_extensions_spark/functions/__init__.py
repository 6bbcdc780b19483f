"""Column-function helpers shared by operators and queries."""

from ballista_extensions_spark.functions.exact import (
    dsum,
    dsum_expr,
    davg,
    lcount,
)

__all__ = ["dsum", "dsum_expr", "davg", "lcount"]
