"""Operator library — one module per operator family.

Each operator is a plain function ``op(df, ...) -> DataFrame`` (composable
via ``df.transform``), the Spark-idiomatic form of the reference's
DataFrame-extension trait (src/dataframe/sample.rs:11-26). Validation
happens eagerly at call time (plan-construction), execution stays lazy.
"""

from ballista_extensions_spark.operators.sample import sample

__all__ = ["sample"]
