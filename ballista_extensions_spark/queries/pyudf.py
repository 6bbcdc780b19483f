"""Pandas-UDF-backed queries — the Python-UDF surface (reference sibling
``ballista_python``, README.md:12 of the reference) on Spark's Arrow
path. The UDFs are integer/ratio-valued so the oracle comparison stays
bit-exact (the point here is proving the vectorized Python plumbing
against the same correctness gate as the JVM ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.functions.udf import (
    py_digit_ratio,
    py_normalize,
    py_token_count,
)
from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.queries.registry import register


@register(
    "pyudf_text_metrics",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS py_tokens,
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS py_norm,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS py_digit_ratio
    FROM documents
    """,
)
def pyudf_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDFs over the documents corpus, hash-checked
    against pure-SQL equivalents — Python and JVM compute the same
    values (ASCII corpus; isdigit == [0-9], re.split == \\s+ split)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        py_token_count(F.col("text")).alias("py_tokens"),
        py_normalize(F.col("text")).alias("py_norm"),
        py_digit_ratio(F.col("text")).alias("py_digit_ratio"),
    )
