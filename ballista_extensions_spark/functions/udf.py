"""Vectorized Python UDF surface — parity with the reference's sibling
showcase ``ballista_python`` (Python UDF support for Ballista;
referenced by README.md:12 of the reference repo, not contained in it).

Spark's native equivalent is the Arrow-batched pandas UDF: Python
receives pandas Series per batch (vectorized, 10-100x faster than
row-at-a-time UDFs), the exchange format is Arrow, and the UDF plugs
into the DataFrame plan like any expression. The session factory enables
Arrow and bounds batch size.

These UDFs are deliberately simple and integer/string-valued so their
results are engine-exact (oracle-checkable) — they demonstrate the
plumbing; real deployments put model scoring or tokenizers here.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def py_token_count(texts: pd.Series) -> pd.Series:
    """Whitespace token count, computed in Python (vectorized batch).
    Matches split-on-\\s+ semantics of the JVM/text.py implementation for
    non-empty trimmed-or-not inputs."""
    pattern = re.compile(r"\s+")
    return texts.map(lambda t: 0 if t is None else len(pattern.split(t)))


@pandas_udf("string")
def py_normalize(texts: pd.Series) -> pd.Series:
    """Python twin of operators/text.py:normalize (lower/trim/collapse)."""
    pattern = re.compile(r"\s+")
    return texts.map(
        lambda t: None if t is None else pattern.sub(" ", t).strip().lower()
    )


@pandas_udf("double")
def py_digit_ratio(texts: pd.Series) -> pd.Series:
    """Share of digit characters — an exact small-int ratio in double."""

    def ratio(t: str | None) -> float | None:
        if t is None or len(t) == 0:
            return None
        return sum(c.isdigit() for c in t) / len(t)

    return texts.map(ratio)
