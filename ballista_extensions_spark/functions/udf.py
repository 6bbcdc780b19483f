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

from pyspark.sql import Column

# NOTE: the pandas_udf wrappers are built lazily at call time — the
# decorator needs an active SparkSession, and this module must stay
# importable (query registry import) before any session exists.


# ASCII-whitespace-only, per the cross-engine contract operators/text.py
# documents: Python's \s is Unicode-wide (NBSP, U+2028, ...) while Java
# regex \s and DuckDB RE2 \s are ASCII-only — a Unicode-space document
# would make the "twin" UDFs diverge from the JVM/oracle results.
_WS = r"[ \t\n\r\f\v]+"


def _token_count_batch(texts: pd.Series) -> pd.Series:
    pattern = re.compile(_WS)
    # NULL text -> NULL count (size(split(NULL)) is NULL in Spark and
    # len(string_split_regex(NULL)) is NULL in DuckDB; 0 would diverge)
    return texts.map(lambda t: None if t is None else len(pattern.split(t)))


def _normalize_batch(texts: pd.Series) -> pd.Series:
    pattern = re.compile(_WS)
    return texts.map(
        lambda t: None if t is None else pattern.sub(" ", t).strip().lower()
    )


def _digit_ratio_batch(texts: pd.Series) -> pd.Series:
    def ratio(t: str | None) -> float | None:
        if t is None or len(t) == 0:
            return None
        return sum(c.isdigit() for c in t) / len(t)

    return texts.map(ratio)


def py_token_count(col: Column) -> Column:
    """Whitespace token count in vectorized Python (matches the JVM
    split-on-\\s+ semantics of operators/text.py)."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_token_count_batch, "long")(col)


def py_normalize(col: Column) -> Column:
    """Python twin of operators/text.py:normalize (lower/trim/collapse)."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_normalize_batch, "string")(col)


def py_digit_ratio(col: Column) -> Column:
    """Share of digit characters — an exact small-int ratio in double."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_digit_ratio_batch, "double")(col)


def _zlib_len_batch_factory(level: int):
    def _zlib_len_batch(texts: pd.Series) -> pd.Series:
        import zlib

        return texts.map(
            lambda t: None
            if t is None
            else len(zlib.compress(t.encode("utf-8"), level))
        )

    return _zlib_len_batch


def py_zlib_len(col: Column, level: int = 6) -> Column:
    """zlib/DEFLATE compressed byte length of the utf-8 encoding —
    Arrow-batched; the compressor is the one quality-signal step Spark
    has no built-in for (operators/text.py:compression_stats)."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_zlib_len_batch_factory(level), "long")(col)


def _nfc_batch(texts: pd.Series) -> pd.Series:
    import unicodedata

    return texts.map(
        lambda t: None if t is None else unicodedata.normalize("NFC", t)
    )


def py_nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization, Arrow-batched (VERDICT r13 #6): real
    crawls mix decomposed and precomposed forms, which defeats
    byte-level dedup/fingerprinting unless canonicalized first. Python
    ``unicodedata.normalize('NFC', ...)`` and DuckDB ``nfc_normalize``
    both implement Unicode canonical composition, so results are
    engine-exact (oracle-checkable; fixture-verified over 2-4-byte
    UTF-8 and Hangul jamo in text_nfc_normalize_stats). NFC, not NFKC:
    compatibility folding (ligatures, width variants) is lossy and a
    separate policy decision."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf(_nfc_batch, "string")(col)
