"""Byte-level pre-tokenization (operators/pretokenize.py, VERDICT r14
directive #7): the three engines — Java regex (Spark), RE2 (DuckDB),
and the Python category scanner — must produce the IDENTICAL
segmentation, including on adversarial unicode."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators.pretokenize import (
    PRETOK_PATTERN,
    pretok_segments_sql_duckdb,
    pretok_segments_sql_spark,
    py_pretok_segments,
    py_pretok_words,
)

# adversarial fixtures: contractions (incl. alternation-order traps
# and no-lookahead consequences), unicode letter/number classes,
# combining marks, Hangul jamo, CJK, emoji+ZWJ, RTL, odd whitespace
CASES = [
    "",
    "hello world",
    "don't stop",
    "they'll we've she'd I'm you're it's can't",
    "'sand castle",  # 's matches first, no lookahead
    "o'clock",  # 'c is no contraction -> punct "'" + word
    "CAN'T",  # case-sensitive suffixes: 'T is not 't
    "''",
    "'",
    "a''b",
    "abc123def",  # letter/digit class switches
    "3.14159 costs $2",
    "  double space",  # ws run absorbs BOTH spaces (no lookahead)
    "tab\tand\nnewline\x0bvt\fff\rcr",
    "trailing space ",
    " leading",
    "étude café",  # combining acute vs precomposed
    "가가",  # Hangul jamo + syllable
    "日本語 123 abc",  # CJK
    "١٢٣ arabic digits",  # Nd outside ASCII
    "² superscript Ⅰ roman",  # No and Nl number classes
    "\U0001f600‍\U0001f680 emoji zwj",
    "שלום hebrew",
    "mixed éÉ case",
    "a" * 500 + "1" * 500,
    "under_score-dash.dot",
]


@pytest.fixture(scope="module")
def _spark_segs(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "i long, t string"
    )
    rows = (
        df.select("i", F.expr(pretok_segments_sql_spark("t")).alias("s"))
        .orderBy("i")
        .collect()
    )
    return [list(r["s"]) for r in rows]


def test_totality_and_python_twin(_spark_segs):
    """Segmentation is total (concat == input) and the Python scanner
    reproduces the Java regex segmentation exactly."""
    for case, got in zip(CASES, _spark_segs):
        assert "".join(got) == case
        assert py_pretok_segments(case) == got, case


def test_duckdb_twin(_spark_segs):
    con = duckdb.connect()
    for case, want in zip(CASES, _spark_segs):
        got = con.execute(
            f"SELECT {pretok_segments_sql_duckdb('?::VARCHAR')}",
            [case],
        ).fetchone()[0]
        assert list(got) == want, case


def test_pattern_is_lookahead_free():
    assert "(?!" not in PRETOK_PATTERN and "(?=" not in PRETOK_PATTERN


def test_applier_pretokenize_stage(spark):
    """The optional pre-split stage changes word boundaries the way a
    production tokenizer does (contractions split, digits separate)
    and conserves the symbol accounting (chunk chars = word chars +
    one joint per word)."""
    from ballista_extensions_spark.operators.bpe_stream import (
        FROZEN_STREAM_MERGES,
        bpe_stream_token_counts,
    )

    d = spark.createDataFrame(
        [(1, "don't mix abc123 classes"), (2, "plain words only")],
        "doc_id long, text string",
    )
    pre = {
        r["doc_id"]: r
        for r in bpe_stream_token_counts(
            d, FROZEN_STREAM_MERGES, pretokenize=True
        ).collect()
    }
    plain = {
        r["doc_id"]: r
        for r in bpe_stream_token_counts(d, FROZEN_STREAM_MERGES).collect()
    }
    words1 = py_pretok_words("don't mix abc123 classes")
    # "don't" -> don + t ('t suffix, apostrophe dropped by norm);
    # "abc123" -> abc + 123
    assert words1 == ["don", "t", "mix", "abc", "123", "classes"]
    assert pre[1]["n_symbols"] == sum(len(w) + 1 for w in words1)
    # finer boundaries add joints: symbol count grows vs the bare
    # splitter on class-mixing text, and is identical on plain words
    assert pre[1]["n_symbols"] > plain[1]["n_symbols"]
    assert pre[2]["n_symbols"] == plain[2]["n_symbols"]
    assert pre[2]["n_tokens"] == plain[2]["n_tokens"]
