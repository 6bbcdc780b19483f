"""Apply-side BPE (operators/bpe.py): trainer determinism + frozen
constant reproduction, cross-engine scan-left replace parity on
adversarial overlap strings, and the token-count contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import bpe as B


def _py_apply(text: str, merges) -> list[str]:
    """Pure-Python reference: normalize, frame per word, apply each
    merge leftmost-first — the semantics both SQL chains must match."""
    import re

    norm = re.sub(r"[^a-zA-Z0-9]+", "#", text).lower()
    toks: list[str] = []
    for word in norm.split("#"):
        syms = tuple(word)
        for x, y in merges:
            syms = B._merge_word(syms, x, y)
        toks.extend(syms)
    return toks


@pytest.mark.parametrize(
    "text",
    [
        "a a a a",            # merge (a,a): odd/even run boundary
        "aaaa aaa aa a",      # nested runs: (a,a) then (aa,aa)
        "abab ababab",        # overlapping (a,b)/(b,a) chains
        "x!y?z  mixed CASE 42",
        "",
        "!!!",
    ],
)
def test_scan_left_parity_spark_duckdb_python(spark, text):
    merges = (("a", "a"), ("aa", "aa"), ("a", "b"), ("b", "a"))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got_spark = df.select(
        F.expr(B.bpe_segment_sql("text", merges)).alias("s")
    ).collect()[0]["s"]
    got_duck = duckdb.sql(
        "SELECT "
        + B.bpe_segment_sql_duckdb(f"'{text}'", merges)
    ).fetchone()[0]
    assert got_spark == got_duck
    toks = [t for t in got_spark.split(" ") if t not in ("", "#")]
    assert toks == _py_apply(text, merges)


def test_token_counts_hand_checked(spark):
    merges = (("a", "b"), ("ab", "c"))
    rows = [
        (1, "abc abx cab"),   # abc->1 tok; abx->ab,x=2; cab->c,ab=2
        (2, ""),
        (3, "ABC"),           # lowercased -> abc -> 1
        (4, "a-b-c"),         # separators block merges -> 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chars"], r["n_tokens"])
        for r in B.bpe_token_counts(df, merges).collect()
    }
    assert got == {1: (9, 5), 2: (0, 0), 3: (3, 1), 4: (3, 3)}


def test_frozen_merges_reproduce(spark):
    """The shipped constant IS the trainer's output on sf0.01 — the
    oracle replays these merges, so drift here would silently decouple
    query from oracle."""
    import os

    if not os.path.exists("/root/testdata/sf0.01/documents.parquet"):
        pytest.skip("sf0.01 testdata absent")
    from ballista_extensions_spark.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    assert B.train_bpe_merges(docs, 32) == B.FROZEN_MERGES


def test_trainer_determinism_and_validation(spark):
    df = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    m1 = B.train_bpe_merges(df, 6)
    m2 = B.train_bpe_merges(df, 6)
    assert m1 == m2 and len(m1) == 6
    # (a,t) leads at 15 (cat/sat/mat); then (t,h)/(h,e) tie at 10 and
    # the lexicographically smaller (h,e) must win
    assert m1[0] == ("a", "t") and m1[1] == ("h", "e")
    with pytest.raises(ValueError, match="n_merges"):
        B.train_bpe_merges(df, 0)
    with pytest.raises(ValueError, match="illegal"):
        B.bpe_segment_sql("text", (("a", "b c"),))


def test_merge_exhaustion_stops_early(spark):
    """A corpus with fewer distinct adjacent pairs than n_merges must
    return only the realizable merges, not pad or loop."""
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    m = B.train_bpe_merges(df, 50)
    assert m == (("a", "b"),)
