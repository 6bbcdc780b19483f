"""Text operator unit tests on constructed inputs (known-answer) plus
driver-corpus sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import text as T


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "THE   Quick brown  fox "),
        (3, "a b c d e f g h i j k"),
        (4, "hello, world! the end."),
        (5, "x"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_count(toy):
    got = {r.doc_id: r.n for r in toy.select("doc_id", T.token_count(F.col("text")).alias("n")).collect()}
    assert got[1] == 4
    assert got[3] == 11
    assert got[5] == 1


def test_normalize(toy):
    got = {
        r.doc_id: r.n
        for r in toy.select("doc_id", T.normalize(F.col("text")).alias("n")).collect()
    }
    assert got[2] == "the quick brown fox"
    assert got[1] == got[2]


def test_rolling_fingerprint_known_value(spark):
    """'hello world' under base31/mod 1e9+7 == 204910434 (verified
    independently against DuckDB's fold in tools/selfcheck)."""
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    v = df.select(T.fingerprint_rolling("text").alias("fp")).collect()[0].fp
    assert v == 204910434


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world")], ["doc_id", "text"]
    )
    fps = [r.fp for r in df.select(T.fingerprint_md5(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_text_stats_math(toy):
    row = {r.doc_id: r for r in T.text_stats(toy).collect()}[1]
    # "the quick brown fox": 4 tokens, 19 chars, stopword 'the' -> 1/4
    assert row.n_tokens == 4
    assert row.n_chars == 19
    assert row.stopword_ratio == pytest.approx(0.25)
    assert row.avg_token_len == pytest.approx((3 + 5 + 5 + 3) / 4)
    assert row.distinct_ratio == pytest.approx(1.0)


def test_punctuation_count(toy):
    row = {r.doc_id: r for r in T.text_stats(toy).collect()}[4]
    assert row.n_punct == 3  # comma, bang, period


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog"),
            (2, "der hund und die katze ist"),
            (3, "le chat et la maison est"),
            (4, "xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.lang_pred for r in T.lang_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_lang_id_deterministic_tiebreak(spark):
    # one en marker + one de marker -> 'en' wins by precedence order
    df = spark.createDataFrame([(1, "the und")], ["doc_id", "text"])
    assert T.lang_id(df).collect()[0].lang_pred == "en"


def test_corpus_stats_no_nulls(documents):
    stats = T.text_stats(documents)
    n = stats.count()
    assert n == documents.count()
    assert stats.dropna().count() == n


class TestChunkDocuments:
    def test_short_doc_single_chunk(self, spark):
        from ballista_extensions_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
        rows = chunk_documents(df, size=200, overlap=40).collect()
        assert len(rows) == 1
        assert rows[0].chunk_text == "abc"
        assert rows[0].n_chunks == 1
        assert rows[0].chunk_start == 1

    def test_overlap_and_coverage(self, spark):
        from ballista_extensions_spark.operators.text import chunk_documents

        text = "x" * 500
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = sorted(
            chunk_documents(df, size=200, overlap=40).collect(),
            key=lambda r: r.chunk_id,
        )
        # starts 1, 161, 321 -> spans [1,200],[161,360],[321,500]
        assert [r.chunk_start for r in rows] == [1, 161, 321]
        assert [len(r.chunk_text) for r in rows] == [200, 200, 180]
        # consecutive chunks overlap by exactly `overlap` chars
        assert rows[0].chunk_text[-40:] == rows[1].chunk_text[:40]
        # full reconstruction from step-sized pieces
        rebuilt = rows[0].chunk_text + "".join(
            r.chunk_text[40:] for r in rows[1:]
        )
        assert rebuilt == text

    def test_overlap_validation(self, spark):
        from ballista_extensions_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
        import pytest as _pytest

        with _pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, size=100, overlap=100)


def test_compression_stats_contract(spark):
    """zlib quality proxy: ratio separates repetitive from random,
    matches driver-side zlib, NULL only for empty/None text."""
    import zlib

    from ballista_extensions_spark.operators.text import compression_stats

    rep = "abc " * 500
    rnd = " ".join(f"t{(i * 7919) % 104729}" for i in range(300))
    rows = [(1, rep), (2, rnd), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_stats(df).collect()}
    assert got[1]["n_compressed"] == len(zlib.compress(rep.encode(), 6))
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
    assert got[3]["compression_ratio"] is None and got[3]["n_bytes"] == 0
    assert got[4]["compression_ratio"] is None
    assert 0 < got[2]["compression_ratio"] <= 1.1


def test_nfc_funnel_stage(spark):
    """nfc=True makes decomposed and precomposed spellings of the same
    span behave identically in span scrub and the BPE applier (the
    funnel wiring of VERDICT r13 #6); nfc=False keeps the raw bytes."""
    import unicodedata

    from ballista_extensions_spark.functions.udf import py_nfc_normalize
    from ballista_extensions_spark.operators.bpe_stream import (
        FROZEN_STREAM_MERGES,
        bpe_stream_token_counts,
    )
    from ballista_extensions_spark.operators.dedup import exact_span_scrub
    from pyspark.sql import functions as F

    pre = "café " * 12  # decomposed
    post = unicodedata.normalize("NFC", pre)
    assert pre != post
    df = spark.createDataFrame(
        [(1, pre.strip()), (2, post.strip())], "doc_id long, text string"
    )
    # UDF twin of unicodedata
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.length(py_nfc_normalize(F.col("text"))).alias("n")
        ).collect()
    }
    assert got[1] == got[2]
    # span scrub: with nfc the two docs are byte-identical streams, so
    # the later doc is fully scrubbed; without nfc nothing repeats
    raw = {r["doc_id"]: r["n_after"] for r in exact_span_scrub(df, n=5).collect()}
    canon = {
        r["doc_id"]: r["n_after"]
        for r in exact_span_scrub(df, n=5, nfc=True).collect()
    }
    assert raw[1] == raw[2] > 0  # no cross-doc dedup without nfc
    assert canon[2] > canon[1] or canon[1] == 0 or canon[2] == 0
    assert sorted(canon.values()) != sorted(raw.values())
    # BPE applier: token counts equal across spellings under nfc
    bpe = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_stream_token_counts(
            df, FROZEN_STREAM_MERGES, nfc=True
        ).collect()
    }
    assert bpe[1] == bpe[2]
