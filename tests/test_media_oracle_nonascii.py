"""Non-ASCII media-oracle parity (VERDICT r10 #3).

The media oracles used to index payload bytes with
``ascii(substring(text, i, 1))`` — CHARACTER-indexed with codepoint
values — while the Spark fixtures tile ``text.encode("utf-8")`` BYTES.
The sf corpora are 100% ASCII so the bug was latent; one non-ASCII
document in a regenerated testdata drop would have silently broken
every media oracle. Round 11 switched the oracles to byte indexing via
``CAST('0x' || substring(hex(encode(text)), i*2-1, 2) AS INT)``; this
test proves Spark and oracle agree on a corpus that CONTAINS non-ASCII
(multi-byte UTF-8) documents, end-to-end through a WAV decode and an
AVI decode query.
"""

from __future__ import annotations

import os

import duckdb
import pytest

QUERIES = ["audio_decode_meta", "video_decode_meta", "media_mixed_decode"]


@pytest.fixture(scope="module")
def nonascii_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "plain ascii control row " * 12,
        "héllo wörld — naïve café " * 9,          # Latin-1 range, 2-byte
        "日本語のドキュメント本文です。" * 7,        # CJK, 3-byte
        "mixed ascii + ümlaut + 中文 + emoji 🎵 " * 6,  # incl. 4-byte
        "",                                         # empty-text branch
        "Ω" * 131,                                  # odd byte/char ratio
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["test"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    assert any(not t.isascii() for t in texts)
    d = tmp_path_factory.mktemp("nonascii_sf")
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_media_oracle_agrees_on_nonascii_corpus(spark, nonascii_sf_dir, name):
    import __spark_entry__ as entrymod

    sdf = entrymod.queries()[name](spark, nonascii_sf_dir)
    scols = sdf.columns
    srows = {tuple(str(r[c]) for c in sorted(scols)) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{nonascii_sf_dir}/documents.parquet')"
    )
    rel = con.sql(entrymod.oracle_sql()[name])
    dcols = list(rel.columns)
    assert sorted(scols) == sorted(dcols)
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = {tuple(str(r[i]) for i in order) for r in rel.fetchall()}
    con.close()
    assert srows == drows, f"{name}: Spark vs oracle diverge on non-ASCII"
    assert len(srows) > 0
