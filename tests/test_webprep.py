"""Web-crawl prep operators (operators/webprep.py): HTML extraction
edge cases (entities, attribute-laden tags, empty content) and URL
normalization edge cases (no query, all-tracking query, ports in
hostless paths, case folding) beyond what the fixture corpus covers."""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_extensions_spark.operators.webprep import (
    docs_as_html,
    docs_as_urls,
    html_extract_stats,
    html_text,
    url_dedup,
    url_normalize,
)


def _one(spark, expr, value):
    return spark.range(1).select(
        expr(F.lit(value)).alias("v")
    ).collect()[0]["v"]


def test_html_text_strips_boilerplate_and_decodes_entities(spark):
    html = (
        '<html><head><title>T</title><script src="x.js">if(a&&b){}'
        "</script><style>.x{}</style></head><body>"
        '<nav class="top">Home</nav><div><p>A &amp; B &lt;tag&gt;'
        "&nbsp;C</p>  <p>second   para</p></div>"
        "<footer>foot</footer></body></html>"
    )
    assert _one(spark, html_text, html) == "A & B <tag> C second para"


def test_html_text_empty_body(spark):
    assert _one(spark, html_text, "<html><body></body></html>") == ""


def test_html_extract_stats_ratio_and_md5(spark):
    d = spark.createDataFrame(
        [(1, "hello world")], "doc_id long, text string"
    )
    row = html_extract_stats(docs_as_html(d)).collect()[0]
    assert row["n_text"] == len("hello world")
    assert 0 < row["retained_ratio"] < 1
    import hashlib

    assert row["text_md5"] == hashlib.md5(b"hello world").hexdigest()


def test_url_normalize_cases(spark):
    cases = {
        # case folding, www strip, fragment drop
        "HTTP://WWW.Ex.COM/A/b#frag": "http://ex.com/A/b",
        # path case PRESERVED, trailing slashes stripped
        "https://ex.com/Path///": "https://ex.com/Path",
        # all-tracking query dropped entirely
        "https://ex.com/p?utm_source=a&utm_b=c": "https://ex.com/p",
        # real params kept in order, tracking interleaved out
        "https://ex.com/p?b=2&utm_x=1&a=1": "https://ex.com/p?b=2&a=1",
        # no query, no fragment: unchanged but canonical
        "https://sub.ex.com/x": "https://sub.ex.com/x",
    }
    df = spark.createDataFrame(
        [(u,) for u in cases], "url string"
    ).select("url", url_normalize("url").alias("norm"))
    got = {r["url"]: r["norm"] for r in df.collect()}
    assert got == cases


def test_url_dedup_collapses_variants(spark):
    rows = [
        (1, "https://ex.com/a?utm_s=1"),
        (2, "HTTPS://WWW.ex.com/a/"),
        (3, "https://ex.com/a#f"),
        (4, "https://ex.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["norm_url"]: (r["canonical_id"], r["n_dups"])
        for r in url_dedup(df).collect()
    }
    assert got == {
        "https://ex.com/a": (1, 3),
        "https://ex.com/b": (4, 1),
    }


def test_fixture_urls_have_real_dup_structure(spark):
    """doc_ids congruent mod lcm(50,100)=100 with matching slash/query
    variants must collapse; distinct article ids must not."""
    d = spark.createDataFrame(
        [(i, "t") for i in range(400)], "doc_id long, text string"
    )
    out = url_dedup(docs_as_urls(d))
    assert out.count() < 400  # real collapsing happened
    assert out.agg(F.sum("n_dups")).collect()[0][0] == 400  # partition


def test_url_normalize_review_edge_cases(spark):
    """Code-review r11 regressions: stacked www. prefixes must strip
    fully (fixpoint), schemeless inputs pass through unchanged, and a
    host merely STARTING with 'www' (www-cdn) keeps its name."""
    cases = {
        "http://www.www.Ex.com/a": "http://ex.com/a",
        "HTTP://WWW.www.WWW.ex.com/a": "http://ex.com/a",
        "https://www-cdn.ex.com/a": "https://www-cdn.ex.com/a",
        "ex.com/x?utm_a=1": "ex.com/x?utm_a=1",  # schemeless: as-is
        "not a url at all": "not a url at all",
    }
    df = spark.createDataFrame(
        [(u,) for u in cases], "url string"
    ).select("url", url_normalize("url").alias("norm"))
    got = {r["url"]: r["norm"] for r in df.collect()}
    assert got == cases


def test_html_text_multiline_and_uppercase_boilerplate(spark):
    """Code-review r11 regression: script/style blocks spanning
    newlines (virtually all real-world ones) and uppercase tags must
    be removed WITH their content."""
    html = (
        "<HTML><HEAD><TITLE>T</TITLE><SCRIPT>\nvar x = 1;\nif(a&&b){}\n"
        "</SCRIPT><style type='text/css'>\n.x{color:red}\n</style>"
        "</HEAD><BODY><NAV>\nHome\n</NAV><p>real\ncontent</p>"
        "<FOOTER>\nfoot\n</FOOTER></BODY></HTML>"
    )
    assert _one(spark, html_text, html) == "real content"


def test_curation_kept_docs_consistent_with_funnel(spark):
    """The survivor frame and the funnel summary are the same chain:
    total kept docs == sum(n_kept), survivors are unique by doc_id,
    and every survivor's extracted text is distinct (exact dedup
    held)."""
    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.operators.webprep import (
        crawl_curation_funnel,
        curation_kept_docs,
        docs_fixture_frontier_key,
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    key = docs_fixture_frontier_key()
    summary = crawl_curation_funnel(d, key).collect()
    kept = curation_kept_docs(d, key).collect()
    assert len(kept) == sum(r["n_kept"] for r in summary)
    ids = [r["doc_id"] for r in kept]
    assert len(ids) == len(set(ids))
    txts = [r["txt"] for r in kept]
    assert len(txts) == len(set(txts))
