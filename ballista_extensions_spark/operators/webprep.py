"""Web-crawl preparation operators: HTML boilerplate stripping and URL
normalization — the two transforms a crawl corpus passes through
BEFORE the dedup/quality operators this engine already ships (a
training-data pipeline ingests HTML pages addressed by messy URLs,
not clean text rows).

Everything here is built-in expression work (regexp_replace /
regexp_extract / higher-order array functions) — JVM-side,
whole-stage-codegen'd, zero Python in the hot path, and each step is
replayable in ANSI SQL so the paired oracles verify the transforms
bit-exactly. Regexes are kept inside the common Java-regex/RE2
subset (no lookarounds, no backrefs) so both engines compile them
identically.

Fixture adapters (``docs_as_html``, ``docs_as_urls``) derive
deterministic HTML scaffolds / messy URLs from the documents table —
the same discipline as the media fixtures (multimodal.docs_as_*):
the driver's corpus carries no real HTML, so the adapters make the
transform verifiable end-to-end while the operators themselves accept
ANY html/url column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def docs_as_html(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, html): wrap each document in a deterministic HTML page
    — head with title/script/style, nav, a content div holding the
    text, and a footer — so the strip operator has real boilerplate
    to remove and the oracle can rebuild the identical page."""
    i = F.col(id_col)
    return documents.select(
        i.alias("doc_id"),
        F.concat(
            F.lit("<html><head><title>Doc "),
            i.cast("string"),
            F.lit("</title><script>var x=1;</script>"
                  "<style>.c{color:red}</style></head>"
                  "<body><nav>Home | About | Contact</nav>"
                  '<div class="content"><p>'),
            F.col(text_col),
            F.lit("</p></div><footer>(c) 2026 Example</footer>"
                  "</body></html>"),
        ).alias("html"),
    )


def html_text(html: Column | str) -> Column:
    """Extracted main text of an HTML page: script/style/nav/footer/
    title elements removed WITH their content (boilerplate), remaining
    tags stripped, the four common entities decoded, whitespace
    collapsed. Pure regexp_replace chain — codegen'd, and the exact
    chain the oracles replay. The element patterns run under (?is):
    real-world script/style blocks span newlines and tags come in any
    case, and both flags exist identically in Java regex and RE2."""
    c = F.col(html) if isinstance(html, str) else html
    for el in ("script", "style", "nav", "footer", "title"):
        c = F.regexp_replace(c, f"(?is)<{el}[^>]*>.*?</{el}>", " ")
    c = F.regexp_replace(c, "<[^>]+>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&nbsp;", " "),
                    ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, "\\s+", " "))


def html_extract_stats(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_raw, n_text, retained_ratio, text_md5) per page —
    the boilerplate-removal stage of a crawl pipeline with the
    content-integrity proof (md5 of the extracted text) a downstream
    dedup can key on. Narrow projection, no shuffle."""
    text = html_text(html_col)
    return pages.select(
        F.col(id_col).alias("doc_id"),
        F.length(html_col).cast("long").alias("n_raw"),
        F.length(text).cast("long").alias("n_text"),
        (F.length(text).cast("double")
         / F.length(html_col).cast("double")).alias("retained_ratio"),
        F.md5(text.cast("binary")).alias("text_md5"),
    )


def docs_as_urls(
    documents: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, url): deterministic MESSY urls — mixed-case scheme and
    host, optional www prefix, optional trailing slash, tracking
    params interleaved with real ones, optional fragment. doc_ids
    sharing (doc_id % 50, doc_id % 100) collapse to one page after
    normalization, so the dedup stage has real work."""
    i = F.col(id_col)
    return documents.select(
        i.alias("doc_id"),
        F.concat(
            F.when(i % 2 == 0, F.lit("HTTP://WWW.")).otherwise(
                F.lit("https://")
            ),
            F.lit("Site"),
            (i % 50).cast("string"),
            F.lit(".Example.COM/articles/"),
            (i % 100).cast("string"),
            F.when(i % 3 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(
                i % 4 == 0,
                F.concat(F.lit("?utm_source=feed&page="),
                         (i % 5).cast("string"),
                         F.lit("&utm_campaign=x")),
            )
            .when(i % 4 == 1,
                  F.concat(F.lit("?page="), (i % 5).cast("string")))
            .otherwise(F.lit("")),
            F.when(i % 7 == 0, F.lit("#section-2")).otherwise(F.lit("")),
        ).alias("url"),
    )


def url_normalize(url: Column | str) -> Column:
    """Canonical form of a crawl URL: lowercase scheme and host, strip
    leading www. prefixes, drop the fragment, drop utm_* tracking
    params (preserving the order of the rest), strip trailing slashes
    from the path. Idempotent (a canonicalizer must be a fixpoint —
    property-tested); schemeless inputs pass through unchanged
    (canonicalization is only defined for absolute URLs). Built-in
    string/array expressions only."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(c, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, "^([^/?#]+)", 1))
    # (www\.)+ not www\.: normalize must be a FIXPOINT, and
    # www.www.host would otherwise renormalize differently
    host = F.regexp_replace(host, "^(www\\.)+", "")
    tail = F.regexp_replace(rest, "^[^/?#]+", "")
    path = F.regexp_extract(tail, "^([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    qs = F.regexp_extract(tail, "\\?([^#]*)", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    normalized = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )
    # schemeless input (relative reference, garbage) passes through
    # unchanged instead of becoming '://...' — canonicalization is only
    # defined for absolute URLs, and passthrough keeps the fixpoint
    # property trivially
    return F.when(scheme == "", c).otherwise(normalized)


def url_dedup(
    urls: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(norm_url, canonical_id, n_dups): normalize then keep the
    min-id representative per canonical URL — the crawl-frontier dedup
    that runs BEFORE any content is fetched twice. One hash
    aggregation on the normalized key (map-side partial combine);
    at corpus scale the key is high-cardinality and unskewed by
    construction (hosts × paths)."""
    return (
        urls.select(
            F.col(id_col).alias("id"),
            url_normalize(url_col).alias("norm_url"),
        )
        .groupBy("norm_url")
        .agg(
            F.min("id").alias("canonical_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def docs_fixture_frontier_key(id_col: str = "doc_id") -> Column:
    """Fixture adapter (the ``docs_as_html`` discipline): the canonical
    lowercase host+path key :func:`docs_as_urls`' messy URLs normalize
    to — ``url_normalize(docs_as_urls(...))`` strips scheme noise,
    www., tracking params, slashes and fragments down to exactly this
    host+path, so deriving it arithmetically keeps the composed-funnel
    oracle replayable without re-running the normalizer chain. Collapses
    doc_ids congruent (mod 50, mod 100). Real crawls pass
    ``url_normalize(url_col)`` to :func:`crawl_curation_funnel`
    instead (ADVICE r12 — the funnel takes the key as an input)."""
    i = F.col(id_col)
    return F.lower(
        F.concat(
            F.lit("Site"),
            (i % 50).cast("string"),
            F.lit(".example.com/articles/"),
            (i % 100).cast("string"),
        )
    )


def crawl_curation_funnel(
    d: DataFrame,
    frontier_key: Column,
    classifier_gate: Column | None = None,
) -> DataFrame:
    """The composed crawl-curation chain over a documents frame
    (doc_id, text, source) — the ONE body behind the
    ``crawl_curation_pipeline`` query AND tools/scale_smoke.py's
    amplified-corpus measurement (a hand-copied smoke body had already
    diverged once; code-review r12). ``frontier_key`` is the canonical
    URL key column the frontier dedups on — a real crawl passes
    ``url_normalize(url_col)``; the fixture callers pass
    :func:`docs_fixture_frontier_key` (ADVICE r12: the key is an
    input, not synthesis baked into the operator). Stages: (1) URL
    frontier dedup keeping the min-id fetch per canonical key, (2)
    HTML boilerplate extraction (:func:`html_text`), (3) quality gate
    (retained-content ratio ≥ 0.5, extracted length ≥ 100) — plus,
    when ``classifier_gate`` is given, the trained classifier stage
    (VERDICT r12 #3): a boolean Column evaluated against the
    extracted-text column ``txt`` (the DCLM-style model gate, e.g.
    ``F.expr(qualityclassifier.quality_logit_sql("txt")) >= 0``), (4)
    exact content dedup by extracted-text md5 keeping the min-id
    representative; output is the per-source funnel (n_gated, n_kept).
    Scale: two map-combined hash aggregations + one broadcast-able
    kept-set join; extraction and the classifier are codegen'd
    projection work between them."""
    gated = curation_gated(d, frontier_key, classifier_gate)
    kept = gated.groupBy("h").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id", F.lit(True).alias("is_kept")
    )
    return (
        gated.join(kept, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gated"),
            F.sum(
                F.when(F.col("is_kept"), 1).otherwise(0)
            ).cast("long").alias("n_kept"),
        )
    )


def curation_gated(
    d: DataFrame,
    frontier_key: Column,
    classifier_gate: Column | None = None,
) -> DataFrame:
    """Stages 1–3 of the curation chain (frontier dedup, extraction,
    rule gate, optional classifier gate) as the shared body — returns
    the gated documents ``(doc_id, source, txt, h)`` before content
    dedup. Both :func:`crawl_curation_funnel` (the per-source summary)
    and :func:`curation_kept_docs` (the survivor frame downstream
    stages consume) build on this one chain."""
    frontier = (
        d.select(
            "doc_id",
            frontier_key.alias("key"),
        )
        .groupBy("key")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    pages = docs_as_html(d.join(frontier, "doc_id")).join(
        d.select("doc_id", "source"), "doc_id"
    )
    ex = pages.select(
        "doc_id",
        "source",
        html_text("html").alias("txt"),
        (
            F.length(html_text("html")).cast("double")
            / F.length("html").cast("double")
        ).alias("ratio"),
    )
    gate = (F.col("ratio") >= 0.5) & (F.length("txt") >= 100)
    if classifier_gate is not None:
        gate = gate & classifier_gate
    return ex.filter(gate).select(
        "doc_id", "source", "txt", F.md5(F.col("txt")).alias("h")
    )


def curation_kept_docs(
    d: DataFrame,
    frontier_key: Column,
    classifier_gate: Column | None = None,
) -> DataFrame:
    """The curation chain's SURVIVORS ``(doc_id, source, txt)`` —
    gated documents minus exact-content duplicates (min-id
    representative per extracted-text md5). This is the frame a
    selection stage (DSIR, token-budget) consumes after curation.
    Scale: same two hash aggregations as the funnel summary; the
    kept-set join key is the 16-byte md5 group's min id."""
    gated = curation_gated(d, frontier_key, classifier_gate)
    kept = gated.groupBy("h").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id"
    )
    return gated.join(kept, "doc_id").select("doc_id", "source", "txt")
