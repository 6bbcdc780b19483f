"""Keyword retrieval — BM25 top-k over an inverted posting list, and
reciprocal-rank fusion with embedding ANN results (VERDICT r15
directives #3/#4): the lexical complement to the similarity family's
embedding ANN (operators/similarity.py) for curation and
decontamination work.

Reference parity note: the reference engine (the DataFusion/Ballista
extension showcase, src/physical/sample_exec.rs) stops at sampling;
retrieval over the corpus is the north-star LLM-pipeline surface this
repo adds (SURVEY.md §2 addendum), following the standard BM25
formulation (Robertson & Spärck Jones; "Okapi at TREC-3", k1/b form).

Design for 100 TB:

- The corpus-wide explode happens ONCE and is filtered to the query
  term set IN THE SAME STAGE (narrow), so the only wide exchange
  carries (doc_id, term) rows for MATCHING terms — postings, not the
  corpus. groupBy(doc_id, term) combines map-side.
- Document length (dl) rides the explode as a carried column — no
  second corpus scan or doc-length join.
- The document-frequency table is |terms| rows — broadcast back onto
  the postings.
- Corpus scalars (N, Σdl) are one aggregate job collected as two
  integers (O(1) driver state), embedded as literals.
- Top-k is orderBy().limit(k) — TakeOrdered, distributed — and rank
  assignment happens on the k-row result, never a global window.

Cross-engine exactness: the score template below uses ONLY +,-,*,/
on doubles (each correctly rounded per IEEE-754, so bit-identical in
Spark and DuckDB when the expression tree matches) — no log/exp/pow
libm calls whose last-ulp behavior differs per engine. The rational
idf ``(N - df + 0.5) / (df + 0.5)`` is the canonical BM25 idf with
the ln() dropped: monotone in the same direction, exactly
replayable. Constants are spelled in ``e0`` notation so BOTH engines
parse them as DOUBLE (a bare ``1.2`` is DECIMAL(2,1) in each).
Per-document totals sum the per-term scores in one fixed syntactic
order (a pivot to per-term columns, then a left-to-right ``+``
chain), never an order-nondeterministic SUM over doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ballista_extensions_spark.io import ensure_parallelism
from ballista_extensions_spark.operators.text import TOKENS_SQL

__all__ = [
    "BM25_K1_SQL",
    "BM25_B_SQL",
    "bm25_score_sql",
    "bm25_total_sql",
    "bm25_pivot_topk",
    "bm25_topk",
    "rrf_score_sql",
    "rrf_fuse",
]

#: BM25 free parameters in DOUBLE-parsing SQL spelling (shared by the
#: Spark expression and the DuckDB oracle so the trees match).
BM25_K1_SQL = "1.2e0"
BM25_B_SQL = "0.75e0"


def bm25_score_sql(n_sql: str, avgdl_sql: str) -> str:
    """Per-(doc, term) BM25 score over columns ``tf`` (term frequency,
    integer), ``df`` (document frequency, integer), ``dl`` (document
    token length, integer). ``n_sql`` / ``avgdl_sql`` are SQL snippets
    for the corpus size and mean document length AS DOUBLES — the
    Spark side passes integer-literal casts, the oracle passes
    stats-CTE column casts; both evaluate to identical doubles.
    Rational idf × the k1/b-saturated tf term, fully parenthesized so
    both engines build the same expression tree."""
    k1, b = BM25_K1_SQL, BM25_B_SQL
    return (
        f"((({n_sql} - CAST(df AS DOUBLE)) + 0.5e0)"
        f" / (CAST(df AS DOUBLE) + 0.5e0))"
        f" * ((CAST(tf AS DOUBLE) * ({k1} + 1.0e0))"
        f" / (CAST(tf AS DOUBLE) + ({k1} * ((1.0e0 - {b})"
        f" + ({b} * (CAST(dl AS DOUBLE) / {avgdl_sql}))))))"
    )


def bm25_total_sql(terms: tuple[str, ...]) -> str:
    """Fixed-order total over pivoted per-term score columns
    ``s_<term>`` — a left-to-right ``+`` chain (never SUM over
    doubles, whose accumulation order is engine/partition-dependent).
    Missing terms contribute exactly 0."""
    parts = [f"COALESCE(s_{t}, CAST(0 AS DOUBLE))" for t in terms]
    return "(" + " + ".join(parts) + ")"


def _check_terms(terms: tuple[str, ...]) -> tuple[str, ...]:
    terms = tuple(terms)
    if not terms:
        raise ValueError("bm25: empty query term set")
    # Spark resolves identifiers case-insensitively by default, so
    # s_Filter and s_filter would collide at resolution time — reject
    # case-folded duplicates with a clean error instead
    if len({t.lower() for t in terms}) != len(terms):
        raise ValueError(f"bm25: duplicate query terms in {terms!r}")
    for t in terms:
        if not (t.isascii() and t.isalnum()):
            raise ValueError(
                f"bm25: term {t!r} is not ASCII-alphanumeric — it "
                "cannot name an unquoted pivot column in both engines"
            )
    return terms


def bm25_pivot_topk(
    scored: DataFrame, terms: tuple[str, ...], k: int
) -> DataFrame:
    """Shared scoring epilogue over ``(doc_id, term, score)`` rows:
    pivot to fixed per-term columns, take the fixed-order total, then
    distributed TakeOrdered top-``k`` with rank assigned over the
    k-row result only (never a global single-partition window over
    the corpus). Used by both the inline :func:`bm25_topk` and the
    posting-store probe (operators/postingstore.py) so the two paths
    stay expression-identical."""
    pivoted = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        *[
            F.max(F.when(F.col("term") == t, F.col("score"))).alias(
                f"s_{t}"
            )
            for t in terms
        ],
    )
    topk = (
        pivoted.select(
            "doc_id",
            "n_terms",
            F.expr(bm25_total_sql(terms)).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return topk.select(
        "*", F.row_number().over(w).cast("long").alias("rank")
    )


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact BM25 top-``k`` documents for a query term set.

    Output: ``(doc_id, n_terms, bm25, rank)`` with rank 1..k, ties
    broken by doc_id. Determinism: pure function of (corpus, terms,
    k) — double arithmetic is the fixed-order template above.
    """
    terms = _check_terms(terms)
    if k <= 0:
        raise ValueError(f"bm25: k must be positive, got {k}")
    d = (
        ensure_parallelism(docs)
        .filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.expr(TOKENS_SQL.format(col=text_col)).alias("toks"),
        )
        .withColumn("dl", F.size("toks").cast("long"))
    )
    # one aggregate job -> two integers of driver state
    row = d.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")
    ).collect()[0]
    n_docs, sum_dl = int(row["n"]), int(row["sdl"] or 0)
    if n_docs == 0:
        raise ValueError("bm25: empty corpus")
    n_sql = f"CAST({n_docs} AS DOUBLE)"
    avgdl_sql = f"(CAST({sum_dl} AS DOUBLE) / CAST({n_docs} AS DOUBLE))"

    # postings: explode, filter to the query terms IN-STAGE (the
    # exchange carries only matching (doc_id, term) rows), dl carried
    tf = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # |terms|-row df table, broadcast back onto the postings
    df_tbl = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    scored = tf.join(F.broadcast(df_tbl), "term").withColumn(
        "score", F.expr(bm25_score_sql(n_sql, avgdl_sql))
    )
    return bm25_pivot_topk(scored, terms, k)


def rrf_score_sql(rank_cols: tuple[str, ...], k_rrf: int = 60) -> str:
    """Reciprocal-rank-fusion score over nullable integer rank
    columns: ``Σ 1/(k_rrf + rank)`` in the fixed written order, a
    missing rank contributing exactly 0 (Cormack/Clarke/Buettcher,
    SIGIR 2009 — the standard K=60 form). Pure +,/ on doubles —
    bit-identical cross-engine."""
    parts = [
        f"COALESCE(CAST(1 AS DOUBLE)"
        f" / (CAST({k_rrf} AS DOUBLE) + CAST({c} AS DOUBLE)),"
        f" CAST(0 AS DOUBLE))"
        for c in rank_cols
    ]
    return "(" + " + ".join(parts) + ")"


def rrf_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    k: int = 10,
    *,
    k_rrf: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hybrid retrieval: fuse a lexical ranking ``(doc_id, rank)``
    and a semantic ranking ``(doc_id, rank)`` by reciprocal-rank
    fusion, returning the top-``k`` of the union.

    Output: ``(doc_id, lex_rank, sem_rank, rrf, rank)`` — source
    ranks nullable where a system did not retrieve the document.
    Both inputs are top-k frames (k rows each), so the fusion is
    arithmetic over ≤ 2k rows regardless of corpus size."""
    if k <= 0:
        raise ValueError(f"rrf: k must be positive, got {k}")
    lex = lexical.select(
        F.col(id_col).alias("doc_id"), F.col("rank").alias("lex_rank")
    )
    sem = semantic.select(
        F.col(id_col).alias("doc_id"), F.col("rank").alias("sem_rank")
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .withColumn(
            "rrf", F.expr(rrf_score_sql(("lex_rank", "sem_rank"), k_rrf))
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return fused.select(
        "*", F.row_number().over(w).cast("long").alias("rank")
    )
