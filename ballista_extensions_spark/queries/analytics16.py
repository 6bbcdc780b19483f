"""Round-16 queries: BM25 keyword retrieval and hybrid (lexical +
semantic) reciprocal-rank fusion (VERDICT r15 directives #3 and #4) —
the retrieval modality that completes the similarity family
(operators/similarity.py covers embedding ANN; operators/retrieval.py
adds the inverted-index lexical path and the fusion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.io import ensure_parallelism, load_table
from ballista_extensions_spark.operators.retrieval import (
    bm25_score_sql,
    bm25_topk,
    bm25_total_sql,
    rrf_fuse,
    rrf_score_sql,
)
from ballista_extensions_spark.queries.registry import register

#: fixed query-term set for the graded lexical query — all present in
#: the synthetic vocabulary with df ≈ 0.8N, so the k1/b length
#: normalization (not rare-term idf) drives the ranking, which is the
#: regime that stresses the dl/avgdl arithmetic
_BM25_TERMS: tuple[str, ...] = ("vector", "spark", "merge", "filter")
_BM25_K = 20
#: semantic query vector for the hybrid query (vec_id aligns with
#: doc_id in the synthetic tables — TESTDATA.md)
_RRF_QVEC = 0
_RRF_K = 10

_DD_TOKS16 = r"string_split_regex(text, '\s+')"


def _bm25_ctes(terms: tuple[str, ...], k: int) -> str:
    """DuckDB CTE chain replaying :func:`bm25_topk` bit-for-bit —
    ends with a ``lexranked`` CTE of (doc_id, n_terms, bm25, rank)."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    n_sql = "CAST(s.n AS DOUBLE)"
    avgdl_sql = "(CAST(s.sdl AS DOUBLE) / CAST(s.n AS DOUBLE))"
    piv_cols = ",\n             ".join(
        f"MAX(CASE WHEN term = '{t}' THEN score END) AS s_{t}"
        for t in terms
    )
    return f"""dlens AS (
      SELECT doc_id, {_DD_TOKS16} AS toks,
             CAST(len({_DD_TOKS16}) AS BIGINT) AS dl
      FROM documents WHERE text IS NOT NULL),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(dl) AS BIGINT) AS sdl
      FROM dlens),
    post AS (
      SELECT doc_id, dl, unnest(toks) AS term FROM dlens),
    tf AS (
      SELECT doc_id, term, dl, CAST(COUNT(*) AS BIGINT) AS tf
      FROM post WHERE term IN ({in_list})
      GROUP BY doc_id, term, dl),
    dft AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             {bm25_score_sql(n_sql, avgdl_sql)} AS score
      FROM tf JOIN dft USING (term) CROSS JOIN stats s),
    piv AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
             {piv_cols}
      FROM scored GROUP BY doc_id),
    lextopk AS (
      SELECT doc_id, n_terms, {bm25_total_sql(terms)} AS bm25
      FROM piv ORDER BY bm25 DESC, doc_id LIMIT {k}),
    lexranked AS (
      SELECT doc_id, n_terms, bm25,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id)
                  AS BIGINT) AS rank
      FROM lextopk)"""


@register(
    "bm25_topk",
    oracle=f"""
    WITH {_bm25_ctes(_BM25_TERMS, _BM25_K)}
    SELECT doc_id, n_terms, bm25, rank FROM lexranked
    """,
)
def bm25_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed query term set (VERDICT r15
    directive #3) — lexical retrieval over an inverted posting list:
    one corpus explode filtered to the query terms in-stage (the
    exchange carries postings, not the corpus), dl carried through
    the explode, |terms|-row df table broadcast back, rational-idf
    k1/b scoring in fixed-order double arithmetic, distributed
    TakeOrdered top-k. The oracle replays every stage bit-for-bit."""
    return bm25_topk(
        load_table(spark, sf_dir, "documents"), _BM25_TERMS, k=_BM25_K
    )


def _ann_ctes(qvec: int, k: int) -> str:
    """DuckDB CTE chain for exact cosine top-k of one query vector —
    the ann_cosine_topk oracle shape (queries/llm.py) restricted to
    ``vec_id = qvec`` — ending with ``semranked`` (doc_id, rank)."""
    return f"""ev AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    nv AS (
      SELECT vec_id, v,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(v, x -> x * x)), (acc, x) -> acc + x))
               AS nrm
      FROM ev),
    cosq AS (
      SELECT c.vec_id AS doc_id,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_zip(q.v, c.v), s -> s[1] * s[2])),
               (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
      FROM nv q JOIN nv c
        ON q.vec_id = {qvec} AND c.vec_id <> {qvec}),
    semranked AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id)
                  AS BIGINT) AS rank
      FROM cosq
      ORDER BY cosine DESC, doc_id LIMIT {k})"""


@register(
    "hybrid_retrieval_rrf",
    oracle=f"""
    WITH {_bm25_ctes(_BM25_TERMS, _BM25_K)},
    {_ann_ctes(_RRF_QVEC, _BM25_K)},
    fused AS (
      SELECT doc_id, l.rank AS lex_rank, sm.rank AS sem_rank
      FROM lexranked l FULL OUTER JOIN semranked sm USING (doc_id)),
    fscored AS (
      SELECT doc_id, lex_rank, sem_rank,
             {rrf_score_sql(("lex_rank", "sem_rank"))} AS rrf
      FROM fused ORDER BY rrf DESC, doc_id LIMIT {_RRF_K})
    SELECT doc_id, lex_rank, sem_rank, rrf,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id)
                AS BIGINT) AS rank
    FROM fscored
    """,
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (VERDICT r15 directive #4): reciprocal-rank
    fusion (K=60) of the BM25 lexical top-20 and the exact-cosine
    semantic top-20 for query vector 0 (vec_id ≙ doc_id in the
    synthetic tables) — the standard retrieval composition for
    curation/decontamination. Both inputs are k-row frames, so the
    fusion is arithmetic over ≤ 2k rows regardless of corpus size;
    the oracle replays lexical chain, cosine chain, and fusion."""
    from ballista_extensions_spark.operators import similarity as S

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(d, _BM25_TERMS, k=_BM25_K)
    sem = S.brute_force_topk(
        e, e.filter(F.col("vec_id") == _RRF_QVEC), k=_BM25_K
    ).select(F.col("c_id").alias("doc_id"), F.col("rn").alias("rank"))
    return rrf_fuse(lex, sem, k=_RRF_K)


#: same packing parameters as sequence_packing_manifest — the mask is
#: the manifest's companion tensor and must describe the same cuts
_PACK_LEN = 1024
_PACK_SEED = 20260816


def _segment_ids_oracle() -> str:
    from ballista_extensions_spark.operators.bpe_stream import (
        FROZEN_STREAM_MERGES,
        chain_cte_duckdb,
    )
    from ballista_extensions_spark.operators.packing import (
        packing_ctes_duckdb,
        segment_ids_select_duckdb,
    )
    from ballista_extensions_spark.operators.shards import (
        manifest_ctes_duckdb,
    )

    chain = chain_cte_duckdb(
        FROZEN_STREAM_MERGES,
        from_sql="(SELECT doc_id, text FROM documents "
        "WHERE text IS NOT NULL)",
    )
    return f"""
    WITH {chain},
    bpedocs AS (
      SELECT d.doc_id, d.text,
             CAST((length(c.s) - length(replace(c.s, ' ', ''))) / 2
                  AS BIGINT) AS bpe_tokens
      FROM documents d JOIN __bpe_chain c ON c.doc_id = d.doc_id
      WHERE d.text IS NOT NULL),
    {manifest_ctes_duckdb(1 << 40, _PACK_SEED, "bpedocs",
                          cost_sql="bpe_tokens + 1")},
    {packing_ctes_duckdb(_PACK_LEN)},
    masks AS ({segment_ids_select_duckdb(_PACK_LEN)})
    SELECT seq_id, n_tokens, n_segments,
           COALESCE(array_to_string(boundaries, ','), '') AS boundaries,
           array_to_string(segment_ids, ',') AS segment_ids
    FROM masks
    ORDER BY seq_id
    """


@register("packed_segment_ids", oracle=_segment_ids_oracle())
def packed_segment_ids_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-sequence attention-reset masks for the packed training
    sequences (VERDICT r15 directive #6,
    operators/packing.py:packed_segment_ids): for every fixed-length
    sequence of the seeded BPE stream, the sorted in-sequence offsets
    where documents start (``boundaries``) and the per-position
    segment-id array the trainer consumes (id 0 = continuation of the
    previous sequence's document; each boundary increments). Same
    (merges, context_len, seed) as sequence_packing_manifest — the
    mask describes exactly the manifest's cuts (pinned by pytest).
    The oracle replays the span arithmetic AND both HOF lambdas
    element-for-element, grading every position of every mask.

    Output shape (r17): the two array columns are serialized to CSV
    strings in the final projection of BOTH engines — the driver's
    canonicalizer factorizes pandas cells and cannot hash ndarray
    cells (CORRECTNESS_r16 recorded TypeError for the array-typed
    registration), so ARRAY output columns are ungradable. Every
    position still rides the string, so grading coverage is
    unchanged; the operator keeps native arrays for the trainer
    (tests/test_packing.py)."""
    from ballista_extensions_spark.operators.bpe_stream import (
        FROZEN_STREAM_MERGES,
        bpe_stream_token_counts,
    )
    from ballista_extensions_spark.operators.packing import (
        packed_segment_ids,
    )

    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).filter(F.col("text").isNotNull())
    counts = bpe_stream_token_counts(d, FROZEN_STREAM_MERGES).select(
        "doc_id", (F.col("n_tokens") + 1).alias("bpe_cost")
    )
    with_cost = d.select("doc_id", "text").join(counts, "doc_id")
    masks = packed_segment_ids(
        with_cost, _PACK_LEN, _PACK_SEED, cost_col="bpe_cost"
    )
    return masks.select(
        "seq_id",
        "n_tokens",
        "n_segments",
        F.concat_ws(",", F.col("boundaries").cast("array<string>"))
        .alias("boundaries"),
        F.concat_ws(",", F.col("segment_ids").cast("array<string>"))
        .alias("segment_ids"),
    )


def _store_curriculum_oracle() -> str:
    # the SCHEDULE is the contract: scoring once and joining must
    # yield exactly the inline-fold schedule, so the oracle is the
    # curriculum oracle verbatim (score equality pinned by pytest)
    from ballista_extensions_spark.queries.analytics15 import (
        _curriculum_oracle,
    )

    return _curriculum_oracle()


@register("curriculum_schedule_from_store", oracle=_store_curriculum_oracle())
def curriculum_schedule_from_store(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Curriculum shard schedule from the persisted classifier-score
    store (VERDICT r15 directive #5): the frozen classifier scores
    each document ONCE (operators/scorestore.py:quality_score_frame —
    the gate-time pass a real pipeline already ran), and curriculum
    ordering JOINS ``(doc_id, qscore)`` instead of re-paying the
    hashed-BoW fold over the corpus (BASELINE.md r15 measured that
    re-fold at exponent 0.86 — the highest in the table). The output
    is bit-identical to curriculum_shard_schedule (same oracle; the
    store path's equality with the recompute path is additionally
    pinned by tests/test_scorestore.py, and the bucketed-table
    exchange-free join + append-only increment ingest are
    plan-asserted there)."""
    from ballista_extensions_spark.operators.scorestore import (
        curriculum_from_scores,
        quality_score_frame,
    )
    from ballista_extensions_spark.queries.analytics15 import (
        _CURR_CAP,
        _CURR_SEED,
    )

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    scores = quality_score_frame(d)
    return curriculum_from_scores(d, scores, _CURR_CAP, _CURR_SEED)
