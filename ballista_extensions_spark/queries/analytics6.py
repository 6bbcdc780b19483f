"""Round-9 operator-surface queries (VERDICT r8 directive #8): the
cross-run MinHash signature store and the embedding-drift report —
the two gaps a 100 TB pipeline user hits next (dedup state that
persists between crawl increments; monitoring whether a new embedding
batch drifted from the accepted corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.queries.registry import register

_TOKS = r"string_split_regex(text, '\s+')"


def _shingles_sql(toks: str, n: int = 3) -> str:
    joined = " || ' ' || ".join(f"{toks}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> {joined})) ELSE [] END"
    )


@register(
    "signature_store_incremental",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_shingles_sql(_TOKS)} AS s FROM documents),
    post AS (SELECT doc_id, unnest(s) AS tok FROM sh),
    a_post AS (SELECT * FROM post WHERE doc_id % 3 <> 0),
    b_post AS (SELECT * FROM post WHERE doc_id % 3 = 0),
    stop AS (SELECT tok FROM a_post GROUP BY tok HAVING COUNT(*) > 100),
    a_cap AS (SELECT doc_id, tok FROM a_post a
              WHERE NOT EXISTS (SELECT 1 FROM stop WHERE stop.tok = a.tok)),
    b_cap AS (SELECT doc_id, tok FROM b_post b
              WHERE NOT EXISTS (SELECT 1 FROM stop WHERE stop.tok = b.tok)),
    sa AS (SELECT doc_id, COUNT(*) AS sz FROM a_cap GROUP BY doc_id),
    sb AS (SELECT doc_id, COUNT(*) AS sz FROM b_cap GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(COUNT(*) AS DOUBLE) AS i
      FROM a_cap a JOIN b_cap b ON a.tok = b.tok
      GROUP BY a.doc_id, b.doc_id)
    SELECT da AS doc_stored, db AS doc_new,
           i / (sa.sz + sb.sz - i) AS jaccard
    FROM inter
    JOIN sa ON sa.doc_id = da
    JOIN sb ON sb.doc_id = db
    WHERE i / (sa.sz + sb.sz - i) >= 0.35
    """,
)
def signature_store_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-run dedup via the MinHash signature store
    (operators/sigstore.py): 2/3 of the corpus plays the ACCEPTED
    store (doc_id % 3 != 0), 1/3 the new crawl increment; the store's
    band buckets + capped sets + frozen stop list are built once, the
    increment is signed under the frozen cap and banded-joined against
    the store, and every candidate is verified with exact df-capped
    Jaccard (threshold 0.35) — output (doc_stored, doc_new, jaccard).

    The oracle computes the same pairs exactly (stop list from the
    STORED corpus only — the store's documented frozen-cap contract),
    so a hash match proves candidate recall 1.0 on this corpus AND
    bit-exact verification. Scale: candidate cost ∝ increment ×
    bucket collisions; with the store persisted bucketed by bkey
    (tests/test_sigstore.py proves the plan), the store side of the
    candidate join is exchange-free however large the accepted corpus
    grows — cost per crawl increment never rescans the corpus."""
    from ballista_extensions_spark.operators.sigstore import (
        batch_signatures,
        build_signature_store,
        ingest_against_store,
    )

    d = load_table(spark, sf_dir, "documents")
    stored = d.filter(F.col("doc_id") % 3 != 0)
    batch = d.filter(F.col("doc_id") % 3 == 0)
    store = build_signature_store(stored, max_df=100)
    sig = batch_signatures(store, batch)
    return ingest_against_store(store, sig, threshold=0.35)


@register(
    "embedding_drift_report",
    oracle="""
    WITH expanded AS (
      SELECT vec_id % 5 AS batch, vec_id,
             unnest(generate_series(1, len(embedding))) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings),
    grouped AS (
      SELECT batch, dim, list(val ORDER BY vec_id) AS vals,
             COUNT(*) AS n
      FROM expanded GROUP BY batch, dim),
    cent AS (
      SELECT batch, dim,
             list_reduce(list_prepend(CAST(0 AS DOUBLE), vals),
                         (acc, v) -> acc + v) / n AS c,
             n
      FROM grouped),
    ref AS (SELECT dim AS rdim, c AS rc FROM cent WHERE batch = 0),
    diff AS (
      SELECT batch, dim, c - rc AS d, n
      FROM cent LEFT JOIN ref ON dim = rdim),
    per AS (
      SELECT batch, list(d * d ORDER BY dim) AS sq,
             MAX(abs(d)) AS max_dim_shift, MAX(n) AS n
      FROM diff GROUP BY batch)
    SELECT CAST(batch AS BIGINT) AS batch,
           CAST(n AS BIGINT) AS n_vectors,
           sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), sq),
                            (acc, v) -> acc + v)) AS drift_l2,
           max_dim_shift
    FROM per
    """,
)
def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-ingest-batch embedding drift vs the reference batch
    (operators/similarity.py:centroid_drift): batches are vec_id % 5,
    batch 0 is the accepted-corpus reference; for each batch the
    report gives the L2 distance between its centroid and the
    reference centroid plus the largest single-dimension shift — the
    monitoring signal that a new crawl/encoder run moved the embedding
    distribution. Float discipline is embedding_centroids': per-dim
    sums fold in ascending vec_id order and the cross-dim square sum
    folds in ascending dim order, so both engines add the same doubles
    in the same order — bit-exact parity, no SUM(double) anywhere.
    Scale: one narrow posexplode (rows × dims), per-(batch, dim)
    aggregates, then a dims×batches frame — the wide fold happens on
    batches × dims rows, never on the corpus."""
    from ballista_extensions_spark.operators.similarity import (
        centroid_drift,
    )

    e = load_table(spark, sf_dir, "embeddings")
    batched = e.withColumn("batch", F.col("vec_id") % 5)
    return centroid_drift(batched, "batch", ref_batch=0)


@register(
    "corpus_shift_by_source",
    oracle="""
    WITH b AS (
      SELECT source,
             CAST(least(9, octet_length(encode(text)) // 200) AS BIGINT)
               AS bin
      FROM documents),
    per_sb AS (
      SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c
      FROM b GROUP BY source, bin),
    per_s AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM per_sb
      GROUP BY source),
    per_b AS (
      SELECT bin, CAST(SUM(c) AS BIGINT) AS cb FROM per_sb GROUP BY bin),
    tot AS (SELECT CAST(SUM(cb) AS BIGINT) AS n FROM per_b),
    spine AS (
      SELECT s.source, s.cs, bb.bin, bb.cb, tot.n
      FROM per_s s CROSS JOIN per_b bb CROSS JOIN tot),
    terms AS (
      SELECT source, cs, bin,
             CAST(COALESCE(p.c, 0) AS DOUBLE) / cs AS pa,
             CAST(cb AS DOUBLE) / n AS pe
      FROM spine
      LEFT JOIN per_sb p USING (source, bin)),
    folded AS (
      SELECT source, CAST(MAX(cs) AS BIGINT) AS n_docs,
             list((pa - pe) * (pa - pe) / pe ORDER BY bin) AS ts
      FROM terms GROUP BY source)
    SELECT source, n_docs,
           list_reduce(list_prepend(CAST(0 AS DOUBLE), ts),
                       (acc, v) -> acc + v) AS chi2
    FROM folded
    """,
)
def corpus_shift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift monitor: per source, the chi-square
    divergence of its document-length histogram (10 fixed 200-byte
    bins, top bin open) from the whole-corpus reference — the
    drift/quality gate that flags a source whose crawl suddenly
    returns stubs or megapages before it skews training mixes.
    Chi-square instead of PSI/KL deliberately: no transcendentals, so
    every term is exact IEEE arithmetic on ratios of integer counts
    and the cross-engine hash matches bit-for-bit (terms fold in bin
    order; missing (source, bin) cells enter as pa = 0 via the dense
    source × bin spine, contributing pe — absent bins are signal, not
    noise). Scale: counts-only aggregation — one groupBy over the
    corpus into a (sources × 10)-row frame; the spine cross-join and
    ordered fold run on that tiny frame."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.least(
            F.lit(9), F.floor(F.length(F.col("text").cast("binary")) / 200)
        )
        .cast("long")
        .alias("bin"),
    )
    per_sb = b.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_s = per_sb.groupBy("source").agg(F.sum("c").alias("cs"))
    per_b = per_sb.groupBy("bin").agg(F.sum("c").alias("cb"))
    tot = per_b.agg(F.sum("cb").alias("n"))
    spine = per_s.crossJoin(F.broadcast(per_b)).crossJoin(
        F.broadcast(tot)
    )
    terms = spine.join(per_sb, ["source", "bin"], "left").select(
        "source",
        "cs",
        "bin",
        (
            F.coalesce(F.col("c"), F.lit(0)).cast("double")
            / F.col("cs")
        ).alias("pa"),
        (F.col("cb").cast("double") / F.col("n")).alias("pe"),
    )
    folded = terms.groupBy("source").agg(
        F.max("cs").cast("long").alias("n_docs"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    "bin",
                    (
                        (F.col("pa") - F.col("pe"))
                        * (F.col("pa") - F.col("pe"))
                        / F.col("pe")
                    ).alias("t"),
                )
            )
        ).alias("ts"),
    )
    return folded.select(
        "source",
        "n_docs",
        F.aggregate(
            F.transform(F.col("ts"), lambda x: x["t"]),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("chi2"),
    )
