"""Round-10 operator-surface queries (VERDICT r9 directives #2-#4):
the persisted ANN index store (the sigstore pattern for embeddings),
perceptual-hash image near-dup composing the real image codec with the
Hamming ANN machinery, and the stdlib baseline-JPEG decode path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.io import load_table
from ballista_extensions_spark.queries.registry import register

#: Quantizer geometry shared by the Spark query and its oracle — the
#: frozen lattice (operators/annstore.py:lattice_centroids) replayed
#: in SQL via generate_series over the identical integer arithmetic.
_ANN_LISTS, _ANN_DIM, _ANN_PROBE, _ANN_K = 8, 64, 2, 5


@register(
    "ann_index_incremental",
    oracle=f"""
    WITH cents AS (
      SELECT j AS cell,
             list_transform(generate_series(0, {_ANN_DIM - 1}), d ->
               CAST(((j * 1009 + d * 9176 + j * d * 31) % 2001) - 1000
                    AS DOUBLE) / 1000.0) AS c
      FROM generate_series(0, {_ANN_LISTS - 1}) t(j)),
    e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    dist AS (
      SELECT e.vec_id, cents.cell,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_zip(e.v, cents.c),
                              s -> (s[1] - s[2]) * (s[1] - s[2]))),
               (acc, x) -> acc + x) AS dd
      FROM e CROSS JOIN cents),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, cell) AS rn
        FROM dist) WHERE rn = 1),
    n AS (SELECT vec_id, v,
                 sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(v, x -> x * x)), (acc, x) -> acc + x))
                   AS nrm
          FROM e),
    pq AS (
      SELECT vec_id AS q_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dd, cell) AS pr
        FROM dist WHERE vec_id % 100 = 0) WHERE pr <= {_ANN_PROBE}),
    scored AS (
      SELECT pq.q_id, a.vec_id AS c_id,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_zip(qn.v, cn.v), s -> s[1] * s[2])),
               (acc, x) -> acc + x) / (qn.nrm * cn.nrm) AS cosine
      FROM pq
      JOIN assign a ON a.cell = pq.cell AND a.vec_id <> pq.q_id
      JOIN n qn ON qn.vec_id = pq.q_id
      JOIN n cn ON cn.vec_id = a.vec_id),
    ranked AS (
      SELECT q_id, c_id, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cosine DESC, c_id) AS BIGINT) AS rn
      FROM scored)
    SELECT q_id, c_id, cosine, rn FROM ranked WHERE rn <= {_ANN_K}
    """,
)
def ann_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted ANN index store, end-to-end (operators/annstore.py):
    3/4 of the embeddings corpus plays the ACCEPTED store (vec_id % 4
    != 0), 1/4 the new ingest batch; the index is built once under the
    FROZEN lattice quantizer, the batch is assigned incrementally
    (append-only — no store read or rewrite), and probe vectors
    (vec_id % 100 == 0) search the merged inverted file with n_probe=2
    of 8 cells, exact-cosine-ranked top-5 per probe.

    The oracle replays the whole chain bit-for-bit — the lattice is
    pure integer arithmetic both engines compute identically, argmin
    assignment ties break to the lowest cell, distance/cosine folds
    run left-to-right — so a hash match proves assignment, incremental
    ingest and probe mechanics exactly. Scale: assignment is one
    narrow codegen'd pass; ingest cost ∝ increment BY CONSTRUCTION
    (cell-partitioned append, tools/annstore_scale.py measures it flat
    in store size); probing pushes cell IN (...) into the store scan
    as a PARTITION filter, reading only the probed lists' files
    (plan-asserted, tests/test_annstore.py). The driver harness cannot
    carry cross-run tables, so this query rebuilds in-memory per run;
    the persisted path's flat ingest is measured separately
    (BASELINE.md)."""
    from ballista_extensions_spark.operators import annstore as A

    e = load_table(spark, sf_dir, "embeddings")
    stored = e.filter(F.col("vec_id") % 4 != 0)
    batch = e.filter(F.col("vec_id") % 4 == 0)
    cents = A.lattice_centroids(_ANN_LISTS, _ANN_DIM)
    idx = A.build_ann_index(stored, cents)
    idx = A.ingest_into_index(idx, batch)
    probes = batch.filter(F.col("vec_id") % 100 == 0)
    return A.probe_index(idx, probes, k=_ANN_K, n_probe=_ANN_PROBE)
