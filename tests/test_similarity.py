"""Similarity-search tests: known-answer geometry, determinism, and LSH
recall vs the exact baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from ballista_extensions_spark.operators import similarity as S

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


@pytest.fixture(scope="module")
def toy_vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.7, 0.7, 0.0, 0.0]),   # diagonal
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_norms(toy_vectors):
    norms = {r.vec_id: r.l2_norm for r in S.with_norm(toy_vectors).collect()}
    assert norms[0] == pytest.approx(1.0)
    assert norms[4] == pytest.approx(0.7 * 2**0.5, rel=1e-6)


def test_brute_force_ordering(toy_vectors):
    res = S.brute_force_topk(
        toy_vectors, toy_vectors.filter(F.col("vec_id") == 0), k=4
    ).collect()
    order = [r.c_id for r in sorted(res, key=lambda r: r.rn)]
    assert order[0] == 1          # most similar
    assert order[-1] == 3         # opposite vector ranks last
    cos = {r.c_id: r.cosine for r in res}
    assert cos[1] == pytest.approx(0.9 / (0.9**2 + 0.1**2) ** 0.5, rel=1e-6)
    assert cos[3] == pytest.approx(-1.0)


def test_topk_row_counts(embeddings):
    out = S.brute_force_topk(embeddings, embeddings.filter(F.col("vec_id") < 5), k=7)
    rows = out.collect()
    assert len(rows) == 5 * 7
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rn)
    for q, rns in per_q.items():
        assert sorted(rns) == list(range(1, 8))


def test_lsh_recall(embeddings):
    """Bucketed ANN must recover a reasonable share of the true top-10
    (8 hyperplanes on random 64-d vectors is a coarse sieve; recall
    here is a determinism+sanity gate, not a quality benchmark)."""
    q = embeddings.filter(F.col("vec_id") < 20)
    exact = {
        (r.q_id, r.c_id)
        for r in S.brute_force_topk(embeddings, q, k=10).collect()
    }
    approx = {
        (r.q_id, r.c_id)
        for r in S.lsh_topk(embeddings, q, dim=64, k=10, n_planes=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.15, f"recall {recall}"


def test_lsh_deterministic(embeddings):
    q = embeddings.filter(F.col("vec_id") < 5)
    a = sorted(
        (r.q_id, r.c_id, r.rn)
        for r in S.lsh_topk(embeddings, q, dim=64, k=5, n_planes=8).collect()
    )
    b = sorted(
        (r.q_id, r.c_id, r.rn)
        for r in S.lsh_topk(embeddings, q, dim=64, k=5, n_planes=8).collect()
    )
    assert a == b


def test_ivf_recall_and_determinism(embeddings):
    """IVF with n_probe=8 of 16 cells must recover most of the true
    top-10 and be deterministic for a fixed seed."""
    q = embeddings.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.c_id) for r in S.brute_force_topk(embeddings, q, k=10).collect()
    }
    a = S.ivf_topk(embeddings, q, k=10, n_lists=16, n_probe=8).collect()
    b = S.ivf_topk(embeddings, q, k=10, n_lists=16, n_probe=8).collect()
    assert sorted((r.q_id, r.c_id, r.rn) for r in a) == sorted(
        (r.q_id, r.c_id, r.rn) for r in b
    )
    approx = {(r.q_id, r.c_id) for r in a}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall {recall}"


def test_near_dup_threshold(toy_vectors):
    pairs = S.embedding_cosine_near_dup(
        toy_vectors, dim=4, threshold=0.95, n_planes=2
    ).collect()
    for p in pairs:
        assert p.cosine >= 0.95


def test_ivf_layout_independent(embeddings):
    """Quantizer training sample is the fit_cap smallest xxhash64(id)
    values — a total order on rows — so centroids (and therefore results)
    must be identical whatever the corpus partitioning."""
    q = embeddings.filter(F.col("vec_id") < 5)
    a = S.ivf_topk(embeddings, q, k=5, n_lists=8, n_probe=4).collect()
    relaid = embeddings.repartition(7)
    b = S.ivf_topk(relaid, q, k=5, n_lists=8, n_probe=4).collect()
    assert sorted((r.q_id, r.c_id, r.rn) for r in a) == sorted(
        (r.q_id, r.c_id, r.rn) for r in b
    )


def test_centroid_drift_matches_numpy(spark):
    """centroid_drift equals a numpy reference on a crafted corpus:
    reference batch reports exactly 0.0; a batch shifted by +delta in
    one dimension reports |delta| as both L2 drift and max shift."""
    import numpy as np
    from pyspark.sql import functions as F

    from ballista_extensions_spark.operators.similarity import (
        centroid_drift,
    )

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 8)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, 0, [float(x) for x in v]))  # batch 0
        shifted = v.copy()
        shifted[3] += 2.5
        rows.append((i * 2 + 1, 1, [float(x) for x in shifted]))
    df = spark.createDataFrame(
        rows, "vec_id long, batch int, embedding array<double>"
    )
    out = {
        r.batch: r
        for r in centroid_drift(df, "batch", ref_batch=0).collect()
    }
    assert out[0].drift_l2 == 0.0 and out[0].max_dim_shift == 0.0
    assert out[0].n_vectors == 40 and out[1].n_vectors == 40
    # centroids of batch 1 differ from batch 0 by exactly +2.5 in dim 4
    # (same underlying vectors otherwise), so drift == max shift == 2.5
    # up to float32-storage + fold error
    assert abs(out[1].drift_l2 - 2.5) < 1e-7
    assert abs(out[1].max_dim_shift - 2.5) < 1e-7


def test_centroid_drift_missing_reference_is_visible(spark):
    """A missing reference batch yields NULL drift rows (monitor
    visibly broken), never an empty report."""
    from ballista_extensions_spark.operators.similarity import (
        centroid_drift,
    )

    df = spark.createDataFrame(
        [(1, 1, [1.0, 2.0]), (2, 2, [3.0, 4.0])],
        "vec_id long, batch int, embedding array<double>",
    )
    rows = centroid_drift(df, "batch", ref_batch=0).collect()
    assert len(rows) == 2
    assert all(r.drift_l2 is None for r in rows)
