"""Persisted ANN index store (operators/annstore.py): cross-run
persistence round-trip, append-only incremental ingest, the
partition-pruned probe scan (the inverted-file property), quantizer
determinism, trained-centroid recall, and the drift-triggered
re-cluster path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import annstore as A


def _drop(spark, prefix):
    for t in (f"{prefix}_assign", f"{prefix}_centroids"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _topk_set(df):
    return {
        (r["q_id"], r["c_id"], r["rn"], round(r["cosine"], 12))
        for r in df.collect()
    }


def test_lattice_centroids_deterministic_and_bounded():
    a = A.lattice_centroids(8, 64)
    assert a == A.lattice_centroids(8, 64)
    assert len(a) == 8 and all(len(c) == 64 for c in a)
    assert all(-1.0 <= x <= 1.0 for c in a for x in c)
    # no two centroids identical (a degenerate quantizer would
    # silently empty cells)
    assert len(set(a)) == 8


def test_assign_cells_is_total_and_stable(spark, embeddings):
    cents = A.lattice_centroids(8, 64)
    assigned = A.assign_cells(embeddings, cents)
    n = embeddings.count()
    assert assigned.count() == n
    assert assigned.filter(F.col("cell").isNull()).count() == 0
    assert assigned.filter(
        (F.col("cell") < 0) | (F.col("cell") >= 8)
    ).count() == 0
    # re-running yields the identical assignment (frozen quantizer)
    again = A.assign_cells(embeddings, cents)
    assert (
        assigned.join(again.withColumnRenamed("cell", "cell2"), "vec_id")
        .filter(F.col("cell") != F.col("cell2"))
        .count()
        == 0
    )


def test_persisted_roundtrip_and_append_only_ingest(spark, embeddings):
    """build → persist → load_ann_index → incremental append: the
    reopened index probes identically to the in-memory one, and
    ingest grows the table by exactly the increment (append, no
    rewrite)."""
    prefix = "ann_test_store"
    _drop(spark, prefix)
    stored = embeddings.filter(F.col("vec_id") % 4 != 0)
    batch = embeddings.filter(F.col("vec_id") % 4 == 0)
    cents = A.lattice_centroids(8, 64)
    try:
        idx = A.build_ann_index(stored, cents, table_prefix=prefix)
        n0 = spark.table(f"{prefix}_assign").count()
        assert n0 == stored.count()

        idx = A.ingest_into_index(idx, batch)
        assert spark.table(f"{prefix}_assign").count() == n0 + batch.count()

        reopened = A.load_ann_index(spark, prefix)
        assert reopened.centroids == cents

        mem = A.build_ann_index(stored, cents)
        mem = A.ingest_into_index(mem, batch)
        probes = batch.filter(F.col("vec_id") % 100 == 0)
        got = _topk_set(A.probe_index(reopened, probes, k=5, n_probe=2))
        want = _topk_set(A.probe_index(mem, probes, k=5, n_probe=2))
        assert got == want and len(want) > 0
    finally:
        _drop(spark, prefix)


def test_probe_scan_is_partition_pruned(spark, embeddings):
    """THE inverted-file property: probing n_probe cells reads ONLY
    those cells' files from the cell-partitioned store — at corpus
    scale the probe scan touches ~n_probe/n_lists of the data, not
    all of it."""
    prefix = "ann_test_prune"
    _drop(spark, prefix)
    cents = A.lattice_centroids(8, 64)
    try:
        idx = A.build_ann_index(embeddings, cents, table_prefix=prefix)
        all_cells = {
            r[0] for r in idx.assignments.select("cell").distinct().collect()
        }
        assert len(all_cells) > 2, "need >2 occupied cells to prove pruning"
        pruned = idx.assignments.filter(F.col("cell").isin([0, 1]))
        files = pruned.inputFiles()
        assert files, "pruned scan reads some files"
        assert all("cell=0" in f or "cell=1" in f for f in files)
        # and the full table has files outside the probed cells
        assert any(
            "cell=0" not in f and "cell=1" not in f
            for f in idx.assignments.inputFiles()
        )
    finally:
        _drop(spark, prefix)


def test_trained_centroids_recall_floor(spark, embeddings):
    """Quality path: k-means quantizer + n_probe=4/16 probing recovers
    >= 50% of exact top-10 neighbors on this corpus — the same floor
    test_similarity.py::test_ivf_recall_and_determinism uses (random
    64-d vectors are the worst case for a coarse quantizer; measured
    0.55 here, identical to ivf_topk with the same parameters)."""
    from ballista_extensions_spark.operators.similarity import (
        brute_force_topk,
    )

    probes = embeddings.filter(F.col("vec_id") < 10)
    cents = A.train_centroids(embeddings, 16, seed=42)
    assert len(cents) == 16
    idx = A.build_ann_index(embeddings, cents)
    approx = A.probe_index(idx, probes, k=10, n_probe=4)
    exact = brute_force_topk(embeddings, probes, k=10)
    a = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    e = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    assert e, "exact baseline nonempty"
    recall = len(a & e) / len(e)
    assert recall >= 0.5, f"recall {recall:.2f} below floor"


def test_maybe_recluster_trigger_paths(spark, embeddings):
    """Low drift → plain append under the frozen quantizer; a shifted
    increment over the threshold → quantizer retrained and index
    rebuilt over the merged corpus."""
    stored = embeddings.filter(F.col("vec_id") % 4 != 0)
    same_dist = embeddings.filter(F.col("vec_id") % 4 == 0)
    cents = A.lattice_centroids(8, 64)
    idx = A.build_ann_index(stored, cents)

    idx2, reclustered = A.maybe_recluster(
        idx, same_dist, drift_threshold=10.0
    )
    assert not reclustered
    assert idx2.centroids == cents
    assert idx2.assignments.count() == embeddings.count()

    shifted = same_dist.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> CAST(x + 5.0 AS FLOAT))"
        ).alias("embedding"),
    )
    idx3, reclustered = A.maybe_recluster(
        idx, shifted, drift_threshold=1.0
    )
    assert reclustered
    assert idx3.centroids != cents
    assert idx3.assignments.count() == stored.count() + shifted.count()


def test_probe_matches_bruteforce_when_probing_all_cells(spark, embeddings):
    """With n_probe = n_lists the inverted file is a partitioned
    brute-force: results must equal exact top-k."""
    from ballista_extensions_spark.operators.similarity import (
        brute_force_topk,
    )

    probes = embeddings.filter(F.col("vec_id") < 5)
    idx = A.build_ann_index(embeddings, A.lattice_centroids(8, 64))
    got = A.probe_index(idx, probes, k=5, n_probe=8)
    want = brute_force_topk(embeddings, probes, k=5)
    assert _topk_set(got) == {
        (r["q_id"], r["c_id"], r["rn"], round(r["cosine"], 12))
        for r in want.collect()
    }


def test_maybe_recluster_persisted_rebuild(spark, embeddings):
    """Regression: over-threshold drift on a PERSISTED index rebuilds
    by overwrite-saving into the same table the merged corpus reads
    from — the merged frame must be materialized first or Spark
    rejects the self-overwrite ("cannot overwrite a table that is
    also being read from")."""
    prefix = "ann_test_reclust"
    _drop(spark, prefix)
    stored = embeddings.filter(F.col("vec_id") % 4 != 0)
    shifted = embeddings.filter(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, x -> CAST(x + 5.0 AS FLOAT))"
        ).alias("embedding"),
    )
    cents = A.lattice_centroids(8, 64)
    try:
        idx = A.build_ann_index(stored, cents, table_prefix=prefix)
        idx2, reclustered = A.maybe_recluster(
            idx, shifted, drift_threshold=1.0
        )
        assert reclustered
        assert idx2.table == f"{prefix}_assign"
        n_want = stored.count() + shifted.count()
        assert spark.table(f"{prefix}_assign").count() == n_want
        assert idx2.assignments.count() == n_want
    finally:
        _drop(spark, prefix)
