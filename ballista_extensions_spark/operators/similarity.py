"""Similarity search over embedding columns (array<float>).

Vector math stays JVM-side: cast to array<double> once, then
``zip_with`` + ``aggregate`` folds — codegen'd, no Python in the hot
path. The fold is sequential left-to-right over the array, so results
are bit-identical to any engine folding the same doubles in the same
order (oracle parity without rounding).

Scale design:
- brute-force top-k is the exactness baseline: broadcast the (small)
  query set, scan the corpus once, per-partition top-k via window.
  O(|Q| x |corpus| x d) FLOPs but a single corpus scan, no corpus
  shuffle except the final per-query k-row reduce.
- the LSH variant (random hyperplane signs -> bucket join) is the scale
  path: corpus hashed once (narrow), candidates only from matching
  buckets (probed with multiple rotations to recover recall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_extensions_spark.io import ensure_parallelism


def as_double(vec_sql: str) -> str:
    """SQL fragment: cast array<float> -> array<double> (exact)."""
    return f"transform({vec_sql}, x -> CAST(x AS DOUBLE))"


def dot_sql(a_sql: str, b_sql: str) -> str:
    """Sequential left-to-right dot product in double precision."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> x * y), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_sql(a_sql: str) -> str:
    return f"sqrt({dot_sql(a_sql, a_sql)})"


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Adds l2_norm and dim columns (narrow)."""
    v = as_double(vec_col)
    return df.select(
        "*",
        F.expr(norm_sql(v)).alias("l2_norm"),
        F.size(F.col(vec_col)).cast("long").alias("dim"),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (q_id, q_vec)-shaped subset (will be broadcast — keep it
    small; chunk the query set and union at true scale).
    Output: (q_id, c_id, cosine, rn) with rn in 1..k, ties broken by
    candidate id (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.expr(as_double(vec_col)).alias("q_vec"),
        F.expr(norm_sql(as_double(vec_col))).alias("q_norm"),
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("c_id"),
        F.expr(as_double(vec_col)).alias("c_vec"),
        F.expr(norm_sql(as_double(vec_col))).alias("c_norm"),
    )
    cos = F.expr(dot_sql("q_vec", "c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.select(
            "q_id", "c_id", "cosine", F.row_number().over(w).cast("long").alias("rn")
        )
        .filter(F.col("rn") <= k)
    )


def _hyperplane_sign_sql(vec_sql: str, plane: int, dim: int) -> str:
    """Sign bit of the dot product with a pseudo-random hyperplane whose
    components are +-1 derived from xxhash64(plane, dim_index) — no
    stored plane matrix, fully deterministic and narrow."""
    return (
        f"CASE WHEN aggregate(zip_with({vec_sql}, "
        f"transform(sequence(0, {dim - 1}), i -> CASE WHEN "
        f"(xxhash64({plane}, i) & 1) = 1 THEN CAST(1 AS DOUBLE) "
        f"ELSE CAST(-1 AS DOUBLE) END), (x, s) -> x * s), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0 THEN 1L ELSE 0L END"
    )


def lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (n_planes sign bits packed into a
    BIGINT). Cosine-similar vectors collide with probability
    (1 - theta/pi)^n_planes. Narrow, one pass."""
    v = as_double(vec_col)
    bits = " + ".join(
        f"shiftleft({_hyperplane_sign_sql(v, p, dim)}, {p})" for p in range(n_planes)
    )
    return df.select(
        F.col(id_col), F.col(vec_col), F.expr(bits).alias("bucket")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine ranking within candidates.

    Scale path: the corpus is bucketed once (narrow scan), the join is an
    equi-join on bucket — per-bucket candidate lists replace the
    full-corpus product. Recall improves with fewer planes / multi-probe; pytest
    measures recall vs brute force.
    """
    cb = lsh_bucket(ensure_parallelism(corpus), dim, n_planes, id_col, vec_col)
    qb = lsh_bucket(queries, dim, n_planes, id_col, vec_col)
    q = qb.select(
        F.col(id_col).alias("q_id"),
        F.expr(as_double(vec_col)).alias("q_vec"),
        F.expr(norm_sql(as_double(vec_col))).alias("q_norm"),
        F.col("bucket"),
    )
    c = cb.select(
        F.col(id_col).alias("c_id"),
        F.expr(as_double(vec_col)).alias("c_vec"),
        F.expr(norm_sql(as_double(vec_col))).alias("c_norm"),
        F.col("bucket"),
    )
    cos = F.expr(dot_sql("q_vec", "c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        F.broadcast(q)
        .join(c, (q["bucket"] == c["bucket"]) & (F.col("q_id") != F.col("c_id")))
        .select("q_id", "c_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.select(
            "q_id", "c_id", "cosine", F.row_number().over(w).cast("long").alias("rn")
        )
        .filter(F.col("rn") <= k)
    )


def _kmeans_lloyd(pts, k: int, seed: int = 42, max_iter: int = 8):
    """Deterministic driver-side Lloyd k-means (k-means++ init) over the
    bounded quantizer-training sample. numpy-vectorized; cost is
    O(max_iter * |sample| * k * dim) floats — milliseconds at the cap.
    Empty cells are re-seeded from successively-farthest DISTINCT points
    (one per empty cell), so exactly k centroids always come back and no
    two cells collapse onto the same reseed point."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = len(pts)
    if n == 0:
        raise ValueError("ivf quantizer: empty training sample")
    k = min(k, n)
    # k-means++ seeding
    centers = [pts[rng.integers(n)]]
    d2 = ((pts - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(pts[rng.choice(n, p=probs)])
        d2 = np.minimum(d2, ((pts - centers[-1]) ** 2).sum(axis=1))
    c = np.asarray(centers)
    for _ in range(max_iter):
        # pairwise squared distances via (x-c)^2 expansion
        dist = ((pts[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = dist.argmin(axis=1)
        newc = c.copy()
        empty = []
        for j in range(k):
            mask = assign == j
            if mask.any():
                newc[j] = pts[mask].mean(axis=0)
            else:
                empty.append(j)
        if empty:
            # one DISTINCT reseed point per empty cell, taken in
            # decreasing order of distance-to-own-centroid
            farthest = np.argsort(-dist.min(axis=1))
            for cell, pt_idx in zip(empty, farthest):
                newc[cell] = pts[pt_idx]
        if np.allclose(newc, c):
            c = newc
            break
        c = newc
    return c


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions the corpus into n_lists cells; each query searches only
    its n_probe nearest cells.

    Scale path (the FAISS recipe): the quantizer is *trained* driver-side
    with numpy over a bounded sample (<= max(256*n_lists, 4096) vectors —
    centroid quality saturates at a few hundred points per cell, so
    training cost is O(cap) regardless of corpus size). *Assignment* is
    fully distributed and narrow: centroids are inlined as literals into
    a codegen'd argmin-of-L2 expression, so the corpus is scanned exactly
    once with no shuffle and no ML-library job storm. The candidate join
    is an equi-join on cell id touching ~n_probe/n_lists of the corpus
    per query. Deterministic for a fixed seed AND independent of data
    layout: the training sample is the fit_cap smallest values of
    xxhash64(id, seed) — a total order on rows, so the same corpus yields
    the same centroids whatever its partitioning. Catalyst executes the
    orderBy+limit as TakeOrderedAndProject (per-partition top-k, merged
    on the driver): ONE corpus scan, no shuffle, no separate count job.
    Recall vs brute force is pytest-checked.
    """
    corpus = ensure_parallelism(corpus)
    fit_cap = max(256 * n_lists, 4096)
    samp = (
        corpus.select(
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"), F.col(vec_col)
        )
        .orderBy("_h")
        .limit(fit_cap)
    )
    import numpy as np

    pts = np.asarray([r[1] for r in samp.collect()], dtype=np.float64)
    centroids = _kmeans_lloyd(pts, n_lists, seed=seed, max_iter=8)
    if not np.isfinite(centroids).all():
        raise ValueError(
            "ivf quantizer: non-finite centroid component — corpus "
            "embeddings contain NaN/Inf values; clean them upstream"
        )

    # One nested literal + one shared lambda keeps the expression tree
    # (and Catalyst planning time) O(n_lists*dim) literals with a single
    # aggregate node, instead of n_lists copies of the fold.
    # float(x) before repr: numpy >= 2.0 reprs np.float64 as
    # 'np.float64(0.123)', which is not SQL; a plain Python float reprs
    # round-trip-exactly in both directions.
    cents_lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"CAST({float(x)!r} AS DOUBLE)" for x in c) + ")"
            for c in centroids
        )
        + ")"
    )

    def dists_sql(vec: str) -> str:
        return (
            f"transform({cents_lit}, c -> "
            f"aggregate(zip_with({vec}, c, (x, y) -> (x - y) * (x - y)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
        )

    # corpus side: cell = argmin distance — one narrow codegen'd pass
    vd = as_double(vec_col)
    assigned = corpus.select(
        F.col(id_col), F.col(vec_col), F.expr(dists_sql(vd)).alias("ds")
    ).select(
        id_col,
        vec_col,
        (F.expr("array_position(ds, array_min(ds))").cast("int") - 1).alias("cell"),
    )

    # query side: n_probe nearest cells, also narrow (sorted (d2, cell)
    # struct array, sliced) — no crossJoin, no window shuffle
    q_cells = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.expr(as_double(vec_col)).alias("q_vec"),
            F.expr(norm_sql(as_double(vec_col))).alias("q_norm"),
            F.expr(dists_sql(as_double(vec_col))).alias("ds"),
        )
        .select(
            "q_id",
            "q_vec",
            "q_norm",
            F.explode(
                F.expr(
                    "slice(array_sort(zip_with(ds, sequence(0, size(ds) - 1), "
                    "(d, i) -> struct(d AS d2, i AS cell))), 1, "
                    f"{int(n_probe)})"
                )
            ).alias("pc"),
        )
        .select("q_id", "q_vec", "q_norm", F.col("pc.cell").alias("cell"))
    )
    c = assigned.select(
        F.col(id_col).alias("c_id"),
        F.expr(as_double(vec_col)).alias("c_vec"),
        F.expr(norm_sql(as_double(vec_col))).alias("c_norm"),
        "cell",
    )
    cos = F.expr(dot_sql("q_vec", "c_vec")) / (F.col("q_norm") * F.col("c_norm"))
    scored = (
        F.broadcast(q_cells)
        .join(c, ["cell"])
        .filter(F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.select(
            "q_id", "c_id", "cosine", F.row_number().over(w).cast("long").alias("rn")
        )
        .filter(F.col("rn") <= k)
    )


def embedding_cosine_near_dup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-based near-duplicate pairs: LSH-bucketed self-join, exact
    cosine verification >= threshold. Same shape as MinHash dedup but in
    embedding space."""
    cb = lsh_bucket(ensure_parallelism(df), dim, n_planes, id_col, vec_col)
    # lazy localCheckpoint: both sides of the self-join read the bucketed
    # projection from one materialization, and the blocks are released by
    # the ContextCleaner when the frame goes unreferenced (a .cache()
    # here leaked block-manager state across long query sweeps)
    enriched = cb.select(
        F.col(id_col).alias("id"),
        F.expr(as_double(vec_col)).alias("vec"),
        F.expr(norm_sql(as_double(vec_col))).alias("nrm"),
        "bucket",
    ).localCheckpoint(eager=False)
    a = enriched.alias("a")
    b = enriched.alias("b")
    cos = F.expr(dot_sql("a.vec", "b.vec")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ALL exact pairs with cosine >= threshold within ``df`` —
    the oracle-verifiable correctness twin of
    :func:`embedding_cosine_near_dup` (which LSH-buckets the self-join
    and is the corpus-scale path). This one is O(n^2) BY CONSTRUCTION:
    callers own the subset duty (a probe sample, one LSH bucket, a
    re-rank candidate set), the same contract as brute_force_topk's
    broadcast query side. Returns (id_a, id_b, cosine) with
    id_a < id_b.

    Cosine parity: double-fold dot product and norms in pinned
    left-to-right order (dot_sql/norm_sql), matching a SQL
    list_reduce fold bit-for-bit."""
    a = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.expr(as_double(vec_col)).alias("vec"),
        F.expr(norm_sql(as_double(vec_col))).alias("nrm"),
    ).localCheckpoint(eager=False)
    b = a
    cos = F.expr(dot_sql("a.vec", "b.vec")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.alias("a")
        .join(F.broadcast(b.alias("b")), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/serving
    compression step of an embedding pipeline (FAISS SQ8 shape): scale =
    max|x| / 127, q_i = floor(x_i/scale + 0.5). Emits audit columns
    rather than the (unhashable-in-flat-compares) quantized array:
    checksum (sum of q), l1_norm (sum |q|), n_saturated (|q| = 127).

    floor(x + 0.5) is used instead of round() deliberately: engines
    disagree on round-half behavior for doubles (banker's vs half-away),
    floor is IEEE-defined everywhere, so the oracle matches bit-exact.

    Scale: one narrow codegen'd projection, zero shuffles; the quantized
    array itself would be emitted (not the audit sums) in a real
    pipeline's write path.
    """
    dbl = as_double(vec_col)
    d = df.select(
        F.col(id_col),
        F.expr(dbl).alias("vec"),
        (
            F.expr(f"array_max(transform({dbl}, x -> abs(x)))")
            / F.expr("CAST(127 AS DOUBLE)")
        ).alias("scale"),
    )
    q = (
        "CASE WHEN scale = CAST(0 AS DOUBLE) THEN transform(vec, x -> 0L) "
        "ELSE transform(vec, x -> CAST(floor(x / scale + 0.5D) AS LONG)) END"
    )
    d = d.select(id_col, "scale", F.expr(q).alias("q"))
    return d.select(
        id_col,
        "scale",
        F.expr("aggregate(q, 0L, (a, x) -> a + x)").alias("checksum"),
        F.expr("aggregate(q, 0L, (a, x) -> a + abs(x))").alias("l1_norm"),
        F.expr("size(filter(q, x -> abs(x) = 127))").cast("long").alias(
            "n_saturated"
        ),
    )


def sign_pack64(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Pack a 64-dim vector's sign bits into ONE BIGINT signature —
    the binary-sketch compression that makes 100 TB embedding search
    tractable: 64 floats (256 B) become 8 B, and angular similarity is
    approximated by Hamming distance computed with two codegen'd
    integer ops (xor + bit_count). Bit i is set iff component i > 0
    (strictly — a deterministic IEEE comparison both engines share).

    Returns (id_col, sig long). One narrow projection, zero shuffles;
    the OR-fold over disjoint bit positions is exact integer
    arithmetic, replayable in ANSI SQL as a SUM of disjoint powers of
    two (OR == + when operand bits never overlap). A NULL or
    shorter-than-64 vector yields sig NULL — NOT 0, which is the valid
    signature of an all-nonpositive vector and would silently
    participate in Hamming ranking; callers filter or propagate the
    NULL as fits their contract.
    """
    sig = (
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc | "
        f"CASE WHEN element_at({vec_col}, i + 1) > 0 "
        "THEN shiftleft(1L, i) ELSE 0L END)"
    )
    valid = F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) >= 64)
    return df.select(
        F.col(id_col),
        F.when(valid, F.expr(sig)).alias("sig"),
    )


def centroid_drift(
    df: DataFrame,
    batch_col: str,
    *,
    ref_batch=0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-distribution drift per ingest batch: the L2 distance
    between each batch's centroid and the reference batch's centroid,
    plus the largest single-dimension shift — the cheap monitor that a
    new crawl slice or re-encoded corpus moved the distribution before
    it pollutes similarity search or dedup thresholds.

    Returns (batch, n_vectors, drift_l2, max_dim_shift); the reference
    batch reports drift 0.0.

    Float discipline (the property that makes the report reproducible
    and SQL-oracle-checkable): per-(batch, dim) value lists fold in
    ascending id order and the cross-dim square sum folds in ascending
    dim order, so every double addition happens in a defined sequence
    instead of shuffle arrival order. Scale: one narrow posexplode
    (rows x dims) into a partial-aggregated (batch, dim) collect; the
    ordered folds and the broadcast reference join run on batches x
    dims rows only. For production-size batches switch the per-dim
    fold to a tree aggregate and accept order-defined semantics, as
    embedding_centroids documents.
    """
    expanded = df.select(
        F.col(batch_col).alias("batch"),
        F.col(id_col).alias("__id"),
        F.posexplode(vec_col).alias("pos", "val"),
    ).select(
        "batch",
        (F.col("pos") + 1).alias("dim"),
        "__id",
        F.col("val").cast("double").alias("val"),
    )
    cent = (
        expanded.groupBy("batch", "dim")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__id", "val"))
            ).alias("pairs"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "batch",
            "dim",
            (
                F.aggregate(
                    F.transform(F.col("pairs"), lambda x: x["val"]),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                / F.col("n")
            ).alias("c"),
            "n",
        )
    )
    ref = cent.filter(F.col("batch") == ref_batch).select(
        F.col("dim").alias("rdim"), F.col("c").alias("rc")
    )
    # LEFT join: if the reference batch is empty/missing (caller
    # misconfiguration), every batch reports NULL drift — visibly
    # broken, instead of an empty report indistinguishable from "no
    # data" (a monitor must not silently vanish)
    diff = cent.join(
        F.broadcast(ref), F.col("dim") == F.col("rdim"), "left"
    ).select("batch", "dim", (F.col("c") - F.col("rc")).alias("d"), "n")
    per = diff.groupBy("batch").agg(
        F.sort_array(F.collect_list(F.struct("dim", "d"))).alias("dd"),
        F.max(F.abs(F.col("d"))).alias("max_dim_shift"),
        F.max("n").alias("n"),
    )
    return per.select(
        F.col("batch").cast("long").alias("batch"),
        F.col("n").cast("long").alias("n_vectors"),
        F.sqrt(
            F.aggregate(
                F.transform(F.col("dd"), lambda x: x["d"] * x["d"]),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("drift_l2"),
        "max_dim_shift",
    )
